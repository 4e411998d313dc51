"""Idempotent streaming sink: foreachBatch + a manifest commit log.

The north rule's resumability contract ("every partition writes
lineage + row-count metrics to a checkpoint manifest so any stage
resumes idempotently") applied to STREAMS. Structured Streaming
guarantees each micro-batch id is replayed with the same data after a
crash, but a plain parquet append would duplicate the rows of any
batch that wrote files and died before the offset commit. The classic
fix (the public foreachBatch idempotence pattern from the Structured
Streaming docs) is to make the WRITE transactional yourself:

* each batch writes to its own directory ``<path>/batch=<id>/``
  (overwrite-by-batch: a replayed half-written batch is clobbered,
  never appended);
* a commit line ``{batch_id, rows, files, bytes}`` is appended to
  ``<path>/_commits.jsonl`` AFTER the write succeeds — the commit
  point, same protocol as ``plans/manifest.py`` (data first, manifest
  last);
* a replayed batch id that is already committed is SKIPPED entirely;
* readers take the committed batch list from the log, so an
  uncommitted straggler directory is invisible.

State stays bounded: the log is one JSON line per micro-batch, and
the committed-id set is re-read per batch from the tail of the log
(micro-batches are seconds apart; at one batch per second for a year
the log is ~30 MB — rotate alongside checkpoint cleanup if needed).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _committed_ids(log_path: str) -> set:
    ids = set()
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    ids.add(json.loads(line)["batch_id"])
    return ids


def _dir_metrics(d: str) -> tuple:
    files = [f for f in os.listdir(d)
             if f.endswith(".parquet") or f.startswith("part-")]
    return len(files), sum(os.path.getsize(os.path.join(d, f))
                           for f in files)


def manifest_batch_writer(path: str):
    """A ``foreachBatch`` function writing idempotent per-batch
    parquet under ``path`` with a commit log (see module doc).

    The per-batch write mode is HARD-CODED to overwrite: it is the
    only mode consistent with the commit protocol (a batch that wrote
    files and crashed before its commit-log line is replayed, and the
    replay must clobber the half-written directory, never append to
    it). ``path`` and the commit log use local-filesystem ``os.*`` IO:
    driver-local or driver-mounted paths only (NFS/fuse mounts work;
    ``s3://``-style URIs do not — put the checkpoint and sink on a
    mounted filesystem, or replace the three ``os`` touchpoints with
    your object-store client).
    """
    os.makedirs(path, exist_ok=True)
    log_path = os.path.join(path, "_commits.jsonl")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in _committed_ids(log_path):
            return  # replay of a committed batch: exactly-once skip
        out_dir = os.path.join(path, f"batch={batch_id}")
        rows = batch_df.count()
        batch_df.write.mode("overwrite").parquet(out_dir)
        n_files, n_bytes = _dir_metrics(out_dir)
        with open(log_path, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "rows": rows,
                                "files": n_files, "bytes": n_bytes})
                    + "\n")
    return write


def start_manifest_sink(df: DataFrame, path: str, *,
                        checkpoint: str, trigger: dict | None = None,
                        query_name: str = "manifest_sink"):
    """writeStream -> :func:`manifest_batch_writer` with a checkpoint;
    returns the started StreamingQuery."""
    w = (df.writeStream.foreachBatch(manifest_batch_writer(path))
         .option("checkpointLocation", checkpoint)
         .queryName(query_name))
    w = w.trigger(**(trigger or {"availableNow": True}))
    return w.start()


def read_committed(spark, path: str) -> DataFrame:
    """Batch-read ONLY committed batches (uncommitted straggler
    directories from a crash are invisible)."""
    log_path = os.path.join(path, "_commits.jsonl")
    dirs = [os.path.join(path, f"batch={b}")
            for b in sorted(_committed_ids(log_path))]
    if not dirs:
        raise FileNotFoundError(f"no committed batches under {path}")
    return spark.read.parquet(*dirs)


def sink_stats(path: str) -> dict:
    """Aggregate commit-log metrics (rows/files/bytes per batch)."""
    log_path = os.path.join(path, "_commits.jsonl")
    batches = []
    with open(log_path) as f:
        for line in f:
            if line.strip():
                batches.append(json.loads(line))
    return {"n_batches": len(batches),
            "rows": sum(b["rows"] for b in batches),
            "bytes": sum(b["bytes"] for b in batches),
            "batches": batches}
