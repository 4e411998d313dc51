"""Scoped lifetime management for lineage-truncating checkpoints.

The similarity/dedup pipelines materialize each multiply-referenced
fingerprint relation exactly once via ``localCheckpoint()`` (the Arrow
stages feeding 3-5 plan sites are NOT covered by ReuseExchange, so an
un-checkpointed subtree re-runs per site — measured 2-3x on simhash /
minhash). Two lifetime facts make releasing those blocks non-obvious:

* ``DataFrame.unpersist()`` only clears cache-manager entries (plain
  ``persist()``); a local checkpoint persists the underlying RDD
  directly, reachable only through the plan's ``LogicalRDD`` node —
  so a naive ``df.unpersist()`` on a checkpointed frame is a no-op;
* Spark's ContextCleaner releases the blocks after the RDD object is
  garbage-collected on the driver JVM — correct, but GC-paced: a
  long-lived session looping over many corpora accumulates blocks
  between GC cycles (the same lifetime concern ADVICE r3 raised for
  ``compat._PERSISTED``).

This module gives callers a deterministic release point without
changing the default (GC-paced) behaviour:

* operators call :func:`track_checkpoint` on every DataFrame they
  ``localCheckpoint()`` — the registry records the checkpointed RDD's
  **id only** (an int), so it never extends the checkpoint's lifetime
  or blocks the ContextCleaner;
* callers wrap a unit of work in :func:`checkpoint_scope` (or call
  :func:`release_checkpoints` between batches) to drop still-live
  blocks as soon as the results are materialized;
* iterative operators release superseded per-round checkpoints
  eagerly with :func:`unpersist_checkpoint`.

IMPORTANT: a local checkpoint has no lineage to recompute from —
release only after every result derived from the scope has been fully
materialized (counted / collected / written). Releasing earlier makes
later actions on those results fail with missing-block errors.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

#: per-thread registry of checkpointed RDD ids, in creation order
#: (ints — never objects, see module docstring). Thread-local because
#: Spark drivers routinely submit jobs from several threads: a scope
#: on one thread must never release (or re-own) checkpoints another
#: thread is still building on.
_TLS = threading.local()


def _tracked() -> list:
    ids = getattr(_TLS, "ids", None)
    if ids is None:
        ids = _TLS.ids = []
    return ids


def _checkpoint_rdd(df: DataFrame):
    """The JVM RDD a localCheckpoint'ed DataFrame's blocks live in
    (the plan root is a ``LogicalRDD``), or None for plain frames."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return None
        return plan.rdd()
    except Exception:
        return None


def track_checkpoint(df: DataFrame) -> DataFrame:
    """Register a localCheckpoint'ed DataFrame for scoped release
    (on the calling thread's registry)."""
    rdd = _checkpoint_rdd(df)
    if rdd is not None:
        _tracked().append(rdd.id())
    return df


def unpersist_checkpoint(df: DataFrame) -> None:
    """Release a checkpointed (or plain-persisted) DataFrame's blocks
    NOW. For iterative operators dropping a superseded round's state —
    the caller must hold no other result depending on these blocks."""
    rdd = _checkpoint_rdd(df)
    if rdd is not None:
        try:
            rdd.unpersist(False)
            return
        except Exception:
            pass
    try:
        df.unpersist()
    except Exception:
        pass


def _release(ids) -> None:
    from pyspark import SparkContext
    sc = SparkContext._active_spark_context
    if sc is None:
        return
    try:
        live = sc._jsc.sc().getPersistentRDDs()   # scala Map[Int, RDD]
    except Exception:
        return
    for rid in ids:
        try:
            opt = live.get(rid)                   # scala Option
            if opt.isDefined():
                opt.get().unpersist(False)
        except Exception:
            pass


def release_checkpoints() -> None:
    """Unpersist every checkpoint tracked on THIS thread still alive.

    Call between batches in long-lived sessions, AFTER materializing
    all results of the previous batch (see module docstring).
    """
    ids = _tracked()
    taken, ids[:] = ids[:], []
    _release(taken)


@contextmanager
def checkpoint_scope():
    """Release every checkpoint created inside the block on exit.

    Materialize everything you need before the block closes::

        with checkpoint_scope():
            pairs = ngram_jaccard_pairs(docs, k=5, threshold_pct=60)
            n = pairs.count()          # fully consumed inside
        # fingerprint blocks are gone here

    Only checkpoints created INSIDE the block — on this thread — are
    released; nesting, other threads' scopes, and interleaving with
    GC-paced callers are all safe.
    """
    ids = _tracked()
    mark = len(ids)
    try:
        yield
    finally:
        tail, ids[mark:] = ids[mark:], []
        _release(tail)
