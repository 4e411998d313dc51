"""Stream-stream event-time join: attribute each left event to the
right events that preceded it within a bounded lag.

The reference (cdap_geo) has no streaming surface at all; this
completes this engine's streaming family (windows, sessionize, dedup,
stream-static enrich, sketch relations) with the remaining Structured
Streaming primitive a clickstream pipeline needs — the watermarked
STREAM-STREAM inner join. The same function serves batch frames (the
DuckDB-checkable oracle twin) and two ``readStream`` sources.

Scale/state contract (the reason the API *requires* a time bound):

- On BATCH inputs the plan is an equi-join on the key with the time
  range as a residual filter — a SortMergeJoin whose shuffle is
  carried entirely by the equality key; the range bound never becomes
  a BroadcastNestedLoopJoin (pytest-pinned).
- On STREAMING inputs both sides are watermarked and the range bound
  rides in the join condition — exactly what lets Spark evict buffered
  rows: a right row can be dropped once the watermark passes
  ``r_ts + max_lag``, a left row once it passes ``l_ts``. Without the
  bound the state store grows forever (Spark would reject the
  append-mode join outright).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attach_within(left: DataFrame, right: DataFrame, *,
                  on: str = "user_id", ts_col: str = "ts",
                  max_lag_minutes: int = 10,
                  watermark: str = "30 minutes",
                  left_id: str = "event_id",
                  right_id: str = "event_id") -> DataFrame:
    """For every ``left`` row, every ``right`` row with the same ``on``
    key whose timestamp falls in ``[left.ts - max_lag, left.ts]``
    (inclusive both ends — a right row at exactly the left timestamp
    matches). Returns ``(key, l_id, r_id, lag_us)`` with ``lag_us`` the
    exact integer microsecond lag (>= 0), so the relation is
    cross-engine value-hashable.

    Works identically on batch and streaming inputs; when either side
    is streaming, both are watermarked with ``watermark`` and the
    result must be consumed in append mode.
    """
    if max_lag_minutes <= 0:
        raise ValueError("attach_within: max_lag_minutes must be > 0")
    l = left.select(F.col(on).alias("key"),
                    F.col(left_id).alias("l_id"),
                    F.col(ts_col).cast("timestamp").alias("l_ts"))
    r = right.select(F.col(on).alias("_rkey"),
                     F.col(right_id).alias("r_id"),
                     F.col(ts_col).cast("timestamp").alias("r_ts"))
    if left.isStreaming or right.isStreaming:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
    cond = ((l["key"] == r["_rkey"])
            & (r["r_ts"] <= l["l_ts"])
            & (r["r_ts"] >= l["l_ts"]
               - F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")))
    return (l.join(r, cond)
            .select("key", "l_id", "r_id",
                    (F.unix_micros(F.col("l_ts"))
                     - F.unix_micros(F.col("r_ts"))).alias("lag_us")))
