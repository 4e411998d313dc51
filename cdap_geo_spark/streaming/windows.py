"""Windowed event aggregation — batch and Structured Streaming.

The reference has NO streaming surface (SURVEY.md §2.11: zero hits for
readStream/watermark); the north rule's resumability requirement is
batch checkpointing (plans/manifest.py). This module exists because a
training-data engine still needs incremental event rollups: the SAME
transformation function serves a static DataFrame (driver `events`
table, DuckDB-checkable) and a ``readStream`` source with a watermark
— the Structured Streaming contract that transformations are
source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour",
                          watermark: str | None = None) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Works on both batch and streaming inputs; pass ``watermark`` for
    streaming late-data bounds (state is then evictable — required for
    an unbounded source).
    """
    src = events
    if watermark is not None:
        # watermarks require TIMESTAMP (tz) — parquet often stores NTZ
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def windowed_distinct_hll(events: DataFrame, *, value_col: str = "user_id",
                          window: str = "1 hour", p: int = 9,
                          watermark: str | None = None) -> DataFrame:
    """Per-window distinct-count SKETCH relation (window_start, bucket,
    max_rank) — the mergeable HyperLogLog of
    ``operators/sketch.py`` keyed by a tumbling event-time window.

    This returns the sketch, not the estimate, deliberately: a single
    stateful aggregation works identically on batch and streaming
    inputs (append mode under a watermark — late rows fold into their
    still-open window's buckets, state is <= 2^p rows per window and
    evictable), and the estimate is a stateless read-time finalize
    (``hll_finalize``) the consumer applies to completed windows.
    That is also the 100 TB sink design: store mergeable sketches,
    merge across days/sources with union + re-max, finalize at query
    time.
    """
    from cdap_geo_spark.operators.sketch import hll_bucket_rank
    src = events
    if watermark is not None:
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    bucket, rank = hll_bucket_rank(F.col(value_col).cast("string"), p)
    return (src.where(F.col(value_col).isNotNull())
               .withColumn("bucket", bucket).withColumn("rank", rank)
               .groupBy(F.window("ts", window).alias("w"), "bucket")
               .agg(F.max("rank").alias("max_rank"))
               .select(F.col("w.start").alias("window_start"),
                       "bucket", "max_rank"))


def windowed_cms(events: DataFrame, *, value_col: str = "user_id",
                 window: str = "1 hour", depth: int = 4,
                 width: int = 512,
                 watermark: str | None = None) -> DataFrame:
    """Per-window count-min sketch relation (window_start, hrow,
    bucket, cnt) — the frequency twin of :func:`windowed_distinct_hll`
    (same design: ONE stateful aggregation that runs identically on
    batch and streaming inputs, append mode under a watermark, state
    <= depth*width rows per window and evictable). The stream stores
    the mergeable sketch; point-frequency readout is the stateless
    :func:`cdap_geo_spark.operators.sketch.cms_estimate` at query
    time, and merging across days/sources is union + re-sum.
    """
    from cdap_geo_spark.operators.sketch import _hash60
    if depth < 1 or width < 2:
        raise ValueError("windowed_cms: need depth >= 1, width >= 2")
    src = events
    if watermark is not None:
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    base = (src.where(F.col(value_col).isNotNull())
            .select("ts", F.col(value_col).cast("string").alias("_v"),
                    F.explode(F.array(*[F.lit(i) for i in range(depth)]))
                     .alias("hrow")))
    h = _hash60(F.concat_ws(":", F.col("hrow").cast("string"),
                            F.col("_v")))
    return (base.withColumn("bucket", h % F.lit(width))
            .groupBy(F.window("ts", window).alias("w"), "hrow", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"),
                    "hrow", "bucket", "cnt"))


def windowed_counts_by_key(events: DataFrame, *,
                           key_col: str = "user_id",
                           window: str = "1 hour",
                           watermark: str | None = None) -> DataFrame:
    """Per-window per-key event counts ``(window_start, key, n)`` —
    the EXACT relation behind windowed top-k / heavy-hitter readouts,
    in the family's store-the-relation design: ONE stateful
    aggregation that runs identically on batch and streaming inputs
    (append mode under a watermark; late rows fold into their
    still-open window's count; state = one row per (window, active
    key), evictable once the watermark passes the window end). The
    ranked readout is the stateless :func:`topk_finalize` at query
    time; counts merge across days/sources by union + re-sum.

    When exact per-key state is too wide for the key cardinality, the
    sketch path is :func:`windowed_cms` (bounded state, ±εN error).
    """
    src = events
    if watermark is not None:
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    return (src.where(F.col(key_col).isNotNull())
            .groupBy(F.window("ts", window).alias("w"), key_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col(key_col), F.col("n")))


def topk_finalize(counts: DataFrame, *, k: int,
                  key_col: str = "user_id") -> DataFrame:
    """Stateless read-time top-``k`` over a
    :func:`windowed_counts_by_key` relation: rank per window by
    ``(n DESC, key ASC)`` — the integer-count/smallest-key total order
    that makes the readout cross-engine hashable. The rank window runs
    over the COUNT relation (windows × active keys), never the raw
    events."""
    from pyspark.sql import Window
    if k < 1:
        raise ValueError("topk_finalize: k must be >= 1")
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col(key_col))
    return (counts.withColumn(
                "rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k))


def sessionize(events: DataFrame, *, gap_minutes: int = 30,
               tie_break: str | None = "event_id") -> DataFrame:
    """Per-user session ids: a new session starts after a gap larger
    than ``gap_minutes`` — the classic lag/cumsum window pattern
    (batch; the streaming twin would be applyInPandasWithState).
    ``tie_break`` makes ordering deterministic for equal timestamps."""
    from pyspark.sql import Window
    order = ["ts"] + ([tie_break] if tie_break
                      and tie_break in events.columns else [])
    w = Window.partitionBy("user_id").orderBy(*order)
    # TIMESTAMP_NTZ won't cast straight to long; go via timestamp
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = (gap.isNull() | (gap > gap_minutes * 60)).cast("long")
    return (events.withColumn("_new", new_sess)
            .withColumn("session_seq", F.sum("_new").over(w))
            .drop("_new"))


def session_stats(events: DataFrame, *, gap_minutes: int = 30,
                  value_col: str = "value",
                  value_scale: int = 100) -> DataFrame:
    """Per-session aggregates over :func:`sessionize`'s output: one row
    per (user_id, session_seq) with ``n_events``, ``duration_s``
    (last − first event, truncated epoch seconds), ``sum_scaled``
    (integer-scaled value sum — exact, order-independent, hashable)
    and the first/last event ids.

    Plan note (free aggregation): the sessionize window already hash-
    partitioned by ``user_id``, which satisfies the clustered
    distribution the (user_id, session_seq) groupBy needs — Catalyst
    plans NO second exchange (pytest-pinned), so session stats cost
    one shuffle total, same as sessionize itself.
    """
    s = sessionize(events, gap_minutes=gap_minutes)
    epoch = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col(value_col) * value_scale).cast("long")
    return (s.withColumn("_e", epoch).withColumn("_c", cents)
            .groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 (F.max("_e") - F.min("_e")).cast("long")
                 .alias("duration_s"),
                 F.sum("_c").cast("long").alias("sum_scaled"),
                 F.min("event_id").cast("long").alias("first_event_id"),
                 F.max("event_id").cast("long").alias("last_event_id")))


def stream_from_directory(spark, path: str, schema) -> DataFrame:
    """File-source stream (the test harness feeds parquet files in)."""
    return spark.readStream.schema(schema).parquet(path)
