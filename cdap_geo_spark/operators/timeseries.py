"""Time-series relational operators: as-of join, rolling window stats,
ordered funnel.

The reference (cdap_geo) is spatial-only; these are the event-time
twins of its join family — the operators a 100 TB/day event feed needs
next to the spatial ones, built on the same principle: express the
semantics as ONE keyed shuffle plus JVM window/aggregate work, never an
inequality join Spark would plan as a broadcast-nested-loop.

Scale notes (per operator):

- :func:`asof_join` — the classic point-in-time join ("for each left
  event, the most recent right event at or before it"). Naively an
  inequality theta-join (BroadcastNestedLoopJoin — quadratic, undistri-
  butable); here it is the union-then-window plan: tag sides, union
  (NO join), ONE exchange by key, and a per-key running
  ``last(ignorenulls)`` carries the right payload forward in event-time
  order. Cost is one shuffle of |L|+|R| narrow rows; the window is a
  linear spillable scan per key.
- :func:`rolling_stats` — per-event aggregates over a trailing
  event-time range ``[ts - window, ts]`` within a key: one exchange by
  key, then a JVM RANGE-frame window (sliding aggregator, linear).
  Sums are computed on integer-scaled values so results are exact and
  order-independent (cross-engine hashable).
- :func:`funnel_steps` — ordered-step conversion: each step reduces the
  event relation to ONE row per key (min event time satisfying the
  step order) BEFORE joining with the previous step, so every join is
  key-dimension-sized (AQE broadcasts it); events are never joined to
  events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_US = 1_000_000


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              ts_col: str = "ts", right_cols: list[str] | None = None,
              tie_col: str | None = None,
              prefix: str = "r_") -> DataFrame:
    """As-of join: every ``left`` row, plus the ``right`` row with the
    greatest ``ts_col`` <= the left row's ``ts_col`` sharing ``on``
    (NULLs when no prior right row exists — left-join semantics).

    Ties: a right row at exactly the left row's timestamp DOES match
    (the ``>=`` convention of DuckDB/pandas ``merge_asof``); among
    right rows sharing the same timestamp the one with the greatest
    ``tie_col`` wins (deterministic — pass the right side's unique id).

    Returns all ``left`` columns plus ``{prefix}{c}`` for each
    ``right_cols`` entry, ``{prefix}{ts_col}`` and ``asof_lag_us``
    (microseconds from matched right row to left row, NULL unmatched).

    Plan shape (the point of the operator): tag sides 0=right 1=left,
    ``unionByName`` — NOT a join — then one window per key ordered by
    ``(ts, side, tie)`` with ``last(payload, ignorenulls=True)`` rows
    UNBOUNDED PRECEDING..CURRENT. Right rows sort before left rows at
    equal timestamps, so the inclusive match falls out of the sort
    order. One exchange total; no inequality join anywhere.
    """
    rc = list(right_cols or [])
    if tie_col is None:
        tie_col = rc[0] if rc else ts_col
    lcols = left.columns
    r = right.select(
        F.col(on).alias(on),
        F.col(ts_col).alias("_ats"),
        F.col(tie_col).alias("_atie"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_rus"),
        *[F.col(c).alias(f"_rp_{c}") for c in rc],
    ).withColumn("_side", F.lit(0))
    lt = left.select(
        *lcols,
        F.col(ts_col).alias("_ats"),
        F.lit(None).cast(r.schema["_atie"].dataType).alias("_atie"),
    ).withColumn("_side", F.lit(1))
    u = lt.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(on)
         .orderBy(F.col("_ats").asc(), F.col("_side").asc(),
                  F.col("_atie").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(f"_rp_{c}", ignorenulls=True).over(w)
               .alias(f"{prefix}{c}") for c in rc]
    out = (u.select("*",
                    *carried,
                    F.last("_rus", ignorenulls=True).over(w).alias("_mus"))
            .where(F.col("_side") == 1))
    lag = (F.unix_micros(F.col("_ats").cast("timestamp"))
           - F.col("_mus")).alias("asof_lag_us")
    return out.select(
        *lcols,
        *[F.col(f"{prefix}{c}") for c in rc],
        F.col("_mus").cast("long").alias(f"{prefix}{ts_col}_us"),
        lag,
    )


def rolling_stats(events: DataFrame, *, key: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  window_seconds: int = 3600,
                  value_scale: int = 100) -> DataFrame:
    """Per-event trailing-window aggregates: for every event, the count
    and (integer-scaled) sum of ``value_col`` over events of the same
    ``key`` in the closed event-time range ``[ts - window, ts]``.

    The sum is computed on ``round(value * value_scale)`` as BIGINT —
    exact, order-independent, and therefore cross-engine hashable
    (floating-point range sums are evaluated in engine-specific order).

    One exchange by ``key``; the RANGE frame runs as a JVM sliding
    aggregator over the sorted partition (linear, spillable) — the
    trailing window never materializes row multiples the way a
    self-join ``ON l.ts BETWEEN r.ts AND r.ts + W`` would.
    """
    cents = F.round(F.col(value_col) * value_scale).cast("long")
    base = events.withColumn("_us", F.unix_micros(
        F.col(ts_col).cast("timestamp"))).withColumn("_cents", cents)
    w = (Window.partitionBy(key).orderBy("_us")
         .rangeBetween(-window_seconds * _US, 0))
    return (base.select(
        *events.columns,
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        F.sum("_cents").over(w).alias("sum_scaled"),
    ))


def interval_join(points: DataFrame, intervals: DataFrame, *,
                  point_col: str, start_col: str, end_col: str,
                  bin_width: int) -> DataFrame:
    """1D range join: every (point row, interval row) pair with
    ``start <= point <= end`` (inclusive ends; all three columns
    numeric, e.g. epoch seconds). Column names must not collide
    between the two inputs.

    Spark plans a raw BETWEEN join as BroadcastNestedLoopJoin — the
    classic scale killer. This is the bin-replication plan instead:
    intervals explode to the fixed-width bins they cover
    (``sequence``), points map to their single bin, and the join is a
    plain equi-join on bin + residual BETWEEN filter. A point lies in
    exactly one bin, so each qualifying pair appears exactly once — no
    dedup pass.

    Cost model (pick ``bin_width`` accordingly): the exchange carries
    ``|P| + Σ ceil(len_i / bin_width)`` rows — wider bins replicate
    intervals less but make the residual filter discard more; the
    standard choice is the median interval length. A degenerate
    interval spanning the whole domain replicates into every bin —
    pre-split such outliers (or raise ``bin_width``); the operator is
    correct either way.
    """
    if bin_width <= 0:
        raise ValueError("interval_join: bin_width must be positive")
    b = F.lit(int(bin_width)).cast("long")
    pts = points.withColumn(
        "_bin", F.floor(F.col(point_col) / b).cast("long"))
    ivs = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.col(start_col) / b).cast("long"),
            F.floor(F.col(end_col) / b).cast("long"))))
    return (pts.join(ivs, "_bin")
            .where((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) <= F.col(end_col)))
            .drop("_bin"))


def outlier_flags(events: DataFrame, *, group: str = "event_type",
                  value_col: str = "value", k: int = 3,
                  value_scale: int = 100) -> DataFrame:
    """Per-row z-score outlier flag — |x - mean| > k·stddev within the
    row's ``group`` — computed in EXACT integer algebra so the flag is
    deterministic and cross-engine hashable (a float mean/stddev is
    schedule-dependent in the last ulp, and a row sitting exactly at
    the threshold would flip).

    With ``x`` integer-scaled (``round(value·scale)``), ``s = Σx``,
    ``q = Σx²``, ``n`` per group::

        |x - s/n| > k·sqrt((n·q - s²)/n²)
        ⟺  (n·x - s)²  >  k²·(n·q - s²)        -- all BIGINT, exact

    Adds ``is_outlier`` (boolean; population stddev, ties resolve to
    False by the strict >). Plan: one map-side-partial groupBy bounded
    by the group dimension, broadcast back onto the rows — the row
    relation shuffles nowhere.
    """
    x = F.round(F.col(value_col) * value_scale).cast("long")
    base = events.withColumn("_x", x)
    stats = base.groupBy(group).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_q"))
    lhs = (F.col("_n") * F.col("_x") - F.col("_s"))
    rhs = F.lit(k * k) * (F.col("_n") * F.col("_q")
                          - F.col("_s") * F.col("_s"))
    return (base.join(F.broadcast(stats), group)
            .withColumn("is_outlier", (lhs * lhs) > rhs)
            .drop("_x", "_n", "_s", "_q"))


def grouped_ols(df: DataFrame, *, group: str, x_col: str, y_col: str,
                x_scale: int = 1, y_scale: int = 100,
                round_dp: int = 6) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y`` on ``x`` in ONE
    aggregate pass — the closed form::

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Inputs are integer-scaled, so every Σ is an exact BIGINT — the
    aggregation is order-independent and the final ratio divides the
    SAME two integers in both engines (one IEEE double division +
    round(``round_dp``), deterministic). This is how a regression can
    be value-hash verified cross-engine at all; a naive double Σxy
    differs per schedule.

    Emits exact ``n, sx, sy, sxy, sxx`` (BIGINT, in scaled units)
    alongside rounded ``slope``/``intercept`` (original units).
    Plan: one groupBy with map-side partials — a single pass, no
    iteration, exchange bounded by the group dimension. Groups with
    zero x-variance get NULL slope/intercept.

    Magnitude contract: the determinant term ``n·Σx²`` must fit in
    BIGINT — with ``|x·x_scale| <= B`` that needs ``n·B < ~3.0e9`` per
    group (e.g. hour-of-day x, B=23: fine past 1e8 rows/group; raw
    epoch seconds overflow fast — center or bucket x first).
    """
    xs = F.round(F.col(x_col) * x_scale).cast("long")
    ys = F.round(F.col(y_col) * y_scale).cast("long")
    base = df.select(F.col(group), xs.alias("_x"), ys.alias("_y"))
    agg = base.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"), F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"))
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope_scaled = num.cast("double") / det.cast("double")
    # scaled slope is d(y·ys)/d(x·xs) => original slope × ys/xs
    slope = F.when(det != 0,
                   F.round(slope_scaled * x_scale / y_scale, round_dp))
    intercept = F.when(det != 0, F.round(
        (F.col("sy").cast("double")
         - slope_scaled * F.col("sx").cast("double"))
        / (F.col("n").cast("double") * y_scale), round_dp))
    return agg.select(group, "n", "sx", "sy", "sxy", "sxx",
                      slope.alias("slope"),
                      intercept.alias("intercept"))


def grouped_gini(df: DataFrame, *, group: str,
                 value_col: str) -> DataFrame:
    """Per-group Gini coefficient of a NON-NEGATIVE integer measure —
    the concentration / inequality diagnostic (is one source hogging
    the token budget?). Uses the exact rank formula over ascending
    values::

        G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)

    Every Σ is an exact BIGINT; tied values make ``Σ i·x_i``
    assignment-independent (equal x across a rank run contributes
    x·Σi whatever the permutation), so ``row_number`` ties cannot
    flip the hash. The statistic is ONE micro-rounded double over two
    exact integers. Returns ``(group, n, sum_x, gini_micro)``;
    zero-sum groups emit NULL.

    Plan: one ranking window per group + one map-side-collapsing
    aggregation — the raw relation shuffles once.
    Magnitude contract: ``2·Σ i·x_i <= 2·n²·max(x)`` must fit int64.
    """
    from pyspark.sql import Window
    base = df.where(F.col(value_col).isNotNull()
                    & (F.col(value_col) >= 0)) \
             .select(F.col(group), F.col(value_col).cast("long")
                     .alias("_x"))
    r = base.withColumn("_i", F.row_number().over(
        Window.partitionBy(group).orderBy("_x")))
    agg = r.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sum_x"),
        F.sum(F.col("_i") * F.col("_x")).alias("_sixi"))
    num = (F.lit(2) * F.col("_sixi")
           - (F.col("n") + 1) * F.col("sum_x"))
    den = F.col("n") * F.col("sum_x")
    gini = F.when(den > 0,
                  F.round(F.lit(1_000_000.0)
                          * (num.cast("double") / den.cast("double")))
                  .cast("long"))
    return agg.select(group, F.col("n").cast("long").alias("n"),
                      F.col("sum_x").cast("long").alias("sum_x"),
                      gini.alias("gini_micro"))


def grouped_corr(df: DataFrame, *, group: str, x_col: str, y_col: str,
                 x_scale: int = 1, y_scale: int = 100) -> DataFrame:
    """Per-group Pearson correlation in ONE aggregate pass — the
    :func:`grouped_ols` sibling for association STRENGTH::

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

    Every Σ is an exact BIGINT over integer-scaled inputs (the
    aggregation is order-independent); the statistic is one double
    expression over those integers — and ``sqrt`` is safe where
    ``ln``/``exp`` are not, because IEEE 754 specifies it correctly
    rounded, so both engines compute the identical double. Emitted as
    ``corr_micro`` (micro-rounded; scale factors cancel in r). Groups
    with zero variance on either axis emit NULL.

    Returns ``(group, n, corr_micro)``. Plan: one map-side-combining
    groupBy — exchange bounded by the group dimension.
    Magnitude contract (same as grouped_ols): ``n·Σy²`` must fit in
    BIGINT — with ``|y·y_scale| <= B`` that needs ``n²·B² < 9.2e18``.
    """
    xs = F.round(F.col(x_col) * x_scale).cast("long")
    ys = F.round(F.col(y_col) * y_scale).cast("long")
    base = df.where(F.col(x_col).isNotNull()
                    & F.col(y_col).isNotNull()) \
             .select(F.col(group), xs.alias("_x"), ys.alias("_y"))
    agg = base.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"), F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"))
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double"))
    corr = F.when((dx > 0) & (dy > 0),
                  F.round(F.lit(1_000_000.0) * r).cast("long"))
    return agg.select(group, F.col("n").cast("long").alias("n"),
                      corr.alias("corr_micro"))


def winsorize(df: DataFrame, *, group: str, value_col: str,
              lo_q: float = 0.05, hi_q: float = 0.95,
              value_scale: int = 100) -> DataFrame:
    """Per-group winsorization (outlier clamping): every value clipped
    to the group's EXACT [lo_q, hi_q] order statistics, computed by the
    deterministic rank rule ``q-th quantile = value at rank
    ceil(q·n)`` over integer-scaled values — no interpolation, no
    floating point, so the clamps (and therefore every output row) are
    cross-engine hashable.

    Plan: one window shuffle by ``group`` ranks the values; the two
    clamp bounds reduce to ONE row per group (map-side partials) and
    broadcast back onto the rows — the row relation shuffles once
    total. Adds ``{value_col}_w`` (clamped, original units: scaled
    BIGINT divided back exactly at read) and keeps the input columns.

    For corpora where even one window pass per group is too wide,
    the sketch path (``operators/sketch.hist_quantiles``) gives the
    approximate version with an exchange bounded by the sketch.
    """
    if not 0 <= lo_q <= hi_q <= 1:
        raise ValueError("winsorize: need 0 <= lo_q <= hi_q <= 1")
    from pyspark.sql import Window
    x = F.round(F.col(value_col) * value_scale).cast("long")
    base = df.withColumn("_x", x)
    w = Window.partitionBy(group).orderBy("_x")
    ranked = base.withColumn("_r", F.row_number().over(w)) \
                 .withColumn("_n", F.count(F.lit(1)).over(
                     Window.partitionBy(group)))
    lo_rank = F.greatest(F.lit(1), F.ceil(F.lit(lo_q) * F.col("_n")))
    hi_rank = F.greatest(F.lit(1), F.ceil(F.lit(hi_q) * F.col("_n")))
    bounds = (ranked
              .select(group, "_x", "_r",
                      lo_rank.alias("_lr"), hi_rank.alias("_hr"))
              .groupBy(group)
              .agg(F.max(F.when(F.col("_r") == F.col("_lr"), F.col("_x")))
                    .alias("_lo"),
                   F.max(F.when(F.col("_r") == F.col("_hr"), F.col("_x")))
                    .alias("_hi")))
    clamped = (F.least(F.greatest(F.col("_x"), F.col("_lo")),
                       F.col("_hi"))
               .cast("double") / value_scale)
    return (base.join(F.broadcast(bounds), group)
            .withColumn(f"{value_col}_w", clamped)
            .drop("_x", "_lo", "_hi"))


def resample_locf(events: DataFrame, *, key: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  step_seconds: int = 3600, tie_col: str = "event_id",
                  value_scale: int = 100) -> DataFrame:
    """Fixed-step resampling with last-observation-carried-forward gap
    fill: one output row per ``key`` per ``step_seconds`` bucket from
    the key's first observed bucket to its last, carrying the most
    recent observation forward across empty buckets.

    Within a bucket "the last observation" is deterministic: greatest
    ``(ts, tie_col)`` wins (pass the row's unique id). Values are
    integer-scaled (``x = round(value·scale)`` BIGINT) so the filled
    series is cross-engine value-hashable — emitted as ``value_scaled``
    plus an ``observed`` flag.

    Plan: bucket ids are exact integer division of ``unix_micros`` (no
    window); per-bucket last is ONE keyed aggregation via
    ``max_by(x, (ts, tie))``; each key's dense bucket spine is
    ``sequence(min_b, max_b)`` EXPLODED map-side from a key-dimension
    aggregate (never a driver loop, never a cross join with a
    calendar table); the fill is a per-key running ``last(ignorenulls)``
    window. Two data-sized exchanges total — (key, bucket) for the agg
    and key for the fill — both on the declared keys, AQE-sized.
    Spine size is the output size (Σ per-key bucket span), the
    inherent cost of dense resampling; at 100 TB choose
    ``step_seconds`` so that output, not this operator, is the bound.
    """
    if step_seconds <= 0:
        raise ValueError("resample_locf: step_seconds must be > 0")
    step_us = step_seconds * _US
    x = F.round(F.col(value_col) * value_scale).cast("long")
    b = events.select(
        F.col(key),
        F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {step_us}")
         .alias("bucket"),
        x.alias("_x"),
        F.struct(F.col(ts_col).alias("t"),
                 F.col(tie_col).alias("i")).alias("_ord"))
    ob = b.groupBy(key, "bucket").agg(
        F.max_by("_x", "_ord").alias("_obs"))
    spine = (ob.groupBy(key)
             .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
             .select(key, F.explode(F.sequence("_lo", "_hi")).alias("bucket")))
    w = Window.partitionBy(key).orderBy("bucket") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (spine.join(ob, [key, "bucket"], "left")
            .select(key, "bucket",
                    F.last("_obs", ignorenulls=True).over(w)
                     .alias("value_scaled"),
                    F.col("_obs").isNotNull().alias("observed")))


def retention_cohorts(events: DataFrame, *, key: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Classic cohort retention: cohort = the key's FIRST active day;
    one output row per (cohort_day, offset_days) with the number of
    cohort keys active that day —
    ``(cohort_day:date, offset_days:int, n_active:long)``.

    Scale shape: the first move is ``distinct(key, day)`` — the only
    events-sized shuffle, and map-side partials collapse each task to
    its distinct pairs before the exchange; everything after runs on
    the activity relation (|keys| × |active days| rows): the
    first-day aggregate is key-dimension sized (AQE broadcasts it back)
    and the final groupBy needs plain COUNT(*), not COUNT DISTINCT,
    because (key, day) is already unique by construction.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp")).alias("_d")
    active = events.select(F.col(key).alias("_k"), day).distinct()
    first = active.groupBy("_k").agg(F.min("_d").alias("cohort_day"))
    return (active.join(first, "_k")
            .groupBy("cohort_day",
                     F.datediff(F.col("_d"), F.col("cohort_day"))
                     .alias("offset_days"))
            .agg(F.count(F.lit(1)).alias("n_active")))


def funnel_steps(events: DataFrame, steps: list[str], *,
                 key: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: per ``key``, the first time each step in
    ``steps`` is reached IN ORDER (step i+1 counts only at or after the
    key's step-i time). Returns one row per step index:

    ``(step:int, name:string, n_keys:long, sum_lag_us:long)`` where
    ``n_keys`` counts keys reaching the step and ``sum_lag_us`` totals
    the microseconds from the key's previous-step time (0 for step 1) —
    integer-exact, so mean conversion lag is ``sum_lag_us / n_keys``
    computable by the consumer without FP ambiguity.

    Scale shape: each step is ``filter(type) → groupBy(key).min(ts)``
    — map-side partials collapse events to one row per key per task
    before the exchange, and the step-to-step joins are key-dimension
    sized (AQE broadcasts them). Events never join events, so cost is
    ``len(steps)`` cheap aggregates whatever the corpus size.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(F.col(key).alias("_k"),
                       F.col(type_col).alias("_t"), us.alias("_us"))
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, name in enumerate(steps):
        step_ev = ev.where(F.col("_t") == name)
        if prev is None:
            cur = step_ev.groupBy("_k").agg(F.min("_us").alias("_cus")) \
                         .withColumn("_pus", F.col("_cus"))
        else:
            cur = (step_ev.join(prev.select("_k", F.col("_cus")
                                            .alias("_pus")), "_k")
                   .where(F.col("_us") >= F.col("_pus"))
                   .groupBy("_k", "_pus").agg(F.min("_us").alias("_cus")))
        reached.append(cur.select(
            F.lit(i + 1).alias("step"), F.lit(name).alias("name"),
            "_cus", "_pus"))
        prev = cur
    allr = reached[0]
    for r in reached[1:]:
        allr = allr.unionByName(r)
    return (allr.groupBy("step", "name")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum(F.col("_cus") - F.col("_pus")).alias("sum_lag_us"))
            .orderBy("step"))


def transition_counts(events: DataFrame, *, key: str = "user_id",
                      ts_col: str = "ts", state_col: str = "event_type",
                      tie_col: str = "event_id") -> DataFrame:
    """Markov transition matrix over each key's event-time-ordered
    stream: ``(from_state, to_state, n)`` counting consecutive pairs
    within a key — the clickstream path-mining primitive.

    Ordering is total (``ts`` then ``tie_col``) so the LAG is
    deterministic under equal timestamps; counts are exact BIGINTs.
    Plan: ONE exchange by key feeds the lag window; the transition
    aggregation collapses map-side to the (states²)-sized matrix.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tie_col)
    return (events
            .withColumn("_prev", F.lag(state_col).over(w))
            .where(F.col("_prev").isNotNull())
            .groupBy(F.col("_prev").alias("from_state"),
                     F.col(state_col).alias("to_state"))
            .agg(F.count(F.lit(1)).alias("n")))


def grouped_mode(df: DataFrame, *, group: str, value_col: str) -> DataFrame:
    """Per-group mode: the most frequent ``value_col``; ties break to
    the SMALLEST value (deterministic for any orderable type).
    Returns ``(group, mode, n)``.

    Plan: one keyed count aggregation (map-side partials) collapses
    the data to the (group, distinct value) relation; the argmax runs
    as a window over THAT reduced relation — the raw rows shuffle
    once, on (group, value).
    """
    counts = (df.groupBy(group, value_col)
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy(group).orderBy(F.desc("n"), F.asc(value_col))
    return (counts.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select(group, F.col(value_col).alias("mode"), "n"))


def trajectory_segments(events: DataFrame, *, key: str = "user_id",
                        ts_col: str = "ts", x_col: str = "x",
                        y_col: str = "y", max_jump: int = 100_000,
                        tie_col: str = "event_id") -> DataFrame:
    """Trajectory segmentation — the SPATIAL twin of sessionize: each
    key's event-time-ordered point stream splits wherever the jump
    from the previous point exceeds ``max_jump``; returns one row per
    segment: ``(key, seg, n_events, first_us, last_us, first_id,
    last_id)``.

    Exactness: the break test is on exact integer SQUARED distance
    (``dx² + dy² > max_jump²`` — no sqrt), ordering is total
    (ts, tie), timestamps exact micros — every output column BIGINT.

    Plan: ONE exchange by key; LAG + a running SUM over the break
    flags assigns segment ids inside the same window partitioning, and
    the per-segment aggregation groups on (key, seg) — Catalyst plans
    no second data-sized exchange for it when the window partitioning
    already satisfies the clustering (the session_stats lesson).
    """
    w = Window.partitionBy(key).orderBy(ts_col, tie_col)
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    jump = (dx * dx + dy * dy) > (int(max_jump) * int(max_jump))
    brk = F.when(jump | F.lag(x_col).over(w).isNull(), 1).otherwise(0)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    seg = (events
           .withColumn("_b", brk)
           .withColumn("seg", F.sum("_b").over(
               w.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)))
           .withColumn("_us", us))
    return (seg.groupBy(key, "seg")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("_us").alias("first_us"),
                 F.max("_us").alias("last_us"),
                 F.min_by(F.col(tie_col), F.struct("_us", tie_col))
                 .alias("first_id"),
                 F.max_by(F.col(tie_col), F.struct("_us", tie_col))
                 .alias("last_id")))


def grouped_percentiles(df: DataFrame, *, group: str, value_col: str,
                        qs: list[float] = (0.5, 0.9, 0.99),
                        value_scale: int = 100) -> DataFrame:
    """EXACT per-group percentiles by the deterministic rank rule
    ``q-th percentile = value at rank ceil(q·n)`` over integer-scaled
    values — the exact counterpart of the sketch path
    (``operators/sketch.hist_quantiles``): no interpolation, no float
    quantile, so every output is a BIGINT the oracle hashes directly.
    Returns one row per group: ``(group, n, p<q>...)`` with percentile
    columns in scaled units.

    Plan: ONE window shuffle ranks each group's rows; the percentile
    picks collapse to one row per group via map-side-partial
    conditional aggregates (same shape as :func:`winsorize`'s bounds).
    Use the sketch path when even one ranking pass per group is too
    wide — this one is for when exactness is the requirement (SLA
    reporting, regression gates).
    """
    if not qs:
        raise ValueError("grouped_percentiles: qs must be non-empty")
    if not all(0 < q <= 1 for q in qs):
        raise ValueError("grouped_percentiles: each q must be in (0, 1]")
    from pyspark.sql import Window
    base = df.withColumn(
        "_x", F.round(F.col(value_col) * value_scale).cast("long"))
    ranked = (base.withColumn(
        "_r", F.row_number().over(
            Window.partitionBy(group).orderBy("_x")))
        .withColumn("_n", F.count(F.lit(1)).over(
            Window.partitionBy(group))))
    aggs = [F.max("_n").cast("long").alias("n")]
    for q in qs:
        rank = F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * F.col("_n")))
        name = f"p{str(q).replace('0.', '').replace('.', '_')}"
        aggs.append(F.max(F.when(F.col("_r") == rank, F.col("_x")))
                    .cast("long").alias(name))
    return ranked.groupBy(group).agg(*aggs)


def ewma_bounded(df: DataFrame, *, key: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 value_col: str = "value", window: int = 8,
                 value_scale: int = 100) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) per key over a
    BOUNDED window of the last ``window`` observations — the smoothing
    primitive (trend lines, rate limiters, anomaly baselines) made
    cross-engine exact. Returns one row per event:
    ``(key, id, ewma_u)``.

    Why bounded: the textbook EWMA is an unbounded recurrence whose
    float state is schedule-dependent; truncating at ``window`` lags
    makes the weights a FINITE geometric series ``2^(window-1-j)`` for
    lag j, so the numerator ``Σ w_j·x_j`` and denominator ``Σ w_j``
    (partial at stream start) are exact BIGINTs, and the output is ONE
    double divide micro-rounded — the repo's standard determinism
    contract. With α = 1/2 the truncation error vs the unbounded EWMA
    is < 2^-window of the oldest mass (< 0.4 % at the default 8).

    Plan: ``window`` stacked LAGs under the total (ts, id) order in
    ONE keyed exchange — the :func:`path_topk` shape; no join, no
    second shuffle, map-side everything after the sort.

    Magnitude contract: ``10^6 · Σ w_j·x_j`` must stay within 2^53 —
    holds for scaled values to ~3·10^7 at window 8.
    """
    if window < 1 or window > 62:
        raise ValueError("ewma_bounded: window must be in [1, 62]")
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    base = df.where(F.col(value_col).isNotNull()).withColumn(
        "_x", F.round(F.col(value_col) * value_scale).cast("long"))
    cur = base
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(window):
        xj = F.col("_x") if j == 0 else F.lag("_x", j).over(w)
        wj = 1 << (window - 1 - j)
        num = num + F.coalesce(xj * F.lit(wj), F.lit(0))
        den = den + F.when(xj.isNotNull(), F.lit(wj)).otherwise(0)
    out = cur.select(F.col(key), F.col(id_col),
                     F.round(F.lit(1_000_000.0) * num / den)
                      .cast("long").alias("ewma_u"))
    return out


def ewma_oracle_sql(*, table_expr: str = "events",
                    key: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", value_col: str = "value",
                    window: int = 8, value_scale: int = 100) -> str:
    """ANSI-SQL twin of :func:`ewma_bounded` — the same stacked LAGs
    and the identical one-double expression shape."""
    lags, wts = [], []
    for j in range(window):
        xj = ("x" if j == 0
              else f"LAG(x, {j}) OVER (PARTITION BY {key} "
                   f"ORDER BY {ts_col}, {id_col})")
        lags.append(f"COALESCE({xj} * {1 << (window - 1 - j)}, 0)")
        wts.append(f"CASE WHEN {xj} IS NOT NULL "
                   f"THEN {1 << (window - 1 - j)} ELSE 0 END")
    return f"""
      WITH b AS (
        SELECT {key}, {ts_col}, {id_col},
               CAST(ROUND({value_col} * {value_scale}) AS BIGINT) AS x
        FROM {table_expr} WHERE {value_col} IS NOT NULL
      )
      SELECT {key}, {id_col},
             CAST(ROUND(1000000.0 * ({" + ".join(lags)})
                        / ({" + ".join(wts)})) AS BIGINT) AS ewma_u
      FROM b
    """


def interval_union(df: DataFrame, *, key: str,
                   start_col: str, end_col: str,
                   id_col: str) -> DataFrame:
    """Per-key union of possibly-overlapping intervals — the classic
    coverage/uptime computation (SLA windows, session coverage,
    sensor duty cycle): merge overlapping [start, end) intervals into
    islands, report ``(key, n_intervals, n_islands, covered)`` with
    ``covered`` = total length of the union. ENTIRELY integer
    arithmetic over the caller's units — no float, no rounding
    contract.

    The distributed shape: ONE keyed window ordering carries all
    three steps — an island starts where ``start > max(previous
    ends)`` (running max over the preceding frame), island ids are
    the running sum of those starts, and the final aggregation
    composes per-island extents map-side. Intervals with
    ``end <= start`` are dropped (documented: zero-length contributes
    nothing to a half-open union). Ties in start are ordered by
    ``id_col`` so the running max is deterministic (the max itself is
    order-insensitive; the tie rule only pins the frame).
    """
    from pyspark.sql import Window
    base = df.where(F.col(start_col).isNotNull()
                    & F.col(end_col).isNotNull()
                    & (F.col(end_col) > F.col(start_col))) \
        .select(F.col(key), F.col(id_col).alias("_id"),
                F.col(start_col).cast("long").alias("_s"),
                F.col(end_col).cast("long").alias("_e"))
    w = Window.partitionBy(key).orderBy("_s", "_id")
    prev_max = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    marked = base.withColumn(
        "_new", F.when(prev_max.isNull()
                       | (F.col("_s") > prev_max), 1).otherwise(0))
    islands = marked.withColumn(
        "_isl", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    per_island = (islands.groupBy(key, "_isl")
                  .agg(F.count(F.lit(1)).alias("_n"),
                       F.min("_s").alias("_is"), F.max("_e").alias("_ie")))
    return (per_island.groupBy(key)
            .agg(F.sum("_n").cast("long").alias("n_intervals"),
                 F.count(F.lit(1)).cast("long").alias("n_islands"),
                 F.sum(F.col("_ie") - F.col("_is")).cast("long")
                  .alias("covered")))


def path_length(df: DataFrame, *, key: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-key traveled path length over the event-time-ordered point
    stream — the mobility companion of :func:`trajectory_segments`
    (which deliberately stays on SQUARED distances; this op needs the
    root). Returns ``(key, n_steps, path_u)`` with the length in
    micro-units.

    Cross-engine exactness hinges on one fact: IEEE 754 specifies
    ``sqrt`` CORRECTLY ROUNDED (unlike ln/exp, which vary by libm), so
    with ``dx² + dy²`` an exact BIGINT (< 2^53) both engines compute
    the bit-identical step length; each step is micro-rounded to
    BIGINT and the per-key sum is then order-independent. Plan: one
    keyed exchange carries the LAG window and the map-side-collapsing
    sum — nothing else.

    Magnitude contract: coordinates must satisfy ``dx²+dy² < 2^53``
    (|Δ| < ~6.7e7) and ``Σ step_u`` within int64.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    base = df.where(F.col(ts_col).isNotNull()).select(
        F.col(key), F.col(ts_col), F.col(id_col),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"))
    dx = F.col("_x") - F.lag("_x", 1).over(w)
    dy = F.col("_y") - F.lag("_y", 1).over(w)
    d2 = (dx * dx + dy * dy).cast("long")
    step = F.round(F.lit(1_000_000.0)
                   * F.sqrt(d2.cast("double"))).cast("long")
    stepped = base.withColumn("_s", step)
    return (stepped.groupBy(key)
            .agg(F.count("_s").cast("long").alias("n_steps"),
                 F.coalesce(F.sum("_s"), F.lit(0)).cast("long")
                  .alias("path_u")))


def od_matrix(df: DataFrame, *, key: str = "user_id",
              ts_col: str = "ts", id_col: str = "event_id",
              x_col: str = "x", y_col: str = "y",
              cell: int = 100_000) -> DataFrame:
    """Origin-destination matrix — the mobility-analytics staple: each
    key's FIRST and LAST position under the total (ts, id) order,
    snapped to integer grid cells, counted per (origin cell, dest
    cell). Returns ``(o_cx, o_cy, d_cx, d_cy, n_keys)``, all BIGINT —
    float-free.

    Plan (the scale point): no window at all — the endpoints come from
    ``min_by``/``max_by`` keyed on the (ts, id) struct, which
    aggregates WITH MAP-SIDE PARTIALS (a per-key sort window would
    shuffle every event row into a sort; min_by ships one candidate
    per key per task). One keyed exchange to the per-key endpoints,
    one dimension-sized exchange to the OD counts. Deterministic
    because (ts, id) is unique per key. Coordinates must be
    non-negative integers (div truncation contract, as
    :func:`cdap_geo_spark.operators.cluster.grid_cluster`).
    """
    if cell < 1:
        raise ValueError("od_matrix: cell must be >= 1")
    ordk = F.struct(F.col(ts_col), F.col(id_col))
    pos = F.struct(F.col(x_col).cast("long").alias("x"),
                   F.col(y_col).cast("long").alias("y"))
    ends = (df.where(F.col(ts_col).isNotNull())
            .groupBy(key)
            .agg(F.min_by(pos, ordk).alias("_o"),
                 F.max_by(pos, ordk).alias("_d")))
    c = lambda col: F.expr(f"{col} div {cell}")  # noqa: E731
    return (ends.select(c("_o.x").alias("o_cx"), c("_o.y").alias("o_cy"),
                        c("_d.x").alias("d_cx"), c("_d.y").alias("d_cy"))
            .groupBy("o_cx", "o_cy", "d_cx", "d_cy")
            .agg(F.count(F.lit(1)).cast("long").alias("n_keys")))


def seasonal_residuals(df: DataFrame, *, group: str = "event_type",
                       ts_col: str = "ts", id_col: str = "event_id",
                       value_col: str = "value", k: int = 50,
                       value_scale: int = 100) -> DataFrame:
    """Seasonal-baseline anomaly detection: each event's value against
    its (group, hour-of-day) mean — the decompose-and-flag shape
    (traffic dips, metering spikes) reduced to its exact core. Returns
    the top-``k`` events by absolute residual:
    ``(id, group, hour, resid_u)``.

    Exactness: the seasonal baseline is ``round(1e6·Σx/n)`` — ONE
    double over two exact BIGINTs per (group, hour) — and the residual
    ``1e6·x − baseline_u`` is then exact BIGINT arithmetic, so the
    ranking is schedule-independent; ties break on the unique event
    id. Plan: one keyed aggregation to the (group, hour) baseline
    dimension (24·|groups| rows, broadcast back), map-side residuals,
    bounded TakeOrdered — two exchanges total, neither data-sized
    beyond the raw scan.
    """
    if k < 1:
        raise ValueError("seasonal_residuals: k must be >= 1")
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(group).alias("_g"),
        F.hour(ts_col).cast("long").alias("hour"),
        F.round(F.col(value_col) * value_scale).cast("long").alias("_x"))
    dim = base.groupBy("_g", "hour").agg(
        F.round(F.lit(1_000_000.0) * F.sum("_x") / F.count(F.lit(1)))
         .cast("long").alias("_base_u"))
    resid = (base.join(F.broadcast(dim), ["_g", "hour"])
             .withColumn("resid_u",
                         F.lit(1_000_000) * F.col("_x") - F.col("_base_u")))
    return (resid.orderBy(F.abs(F.col("resid_u")).desc(), "_id")
            .limit(k)
            .select(F.col("_id").alias(id_col),
                    F.col("_g").alias(group), "hour", "resid_u"))


def quantile_bucketize(df: DataFrame, *, value_col: str,
                       n_bins: int = 10) -> DataFrame:
    """Exact equi-depth binning of an INTEGER column (Spark ML's
    QuantileDiscretizer with the approximation removed): computes the
    ``n_bins − 1`` global quantile edges by the deterministic
    integer-ceil rank rule ``r_i = ⌈i·n / n_bins⌉ = (i·n + n_bins − 1)
    DIV n_bins`` and assigns every row ``bin = #{edges e : x > e}``
    (ties to the lower bin). ENTIRELY integer arithmetic — no float
    anywhere, so the result hashes cross-engine unconditionally.
    Returns the input keyed rows with ``bin`` attached.

    Scale: the raw relation shuffles ONCE into the (value, count)
    histogram; the cumulative ranking runs over DISTINCT VALUES only
    (the :func:`grouped_mode` trick — a single-partition window, but
    bounded by the value domain, not the corpus; documented contract:
    the column must be low-cardinality relative to memory, true for
    lengths/counts/sizes). Edges are ``n_bins − 1`` rows collapsed to
    one array row and broadcast; assignment is a map-side array scan.
    """
    if n_bins < 2:
        raise ValueError("quantile_bucketize: n_bins must be >= 2")
    from pyspark.sql import Window
    base = df.where(F.col(value_col).isNotNull())
    hist = (base.groupBy(F.col(value_col).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_cnt")))
    cum = hist.withColumn(
        "_cum", F.sum("_cnt").over(
            Window.orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, 0)))
    tot = base.agg(F.count(F.lit(1)).alias("_n"))
    ii = F.explode(F.array(*[F.lit(i) for i in range(1, n_bins)])) \
        .alias("_i")
    ranks = (cum.crossJoin(F.broadcast(tot)).select("_v", "_cum", "_n", ii)
             .withColumn("_r", F.expr(
                 f"(_i * _n + {n_bins - 1}) div {n_bins}")))
    edges = (ranks.where(F.col("_cum") >= F.col("_r"))
             .groupBy("_i").agg(F.min("_v").alias("_e")))
    earr = edges.agg(F.array_sort(F.collect_list("_e")).alias("_edges"))
    out = base.crossJoin(F.broadcast(earr))
    bin_ = F.size(F.filter(
        F.col("_edges"), lambda e: F.col(value_col) > e)).cast("long")
    return out.withColumn("bin", bin_).drop("_edges")


def grouped_mad(df: DataFrame, *, group: str, value_col: str,
                value_scale: int = 100, k: int = 3) -> DataFrame:
    """Per-group robust outlier stats via median / MAD (median absolute
    deviation) — the outlier test that, unlike the z-score
    (:func:`outlier_flags`), is not itself dragged by the outliers it
    hunts. Returns one row per group: ``(group, n, med, mad,
    n_outliers)`` where ``n_outliers`` counts rows with
    ``|x − med| > k·MAD``. ENTIRELY float-free: values are
    integer-scaled, both medians use the deterministic ceil(q·n) rank
    rule of :func:`grouped_percentiles`, and the flag compares exact
    BIGINTs — every output hashes cross-engine with no rounding
    contract at all.

    Plan: two window rankings per group (values, then deviations) and
    two group-dimension broadcast joins — the deviation pass cannot be
    folded into the first window because MAD is a median OF A DERIVED
    column that needs the first median; 2 keyed exchanges total, both
    carrying the raw relation once.
    """
    if k < 1:
        raise ValueError("grouped_mad: k must be >= 1")
    from pyspark.sql import Window
    base = df.where(F.col(value_col).isNotNull()).withColumn(
        "_x", F.round(F.col(value_col) * value_scale).cast("long"))
    half = lambda n: F.greatest(  # noqa: E731 — shared rank expression
        F.lit(1), F.ceil(F.lit(0.5) * n).cast("long"))
    r1 = (base.withColumn("_r", F.row_number().over(
            Window.partitionBy(group).orderBy("_x")))
          .withColumn("_n", F.count(F.lit(1)).over(
            Window.partitionBy(group))))
    med = r1.groupBy(group).agg(
        F.max("_n").cast("long").alias("n"),
        F.max(F.when(F.col("_r") == half(F.col("_n")), F.col("_x")))
         .cast("long").alias("med"))
    dev = (base.join(F.broadcast(med), group)
           .withColumn("_d", F.abs(F.col("_x") - F.col("med"))))
    r2 = dev.withColumn("_r2", F.row_number().over(
        Window.partitionBy(group).orderBy("_d")))
    mad = r2.groupBy(group).agg(
        F.max(F.when(F.col("_r2") == half(F.col("n")), F.col("_d")))
         .cast("long").alias("mad"))
    flagged = dev.join(F.broadcast(mad), group)
    return (flagged.groupBy(group)
            .agg(F.max("n").cast("long").alias("n"),
                 F.max("med").cast("long").alias("med"),
                 F.max("mad").cast("long").alias("mad"),
                 F.sum(F.when(F.col("_d") > F.lit(k) * F.col("mad"),
                              1).otherwise(0))
                  .cast("long").alias("n_outliers")))


def _octant(dx, dy):
    """Exact 45°-sector index of an integer step vector.

    Sector s covers angles [45s°, 45(s+1)°) counter-clockwise from
    +x; every boundary lies on an axis or a diagonal, so membership
    is decided by INTEGER comparisons only — no atan2, no libm, no
    rounding contract. Zero vectors return NULL (caller filters).
    """
    return (
        F.when(dx.isNull() | dy.isNull(),    # first row per key (LAG)
               F.lit(None).cast("long"))
         .when((dx == 0) & (dy == 0), F.lit(None).cast("long"))
         .when((dx > 0) & (dy >= 0) & (dy < dx), 0)
         .when((dx > 0) & (dy >= dx), 1)
         .when((dx <= 0) & (dy > 0) & (dy > -dx), 2)
         .when((dy > 0) & (dy <= -dx), 3)
         .when((dx < 0) & (dy <= 0) & (dy > dx), 4)
         .when((dx < 0) & (dy <= dx), 5)
         .when((dx >= 0) & (dy < 0) & (dx < -dy), 6)
         .otherwise(7).cast("long"))


def heading_sectors(df: DataFrame, *, key: str = "user_id",
                    ts_col: str = "ts", id_col: str = "event_id",
                    x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-key histogram of movement directions in eight 45° sectors —
    the heading-distribution diagnostic (commute anisotropy, drift
    detection) computed WITHOUT atan2: every sector boundary is an
    axis or a 45° diagonal, so classification is exact integer
    comparison (see :func:`_octant`), bit-equal across engines.

    Returns ``(key, sector, n_steps)``; stationary steps (zero
    vector) are excluded. Plan: the keyed LAG window and the
    (key, sector) count share one exchange — the count's map-side
    partials collapse inside the window's partitioning.
    """
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    base = df.where(F.col(ts_col).isNotNull()).select(
        F.col(key), F.col(ts_col), F.col(id_col),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"))
    dx = F.col("_x") - F.lag("_x", 1).over(w)
    dy = F.col("_y") - F.lag("_y", 1).over(w)
    stepped = base.select(F.col(key), _octant(dx, dy).alias("sector"))
    return (stepped.where(F.col("sector").isNotNull())
            .groupBy(key, "sector")
            .agg(F.count(F.lit(1)).cast("long").alias("n_steps")))


def cell_dwell(df: DataFrame, *, key: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               x_col: str = "x", y_col: str = "y",
               cell: int = 100_000) -> DataFrame:
    """Per-grid-cell dwell time: each step's duration (time to the
    key's NEXT event, exact integer micros) is attributed to the cell
    of the step's STARTING point — the presence/exposure raster that
    OD matrices and heatmaps both coarsen away. Returns
    ``(cx, cy, n_stays, dwell_us)``, all BIGINT.

    Scale: the keyed LEAD window orders each key's events once; the
    (cx, cy) aggregation is the only other exchange and its partials
    collapse map-side. Coordinates must be non-negative integers
    (same truncating-div contract as ``zonal.cell_coverage``).
    """
    if cell < 1:
        raise ValueError("cell_dwell: cell must be >= 1")
    # order by the integer micros (monotone image of ts_col) — ts_col
    # itself is projected away below
    w = Window.partitionBy(key).orderBy("_t", id_col)
    base = df.where(F.col(ts_col).isNotNull()).select(
        F.col(key), F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"))
    nxt = F.lead("_t", 1).over(w)
    stepped = base.select(
        (F.col("_x") / cell).cast("long").alias("cx"),
        (F.col("_y") / cell).cast("long").alias("cy"),
        (nxt - F.col("_t")).alias("_dt"))
    return (stepped.where(F.col("_dt").isNotNull())
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).cast("long").alias("n_stays"),
                 F.sum("_dt").cast("long").alias("dwell_us")))


def grouped_autocorr(df: DataFrame, *, group: str, lag: int = 1,
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value",
                     value_scale: int = 100) -> DataFrame:
    """Per-group lag-``k`` autocorrelation — the serial-dependence
    diagnostic (is this metric mean-reverting? is the sensor stream
    white noise?). Pearson r between ``x_t`` and ``x_{t-lag}`` over
    the total (ts, id) event order, the :func:`grouped_corr`
    discipline applied to a LAGGED pair relation: five exact BIGINT
    sums over integer-scaled values (order-independent aggregation),
    then ONE double expression whose only irrational op is IEEE-754
    correctly-rounded ``sqrt``. Returns ``(group, n_pairs,
    autocorr_micro)``; groups with < 2 pairs or zero variance emit
    NULL.

    Plan: one keyed exchange carries the LAG window AND the map-side-
    collapsing aggregate (the pair relation never re-shuffles).
    Magnitude contract as :func:`grouped_corr`: n²·B² < 9.2e18 for
    ``|x·scale| <= B``.
    """
    from pyspark.sql import Window
    if lag < 1:
        raise ValueError("grouped_autocorr: lag must be >= 1")
    w = Window.partitionBy(group).orderBy(ts_col, id_col)
    xs = F.round(F.col(value_col) * value_scale).cast("long")
    base = (df.where(F.col(value_col).isNotNull()
                     & F.col(ts_col).isNotNull())
            .select(F.col(group), F.col(ts_col), F.col(id_col),
                    xs.alias("_a"))
            .withColumn("_b", F.lag("_a", lag).over(w))
            .where(F.col("_b").isNotNull()))
    agg = base.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_a").alias("sa"), F.sum("_b").alias("sb"),
        F.sum(F.col("_a") * F.col("_b")).alias("sab"),
        F.sum(F.col("_a") * F.col("_a")).alias("saa"),
        F.sum(F.col("_b") * F.col("_b")).alias("sbb"))
    da = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    db = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    r = num.cast("double") / F.sqrt(da.cast("double") * db.cast("double"))
    ac = F.when((da > 0) & (db > 0),
                F.round(F.lit(1_000_000.0) * r).cast("long"))
    return agg.select(group, F.col("n").cast("long").alias("n_pairs"),
                      ac.alias("autocorr_micro"))


def cusum_changepoint(df: DataFrame, *, group: str,
                      ts_col: str = "ts", id_col: str = "event_id",
                      value_col: str = "value",
                      value_scale: int = 100) -> DataFrame:
    """Per-group CUSUM changepoint: the index where the cumulative sum
    deviates most from the uniform-mean line — argmax over i of
    ``|n·S_i − i·S_n|`` (the classic mean-shift statistic, scaled by
    ``n`` so it stays EXACT BIGINT: no division, no float anywhere in
    the ranking, hence schedule-independent and cross-engine
    hashable). Ties break to the earliest i. Returns ``(group, n,
    cp_index, cp_id, stat)`` with ``stat = max |n·S_i − i·S_n|``.

    Plan: ONE keyed exchange — the running sum (ordered frame), the
    group total and count (unbounded frame), and ``row_number`` all
    share the same window partitioning, so Catalyst plans a single
    Exchange; the argmax is a ``max_by`` keyed aggregation with
    map-side partials, never a second data-sized shuffle.

    Magnitude contract: ``n²·B < 9.2e18`` for ``|x·scale| <= B``
    (n=1e6 rows/group at B=1e6 is the ceiling; shard longer series
    by time first).
    """
    from pyspark.sql import Window
    wo = Window.partitionBy(group).orderBy(ts_col, id_col)
    wa = Window.partitionBy(group)
    xs = F.round(F.col(value_col) * value_scale).cast("long")
    base = (df.where(F.col(value_col).isNotNull()
                     & F.col(ts_col).isNotNull())
            .select(F.col(group), F.col(ts_col), F.col(id_col),
                    xs.alias("_x"))
            .withColumn("_i", F.row_number().over(wo).cast("long"))
            .withColumn("_cum", F.sum("_x").over(wo))
            .withColumn("_n", F.count(F.lit(1)).over(wa).cast("long"))
            .withColumn("_tot", F.sum("_x").over(wa)))
    stat = F.abs(F.col("_n") * F.col("_cum")
                 - F.col("_i") * F.col("_tot"))
    scored = base.withColumn("_stat", stat)
    win = F.struct(F.col("_i").alias("i"),
                   F.col(id_col).alias("id"),
                   F.col("_stat").alias("s"),
                   F.col("_n").alias("n"))
    best = (scored.groupBy(group)
            .agg(F.max_by(win, F.struct(F.col("_stat"),
                                        (-F.col("_i")).alias("ni")))
                 .alias("_w")))
    return best.select(
        group, F.col("_w.n").alias("n"),
        F.col("_w.i").alias("cp_index"),
        F.col("_w.id").cast("long").alias("cp_id"),
        F.col("_w.s").alias("stat"))


def path_interpolate(df: DataFrame, *, key: str = "user_id",
                     frac_num: int = 1, frac_den: int = 2,
                     ts_col: str = "ts", id_col: str = "event_id",
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-key position at fraction ``frac_num/frac_den`` of traveled
    path length — ``ST_LineInterpolatePoint`` over the event-time
    trajectory (midpoint by default): the linear-referencing aggregate
    behind "where was the vehicle halfway through its route".

    Exactness layering (each stage hands the next EXACT integers):
    step lengths are micro-rounded IEEE sqrt (correctly rounded by
    spec — the :func:`path_length` discipline), the running and total
    sums are BIGINT, the target chainage is the exact integer
    ``ceil(total · num / den)``, and the matching step is the unique
    one with ``cum_prev < target <= cum`` (zero-length steps can never
    match — their cum doesn't advance). Only the final within-step
    interpolation is floating point: one division and two fma-free
    multiply-adds on exactly-representable integers, identical
    expression shape in both engines, micro-rounded. Keys whose total
    is zero (stationary or single-event) emit their FIRST point under
    the (ts, id) order. Returns ``(key, x_u, y_u)`` in micro-units.

    Plan: the LAG window, running sum, and per-key total (unbounded
    frame) share ONE keyed exchange (the :func:`cusum_changepoint`
    shape); the matching-step filter is map-side; stationary keys come
    from a ``min_by`` keyed agg + anti-join — no second data-sized
    shuffle, no driver loop.
    """
    from pyspark.sql import Window
    if frac_den < 1 or frac_num < 0 or frac_num > frac_den:
        raise ValueError("path_interpolate: need 0 <= num/den <= 1")
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    wa = Window.partitionBy(key)
    base = df.where(F.col(ts_col).isNotNull()).select(
        F.col(key), F.col(ts_col), F.col(id_col),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"))
    px, py = F.lag("_x", 1).over(w), F.lag("_y", 1).over(w)
    dx, dy = F.col("_x") - px, F.col("_y") - py
    d2 = (dx * dx + dy * dy).cast("long")
    step = F.round(F.lit(1_000_000.0)
                   * F.sqrt(d2.cast("double"))).cast("long")
    steps = (base
             .withColumn("_px", px).withColumn("_py", py)
             .withColumn("_s", step)
             .where(F.col("_px").isNotNull())
             .withColumn("_cum", F.sum("_s").over(w))
             .withColumn("_tot", F.sum("_s").over(wa)))
    target = F.expr(f"(_tot * {frac_num} + {frac_den} - 1)"
                    f" div {frac_den}")
    hit = (steps.withColumn("_tgt", target)
           .where((F.col("_tot") > 0)
                  & (F.col("_cum") - F.col("_s") < F.col("_tgt"))
                  & (F.col("_tgt") <= F.col("_cum"))))
    t = ((F.col("_tgt") - (F.col("_cum") - F.col("_s"))).cast("double")
         / F.col("_s").cast("double"))
    moved = hit.select(
        F.col(key),
        F.round(F.lit(1_000_000.0) * (
            F.col("_px").cast("double")
            + t * (F.col("_x") - F.col("_px")).cast("double")))
         .cast("long").alias("x_u"),
        F.round(F.lit(1_000_000.0) * (
            F.col("_py").cast("double")
            + t * (F.col("_y") - F.col("_py")).cast("double")))
         .cast("long").alias("y_u"))
    first = (base.groupBy(key)
             .agg(F.min_by(F.struct(F.col("_x").alias("x"),
                                    F.col("_y").alias("y")),
                           F.struct(F.col(ts_col), F.col(id_col)))
                  .alias("_p")))
    stationary = (first.join(moved.select(key), key, "left_anti")
                  .select(F.col(key),
                          (F.col("_p.x") * 1_000_000).alias("x_u"),
                          (F.col("_p.y") * 1_000_000).alias("y_u")))
    return moved.unionByName(stationary)


def stay_points(events: DataFrame, *, key: str = "user_id",
                ts_col: str = "ts", x_col: str = "x", y_col: str = "y",
                max_jump: int = 10_000, min_duration_s: int = 3600,
                min_points: int = 2,
                tie_col: str = "event_id") -> DataFrame:
    """Stay-point detection (the Li et al. 2008 mobility primitive —
    home/work/POI discovery): maximal runs of consecutive points where
    every step stays within ``max_jump``, kept only when the run lasts
    ``min_duration_s`` and has ``min_points`` observations. Returns
    ``(key, seg, n_points, first_us, last_us, duration_us, cx_u,
    cy_u)`` — the centroid in micro-units.

    Exactness: the run split is :func:`trajectory_segments`' exact
    integer squared-distance test (no sqrt); timestamps are exact
    micros; the centroid is ONE double divide per axis of two exact
    BIGINTs (Σx, n), micro-rounded — so every output column is
    schedule-independent and cross-engine hashable.

    Plan: identical to trajectory_segments — ONE keyed exchange
    carries the LAG, the running break-flag sum, and the (key, seg)
    aggregation (the window partitioning already satisfies the
    grouping); the duration/size filter is map-side on the aggregated
    (key, seg) relation.
    """
    if max_jump < 1 or min_duration_s < 0 or min_points < 1:
        raise ValueError("stay_points: bad parameters")
    w = Window.partitionBy(key).orderBy(ts_col, tie_col)
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    jump = (dx * dx + dy * dy) > (int(max_jump) * int(max_jump))
    brk = F.when(jump | F.lag(x_col).over(w).isNull(), 1).otherwise(0)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    seg = (events.where(F.col(ts_col).isNotNull())
           .withColumn("_b", brk)
           .withColumn("seg", F.sum("_b").over(
               w.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)))
           .withColumn("_us", us)
           .withColumn("_x", F.col(x_col).cast("long"))
           .withColumn("_y", F.col(y_col).cast("long")))
    agg = (seg.groupBy(key, "seg")
           .agg(F.count(F.lit(1)).alias("n_points"),
                F.min("_us").alias("first_us"),
                F.max("_us").alias("last_us"),
                F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy")))
    cx = F.round(F.lit(1_000_000.0)
                 * (F.col("_sx").cast("double")
                    / F.col("n_points").cast("double"))).cast("long")
    cy = F.round(F.lit(1_000_000.0)
                 * (F.col("_sy").cast("double")
                    / F.col("n_points").cast("double"))).cast("long")
    return (agg
            .withColumn("duration_us",
                        F.col("last_us") - F.col("first_us"))
            .where((F.col("duration_us")
                    >= int(min_duration_s) * 1_000_000)
                   & (F.col("n_points") >= min_points))
            .select(key, "seg", "n_points", "first_us", "last_us",
                    "duration_us", cx.alias("cx_u"), cy.alias("cy_u")))


def interval_overlap_join(left: DataFrame, right: DataFrame, *,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          bin_width: int) -> DataFrame:
    """Interval × interval OVERLAP join — every (left, right) pair of
    closed intervals with ``l_start <= r_end AND r_start <= l_end``
    (meeting conflicts, session/maintenance overlap, bitemporal
    reconciliation). Column names must not collide between inputs.

    The plan extends :func:`interval_join`'s bin replication to BOTH
    sides and stays dedup-free with the canonical-bin trick: an
    overlapping pair co-occurs in every bin covering the overlap
    region, so each side emits its bin range and the pair is KEPT only
    in the bin containing ``greatest(l_start, r_start)`` — the overlap
    region's first instant, which both ranges provably cover. Each
    qualifying pair therefore survives in exactly ONE bin: a plain
    equi-join + map-side filter, no dropDuplicates shuffle, no nested
    loop. Exchange carries ``Σ ceil(len/bin)`` rows per side (the
    interval_join cost model; pre-split degenerate whole-domain
    intervals).
    """
    if bin_width <= 0:
        raise ValueError("interval_overlap_join: bin_width > 0 required")
    b = F.lit(int(bin_width)).cast("long")
    le = left.withColumn("_bin", F.explode(F.sequence(
        F.floor(F.col(left_start) / b).cast("long"),
        F.floor(F.col(left_end) / b).cast("long"))))
    re_ = right.withColumn("_bin", F.explode(F.sequence(
        F.floor(F.col(right_start) / b).cast("long"),
        F.floor(F.col(right_end) / b).cast("long"))))
    canon = F.floor(F.greatest(F.col(left_start),
                               F.col(right_start)) / b).cast("long")
    return (le.join(re_, "_bin")
            .where((F.col(left_start) <= F.col(right_end))
                   & (F.col(right_start) <= F.col(left_end))
                   & (F.col("_bin") == canon))
            .drop("_bin"))


def time_pyramid(events: DataFrame, *, ts_col: str = "ts",
                 value_col: str = "value",
                 value_scale: int = 100) -> DataFrame:
    """Multi-grain time rollup — the temporal twin of
    ``operators/tiles.tile_pyramid``: exact counts and integer-scaled
    sums per hour, per day, and per 7-day week (epoch-aligned), each
    coarser level rolled up FROM the previous level's relation, so raw
    rows aggregate exactly once and the whole pyramid above the hour
    grain costs O(occupied hours) whatever the corpus size. Returns
    ``(level, bucket_start_us, n_events, sum_scaled)`` with level ∈
    {'hour','day','week'}.

    All integer: bucket = epoch-micros DIV width; sums are BIGINT over
    ``round(value·scale)`` — order-independent, hashable. One
    data-sized exchange total (the hour aggregation, map-side
    partials); day/week exchanges are bounded by the time frame.
    """
    hour_us = 3_600_000_000
    day_us = 24 * hour_us
    week_us = 7 * day_us
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    xs = F.round(F.col(value_col) * value_scale).cast("long")
    base = (events.where(F.col(ts_col).isNotNull()
                         & F.col(value_col).isNotNull())
            .select(us.alias("_us"), xs.alias("_x")))
    hours = (base.groupBy((F.expr(f"_us div {hour_us}") * hour_us)
                          .alias("bucket_start_us"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                  F.sum("_x").alias("sum_scaled")))

    def _up(rel, width):
        return (rel.groupBy(
                    (F.expr(f"bucket_start_us div {width}") * width)
                    .alias("bucket_start_us"))
                .agg(F.sum("n_events").cast("long").alias("n_events"),
                     F.sum("sum_scaled").alias("sum_scaled")))

    days = _up(hours, day_us)
    weeks = _up(days, week_us)
    lvl = lambda rel, name: rel.select(  # noqa: E731
        F.lit(name).alias("level"), "bucket_start_us", "n_events",
        "sum_scaled")
    return (lvl(hours, "hour")
            .unionByName(lvl(days, "day"))
            .unionByName(lvl(weeks, "week")))


def traj_hausdorff(events: DataFrame, *, key: str = "user_id",
                   x_col: str = "x", y_col: str = "y",
                   cell: int = 50_000,
                   min_shared: int = 2) -> DataFrame:
    """Trajectory-similarity join: symmetric discrete Hausdorff
    distance² between the CELL SIGNATURES (distinct grid cells
    visited) of every pair of keys that co-occur in ≥ ``min_shared``
    cells. Returns ``(a, b, n_shared, h2)`` with ``a < b`` and ``h2``
    in cell units² — all exact BIGINT, no floating point anywhere.

    Why cell signatures, not raw points: the exact Hausdorff over raw
    trajectories is |A|·|B| per pair — quadratic in points. Quantizing
    to cells first (the standard mobility-mining reduction, cf. the
    stay-point literature) bounds every signature by the keys' spatial
    extent / cell², and the candidate set by CELL CO-OCCURRENCE — an
    equi-join on the cell id, never an all-pairs product over keys.

    Plan shape / 100 TB story: (1) one distinct to the signature
    relation (|keys| × cells-per-key rows, tiny vs the event log);
    (2) candidates from the per-cell self-join — the only quadratic
    term is users-per-cell within one cell, the same bounded fanout
    every LSH-bucket join in this repo rides (a hot cell salts like
    any other skewed join key); (3) the pair×signature cross is
    |pairs|·|sigA|·|sigB| with both factors capped by construction;
    (4) both directed maxima aggregate with map-side partials. The
    max-of-min over d² equals the Hausdorff argmax (x² is monotone on
    non-negatives), so the whole statistic stays in integer algebra.
    """
    if cell < 1:
        raise ValueError("traj_hausdorff: cell must be >= 1")
    if min_shared < 1:
        raise ValueError("traj_hausdorff: min_shared must be >= 1")
    cells = (events
             .where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
             .select(F.col(key).alias("k"),
                     F.expr(f"CAST({x_col} AS BIGINT) DIV {cell}")
                     .alias("cx"),
                     F.expr(f"CAST({y_col} AS BIGINT) DIV {cell}")
                     .alias("cy"))
             .distinct())
    a = cells.select(F.col("k").alias("a"), "cx", "cy")
    b = cells.select(F.col("k").alias("b"), "cx", "cy")
    pairs = (a.join(b, ["cx", "cy"])
             .where(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
             .where(F.col("n_shared") >= min_shared))
    ca = cells.select(F.col("k").alias("a"), F.col("cx").alias("acx"),
                      F.col("cy").alias("acy"))
    cb = cells.select(F.col("k").alias("b"), F.col("cx").alias("bcx"),
                      F.col("cy").alias("bcy"))
    d2 = ((F.col("acx") - F.col("bcx")) * (F.col("acx") - F.col("bcx"))
          + (F.col("acy") - F.col("bcy"))
          * (F.col("acy") - F.col("bcy"))).alias("d2")
    cross = (pairs.select("a", "b").join(ca, "a").join(cb, "b")
             .select("a", "b", "acx", "acy", "bcx", "bcy", d2))
    ha = (cross.groupBy("a", "b", "acx", "acy")
          .agg(F.min("d2").alias("m"))
          .groupBy("a", "b").agg(F.max("m").alias("_hab")))
    hb = (cross.groupBy("a", "b", "bcx", "bcy")
          .agg(F.min("d2").alias("m"))
          .groupBy("a", "b").agg(F.max("m").alias("_hba")))
    return (pairs.join(ha, ["a", "b"]).join(hb, ["a", "b"])
            .select("a", "b", "n_shared",
                    F.greatest("_hab", "_hba").cast("long").alias("h2")))


def traj_hausdorff_oracle_sql(events_sql: str, *, cell: int,
                              min_shared: int = 2) -> str:
    """ANSI/DuckDB twin of :func:`traj_hausdorff` — the identical
    integer algebra (cell quantize → co-occurrence pairs → max-of-min
    of squared cell distances, both directions). ``events_sql`` must
    yield (k BIGINT-keyable, x BIGINT, y BIGINT)."""
    return f"""
      WITH ev AS ({events_sql}),
      cells AS (
        SELECT DISTINCT k, x // {cell} AS cx, y // {cell} AS cy
        FROM ev WHERE x IS NOT NULL AND y IS NOT NULL
      ),
      pairs AS (
        SELECT a.k AS a, b.k AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM cells a JOIN cells b
          ON a.cx = b.cx AND a.cy = b.cy AND a.k < b.k
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_shared}
      ),
      cr AS (
        SELECT p.a, p.b,
               ca.cx AS acx, ca.cy AS acy, cb.cx AS bcx, cb.cy AS bcy,
               (ca.cx - cb.cx) * (ca.cx - cb.cx)
               + (ca.cy - cb.cy) * (ca.cy - cb.cy) AS d2
        FROM pairs p
        JOIN cells ca ON ca.k = p.a
        JOIN cells cb ON cb.k = p.b
      ),
      ha AS (
        SELECT a, b, MAX(m) AS hab FROM (
          SELECT a, b, acx, acy, MIN(d2) AS m FROM cr GROUP BY 1, 2, 3, 4
        ) GROUP BY 1, 2
      ),
      hb AS (
        SELECT a, b, MAX(m) AS hba FROM (
          SELECT a, b, bcx, bcy, MIN(d2) AS m FROM cr GROUP BY 1, 2, 3, 4
        ) GROUP BY 1, 2
      )
      SELECT p.a, p.b, p.n_shared,
             CAST(GREATEST(ha.hab, hb.hba) AS BIGINT) AS h2
      FROM pairs p
      JOIN ha ON ha.a = p.a AND ha.b = p.b
      JOIN hb ON hb.a = p.a AND hb.b = p.b
    """


def theil_sen(df: DataFrame, *, group: str, ts_col: str = "ts",
              id_col: str = "event_id", value_col: str = "value",
              value_scale: int = 100, max_lag: int = 10) -> DataFrame:
    """Windowed Theil–Sen robust slope per group: the median of the
    pairwise slopes ``(y_i − y_j) / (t_i − t_j)`` over all pairs at
    sequence distance ≤ ``max_lag`` — the slope estimator with a 29%
    breakdown point (one bad sensor cannot drag it, unlike the OLS of
    :func:`grouped_ols`). Returns ``(group, n_pairs, slope_u)`` with
    the slope micro-rounded (×1e6, BIGINT).

    The FULL Theil–Sen is O(n²) pairs per group; the windowed variant
    (pairs within ``max_lag`` sequence steps) is the standard bounded
    form — O(n·max_lag) pairs from ``max_lag`` LAG columns over ONE
    keyed window, no self-join at all.

    Determinism contract: slopes are exact-BIGINT dy over exact-BIGINT
    dt micros; the one IEEE divide is correctly rounded with a fixed
    expression shape, and the median is selected by the deterministic
    ceil(n/2) rank rule under the total order ``(slope, dy, dx)`` — a
    tie on the double slope is broken by the exact rational's parts,
    so both engines pick value-identical rows. Zero-dt pairs (tied
    timestamps) are excluded by contract.

    Plan: one keyed exchange carries the LAG window AND the ranking
    window (same partitioning); the final per-group agg has map-side
    partials. At 100 TB: state per group is its own rows — no
    all-pairs relation ever materializes.
    """
    if max_lag < 1:
        raise ValueError("theil_sen: max_lag must be >= 1")
    from pyspark.sql import Window
    w = Window.partitionBy(group).orderBy("_t", id_col)
    base = df.where(F.col(ts_col).isNotNull()
                    & F.col(value_col).isNotNull()).select(
        F.col(group), F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
        F.round(F.col(value_col) * value_scale).cast("long").alias("_y"))
    deltas = F.array(*[
        F.struct((F.col("_y") - F.lag("_y", d).over(w)).alias("dy"),
                 (F.col("_t") - F.lag("_t", d).over(w)).alias("dx"))
        for d in range(1, max_lag + 1)])
    pairs = (base.select(F.col(group), deltas.alias("_ds"))
             .select(F.col(group), F.explode("_ds").alias("p"))
             .select(F.col(group), F.col("p.dy").alias("dy"),
                     F.col("p.dx").alias("dx"))
             .where(F.col("dx").isNotNull() & (F.col("dx") > 0)))
    sl = (F.col("dy").cast("double") / F.col("dx").cast("double")) \
        .alias("sl")
    ranked = (pairs.select(F.col(group), "dy", "dx", sl)
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy(group).orderBy("sl", "dy", "dx")))
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy(group))))
    med_rank = F.greatest(F.lit(1),
                          F.ceil(F.lit(0.5) * F.col("_n")).cast("long"))
    return (ranked.groupBy(group)
            .agg(F.max("_n").cast("long").alias("n_pairs"),
                 F.round(F.lit(1_000_000.0)
                         * F.max(F.when(F.col("_rn") == med_rank,
                                        F.col("sl"))))
                  .cast("long").alias("slope_u")))


def theil_sen_oracle_sql(events_sql: str, *, group: str = "g",
                         value_scale: int = 100,
                         max_lag: int = 10) -> str:
    """ANSI/DuckDB twin of :func:`theil_sen`. ``events_sql`` must yield
    ``(g, id, t BIGINT micros, v DOUBLE)``; same rank rule, same tie
    order, same one-divide expression shape."""
    lag_cols = ",\n               ".join(
        f"LAG(y, {d}) OVER w AS y{d}, LAG(t, {d}) OVER w AS t{d}"
        for d in range(1, max_lag + 1))
    arms = "\n        UNION ALL\n".join(
        f"        SELECT g, y - y{d} AS dy, t - t{d} AS dx "
        f"FROM l WHERE t{d} IS NOT NULL AND t - t{d} > 0"
        for d in range(1, max_lag + 1))
    return f"""
      WITH b AS (
        SELECT g, id, t, CAST(ROUND(v * {value_scale}) AS BIGINT) AS y
        FROM ({events_sql}) WHERE t IS NOT NULL AND v IS NOT NULL
      ),
      l AS (
        SELECT g, t, y,
               {lag_cols}
        FROM b WINDOW w AS (PARTITION BY g ORDER BY t, id)
      ),
      p AS (
{arms}
      ),
      s AS (
        SELECT g, dy, dx,
               CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS sl
        FROM p
      ),
      r AS (
        SELECT g, sl, dy, dx,
               ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY sl, dy, dx) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM s
      )
      SELECT g, CAST(MAX(n) AS BIGINT) AS n_pairs,
             CAST(ROUND(1000000.0 * MAX(CASE WHEN rn = GREATEST(
               1, CAST(CEIL(0.5 * n) AS BIGINT)) THEN sl END))
               AS BIGINT) AS slope_u
      FROM r GROUP BY g
    """


def ab_test(events: DataFrame, *, id_col: str = "user_id",
            convert, seed: int = 17) -> DataFrame:
    """Two-proportion A/B z-test over a DETERMINISTIC 50/50 hash
    assignment: units are assigned to arms by the same leakage-stable
    ``md5(id ':' seed)`` bucket rule as ``text.hash_split`` (the
    assignment rides the row — retries, repartitioning or a different
    engine can never move a unit between arms), a unit converts if ANY
    of its events satisfies ``convert`` (a boolean Column over event
    rows), and the statistic is the pooled two-proportion z. Returns
    ONE row ``(n_a, conv_a, n_b, conv_b, z_u)`` — exact BIGINT counts
    and the micro-rounded z (NULL when degenerate: empty arm or pooled
    rate 0 or 1).

    Determinism: everything up to z is exact integers; z itself is a
    fixed-shape IEEE expression (one sqrt, correctly rounded by spec)
    over those integers, micro-rounded.

    Plan: one keyed agg to units (map-side partials), map-side arm
    assignment, one 1-row rollup. No shuffle carries event payloads.
    """
    from cdap_geo_spark.operators.text import hash_split
    units = (events.where(F.col(id_col).isNotNull())
             .groupBy(id_col)
             .agg(F.max(F.coalesce(convert, F.lit(False)).cast("long"))
                  .alias("_conv")))
    armed = hash_split(units, {"A": 0.5, "B": 0.5}, id_col=id_col,
                       seed=seed, label_col="_arm")
    counts = armed.agg(
        F.sum(F.when(F.col("_arm") == "A", 1).otherwise(0))
         .cast("long").alias("n_a"),
        F.sum(F.when(F.col("_arm") == "A", F.col("_conv")).otherwise(0))
         .cast("long").alias("conv_a"),
        F.sum(F.when(F.col("_arm") == "B", 1).otherwise(0))
         .cast("long").alias("n_b"),
        F.sum(F.when(F.col("_arm") == "B", F.col("_conv")).otherwise(0))
         .cast("long").alias("conv_b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pp = (ca + cb) / (na + nb)
    z = ((ca / na) - (cb / nb)) \
        / F.sqrt(pp * (F.lit(1.0) - pp)
                 * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z_ok = ((F.col("n_a") > 0) & (F.col("n_b") > 0)
            & (F.col("conv_a") + F.col("conv_b") > 0)
            & (F.col("conv_a") + F.col("conv_b")
               < F.col("n_a") + F.col("n_b")))
    return counts.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.when(z_ok, F.round(F.lit(1_000_000.0) * z).cast("long"))
         .alias("z_u"))


def ipf_balance(od: DataFrame, row_targets: DataFrame,
                col_targets: DataFrame, *, o_col: str = "o",
                d_col: str = "d", n_col: str = "n",
                iters: int = 2, scale: int = 1_000_000) -> DataFrame:
    """Iterative proportional fitting (matrix raking / RAS): scale an
    OD matrix so its row and column sums match target margins — the
    survey-reweighting / seasonal-adjustment step every OD pipeline
    runs. ``iters`` full (row-pass + column-pass) sweeps, unrolled.
    Returns ``(o, d, m_u)`` with the balanced mass in micro-units.

    Determinism (the float-sum trap and its fix): classic IPF keeps
    fractional masses whose SUMS are float-order-dependent — not
    cross-engine hashable. Here every pass re-quantizes to BIGINT
    micro-units, so margin sums are EXACT integer aggregations and
    the only floats are each pass's per-cell
    ``round(m · (target·1e6 / rowsum))`` — one fixed-shape expression,
    identical in any IEEE engine. Quantization error per pass is
    ≤ 0.5 micro-unit per cell (documented bias, irrelevant at 1e-6).

    Margin semantics: a key missing from the target relation (or with
    target 0) zeroes its row/column; a zeroed row's later factor is
    pinned to 0 (never 0·∞ = NaN).

    Plan: per pass, one margin groupBy (map-side partials, bounded by
    distinct keys) + one AQE-sized join back — 2·iters keyed
    exchanges over the OD relation, never anything larger.
    """
    if iters < 1:
        raise ValueError("ipf_balance: iters must be >= 1")
    if scale < 1:
        raise ValueError("ipf_balance: scale must be >= 1")
    m = od.select(F.col(o_col).alias("o"), F.col(d_col).alias("d"),
                  (F.col(n_col).cast("long") * scale).alias("m_u"))
    rt = row_targets.select(F.col(o_col).alias("o"),
                            F.col("t").cast("long").alias("_rt"))
    ct = col_targets.select(F.col(d_col).alias("d"),
                            F.col("t").cast("long").alias("_ct"))

    def _pass(m, key, tgt, tcol):
        s = m.groupBy(key).agg(F.sum("m_u").alias("_s"))
        factor = (F.coalesce(F.col(tcol), F.lit(0)).cast("double")
                  * float(scale)) / F.col("_s").cast("double")
        new_m = F.when(F.col("_s") > 0,
                       F.round(F.col("m_u").cast("double") * factor)
                       .cast("long")).otherwise(F.lit(0))
        return (m.join(s, key).join(tgt, key, "left")
                .select("o", "d", new_m.alias("m_u")))

    for _ in range(iters):
        m = _pass(m, "o", rt, "_rt")
        m = _pass(m, "d", ct, "_ct")
    return m.select("o", "d", F.col("m_u").cast("long").alias("m_u"))


def ipf_oracle_sql(od_sql: str, row_sql: str, col_sql: str, *,
                   iters: int = 2, scale: int = 1_000_000) -> str:
    """ANSI/DuckDB twin of :func:`ipf_balance` — identical unrolled
    passes, identical expression shape. ``od_sql`` yields (o, d, n);
    the target SQLs yield (o, t) / (d, t)."""
    ctes = [f"m0 AS (SELECT o, d, CAST(n AS BIGINT) * {scale} AS m_u "
            f"FROM ({od_sql}))",
            f"rt AS (SELECT o, CAST(t AS BIGINT) AS t FROM ({row_sql}))",
            f"ct AS (SELECT d, CAST(t AS BIGINT) AS t FROM ({col_sql}))"]
    i = 0
    for _ in range(iters):
        for key, tgt in (("o", "rt"), ("d", "ct")):
            ctes.append(
                f"s{i} AS (SELECT {key} AS k, CAST(SUM(m_u) AS BIGINT)"
                f" AS s FROM m{i} GROUP BY 1)")
            ctes.append(
                f"m{i + 1} AS ("
                f"SELECT m.o, m.d, CASE WHEN s.s > 0 THEN "
                f"CAST(ROUND(CAST(m.m_u AS DOUBLE) * "
                f"((CAST(COALESCE(t.t, 0) AS DOUBLE) * {scale}.0) "
                f"/ CAST(s.s AS DOUBLE))) AS BIGINT) ELSE 0 END AS m_u "
                f"FROM m{i} m JOIN s{i} s ON m.{key} = s.k "
                f"LEFT JOIN {tgt} t ON m.{key} = t.{key})")
            i += 1
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT o, d, CAST(m_u AS BIGINT) AS m_u FROM m{i}")


def line_simplify(df: DataFrame, *, key: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  x_col: str = "x", y_col: str = "y",
                  tol: int = 100, rounds: int = 3) -> DataFrame:
    """Douglas–Peucker trajectory simplification, bounded-depth: keep
    the endpoints, then for ``rounds`` sweeps split every interval at
    its farthest-from-chord vertex when that distance exceeds ``tol``.
    Returns the kept vertices ``(key, id)`` — at most ``2^rounds + 1``
    per key, the classic polyline reduction under a budget (bounded
    depth is the batch-friendly form: depth-first recursion does not
    distribute; one more round doubles the budget).

    Exactness: the farthest vertex maximizes ``cross² / len2`` where
    the chord (hence len2) is constant per interval — so the argmax
    compares ``cross²`` alone, an exact BIGINT, tie-broken to the
    smallest sequence index; the split test ``cross² > tol²·len2`` is
    exact integer too. Magnitude contract: ``|cross| ≤ 3e9`` (i.e.
    coordinate extents ≲ 50k units) keeps ``cross²`` inside int64 —
    the caller quantizes first (same contract family as
    ``zonal.morans_i``). No floats anywhere.

    Plan: per round, ONE grouped argmax over interior vertices
    (max_by with map-side partials) + one AQE-sized join back on the
    interval key; interval state rides each vertex row (lo, hi, chord
    coords) so no per-key recursion or driver loop over keys exists.
    """
    if tol < 0:
        raise ValueError("line_simplify: tol must be >= 0")
    if not (1 <= rounds <= 10):
        raise ValueError("line_simplify: rounds must be in [1, 10]")
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    v = (df.where(F.col(ts_col).isNotNull())
         .select(F.col(key).alias("_k"), F.col(id_col).alias("_id"),
                 F.col(ts_col).alias("_ts"),
                 F.col(x_col).cast("long").alias("_x"),
                 F.col(y_col).cast("long").alias("_y"))
         .withColumn("_idx", F.row_number().over(
             Window.partitionBy("_k").orderBy("_ts", "_id"))
             .cast("long") - 1)
         .drop("_ts"))
    ends = v.groupBy("_k").agg(
        F.max("_idx").alias("_last"),
        F.min_by(F.struct("_x", "_y"), F.col("_idx")).alias("_a"),
        F.max_by(F.struct("_x", "_y"), F.col("_idx")).alias("_b"))
    state = (v.join(ends, "_k")
             .select("_k", "_id", "_idx", "_x", "_y",
                     F.lit(0).cast("long").alias("_lo"),
                     F.col("_last").alias("_hi"),
                     F.col("_a._x").alias("_ax"),
                     F.col("_a._y").alias("_ay"),
                     F.col("_b._x").alias("_bx"),
                     F.col("_b._y").alias("_by")))
    for _ in range(rounds):
        cross = ((F.col("_x") - F.col("_ax"))
                 * (F.col("_by") - F.col("_ay"))
                 - (F.col("_y") - F.col("_ay"))
                 * (F.col("_bx") - F.col("_ax")))
        c2 = (cross * cross).alias("_c2")
        len2 = ((F.col("_bx") - F.col("_ax"))
                * (F.col("_bx") - F.col("_ax"))
                + (F.col("_by") - F.col("_ay"))
                * (F.col("_by") - F.col("_ay")))
        cand = (state.where((F.col("_idx") > F.col("_lo"))
                            & (F.col("_idx") < F.col("_hi")))
                .select("_k", "_lo", "_hi", "_idx", "_x", "_y", c2,
                        len2.alias("_len2")))
        split = (cand.groupBy("_k", "_lo", "_hi")
                 .agg(F.max("_c2").alias("_mc2"),
                      F.max("_len2").alias("_l2"),
                      F.max_by(F.struct(F.col("_idx"), F.col("_x"),
                                        F.col("_y")),
                               F.struct(F.col("_c2"),
                                        (F.lit(0) - F.col("_idx"))))
                      .alias("_s"))
                 .where(F.col("_mc2") > F.lit(tol * tol) * F.col("_l2"))
                 .select("_k", "_lo", "_hi",
                         F.col("_s._idx").alias("_sidx"),
                         F.col("_s._x").alias("_sx"),
                         F.col("_s._y").alias("_sy")))
        j = state.join(split, ["_k", "_lo", "_hi"], "left")
        state = j.select(
            "_k", "_id", "_idx", "_x", "_y",
            F.when(F.col("_sidx").isNull(), F.col("_lo"))
             .when(F.col("_idx") < F.col("_sidx"), F.col("_lo"))
             .when(F.col("_idx") > F.col("_sidx"), F.col("_sidx"))
             .otherwise(F.col("_idx")).alias("_lo"),
            F.when(F.col("_sidx").isNull(), F.col("_hi"))
             .when(F.col("_idx") < F.col("_sidx"), F.col("_sidx"))
             .when(F.col("_idx") > F.col("_sidx"), F.col("_hi"))
             .otherwise(F.col("_idx")).alias("_hi"),
            F.when(F.col("_sidx").isNotNull()
                   & (F.col("_idx") > F.col("_sidx")), F.col("_sx"))
             .otherwise(F.col("_ax")).alias("_ax"),
            F.when(F.col("_sidx").isNotNull()
                   & (F.col("_idx") > F.col("_sidx")), F.col("_sy"))
             .otherwise(F.col("_ay")).alias("_ay"),
            F.when(F.col("_sidx").isNotNull()
                   & (F.col("_idx") < F.col("_sidx")), F.col("_sx"))
             .otherwise(F.col("_bx")).alias("_bx"),
            F.when(F.col("_sidx").isNotNull()
                   & (F.col("_idx") < F.col("_sidx")), F.col("_sy"))
             .otherwise(F.col("_by")).alias("_by"))
    return (state.where((F.col("_idx") == F.col("_lo"))
                        | (F.col("_idx") == F.col("_hi")))
            .select(F.col("_k").alias(key), F.col("_id").alias(id_col)))


def line_simplify_oracle_sql(traj_sql: str, *, tol: int = 100,
                             rounds: int = 3,
                             key_out: str = "user_id",
                             id_out: str = "event_id") -> str:
    """ANSI/DuckDB twin of :func:`line_simplify` — identical unrolled
    rounds, identical exact-integer argmax (c2 DESC, idx ASC) and
    split test. ``traj_sql`` must yield (k, id, ts, x, y)."""
    ctes = [
        f"""v0 AS (
          SELECT k, id, x, y,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts, id) - 1
                   AS idx
          FROM ({traj_sql}) WHERE ts IS NOT NULL
        )""",
        """e0 AS (SELECT k, MAX(idx) AS last FROM v0 GROUP BY 1)""",
        """aa AS (SELECT k, x AS ax, y AS ay FROM v0 WHERE idx = 0)""",
        """bb AS (SELECT v0.k, x AS bx, y AS by
                  FROM v0 JOIN e0 ON v0.k = e0.k AND v0.idx = e0.last)""",
        """st0 AS (
          SELECT v0.k, v0.id, v0.idx, v0.x, v0.y,
                 CAST(0 AS BIGINT) AS lo, e0.last AS hi,
                 aa.ax, aa.ay, bb.bx, bb.by
          FROM v0 JOIN e0 ON v0.k = e0.k
                 JOIN aa ON v0.k = aa.k JOIN bb ON v0.k = bb.k
        )"""]
    for r in range(rounds):
        ctes.append(f"""cand{r} AS (
          SELECT k, lo, hi, idx, x, y,
                 ((x-ax)*(by-ay) - (y-ay)*(bx-ax))
                 * ((x-ax)*(by-ay) - (y-ay)*(bx-ax)) AS c2,
                 (bx-ax)*(bx-ax) + (by-ay)*(by-ay) AS len2
          FROM st{r} WHERE idx > lo AND idx < hi
        )""")
        ctes.append(f"""sp{r} AS (
          SELECT k, lo, hi, idx AS sidx, x AS sx, y AS sy
          FROM (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY k, lo, hi
                                      ORDER BY c2 DESC, idx ASC) AS rn,
                   MAX(c2) OVER (PARTITION BY k, lo, hi) AS mc2
            FROM cand{r}
          ) WHERE rn = 1 AND mc2 > {tol * tol} * len2
        )""")
        ctes.append(f"""st{r + 1} AS (
          SELECT s.k, s.id, s.idx, s.x, s.y,
                 CASE WHEN p.sidx IS NULL THEN s.lo
                      WHEN s.idx < p.sidx THEN s.lo
                      WHEN s.idx > p.sidx THEN p.sidx
                      ELSE s.idx END AS lo,
                 CASE WHEN p.sidx IS NULL THEN s.hi
                      WHEN s.idx < p.sidx THEN p.sidx
                      WHEN s.idx > p.sidx THEN s.hi
                      ELSE s.idx END AS hi,
                 CASE WHEN p.sidx IS NOT NULL AND s.idx > p.sidx
                      THEN p.sx ELSE s.ax END AS ax,
                 CASE WHEN p.sidx IS NOT NULL AND s.idx > p.sidx
                      THEN p.sy ELSE s.ay END AS ay,
                 CASE WHEN p.sidx IS NOT NULL AND s.idx < p.sidx
                      THEN p.sx ELSE s.bx END AS bx,
                 CASE WHEN p.sidx IS NOT NULL AND s.idx < p.sidx
                      THEN p.sy ELSE s.by END AS by
          FROM st{r} s LEFT JOIN sp{r} p
            ON s.k = p.k AND s.lo = p.lo AND s.hi = p.hi
        )""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT k AS {key_out}, CAST(id AS BIGINT) AS {id_out}"
            f"\nFROM st{rounds} WHERE idx = lo OR idx = hi")


def ts_gaps(events: DataFrame, *, key: str = "user_id",
            ts_col: str = "ts",
            bucket_us: int = 3_600_000_000) -> DataFrame:
    """Time-series continuity audit: per key, how complete is the
    event stream at ``bucket_us`` granularity between its own first
    and last observation? Returns ``(key, n_expected, n_present,
    n_gaps, longest_gap)`` — all exact BIGINT (longest_gap = longest
    run of consecutive EMPTY buckets; 0 when the stream is gapless).
    The sensor-health / feed-freshness check a pipeline runs before
    trusting windowed aggregates.

    NO bucket-range explode: ``n_expected`` is closed-form arithmetic
    on the min/max bucket, presence aggregates the DISTINCT occupied
    buckets, and the longest gap is a LAG over occupied buckets —
    everything is bounded by occupied buckets, not by the time span
    (a key silent for a year costs one row, not 8,760).

    Plan: one distinct to (key, bucket), ONE keyed window carrying
    the LAG, one per-key agg with map-side partials.
    """
    if bucket_us < 1:
        raise ValueError("ts_gaps: bucket_us must be >= 1")
    from pyspark.sql import Window
    b = (events.where(F.col(ts_col).isNotNull())
         .select(F.col(key).alias("_k"),
                 F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                        f"DIV {bucket_us}").alias("_b"))
         .distinct())
    w = Window.partitionBy("_k").orderBy("_b")
    g = b.withColumn("_gap", F.col("_b") - F.lag("_b", 1).over(w) - 1)
    return (g.groupBy("_k")
            .agg((F.max("_b") - F.min("_b") + 1).cast("long")
                 .alias("n_expected"),
                 F.count(F.lit(1)).cast("long").alias("n_present"),
                 (F.max("_b") - F.min("_b") + 1
                  - F.count(F.lit(1))).cast("long").alias("n_gaps"),
                 F.coalesce(F.max("_gap"), F.lit(0)).cast("long")
                 .alias("longest_gap"))
            .select(F.col("_k").alias(key), "n_expected", "n_present",
                    "n_gaps", "longest_gap"))


def ts_gaps_oracle_sql(events_sql: str, *, key_out: str = "user_id",
                       bucket_us: int = 3_600_000_000) -> str:
    """ANSI/DuckDB twin of :func:`ts_gaps`. ``events_sql`` must yield
    (k, t BIGINT micros)."""
    return f"""
      WITH b AS (
        SELECT DISTINCT k, t // {bucket_us} AS bk
        FROM ({events_sql}) WHERE t IS NOT NULL
      ),
      g AS (
        SELECT k, bk,
               bk - LAG(bk) OVER (PARTITION BY k ORDER BY bk) - 1
                 AS gap
        FROM b
      )
      SELECT k AS {key_out},
             CAST(MAX(bk) - MIN(bk) + 1 AS BIGINT) AS n_expected,
             CAST(COUNT(*) AS BIGINT) AS n_present,
             CAST(MAX(bk) - MIN(bk) + 1 - COUNT(*) AS BIGINT)
               AS n_gaps,
             CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS longest_gap
      FROM g GROUP BY 1
    """


def co_visits(events: DataFrame, *, key: str = "user_id",
              ts_col: str = "ts", x_col: str = "x", y_col: str = "y",
              cell: int = 50_000, bin_us: int = 3_600_000_000,
              min_covisits: int = 2) -> DataFrame:
    """Co-location detection (contact-tracing / convoy mining): pairs
    of keys observed in the SAME space-time bucket (grid cell ×
    time bin) at least ``min_covisits`` times, with the longest run
    of CONSECUTIVE co-located time bins. Returns ``(a, b,
    n_covisits, max_streak)``, ``a < b``, all exact BIGINT.

    Never all-pairs over keys: presence dedups to one row per
    (key, cell, bin); candidate pairs come from the per-bucket
    self-join — the quadratic term is keys-per-bucket within ONE
    bucket (the salt-able bounded fanout every bucket join here has).
    A pair co-located in k buckets appears k times and collapses in
    the pair aggregate; the streak is a LAG/run-split over each
    pair's DISTINCT co-located bins (the stay_points discipline
    applied to a pair relation).

    Plan: one distinct, one bucket equi-join, one pair agg for the
    gate, one keyed window + agg for streaks — every relation bounded
    by presence rows and surviving pairs.
    """
    if cell < 1 or bin_us < 1:
        raise ValueError("co_visits: cell and bin_us must be >= 1")
    if min_covisits < 1:
        raise ValueError("co_visits: min_covisits must be >= 1")
    from pyspark.sql import Window
    pres = (events
            .where(F.col(ts_col).isNotNull() & F.col(x_col).isNotNull()
                   & F.col(y_col).isNotNull())
            .select(F.col(key).alias("_k"),
                    F.expr(f"CAST({x_col} AS BIGINT) DIV {cell}")
                    .alias("cx"),
                    F.expr(f"CAST({y_col} AS BIGINT) DIV {cell}")
                    .alias("cy"),
                    F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
                           f" DIV {bin_us}").alias("tb"))
            .distinct())
    a = pres.select(F.col("_k").alias("a"), "cx", "cy", "tb")
    b = pres.select(F.col("_k").alias("b"), "cx", "cy", "tb")
    met = (a.join(b, ["cx", "cy", "tb"])
           .where(F.col("a") < F.col("b"))
           .select("a", "b", "tb").distinct())
    gate = (met.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_covisits"))
            .where(F.col("n_covisits") >= min_covisits))
    w = Window.partitionBy("a", "b").orderBy("tb")
    runs = (met.join(gate.select("a", "b"), ["a", "b"])
            .withColumn("_new", (F.coalesce(
                F.col("tb") - F.lag("tb", 1).over(w), F.lit(2)) > 1)
                .cast("long"))
            .withColumn("_run", F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    streak = (runs.groupBy("a", "b", "_run")
              .agg(F.count(F.lit(1)).alias("_len"))
              .groupBy("a", "b")
              .agg(F.max("_len").cast("long").alias("max_streak")))
    return gate.join(streak, ["a", "b"]) \
        .select("a", "b", "n_covisits", "max_streak")


def co_visits_oracle_sql(events_sql: str, *, cell: int,
                         bin_us: int,
                         min_covisits: int = 2) -> str:
    """ANSI/DuckDB twin of :func:`co_visits`. ``events_sql`` must
    yield (k, t BIGINT micros, x, y)."""
    return f"""
      WITH pres AS (
        SELECT DISTINCT k, x // {cell} AS cx, y // {cell} AS cy,
               t // {bin_us} AS tb
        FROM ({events_sql})
        WHERE t IS NOT NULL AND x IS NOT NULL AND y IS NOT NULL
      ),
      met AS (
        SELECT DISTINCT a.k AS a, b.k AS b, a.tb
        FROM pres a JOIN pres b
          ON a.cx = b.cx AND a.cy = b.cy AND a.tb = b.tb AND a.k < b.k
      ),
      gate AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_covisits
        FROM met GROUP BY 1, 2 HAVING COUNT(*) >= {min_covisits}
      ),
      lagged AS (
        SELECT m.a, m.b, m.tb,
               CASE WHEN m.tb - LAG(m.tb) OVER
                      (PARTITION BY m.a, m.b ORDER BY m.tb) = 1
                    THEN 0 ELSE 1 END AS isnew
        FROM met m JOIN gate g ON m.a = g.a AND m.b = g.b
      ),
      runs AS (
        SELECT a, b, tb,
               SUM(isnew) OVER (PARTITION BY a, b ORDER BY tb
                                ROWS UNBOUNDED PRECEDING) AS run
        FROM lagged
      ),
      streak AS (
        SELECT a, b, CAST(MAX(len) AS BIGINT) AS max_streak
        FROM (SELECT a, b, run, COUNT(*) AS len
              FROM runs GROUP BY 1, 2, 3)
        GROUP BY 1, 2
      )
      SELECT g.a, g.b, g.n_covisits, s.max_streak
      FROM gate g JOIN streak s ON g.a = s.a AND g.b = s.b
    """


def home_work(events: DataFrame, *, key: str = "user_id",
              ts_col: str = "ts", x_col: str = "x", y_col: str = "y",
              cell: int = 50_000, night=(0, 6),
              day=(9, 17)) -> DataFrame:
    """Home/work anchor inference — the mobility-profiling staple:
    per key, the MODAL grid cell during night hours (home) and during
    working hours (work), plus the exact squared cell distance
    between them (commute length proxy). Returns ``(key, home_cx,
    home_cy, work_cx, work_cy, commute_d2)`` for keys observed in
    BOTH windows — all exact BIGINT.

    Determinism: the mode is argmax by ``(count DESC, cx ASC, cy
    ASC)`` — a total order, so ties pick the same cell in any engine
    (the grouped_mode discipline). Hour windows are half-open
    ``[lo, hi)`` on the event's local hour.

    Plan: one (key, period, cell) count (map-side partials), one
    per-(key, period) argmax via max_by, one self-join of the two
    period relations on the key — everything bounded by keys ×
    occupied cells.
    """
    if cell < 1:
        raise ValueError("home_work: cell must be >= 1")
    (n_lo, n_hi), (d_lo, d_hi) = night, day
    hr = F.hour(F.col(ts_col).cast("timestamp"))
    period = (F.when((hr >= n_lo) & (hr < n_hi), "home")
              .when((hr >= d_lo) & (hr < d_hi), "work"))
    counts = (events
              .where(F.col(ts_col).isNotNull()
                     & F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull())
              .select(F.col(key).alias("_k"), period.alias("_p"),
                      F.expr(f"CAST({x_col} AS BIGINT) DIV {cell}")
                      .alias("cx"),
                      F.expr(f"CAST({y_col} AS BIGINT) DIV {cell}")
                      .alias("cy"))
              .where(F.col("_p").isNotNull())
              .groupBy("_k", "_p", "cx", "cy")
              .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    pick = (counts.groupBy("_k", "_p")
            .agg(F.max_by(F.struct("cx", "cy"),
                          F.struct(F.col("_n"),
                                   (F.lit(0) - F.col("cx")),
                                   (F.lit(0) - F.col("cy"))))
                 .alias("_c")))
    h = pick.where(F.col("_p") == "home").select(
        "_k", F.col("_c.cx").alias("home_cx"),
        F.col("_c.cy").alias("home_cy"))
    d = pick.where(F.col("_p") == "work").select(
        "_k", F.col("_c.cx").alias("work_cx"),
        F.col("_c.cy").alias("work_cy"))
    d2 = ((F.col("home_cx") - F.col("work_cx"))
          * (F.col("home_cx") - F.col("work_cx"))
          + (F.col("home_cy") - F.col("work_cy"))
          * (F.col("home_cy") - F.col("work_cy")))
    return (h.join(d, "_k")
            .select(F.col("_k").alias(key), "home_cx", "home_cy",
                    "work_cx", "work_cy",
                    d2.cast("long").alias("commute_d2")))


def home_work_oracle_sql(events_sql: str, *, cell: int,
                         key_out: str = "user_id",
                         night=(0, 6), day=(9, 17)) -> str:
    """ANSI/DuckDB twin of :func:`home_work`. ``events_sql`` must
    yield (k, ts TIMESTAMP, x, y)."""
    (n_lo, n_hi), (d_lo, d_hi) = night, day
    return f"""
      WITH b AS (
        SELECT k,
               CASE WHEN hour(ts) >= {n_lo} AND hour(ts) < {n_hi}
                    THEN 'home'
                    WHEN hour(ts) >= {d_lo} AND hour(ts) < {d_hi}
                    THEN 'work' END AS p,
               x // {cell} AS cx, y // {cell} AS cy
        FROM ({events_sql})
        WHERE ts IS NOT NULL AND x IS NOT NULL AND y IS NOT NULL
      ),
      c AS (
        SELECT k, p, cx, cy, COUNT(*) AS n
        FROM b WHERE p IS NOT NULL GROUP BY 1, 2, 3, 4
      ),
      r AS (
        SELECT k, p, cx, cy,
               ROW_NUMBER() OVER (PARTITION BY k, p
                                  ORDER BY n DESC, cx ASC, cy ASC)
                 AS rn
        FROM c
      ),
      h AS (SELECT k, cx AS home_cx, cy AS home_cy
            FROM r WHERE p = 'home' AND rn = 1),
      d AS (SELECT k, cx AS work_cx, cy AS work_cy
            FROM r WHERE p = 'work' AND rn = 1)
      SELECT h.k AS {key_out},
             CAST(home_cx AS BIGINT) AS home_cx,
             CAST(home_cy AS BIGINT) AS home_cy,
             CAST(work_cx AS BIGINT) AS work_cx,
             CAST(work_cy AS BIGINT) AS work_cy,
             CAST((home_cx - work_cx) * (home_cx - work_cx)
                  + (home_cy - work_cy) * (home_cy - work_cy)
               AS BIGINT) AS commute_d2
      FROM h JOIN d ON h.k = d.k
    """


def theil_decomposition(df: DataFrame, *, group_col: str = "g",
                        value_col: str = "x") -> DataFrame:
    """Theil T inequality index with its exact between/within
    decomposition — the corpus-balance diagnostic that, unlike Gini
    (:func:`grouped_gini`), decomposes additively:
    ``T_total = Σ_r within_r + Σ_r between_r`` with
    ``within_r = Σ_{i∈r} (x_i/S)·ln(x_i·n_r/S_r)`` and
    ``between_r = (S_r/S)·ln(S_r·n/(S·n_r))`` (S/S_r totals, n/n_r
    counts). Returns one row per group:
    ``(group, n_r, sum_r, within_micro, between_micro)``.

    Exactness (the char_entropy discipline): a distributed float Σ is
    schedule-dependent, so each element's within-term is ONE
    fixed-shape IEEE expression over exact integers (x·n_r and the
    totals are BIGINTs; magnitude contract x·n_r within int64),
    rounded to MICRO-units and summed as BIGINT — order-independent;
    the between-term is one fixed-shape expression per group. Values
    must be > 0 (Theil is undefined otherwise) — enforced.

    Plan: group stats are one partial agg; the 1-row global total
    broadcasts; the per-element term is map-side (stats join back by
    group — broadcast-sized by construction) followed by ONE group
    agg. Nothing quadratic.
    """
    base = df.where(F.col(value_col).isNotNull()) \
        .select(F.col(group_col).alias("_g"),
                F.col(value_col).cast("long").alias("_x"))
    if base.where(F.col("_x") <= 0).limit(1).count():
        raise ValueError("theil_decomposition: values must be > 0")
    gstat = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_r"),
        F.sum("_x").cast("long").alias("sum_r"))
    tot = gstat.agg(F.sum("n_r").cast("long").alias("_n"),
                    F.sum("sum_r").cast("long").alias("_s"))
    el = (base.join(F.broadcast(gstat), "_g")
          .crossJoin(F.broadcast(tot)))
    term = F.round(F.col("_x").cast("double")
                   / F.col("_s").cast("double")
                   * F.log((F.col("_x") * F.col("n_r")).cast("double")
                           / F.col("sum_r").cast("double"))
                   * 1000000.0).cast("long")
    within = (el.groupBy("_g")
              .agg(F.sum(term).cast("long").alias("within_micro")))
    out = gstat.join(within, "_g").crossJoin(F.broadcast(tot))
    between = F.round(F.col("sum_r").cast("double")
                      / F.col("_s").cast("double")
                      * F.log((F.col("sum_r") * F.col("_n"))
                              .cast("double")
                              / (F.col("_s") * F.col("n_r"))
                              .cast("double"))
                      * 1000000.0).cast("long")
    return out.select(F.col("_g").alias(group_col), "n_r", "sum_r",
                      "within_micro", between.alias("between_micro"))


def gravity_model(od: DataFrame, *, ox: str = "o_cx", oy: str = "o_cy",
                  dx: str = "d_cx", dy: str = "d_cy",
                  flow_col: str = "n") -> DataFrame:
    """Gravity spatial-interaction model over an OD matrix (e.g.
    :func:`od_matrix` output): productions ``P_o = Σ_d T``,
    attractions ``A_d = Σ_o T``, deterrence ``1/(d²+1)`` (squared
    cell distance, +1 so intra-cell flows are defined — the
    documented convention), the single scaling constant calibrated so
    total predicted flow equals total observed
    (``k = ΣT / Σ P·A/(d²+1)``), and per-pair residuals. Returns one
    row per OBSERVED od pair: ``(o, d cols, n, p_o, a_d, g_micro,
    pred_micro, resid_micro)``.

    Exactness: P, A, d²+1 and ΣT are exact BIGINTs; the per-pair
    gravity term ``g = P·A/(d²+1)`` is ONE fixed-shape division
    micro-rounded then SUMMED AS BIGINT (order-independent — the
    calibration denominator inherits exactness); prediction
    ``pred_micro = round(1e6·ΣT·g_micro / Σg_micro)`` and residual
    ``n·1e6 − pred_micro`` are again single fixed-shape expressions.
    Magnitude contract: ``P·A·1e6`` within double's exact-integer
    range (P, A ≤ ~3e6).

    Plan: margins are two partial aggs over the OD relation joined
    back by key (AQE-sized); the calibration constant is a 1-row
    broadcast. Note the model only scores OBSERVED pairs — the
    classic doubly-constrained variant would iterate margins
    (:func:`ipf_balance` exists for that); this is the
    singly-calibrated form.
    """
    base = od.select(F.col(ox).cast("long").alias("_ox"),
                     F.col(oy).cast("long").alias("_oy"),
                     F.col(dx).cast("long").alias("_dx"),
                     F.col(dy).cast("long").alias("_dy"),
                     F.col(flow_col).cast("long").alias("_n"))
    prod = base.groupBy("_ox", "_oy").agg(
        F.sum("_n").cast("long").alias("p_o"))
    attr = base.groupBy("_dx", "_dy").agg(
        F.sum("_n").cast("long").alias("a_d"))
    j = base.join(prod, ["_ox", "_oy"]).join(attr, ["_dx", "_dy"])
    d2p1 = ((F.col("_ox") - F.col("_dx")) * (F.col("_ox") - F.col("_dx"))
            + (F.col("_oy") - F.col("_dy"))
            * (F.col("_oy") - F.col("_dy")) + 1)
    g = F.round((F.col("p_o") * F.col("a_d")).cast("double")
                / d2p1.cast("double") * 1000000.0).cast("long")
    j = j.select("_ox", "_oy", "_dx", "_dy", "_n", "p_o", "a_d",
                 g.alias("g_micro"))
    tot = j.agg(F.sum("_n").cast("long").alias("_st"),
                F.sum("g_micro").cast("long").alias("_sg"))
    out = j.crossJoin(F.broadcast(tot))
    pred = F.when(F.col("_sg") > 0,
                  F.round(F.lit(1000000.0)
                          * (F.col("_st") * F.col("g_micro"))
                          .cast("double")
                          / F.col("_sg").cast("double"))
                  .cast("long"))
    return out.select(
        F.col("_ox").alias(ox), F.col("_oy").alias(oy),
        F.col("_dx").alias(dx), F.col("_dy").alias(dy),
        F.col("_n").alias(flow_col), "p_o", "a_d", "g_micro",
        pred.alias("pred_micro"),
        (F.col("_n") * 1000000 - pred).alias("resid_micro"))


def ks_test(values: DataFrame, *, sample_col: str = "s",
            value_col: str = "v") -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance — the distribution-
    drift detector (data-quality / train-vs-serve skew):
    ``D = max_t |F1(t) − F2(t)|`` between the two samples named by
    ``sample_col`` (exactly two distinct values required, compared in
    lexical order: first = sample 1). Returns ONE row:
    ``(n1, n2, d_num, at_v, d_micro)`` where ``d_num =
    max |c1·n2 − c2·n1|`` over the merged support (EXACT BIGINT — the
    cross-multiplied form needs no float CDF), ``at_v`` is the
    smallest value attaining the max (deterministic tie rule), and
    ``d_micro = round(1e6·d_num/(n1·n2))`` is the only float.

    Plan: one (value → per-sample count) partial agg bounded by the
    DISTINCT support, one ordered cumulative window over that
    relation (support-sized, not data-sized), one 1-row combine.
    Magnitude contract: ``c·n`` within int64.
    """
    base = values.where(F.col(value_col).isNotNull()
                        & F.col(sample_col).isNotNull()) \
        .select(F.col(sample_col).cast("string").alias("_s"),
                F.col(value_col).cast("long").alias("_v"))
    names = [r._s for r in
             base.select("_s").distinct().orderBy("_s").collect()]
    if len(names) != 2:
        raise ValueError(f"ks_test: need exactly 2 samples, got "
                         f"{names}")
    s1, s2 = names
    per_v = base.groupBy("_v").agg(
        F.sum(F.when(F.col("_s") == s1, 1).otherwise(0)).cast("long")
        .alias("_d1"),
        F.sum(F.when(F.col("_s") == s2, 1).otherwise(0)).cast("long")
        .alias("_d2"))
    from pyspark.sql import Window
    from cdap_geo_spark.core.lifetime import track_checkpoint
    # Two-level cumulative (round 6, VERDICT r5 #4): for
    # near-continuous values the distinct support approaches data
    # size, and the former bare orderBy(_v) window was a
    # SinglePartition sort of the whole relation on one task. Instead
    # the pack_sequences two-pass scan: shard by VALUE RANGE
    # (deterministic integer arithmetic — both passes agree without
    # sampling), per-shard totals exclusive-prefix-summed on the
    # driver (bounded collect: num_shards rows), offsets broadcast
    # back, cumulative inside partitionBy(_shard). Sums are exact
    # BIGINTs, so the result is bit-identical to the single-window
    # form.
    per_v = track_checkpoint(per_v.localCheckpoint(eager=False))
    spark = values.sparkSession
    n_sh = spark.sparkContext.defaultParallelism
    lo_hi = per_v.agg(F.min("_v").alias("lo"),
                      F.max("_v").alias("hi")).first()
    lo = int(lo_hi["lo"]) if lo_hi and lo_hi["lo"] is not None else 0
    hi = int(lo_hi["hi"]) if lo_hi and lo_hi["hi"] is not None else 0
    width = max(1, -(-(hi - lo + 1) // n_sh))        # ceil, >= 1
    shard = ((F.col("_v") - F.lit(lo)) / F.lit(width)) \
        .cast("long").alias("_shard")
    d = per_v.select("*", shard)
    totals = {int(r["_shard"]): (int(r["t1"]), int(r["t2"]))
              for r in d.groupBy("_shard")
                        .agg(F.sum("_d1").alias("t1"),
                             F.sum("_d2").alias("t2")).collect()}
    acc1, acc2, offs = 0, 0, []
    for s in range(n_sh):                            # dense shard walk
        offs.append((s, acc1, acc2))
        t = totals.get(s, (0, 0))
        acc1, acc2 = acc1 + t[0], acc2 + t[1]
    offs_df = spark.createDataFrame(
        offs, "_shard long, _off1 long, _off2 long")
    ws = (Window.partitionBy("_shard").orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = (d.join(F.broadcast(offs_df), "_shard")
           .select("_v",
                   (F.sum("_d1").over(ws) + F.col("_off1"))
                   .cast("long").alias("_c1"),
                   (F.sum("_d2").over(ws) + F.col("_off2"))
                   .cast("long").alias("_c2")))
    tot = per_v.agg(F.sum("_d1").cast("long").alias("n1"),
                    F.sum("_d2").cast("long").alias("n2"))
    j = cum.crossJoin(F.broadcast(tot))
    dn = F.abs(F.col("_c1") * F.col("n2") - F.col("_c2") * F.col("n1"))
    best = j.agg(
        F.max(F.struct(dn.alias("d_num"), (-F.col("_v")).alias("_nv")))
        .alias("_b"),
        F.max("n1").alias("n1"), F.max("n2").alias("n2"))
    d_num = F.col("_b.d_num")
    at_v = (-F.col("_b._nv")).cast("long")
    d = F.when((F.col("n1") > 0) & (F.col("n2") > 0),
               F.round(d_num.cast("double") * 1000000.0
                       / (F.col("n1") * F.col("n2")).cast("double"))
               .cast("long"))
    return best.select("n1", "n2", d_num.cast("long").alias("d_num"),
                       at_v.alias("at_v"), d.alias("d_micro"))


def grouped_spearman(df: DataFrame, *, group_col: str = "g",
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-group Spearman rank correlation with exact average-tie
    ranks — the robust companion to ``grouped_corr``: ranks are kept
    as DOUBLED integers (average tie rank ×2 = 2·before + count + 1 —
    always an exact BIGINT; no .5 ever touches a float), the five
    moment sums over (2rx, 2ry) are exact BIGINTs, and ρ is ONE
    fixed-shape expression (the shared ×2 scale cancels). Returns
    ``(group, n, rho_micro)`` with NULL on degenerate (constant)
    columns. Magnitude contract: ``n·Σ(2r)²`` within int64 → n ≤
    ~2×10⁵ per group.

    Plan: per-group value histograms (partial aggs bounded by the
    distinct support), a support-sized cumulative window per column,
    rank join-back by value, then the grouped_corr one-pass moment
    aggregate. Nothing data² anywhere.
    """
    from pyspark.sql import Window
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()) \
        .select(F.col(group_col).alias("_g"),
                F.col(x_col).cast("long").alias("_x"),
                F.col(y_col).cast("long").alias("_y"))

    def ranks(col):
        h = base.groupBy("_g", col).agg(
            F.count(F.lit(1)).cast("long").alias("_c"))
        w = (Window.partitionBy("_g").orderBy(col)
             .rowsBetween(Window.unboundedPreceding, -1))
        return h.select(
            "_g", col,
            (2 * F.coalesce(F.sum("_c").over(w), F.lit(0))
             + F.col("_c") + 1).cast("long").alias(f"_r{col}"))
    rx = ranks("_x")
    ry = ranks("_y")
    j = base.join(rx, ["_g", "_x"]).join(ry, ["_g", "_y"])
    u, v = F.col("_r_x"), F.col("_r_y")
    agg = j.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(u).cast("long").alias("_su"),
        F.sum(v).cast("long").alias("_sv"),
        F.sum(u * u).cast("long").alias("_suu"),
        F.sum(v * v).cast("long").alias("_svv"),
        F.sum(u * v).cast("long").alias("_suv"))
    n = F.col("n")
    num = n * F.col("_suv") - F.col("_su") * F.col("_sv")
    dx = n * F.col("_suu") - F.col("_su") * F.col("_su")
    dy = n * F.col("_svv") - F.col("_sv") * F.col("_sv")
    rho = F.when((dx > 0) & (dy > 0),
                 F.round(num.cast("double")
                         / (F.sqrt(dx.cast("double"))
                            * F.sqrt(dy.cast("double")))
                         * 1000000.0).cast("long"))
    return agg.select(F.col("_g").alias(group_col), "n",
                      rho.alias("rho_micro"))


def kaplan_meier(df: DataFrame, *, group_col: str = "g",
                 duration_col: str = "t",
                 event_col: str = "observed") -> DataFrame:
    """Stratified Kaplan–Meier survival curves — churn / retention's
    censoring-aware form: per group and distinct event time,
    ``S(t) = Π_{t_j ≤ t, d_j > 0} (1 − d_j / n_j)`` with ``n_j`` the
    at-risk count (duration ≥ t_j) and ``d_j`` the observed events at
    ``t_j``; censored subjects leave the risk set without an event.
    Returns the curve points (times with ``d > 0``):
    ``(group, t, n_risk, d_events, n_censored_at_t, s_micro)``.

    Exactness (the char_entropy/theil discipline): each factor enters
    as ``ln(n_j − d_j) − ln(n_j)`` micro-rounded to BIGINT, the
    cumulative product is a WINDOW SUM of those integers over the
    group's distinct-time support (support-sized, never data-sized),
    and ``S = exp(Σ/1e6)`` is one fixed-shape expression
    micro-rounded. The ``n_j = d_j`` wipe-out (everyone at risk dies)
    is handled exactly: a cumulative flag pins S = 0 from that time
    on — no ln(0) is ever evaluated.

    Plan: ONE (group, duration) histogram partial agg over the data
    volume; risk sets come from a reversed cumulative window per
    group over that support; nothing quadratic, no SinglePartition
    global window (windows are group-partitioned).
    """
    from pyspark.sql import Window
    base = df.where(F.col(duration_col).isNotNull()) \
        .select(F.col(group_col).alias("_g"),
                F.col(duration_col).cast("long").alias("_t"),
                F.col(event_col).cast("long").alias("_e"))
    h = base.groupBy("_g", "_t").agg(
        F.sum("_e").cast("long").alias("_d"),
        F.sum(1 - F.col("_e")).cast("long").alias("_c"),
        F.count(F.lit(1)).cast("long").alias("_n"))
    w_after = (Window.partitionBy("_g").orderBy("_t")
               .rowsBetween(0, Window.unboundedFollowing))
    w_upto = (Window.partitionBy("_g").orderBy("_t")
              .rowsBetween(Window.unboundedPreceding, 0))
    pts = h.select(
        "_g", "_t", "_d", "_c",
        F.sum("_n").over(w_after).cast("long").alias("n_risk"))
    term = F.when(F.col("_d") == 0, F.lit(0)) \
        .when(F.col("_d") < F.col("n_risk"),
              F.round((F.log((F.col("n_risk") - F.col("_d"))
                             .cast("double"))
                       - F.log(F.col("n_risk").cast("double")))
                      * 1000000.0).cast("long")) \
        .otherwise(F.lit(None).cast("long"))   # wipe-out marker
    pts = pts.select("_g", "_t", "_d", "_c", "n_risk",
                     term.alias("_term"))
    cum = pts.select(
        "_g", "_t", "_d", "_c", "n_risk",
        F.sum(F.coalesce(F.col("_term"), F.lit(0))).over(w_upto)
        .alias("_lns"),
        F.max(F.when(F.col("_term").isNull(), 1).otherwise(0))
        .over(w_upto).alias("_wiped"))
    s = F.when(F.col("_wiped") == 1, F.lit(0).cast("long")) \
        .otherwise(F.round(
            F.exp(F.col("_lns").cast("double") / 1000000.0)
            * 1000000.0).cast("long"))
    return (cum.where(F.col("_d") > 0)
            .select(F.col("_g").alias(group_col),
                    F.col("_t").alias(duration_col),
                    "n_risk", F.col("_d").alias("d_events"),
                    F.col("_c").alias("n_censored_at_t"),
                    s.alias("s_micro")))


def radiation_model(od: DataFrame, pops: DataFrame, *,
                    ox: str = "o_cx", oy: str = "o_cy",
                    dx: str = "d_cx", dy: str = "d_cy",
                    flow_col: str = "n",
                    px: str = "cx", py: str = "cy",
                    pop_col: str = "pop") -> DataFrame:
    """Radiation model of mobility flows (Simini et al. 2012) — the
    PARAMETER-FREE alternative to :func:`gravity_model`:
    ``pred_ij = T_i · m_i·n_j / ((m_i + s_ij)·(m_i + n_j + s_ij))``
    where ``m_i``/``n_j`` are origin/destination populations,
    ``T_i`` the origin's observed outflow, and ``s_ij`` the
    population STRICTLY closer to i than j is (excluding both
    endpoints). Scores the OBSERVED inter-cell pairs (i ≠ j —
    intra-cell flows have no radius and are excluded, documented).
    Returns ``(o..., d..., n, m_i, n_j, s_ij, t_i, pred_micro,
    resid_micro)``.

    Exactness: every quantity through the prediction's numerator and
    denominator is an exact BIGINT — ``s_ij`` sums populations under
    the exact integer comparison ``d²_ik < d²_ij`` (strictly-closer
    tie rule); the prediction is ONE fixed-shape division
    micro-rounded; the residual is exact. Magnitude contract:
    ``T_i·m_i·n_j`` within double's exact-integer range.

    Plan: the population dimension BROADCASTS twice — once to attach
    m/n, once (as the intervening set) to every observed pair; the
    s_ij relation is |observed pairs| × |cells| map-side rows into
    ONE pair-keyed partial agg. Never all-cells², never data-sized.
    """
    p = pops.select(F.col(px).cast("long").alias("_kx"),
                    F.col(py).cast("long").alias("_ky"),
                    F.col(pop_col).cast("long").alias("_m"))
    base = (od.select(F.col(ox).cast("long").alias("_ox"),
                      F.col(oy).cast("long").alias("_oy"),
                      F.col(dx).cast("long").alias("_dx"),
                      F.col(dy).cast("long").alias("_dy"),
                      F.col(flow_col).cast("long").alias("_n"))
            .where((F.col("_ox") != F.col("_dx"))
                   | (F.col("_oy") != F.col("_dy"))))
    t_i = base.groupBy("_ox", "_oy").agg(
        F.sum("_n").cast("long").alias("t_i"))
    mi = p.select(F.col("_kx").alias("_ox"), F.col("_ky").alias("_oy"),
                  F.col("_m").alias("m_i"))
    nj = p.select(F.col("_kx").alias("_dx"), F.col("_ky").alias("_dy"),
                  F.col("_m").alias("n_j"))
    d2ij = ((F.col("_ox") - F.col("_dx")) * (F.col("_ox") - F.col("_dx"))
            + (F.col("_oy") - F.col("_dy"))
            * (F.col("_oy") - F.col("_dy")))
    d2ik = ((F.col("_ox") - F.col("_kx")) * (F.col("_ox") - F.col("_kx"))
            + (F.col("_oy") - F.col("_ky"))
            * (F.col("_oy") - F.col("_ky")))
    svals = (base.select("_ox", "_oy", "_dx", "_dy")
             .crossJoin(F.broadcast(p))
             .where(((F.col("_kx") != F.col("_ox"))
                     | (F.col("_ky") != F.col("_oy")))
                    & ((F.col("_kx") != F.col("_dx"))
                       | (F.col("_ky") != F.col("_dy")))
                    & (d2ik < d2ij))
             .groupBy("_ox", "_oy", "_dx", "_dy")
             .agg(F.sum("_m").cast("long").alias("s_ij")))
    j = (base.join(svals, ["_ox", "_oy", "_dx", "_dy"], "left")
         .na.fill({"s_ij": 0})
         .join(F.broadcast(mi), ["_ox", "_oy"])
         .join(F.broadcast(nj), ["_dx", "_dy"])
         .join(t_i, ["_ox", "_oy"]))
    num = (F.col("t_i") * F.col("m_i") * F.col("n_j")).cast("long")
    den = ((F.col("m_i") + F.col("s_ij"))
           * (F.col("m_i") + F.col("n_j") + F.col("s_ij"))).cast("long")
    pred = F.when(den > 0,
                  F.round(num.cast("double") * 1000000.0
                          / den.cast("double")).cast("long"))
    return j.select(F.col("_ox").alias(ox), F.col("_oy").alias(oy),
                    F.col("_dx").alias(dx), F.col("_dy").alias(dy),
                    F.col("_n").alias(flow_col), "m_i", "n_j", "s_ij",
                    "t_i", pred.alias("pred_micro"),
                    (F.col("_n") * 1000000 - pred)
                    .alias("resid_micro"))


def burstiness(df: DataFrame, *, key_col: str = "k",
               ts_col: str = "ts_s", min_iet: int = 3) -> DataFrame:
    """Burstiness + memory of inter-event times (Goh & Barabási
    2008) — the two-coordinate signature separating bursty human/
    failure dynamics from Poisson: per key, over the sorted event
    times' gaps ``x_1..x_n``,
    ``B = (σ − μ)/(σ + μ)`` (−1 periodic, 0 Poisson, →1 bursty) and
    the memory coefficient ``M`` = Pearson correlation of
    consecutive gaps. Keys need ``n ≥ min_iet`` gaps (≥ min_iet+1
    events). Returns ``(key, n_iets, sum_iet, b_micro, m_micro)``.

    Exactness: gaps come from one LAG window (event-time order, ties
    broken by the timestamp column's total order — pass distinct
    times or accept zero gaps); with population variance
    ``σ² = (nΣx²−S²)/n²`` the ratio collapses to
    ``B = (sqrt(nΣx²−S²) − S)/(sqrt(nΣx²−S²) + S)`` — every inner
    term an exact BIGINT, sqrt correctly rounded, ONE fixed-shape
    expression micro-rounded. M is the five-exact-sums Pearson over
    (x_t, x_{t+1}) LAG pairs, same discipline (NULL when degenerate).
    Magnitude contract: ``n·Σx²`` within int64 — pass gaps in
    SECONDS, not micros, at human scales.

    Plan: one key-partitioned sort window for gaps (data-sized but
    partition-local), two keyed partial aggs. Nothing quadratic.
    """
    from pyspark.sql import Window
    if min_iet < 2:
        raise ValueError("burstiness: min_iet must be >= 2")
    w = Window.partitionBy("_k").orderBy("_t")
    base = df.where(F.col(ts_col).isNotNull()) \
        .select(F.col(key_col).alias("_k"),
                F.col(ts_col).cast("long").alias("_t"))
    gaps = base.select(
        "_k", "_t",
        (F.col("_t") - F.lag("_t").over(w)).alias("_x")) \
        .where(F.col("_x").isNotNull())
    # consecutive-gap pairs for M: each gap keyed by its END time, a
    # second LAG over the same deterministic event-time order
    pairs = gaps.select("_k", F.col("_x").alias("_b"),
                        F.lag("_x").over(w).alias("_a")) \
        .where(F.col("_a").isNotNull())
    st = gaps.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_iets"),
        F.sum("_x").cast("long").alias("sum_iet"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_ss"))
    pm = pairs.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("_np"),
        F.sum("_a").cast("long").alias("_sa"),
        F.sum("_b").cast("long").alias("_sb"),
        F.sum(F.col("_a") * F.col("_a")).cast("long").alias("_saa"),
        F.sum(F.col("_b") * F.col("_b")).cast("long").alias("_sbb"),
        F.sum(F.col("_a") * F.col("_b")).cast("long").alias("_sab"))
    out = st.join(pm, "_k", "left").where(F.col("n_iets") >= min_iet)
    n = F.col("n_iets")
    disc = (n * F.col("_ss") - F.col("sum_iet") * F.col("sum_iet"))
    root = F.sqrt(disc.cast("double"))
    ssum = F.col("sum_iet").cast("double")
    b = F.when(disc >= 0,
               F.round((root - ssum) / (root + ssum) * 1000000.0)
               .cast("long"))
    np_ = F.col("_np")
    mnum = np_ * F.col("_sab") - F.col("_sa") * F.col("_sb")
    mdx = np_ * F.col("_saa") - F.col("_sa") * F.col("_sa")
    mdy = np_ * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    m = F.when((mdx > 0) & (mdy > 0),
               F.round(mnum.cast("double")
                       / (F.sqrt(mdx.cast("double"))
                          * F.sqrt(mdy.cast("double")))
                       * 1000000.0).cast("long"))
    return out.select(F.col("_k").alias(key_col), "n_iets", "sum_iet",
                      b.alias("b_micro"), m.alias("m_micro"))


def visit_entropy(df: DataFrame, *, key_col: str = "k",
                  loc_col: str = "loc") -> DataFrame:
    """Mobility predictability entropies (Song et al. 2010, the two
    closed-form members): per key over its visit multiset,
    ``S_rand = ln(n_distinct)`` (uniform over visited locations) and
    the temporal-uncorrelated ``S_unc = ln(n) − (Σ c·ln c)/n`` over
    visit counts — the gap between them is how much the VISIT
    DISTRIBUTION alone predicts. Returns ``(key, n_obs, n_distinct,
    s_rand_micro, s_unc_micro)``.

    The :func:`~cdap_geo_spark.operators.text.char_entropy`
    discipline: each location's ``c·ln c`` term is micro-rounded and
    summed as BIGINT (order-independent); the two outer expressions
    are fixed-shape over exact integers. Plan: one (key, loc)
    partial agg bounded by distinct visits, one keyed rollup.
    """
    base = df.where(F.col(loc_col).isNotNull()) \
        .select(F.col(key_col).alias("_k"), F.col(loc_col).alias("_l"))
    counts = base.groupBy("_k", "_l").agg(
        F.count(F.lit(1)).cast("long").alias("_c"))
    term = F.round(F.col("_c").cast("double")
                   * F.log(F.col("_c").cast("double"))
                   * 1000000.0).cast("long")
    per_k = counts.groupBy("_k").agg(
        F.sum("_c").cast("long").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(term).cast("long").alias("_s"))
    s_rand = F.round(F.log(F.col("n_distinct").cast("double"))
                     * 1000000.0).cast("long")
    s_unc = F.round((F.log(F.col("n_obs").cast("double"))
                     - F.col("_s").cast("double") / 1000000.0
                     / F.col("n_obs").cast("double"))
                    * 1000000.0).cast("long")
    return per_k.select(F.col("_k").alias(key_col), "n_obs",
                        "n_distinct", s_rand.alias("s_rand_micro"),
                        s_unc.alias("s_unc_micro"))


def mobility_motifs(pings: DataFrame, *, user_col: str = "u",
                    day_col: str = "d", ord_col: str = "o",
                    loc_col: str = "loc") -> DataFrame:
    """Daily mobility motif census (Schneider et al. 2013) — the
    canonical-form daily location sequences whose ~17 shapes cover
    ~90% of human days: per (user, day), pings collapse to VISITS
    (consecutive-duplicate locations merge), the visit sequence maps
    to its canonical first-occurrence labeling (ABABC → 1-2-1-2-3 —
    location identity is abstracted away, the SHAPE remains), and the
    output is the census ``(motif, motif_len, n_locs,
    n_user_days)``.

    Determinism: the visit order is the total order of ``ord_col``
    (pass a tie-broken ordinal); the canonical label of element i is
    the number of DISTINCT locations in the prefix ending at its
    first occurrence — computed as ``size(distinct(slice(seq, 1,
    first_position)))``, which uses only the SIZE of the distinct
    set (order-free, so Spark's array_distinct and DuckDB's
    list_distinct agree even though their element orders are
    unspecified). All integer higher-order functions, no UDF.

    Plan: one (user, day)-partitioned LAG for the collapse, one
    windowed ordered collect per user-day (partition-local), a
    map-side canonicalization (higher-order functions, no UDF), ONE
    motif-keyed census exchange bounded by distinct user-days.
    """
    from pyspark.sql import Window
    w = Window.partitionBy("_u", "_d").orderBy("_o")
    base = pings.where(F.col(loc_col).isNotNull()) \
        .select(F.col(user_col).alias("_u"), F.col(day_col).alias("_d"),
                F.col(ord_col).alias("_o"),
                F.col(loc_col).cast("long").alias("_l"))
    visits = base.select(
        "_u", "_d", "_o", "_l", F.lag("_l").over(w).alias("_prev")) \
        .where(F.col("_prev").isNull() | (F.col("_l") != F.col("_prev")))
    wseq = (Window.partitionBy("_u", "_d").orderBy("_o")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    seqs = (visits
            .withColumn("_seq", F.collect_list("_l").over(wseq))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1))
    canon = F.transform(
        "_seq",
        lambda x: F.size(F.array_distinct(F.slice(
            F.col("_seq"), 1,
            F.array_position(F.col("_seq"), x).cast("int")))))
    seqs = seqs.select(
        F.concat_ws("-", canon.cast("array<string>")).alias("motif"),
        F.size("_seq").cast("long").alias("motif_len"),
        F.array_max(canon).cast("long").alias("n_locs"))
    return (seqs.groupBy("motif", "motif_len", "n_locs")
            .agg(F.count(F.lit(1)).cast("long").alias("n_user_days")))
