"""applyInPandasWithState operators: streaming sessionize matches the
batch lag/cumsum twin, state carries across micro-batches, streaming
dedup keeps exactly the batch keepers."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.streaming.stateful import (dedup_stream,
                                               sessionize_stream)
from cdap_geo_spark.streaming.windows import sessionize, \
    stream_from_directory

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _events(spark):
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for k in range(6):
            # sessions split at gaps > 30 min: events at 0,10,20 min
            # then 2h, 2h10, 5h -> 3 sessions per user
            mins = [0, 10, 20, 120, 130, 300][k]
            rows.append((u, eid, T0 + dt.timedelta(minutes=mins)))
            eid += 1
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp")


def _run_sessionize_stream(spark, tmp_path, files, name):
    src = str(tmp_path / name)
    ev = files[0]
    import os
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(files):
        f.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, files[0].schema)
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").toPandas()


def test_sessionize_stream_matches_batch(spark, tmp_path):
    ev = _events(spark)
    got = _run_sessionize_stream(spark, tmp_path, [ev], "sess1") \
        .sort_values("event_id").reset_index(drop=True)
    want = sessionize(ev, gap_minutes=30).toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(got.session_seq) == list(want.session_seq)
    assert got.session_seq.max() == 3


def test_sessionize_state_carries_across_batches(spark, tmp_path):
    """Split the feed at an INTRA-session point: a stateless engine
    would restart numbering; the state must carry (last_ts, seq)
    across micro-batches of ONE continuous query."""
    import time
    ev = _events(spark)
    first = ev.filter(F.col("event_id") % 6 < 2)   # events 0,10 min
    second = ev.filter(F.col("event_id") % 6 >= 2)
    src = str(tmp_path / "sess2")
    first.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, ev.schema)
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sess2")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second").start())

    def rows():
        return spark.sql("select count(*) c from sess2").collect()[0].c

    def wait_for(n, timeout=90):
        t0 = time.time()
        while rows() < n:
            assert time.time() - t0 < timeout, f"stuck at {rows()}/{n}"
            time.sleep(1)

    try:
        wait_for(first.count())
        second.coalesce(1).write.mode("append").parquet(src)
        wait_for(ev.count())
    finally:
        q.stop()
    got = spark.sql("select * from sess2").toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = sessionize(ev, gap_minutes=30).toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(got.session_seq) == list(want.session_seq)


def test_dedup_stream_keeps_batch_keepers(spark, tmp_path):
    rows = [(i, f"d{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, digest string")
    src = str(tmp_path / "dd")
    # two micro-batch files: duplicates span the boundary
    df.filter("doc_id < 20").coalesce(1).write.mode("append").parquet(src)
    df.filter("doc_id >= 20").coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, df.schema)
    q = (dedup_stream(stream, key_col="digest", id_col="doc_id")
         .writeStream.format("memory").queryName("dd")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from dd").toPandas() \
        .sort_values("digest").reset_index(drop=True)
    want = df.groupBy("digest").agg(F.min("doc_id").alias("doc_id")) \
        .toPandas().sort_values("digest").reset_index(drop=True)
    assert list(got.digest) == list(want.digest)
    assert list(got.doc_id) == list(want.doc_id)


def test_manifest_sink_idempotent_and_committed_reads(spark, tmp_path):
    """Idempotent foreachBatch sink: replayed batch ids are skipped,
    uncommitted straggler dirs are invisible to read_committed."""
    import json
    import os
    import pandas as pd
    from cdap_geo_spark.streaming.sink import (
        manifest_batch_writer, read_committed, sink_stats,
        start_manifest_sink)
    src = str(tmp_path / "msrc")
    os.makedirs(src)
    pd.DataFrame({"event_id": [1, 2, 3], "v": [10, 20, 30]}) \
        .to_parquet(os.path.join(src, "a.parquet"))
    sdf = spark.readStream.schema("event_id long, v long").parquet(src)
    out = str(tmp_path / "mout")
    q = start_manifest_sink(sdf, out,
                            checkpoint=str(tmp_path / "mckpt"),
                            query_name="msink1")
    q.awaitTermination(120)
    got = read_committed(spark, out)
    assert sorted(r.event_id for r in got.collect()) == [1, 2, 3]
    stats = sink_stats(out)
    assert stats["rows"] == 3 and stats["n_batches"] >= 1

    # crash-replay simulation: re-invoking the writer with an already
    # committed batch id must be a no-op (no duplicate rows)
    writer = manifest_batch_writer(out)
    committed = stats["batches"][0]["batch_id"]
    writer(spark.createDataFrame([(99, 0)], "event_id long, v long"),
           committed)
    assert read_committed(spark, out).count() == 3

    # an uncommitted straggler directory is invisible
    frag = spark.createDataFrame([(7, 7)], "event_id long, v long")
    frag.write.parquet(os.path.join(out, "batch=12345"))
    assert read_committed(spark, out).count() == 3
    # ...until a (re)run commits it
    writer(frag, 12345)
    assert read_committed(spark, out).count() == 4


def test_windowed_counts_accept_late_rows_across_batches(spark, tmp_path):
    """Round-5 VERDICT #7: the readStream twin of
    windowed_event_counts must fold LATE data arriving in a later
    micro-batch into its still-open window under the watermark, so
    the batch twin stays its oracle under out-of-order input.
    Append mode: a window's row is emitted exactly once, after the
    watermark passes its end — so equality with batch proves the late
    row landed in the window BEFORE finalization."""
    import datetime as dt
    import time

    from cdap_geo_spark.streaming.windows import (stream_from_directory,
                                                  windowed_event_counts)

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(hh, mm, v):
        return (t0 + dt.timedelta(hours=hh, minutes=mm), "a", v)

    schema = "ts timestamp, event_type string, value double"
    b1 = spark.createDataFrame(
        [ev(0, 10, 1.0), ev(1, 20, 2.0), ev(2, 15, 4.0),
         ev(3, 30, 8.0)], schema)
    # late row for the [1,2) window (watermark at this point is
    # 3:30-2h = 1:30 < 2:00, so the window is still open) + advance
    late_plus = spark.createDataFrame(
        [ev(1, 10, 16.0), ev(8, 0, 32.0)], schema)
    flush = spark.createDataFrame([ev(20, 0, 0.0)], schema)

    src = str(tmp_path / "late_src")
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, b1.schema)
    q = (windowed_event_counts(stream, window="1 hour",
                               watermark="2 hours")
         .writeStream.format("memory").queryName("late_win")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "late_ckpt"))
         .trigger(processingTime="1 second").start())

    def rows():
        return spark.sql("select count(*) c from late_win").collect()[0].c

    def wait_for(n, timeout=90):
        t1 = time.time()
        while rows() < n:
            assert time.time() - t1 < timeout, f"stuck at {rows()}/{n}"
            time.sleep(1)
    try:
        wait_for(1)                       # [0,1) finalized by b1
        late_plus.coalesce(1).write.mode("append").parquet(src)
        wait_for(4)                       # [1,2),[2,3),[3,4) join it
        flush.coalesce(1).write.mode("append").parquet(src)
        wait_for(5)                       # [8,9) finalized by flush
    finally:
        q.stop()

    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in spark.sql("select * from late_win").collect()}
    all_rows = b1.unionByName(late_plus).unionByName(flush)
    want = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in windowed_event_counts(all_rows, window="1 hour")
            .collect() if r.window_start < t0 + dt.timedelta(hours=20)}
    assert got == want
    # the late 1:10 row was folded in: [1,2) holds BOTH rows
    late_key = (t0 + dt.timedelta(hours=1), "a")
    assert got[late_key] == (2, 18.0)


def test_windowed_distinct_hll_stream_equals_batch(spark, tmp_path):
    """The streaming twin of windowed_distinct_hll emits the SAME
    sketch relation as the batch twin, including a late row that adds
    a new distinct user to a still-open window — so finalized
    estimates (hll_finalize) agree exactly. Emitting the sketch (not
    the estimate) keeps the stream to ONE stateful aggregation in
    append mode; finalize is read-time."""
    import datetime as dt
    import time

    from cdap_geo_spark.operators.sketch import hll_finalize
    from cdap_geo_spark.streaming.windows import (stream_from_directory,
                                                  windowed_distinct_hll)

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(hh, mm, uid):
        return (t0 + dt.timedelta(hours=hh, minutes=mm), uid)

    schema = "ts timestamp, user_id long"
    b1 = spark.createDataFrame(
        [ev(0, 10, 1), ev(0, 20, 2), ev(1, 5, 10), ev(1, 6, 10),
         ev(3, 30, 7)], schema)
    # late NEW distinct user for the still-open [1,2) window
    late_plus = spark.createDataFrame([ev(1, 50, 11), ev(8, 0, 5)],
                                      schema)
    flush = spark.createDataFrame([ev(20, 0, 99)], schema)

    src = str(tmp_path / "hll_src")
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, b1.schema)
    q = (windowed_distinct_hll(stream, value_col="user_id",
                               window="1 hour", p=6,
                               watermark="2 hours")
         .writeStream.format("memory").queryName("hll_win")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
         .trigger(processingTime="1 second").start())

    def n_windows():
        return spark.sql(
            "select count(distinct window_start) c from hll_win"
        ).collect()[0].c

    def wait_for(n, timeout=90):
        t1 = time.time()
        while n_windows() < n:
            assert time.time() - t1 < timeout, \
                f"stuck at {n_windows()}/{n}"
            time.sleep(1)
    try:
        wait_for(1)                      # [0,1) finalized by b1
        late_plus.coalesce(1).write.mode("append").parquet(src)
        wait_for(3)                      # [1,2) incl. late user, [3,4)
        flush.coalesce(1).write.mode("append").parquet(src)
        wait_for(4)                      # [8,9)
    finally:
        q.stop()

    got_rel = spark.sql("select * from hll_win")
    all_rows = b1.unionByName(late_plus).unionByName(flush)
    cutoff = t0 + dt.timedelta(hours=20)
    want_rel = windowed_distinct_hll(all_rows, value_col="user_id",
                                     window="1 hour", p=6) \
        .where(F.col("window_start") < cutoff)
    got = sorted(map(tuple, got_rel.collect()))
    want = sorted(map(tuple, want_rel.collect()))
    assert got == want                    # sketch relations identical
    # read-time finalize agrees too, and [1,2) counts the late user
    est = {r.window_start: r.est_distinct for r in
           hll_finalize(got_rel, group_cols=["window_start"],
                        p=6).collect()}
    w12 = t0 + dt.timedelta(hours=1)
    assert round(est[w12]) == 2           # users 10 and 11


def test_windowed_cms_stream_equals_batch(spark, tmp_path):
    """The streaming twin of windowed_cms emits the SAME sketch
    relation as the batch twin, including a late repeat event that
    bumps a still-open window's bucket counts — so stateless
    cms_estimate readouts agree exactly."""
    import datetime as dt
    import time

    from cdap_geo_spark.operators.sketch import cms_estimate
    from cdap_geo_spark.streaming.windows import (stream_from_directory,
                                                  windowed_cms)

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(hh, mm, uid):
        return (t0 + dt.timedelta(hours=hh, minutes=mm), uid)

    schema = "ts timestamp, user_id long"
    b1 = spark.createDataFrame(
        [ev(0, 10, 1), ev(0, 20, 2), ev(1, 5, 10), ev(1, 6, 10),
         ev(3, 30, 7)], schema)
    # late REPEAT of user 10 in the still-open [1,2) window
    late_plus = spark.createDataFrame([ev(1, 50, 10), ev(8, 0, 5)],
                                      schema)
    flush = spark.createDataFrame([ev(20, 0, 99)], schema)

    src = str(tmp_path / "cms_src")
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, b1.schema)
    q = (windowed_cms(stream, value_col="user_id", window="1 hour",
                      depth=3, width=32, watermark="2 hours")
         .writeStream.format("memory").queryName("cms_win")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
         .trigger(processingTime="1 second").start())

    def n_windows():
        return spark.sql(
            "select count(distinct window_start) c from cms_win"
        ).collect()[0].c

    def wait_for(n, timeout=90):
        t1 = time.time()
        while n_windows() < n:
            assert time.time() - t1 < timeout, \
                f"stuck at {n_windows()}/{n}"
            time.sleep(1)
    try:
        wait_for(1)
        late_plus.coalesce(1).write.mode("append").parquet(src)
        wait_for(3)
        flush.coalesce(1).write.mode("append").parquet(src)
        wait_for(4)
    finally:
        q.stop()

    got_rel = spark.sql("select * from cms_win")
    all_rows = b1.unionByName(late_plus).unionByName(flush)
    cutoff = t0 + dt.timedelta(hours=20)
    want_rel = windowed_cms(all_rows, value_col="user_id",
                            window="1 hour", depth=3, width=32) \
        .where(F.col("window_start") < cutoff)
    got = sorted(map(tuple, got_rel.collect()))
    want = sorted(map(tuple, want_rel.collect()))
    assert got == want
    # stateless readout: user 10 counted 3x in [1,2) incl. the late row
    probes = spark.createDataFrame(
        [(t0 + dt.timedelta(hours=1), "10")], "window_start timestamp, "
                                              "uid string")
    est = cms_estimate(got_rel, probes, value_col="uid",
                       group_cols=["window_start"], depth=3,
                       width=32).collect()
    assert est[0].est_count == 3


def test_session_stats_matches_bruteforce_and_single_exchange(spark):
    """session_stats: per-session aggregates vs a pandas
    reimplementation, and the free-aggregation plan pin — the
    sessionize window's user_id hash partitioning satisfies the
    (user_id, session_seq) groupBy, so ONE exchange total."""
    import datetime as dt
    import random

    import pandas as pd

    from cdap_geo_spark.streaming.windows import session_stats

    rng = random.Random(53)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=rng.randrange(500_000)),
             rng.randrange(12), round(rng.uniform(0, 50), 2))
            for i in range(400)]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "value"])
    df = spark.createDataFrame(pdf).repartition(6)
    out = session_stats(df, gap_minutes=30)
    got = {(r.user_id, r.session_seq):
           (r.n_events, r.duration_s, r.sum_scaled,
            r.first_event_id, r.last_event_id)
           for r in out.collect()}

    want = {}
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        seq, last = 0, None
        sessions = {}
        for r in g.itertuples():
            e = int(pd.Timestamp(r.ts).value // 10**9)
            if last is None or e - last > 1800:
                seq += 1
            last = e
            sessions.setdefault(seq, []).append(
                (r.event_id, e, round(r.value * 100)))
        for s, evs in sessions.items():
            want[(uid, s)] = (len(evs),
                              max(e for _, e, _ in evs)
                              - min(e for _, e, _ in evs),
                              sum(c for _, _, c in evs),
                              min(i for i, _, _ in evs),
                              max(i for i, _, _ in evs))
    assert got == want

    # after an action the AQE plan string prints BOTH the final and
    # the initial plan — count keyed exchanges in the final plan only
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Exchange hashpartitioning") == 1


def test_attach_within_batch_matches_bruteforce(spark):
    import datetime as dt
    import random

    from cdap_geo_spark.operators import sjoin  # noqa: F401
    from cdap_geo_spark.streaming.joins import attach_within

    t0 = dt.datetime(2026, 1, 1)
    rng = random.Random(13)
    rows = [(i, t0 + dt.timedelta(minutes=rng.randrange(600)),
             rng.randrange(8), rng.choice(["click", "view"]))
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r.key, r.l_id, r.r_id, r.lag_us) for r in
           attach_within(df.where("event_type='click'"),
                         df.where("event_type='view'"),
                         max_lag_minutes=30).collect()}
    want = set()
    for cid, cts, cu, ctyp in rows:
        if ctyp != "click":
            continue
        for vid, vts, vu, vtyp in rows:
            if (vtyp == "view" and vu == cu and vts <= cts
                    and vts >= cts - dt.timedelta(minutes=30)):
                want.add((cu, cid, vid,
                          int((cts - vts).total_seconds() * 1_000_000)))
    assert got == want and len(want) > 0


def test_attach_within_batch_plan_no_nested_loop(spark):
    import datetime as dt

    from cdap_geo_spark.streaming.joins import attach_within

    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i), i % 4, "click") for i in
         range(50)],
        "event_id long, ts timestamp, user_id long, event_type string")
    plan = attach_within(df, df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    import pytest as _pt
    with _pt.raises(ValueError):
        attach_within(df, df, max_lag_minutes=0)


def test_attach_within_stream_equals_batch_across_microbatches(spark,
                                                               tmp_path):
    """Stream-stream inner join: a click whose matching view arrives in
    a LATER micro-batch still pairs (the click is buffered in the join
    state until the watermark passes), and the final streamed relation
    equals the batch twin exactly."""
    import datetime as dt
    import time

    from cdap_geo_spark.streaming.joins import attach_within
    from cdap_geo_spark.streaming.windows import stream_from_directory

    t0 = dt.datetime(2026, 1, 1)

    def ev(eid, mins, uid, typ):
        return (eid, t0 + dt.timedelta(minutes=mins), uid, typ)

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string")
    # batch 1: user 1's click BEFORE its view arrives; user 2 complete;
    # user 4's same-instant pair; user 3's view too old to match
    b1 = spark.createDataFrame(
        [ev(10, 30, 1, "click"), ev(20, 60, 2, "view"),
         ev(21, 70, 2, "click"), ev(30, 0, 3, "view"),
         ev(40, 120, 4, "view"), ev(41, 120, 4, "click")], schema)
    # batch 2: user 1's view (ts BEFORE the already-seen click),
    # user 3's click 10h later (outside the 4h lag), plus a flush row
    b2 = spark.createDataFrame(
        [ev(11, 0, 1, "view"), ev(31, 600, 3, "click"),
         ev(99, 1200, 9, "view")], schema)

    src = str(tmp_path / "att_src")
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, b1.schema)
    out = attach_within(stream.where("event_type='click'"),
                        stream.where("event_type='view'"),
                        max_lag_minutes=240, watermark="4 hours")
    q = (out.writeStream.format("memory").queryName("att")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "att_ckpt"))
         .trigger(processingTime="1 second").start())

    def rows():
        return {tuple(r) for r in spark.sql(
            "select key, l_id, r_id, lag_us from att").collect()}

    def wait_for(n, timeout=90):
        t1 = time.time()
        while len(rows()) < n:
            assert time.time() - t1 < timeout, \
                f"stuck at {len(rows())}/{n}: {rows()}"
            time.sleep(0.5)

    try:
        wait_for(2)   # (2) and (4) pair within batch 1
        b2.coalesce(1).write.mode("append").parquet(src)
        wait_for(3)   # user 1's cross-batch pair emits
        streamed = rows()
    finally:
        q.stop()

    batch = {tuple(r) for r in
             attach_within(b1.unionByName(b2).where("event_type='click'"),
                           b1.unionByName(b2).where("event_type='view'"),
                           max_lag_minutes=240).collect()}
    assert streamed == batch
    assert (1, 10, 11, 30 * 60 * 1_000_000) in streamed
    assert (4, 41, 40, 0) in streamed
    assert not any(k == 3 for k, *_ in streamed)


def test_windowed_topk_batch_bruteforce(spark):
    """Exact per-window counts + the (n DESC, key ASC) rank rule."""
    import datetime as dt
    from cdap_geo_spark.streaming.windows import (topk_finalize,
                                                  windowed_counts_by_key)
    t0 = dt.datetime(2026, 1, 1)
    rows = [(t0 + dt.timedelta(hours=h, minutes=m), u)
            for h, m, u in [(0, 1, 1), (0, 2, 1), (0, 3, 2), (0, 4, 2),
                            (0, 5, 3), (1, 1, 9)]]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    rel = windowed_counts_by_key(df, key_col="user_id", window="1 hour")
    got = sorted((str(r.window_start), r.user_id, r.n, r.rank)
                 for r in topk_finalize(rel, k=2).collect())
    w0, w1 = str(t0), str(t0 + dt.timedelta(hours=1))
    # users 1 and 2 tie at n=2 -> smaller id ranks first; 3 is cut
    assert got == [(w0, 1, 2, 1), (w0, 2, 2, 2), (w1, 9, 1, 1)]
    import pytest as _pt
    with _pt.raises(ValueError):
        topk_finalize(rel, k=0)


def test_windowed_topk_stream_equals_batch(spark, tmp_path):
    """The streaming twin emits the same count relation as the batch
    twin, including a late event folding into a still-open window —
    so the stateless topk_finalize readout agrees exactly."""
    import datetime as dt
    import time

    from cdap_geo_spark.streaming.windows import (stream_from_directory,
                                                  windowed_counts_by_key)

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(hh, mm, uid):
        return (t0 + dt.timedelta(hours=hh, minutes=mm), uid)

    schema = "ts timestamp, user_id long"
    b1 = spark.createDataFrame(
        [ev(0, 10, 1), ev(0, 20, 1), ev(0, 25, 2), ev(1, 5, 7)], schema)
    # late event for user 2 in the still-open [0,1) window
    late_plus = spark.createDataFrame([ev(0, 50, 2), ev(8, 0, 5)],
                                      schema)
    flush = spark.createDataFrame([ev(20, 0, 99)], schema)

    src = str(tmp_path / "topk_src")
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, b1.schema)
    q = (windowed_counts_by_key(stream, key_col="user_id",
                                window="1 hour", watermark="2 hours")
         .writeStream.format("memory").queryName("topk_win")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "topk_ckpt"))
         .trigger(processingTime="1 second").start())

    def n_windows():
        return spark.sql(
            "select count(distinct window_start) c from topk_win"
        ).collect()[0].c

    def wait_for(n, timeout=90):
        t1 = time.time()
        while n_windows() < n:
            assert time.time() - t1 < timeout, \
                f"stuck at {n_windows()}/{n}"
            q.processAllAvailable()
            time.sleep(0.2)

    wait_for(0)
    late_plus.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    flush.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    wait_for(3)
    q.stop()

    batch_rows = spark.createDataFrame(
        b1.collect() + late_plus.collect() + flush.collect(), schema)
    want = {(str(r.window_start), r.user_id, r.n)
            for r in windowed_counts_by_key(
                batch_rows, key_col="user_id", window="1 hour")
            .collect() if r.window_start < t0 + dt.timedelta(hours=19)}
    got = {(str(r.window_start), r.user_id, r.n)
           for r in spark.sql("select * from topk_win").collect()}
    assert got == want
    # the late event is IN the emitted counts: user 2 has n=2
    assert (str(t0), 2, 2) in got


def _fences():
    return [(7, 10, 10, 60, 60), (8, 40, 40, 90, 90)]


def _walk(spark):
    rows = []
    eid = 0
    for u in (1, 2):
        # walk: outside -> fence7 -> overlap(7&8) -> fence8 -> outside
        for k, (x, y) in enumerate([(0, 0), (20, 20), (50, 50),
                                    (80, 80), (200, 200)]):
            rows.append((u, eid, T0 + dt.timedelta(minutes=10 * k),
                         x, y))
            eid += 1
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, x long, y long")


def _run_geofence_stream(spark, tmp_path, files, name):
    import os
    from cdap_geo_spark.streaming.stateful import geofence_stream
    from cdap_geo_spark.streaming.windows import stream_from_directory
    src = str(tmp_path / name)
    os.makedirs(src, exist_ok=True)
    for f in files:
        f.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, files[0].schema)
    q = (geofence_stream(stream, _fences())
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").toPandas()


def test_geofence_stream_matches_batch(spark, tmp_path):
    from cdap_geo_spark.operators.zonal import geofence_transitions
    ev = _walk(spark)
    fdf = spark.createDataFrame(
        _fences(),
        "fence_id long, minx long, miny long, maxx long, maxy long")
    got = _run_geofence_stream(spark, tmp_path, [ev], "geo1")
    want = geofence_transitions(ev, fdf, cell=64).toPandas()
    gset = {tuple(r) for r in got.itertuples(index=False)}
    wset = {tuple(r) for r in want.itertuples(index=False)}
    assert gset == wset
    assert any(k == "exit" for *_, k in gset)


def test_geofence_stream_state_across_batches(spark, tmp_path):
    """Split mid-stay: the user enters fence 7 in batch 1 and leaves
    in batch 2 — a stateless engine would re-enter; the state array
    must carry the open stay across micro-batches."""
    ev = _walk(spark)
    b1 = ev.where("event_id % 5 <= 1")   # outside, enter 7
    b2 = ev.where("event_id % 5 >= 2")   # 7&8, 8, outside
    got = _run_geofence_stream(spark, tmp_path, [b1, b2], "geo2")
    u1 = got[got.user_id == 1].sort_values(["event_id", "fence_id"])
    seq = list(zip(u1.event_id, u1.fence_id, u1.kind))
    assert seq == [(1, 7, "enter"), (2, 8, "enter"), (3, 7, "exit"),
                   (4, 8, "exit")]


def _run_flow_stream(spark, tmp_path, files, name):
    import os
    from cdap_geo_spark.streaming.stateful import flow_stream
    from cdap_geo_spark.streaming.windows import stream_from_directory
    src = str(tmp_path / name)
    os.makedirs(src, exist_ok=True)
    for f in files:
        f.coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_directory(spark, src, files[0].schema)
    q = (flow_stream(stream, cell=64)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").toPandas()


def _flow_walk(spark):
    import datetime as dtm
    t0 = dtm.datetime(2026, 1, 1, tzinfo=dtm.timezone.utc)
    rows = []
    for u, path in [(1, [(10, 10), (70, 20), (75, 90), (200, 210)]),
                    (2, [(300, 300), (260, 310), (100, 100)])]:
        for i, (x, y) in enumerate(path):
            rows.append((u * 100 + i, u,
                         t0 + dtm.timedelta(minutes=i), x, y))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "x long, y long")


def test_flow_stream_matches_batch_displacements(spark, tmp_path):
    ev = _flow_walk(spark)
    got = _run_flow_stream(spark, tmp_path, [ev], "flow1")
    # batch truth: per-user consecutive displacements with origin cell
    from pyspark.sql import Window, functions as F
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (ev.select("user_id",
                      F.lag("x").over(w).alias("px"),
                      F.lag("y").over(w).alias("py"),
                      (F.col("x") - F.lag("x").over(w)).alias("dx"),
                      (F.col("y") - F.lag("y").over(w)).alias("dy"))
            .where(F.col("dx").isNotNull())
            .selectExpr("user_id", "px DIV 64 AS cx", "py DIV 64 AS cy",
                        "dx", "dy").toPandas())
    assert ({tuple(r) for r in got.itertuples(index=False)}
            == {tuple(r) for r in want.itertuples(index=False)})


def test_flow_stream_state_across_batches(spark, tmp_path):
    """The displacement CROSSING the micro-batch boundary must be
    emitted — a stateless engine would drop it."""
    ev = _flow_walk(spark)
    b1 = ev.where("event_id % 100 <= 1")
    b2 = ev.where("event_id % 100 >= 2")
    got = _run_flow_stream(spark, tmp_path, [b1, b2], "flow2")
    whole = _run_flow_stream(spark, tmp_path, [ev], "flow3")
    assert ({tuple(r) for r in got.itertuples(index=False)}
            == {tuple(r) for r in whole.itertuples(index=False)})
    # user 1 has 3 displacements incl. the cross-batch one
    assert (got[got.user_id == 1].shape[0] == 3)
