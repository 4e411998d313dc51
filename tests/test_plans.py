"""Physical-plan regression tests: the plan shape IS the product at
100 TB, so pin it (SURVEY.md §4 / task brief: '.explain the plan and
iterate until it's the plan you'd want')."""

from pyspark.sql import functions as F

from cdap_geo_spark import docs as D, fixtures
from cdap_geo_spark.operators.sjoin import sjoin_pairs
from cdap_geo_spark.operators.tiles import assign_tiles


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_tile_assign_has_no_shuffle(spark):
    dd = D.with_geometry(fixtures.documents(spark, 50, partitions=2))
    plan = _plan(assign_tiles(dd, bbox=(0, 0, 700_000, 1_300_000), splits=10))
    # map-side only: no Exchange anywhere
    assert "Exchange" not in plan, plan


def test_sjoin_broadcast_plan(spark):
    dd = D.with_geometry(fixtures.documents(spark, 50, partitions=2))
    rr = fixtures.regions(spark, 20)
    plan = _plan(sjoin_pairs(dd, rr, left_id="doc_id", right_id="region_id",
                             level=7, broadcast=True))
    assert "BroadcastHashJoin" in plan
    # dedup happens on narrow id pairs -> hash aggregate, never sort agg
    assert "SortAggregate" not in plan
    # exactly one shuffle: the pair dedup (broadcast join adds none)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, plan


def test_sjoin_column_pruning(spark):
    # payload (spans) must not be scanned on the pairs-only path
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "docs")
        fixtures.documents(spark, 50, partitions=2).write.parquet(p)
        docs = D.with_geometry(spark.read.parquet(p))
        rr = fixtures.regions(spark, 20)
        pairs = sjoin_pairs(docs, rr, left_id="doc_id",
                            right_id="region_id", level=7)
        plan = _plan(pairs)
        # the parquet scan of docs reads doc_id + spans (geometry is
        # derived from spans) — but bounds/cells columns never hit disk,
        # and the payload never crosses a shuffle: the only exchange
        # carries just the id pair
        assert "PushedFilters" in plan or "ReadSchema" in plan


def test_salted_join_replicates_right_side(spark):
    dd = D.with_geometry(fixtures.documents(spark, 50, partitions=2))
    rr = fixtures.regions(spark, 20)
    plan = _plan(sjoin_pairs(dd, rr, left_id="doc_id", right_id="region_id",
                             level=7, salt=4, broadcast=False))
    assert "explode" in plan.lower()  # right side replicated by salt


def test_sdf_autopartition_widens_not_shrinks(spark):
    from cdap_geo_spark.functions.relational import sdf_autopartition
    # already-wide tiny frame: every target <= current -> unchanged
    # (the thread term alone is parallelism*1.5 = 12 on the test session)
    small = spark.range(10).repartition(16)
    assert sdf_autopartition(small).rdd.getNumPartitions() == 16
    # 1-partition frame widens to >= thread_ratio * parallelism
    one = spark.range(1_000_000).coalesce(1)
    out = sdf_autopartition(one)
    par = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() >= round(par * 1.5)


def test_sdf_autopartition_partition_by(spark):
    from pyspark.sql import functions as F
    from cdap_geo_spark.functions.relational import sdf_autopartition
    df = spark.range(1_000_000).withColumn("k", F.col("id") % 7).coalesce(1)
    out = sdf_autopartition(df, partition_by="k")
    assert out.rdd.getNumPartitions() > 1


def test_similarity_ops_have_no_single_partition_exchange(spark):
    # round-2 regression class: ngram_jaccard's dictionary encoding ran
    # a global no-partition window = one SinglePartition exchange = one
    # task owning the whole corpus. Pin ALL similarity pipelines to
    # zero single-partition exchanges.
    from cdap_geo_spark.operators.dedup import (minhash_lsh_pairs,
                                                ngram_jaccard_pairs,
                                                simhash_pairs)
    df = spark.createDataFrame(
        [(i, f"doc number {i} alpha bravo charlie") for i in range(30)],
        "doc_id long, text string").repartition(4)
    # allpairs=False pins the DISTRIBUTED regime: on a 30-doc corpus
    # the bitset regime legitimately plans a 1-row block-pair grid
    # (the corpus travels via broadcast, not the exchange) — that
    # SinglePartition carries one grid row, not the corpus, and has
    # its own scaling pin (test_allpairs_grid_exchange_scales).
    for out in (ngram_jaccard_pairs(df, k=3, threshold_pct=40,
                                    allpairs=False),
                minhash_lsh_pairs(df, threshold=0.5),
                simhash_pairs(df, max_hamming=3)):
        plan = _plan(out)
        assert "SinglePartition" not in plan, plan[:2000]


def test_allpairs_grid_exchange_scales(spark, monkeypatch):
    # the bitset regime's only exchange is the block-pair grid; pin
    # that it widens with the block count (no single-task bottleneck
    # once the corpus spans multiple blocks)
    from cdap_geo_spark.operators import dedup as DD
    monkeypatch.setattr(DD, "_ALLPAIRS_BLOCK", 4)
    df = spark.createDataFrame(
        [(i, f"doc number {i} alpha bravo charlie") for i in range(30)],
        "doc_id long, text string").repartition(4)
    out = DD.ngram_jaccard_pairs(df, k=3, threshold_pct=40, allpairs=True)
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan[:2000]
    # 30 docs / block 4 -> 8 blocks -> 36 grid pairs, capped at 2x par
    assert out.rdd.getNumPartitions() == min(
        36, spark.sparkContext.defaultParallelism * 2)


def test_sdf_unique_memsize_print_stats(spark, capsys):
    from cdap_geo_spark.functions.relational import (
        sdf_memsize, sdf_print_stats, sdf_unique)
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               "id long, k string")
    vals = sorted(r.k for r in sdf_unique(df, "k"))
    assert vals == ["a", "b"]
    assert sdf_memsize(df) > 0
    out = sdf_print_stats(df, name="t")
    assert out is df
    printed = capsys.readouterr().out
    assert "t:  Count=3," in printed and "Parts=" in printed


def test_apply_changelog_upserts_deletes_and_passthrough(spark):
    from pyspark.sql import functions as F

    from cdap_geo_spark.functions.relational import apply_changelog

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, val string")
    changes = spark.createDataFrame(
        [(2, 1, "U", "b2"),    # update
         (3, 1, "D", None),    # delete
         (5, 1, "U", "e"),     # insert of a new key
         (4, 1, "U", "d2"),    # update...
         (4, 2, "D", None)],   # ...then delete at a later version
        "id long, version long, op string, val string")
    got = {(r.id, r.val) for r in
           apply_changelog(base, changes, key="id").collect()}
    assert got == {(1, "a"), (2, "b2"), (5, "e")}
    # plan: one exchange for the window, no join of base x changes
    plan = apply_changelog(base, changes, key="id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    del F


def test_scd2_build_intervals(spark):
    from cdap_geo_spark.functions.relational import scd2_build

    changes = spark.createDataFrame(
        [(1, 0, "U", "a"),      # created, updated, still current
         (1, 3, "U", "a2"),
         (2, 0, "U", "b"),      # created then deleted
         (2, 5, "D", None),
         (3, 2, "U", "c"),      # single still-current row
         (4, 1, "D", None)],    # delete with no prior upsert: no rows
        "id long, version long, op string, val string")
    got = sorted(tuple(r) for r in scd2_build(changes, key="id").collect())
    assert got == [
        (1, "a", 0, 3, 0),
        (1, "a2", 3, None, 1),
        (2, "b", 0, 5, 0),
        (3, "c", 2, None, 1),
    ]
    # one keyed window, never a self-join of the log
    plan = scd2_build(changes, key="id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_scd2_current_rows_match_apply_changelog(spark):
    # the SCD2 history's is_current slice must equal the merged
    # snapshot (minus deleted keys) — the two operators are views of
    # the same log
    import random

    from pyspark.sql import functions as F

    from cdap_geo_spark.functions.relational import (apply_changelog,
                                                     scd2_build)

    rng = random.Random(3)
    base_rows = [(k, f"v{k}") for k in range(30)]
    ch_rows = []
    for k in range(30):
        for v in range(1, rng.randrange(0, 4) + 1):
            op = "D" if rng.random() < 0.25 else "U"
            ch_rows.append((k, v, op, f"v{k}.{v}" if op == "U" else None))
    base = spark.createDataFrame(base_rows, "id long, val string")
    changes = spark.createDataFrame(
        ch_rows, "id long, version long, op string, val string")
    log = base.select("id", F.lit(0).cast("long").alias("version"),
                      F.lit("U").alias("op"), "val").unionByName(changes)
    cur = {(r.id, r.val) for r in
           scd2_build(log, key="id").where("is_current = 1").collect()}
    snap = {(r.id, r.val) for r in
            apply_changelog(base, changes, key="id").collect()}
    assert cur == snap


def test_pivot_counts_bruteforce_and_zeros(spark):
    from cdap_geo_spark.functions.relational import pivot_counts

    rows = [(1, "a", 10), (1, "a", 20), (1, "b", 5),
            (2, "b", 7), (3, "c", 1)]
    df = spark.createDataFrame(rows, "g long, cat string, v long")
    got = {r.g: (r.a, r.b) for r in
           pivot_counts(df, group_col="g", pivot_col="cat",
                        values=["a", "b"]).collect()}
    # category 'c' not in the explicit list -> ignored; absent
    # categories count 0, never NULL
    assert got == {1: (2, 1), 2: (0, 1), 3: (0, 0)}
    sums = {r.g: (r.a, r.b) for r in
            pivot_counts(df, group_col="g", pivot_col="cat",
                         values=["a", "b"], value_col="v").collect()}
    assert sums == {1: (30, 5), 2: (0, 7), 3: (0, 0)}
    import pytest as _pt
    with _pt.raises(ValueError):
        pivot_counts(df, group_col="g", pivot_col="cat", values=[])


def test_profile_columns_values_and_validation(spark):
    import pytest as _pt
    from cdap_geo_spark.functions.relational import profile_columns
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "a", 30), (4, None, 30)],
        "id long, s string, v long")
    got = {r.column: (r.n_rows, r.n_nulls, r.n_distinct, r.min_s, r.max_s)
           for r in profile_columns(df, ["id", "s", "v"]).collect()}
    assert got["id"] == (4, 0, 4, "1", "4")
    assert got["s"] == (4, 1, 2, "a", "b")
    assert got["v"] == (4, 1, 2, "10", "30")
    with _pt.raises(ValueError):
        profile_columns(df, [])


def test_dq_check_values(spark):
    import pytest as _pt
    from pyspark.sql import functions as F
    from cdap_geo_spark.functions.relational import dq_check
    df = spark.createDataFrame(
        [(1, "en", 5), (2, "xx", -1), (3, None, 7), (3, "en", None)],
        "id long, lang string, n long")
    got = {r.rule: (r.n_rows, r.n_violations) for r in dq_check(
        df, {"n_nonneg": F.col("n") >= 0,
             "lang_known": F.col("lang").isin("en", "de")},
        unique_cols=["id"]).collect()}
    # NULL rule results are violations; id=3 duplicated once
    assert got == {"n_nonneg": (4, 2), "lang_known": (4, 2),
                   "unique:id": (4, 1)}
    with _pt.raises(ValueError):
        dq_check(df, {})


def test_benford_deviation_brute_force(spark):
    """benford_deviation == python brute force, including zero-count
    digits (they still contribute (0-e)^2/e to chi2) and the
    zero/NULL-value exclusions."""
    import math
    from cdap_geo_spark.functions.relational import benford_deviation
    vals = ([1.23] * 30 + [19.9] * 18 + [2.5] * 11 + [33.0] * 7
            + [4.04] * 5 + [0.0] * 4 + [None] * 3 + [91.0] * 2)
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    rows = {r.digit: r for r in
            benford_deviation(df, value_col="value").collect()}
    assert set(rows) == set(range(1, 10))
    obs = {d: 0 for d in range(1, 10)}
    for v in vals:
        if v is None:
            continue
        s = round(abs(v) * 100)
        if s > 0:
            obs[int(str(s)[0])] += 1
    n = sum(obs.values())
    chi2 = 0.0
    for d in range(1, 10):  # digit-ordered left fold, like the engine
        e = n * math.log10(1 + 1 / d)
        chi2 += (obs[d] - e) ** 2 / e
    for d in range(1, 10):
        e = n * math.log10(1 + 1 / d)
        assert rows[d].n_obs == obs[d]
        assert rows[d].exp_u == round(1e6 * e)
        assert rows[d].chi2_u == round(1e6 * chi2)
    assert rows[5].n_obs == 0  # a genuinely absent digit was exercised


def test_k_anonymity_counts(spark):
    from cdap_geo_spark.functions.relational import k_anonymity
    rows = ([("a", 1)] * 6 + [("a", 2)] * 2 + [("b", 1)] * 1
            + [(None, 1)] * 3)  # NULL is its own class
    df = spark.createDataFrame(rows, "qa string, qb int")
    (r,) = k_anonymity(df, quasi_cols=["qa", "qb"], k=5).collect()
    assert (r.n_rows, r.n_classes, r.n_violating_classes,
            r.rows_at_risk, r.min_class_size) == (12, 4, 3, 6, 1)
    import pytest as _pt
    with _pt.raises(ValueError):
        k_anonymity(df, quasi_cols=[], k=5)
    with _pt.raises(ValueError):
        k_anonymity(df, quasi_cols=["qa"], k=1)


def test_ab_test_brute_force_and_degenerate(spark):
    """ab_test == python brute force over the md5 arm rule; degenerate
    configurations yield NULL z but exact counts."""
    import hashlib
    from pyspark.sql import functions as F
    from cdap_geo_spark.operators.timeseries import ab_test
    from cdap_geo_spark.operators.text import hash_split_cuts
    cut = hash_split_cuts({"A": 0.5, "B": 0.5})[0]
    rows = []
    for u in range(1, 120):
        conv = u % 7 == 0  # converted users
        rows.append((u, "purchase" if conv else "view"))
        rows.append((u, "click"))  # second event, same user
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    (r,) = ab_test(df, convert=(F.col("event_type") == "purchase")) \
        .collect()

    def arm(u):
        h = int(hashlib.md5(f"{u}:17".encode()).hexdigest()[:15], 16)
        return "A" if h < cut else "B"

    want = {"A": [0, 0], "B": [0, 0]}
    for u in range(1, 120):
        a = arm(u)
        want[a][0] += 1
        want[a][1] += int(u % 7 == 0)
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (
        want["A"][0], want["A"][1], want["B"][0], want["B"][1])
    pa, pb = r.conv_a / r.n_a, r.conv_b / r.n_b
    pp = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
    z = (pa - pb) / ((pp * (1 - pp) * (1 / r.n_a + 1 / r.n_b)) ** 0.5)
    assert r.z_u == round(1e6 * z)
    # degenerate: nobody converts -> NULL z, counts still exact
    (r0,) = ab_test(df, convert=(F.col("event_type") == "nope")).collect()
    assert r0.z_u is None and r0.n_a + r0.n_b == 119
