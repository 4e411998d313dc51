"""Properties for operators/mining.assoc_rules: brute-force python
parity on random baskets, min_support pruning, determinism, DuckDB
VALUES twin. Reference analogue: none (beyond-parity pipeline op)."""

import random

import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.operators.mining import assoc_oracle_sql, assoc_rules


def _random_baskets(n_baskets, items, seed, max_items=5):
    rng = random.Random(seed)
    out = []
    for b in range(n_baskets):
        for it in rng.sample(items, rng.randint(1, max_items)):
            out.append((b, it))
            if rng.random() < 0.3:   # duplicate facts must collapse
                out.append((b, it))
    return out


def _brute_rules(facts, min_support, k):
    pres = sorted({(b, i) for b, i in facts})
    baskets = {}
    for b, i in pres:
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)
    marg = {}
    for items in baskets.values():
        for i in items:
            marg[i] = marg.get(i, 0) + 1
    pair = {}
    for items in baskets.values():
        s = sorted(items)
        for a in range(len(s)):
            for b in range(a + 1, len(s)):
                pair[(s[a], s[b])] = pair.get((s[a], s[b]), 0) + 1
    rules = []
    for (x, y), sab in pair.items():
        if sab < min_support:
            continue
        for a, c in ((x, y), (y, x)):
            conf = round(1_000_000.0 * sab / marg[a])
            lift = round(1_000_000.0 * (sab * n) / (marg[a] * marg[c]))
            rules.append((a, c, sab, conf, lift))
    rules.sort(key=lambda r: (-r[4], r[0], r[1]))
    return [(r + (idx + 1,)) for idx, r in enumerate(rules[:k])]


def test_assoc_rules_matches_bruteforce(spark):
    facts = _random_baskets(120, [f"i{j}" for j in range(12)], seed=7)
    df = spark.createDataFrame(facts, "basket long, item string")
    got = [(r.antecedent, r.consequent, r.supp_ab, r.conf_micro,
            r.lift_micro, r.rank)
           for r in assoc_rules(df, min_support=3, k=30)
           .orderBy("rank").collect()]
    assert got == _brute_rules(facts, min_support=3, k=30)


def test_assoc_rules_min_support_prunes(spark):
    # pair (a,b) appears once -> pruned at min_support=2
    facts = [(1, "a"), (1, "b"), (2, "a"), (3, "b")]
    df = spark.createDataFrame(facts, "basket long, item string")
    assert assoc_rules(df, min_support=2, k=10).count() == 0
    out = assoc_rules(df, min_support=1, k=10).collect()
    assert {(r.antecedent, r.consequent) for r in out} == \
           {("a", "b"), ("b", "a")}
    # supp(a)=2, supp(b)=2, supp(ab)=1, n=3: conf=0.5, lift=0.75
    for r in out:
        assert r.conf_micro == 500_000
        assert r.lift_micro == 750_000


def test_assoc_rules_deterministic_under_partitioning(spark):
    facts = _random_baskets(80, [f"i{j}" for j in range(8)], seed=13)
    df = spark.createDataFrame(facts, "basket long, item string")
    a = assoc_rules(df.repartition(1), min_support=2, k=20) \
        .orderBy("rank").collect()
    b = assoc_rules(df.repartition(16), min_support=2, k=20) \
        .orderBy("rank").collect()
    assert a == b


def test_assoc_oracle_sql_twin_matches(spark):
    import duckdb
    facts = _random_baskets(60, [f"i{j}" for j in range(9)], seed=19)
    df = spark.createDataFrame(facts, "basket long, item string")
    got = [(r.antecedent, r.consequent, r.supp_ab, r.conf_micro,
            r.lift_micro, r.rank)
           for r in assoc_rules(df, min_support=2, k=25)
           .orderBy("rank").collect()]
    vals = ", ".join(f"({b}, '{i}')" for b, i in facts)
    sql = assoc_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(basket, item)",
        min_support=2, k=25)
    want = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == [(a, c, int(s), int(cf), int(lf), int(rk))
                   for a, c, s, cf, lf, rk in want]


def test_assoc_rules_validation(spark):
    df = spark.createDataFrame([(1, "a")], "basket long, item string")
    with pytest.raises(ValueError):
        assoc_rules(df, min_support=0)
    with pytest.raises(ValueError):
        assoc_rules(df, k=0)
    # NULLs on either side are dropped, not joined
    df2 = spark.createDataFrame(
        [(1, "a"), (1, None), (None, "b")], "basket long, item string")
    assert assoc_rules(df2, min_support=1, k=5).count() == 0
