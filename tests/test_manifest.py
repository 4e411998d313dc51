"""Manifest/resume tests (SURVEY.md §5.5): re-run skips completed
stages; upstream fingerprint change invalidates; metrics recorded."""

import json
import os

from pyspark.sql import functions as F

from cdap_geo_spark import fixtures
from cdap_geo_spark.io import cell_range_filter, ingest, with_cell_id
from cdap_geo_spark.plans.manifest import Manifest, fingerprint


def test_stage_runs_once_then_skips(spark, tmp_path):
    man = Manifest(spark, str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return spark.range(100).withColumn("v", F.col("id") * 2)

    fp = fingerprint("s1", 1)
    r1 = man.run_stage("s1", fp, build)
    assert not r1.skipped and r1.rows == 100 and len(calls) == 1
    r2 = man.run_stage("s1", fp, build)
    assert r2.skipped and r2.rows == 100 and len(calls) == 1
    # data readable and identical
    assert man.read("s1").count() == 100
    # manifest has per-file metrics
    info = man.stage_info("s1")
    assert info["total_rows"] == 100
    assert all(f["rows"] >= 0 and f["bytes"] > 0 for f in info["partitions"])


def test_fingerprint_change_reruns(spark, tmp_path):
    man = Manifest(spark, str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return spark.range(10)

    man.run_stage("s2", fingerprint("a"), build)
    man.run_stage("s2", fingerprint("b"), build)  # new upstream → rerun
    assert len(calls) == 2


def test_crash_before_commit_reruns(spark, tmp_path):
    man = Manifest(spark, str(tmp_path))
    fp = fingerprint("x")
    man.run_stage("s3", fp, lambda: spark.range(5))
    # simulate a crash that wiped the commit point but left data
    os.remove(os.path.join(str(tmp_path), "s3", "manifest.json"))
    r = man.run_stage("s3", fp, lambda: spark.range(5))
    assert not r.skipped  # no manifest → stage re-ran idempotently
    assert man.read("s3").count() == 5


def test_ingest_clusters_and_resumes(spark, tmp_path):
    from cdap_geo_spark import docs as D
    dd = D.with_geometry(fixtures.documents(spark, 300, partitions=4))
    out = ingest(spark, dd, str(tmp_path), level=8, partitions=4)
    assert out.count() == 300
    info = Manifest(spark, str(tmp_path)).stage_info("ingest")
    assert info["dataset_bbox"][0] >= 0
    assert len(info["hot_cells"]) > 0
    # resume: second call must not rewrite (same committed_at)
    before = info["committed_at"]
    out2 = ingest(spark, dd, str(tmp_path), level=8, partitions=4)
    assert out2.count() == 300
    assert Manifest(spark, str(tmp_path)).stage_info("ingest")["committed_at"] == before
    # cell-window pruning returns exactly the rows in the window
    sub = cell_range_filter(out, 0, 0, 100_000, 100_000, level=8)
    full = with_cell_id(dd, level=8)
    assert sub.count() == cell_range_filter(full, 0, 0, 100_000, 100_000,
                                            level=8).count()
    # ...and the predicate reaches the parquet SCAN (PushedFilters), so
    # on the range-clustered layout the reader skips row groups via
    # footer min/max stats instead of filtering post-scan
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:", 1)[1].split("]", 1)[0]
    assert "cell_id" in pushed
