"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so the protocol (BASELINE.md)
runs the identical headline job at local[8] and local[32] on the same
input. Two sandbox-specific controls make the number meaningful:

* 8- and 32-core runs are INTERLEAVED (8,32,8,32,...) because host
  capacity drifts over tens of minutes (shared hypervisor); best of
  each side is compared from the same time window;
* a hardware-envelope probe measures what THIS box can physically
  deliver from 8->32 threads for CPU-bound and memory-bound work.
  local-mode thread scaling shares one memory bus — unlike the north
  rule's N->4N EXECUTORS, which multiply memory bandwidth linearly —
  so the raw efficiency is also reported normalized by the
  memory-bandwidth envelope.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "{cores}"
from cdap_geo_spark.session import get_spark
import bench

spark = get_spark(app="scaling", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
docs_path, regs_path = bench.ensure_fixtures(spark, {sf})
# steady-state: run 1 warms JVM + scan + python workers; run 2 counts
bench.headline(spark, docs_path, regs_path)
res = bench.headline(spark, docs_path, regs_path)
print("RESULT " + json.dumps(res))
spark.stop()
"""

PROBE_SNIPPET = r"""
import subprocess, sys, time, json
CPU = "x=0\nfor i in range(20_000_000): x+=i"
MEM = ("import numpy as np\n"
       "a = np.ones(15_000_000)\n"
       "for _ in range(6): s = (a * 1.000001).sum()")
out = {}
for name, code in (("cpu", CPU), ("mem", MEM)):
    rates = {}
    for n in (8, 32):
        t0 = time.time()
        ps = [subprocess.Popen([sys.executable, "-c", code]) for _ in range(n)]
        for p in ps: p.wait()
        rates[n] = n / (time.time() - t0)
    out[name] = round(rates[32] / (4 * rates[8]), 3)
print("PROBE " + json.dumps(out))
"""


def run_once(cores: int, sf: float) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, sf=sf)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT (cores={cores}):\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def probe_envelope() -> dict:
    out = subprocess.run([sys.executable, "-c", PROBE_SNIPPET],
                         capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("PROBE "):
            return json.loads(line[len("PROBE "):])
    return {}


def bench_sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.1


def main():
    sf = bench_sf()
    envelope = probe_envelope()
    print("hardware envelope (8->32 threads, 1.0 = perfect 4x): "
          + json.dumps(envelope), flush=True)
    runs = {8: [], 32: []}
    for rep in range(REPEATS):
        for cores in (8, 32):   # interleaved to control host drift
            r = run_once(cores, sf)
            runs[cores].append(r)
            print(f"rep {rep} local[{cores}]: {json.dumps(r)}", flush=True)
    best8 = max(runs[8], key=lambda r: r["rows_per_sec"])
    best32 = max(runs[32], key=lambda r: r["rows_per_sec"])
    eff = best32["rows_per_sec"] / (4 * best8["rows_per_sec"])
    mem_env = envelope.get("mem") or 1.0
    summary = {
        "metric": "sjoin+tile-assign rows/sec scaling, local[8] vs local[32]",
        "sf": sf,
        "rows_per_sec_8": best8["rows_per_sec"],
        "rows_per_sec_32": best32["rows_per_sec"],
        "efficiency_raw": round(eff, 3),
        "hardware_envelope": envelope,
        "efficiency_vs_mem_envelope": round(eff / mem_env, 3) if mem_env else None,
        "target": 0.8,
    }
    print(json.dumps(summary))
    write_md(runs, summary)


def write_md(runs, summary):
    env = summary["hardware_envelope"]
    lines = [
        "# BENCH — measured results (scaling protocol, BASELINE.md)",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())};"
        f" input sf={summary['sf']}"
        f" ({int(6_000_000 * summary['sf'])} interleaved docs,"
        f" {max(50, int(50_000 * summary['sf']))} regions).",
        "",
        "Job (one fused pipeline): decode geometry spans (Arrow PUDF) ->",
        "hierarchical cell cover -> broadcast cell equi-join -> exact",
        "intersects refinement -> map-side tile cover -> narrow dedup ->",
        "count. 8- and 32-core runs interleaved; best of each reported.",
        "",
        "| parallelism | wall s (best) | output rows | rows/sec |",
        "|---|---|---|---|",
    ]
    for cores in (8, 32):
        b = max(runs[cores], key=lambda r: r["rows_per_sec"])
        lines.append(f"| local[{cores}] | {b['seconds']} | {b['rows']} "
                     f"| {b['rows_per_sec']} |")
    lines += [
        "",
        f"**Raw scaling efficiency (8 -> 32 threads = N -> 4N):** "
        f"{summary['efficiency_raw']} (target >= 0.8)",
        "",
        "## Hardware envelope (what this sandbox can physically deliver)",
        "",
        "Measured 8->32-thread efficiency of plain multiprocess probes on",
        f"this host: CPU-bound {env.get('cpu')}, memory-bound "
        f"{env.get('mem')} (1.0 = perfect 4x). local[8]->local[32] adds",
        "threads on ONE shared memory bus; the north rule's N->4N",
        "EXECUTORS multiply memory bandwidth linearly with nodes, which",
        "this sandbox cannot emulate. Engine efficiency normalized by the",
        f"memory-bandwidth envelope: "
        f"**{summary['efficiency_vs_mem_envelope']}**.",
        "",
        "All runs: " + json.dumps({str(k): v for k, v in runs.items()}),
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
