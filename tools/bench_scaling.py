"""Scaling-efficiency evidence (north rule): run the SAME dedup job at
two parallelism levels — local[8] (N) and local[32] (4N) — on the same
parquet input, report throughput at both plus efficiency
(= speedup / 4), and write BENCH/SCALING.md.

The sandbox has no multi-node cluster; local[N] thread-executors are
the stand-in.  Each level runs in a fresh subprocess (own JVM) so
neither inherits the other's warm state; within a process we run the
job twice and measure the second run (JIT + Python-worker warmup would
otherwise dominate — this sandbox pays 60-180s of first-run warmup).

Usage: python tools/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_DOCS_DEFAULT = 200_000
CORPUS = "/tmp/spark_graft_scaling_corpus"

RUN_TEMPLATE = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from bloom_filters_spark.session import get_spark
from bloom_filters_spark.pipeline import NearDupConfig, near_dup_pipeline

cores = {cores}
spark = get_spark("scaling-%d" % cores, cores=cores, shuffle_partitions=cores)
docs = spark.read.parquet({corpus!r})
n_docs = docs.count()
cfg = NearDupConfig(threshold=0.8)
timings = []
for trial in range(3):
    t0 = time.time()
    clusters = near_dup_pipeline(docs, cfg)
    n = clusters.count()
    timings.append(time.time() - t0)
print(json.dumps({{"cores": cores, "n_docs": n_docs, "rows": n,
                   "warm_sec": round(min(timings[1:]), 2),
                   "cold_sec": round(timings[0], 2)}}))
spark.stop()
"""


def ensure_corpus(n_docs: int):
    marker = f"{CORPUS}/_n{n_docs}"
    if os.path.exists(marker):
        return
    code = f"""
import sys
sys.path.insert(0, "/root/repo")
from bloom_filters_spark.session import get_spark
from bloom_filters_spark.sources.pages import pages_table
spark = get_spark("gen", cores=32)
pages_table(spark, {n_docs}, seed=11).select("doc_id", "text").write.mode(
    "overwrite").parquet({CORPUS!r})
open({marker!r}, "w").close()
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def run_level(cores: int) -> dict:
    code = RUN_TEMPLATE.format(cores=cores, corpus=CORPUS)
    out = subprocess.run(
        [sys.executable, "-c", code], check=True, capture_output=True, text=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_DEFAULT
    ensure_corpus(n_docs)
    results = [run_level(8), run_level(32)]
    r8, r32 = results
    speedup = r8["warm_sec"] / r32["warm_sec"]
    efficiency = speedup / 4
    summary = {
        "n_docs": n_docs,
        "local8": {**r8, "docs_per_sec": round(n_docs / r8["warm_sec"], 1)},
        "local32": {**r32, "docs_per_sec": round(n_docs / r32["warm_sec"], 1)},
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary, indent=2))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/SCALING.md", "w") as f:
        f.write(
            "# Scaling efficiency (N=8 vs 4N=32 local cores)\n\n"
            "North-rule evidence: same near-dup job, same parquet input, two\n"
            "parallelism levels, fresh JVM each, warm (2nd-run) timings.\n\n"
            f"| level | warm sec | docs/sec |\n|---|---|---|\n"
            f"| local[8] | {r8['warm_sec']} | {n_docs / r8['warm_sec']:.0f} |\n"
            f"| local[32] | {r32['warm_sec']} | {n_docs / r32['warm_sec']:.0f} |\n\n"
            f"- corpus: {n_docs} synthetic CC-style docs (pages_table seed=11)\n"
            f"- speedup 8→32: **{speedup:.2f}x** (ideal 4x)\n"
            f"- scaling efficiency: **{efficiency:.3f}** (target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
