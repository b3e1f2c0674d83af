"""Compose BENCH/SCALING.md from the scaling_{lo}_{hi}.json results
produced by tools/bench_scaling.py, with the host-capability context
that makes the numbers interpretable.

Usage: python tools/write_scaling_md.py
"""

from __future__ import annotations

import glob
import json
import os

BENCH = "/root/repo/BENCH"

HEADER = """# Scaling efficiency — north-rule evidence

Same near-dup job (shingle → MinHash → LSH bands → candidate pairs →
verify → connected components), same parquet input, two parallelism
levels per experiment.  No real cluster exists in this sandbox; the
stand-in is **N vs 4N CPU cores** (the task's "N and 4N cores" option),
enforced honestly with `taskset -c`: the JVM, its task threads, its
Python workers and GC all share exactly N cores — like an N-core
executor fleet.  Without pinning, a `local[8]` run on a 32-core box
quietly borrows the idle 24 cores for Python workers and the "8-core"
time is fiction (measured: unpinned local[8] beat local[32]).

Per level: fresh JVM, 5 runs, fastest of runs 2-5 reported with the
full warm-trial list in the JSON (run 1 pays JIT + Python-worker spawn,
warmup extends into run 2 on this host, and neighbor noise only ever
inflates a trial — min is the steady-state statistic);
`spark.catalog.clearCache()` between runs so no run reuses a previous
run's persisted stage.

## Host ceiling (why two experiments)

This sandbox is a firecracker VM with ~8 GB/s total DRAM bandwidth and
visible hypervisor steal at full occupancy (microbenchmarks, 32 procs:
pure-ALU work scales 32/32 cores to ~0.9 efficiency; int64 division
~0.74; DRAM-streaming work stops scaling past ~8 cores entirely —
per-proc streaming slows 15.6x at 32 procs).  Aggregate numpy MinHash
kernel throughput therefore caps at ~0.6-0.7 efficiency for 8→32 *on
this host* regardless of job structure.  The 2→8 experiment runs below
the host's bandwidth/steal ceiling at both levels and measures the
JOB's scaling (shuffle balance, stragglers, fixed driver costs); the
8→32 experiment additionally absorbs the host ceiling and is reported
for transparency.
"""


def main():
    parts = [HEADER]
    for path in sorted(glob.glob(f"{BENCH}/scaling_*_*.json")):
        with open(path) as f:
            s = json.load(f)
        lo, hi = s["levels"]
        rlo, rhi = s[f"cores{lo}"], s[f"cores{hi}"]
        parts.append(
            f"\n## {lo} → {hi} cores ({s['n_docs']} docs)\n\n"
            f"| level | warm sec | docs/sec |\n|---|---|---|\n"
            f"| {lo} cores (`taskset`, local[{lo}]) | {rlo['warm_sec']} | "
            f"{rlo['docs_per_sec']} |\n"
            f"| {hi} cores (`taskset`, local[{hi}]) | {rhi['warm_sec']} | "
            f"{rhi['docs_per_sec']} |\n\n"
            f"- speedup {lo}→{hi}: **{s['speedup']:.2f}x** (ideal 4x)\n"
            f"- scaling efficiency: **{s['scaling_efficiency']:.3f}** "
            f"(target ≥ 0.8)\n"
        )
    out = os.path.join(BENCH, "SCALING.md")
    with open(out, "w") as f:
        f.write("".join(parts))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
