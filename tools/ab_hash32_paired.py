"""Round-5 MEASURED hash32 experiment (VERDICT r04 item #2): the
32-bit band-hash byte reduction (16 -> 12-byte widest shuffle rows,
-25% band-exchange bytes) was costed analytically in round 4 and only
screened unpaired in round 3 — this harness runs it HEAD-TO-HEAD
against the adopted base config at 800k docs, at both 8 and 32 pinned
cores, in an ABBA order within each level so linear window drift
cancels out of the pairwise comparison.

Reuses tools/ab_shuffle.py's variant runner verbatim (fresh JVM per
run, 5 trials, min-of-warm statistic).  Results append to
BENCH/scaling_8_32.json under "hash32_paired_r5".

Usage: python tools/ab_hash32_paired.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_shuffle import run  # noqa: E402
from bench_scaling import ensure_corpus  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    ensure_corpus(n_docs)
    out = {"n_docs": n_docs, "order": "ABBA per level", "levels": {}}
    for cores in (32, 8):
        seq = []
        # pinned variants, NOT ("base", "hash32"): after this experiment
        # 32-bit became the NearDupConfig default, so "base" would now
        # equal "hash32" and a re-run would measure noise against itself
        for variant in ("hash64", "hash32", "hash32", "hash64"):
            t0 = time.time()
            r = run(cores, variant, n_docs)
            r["wall_sec"] = round(time.time() - t0, 1)
            r["load_before"] = os.getloadavg()[0]
            seq.append(r)
            print(json.dumps(r), flush=True)
        base_min = min(r["warm_sec"] for r in seq
                       if r["variant"] in ("base", "hash64"))
        h32_min = min(r["warm_sec"] for r in seq if r["variant"] == "hash32")
        out["levels"][str(cores)] = {
            "runs": seq,
            "base_warm_min": base_min,
            "hash32_warm_min": h32_min,
            "hash32_vs_base": round(h32_min / base_min, 3),
        }
        print(json.dumps({"cores": cores, "base": base_min,
                          "hash32": h32_min}), flush=True)
    print(json.dumps(out))
    path = "/root/repo/BENCH/scaling_8_32.json"
    with open(path) as fh:
        doc = json.load(fh)
    # never clobber the committed adoption evidence: re-runs append
    key = "hash32_paired_r5"
    while key in doc:
        key += "_rerun"
    doc[key] = out
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
