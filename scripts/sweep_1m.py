"""Round-5 scale evidence: paired sweeps AT the 1M-page point.

Round 4 banked the 1M-page (sf10-class) trend point as a SINGLE pass —
seconds-per-1000-pages flat vs 200k, but no spread. This runs the full
order-alternated paired same-window protocol (calib@N -> spark@N ->
calib@4N -> spark@4N per sweep, order flipped per sweep, PAIRED normalized
efficiency, median is the headline) at 1M pages itself, so the strongest
trend number carries the same statistical treatment as the 100k/200k
tables.

Appends a markdown section to BENCH.md and writes SCALING_1M.json.
Run EXCLUSIVELY — never time two Spark jobs concurrently on this box.

Usage: python scripts/sweep_1m.py [pages=1000000] [n_sweeps=3] [repeats=2]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import (  # noqa: E402
    PRIMARY,
    REPO,
    build_zip,
    gen_input,
    paired_sweep,
)


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    lo, hi = PRIMARY

    tmp = tempfile.mkdtemp(prefix="kg_1m_")
    zpath = build_zip(tmp)
    pages_dir = gen_input(tmp, pages)

    sweeps = [paired_sweep(k, zpath, pages_dir, repeats) for k in range(1, n_sweeps + 1)]
    norm = [s["normalized_efficiency"] for s in sweeps]
    raw = [s["spark_efficiency"] for s in sweeps]
    median_norm = round(statistics.median(norm), 3)
    median_raw = round(statistics.median(raw), 3)
    identical = len({s["configs"][str(hi)]["n_triples"] for s in sweeps} |
                    {s["configs"][str(lo)]["n_triples"] for s in sweeps}) == 1

    report = {
        "pages": pages,
        "n_sweeps": n_sweeps,
        "repeats": repeats,
        "sweeps": sweeps,
        "median_normalized_efficiency": median_norm,
        "median_raw_efficiency": median_raw,
        "triples_identical": identical,
    }
    print(json.dumps(report, indent=1))
    with open(os.path.join(REPO, "SCALING_1M.json"), "w") as f:
        json.dump(report, f, indent=1)

    sweep_rows = "\n".join(
        f"| {s['sweep']} | {'→'.join(map(str, s['order']))} "
        f"| {s['configs'][str(lo)]['triple_stage_sec']} "
        f"| {s['configs'][str(hi)]['triple_stage_sec']} "
        f"| {s['spark_efficiency']} "
        f"| {s['configs'][str(lo)]['calib_sec']} "
        f"| {s['configs'][str(hi)]['calib_sec']} "
        f"| {s['calib_efficiency']} | **{s['normalized_efficiency']}** |"
        for s in sweeps
    )
    spp16 = round(
        statistics.median(
            s["configs"][str(hi)]["triple_stage_sec"] for s in sweeps
        ) / pages * 1000,
        3,
    )
    md = f"""

## Round-5: paired sweeps AT the 1M-page point ({pages} pages)

The round-4 sf10-class point was a single pass; this is the full
{n_sweeps}-sweep order-alternated paired protocol at the same 1M-page
input (best-of-{repeats} per config per sweep):

| sweep | order | spark T{lo} (s) | spark T{hi} (s) | spark eff | calib T{lo} (s) | calib T{hi} (s) | calib eff (hw ceiling) | normalized eff |
|---|---|---|---|---|---|---|---|---|
{sweep_rows}

**Median normalized {lo}→{hi} efficiency at 1M pages: {median_norm}**
(raw un-normalized median {median_raw}; gate ≥ 0.8 of the same-window
hardware-achievable speedup). Median s-per-1000-pages at local[{hi}]:
{spp16}. Triples identical across every sweep and parallelism level:
{identical}.

Raw JSON: `SCALING_1M.json`.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)
    print("appended to BENCH.md")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree("/dev/shm/kg_scaling", ignore_errors=True)


if __name__ == "__main__":
    main()
