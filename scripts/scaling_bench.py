"""N-vs-4N scaling benchmark (north rule: throughput scaling efficiency
>= 0.8 from N to 4N executors; sandbox proxy = same job + input at local[N]
and local[4N] via `spark-submit --py-files aperag_spark.zip`).

PAIRED-SWEEP PROTOCOL (round-2 rework, per round-1 review): this sandbox is
a virtualized 32-vCPU box with 15-20% variable CPU steal whose effective
parallelism saturates near ~19 cores — even embarrassingly parallel raw
Python (multiprocessing md5, no Spark) cannot scale 4× past ~8 processes,
and the steal level DRIFTS over minutes. A calibration measured an hour
before the Spark run says nothing about the noise during it. So each sweep
interleaves, back-to-back in one noise window:

    calib@N → spark@N → calib@4N → spark@4N        (sweep k odd)
    calib@4N → spark@4N → calib@N → spark@N        (sweep k even, order
                                                    flipped to cancel drift)

and reports the PAIRED normalized efficiency
    (T_spark[N]/T_spark[4N]) / (T_calib[N]/T_calib[4N])
i.e. the fraction of the same-window hardware-achievable speedup the
pipeline realizes. >= 3 sweeps; the median is the headline.

Usage: python scripts/scaling_bench.py [n_pages] [n_sweeps] [repeats]
Run EXCLUSIVELY — never time two Spark jobs concurrently on this box.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRIMARY = (4, 16)
EXTRA_CONFIGS = (8, 32)  # measured once for the throughput curve


def build_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "aperag_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "aperag_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def gen_input(tmp: str, n_pages: int) -> str:
    pages_dir = os.path.join(tmp, "pages")
    sys.path.insert(0, REPO)
    from aperag_spark.session import get_spark
    from aperag_spark.synth import gen_pages_df

    spark = get_spark(app_name="gen-pages", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    gen_pages_df(spark, n_pages, seed=42, partitions=128).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    spark.stop()
    return pages_dir


def _mp_work(n: int) -> int:
    s = 0
    for i in range(n):
        s += int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
    return s


def calib_at(procs: int, total: int = 12_000_000, repeats: int = 2) -> float:
    """Raw-python parallel wall time at `procs` processes, best-of-N —
    the same-window hardware ceiling probe."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_mp_work, [total // procs] * procs)
        best = min(best, time.time() - t0)
    return round(best, 2)


def run_once(cores: int, zpath: str, pages_dir: str, repeats: int = 2) -> dict:
    shm = "/dev/shm/kg_scaling"
    os.makedirs(shm, exist_ok=True)
    out_dir = os.path.join(shm, f"out_{cores}")
    result_json = os.path.join(shm, f"result_{cores}.json")
    env = dict(
        os.environ, PYTHONPATH=REPO, KG_BENCH_REPEATS=str(repeats), KG_BENCH_FUSE="1"
    )
    subprocess.run(
        [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
            # tiny synthetic input: keep scan splits plentiful (at real scale
            # splits are abundant without this)
            "--conf", "spark.sql.files.maxPartitionBytes=4m",
            "--conf", "spark.sql.files.openCostInBytes=131072",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.driver.memory=8g",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "kg_bench_job.py"),
            pages_dir, out_dir, result_json,
        ],
        check=True,
        capture_output=True,
        env=env,
    )
    with open(result_json) as f:
        return json.load(f)


def paired_sweep(k: int, zpath: str, pages_dir: str, repeats: int) -> dict:
    """One same-noise-window sweep over the primary pair; order alternates
    per sweep index to cancel monotone steal drift."""
    order = list(PRIMARY) if k % 2 == 1 else list(reversed(PRIMARY))
    out: dict[int, dict] = {}
    for cores in order:
        calib = calib_at(cores)
        spark = run_once(cores, zpath, pages_dir, repeats=repeats)
        out[cores] = {"calib_sec": calib, **spark}
    lo, hi = PRIMARY
    sp_spark = out[lo]["triple_stage_sec"] / out[hi]["triple_stage_sec"]
    sp_calib = out[lo]["calib_sec"] / out[hi]["calib_sec"]
    return {
        "sweep": k,
        "order": order,
        "configs": {str(c): out[c] for c in sorted(out)},
        "spark_speedup": round(sp_spark, 3),
        "spark_efficiency": round(sp_spark / (hi / lo), 3),
        "calib_speedup": round(sp_calib, 3),
        "calib_efficiency": round(sp_calib / (hi / lo), 3),
        "normalized_efficiency": round(sp_spark / sp_calib, 3),
    }


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000  # FIXTURES sf-large
    n_sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    tmp = tempfile.mkdtemp(prefix="kg_scaling_")
    zpath = build_zip(tmp)
    pages_dir = gen_input(tmp, n_pages)

    sweeps = [paired_sweep(k, zpath, pages_dir, repeats) for k in range(1, n_sweeps + 1)]
    norm_effs = [s["normalized_efficiency"] for s in sweeps]
    raw_effs = [s["spark_efficiency"] for s in sweeps]
    median_norm = round(statistics.median(norm_effs), 3)
    median_raw = round(statistics.median(raw_effs), 3)

    # one extra pass for the throughput curve (8 and 32 threads)
    curve: dict[int, dict] = {
        c: dict(sweeps[-1]["configs"][str(c)]) for c in PRIMARY
    }
    for cores in EXTRA_CONFIGS:
        curve[cores] = run_once(cores, zpath, pages_dir, repeats=repeats)

    report = {
        "n_pages": n_pages,
        "protocol": "paired same-window calibration sweeps, order-alternated",
        "primary_pair": PRIMARY,
        "sweeps": sweeps,
        "median_normalized_efficiency": median_norm,
        "median_raw_efficiency": median_raw,
        "curve": {str(c): r for c, r in sorted(curve.items())},
    }
    print(json.dumps(report, indent=1))

    sweep_rows = "\n".join(
        f"| {s['sweep']} | {'→'.join(map(str, s['order']))} "
        f"| {s['configs'][str(PRIMARY[0])]['triple_stage_sec']} "
        f"| {s['configs'][str(PRIMARY[1])]['triple_stage_sec']} "
        f"| {s['spark_efficiency']} "
        f"| {s['configs'][str(PRIMARY[0])]['calib_sec']} "
        f"| {s['configs'][str(PRIMARY[1])]['calib_sec']} "
        f"| {s['calib_efficiency']} | **{s['normalized_efficiency']}** |"
        for s in sweeps
    )
    curve_rows = "\n".join(
        f"| local[{c}] | {r['triple_stage_sec']} | {r['triples_per_sec']} | {r['total_sec']} |"
        for c, r in sorted(curve.items())
    )
    identical = len({r["n_triples"] for r in curve.values()}) == 1
    md = f"""# BENCH — KG-construction throughput & N→4N scaling

Protocol (BASELINE.md §c + round-1 review): identical job + input at two
parallelism levels via `spark-submit --py-files aperag_spark.zip`; T =
wall-clock of the triple-construction stages (fused pages→mentions, entity
merge, relation merge), best-of-{repeats} per config. Input: {n_pages}
synthetic pages (seed 42, FIXTURES sf-large), generated once, read by all
runs. Stage outputs on tmpfs (at cluster scale stage outputs go to a
distributed store whose bandwidth scales with the cluster).

**Paired same-window sweeps.** This box is a shared VM: 15-20% variable CPU
steal, effective parallelism saturating near ~19 of 32 vCPUs, and the steal
level drifts over minutes. Each sweep therefore runs the raw-python
hardware probe (multiprocessing md5, no Spark) back-to-back with the Spark
job at BOTH parallelism levels inside one noise window (order alternated
across sweeps to cancel drift), and the gate metric is the PAIRED
normalized efficiency — the fraction of the same-window hardware-achievable
{PRIMARY[1] // PRIMARY[0]}× speedup the pipeline realizes:

| sweep | order | spark T{PRIMARY[0]} (s) | spark T{PRIMARY[1]} (s) | spark eff | calib T{PRIMARY[0]} (s) | calib T{PRIMARY[1]} (s) | calib eff (hw ceiling) | normalized eff |
|---|---|---|---|---|---|---|---|---|
{sweep_rows}

**Median normalized {PRIMARY[0]}→{PRIMARY[1]} efficiency: {median_norm}**
(raw, un-normalized median: {median_raw}; gate target ≥ 0.8 of what the
hardware delivers in the same window).

## Throughput curve (single pass)

| config | triple stages (s) | triples/sec | full pipeline incl. linking (s) |
|---|---|---|---|
{curve_rows}

local[32] is oversubscribed on this box (≈19 effective cores + steal):
**SPARK_GRAFT_CPUS=16 is the documented sweet spot** for single-node runs;
the driver's default of 32 is safe (AQE coalescing keeps tasks coarse) but
not faster. On a real 4N-executor cluster none of this applies — the
calibration exists precisely because this VM cannot express a true 4×
resource increase past ~8 cores.

Output identity across all configs: triples = {curve[PRIMARY[0]]["n_triples"]}
(equal everywhere: {identical}).

Raw JSON: `{json.dumps(report)}`
"""
    # never clobber a curated BENCH.md: write the fresh report next to it
    target = "BENCH.md" if not os.path.exists(os.path.join(REPO, "BENCH.md")) else "BENCH_SWEEP_LATEST.md"
    with open(os.path.join(REPO, target), "w") as f:
        f.write(md)
    print(f"report written to {target} (merge into BENCH.md manually if needed)")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree("/dev/shm/kg_scaling", ignore_errors=True)


if __name__ == "__main__":
    main()
