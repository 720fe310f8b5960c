"""Per-query noop-sink isolation bench (opt guide §1.4) — NOT the driver
metric (that is bench.py, frozen): times each declared query with the noop
sink so the computation is measured without driver transfer, labels jobs
(§1.5), and supports round-robin repeats (CLAUDE.md: interleave reps, take
best-of-N, never time two Spark jobs concurrently).

Usage: python bench_extra.py [reps] [q1 q2 ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line {"best": {...}, "runs": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0].isdigit():
        reps = int(args[0])
        args = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from aperag_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = args or list(qs)
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.monotonic()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[n].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": cpus,
                "sink": "noop",
                "best": {n: min(v) for n, v in runs.items()},
                "runs": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
