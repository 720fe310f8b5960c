"""Time individual queries() entries, best-of-N, sequentially.

Usage: python scripts/time_queries.py [reps] q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Per CLAUDE.md: never time two Spark jobs concurrently; this runs one
query at a time, interleaving reps round-robin so VM steal drift hits
every query equally, and reports best-of-N.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    reps = 3
    if args and args[0].isdigit():
        reps = int(args[0])
        args = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from aperag_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(master=f"local[{cpus}]")
    qs = entry.queries()
    names = args or list(qs)
    best = {n: float("inf") for n in names}
    runs = {n: [] for n in names}
    for r in range(reps):
        for n in names:
            t0 = time.monotonic()
            qs[n](spark, sf_dir).toPandas()
            dt = round(time.monotonic() - t0, 3)
            runs[n].append(dt)
            best[n] = min(best[n], dt)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "best": best, "runs": runs}))


if __name__ == "__main__":
    main()
