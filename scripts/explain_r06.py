"""Dump .explain('formatted') for named queries to plans/r06/<q>_<tag>.txt.

Usage: python scripts/explain_r06.py before q1 q2 ...
       python scripts/explain_r06.py after  q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Planning only (no jobs run) except where a query's builder itself triggers
bounded driver work (e.g. the 3-row collect in kg_curated_merge or the
staged-corpus build on first touch).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from aperag_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for n in names or sorted(qs):
        df = qs[n](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {n} ({tag}) sf_dir={sf_dir}\n")
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
