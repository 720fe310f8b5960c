"""Standalone oracle check for a subset of queries at any SF — the same
row/schema/hash comparison as tests/test_oracle_parity.py and the round
driver, usable while iterating:

    python scripts/check_oracle.py sf0.01 dedup_simhash sim_neardup_lsh
    python scripts/check_oracle.py sf0.1            # all queries
"""

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aperag_spark.queries import ORACLES, QUERIES  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple((round(v, 6) if isinstance(v, float) else v) for v in tup))
    return sorted(str(r) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    names = sys.argv[2:] or sorted(QUERIES)
    sf_dir = f"/root/testdata/{sf}"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name in names:
        t0 = time.time()
        sdf = QUERIES[name](spark, sf_dir).toPandas()
        t1 = time.time()
        odf = con.execute(ORACLES[name]).df()
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_rows = len(sdf) == len(odf)
        s_rows, o_rows = _normalize(sdf), _normalize(odf)
        ok_hash = hashlib.md5("\n".join(s_rows).encode()).hexdigest() == hashlib.md5(
            "\n".join(o_rows).encode()
        ).hexdigest()
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"{status} {name}: spark={len(sdf)} oracle={len(odf)} "
            f"cols={ok_cols} hash={ok_hash} ({t1 - t0:.2f}s)"
        )
        if status == "FAIL":
            failed.append(name)
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            only_s = sorted(set(s_rows) - set(o_rows))[:3]
            only_o = sorted(set(o_rows) - set(s_rows))[:3]
            print(f"  first diffs: {diffs}")
            print(f"  only-spark: {only_s}\n  only-oracle: {only_o}")
    print("FAILED:" if failed else "ALL GREEN", failed or "")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
