"""Mini-driver: run every QUERIES entry on Spark and its ORACLES SQL on
DuckDB over the same sf parquet tables; compare row count + column names +
order-insensitive value hash — the same comparison the round driver performs
for CORRECTNESS_r{N}.json."""

import hashlib

import duckdb
import pytest

from aperag_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df):
    """pandas frame → sorted-by-columns, row-sorted list of value tuples."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(
            tuple(
                (round(v, 6) if isinstance(v, float) else v)
                for v in tup
            )
        )
    return sorted(str(r) for r in rows)


def _hash(rows):
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = ddb.execute(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} vs {len(odf)}"
    assert len(sdf) > 0, f"{name}: empty result"
    s_rows, o_rows = _normalize(sdf), _normalize(odf)
    if _hash(s_rows) != _hash(o_rows):
        diff = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
