"""rank_bounded (the windowless global ranker) must be EXACTLY
row_number().over(Window.orderBy(...)) for every key shape — mixed
asc/desc, string and numeric keys, nulls (asc-nulls-first /
desc-nulls-last), ties broken by later keys, and the k-limit path."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Window

from aperag_spark.operators.windows import rank_bounded


def _window_rank(df, keys, k=None, rank_col="rank", rank_type="int"):
    order = [F.asc(c) if d == "asc" else F.desc(c) for c, d in keys]
    if k is not None:
        df = df.orderBy(*order).limit(k)
    if rank_col in df.columns:
        df = df.drop(rank_col)
    w = Window.orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w).cast(rank_type))


def _rows(df):
    return sorted(str(sorted(r.asDict().items())) for r in df.collect())


def test_rank_bounded_equals_window_random(spark):
    rng = random.Random(7)
    vals = [1.5, 2.0, 2.0, None, -3.25]
    names = ["aa", "bb", "aa", None, "zz", "mm"]
    data = [
        (i, rng.choice(vals), rng.choice(names), rng.randint(0, 3))
        for i in range(60)
    ]
    df = spark.createDataFrame(data, "id int, score double, name string, grp int")
    key_sets = [
        [("score", "desc"), ("id", "asc")],
        [("name", "asc"), ("score", "desc"), ("id", "asc")],
        [("grp", "asc"), ("name", "desc"), ("id", "asc")],
        [("score", "asc"), ("name", "asc"), ("id", "desc")],
    ]
    for keys in key_sets:
        for k in (None, 10, 100):
            got = rank_bounded(df, keys, k=k)
            want = _window_rank(df, keys, k=k)
            assert _rows(got) == _rows(want), (keys, k)


def test_rank_bounded_replaces_existing_rank_column(spark):
    df = spark.createDataFrame([(1, 9), (2, 8)], "id int, rank int")
    out = rank_bounded(df, [("id", "desc")])
    rows = {r["id"]: r["rank"] for r in out.collect()}
    assert rows == {2: 1, 1: 2}
    assert out.columns.count("rank") == 1


def test_rank_bounded_empty_input(spark):
    df = spark.createDataFrame([], "id int, score double")
    assert rank_bounded(df, [("score", "desc"), ("id", "asc")], k=5).count() == 0


def test_rank_bounded_unbounded_guard(spark):
    """k=None + input over max_rows must fail loudly inside the plan, not
    silently funnel an unbounded table through one collect_list task."""
    import pytest

    df = spark.range(50).selectExpr("id", "id % 7 as v")
    keys = [("v", "desc"), ("id", "asc")]
    with pytest.raises(Exception, match="rank_bounded: input exceeds max_rows"):
        rank_bounded(df, keys, k=None, max_rows=10).collect()
    # under the cap: identical to the unguarded result
    ok = rank_bounded(df, keys, k=None, max_rows=100).collect()
    assert len(ok) == 50 and ok[0]["rank"] == 1
    # k given: the TakeOrderedAndProject bound applies, guard not needed
    assert rank_bounded(df, keys, k=5, max_rows=1).count() == 5
