"""Warning-free ranking for BOUNDED row sets.

Every global top-k in this codebase follows `orderBy().limit(k)` (a
TakeOrderedAndProject — per-partition heaps, driver merge of k rows) and
then needs a dense 1..k rank column. A bare `Window.orderBy(...)` computes
it but logs `WindowExec: No Partition Defined` — and ~120 of those per
oracle battery drown the one log line that exists to catch a REAL
unbounded global window. Spark 4's EliminateWindowPartitions folds any
constant partitionBy() key right back out, so the only quiet path is to
not use a window: collect the <=k survivors into ONE array, sort it with
an explicit comparator (same semantics as the window's sort, including
asc-nulls-first / desc-nulls-last), and posexplode positions back out.
Execution cost is identical to the single-partition window it replaces —
one task over k rows — which is exactly why callers must keep the bound
BEFORE the rank (test_plans asserts it)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def rank_bounded(
    df: DataFrame,
    keys: list[tuple[str, str]],
    k: int | None = None,
    rank_col: str = "rank",
    rank_type: str = "int",
    max_rows: int = 100_000,
) -> DataFrame:
    """Append a 1-based dense rank by `keys` (list of (column, 'asc'|'desc'))
    to a bounded DataFrame. With k, applies orderBy().limit(k) first (the
    TakeOrderedAndProject bound); with k=None the caller guarantees the
    input is already bounded (e.g. a union of top-k'd legs) — and a
    defensive in-plan guard raises if the collected array exceeds max_rows,
    so a caller mistake (un-topk'd input) fails loudly instead of silently
    becoming a single-task memory hazard."""
    order = [F.asc(c) if d == "asc" else F.desc(c) for c, d in keys]
    if k is not None:
        df = df.orderBy(*order).limit(k)
    if rank_col in df.columns:  # withColumn-replace semantics
        df = df.drop(rank_col)
    cols = df.columns

    def _cmp(a, b):
        expr = F.lit(0)
        for c, d in reversed(keys):
            lt, gt = (F.lit(-1), F.lit(1)) if d == "asc" else (F.lit(1), F.lit(-1))
            expr = (
                F.when(a[c].isNull() & b[c].isNull(), expr)
                .when(a[c].isNull(), lt)  # asc: nulls first; desc: nulls last
                .when(b[c].isNull(), gt)
                .when(a[c] < b[c], lt)
                .when(a[c] > b[c], gt)
                .otherwise(expr)
            )
        return expr

    arr = df.agg(F.collect_list(F.struct(*cols)).alias("_rows"))
    rows_col = F.col("_rows")
    if k is None and max_rows is not None:
        # evaluated inside the plan (the only task that sees the full array);
        # raise_error's NullType coerces under when/otherwise
        rows_col = F.when(F.size("_rows") <= F.lit(max_rows), F.col("_rows")).otherwise(
            F.raise_error(
                F.format_string(
                    "rank_bounded: input exceeds max_rows=%d with k=None "
                    "(got %d rows) — bound the input (orderBy().limit) first",
                    F.lit(max_rows),
                    F.size("_rows"),
                )
            )
        )
    out = arr.select(
        F.posexplode(F.array_sort(rows_col, _cmp)).alias("_pos", "_row")
    )
    return out.select(
        *[F.col("_row")[c].alias(c) for c in cols],
        (F.col("_pos") + 1).cast(rank_type).alias(rank_col),
    )
