"""Dump formatted Catalyst plans of the headline queries and the KG merge
stages to PLANS.md — the plan-quality evidence (pushdown, pruning,
broadcast, partial aggregation) in one reviewable artifact.

Usage: python scripts/explain_dump.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from aperag_spark.operators.chunking import chunk_texts, extract_texts
    from aperag_spark.operators.extraction import extract_mentions, split_mentions
    from aperag_spark.operators.merge import merge_entities, merge_relations
    from aperag_spark.queries import QUERIES
    from aperag_spark.session import get_spark
    from aperag_spark.synth import gen_pages_df

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    sections: list[tuple[str, str]] = []

    pages = gen_pages_df(spark, 20, seed=1, partitions=2)
    raw_e, raw_r = split_mentions(extract_mentions(chunk_texts(extract_texts(pages))))
    sections.append(("KG entity merge (M2-M6)", explain(merge_entities(raw_e))))
    sections.append(("KG relation merge (M8-M9)", explain(merge_relations(raw_r))))

    for name in [
        "kg_top_entities",
        "kg_one_hop",
        "dedup_minhash_candidates",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "sim_topk",
        "sim_neardup_lsh",
        "fulltext_bm25",
        "flow_merge",
        "tpch_pricing",
        "top_customers",
    ]:
        sections.append((f"query: {name}", explain(QUERIES[name](spark, sf))))

    out = ["# PLANS — formatted Catalyst plans of the headline operators\n"]
    out.append(
        "What to look for: `PushedFilters`/`ReadSchema` at every scan "
        "(pushdown + pruning), paired partial/final `(Object)HashAggregate` "
        "(map-side combine = skew defense), `BroadcastHashJoin` on small "
        "dimensions, and `AdaptiveSparkPlan` (AQE re-planning + skew-join "
        "splitting at runtime).\n"
    )
    for title, plan in sections:
        out.append(f"## {title}\n\n```\n{plan}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
