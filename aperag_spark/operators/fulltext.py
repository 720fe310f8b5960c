"""Fulltext index + BM25 search (SURVEY.md §2 S8/Q10), Spark restatement of
the reference's Elasticsearch leg (aperag/index/fulltext_index.py):

  S8  insert/update/delete index  — fulltext_index.py:44-196: ES documents
      keyed by doc_id with analyzed `content`. Here the "index" is a pair of
      columnar tables — postings (term, id, tf) and doclens (id, dl, plus
      corpus stats) — the shape a distributed engine actually wants: the
      search join shuffles on `term`, and at 100 TB the postings table is
      written partitioned/bucketed by term so a query touches only its
      terms' buckets.
  Q10 search_document — fulltext_index.py:198-233: a bool/should query (one
      match clause per keyword, minimum_should_match "80%"), scored by ES's
      BM25 (k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))),
      sorted by _score desc, top-k.

Analyzers: lowercase + non-alphanumeric split — the ES `standard`
analyzer's behavior on plain English text (no stemming). For CJK corpora
the reference maps `content` to ik_max_word / ik_smart
(aperag/index/fulltext_index.py:270,286 — external ES plugin); the
"ik-lite" stand-in here is Han-run overlapping bigrams (the classic Lucene
`cjk` analyzer behavior), gated by a lang column so mixed corpora index
each document with the right analyzer.
"""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F
from aperag_spark.operators.windows import rank_bounded
from pyspark.sql import DataFrame

BM25_K1 = 1.2
BM25_B = 0.75

# CJK script ranges covered by the bigram analyzer: Han, hiragana,
# katakana (incl. prolonged-sound marks block), hangul syllables — the
# scripts the Lucene `cjk` analyzer bigrams. Ordered low→high per range.
_CJK_CLASS = "一-鿿ぁ-ゟ゠-ヿ가-힣"
_CJK_RANGES = [("一", "鿿"), ("ぁ", "ゟ"), ("゠", "ヿ"), ("가", "힣")]
CJK_LANGS = ("zh", "ja", "ko")


def _is_cjk_char(c: str) -> bool:
    return any(lo <= c <= hi for lo, hi in _CJK_RANGES)


def analyze_col(col, cjk: bool = False):
    """lowercase, split on non-word runs, drop empties → array<string>.

    The standard analyzer's word class is the JVM's ASCII \\w — a documented
    simplification of the ES standard analyzer (accented words tokenize at
    the accent on BOTH index and query side, so retrieval is consistent).

    cjk=True ("ik-lite", fulltext_index.py:286 stand-in): CJK-script runs
    (Han, kana, hangul) are isolated and expanded to overlapping character
    bigrams (single chars stand alone); other segments keep the standard
    behavior. All JVM-side expressions — the script check is a codepoint
    range compare on the first char, not a per-token regex."""
    if not cjk:
        return F.filter(F.split(F.lower(col), r"[^\w]+"), lambda w: w != "")
    isolated = F.regexp_replace(F.lower(col), f"([{_CJK_CLASS}]+)", " $1 ")
    toks = F.filter(
        F.split(isolated, f"[^\\w{_CJK_CLASS}]+"), lambda w: w != ""
    )

    def _expand(t):
        first = F.substring(t, 1, 1)
        is_cjk = None
        for lo, hi in _CJK_RANGES:
            cond = (first >= F.lit(lo)) & (first <= F.lit(hi))
            is_cjk = cond if is_cjk is None else (is_cjk | cond)
        bigrams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - 1, F.lit(1))),
            lambda i: t.substr(i, F.lit(2)),
        )
        return F.when(is_cjk, bigrams).otherwise(F.array(t))

    return F.flatten(F.transform(toks, _expand))


def analyze_keywords(keywords: list[str], cjk: bool = False) -> list[str]:
    """Driver-side mirror of analyze_col for the (tiny) query keyword list —
    the search analyzer must tokenize queries exactly like the index
    analyzer (ES search_analyzer=ik_smart, fulltext_index.py:286). Mirrors
    the JVM's ASCII \\w via re.ASCII so both sides agree on every corpus."""
    out: list[str] = []
    for k in keywords:
        k = k.lower()
        segments = re.split(f"([{_CJK_CLASS}]+)", k) if cjk else [k]
        for seg in segments:
            if not seg:
                continue
            if cjk and _is_cjk_char(seg[0]):
                if len(seg) == 1:
                    out.append(seg)
                else:
                    out.extend(seg[i : i + 2] for i in range(len(seg) - 1))
            else:
                out.extend(t for t in re.split(r"[^\w]+", seg, flags=re.ASCII) if t)
    return out


def build_fulltext_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    cjk_langs: tuple[str, ...] = CJK_LANGS,
    materialize: bool = False,
) -> dict[str, DataFrame]:
    """S8: docs → {postings, doclens}. postings has one row per (term, doc)
    with the term frequency; doclens carries each doc's analyzed length.
    Corpus stats (N, avgdl) are derived from doclens at query time — they
    are a 1-row aggregate, not a materialization concern.

    When lang_col is given, documents whose language is in cjk_langs are
    analyzed with the CJK bigram analyzer and the rest with the standard
    analyzer — the per-field analyzer choice of fulltext_index.py:286,
    expressed as a row-level CASE so one pass indexes a mixed corpus.

    Update/delete (fulltext_index.py:91-196) are the generic columnar-table
    upsert/anti-join patterns of operators/maintenance.py applied to these
    two tables keyed by id."""
    text = F.col(text_col)
    if lang_col is None:
        analyzed = analyze_col(text)
    else:
        analyzed = F.when(
            F.col(lang_col).isin(*cjk_langs), analyze_col(text, cjk=True)
        ).otherwise(analyze_col(text))
    terms = docs.select(F.col(id_col).alias("id"), F.explode(analyzed).alias("term"))
    postings = terms.groupBy("term", "id").agg(F.count(F.lit(1)).alias("tf"))
    # dl = Σ tf over the doc's postings (every occurrence is counted in
    # exactly one (term, id) row), so doclens derives from postings instead
    # of re-running the analyze+explode pass a second time — with the
    # session cache's lazy checkpoint on postings, the index build pays ONE
    # pass over the corpus text.
    doclens = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    if materialize:
        # bm25_search's plan references postings twice (df + scoring) and
        # doclens twice (stats + norm); left lazy, the analyze+explode+
        # groupBy re-runs for every reference. The production path persists
        # the index through the S8 sink (a parquet scan is naturally
        # shared); this flag checkpoints a derived-in-query index instead.
        # Only worth it when the corpus is large relative to the probe:
        # measured at sf0.1 (5k short docs) the two checkpoint jobs cost
        # MORE than the re-derivation (interleaved best-of-4: 2.30s vs
        # 1.83s lazy), so the bench queries stay lazy.
        postings = postings.localCheckpoint()
        doclens = doclens.localCheckpoint()
    return {"postings": postings, "doclens": doclens}


def bm25_search(
    index: dict[str, DataFrame],
    keywords: list[str],
    topk: int = 3,
    min_should_match: float = 0.8,
    cjk: bool = False,
) -> DataFrame:
    """Q10: BM25 over the inverted index. One broadcast join of the (tiny)
    keyword list against postings — shuffle key is `term`, so only the
    queried terms' posting lists move — then a per-doc aggregate:
    score = Σ_matched idf(t)·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)),
    keep docs matching ≥ floor(min_should_match·|keywords|) distinct terms
    (ES truncates percentage minimums), order by score desc, top-k.

    Returns (id, score double, matched int, rank int)."""
    if not keywords:
        raise ValueError("search_document requires keywords (fulltext_index.py:202)")
    spark = index["postings"].sparkSession
    doclens = index["doclens"]
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # query terms go through the same analyzer as the index (cjk=True →
    # CJK bigrams), so a Chinese phrase matches its indexed bigrams.
    # minimum_should_match counts per-KEYWORD clauses (fulltext_index.py:
    # 206-210 builds one match clause per keyword): a clause matches when
    # ANY of its analyzed tokens matches, so the token→clause map is kept.
    pairs: list[tuple[str, int]] = []
    for ci, k in enumerate(keywords):
        for t in sorted(set(analyze_keywords([k], cjk=cjk))):
            pairs.append((t, ci))
    if not pairs:
        raise ValueError("keywords analyzed to nothing")
    kwmap = spark.createDataFrame(pairs, "term string, clause int")
    kw = kwmap.select("term").distinct()
    df_by_term = (
        index["postings"]
        .join(F.broadcast(kw), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    matched = (
        index["postings"]
        .join(F.broadcast(kw), "term", "left_semi")
        .join(F.broadcast(df_by_term), "term")
        .join(doclens, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = matched.withColumn("term_score", idf * tf_norm)
    # ES truncates percentage minimums; denominator = number of KEYWORDS
    # (match clauses), not analyzed tokens
    required = int(math.floor(min_should_match * len(keywords)))
    clause_hits = (
        scored.select("id", "term")
        .join(F.broadcast(kwmap), "term")
        .groupBy("id")
        .agg(F.countDistinct("clause").cast("int").alias("matched"))
    )
    per_doc = (
        scored.groupBy("id")
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
        .join(clause_hits, "id")
        .where(F.col("matched") >= max(required, 1))
    )
    # orderBy+limit → TakeOrderedAndProject; rank assigned on the k survivors
    return rank_bounded(per_doc, [("score", "desc"), ("id", "asc")], k=topk)
