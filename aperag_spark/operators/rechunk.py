"""C5 — the vector-index-path rechunker (SURVEY.md §2.2 C5): title-hierarchy
grouping + merge-small + leveled-separator semantic splitting, reproducing
the semantics of the reference's Rechunker/SimpleSemanticSplitter
(aperag/docparser/chunking.py:21-318; config chunk_size=400/overlap=20,
aperag/config.py:101-102) in a functional form, plus a minimal markdown →
part stream (S3, aperag/docparser/parse_md.py — titles and paragraph text
only, which is all the rechunker consumes).

Runs as the same narrow mapInPandas flat-map pattern as the graph-path
chunker; no shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from aperag_spark.textproc import Tokenizer, get_tokenizer

# Separator hierarchy, least-coherence-impact first —
# reference chunking.py:222-234
LEVELED_SEPARATORS: list[list[str]] = [
    ["\n\n"],
    ["\n"],
    ["。”", "！”", "？”"],
    ['."', '!"', '?"'],
    ["。", "！", "？"],
    [".", "!", "?"],
    ["；", "，", "、"],
    [";", ","],
    ["》", "）", "】", "」", "’", "”"],
    ["“", ">", ")", "]", "}", "'", '"'],
    [" ", "\t"],
]

_TITLE_RE = re.compile(r"^(#{1,6})\s+(.*)$")


def parse_markdown_parts(text: str) -> list[dict]:
    """Minimal S3: '#'-headings become title parts (level 1-6); blank-line
    separated blocks become text parts."""
    parts: list[dict] = []
    for block in text.split("\n\n"):
        block = block.strip()
        if not block:
            continue
        m = _TITLE_RE.match(block.splitlines()[0])
        if m and len(block.splitlines()) == 1:
            parts.append({"kind": "title", "level": len(m.group(1)), "content": m.group(2)})
        else:
            parts.append({"kind": "text", "level": 0, "content": block})
    return parts


class SemanticSplitter:
    """Leveled-separator recursive splitter with bisection fallback and
    right-side overlap — semantics of chunking.py:217-318."""

    def __init__(self, tokenizer: Tokenizer):
        self._tok = tokenizer

    def _fit(self, s: str, chunk_size: int) -> bool:
        return len(self._tok.encode(s)) <= chunk_size

    def split(self, s: str, chunk_size: int, chunk_overlap: int) -> list[str]:
        return self._split(s, chunk_size, chunk_overlap, 0)

    def _split(self, s: str, chunk_size: int, overlap: int, level: int) -> list[str]:
        if len(s) == 0:
            return []
        if len(s) <= 1 or self._fit(s, chunk_size):
            return [s]
        if level >= len(LEVELED_SEPARATORS):
            # arbitrary bisection; overlap taken from the right half of the
            # left piece so the recursion converges (chunking.py:253-264)
            p = len(s) // 2
            left = self._split(s[:p], chunk_size, overlap, level + 1)
            ov = ""
            if overlap > 0:
                mid = p // 2
                if mid > 0:
                    ov = self._cut_right(s[:p][mid:], overlap)
            right = self._split(ov + s[p:], chunk_size, overlap, level + 1)
            return left + right

        pieces = [s]
        for sep in LEVELED_SEPARATORS[level]:
            nxt: list[str] = []
            for piece in pieces:
                split_at = piece.split(sep)
                nxt.extend(part + sep for part in split_at[:-1])
                nxt.append(split_at[-1])
            pieces = nxt

        out: list[str] = []
        for piece in pieces:
            out.extend(self._split(piece, chunk_size, overlap, level + 1))
        return self._merge_small(out, chunk_size)

    def _cut_right(self, s: str, budget: int) -> str:
        """Largest suffix fitting in `budget` tokens (binary search —
        chunking.py:289-302)."""
        if len(s) == 0 or self._fit(s, budget):
            return s
        if len(s) <= 1:
            return ""
        lo, hi = 0, len(s)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._fit(s[mid:], budget):
                hi = mid
            else:
                lo = mid + 1
        return s[lo:]

    def _merge_small(self, pieces: list[str], chunk_size: int) -> list[str]:
        """Greedy re-merge of adjacent small pieces (chunking.py:304-318)."""
        merged: list[str] = []
        cur = ""
        for piece in pieces:
            if not cur:
                cur = piece
                continue
            if self._fit(cur + piece, chunk_size):
                cur += piece
            else:
                merged.append(cur)
                cur = piece
        if cur:
            merged.append(cur)
        return merged


def rechunk_parts(
    parts: list[dict],
    chunk_size: int = 400,
    chunk_overlap: int = 20,
    tokenizer: Tokenizer | None = None,
) -> list[dict]:
    """Title-grouped rechunk: group parts under headings, maintain the title
    stack, merge whole groups while they fit, split oversized parts
    (chunking.py:42-147). Returns [{'content', 'titles'}]."""
    tok = tokenizer or get_tokenizer()
    splitter = SemanticSplitter(tok)
    ntok = lambda s: len(tok.encode(s))

    # group on titles (chunking.py:46-74). Note the reference's exact rule
    # order: the first part ALWAYS opens the group with its title/level —
    # even a nested title — and only AFTER that do nested titles
    # (nesting != 0) stop opening new groups (chunking.py:61-70).
    groups: list[dict] = []
    cur = None
    for part in parts:
        if not part["content"]:
            continue
        level = part["level"] if part["kind"] == "title" else 0
        title = part["content"] if part["kind"] == "title" else ""
        nesting = part.get("nesting", 0)
        if cur is None:
            cur = {"level": level, "title": title, "items": [part]}
            groups.append(cur)
            continue
        if level == 0 or nesting != 0:
            cur["items"].append(part)
            continue
        cur = {"level": level, "title": title, "items": [part]}
        groups.append(cur)

    result: list[dict] = []
    title_stack: list[tuple[str, int]] = []
    last: dict | None = None  # {'content', 'titles', 'tokens'}
    highest_in_last: int | None = None

    def seal():
        nonlocal last, highest_in_last
        if last is not None:
            result.append({"content": last["content"], "titles": last["titles"]})
        last, highest_in_last = None, None

    def append_to_last(content: str, titles: list[str]):
        nonlocal last
        if last is None:
            last = {"content": content, "titles": titles.copy(), "tokens": ntok(content)}
        else:
            last["content"] += "\n\n" + content
            last["tokens"] = ntok(last["content"])

    for group in groups:
        while title_stack and title_stack[-1][1] >= group["level"]:
            title_stack.pop()
        if group["level"] > 0:
            title_stack.append((group["title"], group["level"]))
        titles = [t for t, _ in title_stack]

        group_tokens = sum(ntok(p["content"]) for p in group["items"])
        can_merge = True
        if highest_in_last is not None and highest_in_last > group["level"]:
            can_merge = False  # don't merge a main heading under a sub-heading
        last_tokens = 0 if last is None else last["tokens"]
        if last_tokens + group_tokens > chunk_size:
            can_merge = False

        if can_merge:
            for p in group["items"]:
                append_to_last(p["content"], titles)
            if highest_in_last is None:
                highest_in_last = group["level"]
            continue

        seal()

        # split oversized parts (chunking.py:116-129)
        pieces: list[str] = []
        for p in group["items"]:
            if ntok(p["content"]) > chunk_size:
                pieces.extend(splitter.split(p["content"], chunk_size, chunk_overlap))
            else:
                pieces.append(p["content"])

        highest_in_last = group["level"]
        tokens_sum = 0
        for piece in pieces:
            t = ntok(piece)
            if tokens_sum + t > chunk_size and last is not None:
                result.append({"content": last["content"], "titles": last["titles"]})
                last = None
                tokens_sum = 0
            append_to_last(piece, titles)
            tokens_sum += t

    seal()
    return result


RECHUNK_SCHEMA = (
    "doc_id string, chunk_index int, content string, titles array<string>, tokens int"
)


def rechunk_documents(
    texts, chunk_size: int = 400, chunk_overlap: int = 20, id_col: str = "doc_id",
    text_col: str = "text", parser: str = "full",
):
    """DataFrame flat-map: markdown text → rechunked vector-path chunks.

    parser="full" (default) runs the complete markdown→Part parser
    (aperag_spark.docparser.parse_md — code blocks, tables, nested lists,
    blockquotes, setext headings; reference parse_md.py:34-471) and feeds
    the Part stream to the rechunker with reference-exact group titles
    (full '#'-prefixed content, chunking.py:57-59). parser="simple" keeps
    the round-1 titles+paragraphs extractor (hash-less titles)."""
    import pandas as pd

    from aperag_spark.docparser import parse_md, parts_for_rechunk

    def _parts(text: str) -> list[dict]:
        if parser == "full":
            return parts_for_rechunk(parse_md(text))
        return parse_markdown_parts(text)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = get_tokenizer()
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                parts = _parts(text)
                for i, ch in enumerate(
                    rechunk_parts(parts, chunk_size, chunk_overlap, tok)
                ):
                    rows.append(
                        {
                            "doc_id": str(doc_id),
                            "chunk_index": i,
                            "content": ch["content"],
                            "titles": ch["titles"],
                            "tokens": len(tok.encode(ch["content"])),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_index", "content", "titles", "tokens"]
            )

    return texts.mapInPandas(_run, schema=RECHUNK_SCHEMA)
