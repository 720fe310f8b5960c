"""Pure-Python byte-level BPE engine compatible with tiktoken rank files.

The reference tokenizes with tiktoken o200k_base (aperag/graph/lightrag/
utils.py:191-218, lightrag.py:134-135). tiktoken is not installed in this
environment and its rank file cannot be downloaded here, so this module
provides the complete, swap-ready engine from public knowledge:

  * rank-file format — one line per token: base64(token_bytes) <space> rank
    (the published .tiktoken format; load_tiktoken_bpe below).
  * pretokenizer — the published o200k_base regex (openai/tiktoken
    _educational & registry source), which needs \\p{} classes → the
    installed `regex` module.
  * byte-pair merge — the standard greedy lowest-rank-merge loop
    (Sennrich et al. 2016; same algorithm as tiktoken's educational
    implementation, reimplemented).

Wire-up: textproc.get_tokenizer() prefers (1) installed tiktoken, then
(2) this engine with a rank file pointed to by $APERAG_SPARK_TIKTOKEN_PATH,
then (3) the deterministic regex Tokenizer. Spark pipeline AND the parity
port both construct their tokenizer through that single factory, so they
can never disagree.
"""

from __future__ import annotations

import base64

# Published o200k_base pretokenizer pattern (tiktoken registry, public).
O200K_PAT = "|".join(
    [
        r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?i:'s|'t|'re|'ve|'m|'ll|'d)?",
        r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?i:'s|'t|'re|'ve|'m|'ll|'d)?",
        r"\p{N}{1,3}",
        r" ?[^\s\p{L}\p{N}]+[\r\n/]*",
        r"\s*[\r\n]+",
        r"\s+(?!\S)",
        r"\s+",
    ]
)


def load_tiktoken_bpe(path: str) -> dict[bytes, int]:
    """Parse a .tiktoken rank file: 'base64token rank' per line."""
    ranks: dict[bytes, int] = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            token_b64, rank = line.split()
            ranks[base64.b64decode(token_b64)] = int(rank)
    return ranks


def bpe_merge(piece: bytes, ranks: dict[bytes, int]) -> list[int]:
    """Greedy BPE: repeatedly merge the adjacent pair with the LOWEST rank
    until no mergeable pair remains; return the ranks of the final parts."""
    parts = [piece[i : i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best_rank, best_i = None, None
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return [ranks[p] for p in parts]


class BpeEncoding:
    """Minimal tiktoken-compatible Encoding: encode/decode over a rank
    table + pretokenizer pattern. Special tokens are not needed by the
    chunker (operate.py:71-115 only encode→slice→decode plain text)."""

    def __init__(self, ranks: dict[bytes, int], pat_str: str = O200K_PAT):
        import regex

        self._ranks = ranks
        self._pat = regex.compile(pat_str)
        self._decoder = {rank: token for token, rank in ranks.items()}
        # Per-instance cache: a class-level lru_cache would key on self and
        # pin every encoding instance alive for the executor's lifetime.
        self._piece_cache: dict[bytes, tuple[int, ...]] = {}

    def _encode_piece(self, piece: bytes) -> tuple[int, ...]:
        cached = self._piece_cache.get(piece)
        if cached is not None:
            return cached
        r = self._ranks.get(piece)
        toks = (r,) if r is not None else tuple(bpe_merge(piece, self._ranks))
        if len(self._piece_cache) < 65536:
            self._piece_cache[piece] = toks
        return toks

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for m in self._pat.finditer(text):
            out.extend(self._encode_piece(m.group().encode("utf-8")))
        return out

    def decode(self, tokens: list[int]) -> str:
        return b"".join(self._decoder[t] for t in tokens).decode(
            "utf-8", errors="replace"
        )
