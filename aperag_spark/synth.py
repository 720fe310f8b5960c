"""Deterministic, seeded generator of Common-Crawl-style `pages` rows matching
BASELINE.json input_hint: (url:string, warc_ts:timestamp, html:binary,
text:string, lang:string).

Pure per-index: row i is a function of (seed, i) only, so generation
parallelizes embarrassingly across executors (spark.range → mapInPandas) and
the same (seed, n) always yields byte-identical output — the FIXTURES.md F1
contract. Skew is built in on two axes:
  * hosts are drawn from a power-law so "giant hosts" exist;
  * entity mentions are drawn from a power-law so "head entities" exist
    (stress for the merge groupBy / salting path).
Alias variants ("Acme3 Corp" / "ACME3 Corporation" / "Acme3 Corp.") are
planted for the MinHash-LSH + connected-components linking stage, mirroring
the semantics of the reference's manual merge API
(/root/reference/aperag/graph/lightrag/utils_graph.py:548-766).
"""

from __future__ import annotations

import html as _html
import random
from datetime import datetime, timedelta

DEFAULT_SEED = 42

_ORG_BASES = [
    "Acme", "Globex", "Initech", "Umbra", "Vortex", "Zenith", "Quantum",
    "Stellar", "Nimbus", "Orion", "Pinnacle", "Radiant", "Solstice",
    "Tempest", "Vanguard",
]
_ORG_SUFFIX = ["Corp", "Inc", "Ltd", "Systems", "Labs", "Group"]
_PERSON_FIRST = ["Alice", "Boris", "Chen", "Dara", "Elena", "Farid", "Grace",
                 "Hiro", "Iris", "Jonas"]
_PERSON_LAST = ["Navarro", "Okafor", "Petrov", "Quinn", "Rossi", "Sato",
                "Tanaka", "Ueda", "Varga", "Wexler"]
_GEO_BASES = ["Port", "Lake", "Mount", "New", "East", "West"]
_GEO_SUFFIX = ["Havenford", "Brightwater", "Stonevale", "Ashmoor",
               "Clearfield", "Duskridge"]
_TECH = ["Hypergrid", "Neuroweave", "Fluxcache", "Shardlink", "Photonmesh",
         "Deltastore"]

_DESC_POOL = [
    "scalable data infrastructure", "renewable energy research",
    "maritime logistics", "precision manufacturing", "open source tooling",
    "quantitative finance", "distributed databases", "satellite imaging",
    "industrial automation", "language processing", "supply chain analytics",
    "privacy preserving computation", "graph analytics", "edge computing",
]
_KW_POOL = [
    "supply", "research", "funding", "logistics", "cloud", "energy",
    "partnership", "acquisition", "licensing", "standards", "talent",
    "infrastructure",
]
_FILLER = (
    "the quick market report shows steady growth across several regional "
    "segments while analysts expect moderate volatility and continued "
    "investment in core platform capabilities over the next quarter"
).split()

_LANGS = ["de", "fr", "es", "zh"]


def build_registry(seed: int = DEFAULT_SEED, n_entities: int = 240) -> list[dict]:
    """Deterministic entity registry. ~20% of orgs get alias variants."""
    rng = random.Random(f"registry:{seed}")
    reg: list[dict] = []
    i = 0
    while len(reg) < n_entities:
        kind = i % 4
        if kind == 0:
            base = f"{_ORG_BASES[i % len(_ORG_BASES)]}{i}"
            suffix = _ORG_SUFFIX[i % len(_ORG_SUFFIX)]
            name = f"{base} {suffix}"
            aliases = []
            if suffix == "Corp" and rng.random() < 0.8:
                aliases = [f"{base} Corporation", f"{base.upper()} Corp."]
            reg.append({"name": name, "etype": "organization", "aliases": aliases})
        elif kind == 1:
            name = (
                f"{_PERSON_FIRST[i % len(_PERSON_FIRST)]} "
                f"{_PERSON_LAST[(i // 3) % len(_PERSON_LAST)]}{i}"
            )
            reg.append({"name": name, "etype": "person", "aliases": []})
        elif kind == 2:
            name = (
                f"{_GEO_BASES[i % len(_GEO_BASES)]} "
                f"{_GEO_SUFFIX[(i // 2) % len(_GEO_SUFFIX)]}{i}"
            )
            reg.append({"name": name, "etype": "geo", "aliases": []})
        else:
            name = f"{_TECH[i % len(_TECH)]}{i}"
            reg.append({"name": name, "etype": "technology", "aliases": []})
        i += 1
    for ent in reg:
        r = random.Random(f"descs:{seed}:{ent['name']}")
        k = 3 if r.random() < 0.85 else 14  # some entities exceed the
        # FORCE_LLM_SUMMARY_ON_MERGE=10 fragment threshold (constants.py:44)
        ent["descs"] = r.sample(_DESC_POOL, min(k, len(_DESC_POOL)))
    return reg


def _pick_entity(rng: random.Random, reg: list[dict]) -> tuple[str, str, str]:
    """Power-law pick → (mention_name, etype, desc). Head entities emerge."""
    idx = int(len(reg) * rng.random() ** 3)
    ent = reg[min(idx, len(reg) - 1)]
    name = ent["name"]
    if ent["aliases"] and rng.random() < 0.3:
        name = rng.choice(ent["aliases"])
    etype = ent["etype"]
    if rng.random() < 0.08:  # conflicting type across chunks → majority vote
        etype = "category"  # (operate.py:296-301)
    desc = rng.choice(ent["descs"])
    return name, etype, desc


def gen_page(i: int, seed: int = DEFAULT_SEED, registry: list[dict] | None = None,
             n_hosts: int = 50) -> dict:
    """Pure function (seed, i) → one pages row."""
    reg = registry if registry is not None else build_registry(seed)
    rng = random.Random(f"page:{seed}:{i}")
    host_idx = int(n_hosts * rng.random() ** 4)  # power-law → giant hosts
    host = f"site{host_idx}.example.com"
    url = f"https://{host}/articles/{i}"
    warc_ts = datetime(2024, 1, 1) + timedelta(seconds=i)
    lang = "en" if rng.random() < 0.94 else rng.choice(_LANGS)

    u = rng.random()
    if u < 0.85:
        n_sent = rng.randint(8, 60)
    elif u < 0.99:
        n_sent = rng.randint(60, 260)  # multi-chunk at 1200-token windows
    else:
        n_sent = rng.randint(260, 800)

    sentences: list[str] = []
    if lang == "en":
        for _ in range(n_sent):
            roll = rng.random()
            if roll < 0.25:
                name, etype, desc = _pick_entity(rng, reg)
                article = "an" if etype[0] in "aeiou" else "a"
                sentences.append(f"{name} is {article} {etype} known for {desc}.")
            elif roll < 0.40:
                src, _, _ = _pick_entity(rng, reg)
                tgt, _, _ = _pick_entity(rng, reg)
                kws = ", ".join(rng.sample(_KW_POOL, 2))
                w = rng.choice([1, 2, 3, 5, 8])
                sentences.append(
                    f"{src} partnered with {tgt} on {kws} [w={w}]."
                )
            else:
                k = rng.randint(8, 18)
                sentences.append(" ".join(rng.choices(_FILLER, k=k)) + ".")
    else:
        for _ in range(n_sent):
            sentences.append(" ".join(rng.choices(_FILLER, k=rng.randint(6, 14))) + ".")

    paras: list[str] = []
    si = 0
    while si < len(sentences):
        step = rng.randint(3, 6)
        paras.append(" ".join(sentences[si : si + step]))
        si += step
    text = "\n\n".join(paras)
    body = "".join(f"<p>{_html.escape(p)}</p>" for p in paras)
    html_doc = (
        f"<html><head><title>{host} article {i}</title></head>"
        f"<body>{body}</body></html>"
    )
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html_doc.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def gen_pages_local(n: int, seed: int = DEFAULT_SEED) -> list[dict]:
    reg = build_registry(seed)
    return [gen_page(i, seed, reg) for i in range(n)]


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def gen_pages_df(spark, n: int, seed: int = DEFAULT_SEED, partitions: int = 32):
    """Distributed generation: spark.range → mapInPandas, one pure call per
    index. No driver-side materialization; scales to any n."""
    import pandas as pd

    def _gen(batches):
        reg = build_registry(seed)  # built once per task, not per row
        for pdf in batches:
            rows = [gen_page(int(i), seed, reg) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(_gen, schema=PAGES_SCHEMA)
    )
