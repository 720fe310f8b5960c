"""Workspace (tenant) isolation — SURVEY §1.1's partition-key promise,
exercised: two workspaces drive one shared KGEngine out_dir with
interleaved inserts over IDENTICAL input pages; ids and on-disk tables
must be disjoint, and destructive maintenance in one workspace must leave
the other's subtree byte-identical."""

from __future__ import annotations

import hashlib
import os

from aperag_spark.api import KGEngine
from aperag_spark.synth import gen_pages_df


def _tree_digest(root: str) -> dict[str, str]:
    """relpath -> sha256 for every file under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            out[rel] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


def test_workspace_isolation(spark, tmp_path):
    shared = str(tmp_path / "kg")
    eng_a = KGEngine(spark, shared, workspace="tenant_a")
    eng_b = KGEngine(spark, shared, workspace="tenant_b")

    # interleaved inserts of the SAME pages (same seed) — the strongest
    # collision setup: identical content, different tenant
    pages = gen_pages_df(spark, 10, seed=11, partitions=2)
    eng_a.insert(pages, input_fingerprint="s11")
    eng_b.insert(gen_pages_df(spark, 10, seed=11, partitions=2), input_fingerprint="s11")

    # physically disjoint partition subtrees
    assert os.path.isdir(os.path.join(shared, "workspace=tenant_a"))
    assert os.path.isdir(os.path.join(shared, "workspace=tenant_b"))

    # chunk ids are workspace-salted: identical input, zero overlap
    ids_a = {r["chunk_id"] for r in eng_a.chunks.select("chunk_id").collect()}
    ids_b = {r["chunk_id"] for r in eng_b.chunks.select("chunk_id").collect()}
    assert ids_a and ids_b and not (ids_a & ids_b)

    # graph CONTENT is identical (same pages) even though ids differ —
    # isolation comes from the salt + path, not from divergent results
    ents_a = {r["entity_id"] for r in eng_a.entities.collect()}
    ents_b = {r["entity_id"] for r in eng_b.entities.collect()}
    assert ents_a == ents_b

    # destructive ops in tenant_a leave tenant_b's bytes untouched
    b_root = os.path.join(shared, "workspace=tenant_b")
    before = _tree_digest(b_root)
    victim = pages.select("url").limit(1).collect()[0]["url"]
    eng_a.delete_documents([victim])
    name = sorted(ents_a)[0]
    eng_a.delete_entity(name)
    after = _tree_digest(b_root)
    assert before == after

    # and tenant_b still answers identically from its own tables
    assert {r["entity_id"] for r in eng_b.entities.collect()} == ents_b
    # while tenant_a's view actually changed
    assert {r["entity_id"] for r in eng_a.entities.collect()} != ents_a
