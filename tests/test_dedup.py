"""Dedup operators vs brute-force oracles on small corpora."""
import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from data_hub_ejp_xml_pipeline_ray.functions.hashing import (
    hamming64,
    jaccard,
    shingle_hashes,
    simhash,
)
from data_hub_ejp_xml_pipeline_ray.stages.dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu".split()


def _mk_docs(seed=3, n=60, dup_every=5):
    """Corpus with exact dups and near-dups at known positions."""
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        if i % dup_every == 1 and i > 0:
            base = docs[i - 1]["text"]
            if i % (2 * dup_every) == 1:
                docs.append({"doc_id": i, "text": base})  # exact dup
            else:
                toks = base.split()
                toks[rng.randrange(len(toks))] = rng.choice(WORDS)
                docs.append({"doc_id": i, "text": " ".join(toks)})  # near dup
        else:
            docs.append(
                {"doc_id": i, "text": " ".join(rng.choices(WORDS, k=30))}
            )
    return docs


def test_exact_dedup_matches_group_min():
    docs = _mk_docs()
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    got = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    by_text = {}
    for d in docs:
        by_text.setdefault(d["text"], []).append(d["doc_id"])
    expected = sorted(min(v) for v in by_text.values())
    assert got == expected


def _brute_force_pairs(docs, threshold, n=3):
    sh = {d["doc_id"]: shingle_hashes(d["text"], n) for d in docs}
    out = []
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if jaccard(sh[ids[i]], sh[ids[j]]) >= threshold:
                out.append((ids[i], ids[j]))
    return out


def test_minhash_dedup_verified_pairs_are_exact_and_recall_high():
    docs = _mk_docs(n=80)
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    result = minhash_dedup(ds, threshold=0.7, num_perm=64, num_bands=16)
    truth = set(_brute_force_pairs(docs, 0.7))
    got = set(result["pairs"])
    # precision exact by construction (pairs are Jaccard-verified)
    assert got <= truth or all(p in truth for p in got)
    # LSH recall: with b=16,r=4 at J>=0.7 expected ~>99%
    if truth:
        assert len(got & truth) / len(truth) >= 0.9
    # survivors = all ids minus non-min members of verified clusters
    drop = {m for ms in result["clusters"].values() for m in ms if m != min(ms)}
    assert sorted(set(d["doc_id"] for d in docs) - drop) == result["survivors"]


def test_simhash_dedup_exact_hamming_verify():
    docs = _mk_docs(n=60)
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    result = simhash_dedup(ds, max_hamming=6)
    sigs = {d["doc_id"]: simhash(d["text"]) for d in docs}
    for a, b in result["pairs"]:
        assert hamming64(sigs[a], sigs[b]) <= 6
    # exact duplicates always land in the same buckets (hamming 0)
    exact_pairs = [
        (a["doc_id"], b["doc_id"])
        for i, a in enumerate(docs)
        for b in docs[i + 1 :]
        if a["text"] == b["text"]
    ]
    for p in exact_pairs:
        assert p in result["pairs"]


def test_ngram_jaccard_pairs_kernel():
    docs = [
        {"doc_id": 0, "text": "a b c d e f"},
        {"doc_id": 1, "text": "a b c d e f"},
        {"doc_id": 2, "text": "totally different words here now"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    out = ngram_jaccard_pairs(ds, [(0, 1), (0, 2)])
    assert out[0] == (0, 1, 1.0)
    assert out[1][2] == 0.0


def test_embedding_dedup_finds_planted_near_dups():
    rng = np.random.default_rng(5)
    rows = []
    for i in range(50):
        v = rng.standard_normal(16)
        rows.append({"vec_id": 2 * i, "embedding": v.tolist()})
        if i % 4 == 0:  # plant a near-identical vector
            rows.append({"vec_id": 2 * i + 1, "embedding": (v + 1e-4).tolist()})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    result = embedding_dedup(ds, dim=16, threshold=0.999, num_planes=8)
    planted = {(2 * i, 2 * i + 1) for i in range(0, 50, 4)}
    assert planted <= set(result["pairs"])
    # survivors drop exactly the odd ids of planted pairs
    dropped = {b for _, b in planted}
    assert set(result["survivors"]) == {r["vec_id"] for r in rows} - dropped
