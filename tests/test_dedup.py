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
    assert drop == result["drop"]
    survivors = sorted(
        r["doc_id"] for r in result["survivors_ds"].take_all()
    )
    assert sorted(set(d["doc_id"] for d in docs) - drop) == survivors


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
    survivors = {r["vec_id"] for r in result["survivors_ds"].take_all()}
    assert survivors == {r["vec_id"] for r in rows} - dropped


def test_minlabel_components_resolves_transitive_chains():
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import minlabel_components

    pairs = [(2, 3), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)]
    ds = ray.data.from_arrow(
        pa.table(
            {"id_a": pa.array([a for a, _ in pairs], pa.int64()),
             "id_b": pa.array([b for _, b in pairs], pa.int64())}
        )
    )
    labels = {
        r["node"]: r["label"] for r in minlabel_components(ds).take_all()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    }


def test_minlabel_components_empty_pairs():
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import minlabel_components

    ds = ray.data.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())})
    )
    assert minlabel_components(ds).take_all() == []


def test_bucket_pair_cap_is_loud():
    """A degenerate bucket must emit a marker row counting the dropped
    pairs — never silently truncate (no-silent-caps rule)."""
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import (
        CAP_MARKER,
        PAIRS_PER_BUCKET_CAP,
        _bucket_pairs,
        candidate_pairs_from_buckets,
    )

    n = 50  # 1225 candidate pairs > cap of 200
    group = pa.table({"doc_id": pa.array(list(range(n)), pa.int64())})
    out = _bucket_pairs(group)
    ids_a = out.column("id_a").to_pylist()
    assert ids_a.count(CAP_MARKER) == 1
    emitted = len(ids_a) - 1
    assert emitted == PAIRS_PER_BUCKET_CAP
    dropped = out.column("id_b").to_pylist()[ids_a.index(CAP_MARKER)]
    assert dropped == n * (n - 1) // 2 - emitted

    buckets = ray.data.from_arrow(
        pa.table(
            {"band": pa.array([0] * n, pa.int32()),
             "key": pa.array([7] * n, pa.int64()),
             "doc_id": pa.array(list(range(n)), pa.int64())}
        )
    )
    pairs, capped = candidate_pairs_from_buckets(buckets)
    assert len(pairs) == PAIRS_PER_BUCKET_CAP
    assert capped == n * (n - 1) // 2 - PAIRS_PER_BUCKET_CAP


def test_jaccard_dedup_prefix_blocking_and_closure():
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import jaccard_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = [
        {"doc_id": 0, "text": base + "tail one"},
        {"doc_id": 1, "text": base + "tail two"},     # near dup of 0
        {"doc_id": 2, "text": base + "tail three"},   # near dup of 0/1
        {"doc_id": 3, "text": "completely different words " * 10},
        {"doc_id": 4, "text": "prefix shared but rest diverges entirely "
                              + "unrelated tokens " * 20},
        {"doc_id": 5, "text": "prefix shared but rest diverges entirely "
                              + "other content words repeated here " * 20},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    res = jaccard_dedup(ds, threshold=0.8, block_prefix_len=24)
    assert res["drop"] == {1, 2}  # 0 survives its cluster; 4/5 below threshold
    survivors = sorted(r["doc_id"] for r in res["survivors_ds"].take_all())
    assert survivors == [0, 3, 4, 5]
    assert res["capped_dropped_pairs"] == 0


def test_resolve_clusters_local_and_distributed_agree():
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import resolve_clusters

    pairs = [(2, 3), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23),
             (5, 40), (40, 41), (41, 6)]
    a = resolve_clusters(pairs)
    b = resolve_clusters(pairs, force_distributed=True)
    assert a["drop"] == b["drop"]
    assert a["clusters"] == b["clusters"]


def test_distributed_pair_verification_matches_local(monkeypatch):
    """Forcing the distributed verify path (texts never on the driver)
    must yield the same verified pairs/survivors as the local path."""
    import data_hub_ejp_xml_pipeline_ray.stages.dedup as dd

    docs = _mk_docs(n=60)
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    local = minhash_dedup(ds, threshold=0.7)
    monkeypatch.setattr(dd, "DISTRIBUTED_VERIFY_THRESHOLD", 0)
    dist = minhash_dedup(ds, threshold=0.7)
    assert set(local["pairs"]) == set(dist["pairs"])
    assert local["drop"] == dist["drop"]

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    jd_docs = [
        {"doc_id": 0, "text": base + "tail one"},
        {"doc_id": 1, "text": base + "tail two"},
        {"doc_id": 2, "text": "other words entirely " * 10},
    ]
    jds = ray.data.from_arrow(pa.Table.from_pylist(jd_docs))
    dist_j = dd.jaccard_dedup(jds, threshold=0.8)
    monkeypatch.setattr(dd, "DISTRIBUTED_VERIFY_THRESHOLD", 10**9)
    local_j = dd.jaccard_dedup(jds, threshold=0.8)
    assert local_j["drop"] == dist_j["drop"] == {1}


def test_simhash_degenerate_bucket_exact_no_drops():
    """Many identical docs = one degenerate bucket. The pigeonhole
    refinement kernel collapses the identical-signature run to a clique
    instead of truncating an O(n^2) scan: nothing is dropped, every doc
    but the min id lands in the drop set."""
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import simhash_dedup

    docs = [{"doc_id": i, "text": "same text every time"} for i in range(40)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    res = simhash_dedup(ds, max_hamming=3)
    assert res["capped_dropped_pairs"] == 0
    assert res["drop"] == set(range(1, 40))
    survivors = {r["doc_id"] for r in res["survivors_ds"].take_all()}
    assert survivors == {0}


def test_simhash_budget_backstop_cap_is_loud(monkeypatch):
    """The LOUD cap contract survives as a budget backstop: shrink the
    per-group comparison budget and the dropped count must surface in
    ``capped_dropped_pairs`` instead of vanishing."""
    import data_hub_ejp_xml_pipeline_ray.stages.dedup as dd

    rng = np.random.default_rng(3)
    # >96 distinct sigs sharing band 0 (low 16 bits equal) forces a
    # refinement pass whose n exceeds a tiny budget
    docs = [
        {"doc_id": i, "text": " ".join(rng.choice(
            ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"], 12
        ).tolist())}
        for i in range(160)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    monkeypatch.setattr(dd, "_SIMHASH_GROUP_BUDGET", 1)
    res = dd.simhash_dedup(ds, max_hamming=6)
    assert res["capped_dropped_pairs"] > 0


def test_refine_hamming_pairs_exact_vs_brute_force():
    """Property check of the pigeonhole kernel: emitted pairs are all
    true (precision) and connected components equal the uncapped brute
    force (recall up to clique chaining)."""
    from data_hub_ejp_xml_pipeline_ray.functions.hashing import hamming64
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import (
        _refine_hamming_pairs,
    )

    def comps(n, pairs):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return frozenset(
            frozenset(i for i in range(n) if find(i) == r)
            for r in {find(i) for i in range(n)}
        )

    rng = np.random.default_rng(11)
    for _ in range(12):
        width = int(rng.integers(5, 49))
        max_h = int(rng.integers(1, 7))
        n = int(rng.integers(2, 400))
        base = rng.integers(0, 1 << width, size=max(1, n // 10),
                            dtype=np.uint64)
        vals = base[rng.integers(0, len(base), n)]
        for i in range(n):
            for _f in range(int(rng.integers(0, 4))):
                vals[i] ^= np.uint64(1) << np.uint64(
                    int(rng.integers(0, width)))
        ids = np.arange(n, dtype=np.int64)
        out_a, out_b = [], []
        state = {"budget": 10 ** 9, "dropped": 0}
        _refine_hamming_pairs(ids, vals.copy(), width, max_h,
                              out_a, out_b, state)
        got = set(zip(out_a, out_b))
        truth = {
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if hamming64(int(vals[i]), int(vals[j])) <= max_h
        }
        assert state["dropped"] == 0
        assert got <= truth
        assert comps(n, got) == comps(n, truth)


def test_dataset_native_pair_path_matches_driver(monkeypatch):
    """Forcing the Dataset-native pair stream (candidates NEVER collect
    on the driver) must reproduce the driver fast path exactly, for
    both the Jaccard-verified and the pre-verified operator families."""
    import data_hub_ejp_xml_pipeline_ray.stages.dedup as dd

    docs = _mk_docs(n=80)
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    driver_mh = minhash_dedup(ds, threshold=0.7)
    driver_sh = simhash_dedup(ds, max_hamming=6)
    monkeypatch.setattr(dd, "PAIR_DRIVER_THRESHOLD", 0)
    native_mh = minhash_dedup(ds, threshold=0.7)
    native_sh = simhash_dedup(ds, max_hamming=6)
    assert set(native_mh["pairs"]) == set(driver_mh["pairs"])
    assert native_mh["drop"] == driver_mh["drop"]
    assert native_mh["clusters"] == driver_mh["clusters"]
    assert sorted(r["doc_id"] for r in native_mh["survivors_ds"].take_all()) \
        == sorted(r["doc_id"] for r in driver_mh["survivors_ds"].take_all())
    assert set(native_sh["pairs"]) == set(driver_sh["pairs"])
    assert native_sh["drop"] == driver_sh["drop"]


def test_dataset_native_jaccard_and_embedding_match_driver(monkeypatch):
    import data_hub_ejp_xml_pipeline_ray.stages.dedup as dd

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = [
        {"doc_id": 0, "text": base + "tail one"},
        {"doc_id": 1, "text": base + "tail two"},
        {"doc_id": 2, "text": base + "tail three"},
        {"doc_id": 3, "text": "completely different words " * 10},
    ]
    jds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    driver_j = dd.jaccard_dedup(jds, threshold=0.8)

    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        v = rng.standard_normal(16)
        rows.append({"vec_id": 2 * i, "embedding": v.tolist()})
        if i % 4 == 0:
            rows.append({"vec_id": 2 * i + 1, "embedding": (v + 1e-4).tolist()})
    eds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    driver_e = embedding_dedup(eds, dim=16, threshold=0.999, num_planes=8)

    monkeypatch.setattr(dd, "PAIR_DRIVER_THRESHOLD", 0)
    native_j = dd.jaccard_dedup(jds, threshold=0.8)
    native_e = embedding_dedup(eds, dim=16, threshold=0.999, num_planes=8)
    assert native_j["drop"] == driver_j["drop"] == {1, 2}
    assert set(native_j["pairs"]) == set(driver_j["pairs"])
    assert native_e["drop"] == driver_e["drop"]
    assert set(native_e["pairs"]) == set(driver_e["pairs"])


def test_dataset_native_dup_heavy_property(monkeypatch):
    """Dup-heavy corpus (40 clusters x 4 identical docs + noise): the
    Dataset-native path must agree with the driver path on every
    result field — and the survivors must be exactly the cluster
    minima plus the singletons."""
    import data_hub_ejp_xml_pipeline_ray.stages.dedup as dd

    rng = random.Random(11)
    docs = []
    did = 0
    expected_drop = set()
    for c in range(40):
        text = " ".join(rng.choices(WORDS, k=25)) + f" cluster{c}"
        first = did
        for m in range(4):
            docs.append({"doc_id": did, "text": text})
            if did != first:
                expected_drop.add(did)
            did += 1
    for _ in range(40):  # singleton noise
        docs.append({"doc_id": did,
                     "text": " ".join(rng.choices(WORDS, k=30)) + f" uniq{did}"})
        did += 1
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    driver = minhash_dedup(ds, threshold=0.9)
    monkeypatch.setattr(dd, "PAIR_DRIVER_THRESHOLD", 0)
    native = minhash_dedup(ds, threshold=0.9)
    assert native["drop"] == driver["drop"] == expected_drop
    assert native["clusters"] == driver["clusters"]
    assert sorted(r["doc_id"] for r in native["survivors_ds"].take_all()) \
        == sorted(set(d["doc_id"] for d in docs) - expected_drop)


def test_minlabel_long_chain_pointer_doubling():
    """A duplicate chain longer than max_iters converges anyway:
    pointer doubling makes rounds O(log diameter), where pure
    propagation (the r2 shape) silently returned WRONG labels for
    chains longer than ~30 docs."""
    from data_hub_ejp_xml_pipeline_ray.stages.dedup import minlabel_components

    n = 120  # chain 0-1-...-120: diameter >> default max_iters
    ds = ray.data.from_arrow(
        pa.table(
            {"id_a": pa.array(list(range(n)), pa.int64()),
             "id_b": pa.array(list(range(1, n + 1)), pa.int64())}
        )
    )
    labels = {
        r["node"]: r["label"] for r in minlabel_components(ds).take_all()
    }
    assert labels == {i: 0 for i in range(n + 1)}


def test_embedding_degenerate_bucket_cap_is_loud(monkeypatch):
    """All-identical vectors collapse into one LSH bucket; with a small
    comparison cap the verify must report the dropped comparisons via
    capped_dropped_pairs (never silently) and keep memory bounded."""
    import data_hub_ejp_xml_pipeline_ray.stages.dedup as dd

    monkeypatch.setattr(dd, "EMBED_COMPARISONS_PER_BUCKET_CAP", 50)
    rows = [{"vec_id": i, "embedding": [1.0] * 8} for i in range(40)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    res = embedding_dedup(ds, dim=8, threshold=0.99, num_planes=6)
    assert res["capped_dropped_pairs"] > 0
    survivors = {r["vec_id"] for r in res["survivors_ds"].take_all()}
    assert 0 in survivors
