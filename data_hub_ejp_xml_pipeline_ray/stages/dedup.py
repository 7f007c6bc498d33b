"""Deduplication stages for large-scale training-data pipelines.

Five operators, each Ray-Data-first:

* :func:`exact_dedup` — content-hash + two-phase (per-batch combiner,
  then grouped min) — no full-row shuffle, only (hash, id) pairs move.
* :func:`minhash_dedup` — shingle -> MinHash -> banded LSH buckets ->
  candidate pairs -> exact-Jaccard verify -> union-find clusters.
* :func:`simhash_dedup` — 64-bit SimHash, banded candidate generation,
  exact Hamming verify.
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard for a candidate
  pair set (the verify kernel, exposed standalone).
* :func:`embedding_dedup` — cosine near-dup over an embedding column
  via seeded random-hyperplane LSH buckets + within-bucket verify.

Scale notes (the partitioning assumptions, per SURVEY §2.8): signatures
and band keys are computed batch-parallel in actor pools (per-actor
seeded state built once); the only shuffles move (bucket_key, doc_id)
pairs — never documents; candidate PAIRS (not docs) come to the driver
for union-find, which assumes a bounded duplicate rate. Surviving-id
semantics are deterministic: the minimum id in each cluster survives.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from ..functions.hashing import (
    UnionFind,
    band_keys,
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash,
    simhash_band_keys,
)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def _content_hash_batch(
    batch: pa.Table, text_col: str, id_col: str, preagg: bool = True
) -> pa.Table:
    """Hash text -> (hash, id) pairs. With ``preagg`` (the survivors
    path) the batch is pre-reduced to min id per hash — a combiner.
    The drop-ids path needs EVERY pair (pre-reduction would discard
    exactly the ids it wants), so it passes ``preagg=False``; the pair
    stream is two ints per row either way."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    hashes = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    (t or "").encode("utf-8"), digest_size=8
                ).digest(),
                "little",
                signed=False,
            )
            >> 1  # keep in int64 range for Arrow
            for t in texts
        ),
        dtype=np.int64,
        count=len(texts),
    )
    out = pa.table({"content_hash": hashes, id_col: ids})
    if not preagg:
        return out
    df = out.group_by("content_hash").aggregate([(id_col, "min")])
    return df.rename_columns(["content_hash", id_col])


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Surviving ids after exact-content dedup (min id per distinct
    text). Two-phase: vectorized per-batch pre-aggregation, then a
    grouped min over the tiny (hash, id) stream."""
    pairs = ds.select_columns([text_col, id_col]).map_batches(
        _content_hash_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = pairs.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))
    return agg.select_columns([id_col])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashSignatures:
    """Actor-pool stage: per-doc shingle set -> MinHash signature ->
    exploded (band, key, id) rows. Permutation coefficients are built
    ONCE per actor in ``__init__`` (the T1 stateful-stage slot)."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 1234):
        self.a, self.b = minhash_params(num_perm, seed)
        self.num_bands = num_bands
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        out_band, out_key, out_id = [], [], []
        for text, doc_id in zip(texts, ids):
            sh = shingle_hashes(text or "", self.shingle_n)
            sig = minhash_signature(sh, self.a, self.b)
            for band_i, key in enumerate(band_keys(sig, self.num_bands)):
                out_band.append(band_i)
                out_key.append(key >> 1)  # int64-safe
                out_id.append(doc_id)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "key": pa.array(out_key, type=pa.int64()),
                "doc_id": pa.array(out_id, type=pa.int64()),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one LSH bucket (cap guards a degenerate
    bucket from emitting O(n^2) pairs; capped buckets log via row)."""
    ids = sorted(set(group.column("doc_id").to_pylist()))
    cap = 200  # pairs-per-bucket bound; beyond this the bucket is degenerate
    pairs_a, pairs_b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            pairs_a.append(ids[i])
            pairs_b.append(ids[j])
            if len(pairs_a) >= cap:
                break
        if len(pairs_a) >= cap:
            break
    return pa.table(
        {"id_a": pa.array(pairs_a, type=pa.int64()),
         "id_b": pa.array(pairs_b, type=pa.int64())}
    )


def candidate_pairs_from_buckets(buckets: ray.data.Dataset) -> list[tuple[int, int]]:
    pairs_ds = buckets.groupby(["band", "key"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    seen: set[tuple[int, int]] = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()):
            seen.add((a_, b_))
    return sorted(seen)


def minhash_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 1234,
) -> dict:
    """Full MinHash-LSH near-dup pipeline. Returns
    ``{"survivors": sorted ids, "clusters": {root: members}, "pairs": verified}``.

    The input dataset is consumed twice (signatures, then verify); pass
    a cheap re-readable source. Verification re-computes exact Jaccard
    on only the candidate docs (fetched via a broadcast id-set filter).
    """
    sigs = ds.select_columns([text_col, id_col]).map_batches(
        MinHashSignatures,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, num_bands=num_bands, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col, seed=seed,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
        num_cpus=1,
    )
    cands = candidate_pairs_from_buckets(sigs)
    if not cands:
        all_ids = sorted(
            x for b in ds.select_columns([id_col]).iter_batches(batch_format="pyarrow")
            for x in b.column(id_col).to_pylist()
        )
        return {"survivors": all_ids, "clusters": {}, "pairs": []}

    needed = {i for p in cands for i in p}
    texts = _fetch_texts(ds, needed, text_col, id_col)
    shingles = {i: shingle_hashes(texts.get(i, "") or "", shingle_n) for i in needed}
    verified = [
        (a_, b_)
        for a_, b_ in cands
        if jaccard(shingles[a_], shingles[b_]) >= threshold
    ]
    return _clusters_and_survivors(ds, verified, id_col)


def _fetch_texts(
    ds: ray.data.Dataset, ids: set[int], text_col: str, id_col: str
) -> dict[int, str]:
    """Broadcast-filter fetch of candidate docs (semi-join: the id set is
    small; ship it to every task instead of shuffling the corpus)."""
    id_arr = pa.array(sorted(ids), type=pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col), value_set=id_arr)
        return batch.filter(mask)

    out: dict[int, str] = {}
    picked = ds.select_columns([id_col, text_col]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in picked.iter_batches(batch_format="pyarrow"):
        for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            out[i] = t
    return out


def exact_dedup_drop_ids(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> set[int]:
    """Exact-dup DROP set: for every content-hash group, all ids except
    the minimum. Driver memory is bounded by the duplicate count (the
    inverse of :func:`exact_dedup`, which returns survivors)."""
    pairs = ds.select_columns([text_col, id_col]).map_batches(
        _content_hash_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "preagg": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def non_min(group: pa.Table) -> pa.Table:
        ids = sorted(group.column(id_col).to_pylist())
        return pa.table({id_col: pa.array(ids[1:], pa.int64())})

    dropped = pairs.groupby("content_hash").map_groups(
        non_min, batch_format="pyarrow"
    )
    return {
        int(x)
        for b in dropped.iter_batches(batch_format="pyarrow")
        for x in b.column(id_col).to_pylist()
    }


def filter_survivors(
    ds: ray.data.Dataset, drop: set[int], id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Distributed survivors: broadcast the (dup-rate-bounded) drop set
    and anti-filter the corpus — survivors never materialize on the
    driver. Use this instead of the ``survivors`` list at scale."""
    drop_arr = pa.array(sorted(drop), type=pa.int64())
    ref = ray.put(drop_arr)

    def anti(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=ray.get(ref)))
        return batch.filter(mask)

    return ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


def _clusters_and_survivors(
    ds: ray.data.Dataset, pairs: list[tuple[int, int]], id_col: str
) -> dict:
    uf = UnionFind()
    for a_, b_ in pairs:
        uf.union(a_, b_)
    groups = uf.groups()
    drop = {m for root, members in groups.items() for m in members if m != min(members)}
    all_ids = [
        x for b in ds.select_columns([id_col]).iter_batches(batch_format="pyarrow")
        for x in b.column(id_col).to_pylist()
    ]
    survivors = sorted(x for x in all_ids if x not in drop)
    return {
        "survivors": survivors,
        "drop": drop,  # pass to filter_survivors() for the scale path
        "clusters": {min(v): sorted(v) for v in groups.values()},
        "pairs": pairs,
    }


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashSignatures:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_bands: int = 4):
        self.text_col = text_col
        self.id_col = id_col
        self.num_bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        out_band, out_key, out_id, out_sig = [], [], [], []
        for text, doc_id in zip(texts, ids):
            s = simhash(text or "")
            # two's-complement reinterpret: lossless uint64 -> int64
            s_i64 = s - (1 << 64) if s >= (1 << 63) else s
            for band_i, key in enumerate(simhash_band_keys(s, self.num_bands)):
                out_band.append(band_i)
                out_key.append(key)
                out_id.append(doc_id)
                out_sig.append(s_i64)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "key": pa.array(out_key, type=pa.int64()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "sig": pa.array(out_sig, type=pa.int64()),
            }
        )


def simhash_dedup(
    ds: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """SimHash near-dup: banded candidates, exact Hamming verify.

    Verification happens INSIDE each bucket group (signatures travel
    with the bucket rows), so the driver sees only verified pairs —
    never O(corpus) signatures. Driver memory is bounded by the
    duplicate rate, as with :func:`minhash_dedup`."""
    sigs = ds.select_columns([text_col, id_col]).map_batches(
        SimHashSignatures,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
        num_cpus=1,
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        raw = group.column("sig").to_pylist()
        sig = {
            i: s & ((1 << 64) - 1) for i, s in zip(ids, raw)
        }  # two's-complement back to uint64 semantics
        ms = sorted(set(ids))
        out_a, out_b = [], []
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if hamming64(sig[ms[i]], sig[ms[j]]) <= max_hamming:
                    out_a.append(ms[i])
                    out_b.append(ms[j])
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()),
             "id_b": pa.array(out_b, pa.int64())}
        )

    pairs_ds = sigs.groupby(["band", "key"]).map_groups(
        verify_bucket, batch_format="pyarrow"
    )
    pairs = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        pairs.update(zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()))
    return _clusters_and_survivors(ds, sorted(pairs), id_col)


# ---------------------------------------------------------------------------
# n-gram Jaccard (standalone verify kernel)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    pairs: list[tuple[int, int]],
    *,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[int, int, float]]:
    """Exact word-n-gram Jaccard for explicit candidate pairs."""
    needed = {i for p in pairs for i in p}
    texts = _fetch_texts(ds, needed, text_col, id_col)
    sh = {i: shingle_hashes(texts.get(i, "") or "", shingle_n) for i in needed}
    return [(a_, b_, round(jaccard(sh[a_], sh[b_]), 6)) for a_, b_ in pairs]


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneBuckets:
    """Random-hyperplane LSH over an embedding column: seeded projection
    matrix built once per actor; emits (key, id, vector) bucket rows."""

    def __init__(self, dim: int, num_planes: int = 12, seed: int = 99,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, num_planes))
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in batch.column(self.vec_col).to_pylist()]
        )
        bits = (vecs @ self.planes) > 0
        keys = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        return pa.table(
            {
                "key": pa.array(keys, type=pa.int64()),
                self.id_col: batch.column(self.id_col),
                self.vec_col: batch.column(self.vec_col),
            }
        )


def embedding_dedup(
    ds: ray.data.Dataset,
    *,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Cosine near-dup over embeddings: hyperplane-LSH buckets, exact
    within-bucket cosine verify, union-find clusters. ``num_planes``
    trades recall vs bucket size (the scale knob)."""
    buckets = ds.select_columns([vec_col, id_col]).map_batches(
        HyperplaneBuckets,
        fn_constructor_kwargs=dict(
            dim=dim, num_planes=num_planes, seed=seed,
            vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
        num_cpus=1,
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        vecs = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in group.column(vec_col).to_pylist()]
        )
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sim = unit @ unit.T
        ia, ib = np.where(np.triu(sim >= threshold, k=1))
        return pa.table(
            {
                "id_a": pa.array([min(ids[i], ids[j]) for i, j in zip(ia, ib)], type=pa.int64()),
                "id_b": pa.array([max(ids[i], ids[j]) for i, j in zip(ia, ib)], type=pa.int64()),
            }
        )

    pairs_ds = buckets.groupby("key").map_groups(verify_bucket, batch_format="pyarrow")
    pairs = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        pairs.update(zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()))
    return _clusters_and_survivors(ds, sorted(pairs), id_col)
