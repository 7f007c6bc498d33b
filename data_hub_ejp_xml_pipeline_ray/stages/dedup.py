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
pairs — never documents. The CANDIDATE pair stream is a Dataset end to
end: distributed distinct (:func:`distinct_pairs`), Dataset-native
verify (:func:`verify_pairs_dataset` — two bucketed co-group
exchanges), and distributed clustering (:func:`minlabel_components`:
min-label propagation + pointer doubling, O(log diameter) rounds) —
only when the MEASURED pair count is tiny
(< :data:`PAIR_DRIVER_THRESHOLD`) does the pair list collect
driver-side for the cheap local path. The driver sees only verified
pairs and the converged labels — both bounded by the true duplicate
rate, never the candidate count or the corpus. Survivors stream
through :func:`filter_survivors` (broadcast drop-set anti-filter); the
corpus id universe is never materialized driver-side. Surviving-id
semantics are deterministic: the minimum id in each cluster survives.
Degenerate-bucket pair caps are LOUD (marker rows +
``capped_dropped_pairs`` in every result) — no silent recall loss.
"""
from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from ..functions.hashing import (
    jaccard,
    minhash_band_rows_batch,
    minhash_params,
    popcount64_batch,
    shingle_hashes,
    simhash_batch,
)


def _cap_pool(n: int) -> int:
    """Clamp a fixed actor-pool size to leave CPU headroom for the read
    stage: a pool equal to the session CPU count STARVES the upstream
    read and deadlocks the pipeline (measured in the 4-CPU test
    session). Always leaves 2 CPUs free (1 when the session is tiny)."""
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized() else 8
    )
    return max(1, min(n, cpus - 2 if cpus > 3 else 1))


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
    """Actor-pool stage: whole-batch vectorized MinHash -> exploded
    (band, key, id) rows via :func:`minhash_band_rows_batch` (one
    polars tokenize/shingle/hash pass + chunked ``minimum.reduceat``
    — replaces a per-document Python loop that dominated the pipeline
    wall). Permutation coefficients are built ONCE per actor in
    ``__init__`` (the T1 stateful-stage slot)."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 1234):
        self.a, self.b = minhash_params(num_perm, seed)
        self.num_bands = num_bands
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col
        self.hash_seed = seed & 0xFFFFFFFF

    def __call__(self, batch: pa.Table) -> pa.Table:
        band, key, row_idx = minhash_band_rows_batch(
            batch.column(self.text_col), self.a, self.b,
            self.num_bands, self.shingle_n, hash_seed=self.hash_seed,
        )
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(band, type=pa.int32()),
                "key": pa.array(key, type=pa.int64()),
                "doc_id": pa.array(ids[row_idx], type=pa.int64()),
            }
        )


#: Sentinel id_a value for capped-bucket marker rows: id_b carries the
#: number of DROPPED pairs. Degenerate buckets may not truncate
#: silently (the no-silent-caps rule) — consumers must surface the count.
CAP_MARKER = -1

PAIRS_PER_BUCKET_CAP = 200


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one LSH bucket. A degenerate bucket that
    would emit more than :data:`PAIRS_PER_BUCKET_CAP` pairs is capped,
    and the truncation is LOUD: a marker row (``id_a == CAP_MARKER``,
    ``id_b == dropped-pair count``) rides the pair stream so callers
    can report the recall loss instead of hiding it."""
    ids = sorted(set(group.column("doc_id").to_pylist()))
    n = len(ids)
    total = n * (n - 1) // 2
    pairs_a, pairs_b = [], []
    for i in range(n):
        if len(pairs_a) >= PAIRS_PER_BUCKET_CAP:
            break
        for j in range(i + 1, n):
            pairs_a.append(ids[i])
            pairs_b.append(ids[j])
            if len(pairs_a) >= PAIRS_PER_BUCKET_CAP:
                break
    if total > len(pairs_a):
        pairs_a.append(CAP_MARKER)
        pairs_b.append(total - len(pairs_a) + 1)
    return pa.table(
        {"id_a": pa.array(pairs_a, type=pa.int64()),
         "id_b": pa.array(pairs_b, type=pa.int64())}
    )


def _bucket_pairs_bulk(group: pa.Table) -> pa.Table:
    """Candidate pairs for a HASH-BUCKET of complete (band, key) LSH
    groups — the scale shape of :func:`_bucket_pairs`: grouping by the
    raw composite key costs one Python ``map_groups`` call per LSH
    bucket (docs x bands calls, almost all singletons — the measured
    composite-key explosion); here ONE vectorized kernel per hash
    bucket finds group boundaries with numpy and only the rare
    multi-member groups (bounded by the true collision rate) run the
    pair loop. Cap semantics and the LOUD marker row are identical."""
    t = group
    if "_bucket" in t.column_names:
        t = t.drop_columns(["_bucket"])
    band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
    key = t.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((doc, key, band))
    band, key, doc = band[order], key[order], doc[order]
    dup = np.zeros(len(doc), dtype=bool)
    dup[1:] = (
        (band[1:] == band[:-1]) & (key[1:] == key[:-1]) & (doc[1:] == doc[:-1])
    )
    band, key, doc = band[~dup], key[~dup], doc[~dup]
    new_grp = np.ones(len(doc), dtype=bool)
    new_grp[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new_grp)
    ends = np.append(starts[1:], len(doc))
    sizes = ends - starts
    multi = sizes >= 2
    pairs_a: list[int] = []
    pairs_b: list[int] = []
    for s, e in zip(starts[multi], ends[multi]):
        ids = doc[s:e]
        m = len(ids)
        total = m * (m - 1) // 2
        emitted = 0
        for i in range(m):
            if emitted >= PAIRS_PER_BUCKET_CAP:
                break
            for j in range(i + 1, m):
                pairs_a.append(int(ids[i]))
                pairs_b.append(int(ids[j]))
                emitted += 1
                if emitted >= PAIRS_PER_BUCKET_CAP:
                    break
        if total > emitted:
            pairs_a.append(CAP_MARKER)
            pairs_b.append(total - emitted)
    return pa.table(
        {"id_a": pa.array(pairs_a, type=pa.int64()),
         "id_b": pa.array(pairs_b, type=pa.int64())}
    )


def _hash_bucketed_sigs(sigs: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize a (band, key, ...) signature stream and attach a
    volume-scaled ``_bucket`` hash of the composite LSH key — the
    shared front half of every bucketed pair/verify kernel (minhash
    pair generation, simhash hamming verify). One definition so the
    bucket hash and the rows-per-bucket knob can never diverge
    between the LSH paths."""
    sigs = sigs.materialize()
    nb = max(32, sigs.count() // 500_000)

    def add_bucket(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = t.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (
            (key ^ (band * np.uint64(_PAIR_MULT_A)))
            * np.uint64(_PAIR_MULT_B)
        ) >> np.uint64(32)
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(nb)).astype(np.int32))
        )

    return sigs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )


def _grouped_candidate_pairs(sigs: ray.data.Dataset) -> ray.data.Dataset:
    """(band, key, doc_id) signature stream -> candidate-pair Dataset
    via hash-bucketed co-grouping."""
    return _hash_bucketed_sigs(sigs).groupby("_bucket").map_groups(
        _bucket_pairs_bulk, batch_format="pyarrow"
    )


_PAIR_MULT_A = 0x9E3779B97F4A7C15  # 64-bit golden-ratio multipliers
_PAIR_MULT_B = 0xC2B2AE3D27D4EB4F


def _col_np_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.uint64)


def _pair_bucket(a: pa.ChunkedArray | pa.Array, b: pa.ChunkedArray | pa.Array,
                 num_buckets: int) -> pa.Array:
    """Bucket id for an (id_a, id_b) pair column — numpy uint64
    wraparound hash over BOTH ids, high bits (pyarrow's checked
    multiply raises on large keys; see queries._hash_bucket)."""
    h = (
        _col_np_u64(a) * np.uint64(_PAIR_MULT_A)
        + _col_np_u64(b) * np.uint64(_PAIR_MULT_B)
    ) >> np.uint64(32)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def capped_pair_count(raw_pairs: ray.data.Dataset) -> int:
    """Total candidate pairs dropped by degenerate-bucket capping —
    summed from the CAP_MARKER rows riding the pair stream (0 in
    healthy runs; NEVER silently swallowed)."""
    markers = raw_pairs.map_batches(
        lambda t: t.filter(pc.equal(t.column("id_a"), CAP_MARKER)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return int(markers.sum("id_b") or 0)


def distinct_pairs(
    raw_pairs: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """DISTRIBUTED distinct over a candidate-pair stream (marker rows
    dropped): per-batch local dedup combiner, then a bucketed
    vectorized unique — the pair stream stays a Dataset end-to-end;
    the driver never holds the pair list."""

    def local(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("id_a"), CAP_MARKER))
        t = (
            pl.from_arrow(t).unique(subset=["id_a", "id_b"])
            .to_arrow().cast(_PAIR_SCHEMA)
        )
        return t.append_column(
            "_bk", _pair_bucket(t.column("id_a"), t.column("id_b"), num_buckets)
        )

    def uniq(g: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(g.drop_columns(["_bk"]))
            .unique(subset=["id_a", "id_b"])
            .to_arrow().cast(_PAIR_SCHEMA)
        )

    return (
        raw_pairs.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bk").map_groups(uniq, batch_format="pyarrow")
    )


def candidate_pairs_from_buckets(
    buckets: ray.data.Dataset,
) -> tuple[list[tuple[int, int]], int]:
    """Driver-side convenience wrapper (SMALL inputs only — the scale
    path keeps the pair stream a Dataset via :func:`distinct_pairs`):
    distinct candidate pairs + the capped-pair count."""
    raw = _grouped_candidate_pairs(buckets)
    return _collect_pairs_and_capped(raw)


def _collect_pairs(pairs_ds: ray.data.Dataset) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        out.extend(
            zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist())
        )
    return sorted(out)


def minhash_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    num_bands: int | None = None,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 1234,
    concurrency: int = 4,
) -> dict:
    """Full MinHash-LSH near-dup pipeline. Returns
    ``{"survivors_ds": Dataset of surviving ids, "drop": drop-id set,
    "clusters": {root: members}, "pairs": verified,
    "capped_dropped_pairs": n}``.

    The input dataset is consumed twice (signatures, then verify); pass
    a cheap re-readable source. The CANDIDATE pair stream is a Dataset
    end-to-end (distributed distinct -> verify -> clustering); only
    when the measured pair count is tiny
    (< :data:`PAIR_DRIVER_THRESHOLD`) does it collect driver-side for
    the cheap local verify. The driver never holds an O(candidate-pair)
    structure on the scale path — only verified pairs and cluster
    labels, both bounded by the true duplicate rate.

    ``num_bands=None`` (default) picks the banding from ``threshold``
    so the LSH S-curve midpoint ``(1/b)^(1/r)`` sits safely BELOW the
    verify threshold: b=32/r=2 (midpoint ~0.18) for thresholds under
    0.65, else b=16/r=4 (midpoint ~0.5). With b=16 a J=0.58 pair is
    only an ~86% candidate — recall at mid thresholds was luck of the
    hash draw, not design. Precision is unaffected either way (the
    exact-Jaccard verify runs on every candidate)."""
    if num_bands is None:
        num_bands = 32 if threshold < 0.65 else 16
    sigs = ds.select_columns([text_col, id_col]).map_batches(
        MinHashSignatures,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, num_bands=num_bands, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col, seed=seed,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        # FIXED pool: autoscaling (1, N) pools ramp slowly and cost ~2x
        # wall at small inputs; callers size this to the corpus, capped
        # to leave read headroom (deadlock guard). (A/B'd a plain task
        # pool here after vectorizing the kernel: no win — warm wall
        # 4.5-4.8 s vs 3.7 s with the fixed pool at sf0.1/32 CPUs.)
        concurrency=_cap_pool(concurrency),
        num_cpus=1,
    )
    raw = _grouped_candidate_pairs(sigs).materialize()
    return _near_dup_tail(
        ds, raw, threshold=threshold, shingle_n=shingle_n,
        text_col=text_col, id_col=id_col, trigram_strings=False,
    )


#: Measured-candidate-pair threshold below which the pair list may
#: collect on the driver (a few MB; the local union-find/verify path is
#: then cheapest). At or above it, candidates stay a Dataset end to end
#: — the O(pairs) driver structure the r2 audit flagged never exists.
PAIR_DRIVER_THRESHOLD = 50_000


def _near_dup_tail(
    ds: ray.data.Dataset,
    raw_pairs: ray.data.Dataset,
    *,
    threshold: float,
    shingle_n: int,
    text_col: str,
    id_col: str,
    trigram_strings: bool,
) -> dict:
    """Shared near-dup tail for the Jaccard-verified operators
    (MinHash / prefix-blocked exact): either the driver fast path
    (tiny MEASURED raw pair count — a free metadata read on the
    materialized stream, no extra shuffle) or the fully Dataset-native
    distinct + verify + clustering."""
    n_raw = raw_pairs.count()  # materialized: metadata, no execution
    if n_raw == 0:
        return _dedup_result(ds, [], id_col, 0)
    if n_raw < PAIR_DRIVER_THRESHOLD:
        # single pass: dedup + marker tally in one driver loop (the
        # pair stream is small BY MEASUREMENT, not by hope)
        cands, capped = _collect_pairs_and_capped(raw_pairs)
        if not cands:
            return _dedup_result(ds, [], id_col, capped)
        needed = {i for p in cands for i in p}
        if len(needed) >= DISTRIBUTED_VERIFY_THRESHOLD:
            # texts never reach the driver (pair list already local)
            verified = verify_pairs_distributed(
                ds, cands, threshold=threshold, shingle_n=shingle_n,
                text_col=text_col, id_col=id_col,
                trigram_strings=trigram_strings,
            )
        else:
            texts = _fetch_texts(ds, needed, text_col, id_col)
            if trigram_strings:
                sh: dict = {i: _token_trigram_set(texts.get(i)) for i in needed}
                verified = [
                    (a_, b_) for a_, b_ in cands
                    if len(sh[a_] & sh[b_]) / max(len(sh[a_] | sh[b_]), 1)
                    >= threshold
                ]
            else:
                sh = {
                    i: shingle_hashes(texts.get(i, "") or "", shingle_n)
                    for i in needed
                }
                verified = [
                    (a_, b_) for a_, b_ in cands
                    if jaccard(sh[a_], sh[b_]) >= threshold
                ]
        return _dedup_result(ds, verified, id_col, capped)
    # scale path: the pair stream NEVER collects on the driver
    capped = capped_pair_count(raw_pairs)
    cand_ds = distinct_pairs(raw_pairs).materialize()
    verified_ds = verify_pairs_dataset(
        ds, cand_ds, threshold=threshold, shingle_n=shingle_n,
        text_col=text_col, id_col=id_col, trigram_strings=trigram_strings,
    )
    return _dedup_result_from_ds(ds, verified_ds, id_col, capped)


def _collect_pairs_and_capped(
    raw_pairs: ray.data.Dataset,
) -> tuple[list[tuple[int, int]], int]:
    """One driver pass over a SMALL raw pair stream: distinct pairs +
    capped-marker tally together (the driver fast path's whole cost)."""
    seen: set[tuple[int, int]] = set()
    capped = 0
    for b in raw_pairs.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(
            b.column("id_a").to_pylist(), b.column("id_b").to_pylist()
        ):
            if a_ == CAP_MARKER:
                capped += b_
            else:
                seen.add((a_, b_))
    return sorted(seen), capped


def _shingle_sorted_list(
    text: str | None, shingle_n: int, trigram_strings: bool
) -> list[int]:
    """Per-doc shingle set as a sorted int64 list (the transport form
    both distributed verify paths shuffle). Trigram strings are hashed
    STABLY (blake2b — builtin hash() varies per worker process)."""
    if trigram_strings:
        return sorted(
            int.from_bytes(
                hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
                "little",
            ) >> 2
            for s in _token_trigram_set(text)
        )
    return sorted(
        set((shingle_hashes(text or "", shingle_n) >> np.uint64(2)).tolist())
    )


def verify_pairs_dataset(
    ds: ray.data.Dataset,
    cand_ds: ray.data.Dataset,
    *,
    threshold: float,
    shingle_n: int,
    text_col: str,
    id_col: str,
    trigram_strings: bool = False,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact-Jaccard verification with the candidate-pair stream AS A
    DATASET — nothing pair-sized ever exists on the driver (the r2
    audit's last O(corpus-fraction) driver structure). Two bucketed
    co-group exchanges, each a vectorized polars kernel per bucket:

    1. semi-join by doc id: pair-membership rows (2 per pair) union
       per-doc shingle rows, bucketed by ``hash(doc id)``; an in-bucket
       inner join attaches each member's shingle list. Only docs with
       memberships survive — output is pair-bounded.
    2. judge by pair: bucketed by ``hash(id_a, id_b)``; an in-bucket
       group-by collects both sides and computes Jaccard via polars
       list set kernels. Emits verified ``(id_a, id_b)`` rows.

    The corpus-wide shingle pass is O(corpus) compute/shuffle of
    shingle lists — the price of a true semi-join without a broadcast
    id set (which would be O(candidate docs) in every actor's heap)."""
    sh_type = pa.list_(pa.int64())

    def member_rows(t: pa.Table) -> pa.Table:
        a = t.column("id_a").combine_chunks()
        b = t.column("id_b").combine_chunks()
        node = pa.concat_arrays([a, b])
        out = pa.table(
            {"node": node,
             "p_a": pa.concat_arrays([a, a]),
             "p_b": pa.concat_arrays([b, b]),
             "shingles": pa.nulls(len(node), sh_type)}
        )
        return out.append_column("_bk", _pair_bucket(node, node, num_buckets))

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks()
        lists = [
            _shingle_sorted_list(x, shingle_n, trigram_strings)
            for x in t.column(text_col).to_pylist()
        ]
        out = pa.table(
            {"node": ids,
             "p_a": pa.nulls(len(ids), pa.int64()),
             "p_b": pa.nulls(len(ids), pa.int64()),
             "shingles": pa.array(lists, sh_type)}
        )
        return out.append_column("_bk", _pair_bucket(ids, ids, num_buckets))

    members = cand_ds.map_batches(
        member_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    docs = ds.select_columns([id_col, text_col]).map_batches(
        doc_rows, batch_format="pyarrow", zero_copy_batch=True, num_cpus=1
    )

    def attach(bucket: pa.Table) -> pa.Table:
        df = pl.from_arrow(bucket.drop_columns(["_bk"]))
        mems = df.filter(pl.col("p_a").is_not_null()).select(
            ["node", "p_a", "p_b"]
        )
        dlists = df.filter(pl.col("shingles").is_not_null()).select(
            ["node", "shingles"]
        ).unique(subset=["node"])
        out = mems.join(dlists, on="node", how="inner").select(
            ["p_a", "p_b", "shingles"]
        ).to_arrow().cast(pa.schema([
            ("p_a", pa.int64()), ("p_b", pa.int64()), ("shingles", sh_type),
        ]))
        return out.append_column(
            "_bk2", _pair_bucket(out.column("p_a"), out.column("p_b"),
                                 num_buckets)
        )

    sided = members.union(docs).groupby("_bk").map_groups(
        attach, batch_format="pyarrow"
    )

    def judge(bucket: pa.Table) -> pa.Table:
        df = pl.from_arrow(bucket.drop_columns(["_bk2"]))
        g = (
            df.group_by(["p_a", "p_b"])
            .agg(
                n=pl.len(),
                sh_a=pl.col("shingles").first(),
                sh_b=pl.col("shingles").last(),
            )
            .filter(pl.col("n") == 2)
            .with_columns(
                inter=pl.col("sh_a").list.set_intersection("sh_b").list.len()
                .cast(pl.Float64),
                uni=pl.col("sh_a").list.set_union("sh_b").list.len()
                .cast(pl.Float64),
            )
            .with_columns(
                j=pl.when(pl.col("uni") == 0)
                .then(pl.lit(1.0))
                .otherwise(pl.col("inter") / pl.col("uni"))
            )
            .filter(pl.col("j") >= threshold)
            .select(
                pl.col("p_a").alias("id_a"), pl.col("p_b").alias("id_b")
            )
        )
        return g.to_arrow().cast(_PAIR_SCHEMA)

    return sided.groupby("_bk2").map_groups(judge, batch_format="pyarrow")


def _dedup_result_from_ds(
    ds: ray.data.Dataset,
    verified_ds: ray.data.Dataset,
    id_col: str,
    capped_dropped: int = 0,
) -> dict:
    """Result assembly for the Dataset-native path: verified pairs feed
    :func:`minlabel_components` DIRECTLY as a Dataset; only the
    converged labels (and the verified pairs themselves — both bounded
    by the true duplicate rate, never the candidate count) come back to
    the driver for the drop-set/clusters views."""
    verified_ds = verified_ds.materialize()
    labels = minlabel_components(verified_ds)
    clusters: dict[int, list[int]] = {}
    drop: set[int] = set()
    for b in labels.iter_batches(batch_format="pyarrow"):
        for node, label in zip(
            b.column("node").to_pylist(), b.column("label").to_pylist()
        ):
            clusters.setdefault(label, []).append(node)
            if node != label:
                drop.add(node)
    res = {
        "drop": drop,
        "clusters": {k: sorted(v) for k, v in clusters.items()},
        "pairs": _collect_pairs(verified_ds),
        "capped_dropped_pairs": capped_dropped,
    }
    if capped_dropped:
        print(
            f"[dedup] WARNING: degenerate LSH buckets dropped "
            f"{capped_dropped} candidate pairs (recall loss)",
            flush=True,
        )
    res["survivors_ds"] = filter_survivors(
        ds.select_columns([id_col]), drop, id_col
    )
    return res


#: Candidate-doc threshold for driver-side text fetch during pair
#: verification. Below it the texts are small and `_fetch_texts` is
#: cheapest; above it verification runs DISTRIBUTED (shingle rows
#: shuffle by pair id; the driver holds only the pair list).
DISTRIBUTED_VERIFY_THRESHOLD = 20_000


def verify_pairs_distributed(
    ds: ray.data.Dataset,
    cands: list[tuple[int, int]],
    *,
    threshold: float,
    shingle_n: int,
    text_col: str,
    id_col: str,
    trigram_strings: bool = False,
) -> list[tuple[int, int]]:
    """Exact-Jaccard verification of candidate pairs WITHOUT driver-side
    text materialization: candidate docs are broadcast-filtered, their
    shingle sets computed in tasks and exploded to one row per
    (pair, side), then a groupby(pair) co-group computes Jaccard — only
    candidate docs' SHINGLES shuffle, texts never leave the tasks and
    the driver sees only verified pairs. ``trigram_strings`` selects
    the jaccard_dedup shingle definition (SQL-parity trigrams hashed
    for transport) over the MinHash hash-shingles."""
    if not cands:
        return []
    # doc -> [pair indices] map, broadcast once (pairs are already
    # driver-resident; this adds no new asymptotic driver state)
    by_doc: dict[int, list[int]] = {}
    for pid, (a, b) in enumerate(cands):
        by_doc.setdefault(a, []).append(pid)
        by_doc.setdefault(b, []).append(pid)
    map_ref = ray.put(by_doc)
    id_arr = pa.array(sorted(by_doc), type=pa.int64())

    def shingle_rows(batch: pa.Table) -> pa.Table:
        doc_map = ray.get(map_ref)
        mask = pc.is_in(batch.column(id_col), value_set=id_arr)
        batch = batch.filter(mask)
        out_pid, out_id, out_sh = [], [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            if trigram_strings:
                # STABLE hash (not builtin hash(): PYTHONHASHSEED varies
                # per worker process); collisions are ~2^-61 per pair
                sh = {
                    int.from_bytes(
                        hashlib.blake2b(
                            s.encode("utf-8"), digest_size=8
                        ).digest(), "little",
                    ) >> 2
                    for s in _token_trigram_set(t)
                }
            else:
                # >>2 fits uint64 shingle hashes into int64 transport
                # (collision odds ~2^-62 per pair — immaterial)
                sh = set(
                    (shingle_hashes(t or "", shingle_n) >> np.uint64(2)).tolist()
                )
            sh_list = sorted(sh)
            for pid in doc_map.get(i, ()):
                out_pid.append(pid)
                out_id.append(i)
                out_sh.append(sh_list)
        return pa.table(
            {"pair_id": pa.array(out_pid, pa.int64()),
             "doc_id_": pa.array(out_id, pa.int64()),
             "shingles": pa.array(out_sh, pa.list_(pa.int64()))}
        )

    rows = ds.select_columns([id_col, text_col]).map_batches(
        shingle_rows, batch_format="pyarrow", zero_copy_batch=True,
        num_cpus=1,
    )

    def verify_group(group: pa.Table) -> pa.Table:
        if group.num_rows != 2:
            return pa.table({"pair_id": pa.array([], pa.int64())})
        a = set(group.column("shingles")[0].as_py())
        b = set(group.column("shingles")[1].as_py())
        union = a | b
        j = (len(a & b) / len(union)) if union else 1.0
        if j >= threshold:
            return pa.table(
                {"pair_id": group.column("pair_id").slice(0, 1)}
            )
        return pa.table({"pair_id": pa.array([], pa.int64())})

    ok = rows.groupby("pair_id").map_groups(verify_group, batch_format="pyarrow")
    verified_ids = sorted(
        x for b in ok.iter_batches(batch_format="pyarrow")
        for x in b.column("pair_id").to_pylist()
    )
    return [cands[pid] for pid in verified_ids]


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
    import polars as pl

    pairs = ds.select_columns([text_col, id_col]).map_batches(
        _content_hash_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "preagg": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def non_min_bucket(group: pa.Table) -> pa.Table:
        # whole hash-bucket per call (vectorized grouped-min filter),
        # not one Python call per content hash
        df = pl.from_arrow(group)
        out = df.filter(
            pl.col(id_col) != pl.col(id_col).min().over("content_hash")
        )
        return pa.table(
            {id_col: out.get_column(id_col).to_arrow().cast(pa.int64())}
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t.column("content_hash"), 63), pa.int32()
        )
        return t.append_column("_bucket", b)

    dropped = pairs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("_bucket").map_groups(
        lambda g: non_min_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
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


def minlabel_components(
    pairs_ds: ray.data.Dataset, *, max_iters: int = 30, num_partitions: int = 8
) -> ray.data.Dataset:
    """Distributed connected components over a pair Dataset
    (``id_a``/``id_b`` columns) by iterated min-label propagation:
    every node repeatedly adopts the minimum label among itself and its
    neighbors (one ``join`` + ``groupby``-min per round), converging in
    O(component diameter) rounds — near-dup clusters are shallow, so
    this is a handful of small shuffles over PAIR rows only; documents
    and the id universe never participate.

    Returns a Dataset of ``(node, label)`` where ``label`` is the
    component minimum. Only pair participants appear (singletons are
    their own component implicitly). Convergence is detected by the
    monotonically decreasing label sum (labels only ever decrease).

    Implementation note: the per-round neighbor lookup is a tagged
    union + ``groupby(key).map_groups`` CO-GROUP, not ``Dataset.join``
    — Ray 2.49's hash-join aggregator builds a schema-less empty table
    for a partition that received no shards on one side and then
    rejects the join (and its aggregator actors can deadlock against
    live actor pools), while groupby only visits populated groups."""
    from ray.data.aggregate import Sum as _Sum

    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])

    def sym(batch: pa.Table) -> pa.Table:
        a, b = batch.column("id_a"), batch.column("id_b")
        return pa.table(
            {"src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
             "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])}
        )

    edges = pairs_ds.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # reused every round: materialize ONCE (pair-sized)
    if edges.count() == 0:
        return ray.data.from_arrow(label_schema.empty_table())

    def with_self(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return label_schema.empty_table()
        lab = pc.min_element_wise(batch.column("src"), batch.column("min_dst"))
        return pa.table({"node": batch.column("src"), "label": lab})

    labels = (
        edges.groupby("src").aggregate(Min("dst", alias_name="min_dst"))
        .map_batches(with_self, batch_format="pyarrow")
        .materialize()
    )
    # tagged edge rows reused every round: key = src; dst rides along.
    tagged_edges = edges.map_batches(
        lambda t: pa.table(
            {"node": t.column("src"), "dst": t.column("dst"),
             "label": pa.nulls(t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    def push(group: pa.Table) -> pa.Table:
        """Co-group on node: adopt the group's label and push it to every
        neighbor; also re-emit the node's own label (self-retention)."""
        lab = pc.min(group.column("label")).as_py()
        if lab is None:
            return label_schema.empty_table()  # node with no label row yet
        dsts = group.column("dst").drop_null()
        n = len(dsts)
        out_node = pa.concat_arrays(
            [dsts.combine_chunks(), group.column("node").slice(0, 1).combine_chunks()]
        )
        return pa.table(
            {"node": out_node,
             "label": pa.array([lab] * (n + 1), pa.int64())}
        )

    def shortcut(lab_ds: ray.data.Dataset) -> ray.data.Dataset:
        """Pointer doubling (label-of-label): every node adopts
        ``label(label(node))`` via one tagged-union co-group keyed by
        the label. Combined with one propagation step per round, the
        component minimum reaches every node in O(log diameter) rounds
        — a pure-propagation loop needs O(diameter) and would return
        WRONG labels for duplicate chains longer than ``max_iters``."""
        requests = lab_ds.map_batches(
            lambda t: pa.table(
                {"key": t.column("label"), "node": t.column("node"),
                 "old": t.column("label"),
                 "lab": pa.nulls(t.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
        )
        own = lab_ds.map_batches(
            lambda t: pa.table(
                {"key": t.column("node"),
                 "node": pa.nulls(t.num_rows, pa.int64()),
                 "old": pa.nulls(t.num_rows, pa.int64()),
                 "lab": t.column("label")}
            ),
            batch_format="pyarrow",
        )

        def resolve(group: pa.Table) -> pa.Table:
            reqs = group.filter(pc.is_valid(group.column("node")))
            if reqs.num_rows == 0:
                return label_schema.empty_table()
            lab = pc.min(group.column("lab")).as_py()
            if lab is None:  # label points at a node with no own row
                return pa.table(
                    {"node": reqs.column("node"), "label": reqs.column("old")}
                )
            lab_arr = pa.array([lab] * reqs.num_rows, pa.int64())
            return pa.table(
                {"node": reqs.column("node"),
                 "label": pc.min_element_wise(reqs.column("old"), lab_arr)}
            )

        return requests.union(own).groupby("key").map_groups(
            resolve, batch_format="pyarrow"
        )

    prev_sum = labels.aggregate(_Sum("label", alias_name="s"))["s"]
    converged = False
    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"),
                 "dst": pa.nulls(t.num_rows, pa.int64()),
                 "label": t.column("label")}
            ),
            batch_format="pyarrow",
        )
        cand = tagged_edges.union(tagged_labels).groupby("node").map_groups(
            push, batch_format="pyarrow"
        )
        merged = (
            cand.groupby("node").aggregate(Min("label", alias_name="label"))
            .map_batches(
                lambda t: (
                    label_schema.empty_table()
                    if t.num_rows == 0 or "node" not in t.column_names
                    else t.select(["node", "label"])
                ),
                batch_format="pyarrow",
            )
        )
        merged = shortcut(merged).materialize()
        new_sum = merged.aggregate(_Sum("label", alias_name="s"))["s"]
        labels = merged
        if new_sum == prev_sum:  # labels only decrease: fixpoint reached
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # loud failure beats silently-wrong clusters (no-silent-caps rule);
        # with pointer doubling this needs diameter > 2^max_iters
        raise RuntimeError(
            f"minlabel_components did not converge in {max_iters} rounds"
        )
    return labels


#: Pair-count threshold for in-process cluster resolution. Below it the
#: pair graph is trivially small (it is ALREADY driver-resident — the
#: verify step produced it) and a local union-find costs microseconds;
#: above it, resolution runs distributed via
#: :func:`minlabel_components`. Note the input is PAIRS (bounded by the
#: duplicate rate), never corpus ids — the O(corpus) driver structure
#: the r1 audit flagged is gone on both branches.
DISTRIBUTED_RESOLVE_THRESHOLD = 100_000


def resolve_clusters(
    pairs: list[tuple[int, int]], *, force_distributed: bool = False
) -> dict:
    """Cluster resolution for a verified pair list: connected
    components + per-component min. Small pair sets resolve in-process
    (a union-find over a list the driver is already holding);
    web-scale dup rates cross :data:`DISTRIBUTED_RESOLVE_THRESHOLD` and
    switch to :func:`minlabel_components` — only the converged
    ``(node, label)`` rows (pair-participant-bounded) return."""
    if not pairs:
        return {"drop": set(), "clusters": {}, "pairs": []}
    if len(pairs) < DISTRIBUTED_RESOLVE_THRESHOLD and not force_distributed:
        from ..functions.hashing import UnionFind

        uf = UnionFind()
        for a_, b_ in pairs:
            uf.union(a_, b_)
        groups = uf.groups()
        clusters = {min(v): sorted(v) for v in groups.values()}
        drop = {m for ms in clusters.values() for m in ms if m != min(ms)}
        return {"drop": drop, "clusters": clusters, "pairs": pairs}
    pairs_ds = ray.data.from_arrow(
        pa.table(
            {"id_a": pa.array([a for a, _ in pairs], pa.int64()),
             "id_b": pa.array([b for _, b in pairs], pa.int64())}
        )
    )
    labels = minlabel_components(pairs_ds)
    clusters: dict[int, list[int]] = {}
    drop: set[int] = set()
    for b in labels.iter_batches(batch_format="pyarrow"):
        for node, label in zip(
            b.column("node").to_pylist(), b.column("label").to_pylist()
        ):
            clusters.setdefault(label, []).append(node)
            if node != label:
                drop.add(node)
    return {
        "drop": drop,  # pass to filter_survivors() — the scale path
        "clusters": {k: sorted(v) for k, v in clusters.items()},
        "pairs": pairs,
    }


def _dedup_result(
    ds: ray.data.Dataset, pairs: list[tuple[int, int]], id_col: str,
    capped_dropped: int = 0,
) -> dict:
    """Shared result shape for the near-dup operators: distributed
    cluster resolution, drop set (duplicate-rate-bounded), and the
    SURVIVORS AS A DATASET (``filter_survivors`` anti-filter) — the
    corpus id universe is never materialized on the driver."""
    res = resolve_clusters(pairs)
    res["capped_dropped_pairs"] = capped_dropped
    if capped_dropped:
        print(
            f"[dedup] WARNING: degenerate LSH buckets dropped "
            f"{capped_dropped} candidate pairs (recall loss)",
            flush=True,
        )
    res["survivors_ds"] = filter_survivors(
        ds.select_columns([id_col]), res["drop"], id_col
    )
    return res


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

#: Below this many members an all-pairs popcount-matrix compare is
#: cheaper than another refinement level.
_HAMMING_LEAF = 96
#: Identical-signature runs / proven cliques up to this size emit every
#: pair (keeps ``result["pairs"]`` complete on small data); beyond it a
#: connectivity CHAIN is emitted instead — union-find sees the same
#: components, and a web-scale 1M-identical-doc cluster must not emit
#: 5e11 pairs.
_CLIQUE_EMIT_BOUND = 64
#: Per-(band, key)-group comparison budget before the LOUD cap fires.
#: With exact pigeonhole refinement, hitting this is pathological.
_SIMHASH_GROUP_BUDGET = 2_000_000


def _emit_clique(ids: np.ndarray, out_a: list, out_b: list) -> None:
    """Every member is a mutual TRUE pair (Hamming bound proven by
    construction). Small cliques emit all pairs; big cliques emit a
    chain — identical connected components, O(n) instead of O(n^2)."""
    ids = np.sort(ids)
    n = ids.size
    if n <= _CLIQUE_EMIT_BOUND:
        ia, ib = np.triu_indices(n, k=1)
        out_a.extend(ids[ia].tolist())
        out_b.extend(ids[ib].tolist())
    else:
        out_a.extend(ids[:-1].tolist())
        out_b.extend(ids[1:].tolist())


def _refine_hamming_pairs(
    ids: np.ndarray,
    vals: np.ndarray,
    width: int,
    max_h: int,
    out_a: list,
    out_b: list,
    state: dict,
) -> None:
    """EXACT Hamming<=``max_h`` pairs within a group already equal on
    every bit OUTSIDE the low ``width`` bits of ``vals`` — recursive
    pigeonhole refinement (multi-index Hamming search, Norouzi et al.,
    CVPR 2012): a pair with <= max_h differing bits spread over
    ``max_h + 1`` chunks must match at least one chunk EXACTLY, so
    refining on each chunk and recursing with the matched chunk
    compacted away loses no pair. Identical values collapse to
    cliques/chains first (also prevents fanout blowup on giant
    identical-signature clusters); small groups brute-force through one
    vectorized popcount matrix. ``state`` carries the comparison budget
    and the dropped count for the LOUD cap contract — a pair emitted
    from two chunks is deduped by the caller."""
    n = ids.size
    if n < 2:
        return
    order = np.argsort(vals, kind="stable")
    vals = vals[order]
    ids = ids[order]
    newv = np.ones(n, dtype=bool)
    newv[1:] = vals[1:] != vals[:-1]
    if not newv.all():
        starts = np.flatnonzero(newv)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            if e - s >= 2:
                _emit_clique(ids[s:e], out_a, out_b)
        ids = ids[newv]
        vals = vals[newv]
        n = ids.size
        if n < 2:
            return
    if width <= max_h:
        # distinct values over <= max_h free bits: every pair matches
        _emit_clique(ids, out_a, out_b)
        return
    total = n * (n - 1) // 2
    if n <= _HAMMING_LEAF:
        if total > state["budget"]:
            state["dropped"] += total
            return
        state["budget"] -= total
        x = (vals[:, None] ^ vals[None, :]).reshape(-1)
        pcnt = popcount64_batch(x).reshape(n, n)
        ia, ib = np.nonzero(np.triu(pcnt <= max_h, k=1))
        a = ids[ia]
        b = ids[ib]
        out_a.extend(np.minimum(a, b).tolist())
        out_b.extend(np.maximum(a, b).tolist())
        return
    k = max_h + 1
    base, extra = divmod(width, k)
    shift = 0
    for c in range(k):
        cw = base + (1 if c < extra else 0)
        if cw == 0:
            continue
        if state["budget"] < n:
            state["dropped"] += total
            return
        state["budget"] -= n
        keyc = (vals >> np.uint64(shift)) & np.uint64((1 << cw) - 1)
        sub = np.argsort(keyc, kind="stable")
        kv = keyc[sub]
        ngrp = np.ones(n, dtype=bool)
        ngrp[1:] = kv[1:] != kv[:-1]
        sstarts = np.flatnonzero(ngrp)
        sends = np.append(sstarts[1:], n)
        for s, e in zip(sstarts, sends):
            if e - s < 2:
                continue
            sel = sub[s:e]
            v = vals[sel]
            low = v & np.uint64((1 << shift) - 1)
            high = (v >> np.uint64(shift + cw)) << np.uint64(shift)
            _refine_hamming_pairs(
                ids[sel], low | high, width - cw, max_h, out_a, out_b, state
            )
        shift += cw


def simhash_verify_table(
    t: pa.Table, *, max_hamming: int, num_bands: int,
    id_col: str = "doc_id", budget: int | None = None,
) -> pa.Table:
    """Hamming-verify every (band, key) group of one HASH BUCKET of
    band rows (columns band/key/<id_col>/sig) — the shared verify
    kernel of :func:`simhash_dedup` and the incrementally-maintained
    simhash index (``pipelines/dedup_index.py``): numpy group
    boundaries, each multi-member group runs the exact pigeonhole
    kernel on the free bits. Returns (id_a, id_b) verified pairs plus
    LOUD CAP_MARKER rows if the work budget ever trips."""
    band_width = 64 // num_bands
    if "_bucket" in t.column_names:
        t = t.drop_columns(["_bucket"])
    band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
    key = t.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
    doc = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    sig = t.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((doc, key, band))
    band, key, doc, sig = band[order], key[order], doc[order], sig[order]
    dup = np.zeros(len(doc), dtype=bool)
    dup[1:] = (
        (band[1:] == band[:-1]) & (key[1:] == key[:-1])
        & (doc[1:] == doc[:-1])
    )
    band, key, doc, sig = band[~dup], key[~dup], doc[~dup], sig[~dup]
    new_grp = np.ones(len(doc), dtype=bool)
    new_grp[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new_grp)
    ends = np.append(starts[1:], len(doc))
    multi = (ends - starts) >= 2
    out_a: list[int] = []
    out_b: list[int] = []
    for s, e in zip(starts[multi], ends[multi]):
        ids, sg = doc[s:e], sig[s:e]
        # compact the matched band chunk away: recurse on free bits
        sh = int(band[s]) * band_width
        if sh + band_width >= 64:
            vals = sg & np.uint64((1 << sh) - 1)
        else:
            vals = (sg & np.uint64((1 << sh) - 1)) | (
                (sg >> np.uint64(sh + band_width)) << np.uint64(sh)
            )
        state = {
            "budget": _SIMHASH_GROUP_BUDGET if budget is None else budget,
            "dropped": 0,
        }
        _refine_hamming_pairs(
            ids, vals, 64 - band_width, max_hamming, out_a, out_b, state
        )
        if state["dropped"]:  # budget backstop: LOUD marker
            out_a.append(CAP_MARKER)
            out_b.append(state["dropped"])
    a = np.asarray(out_a, dtype=np.int64)
    b = np.asarray(out_b, dtype=np.int64)
    mark = a == CAP_MARKER
    if a.size and not mark.all():
        # a pair can arrive from two pigeonhole chunks: dedupe here
        uniq = np.unique(np.stack([a[~mark], b[~mark]], axis=1), axis=0)
        a = np.concatenate([uniq[:, 0], a[mark]])
        b = np.concatenate([uniq[:, 1], b[mark]])
    return pa.table(
        {"id_a": pa.array(a, pa.int64()),
         "id_b": pa.array(b, pa.int64())}
    )


def simhash_band_table(
    texts: pa.Array | pa.ChunkedArray, ids: np.ndarray, *, num_bands: int = 4
) -> pa.Table:
    """(band, key, sig) rows for a batch of texts with caller-supplied
    int64 ids — the stateless core of :class:`SimHashSignatures`,
    shared with the incremental simhash index (which carries urls and
    dictionary-encodes them to ids per bucket)."""
    sigs = simhash_batch(texts)
    nb = num_bands
    width = 64 // nb
    mask = np.uint64((1 << width) - 1)
    shifts = np.arange(nb, dtype=np.uint64) * np.uint64(width)
    keys = ((sigs[:, None] >> shifts[None, :]) & mask) | (
        np.arange(nb, dtype=np.uint64)[None, :] << np.uint64(width)
    )
    n = len(sigs)
    return pa.table(
        {
            "band": pa.array(
                np.tile(np.arange(nb, dtype=np.int32), n), type=pa.int32()
            ),
            "key": pa.array(keys.reshape(-1).astype(np.int64), type=pa.int64()),
            "row_idx": pa.array(
                ids[np.repeat(np.arange(n), nb)], type=pa.int64()
            ),
            # two's-complement reinterpret: lossless uint64 -> int64
            "sig": pa.array(np.repeat(sigs.view(np.int64), nb), type=pa.int64()),
        }
    )


class SimHashSignatures:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_bands: int = 4):
        self.text_col = text_col
        self.id_col = id_col
        self.num_bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        # whole-batch vectorized kernel, BIT-EXACT with scalar simhash()
        # (each distinct token blake2b-hashed once per batch); key
        # layout matches simhash_band_keys: chunk | (band << width)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        t = simhash_band_table(
            batch.column(self.text_col), ids, num_bands=self.num_bands
        )
        return t.rename_columns(["band", "key", "doc_id", "sig"])


def simhash_dedup(
    ds: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
    num_bands: int = 4,
) -> dict:
    """SimHash near-dup: banded candidates, exact Hamming verify.

    Verification happens INSIDE each bucket group (signatures travel
    with the bucket rows), so the driver sees only verified pairs —
    never O(corpus) signatures. Driver memory is bounded by the
    duplicate rate, as with :func:`minhash_dedup`. Degenerate band
    buckets (crowded 16-bit chunks are common on homogeneous webtext —
    measured 246k capped pairs at sf0.1 before this kernel) are
    verified EXACTLY via :func:`_refine_hamming_pairs` pigeonhole
    refinement instead of a truncated O(n^2) scan; the LOUD cap
    contract remains as a budget backstop."""
    sigs = ds.select_columns([text_col, id_col]).map_batches(
        SimHashSignatures,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_bands=num_bands
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_cap_pool(concurrency),
        num_cpus=1,
    )
    # the closure pickles BY VALUE (budget global captured at submit
    # time), so tests can shrink the budget via monkeypatch
    budget = _SIMHASH_GROUP_BUDGET

    def verify_bulk(group: pa.Table) -> pa.Table:
        return simhash_verify_table(
            group, max_hamming=max_hamming, num_bands=num_bands,
            budget=budget,
        )

    raw = _hash_bucketed_sigs(sigs).groupby("_bucket").map_groups(
        verify_bulk, batch_format="pyarrow"
    ).materialize()
    return _preverified_tail(ds, raw, id_col)


def _preverified_tail(
    ds: ray.data.Dataset, raw_pairs: ray.data.Dataset, id_col: str
) -> dict:
    """Shared tail for operators whose in-bucket verify already proved
    the pairs (SimHash Hamming / embedding cosine): driver union-find
    below :data:`PAIR_DRIVER_THRESHOLD` (one pass, measured-small),
    distributed distinct + clustering above it."""
    n_raw = raw_pairs.count()  # materialized: metadata, no execution
    if n_raw == 0:
        return _dedup_result(ds, [], id_col, 0)
    if n_raw < PAIR_DRIVER_THRESHOLD:
        pairs, capped = _collect_pairs_and_capped(raw_pairs)
        return _dedup_result(ds, pairs, id_col, capped)
    capped = capped_pair_count(raw_pairs)
    cand_ds = distinct_pairs(raw_pairs).materialize()
    return _dedup_result_from_ds(ds, cand_ds, id_col, capped)


# ---------------------------------------------------------------------------
# n-gram Jaccard (standalone verify kernel)
# ---------------------------------------------------------------------------

def _token_trigram_set(text: str | None) -> set[str]:
    """Word-trigram shingle set with EXACT SQL parity (see the
    ``jaccard_dedup_docs`` oracle): tokens are ``[A-Za-z0-9]+`` runs;
    fewer than 3 tokens collapse to one whole-text shingle."""
    import re as _re

    toks = _re.findall(r"[A-Za-z0-9]+", text or "")
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


def jaccard_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    block_prefix_len: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Exact n-gram-Jaccard near-dup dedup with DETERMINISTIC prefix
    blocking (candidates = docs sharing their first
    ``block_prefix_len`` characters) — every stage is SQL-expressible,
    so unlike the MinHash/SimHash family this operator is fully
    oracle-checkable (prefix self-join + trigram Jaccard + recursive-CTE
    transitive closure). Blocking recall is limited to shared-prefix
    duplicates by construction (the near-dup corpus this targets:
    crawl re-fetches whose edits occur mid-document).

    Scale shape: only ``(block_key, id)`` rows shuffle; candidate texts
    are fetched by broadcast id-set filter; clusters resolve via the
    distributed :func:`minlabel_components`; survivors stream through
    :func:`filter_survivors`."""

    def block_rows(batch: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            batch.column(text_col), start=0, stop=block_prefix_len
        )
        return pa.table({"key_s": key, id_col: batch.column(id_col)})

    blocks = ds.select_columns([text_col, id_col]).map_batches(
        block_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def block_pairs(group: pa.Table) -> pa.Table:
        g = pa.table({"doc_id": group.column(id_col)})
        return _bucket_pairs(g)

    raw = blocks.groupby("key_s").map_groups(
        block_pairs, batch_format="pyarrow"
    ).materialize()
    return _near_dup_tail(
        ds, raw, threshold=threshold, shingle_n=3,
        text_col=text_col, id_col=id_col, trigram_strings=True,
    )


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
        from .ann import _as_matrix

        vecs = _as_matrix(batch.column(self.vec_col))  # zero-copy reshape
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
    concurrency: int = 4,
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
        concurrency=_cap_pool(concurrency),
        num_cpus=1,
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        from .ann import _as_matrix

        ids = np.asarray(group.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _as_matrix(group.column(vec_col))
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        n = len(ids)
        total = n * (n - 1) // 2
        # Chunked n^2: a degenerate bucket never allocates the full
        # similarity matrix (chunk memory <= ~cap floats + one row of
        # n), and truncation is LOUD — same CAP_MARKER contract as the
        # MinHash/SimHash buckets.
        cap = EMBED_COMPARISONS_PER_BUCKET_CAP
        chunk = max(1, min(256, cap // max(n, 1) + 1))
        out_a, out_b = [], []
        checked = 0
        for start in range(0, n, chunk):
            if checked >= cap:
                break
            end = min(start + chunk, n)
            sim = unit[start:end] @ unit.T  # (chunk, n)
            li, gj = np.where(sim >= threshold)
            keep = gj > (li + start)  # upper triangle only
            for i, j in zip(li[keep] + start, gj[keep]):
                out_a.append(min(ids[i], ids[j]))
                out_b.append(max(ids[i], ids[j]))
            checked += sum(n - 1 - i for i in range(start, end))
        if total > checked:
            out_a.append(CAP_MARKER)
            out_b.append(total - checked)
        return pa.table(
            {"id_a": pa.array(out_a, type=pa.int64()),
             "id_b": pa.array(out_b, type=pa.int64())}
        )

    raw = buckets.groupby("key").map_groups(
        verify_bucket, batch_format="pyarrow"
    ).materialize()
    return _preverified_tail(ds, raw, id_col)


#: In-bucket comparison cap for the embedding cosine verify. Larger
#: than PAIRS_PER_BUCKET_CAP because the kernel is a vectorized matmul
#: (comparisons are cheap); the cap bounds MEMORY (chunk rows scale as
#: cap // bucket_size) and is reported via CAP_MARKER rows, never
#: silently.
EMBED_COMPARISONS_PER_BUCKET_CAP = 100_000
