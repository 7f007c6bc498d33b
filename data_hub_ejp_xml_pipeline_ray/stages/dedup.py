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
pairs — never documents. Cluster resolution is DISTRIBUTED
(:func:`minlabel_components`: iterated min-label propagation over the
pair graph via join + groupby-min, converging in O(diameter) rounds);
the driver sees only verified pairs and the converged labels — both
bounded by the duplicate rate, never O(corpus). Survivors stream
through :func:`filter_survivors` (broadcast drop-set anti-filter); the
corpus id universe is never materialized driver-side. Surviving-id
semantics are deterministic: the minimum id in each cluster survives.
Degenerate-bucket pair caps are LOUD (marker rows +
``capped_dropped_pairs`` in every result) — no silent recall loss.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from ..functions.hashing import (
    band_keys,
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash,
    simhash_band_keys,
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


def candidate_pairs_from_buckets(
    buckets: ray.data.Dataset,
) -> tuple[list[tuple[int, int]], int]:
    """Distinct candidate pairs + the total number of pairs dropped by
    degenerate-bucket capping (0 in healthy runs; NEVER silently
    swallowed — callers propagate it in their result)."""
    pairs_ds = buckets.groupby(["band", "key"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    seen: set[tuple[int, int]] = set()
    capped_dropped = 0
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()):
            if a_ == CAP_MARKER:
                capped_dropped += b_
            else:
                seen.add((a_, b_))
    return sorted(seen), capped_dropped


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
    concurrency: int = 4,
) -> dict:
    """Full MinHash-LSH near-dup pipeline. Returns
    ``{"survivors_ds": Dataset of surviving ids, "drop": drop-id set,
    "clusters": {root: members}, "pairs": verified,
    "capped_dropped_pairs": n}``.

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
        # FIXED pool: autoscaling (1, N) pools ramp slowly and cost ~2x
        # wall at small inputs; callers size this to the corpus, capped
        # to leave read headroom (deadlock guard)
        concurrency=_cap_pool(concurrency),
        num_cpus=1,
    )
    cands, capped = candidate_pairs_from_buckets(sigs)
    if not cands:
        return _dedup_result(ds, [], id_col, capped)

    needed = {i for p in cands for i in p}
    if len(needed) >= DISTRIBUTED_VERIFY_THRESHOLD:
        # web-scale dup rates: texts never reach the driver
        verified = verify_pairs_distributed(
            ds, cands, threshold=threshold, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col,
        )
    else:
        texts = _fetch_texts(ds, needed, text_col, id_col)
        shingles = {
            i: shingle_hashes(texts.get(i, "") or "", shingle_n) for i in needed
        }
        verified = [
            (a_, b_)
            for a_, b_ in cands
            if jaccard(shingles[a_], shingles[b_]) >= threshold
        ]
    return _dedup_result(ds, verified, id_col, capped)


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

    prev_sum = labels.aggregate(_Sum("label", alias_name="s"))["s"]
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
            .materialize()
        )
        new_sum = merged.aggregate(_Sum("label", alias_name="s"))["s"]
        labels = merged
        if new_sum == prev_sum:  # labels only decrease: fixpoint reached
            break
        prev_sum = new_sum
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
    concurrency: int = 4,
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
        concurrency=_cap_pool(concurrency),
        num_cpus=1,
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        raw = group.column("sig").to_pylist()
        sig = {
            i: s & ((1 << 64) - 1) for i, s in zip(ids, raw)
        }  # two's-complement back to uint64 semantics
        ms = sorted(set(ids))
        n = len(ms)
        total = n * (n - 1) // 2
        out_a, out_b = [], []
        checked = 0
        for i in range(n):
            if checked >= PAIRS_PER_BUCKET_CAP:
                break
            for j in range(i + 1, n):
                checked += 1
                if hamming64(sig[ms[i]], sig[ms[j]]) <= max_hamming:
                    out_a.append(ms[i])
                    out_b.append(ms[j])
                if checked >= PAIRS_PER_BUCKET_CAP:
                    break
        if total > checked:  # degenerate bucket: LOUD truncation marker
            out_a.append(CAP_MARKER)
            out_b.append(total - checked)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()),
             "id_b": pa.array(out_b, pa.int64())}
        )

    pairs_ds = sigs.groupby(["band", "key"]).map_groups(
        verify_bucket, batch_format="pyarrow"
    )
    pairs = set()
    capped = 0
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()):
            if a_ == CAP_MARKER:
                capped += b_
            else:
                pairs.add((a_, b_))
    return _dedup_result(ds, sorted(pairs), id_col, capped)


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

    pairs_ds = blocks.groupby("key_s").map_groups(block_pairs, batch_format="pyarrow")
    cands: set[tuple[int, int]] = set()
    capped = 0
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()):
            if a_ == CAP_MARKER:
                capped += b_
            else:
                cands.add((a_, b_))
    if not cands:
        return _dedup_result(ds, [], id_col, capped)
    needed = {i for p in cands for i in p}
    if len(needed) >= DISTRIBUTED_VERIFY_THRESHOLD:
        verified = verify_pairs_distributed(
            ds, sorted(cands), threshold=threshold, shingle_n=3,
            text_col=text_col, id_col=id_col, trigram_strings=True,
        )
    else:
        texts = _fetch_texts(ds, needed, text_col, id_col)
        tri = {i: _token_trigram_set(texts.get(i)) for i in needed}
        verified = [
            (a_, b_) for a_, b_ in sorted(cands)
            if len(tri[a_] & tri[b_]) / len(tri[a_] | tri[b_]) >= threshold
        ]
    return _dedup_result(ds, verified, id_col, capped)


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

        ids = group.column(id_col).to_pylist()
        vecs = _as_matrix(group.column(vec_col))
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
    return _dedup_result(ds, sorted(pairs), id_col)
