"""Approximate-nearest-neighbor search over an embedding column.

* :func:`brute_force_topk` — the exactness baseline: the (small) query
  matrix is broadcast once via ``ray.put``; every batch does one numpy
  matmul against it and emits per-batch partial top-k rows; a final
  grouped reduce keeps the global top-k per query. Only
  O(num_queries * k) rows per batch leave the tasks — the corpus never
  moves.
* :func:`ivf_topk` — in-flight IVF: a seeded k-means (driver-side, on
  a bounded sample) builds a coarse quantizer; batches assign rows and
  score only probed lists. Saves FLOPs but still SCANS the corpus.
* :func:`build_ivf_index` / :func:`ivf_index_search` — the real scale
  path: a write-once pass persists the corpus as centroid-partitioned
  parquet (one inverted list per directory); a search reads ONLY the
  ``nprobe`` probed lists, so IO ~ nprobe/n_clusters of the corpus
  (asserted < 50% in tests). Recall is tested against brute force.

Deterministic ordering contract: neighbors rank by (cosine DESC,
vec_id ASC); similarities are rounded to 6 decimals BEFORE ranking so
the SQL oracle (DuckDB ``list_cosine_similarity``) agrees bit-for-bit
on rank boundaries.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _cap_pool(n: int) -> int:
    """Clamp a fixed actor-pool size to leave read-stage CPU headroom
    (a pool == session CPUs starves the read and deadlocks)."""
    cpus = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized() else 8
    )
    return max(1, min(n, cpus - 2 if cpus > 3 else 1))


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Embedding column -> (n, dim) float64 matrix. Zero-copy fast
    path: a null-free ``list``/``fixed_size_list`` column's values
    buffer is reshaped directly (one vectorized float32->float64
    widening, no Python-object round-trip); ragged/null columns fall
    back to the row-wise path."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if col.null_count == 0 and pa.types.is_fixed_size_list(t):
        dim = t.list_size
        vals = col.values.to_numpy(zero_copy_only=False)
        vals = vals[col.offset * dim : (col.offset + len(col)) * dim]
        return vals.reshape(len(col), dim).astype(np.float64, copy=False)
    if col.null_count == 0 and (
        pa.types.is_list(t) or pa.types.is_large_list(t)
    ):
        lens = pc.unique(pc.list_value_length(col))
        if len(lens) == 1:
            dim = lens[0].as_py()
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return vals.reshape(len(col), dim).astype(np.float64, copy=False)
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


def _unit_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _round6_half_away(x: np.ndarray) -> np.ndarray:
    """round(x*1e6)/1e6 with half-away-from-zero ties (np.round is
    half-to-even; the SQL oracle's round() is half-away)."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


class _PartialTopK:
    """Per-batch scorer: one matmul vs the broadcast query matrix; emits
    the batch-local top-k candidates per query."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(queries_ref)  # broadcast: fetched once per actor
        self.qids = q["qids"]
        self.qmat = q["unit"]  # (Q, dim), already normalized
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = (
            batch.column(self.id_col).combine_chunks()
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        )
        unit = _unit_rows(_as_matrix(batch.column(self.vec_col)))
        sims = _round6_half_away(unit @ self.qmat.T)  # (n, Q); round BEFORE rank
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi, qid in enumerate(self.qids):
            col = sims[:, qi]
            # top-k by (sim desc, id asc): lexsort on (-sim, id)
            order = np.lexsort((ids, -col))[:k]
            out_q.extend([qid] * len(order))
            out_id.extend(ids[order].tolist())
            out_sim.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_sim, type=pa.float64()),
            }
        )


def _final_topk_factory(k: int):
    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        ids = (
            group.column("neighbor_id").combine_chunks()
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        )
        sims = group.column("cosine").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ids, -sims))[: min(k, len(ids))]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), type=pa.int64()),
                "neighbor_id": pa.array(ids[order], type=pa.int64()),
                "cosine": pa.array(sims[order], type=pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
            }
        )

    return final_topk


def broadcast_queries(query_ids: list[int], query_vecs: np.ndarray):
    """``ray.put`` the (normalized) query matrix ONCE; tasks read the
    reference — never re-shipped per batch."""
    return ray.put(
        {"qids": list(query_ids), "unit": _unit_rows(np.asarray(query_vecs, dtype=np.float64))}
    )


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Exact cosine top-k of every query over the corpus. Returns a
    Dataset of (query_id, neighbor_id, cosine, rank)."""
    ref = broadcast_queries(query_ids, query_vecs)
    partials = ds.select_columns([vec_col, id_col]).map_batches(
        _PartialTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        # FIXED pool sized by the caller: autoscaling pools ramp slowly
        # (2x wall at small inputs); capped for read headroom
        concurrency=_cap_pool(concurrency),
        num_cpus=1,
    )
    return partials.groupby("query_id").map_groups(
        _final_topk_factory(k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) variant
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


class _IvfPartial(_PartialTopK):
    """Scores only rows whose centroid assignment is in the probed set
    for at least one query."""

    def __init__(self, queries_ref, cent_ref, k, nprobe, vec_col, id_col):
        super().__init__(queries_ref, k, vec_col, id_col)
        self.centroids = ray.get(cent_ref)
        qd = ((self.qmat[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        probe = np.argsort(qd, axis=1)[:, :nprobe]  # (Q, nprobe)
        self.probed: set[int] = set(probe.ravel().tolist())

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _as_matrix(batch.column(self.vec_col))
        d = ((vecs[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.isin(assign, list(self.probed))
        batch = batch.filter(pa.array(mask))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return super().__call__(batch)


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_limit: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    concurrency: int = 2,
) -> ray.data.Dataset:
    """IVF ANN: k-means coarse quantizer from a bounded sample (driver
    materializes only the sample), batches score only probed lists."""
    sample_tbl = ds.select_columns([vec_col]).limit(sample_limit).take_all()
    sample = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in sample_tbl])
    cent_ref = ray.put(_kmeans(sample, n_clusters, seed=seed))
    qref = broadcast_queries(query_ids, query_vecs)
    partials = ds.select_columns([vec_col, id_col]).map_batches(
        _IvfPartial,
        fn_constructor_kwargs=dict(
            queries_ref=qref, cent_ref=cent_ref, k=k, nprobe=nprobe,
            vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_cap_pool(concurrency),
        num_cpus=1,
    )
    return partials.groupby("query_id").map_groups(
        _final_topk_factory(k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Persisted IVF index: the REAL scale path
# ---------------------------------------------------------------------------
#
# ``ivf_topk`` above still scans the whole corpus per query batch (it
# saves flops, not IO). The persisted index fixes that: a write-once
# build pass assigns every vector to its centroid and lays the corpus
# out as one parquet file per inverted list; a query then READS only
# the ``nprobe`` probed lists — IO proportional to nprobe/n_clusters of
# the corpus, the property that matters at 100 TB.

IVF_META_NAME = "_ivf_meta.json"


def build_ivf_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    n_clusters: int = 16,
    sample_limit: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    content_token: str | None = None,
) -> dict:
    """Write-once IVF index build: seeded k-means on a bounded sample
    (the only driver materialization), then a distributed assignment
    pass writes ``centroid=<c>/`` partitioned parquet (Ray
    ``write_parquet(partition_cols=...)`` — one inverted list per
    directory) plus a JSON meta file holding the centroid matrix.

    The build is ATOMIC: it writes into a unique ``.build-*`` temp dir
    and renames it into place only when complete (meta file last), so a
    concurrent reader never sees a half-built index and a crashed build
    leaves no live dir. ``content_token`` (e.g. the lake manifest
    version or a corpus fingerprint) is recorded in the meta;
    :func:`ivf_index_is_current` checks it so a re-committed corpus
    never silently serves a stale index."""
    import json
    import os
    import shutil
    import uuid

    sample_tbl = ds.select_columns([vec_col]).limit(sample_limit).take_all()
    sample = np.vstack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in sample_tbl]
    )
    centroids = _kmeans(sample, n_clusters, seed=seed)
    cent_ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _as_matrix(batch.column(vec_col))
            d = ((vecs[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            return batch.append_column(
                "centroid", pa.array(d.argmin(axis=1).astype(np.int32))
            )

    build_dir = f"{index_dir.rstrip(os.sep)}.build-{uuid.uuid4().hex[:8]}"
    ds.select_columns([vec_col, id_col]).map_batches(
        Assign, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_cap_pool(4), num_cpus=1,
    ).write_parquet(build_dir, partition_cols=["centroid"])
    meta = {
        "n_clusters": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "vec_col": vec_col,
        "id_col": id_col,
        "content_token": content_token,
        "centroids": centroids.tolist(),
    }
    with open(os.path.join(build_dir, IVF_META_NAME), "w", encoding="utf-8") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.rename(build_dir, index_dir)
    except OSError:
        # a concurrent builder won the rename (same content token by
        # construction of the dir key) — keep theirs, discard ours
        shutil.rmtree(build_dir, ignore_errors=True)
    return meta


def ivf_index_is_current(index_dir: str, content_token: str | None) -> bool:
    """True iff a COMPLETE index exists at ``index_dir`` built from the
    given content token (the meta file is written last, so its presence
    implies a finished build)."""
    import json
    import os

    meta_path = os.path.join(index_dir, IVF_META_NAME)
    try:
        with open(meta_path, encoding="utf-8") as f:
            meta = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return False
    return meta.get("content_token") == content_token


def ivf_index_search(
    index_dir: str,
    query_ids: list[int],
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """Search a persisted IVF index reading ONLY the probed inverted
    lists (union over queries); within a batch each query is scored
    strictly against its own probe set (standard IVF semantics).
    Returns (query_id, neighbor_id, cosine, rank) like the other ANN
    entry points, plus never touching un-probed list files."""
    import glob
    import json
    import os

    with open(os.path.join(index_dir, IVF_META_NAME), encoding="utf-8") as f:
        meta = json.load(f)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    qraw = np.asarray(query_vecs, dtype=np.float64)
    qunit = _unit_rows(qraw)
    # probe with the RAW query vector: centroids live in the raw space
    # (assignment is unnormalized L2) — probing with the unit vector
    # would mix metrics and mis-rank lists
    qd = ((qraw[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :nprobe]  # (Q, nprobe)
    probed_union = sorted(set(probe.ravel().tolist()))
    paths = [
        p
        for c in probed_union
        for p in sorted(glob.glob(os.path.join(index_dir, f"centroid={c}", "*.parquet")))
    ]
    qref = ray.put(
        {"qids": list(query_ids), "unit": qunit, "probe": probe}
    )
    vec_col, id_col = meta["vec_col"], meta["id_col"]

    class ProbeScorer:
        def __init__(self):
            q = ray.get(qref)
            self.qids = q["qids"]
            self.qmat = q["unit"]
            self.probe = q["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
            cents = np.asarray(
                batch.column("centroid").to_pylist(), dtype=np.int64
            )
            unit = _unit_rows(_as_matrix(batch.column(vec_col)))
            sims = _round6_half_away(unit @ self.qmat.T)
            out_q, out_id, out_sim = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(cents, self.probe[qi])
                if not mask.any():
                    continue
                col = sims[mask, qi]
                mids = ids[mask]
                order = np.lexsort((mids, -col))[: min(k, len(mids))]
                out_q.extend([qid] * len(order))
                out_id.extend(mids[order].tolist())
                out_sim.extend(col[order].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_id, type=pa.int64()),
                    "cosine": pa.array(out_sim, type=pa.float64()),
                }
            )

    partials = ray.data.read_parquet(paths).map_batches(
        ProbeScorer, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_cap_pool(2), num_cpus=1,
    )
    return partials.groupby("query_id").map_groups(
        _final_topk_factory(k), batch_format="pyarrow"
    )


def ivf_index_probed_fraction(index_dir: str, query_vecs: np.ndarray,
                              *, nprobe: int = 4) -> float:
    """Fraction of the index's data bytes a search with these queries
    would read — the IO-savings check the scale audit demands."""
    import glob
    import json
    import os

    with open(os.path.join(index_dir, IVF_META_NAME), encoding="utf-8") as f:
        meta = json.load(f)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    qraw = np.asarray(query_vecs, dtype=np.float64)
    qd = ((qraw[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probed = set(np.argsort(qd, axis=1)[:, :nprobe].ravel().tolist())

    def dir_bytes(c: int) -> int:
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(index_dir, f"centroid={c}", "*.parquet"))
        )

    total = sum(dir_bytes(c) for c in range(meta["n_clusters"]))
    if total == 0:
        return 0.0
    return sum(dir_bytes(c) for c in probed) / total


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's over the FULL dataset)
# ---------------------------------------------------------------------------

def distributed_kmeans(
    ds, column: str, n_clusters: int, *, id_column: str = "vec_id",
    iters: int = 10,
):
    """Lloyd's k-means where the corpus NEVER leaves the workers — the
    canonical iterative algorithm on a Dataset:

    * init: deterministic hash-seeded — each block proposes its
      ``n_clusters`` smallest ``hash(id)`` rows (a keep-k combiner),
      the driver keeps the global k smallest, so the seeds are
      IDENTICAL under any repartitioning (unlike sample-based init);
    * iterate: centroids broadcast via ``ray.put``; each block folds to
      per-centroid (sum_vec, count, sse) partials — k x d floats per
      block, the only thing that crosses the wire; the driver reduce is
      a k-row fold. An emptied cluster keeps its previous centroid.

    Returns ``(centroids, counts, inertia_per_iter)``; inertia is
    non-increasing by construction (each step is the exact Lloyd
    update, mergeable-partial arithmetic notwithstanding).
    Materializes a pruned (id, vector) projection once so the k
    iterations re-read blocks, not the parquet."""
    import ray
    import ray.data  # noqa: F401

    proj = ds.map_batches(
        lambda t: pa.table({
            id_column: t.column(id_column), column: t.column(column)
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    mult = np.uint64(0x9E3779B97F4A7C15)

    def seed_partial(t: pa.Table) -> pa.Table:
        raw_ids = t.column(id_column).to_numpy(zero_copy_only=False)
        h = (raw_ids.astype(np.uint64) * mult) >> np.uint64(32)
        keep = np.lexsort((raw_ids, h))[:n_clusters]
        return pa.table({
            "h": pa.array(h[keep].astype(np.int64), pa.int64()),
            "i": pa.array(raw_ids[keep].astype(np.int64), pa.int64()),
            "v": t.column(column).take(pa.array(keep)),
        })

    cand = [
        b for b in proj.map_batches(
            seed_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    seeds = pa.concat_tables(cand)
    # global k smallest by (h, id) — the TAKE order is the (h, id) sort
    # order itself, never the block-arrival position, so centroid
    # LABELS are identical across runs (a positional take here permuted
    # labels run-to-run: same clusters, shuffled ids)
    order = np.lexsort((
        seeds.column("i").to_numpy(zero_copy_only=False),
        seeds.column("h").to_numpy(zero_copy_only=False),
    ))[:n_clusters]
    cent = _as_matrix(seeds.column("v").take(pa.array(order)))
    if len(cent) < n_clusters:
        # fewer rows than clusters: clamp k (every point its own
        # cluster) instead of a broadcast-shape crash in the update
        n_clusters = len(cent)
        if n_clusters == 0:
            raise ValueError("distributed_kmeans: dataset has no rows")

    inertia_per_iter: list[float] = []
    counts = np.zeros(n_clusters, dtype=np.int64)
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            v = _as_matrix(t.column(column))
            # |v-c|^2 = |v|^2 - 2 v.c + |c|^2, vectorized assignment
            d = (
                (v ** 2).sum(axis=1)[:, None]
                - 2.0 * (v @ c.T)
                + (c ** 2).sum(axis=1)[None, :]
            )
            assign = d.argmin(axis=1)
            sse = d[np.arange(len(v)), assign].sum()
            sums = np.zeros_like(c)
            np.add.at(sums, assign, v)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            blk = int(
                t.column(id_column).to_numpy(zero_copy_only=False).min()
            ) if t.num_rows else -1
            return pa.table({
                "blk": pa.array(np.full(len(c), blk), pa.int64()),
                "cluster": pa.array(np.arange(len(c)), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "sse": pa.array(
                    np.full(len(c), sse / len(c)), pa.float64()
                ),
                "sums": pa.array(list(sums.astype(np.float64))),
            })

        sums = np.zeros_like(cent)
        counts = np.zeros(n_clusters, dtype=np.int64)
        sse_total = 0.0
        got = [
            b for b in proj.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        # fold in a DETERMINISTIC order (by each block's min id, then
        # cluster): float summation order no longer depends on task
        # arrival, so repeated runs give bit-identical centroids
        allp = pa.concat_tables(got).sort_by(
            [("blk", "ascending"), ("cluster", "ascending")]
        ) if got else None
        if allp is not None:
            cl = allp.column("cluster").to_numpy(zero_copy_only=False)
            cn = allp.column("cnt").to_numpy(zero_copy_only=False)
            mats = [np.asarray(x) for x in allp.column("sums").to_pylist()]
            for i in range(len(cl)):
                counts[cl[i]] += cn[i]
                sums[cl[i]] += mats[i]
            sse_total = float(
                allp.column("sse").to_numpy(zero_copy_only=False).sum()
            )
        nonzero = counts > 0
        cent = np.where(
            nonzero[:, None], sums / np.maximum(counts, 1)[:, None], cent
        )
        inertia_per_iter.append(sse_total)
    return cent, counts, inertia_per_iter
