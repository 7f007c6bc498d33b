"""Approximate-nearest-neighbor search over an embedding column.

* :func:`brute_force_topk` — the exactness baseline: the (small) query
  matrix is broadcast once via ``ray.put``; every batch does one numpy
  matmul against it and emits per-batch partial top-k rows; a final
  grouped reduce keeps the global top-k per query. Only
  O(num_queries * k) rows per batch leave the tasks — the corpus never
  moves.
* :func:`ivf_topk` — the scale path: a seeded k-means (driver-side, on
  a bounded sample) builds a coarse quantizer; batches assign rows to
  their nearest centroid; queries probe only ``nprobe`` inverted lists.
  Recall is tested against the brute-force baseline.

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


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
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
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
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
        ids = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
        sims = np.asarray(group.column("cosine").to_pylist())
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
) -> ray.data.Dataset:
    """Exact cosine top-k of every query over the corpus. Returns a
    Dataset of (query_id, neighbor_id, cosine, rank)."""
    ref = broadcast_queries(query_ids, query_vecs)
    partials = ds.select_columns([vec_col, id_col]).map_batches(
        _PartialTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
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
        concurrency=(1, 8),
        num_cpus=1,
    )
    return partials.groupby("query_id").map_groups(
        _final_topk_factory(k), batch_format="pyarrow"
    )
