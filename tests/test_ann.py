"""ANN: brute-force exactness vs a numpy oracle; IVF recall floor."""
import numpy as np
import pyarrow as pa
import ray.data

from data_hub_ejp_xml_pipeline_ray.stages.ann import brute_force_topk, ivf_topk


def _corpus(n=300, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    return rows, vecs


def _oracle_topk(vecs, qids, qvecs, k):
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qu = qvecs / np.linalg.norm(qvecs, axis=1, keepdims=True)
    sims = np.round(unit @ qu.T, 6)
    out = {}
    for qi, qid in enumerate(qids):
        order = np.lexsort((np.arange(len(vecs)), -sims[:, qi]))[:k]
        out[qid] = [(int(i), float(sims[i, qi])) for i in order]
    return out


def test_brute_force_topk_exact():
    rows, vecs = _corpus()
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    qids = [0, 5, 9]
    qvecs = vecs[qids]
    got = brute_force_topk(ds, qids, qvecs, k=10).take_all()
    oracle = _oracle_topk(vecs, qids, qvecs, 10)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in qids:
        rs = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [(r["neighbor_id"], r["cosine"]) for r in rs] == oracle[qid]
        assert [r["rank"] for r in rs] == list(range(1, 11))


def test_ivf_recall_floor():
    rows, vecs = _corpus(n=400)
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    qids = [3, 7]
    qvecs = vecs[qids]
    exact = _oracle_topk(vecs, qids, qvecs, 10)
    got = ivf_topk(ds, qids, qvecs, k=10, n_clusters=8, nprobe=4).take_all()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid in qids:
        truth = {i for i, _ in exact[qid]}
        recall = len(by_q.get(qid, set()) & truth) / len(truth)
        assert recall >= 0.5, f"IVF recall too low: {recall}"
