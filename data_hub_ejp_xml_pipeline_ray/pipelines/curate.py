"""Corpus curation: the composed training-data pipeline.

Chains the engine's text-analysis and dedup operators into the shape a
large-scale pretraining-data job takes:

    documents
      -> annotate (token/char/punct/stopword counts, quality, lang-id)   [vectorized map_batches]
      -> filter (quality >= threshold, predicted language allowlist)     [vectorized]
      -> exact dedup (content hash, keep min id)                         [two-phase grouped min]
      -> near dedup (MinHash + LSH, verified Jaccard)                    [bucketed candidates]
      -> write partitioned parquet (resumable layout: dir per bucket)

Each stage streams; only dedup drop-sets (bounded by the duplicate
rate) touch the driver. The deterministic filter prefix is
SQL-expressible and oracle-checked (query ``curate_filter``); the full
pipeline is exposed as ``curate_corpus`` (rows-only — MinHash-LSH is
not expressible in SQL).
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.dedup import exact_dedup_drop_ids, filter_survivors, minhash_dedup
from ..stages.textstats import annotate_text_stats

DEFAULT_QUALITY_THRESHOLD = 0.3
DEFAULT_LANGS = ("en", "de", "fr", "es")


def annotate_and_filter(
    ds: ray.data.Dataset,
    *,
    quality_threshold: float = DEFAULT_QUALITY_THRESHOLD,
    langs: tuple[str, ...] = DEFAULT_LANGS,
) -> ray.data.Dataset:
    """Deterministic filter prefix: annotate + quality/lang gate."""
    ds = ds.map_batches(
        annotate_text_stats, batch_format="pyarrow", zero_copy_batch=True
    )

    lang_set = pa.array(list(langs), pa.string())

    def gate(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch.column("quality"), quality_threshold),
            pc.is_in(batch.column("lang_pred"), value_set=lang_set),
        )
        return batch.filter(mask)

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def curate_exact(
    ds: ray.data.Dataset,
    *,
    quality_threshold: float = DEFAULT_QUALITY_THRESHOLD,
    langs: tuple[str, ...] = DEFAULT_LANGS,
    near_dup_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Fully DETERMINISTIC curation: the same filter -> exact dedup ->
    near dedup chain as :func:`curate`, but with the prefix-blocked
    exact-Jaccard near-dup stage instead of MinHash-LSH — every stage
    is SQL-expressible, so the WHOLE pipeline is oracle-checkable
    (query ``curate_corpus_exact``). Returns surviving ids."""
    from ..stages.dedup import jaccard_dedup

    filtered = annotate_and_filter(
        ds, quality_threshold=quality_threshold, langs=langs
    ).select_columns([id_col, text_col])
    exact_drop = exact_dedup_drop_ids(filtered, text_col, id_col)
    deduped = filter_survivors(filtered, exact_drop, id_col)
    res = jaccard_dedup(
        deduped, threshold=near_dup_threshold, id_col=id_col,
        text_col=text_col,
    )
    return res["survivors_ds"]


def curate(
    ds: ray.data.Dataset,
    *,
    quality_threshold: float = DEFAULT_QUALITY_THRESHOLD,
    langs: tuple[str, ...] = DEFAULT_LANGS,
    near_dup_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    output_dir: str | None = None,
) -> ray.data.Dataset:
    """Full curation. Returns the surviving annotated documents as a
    Dataset; optionally writes them as partitioned parquet under
    ``output_dir`` (one directory per id bucket — a rerun can skip
    finished buckets)."""
    filtered = annotate_and_filter(
        ds, quality_threshold=quality_threshold, langs=langs
    )
    # exact dedup: only the (dup-rate-bounded) DROP set reaches the driver
    exact_drop = exact_dedup_drop_ids(filtered, text_col, id_col)
    deduped = filter_survivors(filtered, exact_drop, id_col)
    near = minhash_dedup(
        deduped, threshold=near_dup_threshold, id_col=id_col, text_col=text_col
    )
    out = filter_survivors(deduped, near["drop"], id_col)
    if output_dir is not None:
        def bucket(batch: pa.Table) -> pa.Table:
            b = pc.bit_wise_and(batch.column(id_col), 7)
            return batch.append_column("bucket", b.cast(pa.int64()))

        out = out.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        out.write_parquet(output_dir, partition_cols=["bucket"])
        return ray.data.read_parquet(output_dir)
    return out


def write_training_shards(
    sf_dir: str, out_dir: str, *, budget: int | None = None
) -> dict:
    """RESUMABLE shard writer for the packed training corpus: the
    materialized output of the sequence-packing operator
    (``queries.q_pack_token_shards``'s assignment, carried WITH the
    text) laid out as ``shard=<k>/range-<rb>.parquet``.

    Scale shape: shard assignment needs a global ordered prefix sum,
    but ranges are CONTIGUOUS doc-id slices — so after the (text-free)
    per-range token-sum pass computes the offset table, each range
    task independently packs ITS docs and writes its per-shard files;
    the corpus text moves exactly once, straight from the read to the
    writer task, no join and no shuffle.

    Resumability (the partitioned-output rule): each range commits a
    ``_range-<rb>.done.json`` marker AFTER its files; a re-run skips
    finished ranges entirely (crash mid-run = rewrite only the ranges
    without markers; filenames are deterministic so a half-written
    file is simply overwritten)."""
    import json

    import numpy as np
    import pyarrow.parquet as pq

    from .queries import (
        PACK_SHARD_TOKENS,
        _pack_range_docs,
        _read,
    )

    budget = budget or PACK_SHARD_TOKENS
    total_rows = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    range_docs = _pack_range_docs(total_rows)

    # pass 1 (text-free): per-range token sums -> offset table
    from ray.data.aggregate import Sum

    counts = _read(sf_dir, "documents", ["doc_id", "text"],
                   rows_per_block=2_000).map_batches(
        lambda t: (lambda ann: pa.table({
            "_rb": pc.cast(
                pc.divide(ann.column("doc_id"), range_docs), pa.int64()
            ),
            "n_tokens": ann.column("n_tokens"),
        }))(annotate_text_stats(t)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    sums = counts.groupby("_rb").aggregate(
        Sum("n_tokens", alias_name="_s")
    ).take_all()
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(sums, key=lambda x: x["_rb"]):
        offsets[r["_rb"]] = run
        run += int(r["_s"])
    os.makedirs(out_dir, exist_ok=True)

    done_marker = lambda rb: os.path.join(out_dir, f"_range-{rb:06d}.done.json")  # noqa: E731
    todo = [rb for rb in offsets if not os.path.exists(done_marker(rb))]
    skipped = len(offsets) - len(todo)
    offsets_ref = ray.put(offsets)

    def write_range(group: pa.Table) -> pa.Table:
        rb = int(group.column("_rb")[0].as_py())
        if os.path.exists(done_marker(rb)):  # resumed run: already done
            return pa.table({"rb": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        offs = ray.get(offsets_ref)
        idx = pc.sort_indices(group.column("doc_id"))
        g = group.take(idx)
        ann = annotate_text_stats(g.select(["doc_id", "text"]))
        nt = ann.column("n_tokens").to_numpy(zero_copy_only=False)
        cum_before = np.cumsum(nt) - nt + offs[rb]
        shard = (cum_before // budget).astype(np.int64)
        g = g.append_column("shard_id", pa.array(shard)).append_column(
            "n_tokens", pc.cast(ann.column("n_tokens"), pa.int64())
        )
        written = []
        for s in np.unique(shard):
            sub = g.filter(pa.array(shard == s)).drop_columns(["_rb"])
            sdir = os.path.join(out_dir, f"shard={int(s)}")
            os.makedirs(sdir, exist_ok=True)
            path = os.path.join(sdir, f"range-{rb:06d}.parquet")
            tmp = path + ".inprogress"
            pq.write_table(sub, tmp)
            os.replace(tmp, path)
            written.append(path)
        with open(done_marker(rb) + ".tmp", "w", encoding="utf-8") as f:
            json.dump({"rb": rb, "rows": g.num_rows,
                       "files": [os.path.basename(p) for p in written]}, f)
        os.replace(done_marker(rb) + ".tmp", done_marker(rb))
        return pa.table({"rb": pa.array([rb], pa.int64()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id", "text"],
               rows_per_block=2_000).map_batches(
        lambda t: t.append_column("_rb", pc.cast(
            pc.divide(t.column("doc_id"), range_docs), pa.int64()
        )),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    stats = [
        r for b in ds.groupby("_rb").map_groups(
            write_range, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    return {
        "ranges_written": len(stats),
        "ranges_skipped": skipped,
        "rows_written": int(sum(r["rows"] for r in stats)),
        "budget": budget,
        "out_dir": out_dir,
    }
