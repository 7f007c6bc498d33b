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
