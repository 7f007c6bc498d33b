"""Operator registry over the driver's sf tables: every operator family
from SURVEY §2 (plus the training-data additions) expressed as a Ray
Data pipeline, with a matching ANSI-SQL oracle where SQL can express it.

Contract (driver correctness gate): ``QUERIES[name](sf_dir)`` returns a
Dataset / pandas DataFrame / Arrow table whose row set, schema and
values match ``ORACLE_SQL[name]`` run by DuckDB over the same parquet
views. Column names are part of the contract — every computed column is
aliased identically on both sides. Aggregated doubles are rounded
(scale-int-divide) on both sides so summation order can't flip the
value hash.

Scale notes are inline per query: combiners before shuffles, broadcast
(``ray.put``) small sides instead of shuffle joins, column pruning at
the read.
"""
from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..dataset_util import arrow_blocks
from ..functions import textstats as ts
from ..stages.ann import brute_force_topk, ivf_topk
from ..stages.dedup import (
    embedding_dedup,
    exact_dedup,
    jaccard_dedup,
    minhash_dedup,
    simhash_dedup,
)
from ..stages.textstats import annotate_text_stats

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _read(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    *,
    rows_per_block: int | None = None,
) -> ray.data.Dataset:
    """Pruned parquet read. With ``rows_per_block``, the block count is
    sized from the parquet FOOTER (no data read) instead of Ray's
    default ~2x-CPU split: per-task overhead is ~10 ms, so 64 blocks of
    1.6k rows cost ~4x the wall of 8 right-sized blocks (measured —
    the r2 window-family regressions were exactly this over-split).
    Scale-safe in both directions: small inputs get few fat blocks;
    growing inputs add blocks by row count, and a bytes floor keeps any
    block under ~128 MB regardless of the row heuristic. Use it for
    VECTORIZED per-batch pipelines; leave it unset for python-per-row
    actor stages, which want many small blocks for pool utilization."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if rows_per_block is None:
        return ray.data.read_parquet(path, columns=columns)
    return ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=_nblocks(path, rows_per_block),
    )


def _nblocks(path: str, rows_per_block: int) -> int:
    """Footer-sized block count (see ``_read``); shared by the filtered
    reads, which size from the PRE-filter footer row count — the read-
    task overhead being amortized is per task, not per surviving row."""
    md_rows = pq.ParquetFile(path).metadata.num_rows
    cpus = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized() else 8
    )
    by_rows = min(max(1, -(-md_rows // rows_per_block)), cpus * 4)
    by_bytes = -(-os.path.getsize(path) // (128 << 20))
    return max(by_rows, by_bytes)


def _pool_for(sf_dir: str, table: str, rows_per_actor: int,
              lo: int = 2, hi: int = 16) -> int:
    """Actor-pool size scaled to the input (footer-only row count):
    fixed pools beat autoscaling ramp-up ~2x at small inputs, while
    100x data gets proportionally more actors (capped)."""
    rows = pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")
    ).metadata.num_rows
    return max(lo, min(hi, rows // rows_per_actor))


def _round2(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """round(x*100)/100 with half-away ties — DuckDB round() parity."""
    out = pc.divide(
        pc.round(
            pc.multiply(col, 100.0), ndigits=0, round_mode="half_towards_infinity"
        ),
        100.0,
    )
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _keep_extreme(batch: pa.Table, key_cols: list[str], order_cols: list[str],
                  keep: str = "last") -> pa.Table:
    """Per-batch combiner: keep one extreme row per key (the generic
    form of the CDC local-LWW pre-reduce)."""
    if batch.num_rows <= 1:
        return batch
    df = pl.from_arrow(batch)
    df = df.sort(key_cols + order_cols).unique(
        subset=key_cols, keep=keep, maintain_order=True
    )
    out = df.to_arrow()
    from ..schemas import conform_table

    return conform_table(out, batch.schema)


_BUCKET_MULT64 = 0x9E3779B97F4A7C15  # 64-bit golden-ratio multiplier


def _hash_bucket(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Multiplicative-hash bucket id for an int64 key column. Runs in
    numpy uint64 (wraparound IS the hash; pyarrow's checked multiply
    raises on keys >= ~3.5e9, and its uint64 scalar path rejects values
    above int64 max) and takes the HIGH 32 bits, so the bucket depends
    on every key bit — not just ``key mod num_buckets``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    h = (k * np.uint64(_BUCKET_MULT64)) >> np.uint64(32)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def _buckets_for(
    sf_dir: str, table: str = "events", rows_per_bucket: int = 500_000
) -> int:
    """Bucket count for ``_bucketed_groups``, sized from the parquet
    FOOTER the same way ``_read`` sizes blocks (no data read): each
    bucket task holds at most ~``rows_per_bucket`` rows of complete
    groups, so per-task memory stays bounded at any data volume (a
    fixed 64 buckets would hold N/64 rows — unbounded at 100x) and the
    bucket-key shuffle cardinality grows with the data instead of
    collapsing onto 64 reducers."""
    rows = pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")
    ).metadata.num_rows
    return max(64, -(-rows // rows_per_bucket))


def _bucketed_groups(
    ds: ray.data.Dataset, key: str, bucket_fn, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Scale-shaped grouped-window executor: hash the group key into
    ``num_buckets`` buckets and run ONE vectorized kernel call per
    BUCKET (each holding ~N/num_buckets whole groups), instead of Ray's
    one-Python-call-per-group ``map_groups`` — with millions of users
    that is millions of tiny DataFrames. ``bucket_fn`` receives an
    Arrow table containing complete groups (never a split group: the
    bucket id is a pure function of the key) and must be vectorized
    across the groups inside it (polars window exprs / numpy boundary
    masks)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", _hash_bucket(t.column(key), num_buckets))

    def run_bucket(group: pa.Table) -> pa.Table:
        return bucket_fn(group.drop_columns(["_bucket"]))

    return ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("_bucket").map_groups(run_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CDC-semantics operators over `events`
# ---------------------------------------------------------------------------

def q_lww_latest_by_user(sf_dir: str):
    """LWW reduce (SURVEY §2.8): last event per user by (ts, event_id)
    — combiner per block, then a bucketed vectorized reduce (one polars
    call per ~N/64 users; mirrors the engine's two-phase merge)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"], rows_per_block=20_000)
    ds = ds.map_batches(
        _keep_extreme,
        fn_kwargs={"key_cols": ["user_id"], "order_cols": ["ts", "event_id"]},
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def last_rows_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        out = df.unique(subset=["user_id"], keep="last", maintain_order=True)
        return out.select(["user_id", "event_id", "ts", "value"]).to_arrow().cast(
            pa.schema([
                ("user_id", pa.int64()), ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")), ("value", pa.float64()),
            ])
        )

    return _bucketed_groups(ds, "user_id", last_rows_bucket, num_buckets=_buckets_for(sf_dir))


def q_watermark_filter(sf_dir: str):
    """Strictly-greater high-watermark filter (tailer semantics,
    ``airflow_s3_util_extension.py:130-133``) — pushed INTO the parquet
    read (row-group statistics prune before any bytes move; at 100 TB
    only matching row groups leave storage)."""
    wm = datetime(2024, 1, 15)
    path = os.path.join(sf_dir, "events.parquet")
    return ray.data.read_parquet(
        path,
        columns=["event_id", "ts", "user_id"],
        filter=(pc.field("ts") > wm),
        override_num_blocks=_nblocks(path, 20_000),
    )


def q_max_ts_per_type(sf_dir: str):
    """Watermark aggregation per key pattern (A1)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"], rows_per_block=20_000)
    return ds.groupby("event_type").aggregate(
        Max("ts", alias_name="max_ts"), Count(alias_name="n_events")
    )


def q_dedup_first_event(sf_dir: str):
    """Grouped-first (O4 analog): first event per (user, type) — same
    bucketed vectorized shape as the LWW reduce (bucket on user; both
    group keys live in the same bucket)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"], rows_per_block=20_000)
    ds = ds.map_batches(
        _keep_extreme,
        fn_kwargs={"key_cols": ["user_id", "event_type"],
                   "order_cols": ["ts", "event_id"], "keep": "first"},
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def first_rows_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "event_type", "ts", "event_id"])
        out = df.unique(
            subset=["user_id", "event_type"], keep="first", maintain_order=True
        )
        return out.select(["user_id", "event_type", "event_id"]).rename(
            {"event_id": "first_event_id"}
        ).to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("first_event_id", pa.int64()),
        ]))

    return _bucketed_groups(ds, "user_id", first_rows_bucket, num_buckets=_buckets_for(sf_dir))


def q_fanout_entities(sf_dir: str):
    """Fan-out demux (M6/S9 analog): one input row -> one row per
    entity stream, discriminated by ``entity_type``."""
    ds = _read(sf_dir, "events", ["event_id", "value", "props"], rows_per_block=20_000)

    def demux(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        a = df.select(
            pl.col("event_id"),
            pl.lit("value").alias("entity_type"),
            pl.col("value").alias("v"),
        )
        b = df.select(
            pl.col("event_id"),
            pl.lit("prop_k").alias("entity_type"),
            pl.col("props").str.json_path_match("$.k").cast(pl.Float64).alias("v"),
        )
        out = pl.concat([a, b]).to_arrow()
        return out.cast(
            pa.schema([
                ("event_id", pa.int64()), ("entity_type", pa.string()),
                ("v", pa.float64()),
            ])
        )

    return ds.map_batches(demux, batch_format="pyarrow", zero_copy_batch=True)


def q_tumbling_window_counts(sf_dir: str):
    """Tumbling event-time window aggregate (streaming-shaped op over
    the ordered log; SURVEY §2.9)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"], rows_per_block=20_000)

    def add_window(t: pa.Table) -> pa.Table:
        return t.append_column(
            "window_start", pc.floor_temporal(t.column("ts"), unit="hour")
        )

    ds = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
    agg = ds.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("sum_value"), "sum_value",
            _round2(t.column("sum_value")),
        ),
        batch_format="pyarrow",
    )


def q_sessionize(sf_dir: str):
    """Session windows (30-min gap) per user. Vectorized bucket kernel
    (one polars call per ~N/64 users — never per-user Python): sort by
    (user, ts, event_id), flag gap starts with a grouped ``diff``,
    number sessions with a grouped cumulative sum, aggregate."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"], rows_per_block=20_000)

    def sessions_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        gap = pl.col("ts").diff().over("user_id")
        is_new = gap.is_null() | (gap > pl.duration(minutes=30))
        out = (
            df.with_columns(
                is_new.cast(pl.Int64).cum_sum().over("user_id")
                .alias("session_index")
            )
            .group_by(["user_id", "session_index"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("ts").min().alias("session_start"),
            )
        )
        return out.to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("session_index", pa.int64()),
            ("n_events", pa.int64()), ("session_start", pa.timestamp("us")),
        ]))

    return _bucketed_groups(ds, "user_id", sessions_bucket, num_buckets=_buckets_for(sf_dir))


def q_hopping_window_counts(sf_dir: str):
    """Hopping event-time windows (size 2h, hop 1h — each event lands
    in two windows; the overlapping-window sibling of
    ``tumbling_window_counts``): explode each event to its member
    windows per batch (vectorized), then one grouped count."""
    ds = _read(sf_dir, "events", ["event_type", "ts"], rows_per_block=20_000)

    def explode_windows(t: pa.Table) -> pa.Table:
        def cc(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        w0 = cc(pc.floor_temporal(t.column("ts"), unit="hour"))
        w1 = cc(
            pc.subtract(w0, pa.scalar(3_600_000_000, pa.duration("us"))).cast(
                w0.type
            )
        )
        et = cc(t.column("event_type"))
        return pa.table(
            {"event_type": pa.concat_arrays([et, et]),
             "window_start": pa.concat_arrays([w0, w1])}
        )

    ds = ds.map_batches(explode_windows, batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n_events")
    )


def q_events_in_prior_hour(sf_dir: str):
    """Time-range self-join (the range-join custom operator per SURVEY
    §2.5): for each event, how many events the same user generated in
    ``[ts-1h, ts)``. Bucketed vectorized kernel: one polars
    time-rolling window (``closed='left'``) per ~N/64 users; the SQL
    oracle is the equivalent non-equi join."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"], rows_per_block=20_000)

    def prior_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        win = (
            df.rolling(index_column="ts", period="1h", closed="left",
                       group_by="user_id")
            .agg(pl.len().cast(pl.Int64).alias("n_prior"))
            .unique(subset=["user_id", "ts"], keep="first")
        )
        out = df.join(win, on=["user_id", "ts"], how="left").select(
            ["event_id", "n_prior"]
        )
        return out.to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("n_prior", pa.int64()),
        ]))

    return _bucketed_groups(ds, "user_id", prior_bucket, num_buckets=_buckets_for(sf_dir))


def grouped_count_distinct(
    ds: ray.data.Dataset,
    group_cols: str | list[str],
    value_col: str,
    *,
    num_buckets: int = 64,
    count_name: str = "n",
) -> ray.data.Dataset:
    """Exact grouped count-distinct with TWO-LEVEL bucketing so no task
    ever holds a full group's distinct set (the r2 shape put all of a
    type's users in one task — OOM at 100x on a skewed key):

    1. per-batch ``(group, value)`` dedup combiner — only near-distinct
       pairs shuffle;
    2. shuffle by ``(group, hash-bucket(value))`` — the value dimension
       partitions each group into ``num_buckets`` disjoint slices, each
       counted vectorized;
    3. a tiny grouped SUM of the per-slice counts (disjoint slices sum
       exactly).

    The approximate sibling is the HLL sketch in ``functions/sketch.py``
    (mergeable 4 KB partials, no pair shuffle at all)."""
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def distinct_pairs(t: pa.Table) -> pa.Table:
        t = t.group_by(gcols + [value_col]).aggregate([])
        return t.append_column(
            "_ub", _hash_bucket(t.column(value_col), num_buckets)
        )

    pairs = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def count_bucket(g: pa.Table) -> pa.Table:
        # ONE vectorized kernel per VALUE bucket (holding every group's
        # slice of that bucket) — never one Python call per (group,
        # bucket) pair, which explodes on composite window keys
        out = (
            pl.from_arrow(g.drop_columns(["_ub"]))
            .group_by(gcols)
            .agg(pl.col(value_col).n_unique().cast(pl.Int64).alias("_n_part"))
            .to_arrow()
        )
        return out.cast(
            pa.schema(
                [g.schema.field(c) for c in gcols]
                + [pa.field("_n_part", pa.int64())]
            )
        )

    parts = pairs.groupby("_ub").map_groups(count_bucket, batch_format="pyarrow")
    return parts.groupby(gcols[0] if len(gcols) == 1 else gcols).aggregate(
        Sum("_n_part", alias_name=count_name)
    )


def q_distinct_users_per_type(sf_dir: str):
    """Exact grouped count-distinct over events (bounded-per-task; see
    :func:`grouped_count_distinct`)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"], rows_per_block=20_000)
    return grouped_count_distinct(
        ds, "event_type", "user_id", count_name="n_users"
    )


def q_hll_distinct_users_per_type(sf_dir: str):
    """APPROXIMATE grouped count-distinct via the mergeable HLL sketch
    (rows-only check: ~1.6% standard error at p=12) — the scale route
    when even distinct (group, value) pairs are too many to shuffle:
    only 4 KB of registers per group moves. The exact sibling is
    ``distinct_users_per_type``."""
    from ..functions.sketch import hll_count_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"], rows_per_block=20_000)
    est = hll_count_distinct(ds, "user_id", group_col="event_type")
    types = sorted(est)
    return pa.table(
        {"event_type": pa.array(types, pa.string()),
         "n_users_approx": pa.array(
             [int(round(est[t])) for t in types], pa.int64())}
    )


#: BPE-ish pre-tokenizer pattern (GPT-2-style splits minus the
#: lookaheads RE2 lacks): letter runs / digit runs / punctuation runs,
#: each absorbing one leading space. RE2 on both sides (pyarrow +
#: DuckDB), so the oracle matches byte-for-byte incl. unicode.
_BPEISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def q_doc_bpeish_tokens(sf_dir: str):
    """Subword-style token counting (the training-cost estimator): the
    count a BPE pre-tokenizer would split into, vectorized with ONE
    RE2 kernel call per batch (``pc.count_substring_regex``) — no
    Python per row."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    def count(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_bpeish": pc.cast(
                 pc.count_substring_regex(
                     t.column("text"), pattern=_BPEISH_PATTERN
                 ),
                 pa.int64(),
             )}
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def q_top_terms_sketch(sf_dir: str):
    """Approximate corpus top-50 terms via Count-Min + per-block
    candidate tracking (rows-only: estimates overcount by <= ~e/width
    of total mass). The heavy-hitters scale route — only fixed-size
    sketch partials and per-block local tops move; the term universe
    never shuffles. Exact sibling: ``top_terms``."""
    from ..functions.sketch import cms_topk_terms

    ds = _read(sf_dir, "documents", ["text"], rows_per_block=2_000)
    return cms_topk_terms(ds, "text", k=50)


def q_hourly_distinct_users(sf_dir: str):
    """Windowed distinct count (streaming analytics staple): distinct
    users per (event_type, tumbling hour). Composes the tumbling-window
    key with the two-level bounded count-distinct — the composite group
    key multiplies cardinality, which is exactly when the per-batch
    dedup combiner + value-bucket split earn their keep."""
    ds = _read(
        sf_dir, "events", ["event_type", "ts", "user_id"], rows_per_block=20_000
    )

    def add_window(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t.column("event_type"),
             "window_start": pc.floor_temporal(t.column("ts"), unit="hour"),
             "user_id": t.column("user_id")}
        )

    ds = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count_distinct(
        ds, ["event_type", "window_start"], "user_id", count_name="n_users"
    )


#: Token budget per packed training shard (concat-and-chop packing).
PACK_SHARD_TOKENS = 4096
#: Floor for docs per ordered range bucket of the distributed prefix
#: sum. The EFFECTIVE range scales with corpus size (see
#: ``_pack_range_docs``) so the driver's offset table stays bounded
#: (~<=50k entries) at any corpus — shard assignment is independent of
#: the bucketing, so the knob is free to move.
PACK_RANGE_DOCS = 500


def _pack_range_docs(total_rows: int) -> int:
    return max(PACK_RANGE_DOCS, total_rows // 50_000 + 1)


def q_pack_token_shards(sf_dir: str):
    """Sequence packing for LLM training (concat-and-chop): assign each
    document, in ``doc_id`` order, to the shard its cumulative token
    offset falls in (``shard_id = cum_tokens_before // budget``) — the
    deterministic doc->training-shard mapping a tokenize-and-pack
    pipeline needs, and a distributed ORDERED PREFIX SUM:

    1. per-doc token counts (vectorized) + an ordered RANGE bucket
       (``doc_id // range``) — ranges are contiguous id slices, so
       bucket order IS document order;
    2. per-range token sums -> driver computes the tiny prefix-offset
       table over sorted ranges (one number per range);
    3. per-range cumulative sum + offset (each task holds one range,
       never the corpus).

    Integer arithmetic end to end — no float drift against the SQL
    window-function oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)
    range_docs = _pack_range_docs(
        pq.ParquetFile(
            os.path.join(sf_dir, "documents.parquet")
        ).metadata.num_rows
    )

    def tok(t: pa.Table) -> pa.Table:
        ann = annotate_text_stats(t)
        rb = pc.divide(ann.column("doc_id"), range_docs)
        return pa.table(
            {"doc_id": ann.column("doc_id"),
             "n_tokens": ann.column("n_tokens"),
             "_rb": pc.cast(rb, pa.int64())}
        )

    # two passes read this projection (range sums, then packing); the
    # text is already dropped, so materializing three int columns costs
    # ~24 B/doc in the (spillable) object store vs re-tokenizing twice
    toks = ds.map_batches(
        tok, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    sums = toks.groupby("_rb").aggregate(
        Sum("n_tokens", alias_name="_s")
    ).take_all()
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(sums, key=lambda x: x["_rb"]):
        offsets[r["_rb"]] = run
        run += int(r["_s"])

    def pack(group: pa.Table) -> pa.Table:
        rb = group.column("_rb")[0].as_py()
        idx = pc.sort_indices(group.column("doc_id"))
        g = group.take(idx)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        cum_before = np.cumsum(nt) - nt + offsets[rb]
        return pa.table(
            {"doc_id": g.column("doc_id"),
             "n_tokens": pc.cast(g.column("n_tokens"), pa.int64()),
             "shard_id": pa.array(
                 (cum_before // PACK_SHARD_TOKENS).astype(np.int64))}
        )

    return toks.groupby("_rb").map_groups(pack, batch_format="pyarrow")


def q_mixture_by_token_budget(sf_dir: str):
    """Data-MIXTURE sampling for LLM training (the per-source token
    budgets a mixture recipe prescribes — LLaMA/Pile-style domain
    weighting): admit each source's documents in deterministic doc_id
    order until the source's budget is exhausted (here budget = HALF
    the source's own total tokens, so the gate is derived from the
    corpus and scales with the tier; a real recipe would pass explicit
    per-domain budgets). Greedy prefix fill: a doc is admitted iff the
    tokens admitted before it are still under budget (bounded
    overshoot by at most one document — the standard rule).

    Distributed as a GROUPED ordered prefix sum (the per-source
    generalization of ``q_pack_token_shards``): per-(source, id-range)
    token sums -> the driver folds a tiny offset table (sources x
    ranges entries) plus per-source totals/budgets -> each
    (source, range) bucket admits its own rows vectorized. No task
    holds a source's corpus; the driver holds counters only."""
    ds = _read(
        sf_dir, "documents", ["doc_id", "text", "source"],
        rows_per_block=2_000,
    )
    range_docs = _pack_range_docs(
        pq.ParquetFile(
            os.path.join(sf_dir, "documents.parquet")
        ).metadata.num_rows
    )

    def tok(t: pa.Table) -> pa.Table:
        ann = annotate_text_stats(t)
        rb = pc.cast(pc.divide(ann.column("doc_id"), range_docs), pa.int64())
        return pa.table(
            {"doc_id": ann.column("doc_id"),
             "source": t.column("source"),
             "n_tokens": ann.column("n_tokens"),
             "_rb": rb}
        )

    toks = ds.map_batches(
        tok, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    sums = toks.groupby(["source", "_rb"]).aggregate(
        Sum("n_tokens", alias_name="_s")
    ).take_all()
    offsets: dict[tuple, int] = {}
    totals: dict[str, int] = {}
    for r in sorted(sums, key=lambda x: (x["source"], x["_rb"])):
        offsets[(r["source"], int(r["_rb"]))] = totals.get(r["source"], 0)
        totals[r["source"]] = (
            totals.get(r["source"], 0) + int(r["_s"])
        )
    budgets = {s: t // 2 for s, t in totals.items()}

    def admit(group: pa.Table) -> pa.Table:
        src = group.column("source")[0].as_py()
        rb = int(group.column("_rb")[0].as_py())
        idx = pc.sort_indices(group.column("doc_id"))
        g = group.take(idx)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        before = np.cumsum(nt) - nt + offsets[(src, rb)]
        g = g.filter(pa.array(before < budgets[src]))
        return pa.table(
            {"doc_id": g.column("doc_id"),
             "source": g.column("source"),
             "n_tokens": pc.cast(g.column("n_tokens"), pa.int64())}
        )

    return toks.groupby(["source", "_rb"]).map_groups(
        admit, batch_format="pyarrow"
    )


def q_quality_gate_by_lang(sf_dir: str):
    """Per-language quality gate at the language's own MEDIAN: keep
    documents strictly above the per-lang median quality score — the
    stratified curation filter (a global threshold over-prunes
    low-resource languages). Composes the distributed exact-quantile
    machinery (``grouped_quantiles_distributed`` — no task holds a
    language's full score set) with a broadcast threshold filter."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"], rows_per_block=2_000)

    def score(t: pa.Table) -> pa.Table:
        ann = annotate_text_stats(t)
        return pa.table(
            {"doc_id": ann.column("doc_id"),
             "lang": t.column("lang"),
             "quality": ann.column("quality")}
        )

    # four passes read the scores (count/min/max, histogram, bucket
    # pick, final gate): materialize the text-free projection once
    scored = ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    med = grouped_quantiles_distributed(scored, "lang", "quality", [0.5])
    thr = {g: v[0.5] for g, v in med.items()}
    thr_ref = ray.put(thr)

    def gate(t: pa.Table) -> pa.Table:
        th = ray.get(thr_ref)
        langs = t.column("lang").to_pylist()
        q = t.column("quality").to_numpy(zero_copy_only=False)
        cut = np.fromiter((th[g] for g in langs), dtype=np.float64,
                          count=len(langs))
        return t.filter(pa.array(q > cut))

    return scored.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def q_top_terms(sf_dir: str):
    """Corpus term top-k (the canonical map-reduce): per-batch token
    explosion + LOCAL count combiner, then term-hash-bucketed exact
    sums with a per-bucket keep-50 — a term's full count lands in
    exactly ONE bucket, so the global top-50 is a subset of the
    per-bucket top-50s and the final sort sees <= 50 x buckets
    candidate rows, never the vocabulary (whose junk-token tail is
    itself web-scale). Deterministic tiebreak by term."""
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["text"], rows_per_block=2_000)

    _CNT = pa.schema([("term", pa.string()), ("n", pa.int64()),
                      ("th", pa.int64())])
    _OUT = pa.schema([("term", pa.string()), ("n", pa.int64())])

    def local_counts(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.select(
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("term")
            )
            .explode("term")
            .drop_nulls()
            .group_by("term").agg(pl.len().cast(pl.Int64).alias("n"))
            .with_columns(
                th=pl.col("term").hash(seed=0).reinterpret(signed=True)
            )
        )
        out = out.to_arrow().cast(_CNT)
        return out.append_column(
            "_bucket", _hash_bucket(out.column("th"), num_buckets)
        )

    def top50_bucket(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by("term").agg(pl.col("n").sum())
            .sort(["n", "term"], descending=[True, False])
            .head(50)
            .select(["term", "n"])
        )
        return out.to_arrow().cast(_OUT)

    counts = ds.map_batches(local_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
    candidates = counts.groupby("_bucket").map_groups(
        lambda g: top50_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    return candidates.sort(["n", "term"], descending=[True, False]).limit(50)


# ---------------------------------------------------------------------------
# Projection / filter / normalization over `documents`
# ---------------------------------------------------------------------------

def q_exclusion_filter(sf_dir: str):
    """Exclusion-regex anti-filter (M3 analog, ``ejp_zip.py:61-63``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"], rows_per_block=2_000)
    return ds.map_batches(
        lambda t: t.filter(
            pc.invert(pc.match_substring_regex(t.column("text"), "merge|fox"))
        ).drop_columns(["text"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_null_normalize(sf_dir: str):
    """Null normalization (M14 analog): empty-string -> null -> default
    (the engine's inversion of ``remove_key_with_null_value``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"], rows_per_block=2_000)

    def norm(t: pa.Table) -> pa.Table:
        lang = t.column("lang")
        lang_norm = pc.coalesce(
            pc.if_else(pc.equal(lang, ""), pa.scalar(None, pa.string()), lang),
            pa.scalar("und"),
        )
        src = t.column("source")
        src_norm = pc.coalesce(
            pc.if_else(pc.equal(src, ""), pa.scalar(None, pa.string()), src),
            pa.scalar("unknown"),
        )
        return pa.table(
            {"doc_id": t.column("doc_id"), "lang_norm": lang_norm,
             "source_norm": src_norm}
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# TPC-H-shaped aggregates / joins / top-k
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """Q1-shaped grouped aggregate with pre-shuffle computed column."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
        rows_per_block=20_000,
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(datetime(2000, 12, 1))))
        disc = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
        )
        return t.append_column("disc_price", disc).drop_columns(["l_shipdate"])

    # per-block combiner: collapse each block to (flags, sums, count)
    # partials with ONE arrow group_by, so the groupby shuffles
    # blocks x 6 rows instead of every lineitem (Ray's sort-aggregate
    # over the raw rows measured ~4x the whole query's combiner cost)
    def prep_partial(t: pa.Table) -> pa.Table:
        t = prep(t)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("l_extendedprice", "sum"),
            ("disc_price", "sum"), ("l_quantity", "count"),
        ]).rename_columns([
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "count_order",
        ])

    partials = ds.map_batches(
        prep_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(
            t.column("sum_qty"), pc.cast(t.column("count_order"), pa.float64())
        )
        t = t.append_column("avg_qty", avg)
        for name in ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"]:
            t = t.set_column(t.column_names.index(name), name, _round2(t.column(name)))
        return t.select([
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "avg_qty", "count_order",
        ])

    return agg.map_batches(finish, batch_format="pyarrow")


def _broadcast_dim(sf_dir: str, table: str, key: str, cols: list[str]):
    """Read a small dimension table driver-side and ``ray.put`` it once
    (broadcast-join pattern — no shuffle for small sides). Ships the
    Arrow table itself; consumers do zero-copy ``index_in`` lookups
    instead of paying a pandas conversion per batch."""
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=cols)
    return ray.put(t.combine_chunks())


def _dim_lookup(
    dim: pa.Table, key: str, value: str, probe: pa.ChunkedArray | pa.Array
) -> pa.Array:
    """Vectorized broadcast-join probe: ``dim[value]`` for each key in
    ``probe`` (Arrow ``index_in`` + ``take`` — no pandas, no hashmap
    rebuild per call beyond Arrow's internal memo table)."""
    pos = pc.index_in(probe, value_set=dim.column(key).combine_chunks())
    return pc.take(dim.column(value).combine_chunks(), pos)


def q_revenue_by_nation(sf_dir: str):
    """3-way join, scale-shaped: lineitem and orders are both FACT
    tables, so their equi-join on orderkey runs as a TAGGED-UNION
    CO-GROUP on the bucketed executor — both sides hash-bucket by
    orderkey (bucket count footer-scaled, so each co-group task holds
    ~500k rows of complete key groups at any volume) and ONE polars
    join runs per bucket; only the true dimensions (customer, nation —
    bounded cardinality) are broadcast via ``ray.put``. A per-batch
    combiner pre-aggregates lineitem revenue by orderkey before the
    shuffle, and each bucket emits nation-level partials, so the final
    fold sees buckets x 25 rows. (This replaced ``Dataset.join``: its
    per-partition aggregator actors cost ~2x the whole query at these
    block counts; the one sort shuffle here moves the same bytes.)"""
    cust_ref = _broadcast_dim(sf_dir, "customer", "c_custkey", ["c_custkey", "c_nationkey"])
    nation_ref = _broadcast_dim(sf_dir, "nation", "n_nationkey", ["n_nationkey", "n_name"])
    num_buckets = _buckets_for(sf_dir, "orders")

    def partial_rev(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(1.0, batch.column("l_discount")),
        )
        t = pa.table({"orderkey": batch.column("l_orderkey"), "revenue": rev})
        t = t.group_by("orderkey").aggregate([("revenue", "sum")]).rename_columns(
            ["orderkey", "revenue"]
        )
        return pa.table({
            "orderkey": t.column("orderkey"),
            "revenue": t.column("revenue"),
            "custkey": pa.nulls(t.num_rows, pa.int64()),
            "_bucket": _hash_bucket(t.column("orderkey"), num_buckets),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch.column("o_orderkey"),
            "revenue": pa.nulls(batch.num_rows, pa.float64()),
            "custkey": batch.column("o_custkey"),
            "_bucket": _hash_bucket(batch.column("o_orderkey"), num_buckets),
        })

    lineitem = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"],
        rows_per_block=20_000,
    ).map_batches(partial_rev, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey"], rows_per_block=20_000
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)

    def cogroup_bucket(t: pa.Table) -> pa.Table:
        # one vectorized join per bucket of complete orderkey groups;
        # dims come from the object store zero-copy per task
        cust = ray.get(cust_ref)
        nation = ray.get(nation_ref)
        df = pl.from_arrow(t)
        rev = (
            df.filter(pl.col("revenue").is_not_null())
            .group_by("orderkey").agg(pl.col("revenue").sum())
        )
        ok = df.filter(pl.col("custkey").is_not_null()).select(
            ["orderkey", "custkey"]
        )
        joined = rev.join(ok, on="orderkey", how="inner")
        name = pc.take(
            pc.take(
                nation.column("n_name").combine_chunks(),
                pc.index_in(
                    cust.column("c_nationkey"),
                    value_set=nation.column("n_nationkey").combine_chunks(),
                ),
            ),
            pc.index_in(
                pa.array(joined.get_column("custkey"), pa.int64()),
                value_set=cust.column("c_custkey").combine_chunks(),
            ),
        )
        part = pa.table({
            "n_name": name,
            "revenue": joined.get_column("revenue").to_arrow().cast(pa.float64()),
        })
        return part.group_by("n_name").aggregate(
            [("revenue", "sum")]
        ).rename_columns(["n_name", "revenue"])

    partials = lineitem.union(orders).groupby("_bucket").map_groups(
        lambda g: cogroup_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    # final fold: buckets x 25 nation rows — aggregate-sized, collected
    # vectorized (the incremental-view driver-bound contract)
    blocks = arrow_blocks(partials)
    out = (
        pl.from_arrow(pa.concat_tables(
            b.select(["n_name", "revenue"]) for b in blocks
        ))
        .group_by("n_name").agg(pl.col("revenue").sum())
    )
    tab = out.to_arrow().cast(
        pa.schema([("n_name", pa.string()), ("revenue", pa.float64())])
    )
    return tab.set_column(1, "revenue", _round2(tab.column("revenue")))


def q_top_customers(sf_dir: str):
    """Grouped sum -> global top-k with deterministic tiebreak, then
    broadcast name lookup. Top-k is a per-block keep-10 COMBINER over
    the grouped aggregate (the ``brute_force_topk`` pattern) — the
    final sort sees 10 x num_blocks rows, never the full O(customers)
    aggregate a global ``sort().limit()`` would shuffle."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"], rows_per_block=20_000)

    # per-block partial sums (arrow group_by), then the engine's
    # bucketed executor for the final per-customer sum + per-bucket
    # keep-10 — Ray's sort-aggregate over the raw rows measured ~5x
    # slower than this combiner shape at the same volume
    def partial_spend(t: pa.Table) -> pa.Table:
        return t.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum")]
        ).rename_columns(["o_custkey", "total_spent"])

    def top10_bucket(t: pa.Table) -> pa.Table:
        t = t.group_by("o_custkey").aggregate(
            [("total_spent", "sum")]
        ).rename_columns(["o_custkey", "total_spent"])
        t = t.set_column(
            t.column_names.index("total_spent"), "total_spent",
            _round2(t.column("total_spent")),
        )
        if t.num_rows <= 10:
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[("total_spent", "descending"), ("o_custkey", "ascending")],
        )
        return t.take(idx.slice(0, 10))

    partials = ds.map_batches(
        partial_spend, batch_format="pyarrow", zero_copy_batch=True
    )
    top = _bucketed_groups(
        partials, "o_custkey", top10_bucket,
        num_buckets=_buckets_for(sf_dir, "orders"),
    ).sort(["total_spent", "o_custkey"], descending=[True, False]).limit(10)
    names_ref = _broadcast_dim(sf_dir, "customer", "c_custkey", ["c_custkey", "c_name"])

    def add_name(t: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        name = _dim_lookup(names, "c_custkey", "c_name", t.column("o_custkey"))
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "c_name": name,
            "total_spent": t.column("total_spent"),
        })

    return top.map_batches(add_name, batch_format="pyarrow")


def q_orders_left_join_recent_revenue(sf_dir: str):
    """Fact-fact LEFT OUTER join (completes the §2.5 join family):
    every order with the revenue of its 1998+ shipments, NULL when none
    — same tagged-union co-group executor as ``revenue_by_nation``
    (both sides hash-bucket by orderkey, one polars left join per
    bucket of complete key groups), with the shipdate predicate pushed
    into the lineitem parquet read so pre-1998 rows never leave
    storage."""
    num_buckets = _buckets_for(sf_dir, "orders")
    cutoff = datetime(1998, 1, 1)

    def partial_rev(batch: pa.Table) -> pa.Table:
        # price and discount are 2dp decimals, so each term is EXACT on
        # a 1e-4 grid: snap to int64 ten-thousandths before summing.
        # Integer partial sums are order-independent, and the final 2dp
        # rounding is integer arithmetic too ((sum+50)//100 on both
        # sides), so no float knife-edge can ever flip a value vs the
        # oracle.
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        batch.column("l_extendedprice"),
                        pc.subtract(1.0, batch.column("l_discount")),
                    ),
                    10_000.0,
                ),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table({"orderkey": batch.column("l_orderkey"), "revenue": rev})
        t = t.group_by("orderkey").aggregate([("revenue", "sum")]).rename_columns(
            ["orderkey", "revenue"]
        )
        return pa.table({
            "orderkey": t.column("orderkey"),
            "revenue": t.column("revenue"),
            "o_orderpriority": pa.nulls(t.num_rows, pa.string()),
            "_bucket": _hash_bucket(t.column("orderkey"), num_buckets),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch.column("o_orderkey"),
            "revenue": pa.nulls(batch.num_rows, pa.int64()),
            "o_orderpriority": batch.column("o_orderpriority"),
            "_bucket": _hash_bucket(batch.column("o_orderkey"), num_buckets),
        })

    li_path = os.path.join(sf_dir, "lineitem.parquet")
    lineitem = ray.data.read_parquet(
        li_path,
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= cutoff),
        override_num_blocks=_nblocks(li_path, 20_000),
    ).map_batches(partial_rev, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority"],
        rows_per_block=20_000,
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)

    def left_join_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        rev = (
            df.filter(pl.col("revenue").is_not_null())
            .group_by("orderkey").agg(pl.col("revenue").sum())
        )
        orders_side = df.filter(pl.col("o_orderpriority").is_not_null()).select(
            ["orderkey", "o_orderpriority"]
        )
        out = orders_side.join(rev, on="orderkey", how="left").with_columns(
            # integer half-up to cents (all revenues positive); the /100
            # happens in arrow below as TRUE IEEE division — polars'
            # `/ 100.0` reciprocal-multiplies, 1 ulp off DuckDB
            cents=((pl.col("revenue") + 50) // 100)
        ).rename({"orderkey": "o_orderkey"})
        t2 = out.select(["o_orderkey", "o_orderpriority", "cents"]).to_arrow()
        return pa.table({
            "o_orderkey": t2.column("o_orderkey"),
            "o_orderpriority": t2.column("o_orderpriority"),
            "recent_revenue": pc.divide(
                pc.cast(t2.column("cents"), pa.float64()), 100.0
            ),
        }).cast(pa.schema([
            ("o_orderkey", pa.int64()),
            ("o_orderpriority", pa.string()),
            ("recent_revenue", pa.float64()),
        ]))

    return lineitem.union(orders).groupby("_bucket").map_groups(
        lambda g: left_join_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )


def q_unshipped_orders_revenue(sf_dir: str):
    """Shipping-priority query (the TPC-H Q3 shape): top-10 not-yet-
    shipped orders of BUILDING-segment customers by open revenue — a
    THREE-way fact join composed as two co-group exchanges plus a
    distributed top-k tail, never a global sort of the joined stream:

    1. custkey exchange: date-filtered orders ⋉ segment-filtered
       customers (both sides grow with SF — a broadcast would be wrong
       at scale), one polars semi join per bucket of complete key
       groups;
    2. orderkey exchange: per-batch lineitem revenue combiner (snapped
       to the exact 1e-4 grid — integer partial sums are order-
       independent) co-grouped with the surviving orders, one inner
       join per bucket, then per-bucket keep-10;
    3. final sort sees <= 10 x num_buckets rows. Both date predicates
       are pushed into the parquet reads."""
    cutoff = datetime(1998, 6, 1)
    segment = "BUILDING"
    nb_cust = _buckets_for(sf_dir, "orders")
    nb_ord = _buckets_for(sf_dir, "lineitem")

    o_path = os.path.join(sf_dir, "orders.parquet")
    c_path = os.path.join(sf_dir, "customer.parquet")
    li_path = os.path.join(sf_dir, "lineitem.parquet")

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ck": batch.column("o_custkey"),
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "o_orderdate": batch.column("o_orderdate"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "_bucket": _hash_bucket(batch.column("o_custkey"), nb_cust),
        })

    def tag_custs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "ck": batch.column("c_custkey"),
            "o_orderkey": pa.nulls(n, pa.int64()),
            "o_orderdate": pa.nulls(n, pa.timestamp("us")),
            "o_orderpriority": pa.nulls(n, pa.string()),
            "_bucket": _hash_bucket(batch.column("c_custkey"), nb_cust),
        })

    orders = ray.data.read_parquet(
        o_path,
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") < cutoff),
        override_num_blocks=_nblocks(o_path, 20_000),
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    custs = ray.data.read_parquet(
        c_path, columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == segment),
        override_num_blocks=_nblocks(c_path, 20_000),
    ).map_batches(tag_custs, batch_format="pyarrow", zero_copy_batch=True)

    _ORD = pa.schema([
        ("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string()),
    ])

    def semi_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        keys = df.filter(pl.col("o_orderkey").is_null()).select("ck")
        out = (
            df.filter(pl.col("o_orderkey").is_not_null())
            .join(keys, on="ck", how="semi")
            .select(["o_orderkey", "o_orderdate", "o_orderpriority"])
        )
        return out.to_arrow().cast(_ORD)

    building_orders = orders.union(custs).groupby("_bucket").map_groups(
        lambda g: semi_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )

    def partial_rev(batch: pa.Table) -> pa.Table:
        grid = pc.cast(pc.round(pc.multiply(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(1.0, batch.column("l_discount")),
        ), 10000.0)), pa.int64())
        t = pa.table({"o_orderkey": batch.column("l_orderkey"), "rev4": grid})
        t = t.group_by("o_orderkey").aggregate([("rev4", "sum")]).rename_columns(
            ["o_orderkey", "rev4"]
        )
        n = t.num_rows
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "rev4": t.column("rev4"),
            "o_orderdate": pa.nulls(n, pa.timestamp("us")),
            "o_orderpriority": pa.nulls(n, pa.string()),
            "_bucket": _hash_bucket(t.column("o_orderkey"), nb_ord),
        })

    def tag_building(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "rev4": pa.nulls(batch.num_rows, pa.int64()),
            "o_orderdate": batch.column("o_orderdate"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "_bucket": _hash_bucket(batch.column("o_orderkey"), nb_ord),
        })

    lineitem = ray.data.read_parquet(
        li_path, columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") > cutoff),
        override_num_blocks=_nblocks(li_path, 20_000),
    ).map_batches(partial_rev, batch_format="pyarrow", zero_copy_batch=True)
    tagged = building_orders.map_batches(
        tag_building, batch_format="pyarrow", zero_copy_batch=True
    )

    _OUT = pa.schema([
        ("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string()), ("revenue", pa.float64()),
    ])

    def join_top_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        rev = (
            df.filter(pl.col("rev4").is_not_null())
            .group_by("o_orderkey").agg(pl.col("rev4").sum())
        )
        ords = df.filter(pl.col("rev4").is_null()).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )
        out = (
            ords.join(rev, on="o_orderkey", how="inner")
            # integer half-up to cents; sort on the INT cents (exact)
            .with_columns(cents=((pl.col("rev4") + 50) // 100))
            .sort(["cents", "o_orderdate", "o_orderkey"],
                  descending=[True, False, False])
            .head(10)
            .select(["o_orderkey", "o_orderdate", "o_orderpriority", "cents"])
        )
        t2 = out.to_arrow()
        # /100 as TRUE IEEE division (pc.divide) — polars' `/ 100.0`
        # compiles to reciprocal-multiply, 1 ulp off DuckDB's exact
        # decimal quotient
        rev_f = pc.divide(pc.cast(t2.column("cents"), pa.float64()), 100.0)
        return pa.table({
            "o_orderkey": t2.column("o_orderkey"),
            "o_orderdate": t2.column("o_orderdate"),
            "o_orderpriority": t2.column("o_orderpriority"),
            "revenue": rev_f,
        }).cast(_OUT)

    return lineitem.union(tagged).groupby("_bucket").map_groups(
        lambda g: join_top_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    ).sort(
        ["revenue", "o_orderdate", "o_orderkey"],
        descending=[True, False, False],
    ).limit(10)


def q_local_supplier_revenue(sf_dir: str):
    """Local-supplier revenue (the TPC-H Q5 shape — the widest join in
    the suite): 1996 revenue per ASIA nation counting only lineitems
    whose SUPPLIER sits in the customer's own nation. THREE co-group
    exchanges chained on three different keys (custkey, orderkey,
    suppkey — each the natural co-location key of its step) with the
    fixed-cardinality dims (region, nation) broadcast:

    1. custkey: year-filtered orders ⋈ ASIA-filtered customers
       -> (orderkey, cust_nationkey);
    2. orderkey: that stream ⋈ per-batch (orderkey, suppkey) revenue
       combiners -> partials grouped (suppkey, cust_nationkey) inside
       the bucket;
    3. suppkey: ⋈ supplier, keep rows where s_nationkey ==
       cust_nationkey (the local-supplier condition), emit per-nation
       sums — the final fold sees <= 25 rows per bucket.

    Revenue on the 1e-4 integer grid end to end; /100 display division
    is true IEEE division (see unshipped_orders_revenue)."""
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).combine_chunks()
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    asia_rk = region.filter(
        pc.equal(region.column("r_name"), "ASIA")
    ).column("r_regionkey")
    asia_nations = nation.filter(
        pc.is_in(nation.column("n_regionkey"), value_set=asia_rk.combine_chunks())
    )
    asia_keys = asia_nations.column("n_nationkey").combine_chunks().cast(pa.int64())
    nation_ref = ray.put(asia_nations)

    nb_cust = _buckets_for(sf_dir, "orders")
    nb_ord = _buckets_for(sf_dir, "lineitem")
    nb_supp = _buckets_for(sf_dir, "lineitem")

    o_path = os.path.join(sf_dir, "orders.parquet")
    c_path = os.path.join(sf_dir, "customer.parquet")
    li_path = os.path.join(sf_dir, "lineitem.parquet")
    s_path = os.path.join(sf_dir, "supplier.parquet")

    # ---- exchange 1: custkey --------------------------------------
    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ck": batch.column("o_custkey"),
            "orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "nk": pa.nulls(batch.num_rows, pa.int64()),
            "_bucket": _hash_bucket(batch.column("o_custkey"), nb_cust),
        })

    def tag_custs(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column("c_nationkey").cast(pa.int64()), value_set=asia_keys
        )
        batch = batch.filter(mask)
        return pa.table({
            "ck": batch.column("c_custkey"),
            "orderkey": pa.nulls(batch.num_rows, pa.int64()),
            "nk": batch.column("c_nationkey").cast(pa.int64()),
            "_bucket": _hash_bucket(batch.column("c_custkey"), nb_cust),
        })

    orders = ray.data.read_parquet(
        o_path, columns=["o_orderkey", "o_custkey"],
        filter=(
            (pc.field("o_orderdate") >= datetime(1996, 1, 1))
            & (pc.field("o_orderdate") < datetime(1997, 1, 1))
        ),
        override_num_blocks=_nblocks(o_path, 20_000),
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    custs = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey"], rows_per_block=20_000
    ).map_batches(tag_custs, batch_format="pyarrow", zero_copy_batch=True)

    _OK = pa.schema([("orderkey", pa.int64()), ("nk", pa.int64())])

    def cust_join_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        cust = df.filter(pl.col("orderkey").is_null()).select(["ck", "nk"])
        out = (
            df.filter(pl.col("orderkey").is_not_null())
            .select(["ck", "orderkey"])
            .join(cust, on="ck", how="inner")
            .select(["orderkey", "nk"])
        )
        return out.to_arrow().cast(_OK)

    ordnat = orders.union(custs).groupby("_bucket").map_groups(
        lambda g: cust_join_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )

    # ---- exchange 2: orderkey -------------------------------------
    def tag_ordnat(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch.column("orderkey"),
            "nk": batch.column("nk"),
            "suppkey": pa.nulls(batch.num_rows, pa.int64()),
            "rev4": pa.nulls(batch.num_rows, pa.int64()),
            "_bucket": _hash_bucket(batch.column("orderkey"), nb_ord),
        })

    def partial_rev(batch: pa.Table) -> pa.Table:
        grid = pc.cast(pc.round(pc.multiply(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(1.0, batch.column("l_discount")),
        ), 10000.0)), pa.int64())
        t = pa.table({
            "orderkey": batch.column("l_orderkey").cast(pa.int64()),
            "suppkey": batch.column("l_suppkey").cast(pa.int64()),
            "rev4": grid,
        }).group_by(["orderkey", "suppkey"]).aggregate(
            [("rev4", "sum")]
        ).rename_columns(["orderkey", "suppkey", "rev4"])
        return pa.table({
            "orderkey": t.column("orderkey"),
            "nk": pa.nulls(t.num_rows, pa.int64()),
            "suppkey": t.column("suppkey"),
            "rev4": t.column("rev4"),
            "_bucket": _hash_bucket(t.column("orderkey"), nb_ord),
        })

    lineitem = ray.data.read_parquet(
        li_path, columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                          "l_discount"],
        override_num_blocks=_nblocks(li_path, 20_000),
    ).map_batches(partial_rev, batch_format="pyarrow", zero_copy_batch=True)

    _SUPP = pa.schema([
        ("suppkey", pa.int64()), ("nk", pa.int64()), ("rev4", pa.int64()),
    ])

    def order_join_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        nat = df.filter(pl.col("suppkey").is_null()).select(["orderkey", "nk"])
        out = (
            df.filter(pl.col("suppkey").is_not_null())
            .select(["orderkey", "suppkey", "rev4"])
            .join(nat, on="orderkey", how="inner")
            .group_by(["suppkey", "nk"]).agg(pl.col("rev4").sum())
            .select(["suppkey", "nk", "rev4"])
        )
        return out.to_arrow().cast(_SUPP)

    suppnat = ordnat.map_batches(
        tag_ordnat, batch_format="pyarrow", zero_copy_batch=True
    ).union(lineitem).groupby("_bucket").map_groups(
        lambda g: order_join_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )

    # ---- exchange 3: suppkey + the local-supplier filter ----------
    def tag_suppnat(batch: pa.Table) -> pa.Table:
        return pa.table({
            "suppkey": batch.column("suppkey"),
            "nk": batch.column("nk"),
            "rev4": batch.column("rev4"),
            "snk": pa.nulls(batch.num_rows, pa.int64()),
            "_bucket": _hash_bucket(batch.column("suppkey"), nb_supp),
        })

    def tag_suppliers(batch: pa.Table) -> pa.Table:
        return pa.table({
            "suppkey": batch.column("s_suppkey").cast(pa.int64()),
            "nk": pa.nulls(batch.num_rows, pa.int64()),
            "rev4": pa.nulls(batch.num_rows, pa.int64()),
            "snk": batch.column("s_nationkey").cast(pa.int64()),
            "_bucket": _hash_bucket(batch.column("s_suppkey"), nb_supp),
        })

    suppliers = _read(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"], rows_per_block=20_000
    ).map_batches(tag_suppliers, batch_format="pyarrow", zero_copy_batch=True)

    _NAT = pa.schema([("nk", pa.int64()), ("rev4", pa.int64())])

    def supp_join_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        supp = df.filter(pl.col("snk").is_not_null()).select(["suppkey", "snk"])
        out = (
            df.filter(pl.col("rev4").is_not_null())
            .select(["suppkey", "nk", "rev4"])
            .join(supp, on="suppkey", how="inner")
            .filter(pl.col("nk") == pl.col("snk"))
            .group_by("nk").agg(pl.col("rev4").sum())
        )
        return out.to_arrow().cast(_NAT)

    partials = suppnat.map_batches(
        tag_suppnat, batch_format="pyarrow", zero_copy_batch=True
    ).union(suppliers).groupby("_bucket").map_groups(
        lambda g: supp_join_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )

    # ---- final fold: <= 25 rows per bucket ------------------------
    blocks = [b for b in arrow_blocks(partials) if b.num_rows]
    schema = pa.schema([("n_name", pa.string()), ("revenue", pa.float64())])
    if not blocks:
        return schema.empty_table()
    folded = (
        pl.from_arrow(pa.concat_tables(blocks))
        .group_by("nk").agg(pl.col("rev4").sum())
        .with_columns(cents=((pl.col("rev4") + 50) // 100))
    ).to_arrow()
    names = _dim_lookup(
        ray.get(nation_ref).set_column(
            0, "n_nationkey",
            ray.get(nation_ref).column("n_nationkey").cast(pa.int64()),
        ),
        "n_nationkey", "n_name", folded.column("nk"),
    )
    return pa.table({
        "n_name": names,
        "revenue": pc.divide(
            pc.cast(folded.column("cents"), pa.float64()), 100.0
        ),
    }).cast(schema)


def q_order_priority_count(sf_dir: str):
    """Date-range count — predicate pushed into the parquet read."""
    o_path = os.path.join(sf_dir, "orders.parquet")
    ds = ray.data.read_parquet(
        o_path,
        columns=["o_orderpriority"],
        filter=(
            (pc.field("o_orderdate") >= datetime(1996, 1, 1))
            & (pc.field("o_orderdate") < datetime(1998, 1, 1))
        ),
        override_num_blocks=_nblocks(o_path, 20_000),
    )
    return ds.groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))


def q_asof_last_signup(sf_dir: str):
    """As-of join (custom operator per SURVEY §2.5 rule): for each
    purchase event, the user's most recent signup at or before it.
    Vectorized bucket kernel: ONE keyed ``join_asof`` (``by=user_id``)
    per ~N/64 users — the partitioning assumption is per-key bucketing;
    no global sort, no per-user Python."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"], rows_per_block=20_000)

    def asof_bucket(t: pa.Table) -> pa.Table:
        import warnings

        # polars can't VERIFY sortedness under `by` groups (we sort two
        # lines up); the warning is noise in worker logs
        warnings.filterwarnings(
            "ignore", message="Sortedness of columns cannot be checked"
        )
        df = pl.from_arrow(t)
        purchases = df.filter(pl.col("event_type") == "purchase").sort(
            ["ts", "event_id"]
        )
        signups = (
            df.filter(pl.col("event_type") == "signup")
            .select(["user_id", pl.col("ts").alias("last_signup_ts")])
            .sort("last_signup_ts")
        )
        merged = purchases.join_asof(
            signups, left_on="ts", right_on="last_signup_ts",
            by="user_id", strategy="backward",
        ).select(["event_id", "user_id", "last_signup_ts"])
        return merged.to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("last_signup_ts", pa.timestamp("us")),
        ]))

    return _bucketed_groups(ds, "user_id", asof_bucket, num_buckets=_buckets_for(sf_dir))


def q_customers_without_orders(sf_dir: str):
    """Anti join via broadcast key set (SURVEY §2.5 'semi/anti join'
    mapping): customers with no order since 1999. The DISTINCT key set
    is computed DISTRIBUTED (per-batch unique combiner + ``unique()``
    shuffle over keys only — the orders fact table never reaches the
    driver); only the deduplicated keys are ``ray.put`` once."""
    cutoff = datetime(1999, 1, 1)

    def recent_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("o_orderdate"), pa.scalar(cutoff)))
        return pa.table({"o_custkey": pc.unique(t.column("o_custkey"))})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"], rows_per_block=20_000).map_batches(
        recent_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    keys = orders.unique("o_custkey")  # distributed distinct; small result
    keys_ref = ray.put(pa.array(sorted(keys), pa.int64()))
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"], rows_per_block=20_000)

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pc.invert(pc.is_in(batch.column("c_custkey"), value_set=keys))
        return batch.filter(mask)

    return ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


def q_distinct_segments(sf_dir: str):
    """Distinct values (``Dataset.unique`` — a shuffle op)."""
    ds = _read(sf_dir, "customer", ["c_mktsegment"], rows_per_block=20_000)
    vals = ds.unique("c_mktsegment")
    return pa.table({"c_mktsegment": pa.array(sorted(vals), pa.string())})


# ---------------------------------------------------------------------------
# Text analysis / dedup / ANN over `documents` + `embeddings`
# ---------------------------------------------------------------------------

def q_doc_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)
    out = ds.map_batches(annotate_text_stats, batch_format="pyarrow",
                         zero_copy_batch=True)
    return out.select_columns(
        ["doc_id", "n_tokens", "n_chars_computed", "n_punct", "n_stop", "quality"]
    )


def q_lang_id(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"), "lang_pred": ts.lang_id(t.column("text"))}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


#: Per-query observability side-channel: dedup queries record their
#: ``capped_dropped_pairs`` here after each run so harnesses (bench,
#: CLI) can surface silent-recall-loss regressions as first-class
#: counters without changing the query return shape.
OBSERVED: dict[str, dict] = {}


def _observe(name: str, res: dict) -> None:
    OBSERVED[name] = {
        "capped_dropped_pairs": int(res.get("capped_dropped_pairs", 0))
    }


def q_dedup_exact_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)
    return exact_dedup(ds)


def q_doc_fingerprint(sf_dir: str):
    """Rolling-hash document fingerprint; the oracle folds the same
    polynomial hash in SQL via nested ``list_reduce`` (HUGEINT)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"),
             "fingerprint": ts.fingerprint_column(t.column("text"))}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_minhash_dedup_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    res = minhash_dedup(
        ds, threshold=0.8, concurrency=_pool_for(sf_dir, "documents", 800)
    )
    _observe("minhash_dedup_docs", res)
    return res["survivors_ds"]  # distributed survivors (doc_id column)


def q_simhash_dedup_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    res = simhash_dedup(
        ds, max_hamming=3, concurrency=_pool_for(sf_dir, "documents", 800)
    )
    _observe("simhash_dedup_docs", res)
    return res["survivors_ds"]


def q_embedding_dedup(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    res = embedding_dedup(
        ds, dim=64, threshold=0.95,
        concurrency=_pool_for(sf_dir, "embeddings", 2000),
    )
    _observe("embedding_dedup", res)
    return res["survivors_ds"]


def q_jaccard_dedup_docs(sf_dir: str):
    """Exact prefix-blocked n-gram-Jaccard dedup — the ORACLE-CHECKED
    member of the near-dup family: blocking (shared 24-char prefix),
    trigram Jaccard >= 0.8 verify, and transitive-closure clustering
    are all SQL-expressible (recursive CTE on the oracle side; the
    engine resolves clusters with distributed min-label propagation)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    res = jaccard_dedup(ds, threshold=0.8, block_prefix_len=24)
    _observe("jaccard_dedup_docs", res)
    return res["survivors_ds"]


def q_top2_events_per_user(sf_dir: str):
    """Per-group top-k (window-function shape): each user's two highest-
    value events, deterministic tiebreak by event_id. Vectorized bucket
    kernel: one sort + grouped row-number per ~N/64 users."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"], rows_per_block=20_000)

    def top2_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(
            ["user_id", "value", "event_id"], descending=[False, True, False]
        )
        out = (
            df.with_columns(
                (pl.int_range(pl.len()).over("user_id") + 1).alias("rank")
            )
            .filter(pl.col("rank") <= 2)
            .select(["user_id", "event_id", "value", "rank"])
        )
        return out.to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("event_id", pa.int64()),
            ("value", pa.float64()), ("rank", pa.int64()),
        ]))

    return _bucketed_groups(ds, "user_id", top2_bucket, num_buckets=_buckets_for(sf_dir))


def q_cumulative_value_per_user(sf_dir: str):
    """Running (cumulative) aggregate over the ordered per-user log —
    grouped ``cum_sum`` is a sequential fold per group (same operation
    order as the SQL windowed sum, so round(.,2) is hash-stable).
    Vectorized bucket kernel: one polars call per ~N/64 users."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"], rows_per_block=20_000)

    def cum_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        out = df.with_columns(
            pl.col("value").cum_sum().over("user_id").alias("cum_value")
        ).select(["event_id", "user_id", "cum_value"]).to_arrow()
        cs = out.column("cum_value").to_numpy(zero_copy_only=False)
        # half-away-from-zero (DuckDB round parity; np.round is half-even)
        rounded = np.sign(cs) * np.floor(np.abs(cs) * 100 + 0.5) / 100
        out = out.set_column(
            out.column_names.index("cum_value"), "cum_value",
            pa.array(rounded, pa.float64()),
        )
        return out.cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("cum_value", pa.float64()),
        ]))

    return _bucketed_groups(ds, "user_id", cum_bucket, num_buckets=_buckets_for(sf_dir))


def grouped_quantiles_distributed(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    ps: list[float],
    *,
    num_value_buckets: int = 512,
) -> dict:
    """EXACT grouped quantiles (``quantile_cont`` linear interpolation)
    with NO task ever holding a full group — the distributed
    order-statistic selection pattern:

    1. per-group ``count/min/max`` (one tiny grouped aggregate);
    2. a value-range histogram: every batch bins its values into
       ``num_value_buckets`` per-group buckets and emits ONE fixed-size
       count vector per group (a combiner — no shuffle; the driver sums
       a few KB per block, exactly the HLL-sketch shape);
    3. the cumulative histogram locates, for each needed rank
       ``floor/ceil((n-1)*p)``, its bucket and in-bucket offset; ONLY
       rows of those target buckets (~n/num_value_buckets each) are
       filtered out and each bucket task ``np.sort``s its slice to read
       the requested order statistics.

    Exactness: bucket assignment is monotone in the value, so global
    rank r lives in the bucket where the cumulative count first reaches
    r+1, at in-bucket rank ``r - cum_before`` — the same value a full
    sort would yield, bit-for-bit. Returns
    ``{group: {p: interpolated_value}}`` (un-rounded)."""
    stats = ds.groupby(group_col).aggregate(
        Count(),
        Min(value_col, alias_name="_mn"),
        Max(value_col, alias_name="_mx"),
    ).take_all()
    B = num_value_buckets
    info: dict = {}
    for r in stats:
        n = int(r["count()"])
        ranks: set[int] = set()
        for p in ps:
            h = (n - 1) * p
            ranks.add(int(np.floor(h)))
            ranks.add(int(np.ceil(h)))
        info[r[group_col]] = {
            "n": n, "mn": r["_mn"], "mx": r["_mx"], "ranks": sorted(ranks),
        }
    todo = {g: v for g, v in info.items() if v["mn"] < v["mx"]}

    def bucket_of(vals: np.ndarray, mn: float, mx: float) -> np.ndarray:
        # shared by the count and select passes — assignment must be
        # IDENTICAL in both (monotone; ties collapse into one bucket)
        idx = np.floor((vals - mn) / (mx - mn) * B).astype(np.int64)
        return np.clip(idx, 0, B - 1)

    hist: dict = {g: np.zeros(B, dtype=np.int64) for g in todo}
    if todo:
        bounds_ref = ray.put({g: (v["mn"], v["mx"]) for g, v in todo.items()})

        def hist_batch(t: pa.Table) -> pa.Table:
            bounds = ray.get(bounds_ref)
            keys = t.column(group_col).combine_chunks()
            vals = t.column(value_col).to_numpy(zero_copy_only=False)
            enc = pc.dictionary_encode(keys)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            out_g, out_h = [], []
            for code in range(len(enc.dictionary)):
                g = enc.dictionary[code].as_py()
                if g not in bounds:
                    continue
                mn, mx = bounds[g]
                sub = vals[codes == code]
                counts = np.bincount(bucket_of(sub, mn, mx), minlength=B)
                out_g.append(g)
                out_h.append(counts.astype(np.int64).tolist())
            return pa.table(
                {"g": pa.array(out_g, keys.type),
                 "h": pa.array(out_h, pa.list_(pa.int64()))}
            )

        partials = ds.map_batches(
            hist_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        for b in partials.iter_batches(batch_format="pyarrow"):
            for g, h in zip(b.column("g").to_pylist(), b.column("h").to_pylist()):
                hist[g] += np.asarray(h, dtype=np.int64)

    # rank -> (bucket, in-bucket offset) via the cumulative histogram
    needed: dict = {}  # (g, bucket) -> {rank: offset}
    for g, v in todo.items():
        cum = np.cumsum(hist[g])
        for rk in v["ranks"]:
            bk = int(np.searchsorted(cum, rk + 1))
            prev = int(cum[bk - 1]) if bk > 0 else 0
            needed.setdefault((g, bk), {})[rk] = rk - prev

    order_stat: dict = {}  # (g, rank) -> value
    if needed:
        need_ref = ray.put(
            {"bounds": {g: (v["mn"], v["mx"]) for g, v in todo.items()},
             "buckets": {g: sorted(b for gg, b in needed if gg == g)
                         for g in todo}}
        )

        def pick(t: pa.Table) -> pa.Table:
            need = ray.get(need_ref)
            keys = t.column(group_col).combine_chunks()
            vals = t.column(value_col).to_numpy(zero_copy_only=False)
            enc = pc.dictionary_encode(keys)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            out_g, out_b, out_v = [], [], []
            for code in range(len(enc.dictionary)):
                g = enc.dictionary[code].as_py()
                if g not in need["bounds"]:
                    continue
                mn, mx = need["bounds"][g]
                mask = codes == code
                sub = vals[mask]
                bks = bucket_of(sub, mn, mx)
                keep = np.isin(bks, need["buckets"][g])
                out_g.extend([g] * int(keep.sum()))
                out_b.extend(bks[keep].tolist())
                out_v.extend(sub[keep].tolist())
            return pa.table(
                {"g": pa.array(out_g, keys.type),
                 "_vb": pa.array(out_b, pa.int64()),
                 "v": pa.array(out_v, pa.float64())}
            )

        offsets_by_gb = {k: v for k, v in needed.items()}

        def order_stats(grp: pa.Table) -> pa.Table:
            g = grp.column("g")[0].as_py()
            bk = grp.column("_vb")[0].as_py()
            offs = offsets_by_gb[(g, bk)]
            vals = np.sort(grp.column("v").to_numpy(zero_copy_only=False))
            return pa.table(
                {"g": pa.array([g] * len(offs), grp.schema.field("g").type),
                 "rank": pa.array(list(offs.keys()), pa.int64()),
                 "val": pa.array([float(vals[o]) for o in offs.values()],
                                  pa.float64())}
            )

        picked = ds.map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        )
        res = picked.groupby(["g", "_vb"]).map_groups(
            order_stats, batch_format="pyarrow"
        )
        for b in res.iter_batches(batch_format="pyarrow"):
            if b.num_rows == 0 or "g" not in b.column_names:
                continue  # Ray 2.49 groupby: zero-column empty blocks
            for g, rk, val in zip(
                b.column("g").to_pylist(), b.column("rank").to_pylist(),
                b.column("val").to_pylist(),
            ):
                order_stat[(g, rk)] = val

    out: dict = {}
    for g, v in info.items():
        n = v["n"]
        out[g] = {}
        for p in ps:
            if v["mn"] >= v["mx"]:  # constant group: every order stat == mn
                out[g][p] = float(v["mn"])
                continue
            h = (n - 1) * p
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            vlo, vhi = order_stat[(g, lo)], order_stat[(g, hi)]
            out[g][p] = vlo + (h - lo) * (vhi - vlo)
    return out


def _round2_half_away(x: float) -> float:
    # half-away-from-zero (DuckDB round parity; Python round is half-even)
    return float(np.sign(x) * np.floor(np.abs(x) * 100 + 0.5) / 100)


def q_value_percentile_by_type(sf_dir: str):
    """GLOBAL percent_rank within each group, distributed — the window
    op per-key bucketing cannot bound (a key's rank needs its WHOLE
    group ordered, and groups here are few and huge). Same
    histogram-offset machinery as the exact quantiles, inverted:

    1. per-group count/min/max;
    2. per-(group, value-bucket) histogram via the per-batch combiner
       (driver sums a fixed-size vector per group per block);
    3. cumulative bucket offsets give every bucket its global rank
       base; rows shuffle ONLY by (group, bucket) (~n/512 rows per
       task), where a vectorized searchsorted assigns each row
       ``offset + #strictly-smaller-in-bucket`` — exactly SQL's
       ``percent_rank()`` numerator, with no task holding a group.

    Output: (event_id, pct_rank) rounded 6dp half-away (oracle
    parity)."""
    B = 512
    ds = _read(
        sf_dir, "events", ["event_id", "event_type", "value"],
        rows_per_block=20_000,
    )
    stats = ds.groupby("event_type").aggregate(
        Count(),
        Min("value", alias_name="_mn"),
        Max("value", alias_name="_mx"),
    ).take_all()
    info = {
        r["event_type"]: (int(r["count()"]), r["_mn"], r["_mx"])
        for r in stats
    }
    spread = {g: v for g, v in info.items() if v[1] < v[2]}

    def bucket_of(vals: np.ndarray, mn: float, mx: float) -> np.ndarray:
        idx = np.floor((vals - mn) / (mx - mn) * B).astype(np.int64)
        return np.clip(idx, 0, B - 1)

    hist = {g: np.zeros(B, dtype=np.int64) for g in spread}
    if spread:
        bounds_ref = ray.put({g: (v[1], v[2]) for g, v in spread.items()})

        def hist_batch(t: pa.Table) -> pa.Table:
            bounds = ray.get(bounds_ref)
            keys = t.column("event_type").combine_chunks()
            vals = t.column("value").to_numpy(zero_copy_only=False)
            enc = pc.dictionary_encode(keys)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            out_g, out_h = [], []
            for code in range(len(enc.dictionary)):
                g = enc.dictionary[code].as_py()
                if g not in bounds:
                    continue
                mn, mx = bounds[g]
                counts = np.bincount(
                    bucket_of(vals[codes == code], mn, mx), minlength=B
                )
                out_g.append(g)
                out_h.append(counts.astype(np.int64).tolist())
            return pa.table(
                {"g": pa.array(out_g, keys.type),
                 "h": pa.array(out_h, pa.list_(pa.int64()))}
            )

        for b in ds.map_batches(
            hist_batch, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            for g, h in zip(b.column("g").to_pylist(), b.column("h").to_pylist()):
                hist[g] += np.asarray(h, dtype=np.int64)

    # global rank base per (group, bucket) = rows in earlier buckets
    offsets = {
        g: np.concatenate(([0], np.cumsum(hist[g])[:-1])) for g in spread
    }
    ctx_ref = ray.put(
        {"bounds": {g: (v[1], v[2]) for g, v in spread.items()},
         "offsets": offsets,
         "n": {g: v[0] for g, v in info.items()}}
    )

    def route(t: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        keys = t.column("event_type").combine_chunks()
        vals = t.column("value").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        # constant groups (rank 0 everywhere) spread by id-hash so no
        # task ever holds a whole group, degenerate or not
        vb = (ids.astype(np.uint64) % np.uint64(B)).astype(np.int64)
        for code in range(len(enc.dictionary)):
            g = enc.dictionary[code].as_py()
            if g in ctx["bounds"]:
                mn, mx = ctx["bounds"][g]
                mask = codes == code
                vb[mask] = bucket_of(vals[mask], mn, mx)
        return pa.table(
            {"event_id": t.column("event_id"), "g": keys,
             "v": t.column("value"), "_vb": pa.array(vb)}
        )

    def rank_bucket(grp: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        g = grp.column("g")[0].as_py()
        n = ctx["n"][g]
        if g not in ctx["offsets"]:  # constant group: every row tied
            pct = np.zeros(grp.num_rows)
        else:
            base = int(ctx["offsets"][g][grp.column("_vb")[0].as_py()])
            v = grp.column("v").to_numpy(zero_copy_only=False)
            sv = np.sort(v)
            # strictly-smaller count = SQL rank()-1 (ties share rank)
            rank = base + np.searchsorted(sv, v, side="left")
            pct = rank / (n - 1) if n > 1 else np.zeros(grp.num_rows)
        pct = np.sign(pct) * np.floor(np.abs(pct) * 1e6 + 0.5) / 1e6
        return pa.table(
            {"event_id": grp.column("event_id"),
             "pct_rank": pa.array(pct, pa.float64())}
        )

    return ds.map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["g", "_vb"]).map_groups(rank_bucket, batch_format="pyarrow")


def q_median_value_by_type(sf_dir: str):
    """Exact median per group via the DISTRIBUTED order-statistic
    selection (``grouped_quantiles_distributed``): no task holds a full
    group — the r2 ``map_groups`` shape held n/5 rows per task, an OOM
    at 100x. quantile_cont interpolation, bit-exact vs the oracle."""
    ds = _read(sf_dir, "events", ["event_type", "value"], rows_per_block=20_000)
    qs = grouped_quantiles_distributed(ds, "event_type", "value", [0.5])
    groups = sorted(qs)
    return pa.table(
        {"event_type": pa.array(groups, pa.string()),
         "median_value": pa.array(
             [_round2_half_away(qs[g][0.5]) for g in groups], pa.float64())}
    )


def q_value_quantiles_by_type(sf_dir: str):
    """Exact grouped multi-quantiles (p25/p50/p75/p90): ONE distributed
    selection pass serves all four quantiles (the histogram and target
    buckets are shared), with quantile_cont interpolation."""
    ds = _read(sf_dir, "events", ["event_type", "value"], rows_per_block=20_000)
    ps = [0.25, 0.5, 0.75, 0.9]
    qs = grouped_quantiles_distributed(ds, "event_type", "value", ps)
    groups = sorted(qs)
    cols: dict = {"event_type": pa.array(groups, pa.string())}
    for name, p in zip(["p25", "p50", "p75", "p90"], ps):
        cols[name] = pa.array(
            [_round2_half_away(qs[g][p]) for g in groups], pa.float64()
        )
    return pa.table(cols)


def q_event_type_pivot(sf_dir: str):
    """Pivot (long -> wide): per-user event counts as one column per
    event type. Per-batch conditional-count combiner (vectorized
    boolean sums), then grouped sums — the classic warehouse pivot via
    filtered aggregation; the oracle uses ``count(*) FILTER``."""
    types = ["click", "view", "purchase", "signup", "error"]
    ds = _read(sf_dir, "events", ["user_id", "event_type"], rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = df.group_by("user_id").agg(
            *[
                (pl.col("event_type") == ty).sum().cast(pl.Int64)
                .alias(f"n_{ty}")
                for ty in types
            ]
        )
        return out.to_arrow()

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("user_id").aggregate(
        *[Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in types]
    )


def q_rollup_doc_counts(sf_dir: str):
    """Multi-level aggregate (ROLLUP): doc counts + char sums at
    (lang, source), (lang) and grand-total levels in one result, NULLs
    marking the rolled-up columns. Scale shape: ONE distributed pass
    computes the finest aggregate; the coarser levels are derived from
    that aggregate-sized table (|lang| x |source| rows collected as
    Arrow blocks) — never a second scan of the corpus per level."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"],
               rows_per_block=20_000)
    agg = ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    blocks = arrow_blocks(agg)
    fine = pl.from_arrow(pa.concat_tables(
        b.select(["lang", "source", "n_docs", "sum_chars"]) for b in blocks
    )).with_columns(
        pl.col("n_docs").cast(pl.Int64), pl.col("sum_chars").cast(pl.Int64)
    )
    sums = [pl.col("n_docs").sum(), pl.col("sum_chars").sum()]
    lang_lvl = fine.group_by("lang").agg(sums).with_columns(
        pl.lit(None, dtype=pl.String).alias("source")
    )
    total = fine.select(sums).with_columns(
        pl.lit(None, dtype=pl.String).alias("lang"),
        pl.lit(None, dtype=pl.String).alias("source"),
    )
    cols = ["lang", "source", "n_docs", "sum_chars"]
    out = pl.concat([fine.select(cols), lang_lvl.select(cols),
                     total.select(cols)])
    return out.to_arrow().cast(pa.schema([
        ("lang", pa.string()), ("source", pa.string()),
        ("n_docs", pa.int64()), ("sum_chars", pa.int64()),
    ]))


def q_funnel_signup_purchase(sf_dir: str):
    """Funnel / event-sequence analysis: for each user, the first
    purchase STRICTLY AFTER their first signup (conversion pairs).
    Same bucketed per-key vectorized shape as the window family — one
    polars kernel per ~500k-row bucket of complete user groups; the
    event-type filter is pushed into the parquet read so only funnel
    events leave storage."""
    ev_path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(
        ev_path,
        columns=["ts", "user_id", "event_type"],
        filter=pc.field("event_type").isin(["signup", "purchase"]),
        override_num_blocks=_nblocks(ev_path, 20_000),
    )

    def funnel_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        s = (
            df.filter(pl.col("event_type") == "signup")
            .group_by("user_id").agg(pl.col("ts").min().alias("signup_ts"))
        )
        conv = (
            df.filter(pl.col("event_type") == "purchase")
            .join(s, on="user_id", how="inner")
            .filter(pl.col("ts") > pl.col("signup_ts"))
            .group_by("user_id")
            .agg(
                pl.col("signup_ts").first(),
                pl.col("ts").min().alias("first_purchase_ts"),
            )
        )
        return conv.select(
            ["user_id", "signup_ts", "first_purchase_ts"]
        ).to_arrow().cast(pa.schema([
            ("user_id", pa.int64()),
            ("signup_ts", pa.timestamp("us")),
            ("first_purchase_ts", pa.timestamp("us")),
        ]))

    return _bucketed_groups(
        ds, "user_id", funnel_bucket, num_buckets=_buckets_for(sf_dir)
    )


_SAMPLE_MULT = 2654435761  # Knuth multiplicative hash (SQL-expressible)
_SAMPLE_MOD = 1 << 32


def q_sample_documents(sf_dir: str):
    """Deterministic 10% sample via multiplicative hashing — the
    reproducible train/val-split primitive (same row set on every run,
    engine and SQL alike; unlike seeded RNG sampling, it is stable
    under repartitioning and expressible in SQL)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"], rows_per_block=2_000)
    thresh = _SAMPLE_MOD // 10

    def pick(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply_checked(
                t.column("doc_id").cast(pa.int64()), _SAMPLE_MULT
            ),
            _SAMPLE_MOD - 1,
        )
        return t.filter(pc.less(h, thresh))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


#: The decontamination benchmark slice: the lower half of the doc-id
#: space stands in for a held-out eval set (scale-free, so the
#: operator is meaningful at every sf tier; benchmark corpora are
#: SMALL by definition, so broadcasting their n-gram hash set is the
#: scale shape — never a shuffle join against the training corpus).
_DECON_NGRAM = 8
#: SQL form of the benchmark boundary (engine mirrors via the footer
#: row count — documents doc_ids are dense 0..n-1 in the test data).
_DECON_BENCH_SQL = "(SELECT count(*) // 2 FROM documents)"


def _decon_bench_max(sf_dir: str) -> int:
    return pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows // 2


def _gram_hash_list(text: str | None) -> list[int]:
    """blake2b-int64 hashes of the doc's word 8-grams (token runs
    ``[A-Za-z0-9]+``, space-joined — in lock-step with the SQL
    oracle's ``array_to_string(tk[i:i+7], ' ')``)."""
    import hashlib as _hl
    import re as _re

    toks = _re.findall(r"[A-Za-z0-9]+", text or "")
    n = _DECON_NGRAM
    return [
        int.from_bytes(
            _hl.blake2b(
                " ".join(toks[i : i + n]).encode("utf-8"), digest_size=8
            ).digest(),
            "little",
        ) >> 1
        for i in range(len(toks) - n + 1)
    ]


def _gram_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, hash) pairs for every word 8-gram of every text in the
    batch — vectorized end-to-end: polars tokenize -> explode ->
    shifted concat_str -> 64-bit hash (one kernel call each; replaces a
    python blake2b loop over ~100 grams/doc). Hashes are consistent
    only WITHIN one engine run (bench and corpus sides both compute
    them with this kernel, same polars version + fixed seed, verified
    deterministic across worker processes) — which is all
    set-membership needs; the ORACLE compares gram STRINGS. Collision
    odds at 64 bits: ~n^2/2^65, ~1e-6 at 10M grams."""
    n = _DECON_NGRAM
    ex = (
        pl.from_arrow(pa.table({"text": texts}))
        .with_row_index("rid")
        .select(
            pl.col("rid").cast(pl.Int64),
            pl.col("text").str.extract_all(r"[A-Za-z0-9]+").alias("tk"),
        )
        .explode("tk")
        .drop_nulls("tk")
    )
    if ex.height == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    g = (
        ex.with_columns(
            *[pl.col("tk").shift(-i).alias(f"w{i}") for i in range(1, n)],
            pl.col("rid").shift(-(n - 1)).alias("rid_end"),
        )
        .filter(pl.col("rid") == pl.col("rid_end"))
        .select(
            pl.col("rid"),
            pl.concat_str(
                [pl.col("tk"), *[pl.col(f"w{i}") for i in range(1, n)]],
                separator=" ",
            ).hash(seed=42).alias("h"),
        )
    )
    rid = g["rid"].to_numpy().astype(np.int64)
    h = (g["h"].to_numpy() >> np.uint64(1)).astype(np.int64)
    return rid, h


def _membership_hits(rid: np.ndarray, h: np.ndarray, bench_sorted: np.ndarray,
                     num_rows: int) -> np.ndarray:
    """Per-row bool: does any of the row's gram hashes appear in the
    SORTED bench array (searchsorted membership — no Python set)."""
    hit = np.zeros(num_rows, dtype=bool)
    if h.size and bench_sorted.size:
        idx = np.searchsorted(bench_sorted, h)
        m = (idx < bench_sorted.size) & (
            bench_sorted[np.minimum(idx, bench_sorted.size - 1)] == h
        )
        hit[rid[m]] = True
    return hit


def _bench_gram_array(ds: ray.data.Dataset, bench_max: int) -> np.ndarray:
    """SORTED distinct gram-hash array of the benchmark slice
    (doc_id < bench_max) — the broadcast side of every decontamination
    variant: distinct-per-batch int64 partials, one driver
    ``np.unique`` fold (benchmark-bounded by definition)."""

    def bench_grams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("doc_id"), bench_max))
        _, h = _gram_hashes_batch(t.column("text"))
        return pa.table({"h": pa.array(np.unique(h), pa.int64())})

    parts = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in ds.map_batches(
            bench_grams, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def q_decontaminate_ngrams(sf_dir: str):
    """Benchmark DECONTAMINATION (the train/eval-overlap filter every
    LLM data pipeline needs): drop any training document sharing an
    8-gram with the benchmark slice. The benchmark's n-gram hash set is
    computed distributed, collected once (benchmark-bounded — eval sets
    are small by definition) and broadcast via ``ray.put`` as a SORTED
    int64 array (searchsorted membership, no Python set); the corpus
    then streams through a vectorized anti-filter. Only benchmark
    grams ever leave their tasks — the training corpus is never
    shuffled. Gram hashing is the vectorized 64-bit kernel
    ``_gram_hashes_batch`` (the oracle compares gram STRINGS)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"], rows_per_block=2_000)
    bench_max = _decon_bench_max(sf_dir)
    bench_ref = ray.put(_bench_gram_array(ds, bench_max))

    def anti(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        t = t.filter(
            pc.greater_equal(t.column("doc_id"), bench_max)
        )
        rid, h = _gram_hashes_batch(t.column("text"))
        hit = _membership_hits(rid, h, bench, t.num_rows)
        return t.filter(pa.array(~hit)).select(["doc_id", "lang"])

    return ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


def q_decontaminate_bloom(sf_dir: str):
    """Bloom-prefiltered EXACT decontamination — the 100-TB shape of
    ``decontaminate_ngrams``. The exact variant broadcasts the full
    benchmark gram-hash SET (~50 MB per million grams as a Python set);
    here the bulk stream holds only a Bloom filter (10 bits/gram ≈
    1.2 MB per million, mergeable by OR) and exactness is restored by a
    distributed semi-join instead of a bigger broadcast:

    1. benchmark gram hashes -> distinct-per-batch int64 rows,
       materialized (ints only, benchmark-bounded);
    2. driver folds them into the bloom (vectorized ``bloom_add`` per
       batch) -> ``ray.put`` once;
    3. the corpus streams ONCE against the bloom, emitting (doc_id, h)
       rows ONLY for bloom-positive grams (volume = true hits + the
       ~1% false-positive tail — never the corpus);
    4. candidates verify via a bucketed co-group semi-join against the
       bench gram rows: bloom has NO false negatives, the join kills
       its false positives;
    5. a final TEXT-FREE pass anti-filters the matched doc_ids
       (collected driver-side: bounded by truly-contaminated docs).
    """
    from ..functions.sketch import (
        bloom_add, bloom_contains, bloom_empty, bloom_sizes,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"], rows_per_block=2_000)
    bench_max = _decon_bench_max(sf_dir)

    def bench_grams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("doc_id"), bench_max))
        _, h = _gram_hashes_batch(t.column("text"))
        return pa.table({"h": pa.array(np.unique(h), pa.int64())})

    grams = ds.map_batches(
        bench_grams, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # ints only, benchmark-bounded
    bits = bloom_empty(bloom_sizes(max(grams.count(), 1)))
    for b in grams.iter_batches(batch_format="pyarrow"):
        bloom_add(
            bits, b.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
    bloom_ref = ray.put(bits)

    def candidates(t: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        t = t.filter(pc.greater_equal(t.column("doc_id"), bench_max))
        rid, h = _gram_hashes_batch(t.column("text"))
        if h.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        hit = bloom_contains(bloom, h.astype(np.uint64))
        did = t.column("doc_id").to_numpy(zero_copy_only=False)[rid[hit]]
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "h": pa.array(h[hit], pa.int64())})

    cand = ds.map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # (doc_id, h) ints only; volume = hits + ~1% FP tail

    # MEASURED-size dispatch (the dedup PAIR_DRIVER_THRESHOLD pattern):
    # candidate rows are bloom-hit grams only; below the threshold the
    # semi-join is a driver-side searchsorted over the materialized
    # bench-gram stream (no shuffle, ~ms); above it (a 100-TB corpus'
    # FP tail), the bucketed co-group below scales it out. count() on a
    # materialized Dataset is free metadata.
    if cand.count() <= DECON_CAND_DRIVER_THRESHOLD:
        ct = pa.concat_tables(
            [b for b in cand.iter_batches(batch_format="pyarrow")]
            or [pa.table({"doc_id": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64())})]
        )
        c_h = ct.column("h").to_numpy(zero_copy_only=False)
        c_id = ct.column("doc_id").to_numpy(zero_copy_only=False)
        bad_np: set[int] = set()
        for b in grams.iter_batches(batch_format="pyarrow"):
            bh = np.sort(b.column("h").to_numpy(zero_copy_only=False))
            hit = _membership_hits(
                np.arange(c_h.size), c_h, bh, c_h.size
            )
            bad_np.update(c_id[hit].tolist())
        bad = bad_np
    else:
        bad = _decon_semijoin_matched(sf_dir, cand, grams)
    bad_arr = pa.array(sorted(bad), pa.int64())

    final = _read(sf_dir, "documents", ["doc_id", "lang"], rows_per_block=2_000)  # text-free

    def anti(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("doc_id"), bench_max),
            pc.invert(pc.is_in(t.column("doc_id"), value_set=bad_arr)),
        )
        return t.filter(keep)

    return final.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


#: Above this many candidate (doc_id, gram) rows the bloom semi-join
#: runs as a distributed co-group instead of a driver searchsorted pass
#: (5M rows = ~80 MB of int64 pairs — measured safe driver residency).
DECON_CAND_DRIVER_THRESHOLD = 5_000_000


def _decon_semijoin_matched(sf_dir: str, cand, grams) -> set[int]:
    """Distributed semi-join: tagged union + bucketed co-group on the
    gram hash (no ``Dataset.join``: its empty hash partitions emit
    schema-less blocks). Returns matched doc_ids — bounded by
    truly-contaminated docs, safe to collect."""

    def tag_cand(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_src", pa.array(np.zeros(t.num_rows, np.int8))
        )

    def tag_bench(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.nulls(t.num_rows, pa.int64()),
            "h": t.column("h"),
            "_src": pa.array(np.ones(t.num_rows, np.int8)),
        })

    both = cand.map_batches(
        tag_cand, batch_format="pyarrow", zero_copy_batch=True
    ).union(grams.map_batches(
        tag_bench, batch_format="pyarrow", zero_copy_batch=True
    ))

    def match_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        bench_h = df.filter(pl.col("_src") == 1).select("h")
        out = (
            df.filter(pl.col("_src") == 0)
            .join(bench_h, on="h", how="semi")
            .select("doc_id").unique()
        )
        return out.to_arrow().cast(pa.schema([("doc_id", pa.int64())]))

    matched = _bucketed_groups(
        both, "h", match_bucket,
        num_buckets=_buckets_for(sf_dir, "documents", rows_per_bucket=50_000),
    )
    return {
        r
        for b in matched.iter_batches(batch_format="pyarrow")
        for r in b.column("doc_id").to_pylist()
    }


def q_contamination_pairs(sf_dir: str):
    """Contamination ATTRIBUTION (the report behind the filter): every
    (train doc, benchmark doc) pair sharing an 8-gram — so a data
    audit can say WHICH eval set a dropped document collided with.
    Both sides stream to distinct (doc, gram-hash) pairs, co-grouped
    on the hash via the bucketed executor (one polars join per bucket
    of complete hash groups); cross-bucket duplicate pairs (docs
    sharing grams in different buckets) collapse driver-side — the
    collected set is bounded by TRUE contamination volume, the same
    bound as the decontamination drop set."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)
    bench_max = _decon_bench_max(sf_dir)

    def doc_grams(t: pa.Table) -> pa.Table:
        rid, h = _gram_hashes_batch(t.column("text"))
        did = t.column("doc_id").to_numpy(zero_copy_only=False)[rid]
        pairs = np.unique(np.stack([did, h]), axis=1)
        return pa.table({
            "doc_id": pa.array(pairs[0], pa.int64()),
            "h": pa.array(pairs[1], pa.int64()),
        })

    grams = ds.map_batches(
        doc_grams, batch_format="pyarrow", zero_copy_batch=True
    )

    def match_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        bench = df.filter(pl.col("doc_id") < bench_max).rename(
            {"doc_id": "bench_doc_id"}
        )
        train = df.filter(pl.col("doc_id") >= bench_max).rename(
            {"doc_id": "train_doc_id"}
        )
        out = (
            train.join(bench, on="h", how="inner")
            .select(["train_doc_id", "bench_doc_id"]).unique()
        )
        return out.to_arrow().cast(pa.schema([
            ("train_doc_id", pa.int64()), ("bench_doc_id", pa.int64()),
        ]))

    matched = _bucketed_groups(
        grams, "h", match_bucket,
        num_buckets=_buckets_for(sf_dir, "documents", rows_per_bucket=50_000),
    )
    blocks = [
        b for b in matched.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    schema = pa.schema([
        ("train_doc_id", pa.int64()), ("bench_doc_id", pa.int64()),
    ])
    if not blocks:
        return schema.empty_table()
    both = pa.concat_tables(b.cast(schema) for b in blocks)
    u = np.unique(
        np.stack([
            both.column("train_doc_id").to_numpy(zero_copy_only=False),
            both.column("bench_doc_id").to_numpy(zero_copy_only=False),
        ]),
        axis=1,
    )
    return pa.table({
        "train_doc_id": pa.array(u[0], pa.int64()),
        "bench_doc_id": pa.array(u[1], pa.int64()),
    })


#: Histogram bin width for the length distribution (chars).
_LEN_BIN = 50


def q_doc_length_histogram(sf_dir: str):
    """Length-distribution histogram (the corpus-shape diagnostic every
    data pipeline plots): fixed-width bins over n_chars, per-batch
    count combiner, tiny grouped sum."""
    ds = _read(sf_dir, "documents", ["n_chars"], rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        b = pc.divide(t.column("n_chars"), _LEN_BIN)
        out = pa.table({"bin": b}).group_by("bin").aggregate([("bin", "count")])
        return out.rename_columns(["bin", "n"]).cast(
            pa.schema([("bin", pa.int64()), ("n", pa.int64())])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bin").aggregate(Sum("n", alias_name="n"))


#: Per-language sampling rates (threshold on the same multiplicative
#: hash sample_documents uses): up-sample low-resource languages,
#: down-sample the head — the data-mixture rebalancing primitive.
_STRAT_RATES = {"en": 0.05, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.25}


def q_stratified_sample_by_lang(sf_dir: str):
    """Deterministic STRATIFIED sample: each language keeps its own
    hash-threshold fraction (reproducible, repartition-stable, and
    SQL-expressible — unlike seeded RNG sampling)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"], rows_per_block=2_000)
    cuts = {
        lang: int(r * _SAMPLE_MOD) for lang, r in _STRAT_RATES.items()
    }

    def pick(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply_checked(
                t.column("doc_id").cast(pa.int64()), _SAMPLE_MULT
            ),
            _SAMPLE_MOD - 1,
        ).to_numpy(zero_copy_only=False)
        cut = np.fromiter(
            (cuts.get(g, 0) for g in t.column("lang").to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return t.filter(pa.array(h < cut))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


#: Per-language keep rates for the prepared training corpus.
_PREP_RATES = {"en": 0.3}
_PREP_RATE_DEFAULT = 0.6
_PREP_QUALITY_MIN = 0.3


def q_prepare_training_corpus(sf_dir: str):
    """The WHOLE LLM training-data preparation pipeline composed end to
    end — quality gate, benchmark decontamination, exact dedup,
    stratified language sampling, token-budget shard packing — and
    oracle-checked as ONE SQL statement (the curate_corpus_exact idea
    applied to the full training-prep flow):

    1. score + GATE: quality >= 0.3, benchmark slice excluded;
    2. DECONTAMINATE: drop docs sharing an 8-gram with the benchmark
       slice (broadcast gram-hash set — the corpus never shuffles);
    3. EXACT DEDUP among survivors (min doc_id per text, two-phase
       hash — only (hash, id) pairs move);
    4. STRATIFIED SAMPLE: per-language hash-threshold rates;
    5. PACK: distributed ordered prefix sum assigns each survivor, in
       doc_id order, its training shard.

    Output: (doc_id, lang, n_tokens, shard_id). Every stage streams;
    driver state is bounded by benchmark grams + the dup-rate drop set
    + the range-offset table."""
    from ..stages.dedup import exact_dedup_drop_ids, filter_survivors

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"], rows_per_block=2_000)
    bench_max = _decon_bench_max(sf_dir)

    # -- 1. score + gate (benchmark slice excluded from the corpus)
    def score(t: pa.Table) -> pa.Table:
        ann = annotate_text_stats(t)
        out = pa.table(
            {"doc_id": ann.column("doc_id"), "lang": t.column("lang"),
             "text": t.column("text"),
             "n_tokens": pc.cast(ann.column("n_tokens"), pa.int64()),
             "quality": ann.column("quality")}
        )
        keep = pc.and_(
            pc.greater_equal(out.column("quality"), _PREP_QUALITY_MIN),
            pc.greater_equal(out.column("doc_id"), bench_max),
        )
        return out.filter(keep)

    gated = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # -- 2. decontaminate (bench grams from the FULL documents table)
    bench_ref = ray.put(_bench_gram_array(ds, bench_max))

    def anti(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        rid, h = _gram_hashes_batch(t.column("text"))
        hit = _membership_hits(rid, h, bench, t.num_rows)
        return t.filter(pa.array(~hit))

    decon = gated.map_batches(
        anti, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed twice (dedup drop-set pass + survivors)

    # -- 3. exact dedup among survivors (min doc_id per text wins)
    drop = exact_dedup_drop_ids(decon)
    deduped = filter_survivors(decon, drop)

    # -- 4. stratified per-language sample (same hash as sample_documents)
    def cut_for(lang: str) -> int:
        return int(_PREP_RATES.get(lang, _PREP_RATE_DEFAULT) * _SAMPLE_MOD)

    def pick(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply_checked(
                t.column("doc_id").cast(pa.int64()), _SAMPLE_MULT
            ),
            _SAMPLE_MOD - 1,
        ).to_numpy(zero_copy_only=False)
        cut = np.fromiter(
            (cut_for(g) for g in t.column("lang").to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return t.filter(pa.array(h < cut)).select(
            ["doc_id", "lang", "n_tokens"]
        )

    sampled = deduped.map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two passes: range sums, then packing (ints only)

    # -- 5. pack into token-budget shards (ordered prefix sum; sparse
    # ids are fine — ranges are contiguous ID slices, not row counts)
    range_docs = _pack_range_docs(
        pq.ParquetFile(
            os.path.join(sf_dir, "documents.parquet")
        ).metadata.num_rows
    )

    def add_range(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_rb", pc.cast(pc.divide(t.column("doc_id"), range_docs), pa.int64())
        )

    toks = sampled.map_batches(
        add_range, batch_format="pyarrow", zero_copy_batch=True
    )
    sums = toks.groupby("_rb").aggregate(Sum("n_tokens", alias_name="_s")).take_all()
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(sums, key=lambda x: x["_rb"]):
        offsets[r["_rb"]] = run
        run += int(r["_s"])

    def pack(group: pa.Table) -> pa.Table:
        rb = group.column("_rb")[0].as_py()
        g = group.take(pc.sort_indices(group.column("doc_id")))
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        cum_before = np.cumsum(nt) - nt + offsets[rb]
        return pa.table(
            {"doc_id": g.column("doc_id"), "lang": g.column("lang"),
             "n_tokens": g.column("n_tokens"),
             "shard_id": pa.array(
                 (cum_before // PACK_SHARD_TOKENS).astype(np.int64))}
        )

    out = toks.groupby("_rb").map_groups(pack, batch_format="pyarrow")
    if not sums:  # empty prepared corpus: Ray's empty groupby output
        return pa.schema(  # has NO schema — keep the contract explicit
            [("doc_id", pa.int64()), ("lang", pa.string()),
             ("n_tokens", pa.int64()), ("shard_id", pa.int64())]
        ).empty_table()
    return out


_SCORE_SEED = 321


def _score_weights(dim: int = 64) -> np.ndarray:
    rng = np.random.default_rng(_SCORE_SEED)
    return np.round(rng.standard_normal(dim), 4)  # short literals for SQL


def q_embedding_scores(sf_dir: str):
    """Batched model scoring (the inference-stage pattern): a broadcast
    weight vector dotted against every embedding per batch; top 50 by
    (score desc, vec_id)."""
    w = _score_weights()
    w_ref = ray.put(w)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               rows_per_block=2_500)

    class Scorer:
        def __init__(self):
            self.w = ray.get(w_ref)  # fetched once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..stages.ann import _as_matrix

            vecs = _as_matrix(batch.column("embedding"))  # zero-copy reshape
            raw = vecs @ self.w
            scores = np.sign(raw) * np.floor(
                np.abs(raw) * 1e6 + 0.5
            ) / 1e6  # round6 half-away (DuckDB round parity)
            # per-block keep-50 combiner: the final sort sees
            # 50 x num_blocks rows, never the scored corpus
            ids = (
                batch.column("vec_id").combine_chunks()
                .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            )
            keep = np.lexsort((ids, -scores))[:50]
            return pa.table(
                {"vec_id": pa.array(ids[keep], pa.int64()),
                 "score": pa.array(scores[keep], pa.float64())}
            )

    scored = ds.map_batches(
        Scorer, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_pool_for(sf_dir, "embeddings", 2500), num_cpus=1,
    )
    return scored.sort(["score", "vec_id"], descending=[True, False]).limit(50)


_ANN_QUERY_IDS = [0, 1, 2]


def _query_vectors(sf_dir: str) -> np.ndarray:
    """Fetch the 3 query vectors with a PUSHED-DOWN row filter + column
    projection — only matching row groups leave storage (the previous
    unpruned read pulled the whole embeddings table onto the driver)."""
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", _ANN_QUERY_IDS)],
    )
    by_id = dict(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    return np.vstack(
        [np.asarray(by_id[i], dtype=np.float64) for i in _ANN_QUERY_IDS]
    )


def q_ann_topk(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               rows_per_block=2_500)
    return brute_force_topk(
        ds, _ANN_QUERY_IDS, _query_vectors(sf_dir), k=10,
        concurrency=_pool_for(sf_dir, "embeddings", 2500),
    )


def _corpus_fingerprint(path: str) -> str:
    """Content token for an on-disk corpus file: path + size + mtime_ns
    — changes whenever the file is rewritten, even at equal row count
    (the r2 cache keyed on row count silently served a stale index to a
    re-committed corpus). Lake-backed callers should pass the manifest
    version instead."""
    import hashlib as _hl

    st = os.stat(path)
    return _hl.sha1(
        f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]


def q_ann_topk_ivf(sf_dir: str):
    """IVF ANN via the PERSISTED index (rows-only oracle: approximate):
    write-once centroid-partitioned layout, then a search that reads
    only the probed inverted lists (IO ~ nprobe/n_clusters of the
    corpus — the real scale path; ``ivf_topk`` merely saved flops).
    The index cache is keyed by a corpus CONTENT fingerprint and builds
    are atomic (tmp dir + rename), so changed data never reuses a stale
    index and concurrent builders can't clobber each other."""
    import tempfile

    from ..stages.ann import (
        build_ivf_index,
        ivf_index_is_current,
        ivf_index_search,
    )

    token = _corpus_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    index_dir = os.path.join(tempfile.gettempdir(), f"ivf_index_q_{token}")
    if not ivf_index_is_current(index_dir, token):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                   rows_per_block=2_500)
        build_ivf_index(ds, index_dir, n_clusters=16, content_token=token)
    return ivf_index_search(
        index_dir, _ANN_QUERY_IDS, _query_vectors(sf_dir), k=10, nprobe=6
    )


def q_page_entities(sf_dir: str):
    """Nested-entity fan-out (M6 parser shape), DRIVER-ORACLE-CHECKED:
    pages are built deterministically from ``documents.doc_id`` with a
    title, ``doc_id%2+1`` headings and ``doc_id%3+1`` entity-encoded
    links, run through the REAL html parser actor pool; the oracle
    reproduces the parsed entities as SQL literals via lateral
    ``generate_series``. (Anchors carry ``&amp;`` so entity decode is
    exercised, not just tag stripping.)"""
    from ..stages.entities import PageEntityExtractor

    def build_pages(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        urls, htmls = [], []
        for d in ids:
            if d >= 2000:
                continue
            heads = "".join(
                f"<h{j + 1}>H{d}-{j}</h{j + 1}>" for j in range(d % 2 + 1)
            )
            links = "".join(
                f'<a href="https://d{d}-{j}.example/">A{d}-{j} &amp; co</a>'
                for j in range(d % 3 + 1)
            )
            urls.append(f"https://site-{d}.example/p")
            htmls.append(
                f"<html><head><title>T{d}</title></head><body>"
                f"{heads}{links}</body></html>".encode()
            )
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "html": pa.array(htmls, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        build_pages, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.map_batches(
        PageEntityExtractor,
        fn_constructor_kwargs={"mode": "fanout"},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    )


def q_multimodal_decode(sf_dir: str):
    """Multimodal plumbing, DRIVER-ORACLE-CHECKED: deterministic fake
    image payloads (header encodes dims as a function of media_id) ->
    actor-pool metadata decode (payload dropped); the oracle recomputes
    width/height/channels from ``doc_id`` directly. Assumes documents'
    ``doc_id`` is 0..n-1 (driver testdata contract)."""
    from ..stages.multimodal import DecodeImageMetadata, MEDIA_SCHEMA, make_fake_image

    n = min(
        pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows,
        2000,
    )
    rows = [
        {
            "media_id": i,
            "url": f"https://site-{i}.example/img.png",
            "kind": "image",
            "payload": make_fake_image(64 + i % 100, 48 + i % 50, 3, fill=i),
            "content_type": "image/png",
        }
        for i in range(n)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    return ds.map_batches(
        DecodeImageMetadata,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    )


def q_curate_filter(sf_dir: str):
    """Curation filter prefix (annotate + quality/lang gate) — the
    SQL-expressible part of the corpus-curation pipeline."""
    from .curate import annotate_and_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = annotate_and_filter(ds, quality_threshold=0.3)
    return out.select_columns(["doc_id", "quality", "lang_pred"])


def q_curate_corpus(sf_dir: str):
    """Full curation (filter + exact dedup + MinHash near-dup): the
    surviving doc ids (rows-only oracle — LSH is not SQL)."""
    from .curate import curate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = curate(ds, quality_threshold=0.3, near_dup_threshold=0.8)
    return out.select_columns(["doc_id"])


def derived_cdc_workdir(sf_dir: str, tag: str) -> str:
    """Deterministic scratch dir for the derived-WAL CDC queries (used
    by ``__ray_entry__.entry`` to locate the committed lake)."""
    import tempfile

    n_events = pq.ParquetFile(
        os.path.join(sf_dir, "events.parquet")
    ).metadata.num_rows
    return os.path.join(tempfile.gettempdir(), f"cdc_{tag}_q_{n_events}")


def _run_derived_cdc(sf_dir: str, tag: str, *, entity: bool, **cfg_kw) -> pa.Table:
    """Shared engine side of the ORACLE-CHECKED flagship pipelines:
    derive a deterministic WAL from the sf tier's ``events`` table
    (:func:`..sources.synthetic.derive_wal_from_events`), run the REAL
    ingest (tail -> fused extract/combine/spill -> per-partition LWW
    merge -> manifest commit) into a fresh lake, and return the
    committed state — which the DuckDB oracle reproduces as a window
    LWW over ``events`` because every derived column is a SQL literal
    of the event row."""
    import shutil

    from ..pipelines.cdc import (
        CdcConfig, lake_snapshot, run_entity_ingest, run_ingest,
    )
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, tag)
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=entity,
    )
    # extract_concurrency=None -> autoscaling pool sized to the session
    # (a FIXED pool equal to the CPU count would reserve every CPU and
    # starve the read stage -> deadlock; see cdc._default_extract_concurrency)
    cfg = CdcConfig(wal_dir=os.path.join(work, "wal"),
                    lake_dir=os.path.join(work, "lake"),
                    num_partitions=16, **cfg_kw)
    (run_entity_ingest if entity else run_ingest)(cfg)
    snap = lake_snapshot(cfg.lake_dir)
    # oracle comparison: tz-aware UTC -> naive (the events table's ts is
    # naive; values are identical wall-clock by construction)
    i = snap.column_names.index("warc_ts")
    return snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )


def q_curate_corpus_exact(sf_dir: str):
    """END-TO-END curation, fully oracle-checked: quality/lang gate ->
    exact dedup -> prefix-blocked exact-Jaccard near-dup — the whole
    composed training-data pipeline verified against one SQL statement
    (filter expr + group-min dedup + recursive-CTE closure)."""
    from .curate import curate_exact

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return curate_exact(ds, quality_threshold=0.3, near_dup_threshold=0.8)


def q_cdc_lake_state(sf_dir: str):
    """Flagship CDC pipeline, DRIVER-ORACLE-CHECKED: WAL derived from
    ``events``, real ingest into a fresh lake, merged state == SQL
    window LWW (hash-compared on url/warc_ts/seq/text/lang — ``text``
    included: the derived html is tag-free, so byte-identical
    extraction means text == the SQL string literal)."""
    snap = _run_derived_cdc(sf_dir, "lake", entity=False)
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_cdc_lake_state_objstore(sf_dir: str):
    """Object-store flagship, DRIVER-ORACLE-CHECKED: the identical
    derived-WAL ingest with ``lake_dir`` on the S3-semantics bucket
    actor (``state/objstore.py``) — manifest commits via conditional
    PUTs, partition files via whole-object PUTs, the merge's base
    reads and the snapshot read via ranged GETs through the fsspec
    adapter. Hash-equal to the same window-LWW SQL oracle as
    ``cdc_lake_state``: the storage backend is invisible to the
    table's logical state."""
    import shutil

    import ray as _ray

    from ..sources.synthetic import derive_wal_from_events
    from ..state.objstore import ensure_object_store
    from .cdc import CdcConfig, lake_snapshot, run_ingest

    work = derived_cdc_workdir(sf_dir, "lake_objstore")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8,
    )
    h = ensure_object_store("qlake-objstore")
    # the bucket actor is session-long: wipe any previous run's keys so
    # the query is idempotent (exercises list+delete on the store)
    for k in _ray.get(h.list_prefix.remote("", recursive=True)):
        _ray.get(h.delete.remote(k))
    lake = "objstore://qlake-objstore/lake"
    run_ingest(CdcConfig(
        wal_dir=os.path.join(work, "wal"), lake_dir=lake,
        num_partitions=16,
    ))
    snap = lake_snapshot(lake)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_cdc_schema_evolution(sf_dir: str):
    """Metadata-only DDL flagship, DRIVER-ORACLE-CHECKED: ingest half
    the derived WAL, ``alter_lake`` (rename lang->language, add
    quality, add+drop a scratch column — NO data file rewritten), then
    ingest the rest while the wire STILL emits ``lang``. The final
    state must hash-equal the full-WAL window-LWW oracle with the
    rename applied as pure SQL aliasing — proving the rename log maps
    pre-alter files and post-alter wire batches onto one logical
    column, the added column null-fills history, and the dropped one
    never resurrects (``pipelines/ddl.py``)."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .cdc import CdcConfig, lake_snapshot, run_ingest
    from .ddl import alter_lake

    work = derived_cdc_workdir(sf_dir, "ddl")
    shutil.rmtree(work, ignore_errors=True)
    wal = os.path.join(work, "wal")
    lake = os.path.join(work, "lake")
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), wal, n_segments=8,
    )
    run_ingest(CdcConfig(
        wal_dir=wal, lake_dir=lake, num_partitions=16,
        segment_glob="segment-0000[0-3].parquet",
    ))
    alter_lake(
        lake, rename={"lang": "language"},
        add={"quality": "float64", "stale": "int64"},
    )
    alter_lake(lake, drop=["stale"])
    run_ingest(CdcConfig(wal_dir=wal, lake_dir=lake, num_partitions=16))
    snap = lake_snapshot(lake)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "language",
                        "quality"])


def q_cdc_lake_state_mor(sf_dir: str):
    """Merge-on-read flagship, DRIVER-ORACLE-CHECKED: the same derived
    WAL ingested with ``merge_mode="mor"`` in two micro-batches, so the
    committed lake is pure per-partition delta files (no base ever
    written, write amplification O(delta)) and the MERGE-ON-READ scan
    path — per-partition base+delta LWW at read time,
    ``cdc._read_lake_mor`` / ``stages.merge.read_effective_partition``
    — produces the observable state. Hash-equal to the identical
    window-LWW SQL oracle as ``cdc_lake_state``: CoW and MOR are
    interchangeable layouts of one logical table."""
    snap = _run_derived_cdc(
        sf_dir, "lake_mor", entity=False,
        merge_mode="mor", max_segments_per_batch=4,
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_cdc_wap_publish(sf_dir: str):
    """Write-audit-publish flagship, DRIVER-ORACLE-CHECKED: main ingests
    the first half of the derived WAL, a zero-copy BRANCH
    (``pipelines/branching.py``) tails the second half in staging while
    main stays frozen, an audit gate (CHECK constraints over the branch
    snapshot) admits the batch, and ``publish_branch`` fast-forwards
    main in ONE CAS commit. The published lake must hash-equal the same
    full-WAL window-LWW oracle as ``cdc_lake_state`` — proving fork,
    branch ingest, watermark carry and publish lose and invent
    nothing."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .branching import create_branch, publish_branch
    from .cdc import CdcConfig, lake_snapshot, run_ingest

    work = derived_cdc_workdir(sf_dir, "wap")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8,
    )
    main = os.path.join(work, "lake")
    # main sees only the first half of the WAL
    run_ingest(CdcConfig(
        wal_dir=os.path.join(work, "wal"), lake_dir=main,
        num_partitions=16, segment_glob="segment-0000[0-3].parquet",
    ))
    b = create_branch(main, "stage")
    # the branch tails the rest (fork carried main's watermark)
    run_ingest(CdcConfig(
        wal_dir=os.path.join(work, "wal"), lake_dir=b["dir"],
        num_partitions=16,
    ))
    publish_branch(main, "stage", audit_constraints=[
        ["seq", ">=", 0], ["url", "not_null"],
    ])
    snap = lake_snapshot(main)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_cdc_merge_branch(sf_dir: str):
    """Three-way branch merge, DRIVER-ORACLE-CHECKED: main ingests the
    first 5 of 8 derived segments, a branch forked at segment 4 tails
    through segment 8 — both sides ADVANCE (publish would refuse) —
    and ``merge_branch`` folds the branch back under the lake's own
    (warc_ts, seq) LWW. Because LWW replay is commutative and
    idempotent, the merged lake must hash-equal the full-WAL window-LWW
    oracle (the same SQL as ``cdc_lake_state``) despite the overlap on
    segment 5 being applied by BOTH sides."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .branching import create_branch, merge_branch
    from .cdc import CdcConfig, lake_snapshot, run_ingest

    work = derived_cdc_workdir(sf_dir, "merge")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8,
    )
    main = os.path.join(work, "lake")
    run_ingest(CdcConfig(
        wal_dir=os.path.join(work, "wal"), lake_dir=main,
        num_partitions=16, segment_glob="segment-0000[0-3].parquet",
    ))
    b = create_branch(main, "side")
    run_ingest(CdcConfig(  # branch tails segments 4..7
        wal_dir=os.path.join(work, "wal"), lake_dir=b["dir"],
        num_partitions=16,
    ))
    run_ingest(CdcConfig(  # main advances by segment 4 (overlap)
        wal_dir=os.path.join(work, "wal"), lake_dir=main,
        num_partitions=16, segment_glob="segment-0000[0-4].parquet",
    ))
    merge_branch(main, "side", audit_constraints=[["url", "not_null"]])
    snap = lake_snapshot(main)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_lake_bloom_lookup(sf_dir: str):
    """Bloom-index point lookup on a NON-ROUTING high-cardinality
    column, DRIVER-ORACLE-CHECKED: the derived lake's ``seq`` is the
    globally-unique source event id, so "find the rows created by
    exactly these events" cannot use url hash routing, and per-file
    seq min/max spans nearly the whole domain so zone maps keep every
    partition — the per-file BLOOM INDEX (``state/bloomindex.py``,
    built by the ``bloom-index`` maintenance op) prunes the scan to
    the owning partitions (asserted on the plan), the compiled
    residual expression decides. The probe set is the LWW-winner event
    ids of the ``user_id % 50 == 7`` cohort, derived identically by
    the SQL oracle."""
    from ..state.bloomindex import build_bloom_index
    from .cdc import read_lake, scan_plan

    _run_derived_cdc(sf_dir, "bloomq", entity=False)
    lake = os.path.join(derived_cdc_workdir(sf_dir, "bloomq"), "lake")
    build_bloom_index(lake, ["seq"])
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_id", "ts"],
    )
    import polars as pl

    winners = (
        pl.from_arrow(ev)
        .filter(pl.col("user_id") % 50 == 7)
        .sort(["ts", "event_id"], descending=[True, True])
        .group_by("user_id", maintain_order=True)
        .first()
    )
    probe = sorted(winners.get_column("event_id").to_list())
    constraints = [["seq", "in", probe]]
    plan = scan_plan(lake, constraints)
    # shape guard: the scan must be pruned well below a full sweep
    # (zones catch single-probe cases where min/max happens to
    # discriminate; the bloom catches the rest — at sf0.01 the probe
    # set spans the seq domain and only the bloom prunes)
    if plan["parts_read"] * 2 > plan["parts_total"]:
        raise AssertionError(f"planner failed to prune: {plan}")
    ds = read_lake(
        lake, columns=["url", "warc_ts", "seq", "text", "lang"],
        constraints=constraints,
    )

    def decast(t: pa.Table) -> pa.Table:
        i = t.column_names.index("warc_ts")
        return t.set_column(
            i, "warc_ts", t.column("warc_ts").cast(pa.timestamp("us"))
        )

    return ds.map_batches(decast, batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_delete_where(sf_dir: str):
    """Predicate DML DELETE, DRIVER-ORACLE-CHECKED: full-WAL ingest,
    then ``dml.delete_where(lang == 'purchase')`` — committed as ONE
    ordinary LWW version (zone-planned candidate partitions, one
    O(matched) delta file each; feeds see plain deletes; history keeps
    the old rows, unlike purge). The lake must hash-equal the
    window-LWW oracle minus the matched rows."""
    from .cdc import lake_snapshot
    from .dml import delete_where

    _run_derived_cdc(sf_dir, "delw", entity=False)
    lake = os.path.join(derived_cdc_workdir(sf_dir, "delw"), "lake")
    delete_where(lake, [["lang", "==", "purchase"]])
    snap = lake_snapshot(lake)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_cdc_update_where(sf_dir: str):
    """Predicate DML UPDATE, DRIVER-ORACLE-CHECKED: full-WAL ingest,
    then ``dml.update_where(SET lang='seen' WHERE lang='view')``. Each
    matched row re-emits at its bumped ``(warc_ts, seq + 1)`` LWW
    version (so feeds see ordinary updates and WAL replay converges);
    the oracle applies the same CASE rewrite + seq bump to the
    window-LWW state."""
    from .cdc import lake_snapshot
    from .dml import update_where

    _run_derived_cdc(sf_dir, "updw", entity=False)
    lake = os.path.join(derived_cdc_workdir(sf_dir, "updw"), "lake")
    update_where(lake, [["lang", "==", "view"]], {"lang": "seen"})
    snap = lake_snapshot(lake)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def _purge_victim_urls(sf_dir: str) -> list[str]:
    """Deterministic purge set shared by the purge queries and their
    SQL oracles: every url whose user_id % 10 == 3."""
    users = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    ).column("user_id").to_pylist()
    return sorted({
        f"https://u{u}.example/page" for u in users if u % 10 == 3
    })


def q_cdc_purge(sf_dir: str):
    """Right-to-be-forgotten purge, DRIVER-ORACLE-CHECKED: full-WAL
    ingest, then ``maintenance.purge_urls`` scrubs every url of the
    user_id%10==3 cohort from the live snapshot AND all retained
    history, registering them against replay resurrection. The purged
    lake must hash-equal the window-LWW oracle with the cohort
    filtered out — proving the scrub removes exactly the cohort and
    touches nothing else."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .cdc import CdcConfig, lake_snapshot, run_ingest
    from .maintenance import purge_urls

    work = derived_cdc_workdir(sf_dir, "purge")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8,
    )
    lake = os.path.join(work, "lake")
    run_ingest(CdcConfig(
        wal_dir=os.path.join(work, "wal"), lake_dir=lake, num_partitions=16,
    ))
    purge_urls(lake, _purge_victim_urls(sf_dir))
    snap = lake_snapshot(lake)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_cdc_purge_history(sf_dir: str):
    """The HISTORY-REWRITE half of the purge, DRIVER-ORACLE-CHECKED:
    ingest the first 4 of 8 segments (v1), tail the rest (v2), purge
    the user_id%10==3 cohort (v3) — then TIME-TRAVEL back to v1. The
    retained old snapshot must hash-equal the first-half window-LWW
    oracle minus the cohort: the purge rewrote history in place, not
    just the head."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .cdc import CdcConfig, lake_snapshot, run_ingest
    from .maintenance import purge_urls

    work = derived_cdc_workdir(sf_dir, "purgehist")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8,
    )
    lake = os.path.join(work, "lake")
    r1 = run_ingest(CdcConfig(
        wal_dir=os.path.join(work, "wal"), lake_dir=lake, num_partitions=16,
        segment_glob="segment-0000[0-3].parquet", retain_versions=10,
    ))
    run_ingest(CdcConfig(
        wal_dir=os.path.join(work, "wal"), lake_dir=lake, num_partitions=16,
        retain_versions=10,
    ))
    purge_urls(lake, _purge_victim_urls(sf_dir))
    snap = lake_snapshot(lake, version=r1.final_version)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def _derived_lake_constrained_read(
    sf_dir: str, tag: str, constraints: list, *, max_parts: int | None = None,
):
    """Shared engine side of the CONSTRAINED-READ oracle queries: build
    the derived lake, then scan it through the real planner path —
    ``read_lake(constraints=...)`` (hash routing + manifest zone maps +
    compiled residual filter, ``state/zones.py``). ``max_parts`` guards
    the plan SHAPE (a point lookup that scans is a bug, not just slow);
    value correctness is the driver's hash compare."""
    from .cdc import read_lake, scan_plan

    _run_derived_cdc(sf_dir, tag, entity=False)
    lake = os.path.join(derived_cdc_workdir(sf_dir, tag), "lake")
    plan = scan_plan(lake, constraints)
    if max_parts is not None and plan["parts_read"] > max_parts:
        raise AssertionError(f"planner failed to prune: {plan}")
    ds = read_lake(
        lake, columns=["url", "warc_ts", "seq", "text", "lang"],
        constraints=constraints,
    )

    def decast(t: pa.Table) -> pa.Table:
        # oracle comparison: tz-aware UTC -> naive (events.ts is naive)
        i = t.column_names.index("warc_ts")
        return t.set_column(
            i, "warc_ts", t.column("warc_ts").cast(pa.timestamp("us"))
        )

    return ds.map_batches(decast, batch_format="pyarrow", zero_copy_batch=True)


def q_lake_point_lookup(sf_dir: str):
    """Index-free point lookup on the lake, DRIVER-ORACLE-CHECKED: a
    ``url ==`` constraint hash-routes through the writer's own crc32
    partitioner (``state.zones.routed_parts``) so the distributed scan
    touches exactly ONE partition of the lake — asserted on the plan,
    then hash-compared against the window-LWW SQL with the same WHERE.
    The 100-TB read path for "give me this page's current state"."""
    return _derived_lake_constrained_read(
        sf_dir, "lake_pt",
        [["url", "==", "https://u7.example/page"]],
        max_parts=1,
    )


def q_lake_time_slice(sf_dir: str):
    """Zone-map-constrained lake scan, DRIVER-ORACLE-CHECKED: a
    ``warc_ts >=`` predicate drives the manifest zone maps (per-file
    min/max recorded from parquet footers at commit,
    ``state.zones.refresh_zones``) and is re-applied as the compiled
    residual filter — statistics accelerate, the expression decides.
    Hash-equal to the window-LWW SQL with the same time predicate."""
    return _derived_lake_constrained_read(
        sf_dir, "lake_slice",
        [["warc_ts", ">=", "2024-01-16T00:00:00"]],
    )


def q_cdc_change_feed(sf_dir: str):
    """Change-data-feed, DRIVER-ORACLE-CHECKED: ingest the derived WAL
    in TWO micro-batches (segments 1-4 -> lake v1, 5-8 -> v2), then
    stream :func:`..pipelines.cdc.changes_between`\\(v1, v2) — the
    observable per-url diff (insert/update/delete with the new winner
    row). The oracle reproduces it as two window-LWW states (first-half
    events vs all events) LEFT-joined on the key: snapshot semantics,
    per-version retention and the no-shuffle partition-pairwise diff
    all get hash-checked in one query."""
    import shutil

    from ..pipelines.cdc import CdcConfig, changes_between, run_ingest
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "feed")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_ingest(cfg)
    ds = changes_between(cfg.lake_dir, 1, 2)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.select(
            ["url", "change_op", "warc_ts", "seq", "text", "lang"]
        )
        i = batch.column_names.index("warc_ts")
        return batch.set_column(
            i, "warc_ts", batch.column("warc_ts").cast(pa.timestamp("us"))
        )

    return ds.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_scd2_history(sf_dir: str):
    """Type-2 slowly-changing-dimension history, DRIVER-ORACLE-CHECKED:
    ingest the derived WAL in two commits, then fold the retained
    version chain into (url, payload, valid_from, valid_to) intervals
    via :func:`..pipelines.cdc.scd2_history` (feed union -> url-hash
    groupby -> one vectorized lead kernel per bucket — O(changed rows),
    never O(lake rows x versions)). The oracle rebuilds both committed
    states as window LWW and derives the same intervals with a LEFT
    JOIN against the v1->v2 feed. ``valid_to`` NULL = current row."""
    import shutil

    from ..pipelines.cdc import CdcConfig, run_ingest, scd2_history
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "scd2")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_ingest(cfg)
    ds = scd2_history(cfg.lake_dir)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.select(
            ["url", "warc_ts", "seq", "text", "lang",
             "valid_from", "valid_to"]
        )
        i = batch.column_names.index("warc_ts")
        return batch.set_column(
            i, "warc_ts", batch.column("warc_ts").cast(pa.timestamp("us"))
        )

    return ds.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_restore_feed(sf_dir: str):
    """Head rollback as a FEED, DRIVER-ORACLE-CHECKED: ingest the
    derived WAL in two commits, :func:`..pipelines.maintenance
    .restore_lake` back to v1 (new v3, no data copied), then stream
    ``changes_between(2, 3)`` — the restore's diff is the INVERSE of
    the rolled-back changes (rolled-back inserts surface as deletes,
    updates as counter-updates carrying the OLD winner). The oracle is
    the change-feed SQL with the window-LWW states ROLE-SWAPPED (old =
    all events, new = first half), including the live->ABSENT delete
    rows with NULL identity (urls born in the second half have no
    stored tombstone to name)."""
    import shutil

    from ..pipelines.cdc import CdcConfig, changes_between, run_ingest
    from ..pipelines.maintenance import restore_lake
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "restorefeed")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> v1, v2
    )
    run_ingest(cfg)
    restore_lake(cfg.lake_dir, 1)  # -> v3 == v1's state
    ds = changes_between(cfg.lake_dir, 2, 3)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.select(
            ["url", "change_op", "warc_ts", "seq", "text", "lang"]
        )
        i = batch.column_names.index("warc_ts")
        return batch.set_column(
            i, "warc_ts", batch.column("warc_ts").cast(pa.timestamp("us"))
        )

    return ds.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_entity_change_feed(sf_dir: str):
    """Group-valued change feed, DRIVER-ORACLE-CHECKED: ingest the
    derived ENTITY WAL in two commits, then stream
    :func:`..pipelines.cdc.entity_changes_between`\\(v1, v2) — each
    changed url contributes its whole new entity row-set (3 literal
    rows from the fixed title/h1/link skeleton) or a single tombstone
    row. The oracle is the page-feed classification CROSS-joined with
    the entity fan-out literals."""
    import shutil

    from ..pipelines.cdc import (
        CdcConfig,
        entity_changes_between,
        run_entity_ingest,
    )
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "efeed")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=True,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_entity_ingest(cfg)
    ds = entity_changes_between(cfg.lake_dir, 1, 2)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.select([
            "url", "change_op", "warc_ts", "seq", "entity_type",
            "title", "href", "anchor", "link_index", "level", "text",
        ])
        i = batch.column_names.index("warc_ts")
        return batch.set_column(
            i, "warc_ts", batch.column("warc_ts").cast(pa.timestamp("us"))
        )

    return ds.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_incremental_lang_counts(sf_dir: str):
    """Incrementally-maintained materialized view, DRIVER-ORACLE-
    CHECKED: ingest the derived WAL in two commits, FULL-build the
    per-lang live-row-count view pinned at lake v1, then refresh to v2
    by applying only the signed pre-image change feed
    (``changes_between(1, 2, preimages=True)``) — never rescanning the
    lake. The oracle recomputes the same counts from scratch in SQL, so
    the retraction arithmetic (insert/update_preimage/update_postimage/
    delete) is hash-checked end-to-end."""
    import shutil

    from ..pipelines.cdc import CdcConfig, run_ingest
    from ..pipelines.incremental import read_view, refresh_live_counts
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "mview")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_ingest(cfg)
    view_dir = os.path.join(work, "view")
    r1 = refresh_live_counts(cfg.lake_dir, view_dir, at_version=1)
    r2 = refresh_live_counts(cfg.lake_dir, view_dir)
    assert r1["mode"] == "full" and r2["mode"] == "incremental"
    return read_view(view_dir)


def q_incremental_lang_stats(sf_dir: str):
    """Generalized incremental view, DRIVER-ORACLE-CHECKED: count AND
    summed text length per lang, maintained by signed pre-image
    retraction arithmetic (±len per change row) instead of a lake
    rescan. Same two-commit shape as ``incremental_lang_counts``; the
    ``derive`` hook adds the ``chars`` metric column per batch."""
    import shutil

    from ..pipelines.cdc import CdcConfig, run_ingest
    from ..pipelines.incremental import read_view, refresh_live_stats
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "mstats")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_ingest(cfg)

    def add_chars(t: pa.Table) -> pa.Table:
        chars = pc.fill_null(
            pc.utf8_length(t.column("text")), 0
        ).cast(pa.int64())
        return t.append_column("chars", chars)

    view_dir = os.path.join(work, "view")
    r1 = refresh_live_stats(
        cfg.lake_dir, view_dir, "lang", ["chars"],
        derive=add_chars, source_cols=["text"], at_version=1,
    )
    r2 = refresh_live_stats(
        cfg.lake_dir, view_dir, "lang", ["chars"],
        derive=add_chars, source_cols=["text"],
    )
    assert r1["mode"] == "full" and r2["mode"] == "incremental"
    return read_view(view_dir)


def q_incremental_lang_segment_counts(sf_dir: str):
    """COMPOSITE-KEY incremental view, DRIVER-ORACLE-CHECKED: live-row
    counts per (lang, _src_segment) — the provenance column records
    which WAL segment delivered each url's winning event, so the key
    tuple is fully derivable in SQL (segment index = winning event's
    rank bucketed by ceil(n/8)). Built at v1, refreshed to v2 through
    the signed pre-image feed with a two-column group key."""
    import shutil

    from ..pipelines.cdc import CdcConfig, run_ingest
    from ..pipelines.incremental import read_view, refresh_live_stats
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "mseg")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_ingest(cfg)
    view_dir = os.path.join(work, "view")
    keys = ["lang", "_src_segment"]
    r1 = refresh_live_stats(cfg.lake_dir, view_dir, keys, at_version=1)
    r2 = refresh_live_stats(cfg.lake_dir, view_dir, keys)
    assert r1["mode"] == "full" and r2["mode"] == "incremental"
    return read_view(view_dir)


def q_incremental_lang_distinct_segments(sf_dir: str):
    """NON-INVERTIBLE incremental view, DRIVER-ORACLE-CHECKED: exact
    COUNT(DISTINCT _src_segment) per lang — retraction arithmetic
    cannot maintain a distinct count (a deleted contributor says
    nothing about survivors), so the refresh runs the affected-key
    recompute path (`refresh_live_distinct`): build at v1, refresh to
    v2 recomputing ONLY the langs the pre-image feed names. The oracle
    recomputes the winners' distinct segment buckets from scratch in
    SQL."""
    import shutil

    from ..pipelines.cdc import CdcConfig, run_ingest
    from ..pipelines.incremental import (
        read_distinct_view,
        refresh_live_distinct,
    )
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "mdist")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_ingest(cfg)
    view_dir = os.path.join(work, "view")
    r1 = refresh_live_distinct(
        cfg.lake_dir, view_dir, key="lang", distinct_col="_src_segment",
        at_version=1,
    )
    r2 = refresh_live_distinct(
        cfg.lake_dir, view_dir, key="lang", distinct_col="_src_segment"
    )
    assert r1["mode"] == "full" and r2["mode"] == "incremental"
    return read_distinct_view(view_dir)


def q_replica_purchase_pages(sf_dir: str):
    """Feed-driven filtered replica, DRIVER-ORACLE-CHECKED: ingest the
    derived WAL in two commits, sync a replica of lang=='purchase'
    pages at source v1, then incrementally apply the v1->v2 feed
    (upserts, predicate exits, deletes — all row-level MERGE-INTO
    arithmetic). The oracle recomputes the filtered LWW-live state
    from scratch; hash equality proves the replica converged without
    ever rescanning the source."""
    import shutil

    from ..pipelines.cdc import CdcConfig, lake_snapshot, run_ingest
    from ..pipelines.replicate import sync_replica
    from ..sources.synthetic import derive_wal_from_events

    work = derived_cdc_workdir(sf_dir, "replica")
    shutil.rmtree(work, ignore_errors=True)
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), os.path.join(work, "wal"),
        n_segments=8, entity_html=False,
    )
    cfg = CdcConfig(
        wal_dir=os.path.join(work, "wal"),
        lake_dir=os.path.join(work, "lake"),
        num_partitions=16,
        max_segments_per_batch=4,  # -> exactly two commits: v1, v2
    )
    run_ingest(cfg)

    def is_purchase(t: pa.Table) -> pa.Array:
        return pc.equal(t.column("lang"), "purchase")

    rep = os.path.join(work, "replica")
    r1 = sync_replica(cfg.lake_dir, rep, predicate=is_purchase, at_version=1)
    r2 = sync_replica(cfg.lake_dir, rep, predicate=is_purchase)
    assert r1["mode"] == "full" and r2["mode"] == "incremental"
    snap = lake_snapshot(rep).select(["url", "warc_ts", "seq", "text", "lang"])
    i = snap.column_names.index("warc_ts")
    return snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )


def q_cdc_entity_lake(sf_dir: str):
    """Multi-entity demux CDC, DRIVER-ORACLE-CHECKED: the derived html
    carries a fixed title/h1/link skeleton, so each winning event's
    parsed page/heading/link entity rows are SQL literals; group-valued
    LWW == per-user window LWW fanned out via UNION ALL."""
    snap = _run_derived_cdc(sf_dir, "entity", entity=True)
    return snap.select(
        ["url", "warc_ts", "seq", "entity_type", "title", "href",
         "anchor", "link_index", "level", "text"]
    )


def q_cdc_dedup_index(sf_dir: str):
    """Incrementally-MAINTAINED exact-dedup index, DRIVER-ORACLE-
    CHECKED (at 100 TB duplicate detection must be maintained from the
    change feed, never recomputed per commit): WAL derived from
    ``events`` with COLLIDING texts (``text_mod=7`` — the winning text
    per url is ``'page rev ' || (event_id % 7)``), half the segments
    ingested then a FULL index build, the rest ingested then an
    O(delta) incremental refresh off the pre-image feed. Result =
    duplicate groups (key, n_urls, min_url) read from the maintained
    index, which must equal a plain group-by over the full-WAL
    window-LWW state (``pipelines/dedup_index.py``)."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .cdc import CdcConfig, run_ingest
    from .dedup_index import dup_groups, refresh_dedup_index

    work = derived_cdc_workdir(sf_dir, "dedupidx")
    shutil.rmtree(work, ignore_errors=True)
    wal = os.path.join(work, "wal")
    lake = os.path.join(work, "lake")
    idx = os.path.join(work, "idx")
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), wal, n_segments=8,
        text_mod=7,
    )
    run_ingest(CdcConfig(
        wal_dir=wal, lake_dir=lake, num_partitions=16,
        segment_glob="segment-0000[0-3].parquet",
    ))
    refresh_dedup_index(lake, idx)
    run_ingest(CdcConfig(wal_dir=wal, lake_dir=lake, num_partitions=16))
    res = refresh_dedup_index(lake, idx)
    if res["mode"] != "incremental":  # the claim under test
        raise RuntimeError(f"expected incremental refresh, got {res}")
    return dup_groups(idx)


def q_cdc_simhash_index(sf_dir: str):
    """Incrementally-maintained SIMHASH near-dup index, DRIVER-ORACLE-
    CHECKED: same colliding-text WAL as ``cdc_dedup_index``, half
    ingested -> full band-index build, rest -> O(delta) refresh
    (preimage signatures recomputed from the feed — deterministic, so
    no signature store), then near-dup clusters verified exactly
    in-bucket via the pigeonhole Hamming kernel WITHOUT any text
    access. The 7 derived texts sit >= 7 Hamming apart (pinned by
    ``test_dedup_index.py``), so with max_hamming=3 the clusters are
    EXACTLY the identical-text groups — SQL-expressible, making this
    probabilistic-family operator fully hash-checkable."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .cdc import CdcConfig, run_ingest
    from .dedup_index import near_dup_clusters, refresh_simhash_index

    work = derived_cdc_workdir(sf_dir, "simhashidx")
    shutil.rmtree(work, ignore_errors=True)
    wal = os.path.join(work, "wal")
    lake = os.path.join(work, "lake")
    idx = os.path.join(work, "idx")
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), wal, n_segments=8,
        text_mod=7,
    )
    run_ingest(CdcConfig(
        wal_dir=wal, lake_dir=lake, num_partitions=16,
        segment_glob="segment-0000[0-3].parquet",
    ))
    refresh_simhash_index(lake, idx)
    run_ingest(CdcConfig(wal_dir=wal, lake_dir=lake, num_partitions=16))
    res = refresh_simhash_index(lake, idx)
    if res["mode"] != "incremental":  # the claim under test
        raise RuntimeError(f"expected incremental refresh, got {res}")
    return near_dup_clusters(idx, max_hamming=3)


def q_cdc_multi_source(sf_dir: str):
    """Multi-WAL FAN-IN ingest, DRIVER-ORACLE-CHECKED: the events
    stream is split by event-id parity into TWO independent WALs
    (shards/regions/producers), interleave-ingested into ONE lake under
    per-source strictly-greater watermarks (``CdcConfig.source``;
    ``manifest.source_watermarks`` advances atomically with each
    commit). LWW by (warc_ts, seq) arbitrates across sources exactly as
    across segments, so the final state must hash-equal the SAME
    window-LWW SQL oracle as ``cdc_lake_state`` — fan-in invents and
    loses nothing."""
    import shutil

    import pyarrow.parquet as _pq

    from ..sources.synthetic import derive_wal_from_events
    from .cdc import CdcConfig, lake_snapshot, run_ingest

    work = derived_cdc_workdir(sf_dir, "multisrc")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    ev = _pq.read_table(os.path.join(sf_dir, "events.parquet"))
    parity = pc.bit_wise_and(ev.column("event_id"), 1)
    _pq.write_table(
        ev.filter(pc.equal(parity, 0)), os.path.join(work, "ev_a.parquet")
    )
    _pq.write_table(
        ev.filter(pc.equal(parity, 1)), os.path.join(work, "ev_b.parquet")
    )
    derive_wal_from_events(
        os.path.join(work, "ev_a.parquet"), os.path.join(work, "wal_a"),
        n_segments=4,
    )
    derive_wal_from_events(
        os.path.join(work, "ev_b.parquet"), os.path.join(work, "wal_b"),
        n_segments=4,
    )
    lake = os.path.join(work, "lake")
    half = "segment-0000[0-1].parquet"

    def cfg(src: str, **kw) -> CdcConfig:
        return CdcConfig(
            wal_dir=os.path.join(work, f"wal_{src}"), lake_dir=lake,
            num_partitions=16, source=src, **kw,
        )

    # interleaved: a-half, b-half, a-rest, b-rest — four commits, two
    # independent cursors
    run_ingest(cfg("a", segment_glob=half))
    run_ingest(cfg("b", segment_glob=half))
    run_ingest(cfg("a"))
    run_ingest(cfg("b"))
    snap = lake_snapshot(lake)
    i = snap.column_names.index("warc_ts")
    snap = snap.set_column(
        i, "warc_ts", snap.column("warc_ts").cast(pa.timestamp("us"))
    )
    return snap.select(["url", "warc_ts", "seq", "text", "lang"])


def q_cdc_canonical_corpus(sf_dir: str):
    """Canonical corpus from the MAINTAINED index, DRIVER-ORACLE-
    CHECKED: the colliding-text lake (built + index-refreshed
    incrementally like ``cdc_dedup_index``) minus every duplicate
    group's non-min urls — the curated training corpus a 100-TB
    pipeline keeps continuously instead of re-deduplicating per run.
    The drop set streams from the index (bounded by the dup rate) and
    anti-filters the lake read; result hash-equals the window-LWW SQL
    state joined to its per-text min url."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .cdc import CdcConfig, read_lake, run_ingest
    from .dedup_index import dup_drop_urls, refresh_dedup_index

    work = derived_cdc_workdir(sf_dir, "canonical")
    shutil.rmtree(work, ignore_errors=True)
    wal = os.path.join(work, "wal")
    lake = os.path.join(work, "lake")
    idx = os.path.join(work, "idx")
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), wal, n_segments=8,
        text_mod=7,
    )
    run_ingest(CdcConfig(
        wal_dir=wal, lake_dir=lake, num_partitions=16,
        segment_glob="segment-0000[0-3].parquet",
    ))
    refresh_dedup_index(lake, idx)
    run_ingest(CdcConfig(wal_dir=wal, lake_dir=lake, num_partitions=16))
    refresh_dedup_index(lake, idx)
    # drop set: measured-small (bounded by the dup rate) -> broadcast
    drop_t = pa.concat_tables(list(
        dup_drop_urls(idx).iter_batches(batch_format="pyarrow")
    ))
    drop_arr = drop_t.column("url").combine_chunks() if isinstance(
        drop_t.column("url"), pa.ChunkedArray) else drop_t.column("url")

    def anti(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(t.column("url"), value_set=drop_arr))
        t = t.filter(keep)
        i = t.column_names.index("warc_ts")
        return t.set_column(
            i, "warc_ts", t.column("warc_ts").cast(pa.timestamp("us"))
        )

    ds = read_lake(lake, columns=["url", "warc_ts", "seq", "text", "lang"])
    return ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_catalog(sf_dir: str):
    """Cross-table CATALOG flagship, DRIVER-ORACLE-CHECKED: ONE derived
    WAL feeds TWO member lakes — the page lake and the group-valued
    entity fan-out lake — through :func:`..pipelines.catalog.
    run_consistent_ingest` in two micro-batches; the catalog document
    advances only after BOTH lakes committed each batch (the
    transactional-outbox shape; a crash between lakes leaves the
    catalog at the previous consistent set). The result joins the
    catalog-PINNED page state with per-url entity counts from the
    catalog-PINNED entity lake: exactly the page+heading+link triple
    per live url, so a mixed-offset read (table A at batch 2, table B
    at batch 1) would surface as join drop-outs or stale counts. The
    reference analog is the one XML ingest loading several BigQuery
    tables per batch (``ejp_xml_pipeline/etl.py``,
    ``s3_xml_import_pipeline.py``)."""
    import shutil

    from ..sources.synthetic import derive_wal_from_events
    from .catalog import catalog_snapshot, load_catalog, run_consistent_ingest
    from .cdc import CdcConfig, load_manifest

    work = derived_cdc_workdir(sf_dir, "catalog")
    shutil.rmtree(work, ignore_errors=True)
    wal = os.path.join(work, "wal")
    cat = os.path.join(work, "catalog")
    derive_wal_from_events(
        os.path.join(sf_dir, "events.parquet"), wal, n_segments=8,
        entity_html=True,
    )

    def cfgs(glob: str | None) -> dict:
        kw = {"segment_glob": glob} if glob else {}
        return {
            "pages": CdcConfig(
                wal_dir=wal, lake_dir=os.path.join(work, "pages"),
                num_partitions=16, **kw),
            "entities": CdcConfig(
                wal_dir=wal, lake_dir=os.path.join(work, "entities"),
                num_partitions=16, **kw),
        }

    # batch 1: first half of the WAL -> catalog v1; batch 2: the rest
    r1 = run_consistent_ingest(
        cat, cfgs("segment-0000[0-3].parquet"), entity={"entities"})
    r2 = run_consistent_ingest(cat, cfgs(None), entity={"entities"})
    assert (r1["catalog_version"], r2["catalog_version"]) == (1, 2)
    doc = load_catalog(cat)
    for name in ("pages", "entities"):
        head = load_manifest(os.path.join(work, name)).version
        assert doc["tables"][name]["version"] == head, (name, head, doc)

    pages = catalog_snapshot(cat, "pages").select(
        ["url", "warc_ts", "seq", "lang"])
    i = pages.column_names.index("warc_ts")
    pages = pages.set_column(
        i, "warc_ts", pages.column("warc_ts").cast(pa.timestamp("us")))
    counts = (
        catalog_snapshot(cat, "entities").select(["url"])
        .group_by("url").aggregate([("url", "count")])
        .rename_columns(["url", "n_entities"])
    )
    return pages.join(counts, keys="url", join_type="inner")


def q_value_quantiles_tdigest(sf_dir: str):
    """ONE-PASS approximate grouped quantiles via the mergeable t-digest
    (``functions/sketch.py``): per-batch per-group digests (~KB each)
    merged driver-side — the values themselves never move, vs the exact
    sibling ``value_quantiles_by_type``'s 3 selection passes. Rows-only
    (approximate by design); rank-error vs the exact sibling is bounded
    by ``tests/test_sketch.py``."""
    from ..functions.sketch import tdigest_grouped_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"], rows_per_block=20_000)
    ps = [0.25, 0.5, 0.75, 0.9]
    qs = tdigest_grouped_quantiles(ds, "value", ps, group_col="event_type")
    groups = sorted(qs)
    cols: dict = {"event_type": pa.array(groups, pa.string())}
    for name, i in zip(["p25", "p50", "p75", "p90"], range(len(ps))):
        cols[name] = pa.array(
            [float(qs[g][i]) for g in groups], pa.float64()
        )
    return pa.table(cols)


def q_distinct_sources_by_lang(sf_dir: str):
    """Group-valued string aggregation (collect-set + ordered join): the
    sorted distinct source list per language as one string. Scale shape:
    a per-batch DISTINCT-pair combiner collapses each block to at most
    |langs|x|sources| rows BEFORE the shuffle, so the groupby moves the
    distinct-pair set, never the corpus."""
    ds = _read(sf_dir, "documents", ["lang", "source"], rows_per_block=20_000)

    def local_distinct(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t).unique().to_arrow().cast(
                pa.schema([("lang", pa.string()), ("source", pa.string())])
            )
        )

    pairs = ds.map_batches(
        local_distinct, batch_format="pyarrow", zero_copy_batch=True
    )

    def assemble(g: pa.Table) -> pa.Table:
        srcs = sorted(set(g.column("source").to_pylist()))
        return pa.table({
            "lang": pa.array([g.column("lang")[0].as_py()], pa.string()),
            "sources": pa.array([",".join(srcs)], pa.string()),
            "n_sources": pa.array([len(srcs)], pa.int64()),
        })

    return pairs.groupby("lang").map_groups(assemble, batch_format="pyarrow")


#: Bigrams below this corpus count are noise — and a deterministic
#: result set needs a count floor, not a top-k with unstable ties.
_BIGRAM_MIN_COUNT = 5


def q_bigram_counts(sf_dir: str):
    """Corpus n-gram language-model counts (bigrams with count >=
    floor): vectorized polars tokenise -> explode -> shift-join within
    each doc, LOCAL count combiner per block, tiny global sum. The
    shuffle moves (bigram, partial_count) rows bounded by per-block
    vocabulary — never the corpus text."""
    ds = _read(sf_dir, "documents", ["text"], rows_per_block=2_000)

    def local_bigrams(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_row_index("rid")
        ex = (
            df.select(
                pl.col("rid"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("tk"),
            )
            .explode("tk")
            .drop_nulls()
        )
        ex = ex.with_columns(
            bigram=pl.col("tk") + " " + pl.col("tk").shift(-1),
            rid2=pl.col("rid").shift(-1),
        )
        out = (
            ex.filter(pl.col("rid") == pl.col("rid2"))
            .group_by("bigram").agg(pl.len().cast(pl.Int64).alias("n"))
        )
        return out.to_arrow().cast(
            pa.schema([("bigram", pa.string()), ("n", pa.int64())])
        )

    counts = ds.map_batches(
        local_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = counts.groupby("bigram").aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("n"), _BIGRAM_MIN_COUNT)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _round4_half_away(x: float) -> float:
    return float(np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4)


def q_value_moments_by_type(sf_dir: str):
    """Distributed moment aggregates (mean / sample stddev) via the
    classic (n, sum, sumsq) partials: each block collapses to one row
    per group before the shuffle; the final reduce sees blocks x groups
    rows. Rounded scale-4 on both sides so summation order can't flip
    the value hash."""
    ds = _read(sf_dir, "events", ["event_type", "value"], rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = df.group_by("event_type").agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("value").sum().alias("s1"),
            (pl.col("value") ** 2).sum().alias("s2"),
        )
        return out.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("n", pa.int64()),
            ("s1", pa.float64()), ("s2", pa.float64()),
        ]))

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # DETERMINISTIC driver fold over the tiny partials (blocks x groups
    # rows), sorted by (event_type, n, s1): Ray's distributed float Sum
    # folds in task-arrival order, which could flip the 4th decimal on
    # a knife-edge value run-to-run; the cross-engine gap vs DuckDB's
    # own order remains bridged by the scale-4 rounding.
    blocks = [
        b for b in parts.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    out_schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("mean_value", pa.float64()), ("std_value", pa.float64()),
    ])
    if not blocks:
        return out_schema.empty_table()
    df = (
        pl.from_arrow(pa.concat_tables(blocks))
        .sort(["event_type", "n", "s1"])
        .group_by("event_type", maintain_order=True)
        .agg(pl.col("n").sum(), pl.col("s1").sum(), pl.col("s2").sum())
        .sort("event_type")
    )
    n = df["n"].to_numpy().astype(np.float64)
    s1 = df["s1"].to_numpy()
    s2 = df["s2"].to_numpy()
    mean = s1 / n
    var = np.maximum(s2 - s1 * s1 / n, 0.0) / np.maximum(n - 1, 1.0)
    std = [
        None if cnt < 2 else _round4_half_away(x)  # stddev_samp(1 row)=NULL
        for cnt, x in zip(n, np.sqrt(var))
    ]
    return pa.table({
        "event_type": pa.array(df["event_type"].to_list(), pa.string()),
        "n": pa.array(df["n"].to_list(), pa.int64()),
        "mean_value": pa.array(
            [_round4_half_away(x) for x in mean], pa.float64()),
        "std_value": pa.array(std, pa.float64()),
    })


#: Weighted-sample size (priority sampling: rank by hash/weight — the
#: byte-budgeted corpus subsampling primitive, weight = n_chars).
_WEIGHTED_SAMPLE_K = 50


def q_weighted_sample_docs(sf_dir: str):
    """Deterministic WEIGHTED sample (priority / bottom-k sampling):
    rank docs by ``hash(doc_id) / weight`` and keep the k smallest —
    longer docs proportionally likelier, reproducible under
    repartitioning, and SQL-expressible (IEEE division is bit-exact on
    both sides, unlike ln()/pow() A-Res variants). Scale shape: per-block
    keep-k combiner, then one tiny final sort — the full corpus is
    never globally sorted (same pattern as ``top_customers``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"],
               rows_per_block=20_000)
    k = _WEIGHTED_SAMPLE_K

    def local_topk(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False)
        # ineligible rows (w <= 0) are FILTERED, not inf-keyed: an inf
        # placeholder would pad the result when fewer than k eligible
        # docs exist corpus-wide, where the SQL's WHERE clause doesn't
        elig = np.flatnonzero(w > 0)
        h = (did[elig] * _SAMPLE_MULT) % _SAMPLE_MOD
        key = h / w[elig]
        sel = np.lexsort((did[elig], key))[:k]
        out = t.take(pa.array(elig[sel]))
        return out.append_column("_k", pa.array(key[sel], pa.float64()))

    parts = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    schema = pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string()),
        ("n_chars", pa.int64()), ("_k", pa.float64()),
    ])
    tbls = [
        b.cast(schema)
        for b in parts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    top = pa.concat_tables(tbls) if tbls else schema.empty_table()
    df = pl.from_arrow(top).sort(["_k", "doc_id"]).head(k)
    return df.drop("_k").to_arrow()


def q_moving_avg_value_per_user(sf_dir: str):
    """4-row MOVING AVERAGE over the ordered per-user log. Hash-exact
    float strategy (the ``orders_left_join`` trick, windowed): each
    value snaps to the 1e-4 grid as BIGINT first, the 4-term window
    sum is INTEGER (order-independent), and the final
    int/count/10000.0 double divisions are IEEE-exact identical on
    both sides — no rounding epsilon anywhere. One vectorized
    shift-sum kernel per bucket of complete users."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"],
               rows_per_block=20_000)

    def mov_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        v = (pl.col("value") * 10000).round(0).cast(pl.Int64)
        terms = [
            v.shift(i).over("user_id").fill_null(0) for i in range(4)
        ]
        present = [
            v.shift(i).over("user_id").is_not_null().cast(pl.Int64)
            for i in range(4)
        ]
        s = terms[0]
        for x in terms[1:]:
            s = s + x
        c = present[0]
        for x in present[1:]:
            c = c + x
        out = df.with_columns(s.alias("_s"), c.alias("_c")).select(
            ["event_id", "user_id", "_s", "_c"]
        ).to_arrow()
        # numpy does the two IEEE divisions literally — polars'
        # expression engine rewrites /constant into *reciprocal
        # (65500/10000.0 != 65500*1e-4 in the last ulp), which breaks
        # hash parity with the SQL's real division
        mov = (
            out.column("_s").to_numpy(zero_copy_only=False).astype(np.float64)
            / out.column("_c").to_numpy(zero_copy_only=False).astype(np.float64)
            / 10000.0
        )
        return pa.table({
            "event_id": out.column("event_id").cast(pa.int64()),
            "user_id": out.column("user_id").cast(pa.int64()),
            "mov_avg": pa.array(mov, pa.float64()),
        })

    return _bucketed_groups(
        ds, "user_id", mov_bucket, num_buckets=_buckets_for(sf_dir)
    )


def q_next_event_gap(sf_dir: str):
    """LEAD window op: microseconds to each user's next event (NULL on
    the last) — integer-exact timestamp arithmetic, one vectorized
    shift per bucket of complete users."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"],
               rows_per_block=20_000)

    def gap_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        out = df.with_columns(
            (
                pl.col("ts").shift(-1).over("user_id").cast(pl.Int64)
                - pl.col("ts").cast(pl.Int64)
            ).alias("gap_us")
        ).select(["event_id", "user_id", "gap_us"])
        return out.to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]))

    return _bucketed_groups(
        ds, "user_id", gap_bucket, num_buckets=_buckets_for(sf_dir)
    )


def q_event_transitions(sf_dir: str):
    """Markov TRANSITION counts over each user's ts-ordered stream
    (the sequence-mining primitive behind session-flow / funnel-step
    analytics): global count of (prev_type -> next_type) pairs. One
    vectorized shift per bucket of complete users emits per-bucket
    partial counts (|types|^2 rows max), so the final fold sees
    buckets x 25 rows — aggregate-sized, never the event stream."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"],
               rows_per_block=20_000)

    def pairs_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        out = (
            df.with_columns(
                pl.col("event_type").shift(1).over("user_id")
                .alias("prev_type")
            )
            .filter(pl.col("prev_type").is_not_null())
            .rename({"event_type": "next_type"})
            .group_by("prev_type", "next_type")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        return out.to_arrow().cast(pa.schema([
            ("prev_type", pa.string()), ("next_type", pa.string()),
            ("n", pa.int64()),
        ]))

    partials = _bucketed_groups(
        ds, "user_id", pairs_bucket, num_buckets=_buckets_for(sf_dir)
    )
    # final fold over buckets x |types|^2 partial rows (aggregate-sized)
    tab = pa.concat_tables(
        b.select(["prev_type", "next_type", "n"])
        for b in arrow_blocks(partials)
    )
    return (
        tab.group_by(["prev_type", "next_type"]).aggregate([("n", "sum")])
        .rename_columns(["prev_type", "next_type", "n"])
    )


def q_debounce_events(sf_dir: str):
    """DEBOUNCE / burst-dedup (the CDC duplicate-delivery suppressor):
    drop any event arriving within 60 s of the previous event of the
    same (user, type) — integer-exact timestamp arithmetic, one
    vectorized shift per bucket of complete users (a bucket holds
    whole users, hence whole (user, type) partitions)."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type"],
               rows_per_block=20_000)
    gap_us = 60_000_000

    def debounce_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "event_type", "ts", "event_id"])
        gap = (
            pl.col("ts").cast(pl.Int64)
            - pl.col("ts").cast(pl.Int64).shift(1)
            .over(["user_id", "event_type"])
        )
        out = (
            df.filter(gap.is_null() | (gap >= gap_us))
            .select(["event_id", "user_id", "event_type", "ts"])
        )
        return out.to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("event_type", pa.string()), ("ts", pa.timestamp("us")),
        ]))

    return _bucketed_groups(
        ds, "user_id", debounce_bucket, num_buckets=_buckets_for(sf_dir)
    )


def q_purchase_attribution(sf_dir: str):
    """LAST-TOUCH ATTRIBUTION (self as-of join within the stream): each
    purchase event gains the user's most recent strictly-preceding
    'view' timestamp (NULL when none) — the funnel-credit primitive.
    Only view/purchase rows leave storage (predicate pushed into the
    read); one vectorized running-max-shift kernel per bucket of
    complete users; integer sentinel arithmetic keeps the running max
    null-free until the final cast back to timestamp."""
    ev_path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(
        ev_path,
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pc.field("event_type").isin(["view", "purchase"]),
        override_num_blocks=_nblocks(ev_path, 20_000),
    )
    sentinel = -(1 << 62)

    def attribute_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        view_ts = (
            pl.when(pl.col("event_type") == "view")
            .then(pl.col("ts").cast(pl.Int64))
            .otherwise(sentinel)
        )
        out = (
            df.with_columns(
                view_ts.cum_max().shift(1).over("user_id").alias("_lv")
            )
            .filter(pl.col("event_type") == "purchase")
            .with_columns(
                pl.when(pl.col("_lv") > sentinel)
                .then(pl.col("_lv"))
                .otherwise(None)
                .cast(pl.Datetime("us"))
                .alias("last_view_ts")
            )
            .select(["event_id", "user_id", "ts", "last_view_ts"])
        )
        return out.to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")), ("last_view_ts", pa.timestamp("us")),
        ]))

    return _bucketed_groups(
        ds, "user_id", attribute_bucket, num_buckets=_buckets_for(sf_dir)
    )


def q_events_above_type_p90(sf_dir: str):
    """Quantile-gated filter (outlier selection): events strictly above
    their type's p90 — composes the bit-exact distributed quantile
    machinery (3-pass selection, quantile_cont interpolation) with a
    broadcast threshold filter; the comparison is against the SAME
    float the SQL window computes, so the row set is hash-exact."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"],
               rows_per_block=20_000)
    p90 = {
        g: qs[0.9]
        for g, qs in grouped_quantiles_distributed(
            ds, "event_type", "value", [0.9]
        ).items()
    }

    def gate(t: pa.Table) -> pa.Table:
        cut = np.fromiter(
            (p90[g] for g in t.column("event_type").to_pylist()),
            dtype=np.float64, count=t.num_rows,
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(v > cut))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def q_mode_event_type_per_user(sf_dir: str):
    """Grouped MODE with deterministic tiebreak (most-frequent event
    type per user; ties -> lexicographically first): per-batch
    (user, type) count combiner, grouped sum, then one vectorized
    arg-max kernel per bucket of complete users."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"],
               rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("user_id", "event_type")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow().cast(pa.schema([
                ("user_id", pa.int64()), ("event_type", pa.string()),
                ("n", pa.int64()),
            ]))
        )

    counts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    # ONE shuffle: the bucket holds complete users, so every (user,
    # type) partial for a user lands in the same bucket — the grouped
    # sum fuses into the argmax kernel instead of paying a second
    # full sort-aggregate exchange over the (user, type) pairs.
    def mode_bucket(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .group_by("user_id", "event_type")
            .agg(pl.col("n").sum())
            .sort(["user_id", "n", "event_type"],
                  descending=[False, True, False])
            .unique(subset=["user_id"], keep="first", maintain_order=True)
            .rename({"event_type": "mode_type"})
            .select(["user_id", "mode_type", "n"])
        )
        return df.to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("mode_type", pa.string()),
            ("n", pa.int64()),
        ]))

    return _bucketed_groups(
        counts, "user_id", mode_bucket, num_buckets=_buckets_for(sf_dir)
    )


#: Columns the documents profile covers (string + numeric mix).
_PROFILE_COLS = ["lang", "source", "n_chars"]


def q_profile_documents(sf_dir: str):
    """Data PROFILING (the ANALYZE / DESCRIBE-statistics operator): one
    streaming pass emits per-column row/null counts and typed min/max
    as per-batch partials (one row per column per block — the shuffle
    sees blocks x columns rows), plus an exact distinct count per
    column via a DISTINCT-pair combiner. Numeric columns min/max
    numerically then render to string, so the profile table has one
    uniform schema. Per-column distinct-value volume here is bounded
    by small domains; a high-NDV column would ride the hash-bucket
    count-distinct machinery instead (documented bound)."""
    ds = _read(sf_dir, "documents", _PROFILE_COLS, rows_per_block=20_000)

    def partials(t: pa.Table) -> pa.Table:
        rows = []
        for col in _PROFILE_COLS:
            c = t.column(col)
            mm = pc.min_max(c)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            rows.append({
                "col": col, "n": t.num_rows, "nulls": c.null_count,
                "min_s": None if lo is None else str(lo),
                "max_s": None if hi is None else str(hi),
                "is_num": pa.types.is_integer(c.type)
                or pa.types.is_floating(c.type),
            })
        return pa.Table.from_pylist(rows).cast(pa.schema([
            ("col", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
            ("min_s", pa.string()), ("max_s", pa.string()),
            ("is_num", pa.bool_()),
        ]))

    def distinct_pairs(t: pa.Table) -> pa.Table:
        frames = []
        for col in _PROFILE_COLS:
            vals = pc.drop_null(t.column(col)).unique()
            frames.append(pa.table({
                "col": pa.array([col] * len(vals), pa.string()),
                "v": vals.cast(pa.string()),
            }))
        return pa.concat_tables(frames)

    stats = ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def count_distinct(g: pa.Table) -> pa.Table:
        return pa.table({
            "col": pa.array([g.column("col")[0].as_py()], pa.string()),
            "n_distinct": pa.array(
                [len(g.column("v").unique())], pa.int64()
            ),
        })

    ndv: dict[str, int] = {}
    for b in pairs.groupby("col").map_groups(
        count_distinct, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for c, d in zip(
            b.column("col").to_pylist(), b.column("n_distinct").to_pylist()
        ):
            ndv[c] = d

    # merge the per-block partials (columns x blocks rows — tiny)
    df = pl.from_arrow(
        pa.concat_tables(
            b for b in stats.iter_batches(batch_format="pyarrow")
            if b.num_rows
        )
    )
    out_rows = []
    for col in _PROFILE_COLS:
        sub = df.filter(pl.col("col") == col)
        is_num = bool(sub["is_num"][0])
        mins = [x for x in sub["min_s"].to_list() if x is not None]
        maxs = [x for x in sub["max_s"].to_list() if x is not None]
        if is_num and mins:
            lo = str(min(int(x) for x in mins))
            hi = str(max(int(x) for x in maxs))
        elif is_num:
            lo = hi = None  # all-null numeric column: NULL, not 'None'
        else:
            lo = min(mins, default=None)
            hi = max(maxs, default=None)
        out_rows.append({
            "col": col,
            "n": int(sub["n"].sum()),
            "nulls": int(sub["nulls"].sum()),
            "n_distinct": int(ndv.get(col, 0)),
            "min_s": lo,
            "max_s": hi,
        })
    return pa.Table.from_pylist(out_rows).cast(pa.schema([
        ("col", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
        ("n_distinct", pa.int64()), ("min_s", pa.string()),
        ("max_s", pa.string()),
    ]))


def q_kmeans_embeddings(sf_dir: str):
    """Distributed k-means over the embedding corpus (Lloyd's where the
    vectors never leave the workers: per-block (sum, count, sse)
    partials, k x d floats per block on the wire; deterministic
    hash-seeded init; deterministic fold order). Rows-only — iterative
    clustering has no SQL oracle; `tests/test_ann.py` bounds it against
    the single-node reference and asserts monotone inertia +
    determinism."""
    from ..stages.ann import distributed_kmeans

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
               rows_per_block=20_000)
    cent, counts, inertia = distributed_kmeans(
        ds, "embedding", n_clusters=8, iters=8
    )
    return pa.table({
        "cluster": pa.array(np.arange(len(counts)), pa.int64()),
        "n": pa.array(counts, pa.int64()),
        "final_inertia": pa.array(
            np.full(len(counts), round(inertia[-1], 4)), pa.float64()
        ),
    })


def q_doc_repetition_stats(sf_dir: str):
    """Gopher-style per-document repetition gate (quality filtering for
    training corpora): top-word fraction <= 0.3 AND duplicate-bigram
    fraction <= 0.2, computed entirely with INTEGER comparisons
    (``top*10 <= n_tokens*3``) so the hash contract can't wobble on
    float division. Per-row semantics = embarrassingly parallel: one
    vectorized polars kernel per batch (tokenize -> explode -> two
    group_bys), zero shuffle. Reference analog: the per-record quality
    normalizers of §2.2 (M14), widened to corpus-curation semantics."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=20_000)

    _SCHEMA = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("top_word_count", pa.int64()), ("n_bigrams", pa.int64()),
        ("dup_bigram_count", pa.int64()), ("rep_ok", pa.bool_()),
    ])

    def rep_stats(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ex = df.select(
            pl.col("doc_id"),
            pl.col("text").str.to_lowercase()
            .str.extract_all(r"[a-z0-9]+").alias("tk"),
        ).explode("tk").drop_nulls()
        wc = ex.group_by("doc_id", "tk").agg(pl.len().alias("c"))
        wagg = wc.group_by("doc_id").agg(
            pl.col("c").sum().cast(pl.Int64).alias("n_tokens"),
            pl.col("c").max().cast(pl.Int64).alias("top_word_count"),
        )
        # adjacent-token bigrams: explode preserves per-doc order and
        # doc_ids are unique per row, so a shift+same-doc filter pairs
        # only within-document neighbours
        bg = ex.with_columns(
            b=pl.col("tk") + " " + pl.col("tk").shift(-1),
            d2=pl.col("doc_id").shift(-1),
        ).filter(pl.col("doc_id") == pl.col("d2"))
        bstat = bg.group_by("doc_id").agg(
            pl.len().cast(pl.Int64).alias("n_bigrams"),
            pl.col("b").n_unique().cast(pl.Int64).alias("nd"),
        )
        out = (
            df.select("doc_id")
            .join(wagg, on="doc_id", how="left")
            .join(bstat, on="doc_id", how="left")
            .fill_null(0)
            .with_columns(
                dup_bigram_count=pl.col("n_bigrams") - pl.col("nd")
            )
            .with_columns(
                rep_ok=(
                    pl.col("top_word_count") * 10 <= pl.col("n_tokens") * 3
                ) & (
                    pl.col("dup_bigram_count") * 10 <= pl.col("n_bigrams") * 2
                )
            )
            .select([
                "doc_id", "n_tokens", "top_word_count",
                "n_bigrams", "dup_bigram_count", "rep_ok",
            ])
        )
        return out.to_arrow().cast(_SCHEMA)

    return ds.map_batches(rep_stats, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_props_value_stats(sf_dir: str):
    """Semi-structured JSON extraction (the reference's sparse-dict
    records, §1.2, as a payload column): parse ``events.props`` JSON
    per batch (vectorized ``json_path_match``), aggregate the extracted
    integer per event_type via per-block partials + a tiny global
    groupby — the shuffle sees blocks x types rows, never the JSON."""
    ds = _read(sf_dir, "events", ["event_type", "props"],
               rows_per_block=20_000)

    _SCHEMA = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("sum_k", pa.int64()), ("min_k", pa.int64()), ("max_k", pa.int64()),
    ])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            k=pl.col("props").str.json_path_match("$.k").cast(pl.Int64)
        )
        out = df.group_by("event_type").agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("k").sum().alias("sum_k"),
            pl.col("k").min().alias("min_k"),
            pl.col("k").max().alias("max_k"),
        )
        return out.to_arrow().cast(_SCHEMA)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return parts.groupby("event_type").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_k", alias_name="sum_k"),
        Min("min_k", alias_name="min_k"),
        Max("max_k", alias_name="max_k"),
    )


def q_rarest_term_per_doc(sf_dir: str):
    """TF-IDF-shaped corpus annotation with integer-exact semantics:
    for every document, the term with the LOWEST global document
    frequency (tie-break lexicographic). Two-phase, both scale-shaped:

    1. distinct (doc_id, term) pairs hash-bucket by TERM; each bucket
       holds complete term groups, so the in-bucket count IS the global
       df — every pair is annotated in the same task that counted it
       (no separate df table, no broadcast: vocabulary at web scale is
       NOT a small side). Each bucket then emits only its per-doc
       minimum candidate, collapsing the stage-2 input to <= one row
       per (bucket, doc).
    2. per-doc global min via the per-block ``_keep_extreme`` combiner
       + the bucketed executor on doc_id.

    Shuffle volume: stage 1 moves the distinct token pairs once (the
    exact-df lower bound); stage 2 moves bucket-minima only."""
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    _PAIR = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("th", pa.int64()),
    ])
    _OUT = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("df", pa.int64()),
    ])

    def token_pairs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("term"),
            )
            .explode("term").drop_nulls()
            # docs are whole rows: per-block unique == global unique
            .unique(subset=["doc_id", "term"])
            .with_columns(
                th=pl.col("term").hash(seed=0).reinterpret(signed=True)
            )
        )
        out = ex.to_arrow().cast(_PAIR)
        return out.append_column(
            "_bucket", _hash_bucket(out.column("th"), num_buckets)
        )

    def df_and_local_min(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        df = df.with_columns(df=pl.len().over("term").cast(pl.Int64))
        out = (
            df.sort(["doc_id", "df", "term"])
            .unique(subset=["doc_id"], keep="first", maintain_order=True)
            .select(["doc_id", "term", "df"])
        )
        return out.to_arrow().cast(_OUT)

    pairs = ds.map_batches(token_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    candidates = pairs.groupby("_bucket").map_groups(
        lambda g: df_and_local_min(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    combined = candidates.map_batches(
        _keep_extreme,
        fn_kwargs={"key_cols": ["doc_id"], "order_cols": ["df", "term"],
                   "keep": "first"},
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def min_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.sort(["doc_id", "df", "term"])
            .unique(subset=["doc_id"], keep="first", maintain_order=True)
            .select(["doc_id", "term", "df"])
        )
        return out.to_arrow().cast(_OUT)

    return _bucketed_groups(
        combined, "doc_id", min_bucket,
        num_buckets=_buckets_for(sf_dir, "documents"),
    )


def q_tfidf_top_terms(sf_dir: str):
    """TF-IDF argmax per document — the classic relevance annotation a
    web-text pipeline stamps on every doc. score = tf * ln(N/df), with
    N from the parquet FOOTER (metadata only, exact) and df counted
    inside term-hash buckets exactly like ``rarest_term_per_doc`` (the
    vocabulary is NOT a small side at web scale, so df is computed in
    the same task that needs it — no broadcast, no df table).

    Hash parity with the oracle: the float score is snapped to an
    integer 1e-4 grid (``round(score*10000)`` as BIGINT, half-up — tf
    and ln(N/df) are nonnegative) and BOTH sides rank by
    (score_i DESC, term ASC), so last-ulp libm drift below the grid
    cannot flip the argmax.

    Shuffle volume: per-doc tf pairs once (stage 1), bucket argmax
    candidates (<= one row per bucket x doc) once (stage 2)."""
    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    _PAIR = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
        ("th", pa.int64()),
    ])
    _CAND = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
        ("df", pa.int64()), ("score_i", pa.int64()), ("nscore", pa.int64()),
    ])
    _OUT = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
        ("df", pa.int64()), ("score_i", pa.int64()),
    ])

    def tf_pairs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("term"),
            )
            .explode("term").drop_nulls()
            # docs are whole rows: per-block tf counts are global tf
            .group_by(["doc_id", "term"]).agg(tf=pl.len().cast(pl.Int64))
            .with_columns(
                th=pl.col("term").hash(seed=0).reinterpret(signed=True)
            )
        )
        out = ex.to_arrow().cast(_PAIR)
        return out.append_column(
            "_bucket", _hash_bucket(out.column("th"), num_buckets)
        )

    def score_and_local_max(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        # complete term groups per bucket: in-bucket doc count IS df
        df = df.with_columns(df=pl.len().over("term").cast(pl.Int64))
        tf = df.get_column("tf").to_numpy().astype(np.float64)
        dfreq = df.get_column("df").to_numpy().astype(np.float64)
        score = tf * np.log(float(n_docs) / dfreq) * 10000.0
        snapped = np.floor(score + 0.5).astype(np.int64)  # half-up, x >= 0
        out = (
            df.with_columns(
                score_i=pl.Series(snapped), nscore=pl.Series(-snapped)
            )
            .sort(["doc_id", "nscore", "term"])
            .unique(subset=["doc_id"], keep="first", maintain_order=True)
            .select(["doc_id", "term", "tf", "df", "score_i", "nscore"])
        )
        return out.to_arrow().cast(_CAND)

    pairs = ds.map_batches(tf_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    candidates = pairs.groupby("_bucket").map_groups(
        lambda g: score_and_local_max(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    combined = candidates.map_batches(
        _keep_extreme,
        fn_kwargs={"key_cols": ["doc_id"], "order_cols": ["nscore", "term"],
                   "keep": "first"},
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def max_bucket(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .sort(["doc_id", "nscore", "term"])
            .unique(subset=["doc_id"], keep="first", maintain_order=True)
            .select(["doc_id", "term", "tf", "df", "score_i"])
        )
        return out.to_arrow().cast(_OUT)

    return _bucketed_groups(
        combined, "doc_id", max_bucket,
        num_buckets=_buckets_for(sf_dir, "documents"),
    )


def q_term_postings(sf_dir: str):
    """Inverted-index build — the search-engine side of a web corpus:
    one row per TERM with document frequency, collection frequency, and
    the first-5-by-doc_id posting sample as a comma-joined string (a
    bounded preview column; the full posting list at web scale would be
    its own partitioned table keyed the same way).

    Single exchange: per-batch (doc_id, term, tf) partials hash-bucket
    by term; each bucket holds COMPLETE term groups, so df / cf / the
    sorted posting head are all exact inside one task and the output is
    already one row per term — no second reduce, no driver residency
    beyond the vocabulary-sized result."""
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    _PAIR = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
        ("th", pa.int64()),
    ])
    _OUT = pa.schema([
        ("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64()),
        ("postings", pa.string()),
    ])

    def tf_pairs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("term"),
            )
            .explode("term").drop_nulls()
            .group_by(["doc_id", "term"]).agg(tf=pl.len().cast(pl.Int64))
            .with_columns(
                th=pl.col("term").hash(seed=0).reinterpret(signed=True)
            )
        )
        out = ex.to_arrow().cast(_PAIR)
        return out.append_column(
            "_bucket", _hash_bucket(out.column("th"), num_buckets)
        )

    def postings_bucket(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by("term")
            .agg(
                df=pl.len().cast(pl.Int64),
                cf=pl.col("tf").sum().cast(pl.Int64),
                postings=pl.col("doc_id").sort().head(5),
            )
            .with_columns(
                pl.col("postings").cast(pl.List(pl.Utf8)).list.join(",")
            )
            .select(["term", "df", "cf", "postings"])
        )
        return out.to_arrow().cast(_OUT)

    pairs = ds.map_batches(tf_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    return pairs.groupby("_bucket").map_groups(
        lambda g: postings_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )


SESSION_SECONDS = 300  # fixed session length for the sweep-line op


def q_peak_concurrency_by_type(sf_dir: str):
    """Distributed SWEEP-LINE max-overlap: treat every event as an
    open session ``[ts, ts+300s)`` and report, per event_type, the PEAK
    number of concurrently open sessions and the first time it is
    reached — the load-planning / capacity question a streaming engine
    answers with an interval tree, expressed here as a range-partitioned
    max-prefix-sum (the same decomposition ``pack_token_shards`` uses
    for its ordered prefix sum, extended with a per-range local-max):

    1. each event emits two delta points (+1 at ts, -1 at ts+300s),
       bucketed by a CONTIGUOUS time range sized from the parquet
       footer (row count for the range COUNT, ts column stats for the
       span — no data read);
    2. one vectorized kernel per bucket: per (type, range) the delta
       sum S, local max prefix M, and first local-argmax time (points
       ordered (t, d) with -1 before +1: end-exclusive intervals);
    3. per type (groups of ~num_ranges partial rows, never data rows):
       peak = max over time-ordered ranges of (prefix-of-S before + M),
       first_peak_ts from the FIRST range attaining it.

    Integer deltas end to end; the only nontrivial oracle-parity point
    is tie order, pinned identically on both sides by (t, d)."""
    path = os.path.join(sf_dir, "events.parquet")
    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    ci = names.index("ts")
    ts_min = min(
        md.row_group(rg).column(ci).statistics.min
        for rg in range(md.num_row_groups)
    )
    ts_max = max(
        md.row_group(rg).column(ci).statistics.max
        for rg in range(md.num_row_groups)
    )
    import datetime as _dt

    _epoch = _dt.datetime(1970, 1, 1)
    _us = _dt.timedelta(microseconds=1)
    lo_us = (ts_min - _epoch) // _us
    hi_us = (ts_max - _epoch) // _us + SESSION_SECONDS * 1_000_000 + 1
    num_ranges = max(64, -(-md.num_rows // 500_000))
    range_us = -(-(hi_us - lo_us) // num_ranges)

    ds = _read(sf_dir, "events", ["ts", "event_type"], rows_per_block=20_000)

    _PART = pa.schema([
        ("event_type", pa.string()), ("rb", pa.int64()), ("s", pa.int64()),
        ("m", pa.int64()), ("tmax", pa.int64()),
    ])

    def delta_points(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = t.column("event_type")
        tt = np.concatenate([ts, ts + SESSION_SECONDS * 1_000_000])
        dd = np.concatenate(
            [np.ones(len(ts), np.int64), -np.ones(len(ts), np.int64)]
        )
        out = pa.table({
            "event_type": pa.concat_arrays(
                [et.combine_chunks(), et.combine_chunks()]
            ),
            "t": pa.array(tt), "d": pa.array(dd),
            "rb": pa.array((tt - lo_us) // range_us),
        })
        return out.append_column(
            "_bucket", _hash_bucket(out.column("rb"), num_ranges)
        )

    def range_partials(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .sort(["event_type", "rb", "t", "d"])
            .with_columns(c=pl.col("d").cum_sum().over(["event_type", "rb"]))
        )
        out = (
            df.group_by(["event_type", "rb"], maintain_order=True)
            .agg(
                s=pl.col("d").sum().cast(pl.Int64),
                m=pl.col("c").max().cast(pl.Int64),
                tmax=pl.col("t")
                .filter(pl.col("c") == pl.col("c").max())
                .min().cast(pl.Int64),
            )
        )
        return out.to_arrow().cast(_PART)

    def fold_type(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort("rb")
        s = df.get_column("s").to_numpy()
        m = df.get_column("m").to_numpy()
        tmax = df.get_column("tmax").to_numpy()
        before = np.cumsum(s) - s
        tot = before + m
        peak = int(tot.max())
        first = int(np.argmax(tot == peak))
        return pa.table({
            "event_type": [group.column("event_type")[0].as_py()],
            "peak": pa.array([peak], pa.int64()),
            "first_peak_ts": pa.array(
                [int(tmax[first])], pa.timestamp("us")
            ),
        })

    pts = ds.map_batches(delta_points, batch_format="pyarrow",
                         zero_copy_batch=True)
    partials = pts.groupby("_bucket").map_groups(
        lambda g: range_partials(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    return partials.groupby("event_type").map_groups(
        fold_type, batch_format="pyarrow"
    )


def q_order_fulfillment_lag(sf_dir: str):
    """Fulfillment-lag profile per order priority: how many days after
    the order date each lineitem shipped (floored per item — NOT
    floor-of-sum, so the lag is computed on the JOINED row, never from
    a pre-aggregated shipdate sum). One orderkey co-group exchange
    carrying (orderkey, ship_us) pairs — the exact lower bound for a
    per-item date difference — then integer per-priority partials
    (n, Σdays, max) per bucket and a tiny final fold; avg is one IEEE
    division + half-up 4dp rounding, identical in the SQL."""
    num_buckets = _buckets_for(sf_dir, "lineitem")
    DAY_US = 86_400_000_000

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "ship_us": pa.nulls(batch.num_rows, pa.int64()),
            "order_us": batch.column("o_orderdate").cast(pa.int64()),
            "o_orderpriority": batch.column("o_orderpriority"),
            "_bucket": _hash_bucket(batch.column("o_orderkey"), num_buckets),
        })

    def tag_lineitems(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch.column("l_orderkey").cast(pa.int64()),
            "ship_us": batch.column("l_shipdate").cast(pa.int64()),
            "order_us": pa.nulls(batch.num_rows, pa.int64()),
            "o_orderpriority": pa.nulls(batch.num_rows, pa.string()),
            "_bucket": _hash_bucket(batch.column("l_orderkey"), num_buckets),
        })

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"],
        rows_per_block=20_000,
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    lineitem = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate"], rows_per_block=20_000
    ).map_batches(tag_lineitems, batch_format="pyarrow", zero_copy_batch=True)

    _PART = pa.schema([
        ("o_orderpriority", pa.string()), ("n", pa.int64()),
        ("sum_days", pa.int64()), ("max_days", pa.int64()),
    ])

    def lag_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ords = df.filter(pl.col("ship_us").is_null()).select(
            ["orderkey", "order_us", "o_orderpriority"]
        )
        out = (
            df.filter(pl.col("ship_us").is_not_null())
            .select(["orderkey", "ship_us"])
            .join(ords, on="orderkey", how="inner")
            .with_columns(
                days=((pl.col("ship_us") - pl.col("order_us"))
                      // DAY_US).cast(pl.Int64)
            )
            .group_by("o_orderpriority")
            .agg(
                n=pl.len().cast(pl.Int64),
                sum_days=pl.col("days").sum().cast(pl.Int64),
                max_days=pl.col("days").max().cast(pl.Int64),
            )
        )
        return out.to_arrow().cast(_PART)

    partials = orders.union(lineitem).groupby("_bucket").map_groups(
        lambda g: lag_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    blocks = [b for b in arrow_blocks(partials) if b.num_rows]
    schema = pa.schema([
        ("o_orderpriority", pa.string()), ("n", pa.int64()),
        ("avg_lag_days", pa.float64()), ("max_lag_days", pa.int64()),
    ])
    if not blocks:
        return schema.empty_table()
    folded = (
        pl.from_arrow(pa.concat_tables(blocks))
        .group_by("o_orderpriority")
        .agg(pl.col("n").sum(), pl.col("sum_days").sum(),
             pl.col("max_days").max())
    ).to_arrow()
    avg = pc.divide(
        pc.cast(folded.column("sum_days"), pa.float64()),
        pc.cast(folded.column("n"), pa.float64()),
    )
    avg4 = pc.divide(
        pc.round(pc.multiply(avg, 10000.0), ndigits=0,
                 round_mode="half_towards_infinity"),
        10000.0,
    )
    return pa.table({
        "o_orderpriority": folded.column("o_orderpriority"),
        "n": folded.column("n"),
        "avg_lag_days": avg4,
        "max_lag_days": folded.column("max_days"),
    }).cast(schema)


def q_gini_by_type(sf_dir: str):
    """Exact GINI COEFFICIENT per group — the inequality profile of the
    value distribution (corpus audits run the same formula over token
    counts to quantify head-heaviness). Needs every row's GLOBAL rank
    within its group, a window no per-key bucketing can bound — so it
    reuses the ntile/percent_rank histogram-offset machinery: rows
    shuffle once by (group, value-bucket), each task derives exact
    global ranks from its bucket offset + a local sort, and emits ONE
    integer partial ``sum(rank * x)`` per (group, bucket).

    Exactness: values snap to the 1e-4 grid (x = round(v*10000) as
    int64); Gini is PERMUTATION-INVARIANT across rank ties (equal x
    contribute the same regardless of tie order), so no id tiebreak is
    needed on either side. G = (2A - (n+1)S) / (nS) with A = Σ rank·x
    folded in arbitrary-precision Python ints driver-side (partial
    rows = groups × occupied buckets, metadata-scale; per-task int64
    partials bound by n²·x_max/B — document: beyond ~1e18 switch the
    partial dtype to float or split buckets). One final IEEE division
    per group, identical on the SQL side."""
    B = 512
    ds = _read(sf_dir, "events", ["event_type", "value"],
               rows_per_block=20_000)

    def add_grid(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        return t.append_column(
            "x", pc.cast(pc.round(pc.multiply(t.column("value"), 10000.0)),
                         pa.int64())
        )

    g = ds.map_batches(add_grid, batch_format="pyarrow", zero_copy_batch=True)
    stats = g.groupby("event_type").aggregate(
        Count(), Min("value", alias_name="_mn"),
        Max("value", alias_name="_mx"), Sum("x", alias_name="_s"),
    ).take_all()
    info = {
        r["event_type"]: (int(r["count()"]), r["_mn"], r["_mx"], int(r["_s"]))
        for r in stats
    }

    def bucket_of(vals: np.ndarray, lo: float, hi: float) -> np.ndarray:
        if hi <= lo:
            return np.zeros(len(vals), dtype=np.int64)
        idx = np.floor((vals - lo) / (hi - lo) * B).astype(np.int64)
        return np.clip(idx, 0, B - 1)

    info_ref = ray.put(info)
    hist = {t: np.zeros(B, dtype=np.int64) for t in info}

    def hist_batch(t: pa.Table) -> pa.Table:
        inf = ray.get(info_ref)
        keys = t.column("event_type").combine_chunks()
        vals = t.column("value").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        out_g, out_h = [], []
        for code in range(len(enc.dictionary)):
            gname = enc.dictionary[code].as_py()
            _, lo, hi, _ = inf[gname]
            out_g.append(gname)
            out_h.append(
                np.bincount(bucket_of(vals[codes == code], lo, hi),
                            minlength=B).astype(np.int64).tolist()
            )
        return pa.table({"g": pa.array(out_g, keys.type),
                         "h": pa.array(out_h, pa.list_(pa.int64()))})

    for b in g.map_batches(
        hist_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for gname, h in zip(b.column("g").to_pylist(),
                            b.column("h").to_pylist()):
            hist[gname] += np.asarray(h, dtype=np.int64)

    offsets = {t: np.concatenate(([0], np.cumsum(hist[t])[:-1]))
               for t in hist}
    ctx_ref = ray.put({"info": info, "offsets": offsets})

    def route(t: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        keys = t.column("event_type").combine_chunks()
        vals = t.column("value").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vb = np.zeros(t.num_rows, dtype=np.int64)
        for code in range(len(enc.dictionary)):
            gname = enc.dictionary[code].as_py()
            _, lo, hi, _ = ctx["info"][gname]
            mask = codes == code
            vb[mask] = bucket_of(vals[mask], lo, hi)
        return pa.table({"g": keys, "v": t.column("value"),
                         "x": t.column("x"), "_vb": pa.array(vb)})

    def partial_bucket(grp: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        gname = grp.column("g")[0].as_py()
        base = int(ctx["offsets"][gname][grp.column("_vb")[0].as_py()])
        v = grp.column("v").to_numpy(zero_copy_only=False)
        x = grp.column("x").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=np.int64)
        ranks[order] = base + 1 + np.arange(len(v), dtype=np.int64)
        return pa.table({
            "event_type": pa.array([gname]),
            "a": pa.array([int(np.sum(ranks * x))], pa.int64()),
        })

    partials = g.map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["g", "_vb"]).map_groups(partial_bucket, batch_format="pyarrow")

    acc: dict[str, int] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for gname, a in zip(b.column("event_type").to_pylist(),
                            b.column("a").to_pylist()):
            acc[gname] = acc.get(gname, 0) + int(a)

    rows = []
    for gname in sorted(info):
        n, _, _, s = info[gname]
        a = acc.get(gname, 0)
        gini = (
            None if s == 0
            else float(2 * a - (n + 1) * s) / (float(n) * float(s))
        )
        rows.append({"event_type": gname, "n": n, "gini": gini})
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows]),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "gini": pa.array([r["gini"] for r in rows], pa.float64()),
    })


COOC_MAX_TERMS = 32  # per-doc distinct-term cap (lexicographic first)


def q_term_cooccurrence_topk(sf_dir: str):
    """Market-basket co-occurrence mining: the 20 unordered term pairs
    appearing together in the most documents. Pair fan-out is the
    classic scale hazard (k distinct terms -> k(k-1)/2 pairs), so each
    doc contributes only its ``COOC_MAX_TERMS`` lexicographically-first
    distinct terms — a DETERMINISTIC cap both sides apply identically
    (a web-scale run would raise it or switch to an A-Priori frequent-
    item prefilter; the cap is the documented knob). One exchange:
    per-batch pair-count partials hash-bucket by pair, complete pair
    groups per bucket give exact doc counts, per-bucket keep-20
    collapses the tail to <= 20 x buckets rows before the final tiny
    sort."""
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    _PAIR = pa.schema([
        ("ta", pa.string()), ("tb", pa.string()), ("n_docs", pa.int64()),
        ("ph", pa.int64()),
    ])
    _OUT = pa.schema([
        ("ta", pa.string()), ("tb", pa.string()), ("n_docs", pa.int64()),
    ])

    def pair_partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        cap = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("term"),
            )
            .explode("term").drop_nulls()
            .unique(subset=["doc_id", "term"])
            .sort(["doc_id", "term"])
            .with_columns(rn=pl.int_range(pl.len()).over("doc_id"))
            .filter(pl.col("rn") < COOC_MAX_TERMS)
            .select(["doc_id", "term"])
        )
        pairs = (
            cap.join(cap, on="doc_id", suffix="_b")
            .filter(pl.col("term") < pl.col("term_b"))
            .rename({"term": "ta", "term_b": "tb"})
            # docs are whole rows: per-block pair counts are partials
            .group_by(["ta", "tb"]).agg(n_docs=pl.len().cast(pl.Int64))
            .with_columns(
                ph=pl.concat_str([pl.col("ta"), pl.col("tb")], separator="|")
                .hash(seed=0).reinterpret(signed=True)
            )
        )
        out = pairs.to_arrow().cast(_PAIR)
        return out.append_column(
            "_bucket", _hash_bucket(out.column("ph"), num_buckets)
        )

    def top20_bucket(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by(["ta", "tb"]).agg(pl.col("n_docs").sum())
            .sort(["n_docs", "ta", "tb"], descending=[True, False, False])
            .head(20)
        )
        return out.to_arrow().cast(_OUT)

    partials = ds.map_batches(pair_partials, batch_format="pyarrow",
                              zero_copy_batch=True)
    candidates = partials.groupby("_bucket").map_groups(
        lambda g: top20_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    return candidates.sort(
        ["n_docs", "ta", "tb"], descending=[True, False, False]
    ).limit(20)


def q_events_per_user_histogram(sf_dir: str):
    """Activity-distribution profile (the power-law sanity check every
    event pipeline runs): how many users produced exactly N events.
    TWO chained aggregations, both combiner-shaped: per-batch partial
    counts collapse each block to one row per user, user-hash buckets
    hold complete user groups so the in-bucket total IS the user's
    count AND the bucket's local histogram is exact — the second
    aggregate sees (distinct-count-values x buckets) rows, never
    users."""
    ds = _read(sf_dir, "events", ["user_id"], rows_per_block=20_000)
    num_buckets = _buckets_for(sf_dir)

    def partial_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([("user_id", "count")])
        g = g.rename_columns(["user_id", "n"])
        return pa.table({
            "user_id": g.column("user_id"),
            "n": g.column("n").cast(pa.int64()),
            "_bucket": _hash_bucket(g.column("user_id"), num_buckets),
        })

    def hist_bucket(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by("user_id").agg(pl.col("n").sum())
            .group_by("n").agg(n_users=pl.len().cast(pl.Int64))
            .rename({"n": "n_events"})
        )
        return out.to_arrow().cast(pa.schema([
            ("n_events", pa.int64()), ("n_users", pa.int64()),
        ]))

    partials = ds.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("_bucket").map_groups(
        lambda g: hist_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    return partials.groupby("n_events").aggregate(
        Sum("n_users", alias_name="n_users")
    )


def q_top_terms_per_lang(sf_dir: str):
    """Grouped top-k over a two-level key: the 3 most frequent terms
    PER LANGUAGE (tie-break lexicographic) — the per-language
    vocabulary profile a corpus audit prints. Counting buckets by TERM
    hash (complete (lang, term) groups per bucket — exact counts, and
    immune to language skew: a 90%-English corpus spreads across all
    buckets), per-bucket keep-3-per-lang collapses the exchange to
    <= 3 x langs rows per bucket; the final per-lang fold sees
    candidate rows only."""
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["lang", "text"], rows_per_block=2_000)

    _CNT = pa.schema([
        ("lang", pa.string()), ("term", pa.string()), ("tf", pa.int64()),
        ("th", pa.int64()),
    ])
    _OUT = pa.schema([
        ("lang", pa.string()), ("term", pa.string()), ("tf", pa.int64()),
    ])

    def partial_counts(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ex = (
            df.select(
                pl.col("lang"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("term"),
            )
            .explode("term").drop_nulls()
            .group_by(["lang", "term"]).agg(tf=pl.len().cast(pl.Int64))
            .with_columns(
                th=pl.col("term").hash(seed=0).reinterpret(signed=True)
            )
        )
        out = ex.to_arrow().cast(_CNT)
        return out.append_column(
            "_bucket", _hash_bucket(out.column("th"), num_buckets)
        )

    def top3_bucket(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by(["lang", "term"]).agg(pl.col("tf").sum())
            .sort(["lang", "tf", "term"], descending=[False, True, False])
            .group_by("lang", maintain_order=True).head(3)
            .select(["lang", "term", "tf"])
        )
        return out.to_arrow().cast(_OUT)

    counts = ds.map_batches(partial_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
    candidates = counts.groupby("_bucket").map_groups(
        lambda g: top3_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )

    def top3_lang(group: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(group)
            .sort(["lang", "tf", "term"], descending=[False, True, False])
            .head(3)
        )
        return out.to_arrow().cast(_OUT)

    return candidates.groupby("lang").map_groups(
        top3_lang, batch_format="pyarrow"
    )


def q_corr_value_props_by_type(sf_dir: str):
    """Cross-column moment aggregates per group: Pearson correlation and
    sample covariance between ``value`` and ``length(props)`` per
    event_type, via the classic (n, sx, sy, sxx, syy, sxy) partials —
    each block collapses to one row per group before the shuffle, the
    final reduce is a deterministic driver fold over blocks x groups
    rows (same shape + rounding contract as ``value_moments_by_type``)."""
    ds = _read(sf_dir, "events", ["event_type", "value", "props"],
               rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).filter(
            pl.col("value").is_not_null() & pl.col("props").is_not_null()
        ).with_columns(
            y=pl.col("props").str.len_chars().cast(pl.Float64)
        )
        out = df.group_by("event_type").agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("value").sum().alias("sx"),
            pl.col("y").sum().alias("sy"),
            (pl.col("value") ** 2).sum().alias("sxx"),
            (pl.col("y") ** 2).sum().alias("syy"),
            (pl.col("value") * pl.col("y")).sum().alias("sxy"),
        )
        return out.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("n", pa.int64()),
            ("sx", pa.float64()), ("sy", pa.float64()),
            ("sxx", pa.float64()), ("syy", pa.float64()),
            ("sxy", pa.float64()),
        ]))

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    blocks = [
        b for b in parts.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    out_schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("corr_vp", pa.float64()), ("covar_vp", pa.float64()),
    ])
    if not blocks:
        return out_schema.empty_table()
    # deterministic fold order (see value_moments_by_type): distributed
    # float Sum folds in arrival order and can flip the 4th decimal
    df = (
        pl.from_arrow(pa.concat_tables(blocks))
        .sort(["event_type", "n", "sx"])
        .group_by("event_type", maintain_order=True)
        .agg(pl.col("n").sum(), pl.col("sx").sum(), pl.col("sy").sum(),
             pl.col("sxx").sum(), pl.col("syy").sum(), pl.col("sxy").sum())
        .sort("event_type")
    )
    n = df["n"].to_numpy().astype(np.float64)
    sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
    sxx, syy, sxy = df["sxx"].to_numpy(), df["syy"].to_numpy(), df["sxy"].to_numpy()
    cxy = sxy - sx * sy / n                     # n * covar_pop
    vx = np.maximum(sxx - sx * sx / n, 0.0)
    vy = np.maximum(syy - sy * sy / n, 0.0)
    denom = np.sqrt(vx * vy)
    corr = [
        None if cnt < 2 or d == 0.0 else _round4_half_away(c / d)
        for cnt, c, d in zip(n, cxy, denom)
    ]
    covar = [
        None if cnt < 2 else _round4_half_away(c / (cnt - 1.0))
        for cnt, c in zip(n, cxy)
    ]
    return pa.table({
        "event_type": pa.array(df["event_type"].to_list(), pa.string()),
        "n": pa.array(df["n"].to_list(), pa.int64()),
        "corr_vp": pa.array(corr, pa.float64()),
        "covar_vp": pa.array(covar, pa.float64()),
    })


def q_lang_entropy_by_source(sf_dir: str):
    """Shannon entropy (nats) of the language mix per source — the
    diversity metric a crawl-curation dashboard keys on. Scale shape:
    a per-block (source, lang) count combiner collapses the corpus to
    at most |sources| x |langs| rows per block before the shuffle; the
    entropy itself is one vectorized polars/numpy pass over the tiny
    global count table."""
    ds = _read(sf_dir, "documents", ["source", "lang"], rows_per_block=20_000)

    def local_counts(t: pa.Table) -> pa.Table:
        out = pl.from_arrow(t).group_by(["source", "lang"]).agg(
            pl.len().cast(pl.Int64).alias("n")
        )
        return out.to_arrow().cast(pa.schema([
            ("source", pa.string()), ("lang", pa.string()), ("n", pa.int64()),
        ]))

    counts = ds.map_batches(
        local_counts, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["source", "lang"]).aggregate(Sum("n", alias_name="n"))

    def entropy(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["source", "lang"])
        tot = df.group_by("source", maintain_order=True).agg(
            pl.col("n").sum().alias("tot"),
            pl.len().cast(pl.Int64).alias("n_langs"),
        )
        j = df.join(tot, on="source", how="inner")
        p = j["n"].to_numpy() / j["tot"].to_numpy()
        j = j.with_columns(pl.Series("plp", p * np.log(p)))
        out = (
            j.group_by("source", maintain_order=True)
            .agg(pl.col("plp").sum(), pl.col("n_langs").first())
            .sort("source")
        )
        return pa.table({
            "source": pa.array(out["source"].to_list(), pa.string()),
            "n_langs": pa.array(out["n_langs"].to_list(), pa.int64()),
            "lang_entropy": pa.array(
                [_round4_half_away(x) for x in (-out["plp"].to_numpy())],
                pa.float64()),
        })

    # the global count table is |sources| x |langs| — one vectorized call
    return counts.map_batches(
        entropy, batch_format="pyarrow", batch_size=None,
    )


def q_retention_cohorts(sf_dir: str):
    """Cohort retention analysis: users bucketed by the Monday-start
    week of their FIRST signup event; for each (cohort week, week
    offset >= 0) the number of cohort users active in that week. Scale
    shape: a per-block combiner collapses raw events to distinct
    (user, week) pairs carrying the block-local min signup ts, so the
    shuffle moves user-week pairs, never events; each user's rows land
    in one bucket (complete groups), where one polars kernel derives
    the cohort and deduped offsets; the final count is a tiny
    (cohort, offset) groupby over pre-deduped pairs."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"],
               rows_per_block=20_000)

    _PAIR = pa.schema([
        ("user_id", pa.int64()), ("week", pa.timestamp("us")),
        ("sig", pa.timestamp("us")),
    ])

    def local_pairs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            week=pl.col("ts").dt.truncate("1w")
        )
        sig = (
            df.filter(pl.col("event_type") == "signup")
            .group_by("user_id").agg(pl.col("ts").min().alias("sig"))
        )
        pairs = (
            df.select(["user_id", "week"]).unique()
            .join(sig, on="user_id", how="left")
        )
        return pairs.to_arrow().cast(_PAIR)

    pairs = ds.map_batches(
        local_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    _WEEK_US = 7 * 86_400 * 1_000_000

    def cohort_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        cohort = (
            df.filter(pl.col("sig").is_not_null())
            .group_by("user_id")
            .agg(pl.col("sig").min().dt.truncate("1w").alias("cohort_week"))
        )
        j = (
            df.select(["user_id", "week"]).unique()
            .join(cohort, on="user_id", how="inner")
            .filter(pl.col("week") >= pl.col("cohort_week"))
            .with_columns(
                week_offset=(
                    (pl.col("week").cast(pl.Int64)
                     - pl.col("cohort_week").cast(pl.Int64))
                    // _WEEK_US
                )
            )
        )
        out = j.group_by(["cohort_week", "week_offset"]).agg(
            pl.len().cast(pl.Int64).alias("n_users")
        )
        return out.to_arrow().cast(pa.schema([
            ("cohort_week", pa.timestamp("us")),
            ("week_offset", pa.int64()), ("n_users", pa.int64()),
        ]))

    per_bucket = _bucketed_groups(
        pairs, "user_id", cohort_bucket, num_buckets=_buckets_for(sf_dir)
    )
    return per_bucket.groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


#: Count floor for the LM's unigram AND bigram tables: keeps the
#: broadcast vocabulary to the Zipf head (bounded regardless of corpus
#: size) and is SQL-replicable (HAVING + coalesce-to-0 on the join).
_LM_MIN_COUNT = 5


class _LmScorer:
    """Actor-pool doc scorer: the floored corpus LM tables are fetched
    from the object store and converted to polars join tables ONCE per
    actor (``__init__``), not per batch."""

    def __init__(self, lm_ref):
        uni, big, self._v = ray.get(lm_ref)
        self._uni = pl.DataFrame(
            {"w1": uni.column("tk").to_pylist(),
             "un": uni.column("n").to_pylist()},
            schema={"w1": pl.String, "un": pl.Int64},
        )
        self._big = pl.DataFrame(
            {"bigram": big.column("bigram").to_pylist(),
             "bn": big.column("n").to_pylist()},
            schema={"bigram": pl.String, "bn": pl.Int64},
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_row_index("rid")
        ex = (
            df.select(
                pl.col("rid"), pl.col("doc_id"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("tk"),
            )
            .explode("tk").drop_nulls()
        )
        ex = ex.with_columns(
            w2=pl.col("tk").shift(-1), rid2=pl.col("rid").shift(-1),
        ).filter(pl.col("rid") == pl.col("rid2")).rename({"tk": "w1"})
        ex = ex.with_columns(
            bigram=pl.col("w1") + " " + pl.col("w2")
        ).join(self._big, on="bigram", how="left").join(
            self._uni, on="w1", how="left"
        ).with_columns(
            pl.col("bn").fill_null(0), pl.col("un").fill_null(0),
        )
        lp = np.log(
            (ex["bn"].to_numpy() + 1.0) / (ex["un"].to_numpy() + float(self._v))
        )
        out = (
            ex.with_columns(pl.Series("lp", lp))
            .group_by("doc_id")
            .agg(pl.len().cast(pl.Int64).alias("n_bigrams"),
                 pl.col("lp").mean().alias("m"))
            .sort("doc_id")
        )
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_list(), pa.int64()),
            "n_bigrams": pa.array(out["n_bigrams"].to_list(), pa.int64()),
            "lm_score": pa.array(
                [_round4_half_away(x) for x in out["m"].to_list()],
                pa.float64()),
        })


def q_doc_lm_score(sf_dir: str):
    """CCNet-style LM quality scoring: train a Laplace-smoothed bigram
    LM on the corpus itself (counts >= floor on BOTH tables, so the
    broadcast vocabulary is the bounded Zipf head), then score every
    document by its mean bigram log-probability
    ``ln((c(bigram)+1) / (c(w1)+V))`` — the perplexity-proxy filter a
    training-data pipeline gates on. Two passes over the corpus: a
    distributed count build (local combiner -> small groupby), one
    ``ray.put`` broadcast, then a streaming actor-pool scoring pass
    (LM tables converted to join tables once per actor). Docs with no
    bigram are excluded (no LM evidence), matching the SQL oracle."""
    # footer-sized blocks: the kernels are vectorized, so Ray's default
    # ~2x-CPU read split pays ~30x its compute in per-task overhead
    ds = _read(sf_dir, "documents", ["doc_id", "text"],
               rows_per_block=2_000)

    # ONE tokenizing pass counts unigrams AND bigrams together (a
    # bigram key contains a space, a [a-z0-9]+ unigram never does, so
    # the union splits losslessly after the one global count) — the
    # corpus text is scanned twice total (count + score), not thrice.
    def local_grams(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_row_index("rid")
        ex = (
            df.select(
                pl.col("rid"),
                pl.col("text").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("tk"),
            )
            .explode("tk").drop_nulls()
        )
        ex = ex.with_columns(
            bigram=pl.col("tk") + " " + pl.col("tk").shift(-1),
            rid2=pl.col("rid").shift(-1),
        )
        uni = ex.group_by("tk").agg(
            pl.len().cast(pl.Int64).alias("n")
        ).rename({"tk": "gram"})
        big = (
            ex.filter(pl.col("rid") == pl.col("rid2"))
            .group_by("bigram").agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"bigram": "gram"})
        )
        return pl.concat([uni, big]).to_arrow().cast(
            pa.schema([("gram", pa.string()), ("n", pa.int64())])
        )

    def _floor(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n"), _LM_MIN_COUNT))

    grams = (
        ds.map_batches(local_grams, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("gram").aggregate(Sum("n", alias_name="n"))
        .map_batches(_floor, batch_format="pyarrow", zero_copy_batch=True)
    )
    gram_t = pa.concat_tables(
        list(grams.iter_batches(batch_format="pyarrow"))
    )
    is_big = pc.match_substring(gram_t.column("gram"), " ")
    big_t = gram_t.filter(is_big).rename_columns(["bigram", "n"])
    uni_t = gram_t.filter(pc.invert(is_big)).rename_columns(["tk", "n"])
    lm_ref = ray.put((uni_t, big_t, uni_t.num_rows))
    return ds.map_batches(
        _LmScorer, fn_constructor_args=(lm_ref,),
        concurrency=_pool_for(sf_dir, "documents", rows_per_actor=2_000),
        batch_format="pyarrow", zero_copy_batch=True,
    )


#: Fixed x-axis origin for the regression query: a CONSTANT shift keeps
#: the raw-moment partials combinable across blocks while dropping ~9
#: digits of catastrophic cancellation vs raw epoch seconds.
_REGR_EPOCH = datetime(2024, 1, 1)


def q_regr_value_vs_time_by_type(sf_dir: str):
    """Grouped least-squares trend line: per event_type the
    regr_slope / regr_intercept of ``value`` against time in DAYS since
    2024-01-01. Same scale shape as the corr/moments family: per-block
    (n, sx, sy, sxx, sxy) partials (one row per group per block),
    deterministic driver fold, scale-4 rounding both sides."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"],
               rows_per_block=20_000)
    origin_us = int(
        (_REGR_EPOCH - datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).filter(pl.col("value").is_not_null())
        df = df.with_columns(
            x=(pl.col("ts").cast(pl.Int64) - origin_us) / 1_000_000.0
              / 86_400.0
        )
        out = df.group_by("event_type").agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("x").sum().alias("sx"),
            pl.col("value").sum().alias("sy"),
            (pl.col("x") ** 2).sum().alias("sxx"),
            (pl.col("x") * pl.col("value")).sum().alias("sxy"),
        )
        return out.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("n", pa.int64()),
            ("sx", pa.float64()), ("sy", pa.float64()),
            ("sxx", pa.float64()), ("sxy", pa.float64()),
        ]))

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    blocks = [
        b for b in parts.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    out_schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("slope_per_day", pa.float64()), ("intercept", pa.float64()),
    ])
    if not blocks:
        return out_schema.empty_table()
    df = (
        pl.from_arrow(pa.concat_tables(blocks))
        .sort(["event_type", "n", "sx"])
        .group_by("event_type", maintain_order=True)
        .agg(pl.col("n").sum(), pl.col("sx").sum(), pl.col("sy").sum(),
             pl.col("sxx").sum(), pl.col("sxy").sum())
        .sort("event_type")
    )
    n = df["n"].to_numpy().astype(np.float64)
    sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
    sxx, sxy = df["sxx"].to_numpy(), df["sxy"].to_numpy()
    vx = sxx - sx * sx / n
    cxy = sxy - sx * sy / n
    slope = [
        None if cnt < 2 or v == 0.0 else _round4_half_away(c / v)
        for cnt, c, v in zip(n, cxy, vx)
    ]
    intercept = [
        None if s is None else
        _round4_half_away(yy / cnt - (c / v) * (xx / cnt))
        for s, cnt, c, v, xx, yy in zip(slope, n, cxy, vx, sx, sy)
    ]
    return pa.table({
        "event_type": pa.array(df["event_type"].to_list(), pa.string()),
        "n": pa.array(df["n"].to_list(), pa.int64()),
        "slope_per_day": pa.array(slope, pa.float64()),
        "intercept": pa.array(intercept, pa.float64()),
    })


#: Value gate for the set-op queries: without it every user holds every
#: event type at any tested scale and INTERSECT/EXCEPT are degenerate
#: (all users / empty). 150 keeps both ops selective at every tier.
_SETOP_MIN_VALUE = 150.0


def _users_by_type_setop(sf_dir: str, type_a: str, type_b: str,
                         require_b: bool) -> ray.data.Dataset:
    """Shared executor for the INTERSECT / EXCEPT set ops on user-id
    streams (membership = "has a ``type`` event with value > gate"):
    per-block distinct (user, flag) pairs (the combiner — raw events
    never shuffle), then one bucketed vectorized pass per ~N users
    testing which flags are present for each user. Both predicates are
    pushed into the parquet read."""
    ev_path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(
        ev_path,
        columns=["user_id", "event_type"],
        filter=(
            pc.field("event_type").isin([type_a, type_b])
            & (pc.field("value") > _SETOP_MIN_VALUE)
        ),
        override_num_blocks=_nblocks(ev_path, 20_000),
    )

    def local_pairs(t: pa.Table) -> pa.Table:
        out = pl.from_arrow(t).unique()
        return out.to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("event_type", pa.string()),
        ]))

    pairs = ds.map_batches(
        local_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def setop_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        flags = df.group_by("user_id").agg(
            (pl.col("event_type") == type_a).any().alias("has_a"),
            (pl.col("event_type") == type_b).any().alias("has_b"),
        )
        keep = flags.filter(
            pl.col("has_a") & (pl.col("has_b") == require_b)
        ).select("user_id")
        return keep.to_arrow().cast(pa.schema([("user_id", pa.int64())]))

    out = _bucketed_groups(
        pairs, "user_id", setop_bucket, num_buckets=_buckets_for(sf_dir)
    ).materialize()
    if out.count() == 0:
        # a fully-empty result drops its block schema on conversion —
        # pin the contract schema explicitly
        return pa.schema([("user_id", pa.int64())]).empty_table()
    return out


def q_users_signup_and_purchase(sf_dir: str):
    """Set op INTERSECT (SURVEY §2.8 beyond dedup): users present in
    BOTH the signup and the purchase event streams."""
    return _users_by_type_setop(sf_dir, "signup", "purchase", require_b=True)


def q_users_view_no_purchase(sf_dir: str):
    """Set op EXCEPT: users who viewed but never purchased — the
    anti-membership sibling of the INTERSECT op on the same executor."""
    return _users_by_type_setop(sf_dir, "view", "purchase", require_b=False)


def q_embedding_norm_stats_by_label(sf_dir: str):
    """Vector-column aggregate: per label the count, mean and max L2
    norm of the embeddings — the profile stats an embedding-quality
    gate keys on. Per-batch (n, sum_norm, max_norm) partials per label
    (one numpy pass over the zero-copy matrix), deterministic driver
    fold; scale-4 rounding bridges numpy's pairwise summation vs
    DuckDB's left-fold list_sum."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"],
               rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        from ..stages.ann import _as_matrix

        vecs = _as_matrix(t.column("embedding")).astype(np.float64)
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        df = pl.DataFrame({
            "label": pl.Series(
                t.column("label").to_numpy(zero_copy_only=False)
            ).cast(pl.Int32),
            "norm": norms,
        })
        out = df.group_by("label").agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("norm").sum().alias("s"),
            pl.col("norm").max().alias("mx"),
        )
        return out.to_arrow().cast(pa.schema([
            ("label", pa.int32()), ("n", pa.int64()),
            ("s", pa.float64()), ("mx", pa.float64()),
        ]))

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    blocks = [
        b for b in parts.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    out_schema = pa.schema([
        ("label", pa.int32()), ("n", pa.int64()),
        ("mean_norm", pa.float64()), ("max_norm", pa.float64()),
    ])
    if not blocks:
        return out_schema.empty_table()
    df = (
        pl.from_arrow(pa.concat_tables(blocks))
        .sort(["label", "n", "s"])
        .group_by("label", maintain_order=True)
        .agg(pl.col("n").sum(), pl.col("s").sum(), pl.col("mx").max())
        .sort("label")
    )
    return pa.table({
        "label": pa.array(df["label"].to_list(), pa.int32()),
        "n": pa.array(df["n"].to_list(), pa.int64()),
        "mean_norm": pa.array(
            [_round4_half_away(s / n) for s, n in zip(df["s"], df["n"])],
            pa.float64()),
        "max_norm": pa.array(
            [_round4_half_away(x) for x in df["mx"]], pa.float64()),
    })


def q_change_feed_op_counts(sf_dir: str):
    """Feed observability composition: insert/update/delete counts of
    the flagship v1->v2 change feed — the per-commit metric a feed
    consumer alerts on. Rides the full derived-WAL ingest + no-shuffle
    partition-pairwise diff, then a per-batch count combiner; the
    groupby sees blocks x 3 rows."""
    feed = q_cdc_change_feed(sf_dir)

    def local_counts(t: pa.Table) -> pa.Table:
        out = pl.from_arrow(t.select(["change_op"])).group_by(
            "change_op"
        ).agg(pl.len().cast(pl.Int64).alias("n"))
        return out.to_arrow().cast(pa.schema([
            ("change_op", pa.string()), ("n", pa.int64()),
        ]))

    return feed.map_batches(
        local_counts, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("change_op").aggregate(Sum("n", alias_name="n"))


def q_user_journeys(sf_dir: str):
    """ORDERED STRING_AGG (user-path analysis): each user's first-8-step
    event-type path as a '>'-joined string, plus their total step
    count. The prefix cap (8) is the scale bound — journey strings stay
    O(1) per user at any event volume, instead of an unbounded concat
    of the whole stream. One vectorized polars kernel per bucket of
    complete users; strings and counts are exact, so the hash parity
    with the SQL oracle is unconditional."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"],
               rows_per_block=20_000)

    def journey_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        df = df.with_columns(
            rn=pl.int_range(pl.len()).over("user_id") + 1
        )
        pre = (
            df.filter(pl.col("rn") <= 8)
            .group_by("user_id")
            .agg(pl.col("event_type").str.join(">").alias("journey_prefix"))
        )
        cnt = df.group_by("user_id").agg(
            pl.len().cast(pl.Int64).alias("n_steps")
        )
        out = pre.join(cnt, on="user_id", how="inner")
        return out.to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("journey_prefix", pa.string()),
            ("n_steps", pa.int64()),
        ]))

    return _bucketed_groups(
        ds, "user_id", journey_bucket, num_buckets=_buckets_for(sf_dir)
    )


def q_hourly_signup_purchase(sf_dir: str):
    """FULL OUTER JOIN of two grouped aggregates (signup vs purchase
    counts per hour, zero-filled): the funnel-health dashboard shape.
    Only funnel events leave storage (type filter pushed into the
    read); per-batch (hour, type) count partials collapse each block
    to <= hours x 2 rows before any move, and the final pivot folds
    blocks x partials driver-side — aggregate-sized (hour cardinality
    is the date range, never the event count)."""
    ev_path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(
        ev_path,
        columns=["ts", "event_type"],
        filter=pc.field("event_type").isin(["signup", "purchase"]),
        override_num_blocks=_nblocks(ev_path, 20_000),
    )

    def partial(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .with_columns(hour=pl.col("ts").dt.truncate("1h"))
            .group_by("hour", "event_type")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        return out.to_arrow().cast(pa.schema([
            ("hour", pa.timestamp("us")), ("event_type", pa.string()),
            ("n", pa.int64()),
        ]))

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    blocks = [b for b in arrow_blocks(parts) if b.num_rows]
    schema = pa.schema([
        ("hour", pa.timestamp("us")), ("n_signups", pa.int64()),
        ("n_purchases", pa.int64()),
    ])
    if not blocks:
        return schema.empty_table()
    wide = (
        pl.from_arrow(pa.concat_tables(blocks))
        .group_by("hour", "event_type").agg(pl.col("n").sum())
        .pivot(on="event_type", index="hour", values="n")
        .rename({"signup": "n_signups", "purchase": "n_purchases"},
                strict=False)
    )
    for col in ("n_signups", "n_purchases"):
        if col not in wide.columns:
            wide = wide.with_columns(pl.lit(0, pl.Int64).alias(col))
    wide = wide.with_columns(
        pl.col("n_signups").fill_null(0), pl.col("n_purchases").fill_null(0)
    )
    return wide.select(["hour", "n_signups", "n_purchases"]).to_arrow().cast(
        schema
    )


def q_revenue_share_by_nation(sf_dir: str):
    """PERCENT-OF-TOTAL window over the 3-way-join aggregate: each
    nation's share of global revenue. Rides the full revenue_by_nation
    pipeline (co-grouped fact join, broadcast dims), then snaps the
    rounded revenue to INTEGER cents so the total is an
    order-independent bigint sum — the share division is one IEEE op
    on exact integers, hash-stable against any SQL summation order."""
    tab = q_revenue_by_nation(sf_dir)  # 25 aggregate rows, revenue @2dp
    cents = pc.round(pc.multiply(tab.column("revenue"), 100.0)).cast(pa.int64())
    total = float(pc.sum(cents).as_py())
    share = pc.divide(
        pc.round(
            pc.multiply(pc.divide(cents.cast(pa.float64()), total), 1e6),
            ndigits=0, round_mode="half_towards_infinity",
        ),
        1e6,
    )
    return pa.table({
        "n_name": tab.column("n_name"),
        "revenue": tab.column("revenue"),
        "revenue_share": share,
    })


def q_region_top_nations(sf_dir: str):
    """DENSE_RANK top-k with ties (top-2 nations per region by customer
    count): the grouped-ranking shape where ties must all surface —
    row_number would drop one. Per-batch nationkey count partials
    collapse blocks before any move; the fold + rank runs over the
    25-row nation aggregate with the dim names attached driver-side
    (dims are bounded; the fact table never leaves its blocks)."""
    ds = _read(sf_dir, "customer", ["c_nationkey"], rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by("c_nationkey").aggregate([([], "count_all")])
            .rename_columns(["c_nationkey", "n"])
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    blocks = [b for b in arrow_blocks(parts) if b.num_rows]
    schema = pa.schema([
        ("r_name", pa.string()), ("n_name", pa.string()),
        ("n_customers", pa.int64()), ("rnk", pa.int64()),
    ])
    if not blocks:
        return schema.empty_table()
    counts = (
        pl.from_arrow(pa.concat_tables(blocks))
        .group_by("c_nationkey").agg(pl.col("n").sum().alias("n_customers"))
    )
    nation = pl.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pl.read_parquet(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    out = (
        counts.join(nation, left_on="c_nationkey", right_on="n_nationkey")
        .join(region, left_on="n_regionkey", right_on="r_regionkey")
        .with_columns(
            rnk=pl.col("n_customers").rank("dense", descending=True)
            .over("r_name").cast(pl.Int64)
        )
        .filter(pl.col("rnk") <= 2)
        .select(["r_name", "n_name", "n_customers", "rnk"])
    )
    return out.to_arrow().cast(schema)


def q_minmax_scale_events(sf_dir: str):
    """MIN-MAX FEATURE SCALING per group (the ML-prep normalizer):
    value rescaled to [0,1] within its event_type. Two passes — exact
    per-type min/max partials (order-independent, unlike a mean), then
    a broadcast-stats vectorized rescale per batch. Every arithmetic
    step ((v-mn)/(mx-mn)*1e4, half-away round) is the same IEEE op
    sequence the SQL window computes, so the 1M-row output is
    hash-exact, not epsilon-close."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"],
               rows_per_block=20_000)

    def mm_partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by("event_type")
            .aggregate([("value", "min"), ("value", "max")])
            .rename_columns(["event_type", "mn", "mx"])
        )

    parts = [
        b for b in arrow_blocks(ds.map_batches(
            mm_partial, batch_format="pyarrow", zero_copy_batch=True
        )) if b.num_rows
    ]
    stats = (
        pa.concat_tables(parts)
        .group_by("event_type")
        .aggregate([("mn", "min"), ("mx", "max")])
        .rename_columns(["event_type", "mn", "mx"])
    )
    types = stats.column("event_type").combine_chunks()
    mn_v = stats.column("mn").combine_chunks()
    mx_v = stats.column("mx").combine_chunks()

    def rescale(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=types)
        mn = pc.take(mn_v, idx)
        mx = pc.take(mx_v, idx)
        scaled = pc.divide(
            pc.round(
                pc.multiply(
                    pc.divide(pc.subtract(t.column("value"), mn),
                              pc.subtract(mx, mn)),
                    10000.0,
                ),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            10000.0,
        )
        return pa.table({
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "scaled": scaled,
        })

    return ds.map_batches(rescale, batch_format="pyarrow", zero_copy_batch=True)


def q_rolling_hour_value_per_user(sf_dir: str):
    """TIME-RANGE rolling window (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW) — the frame is a TIME span, not a row
    count, so the window widens and narrows with event density: the
    rate-limiter / anomaly-baseline shape ``moving_avg``'s ROWS frame
    can't express. Values snap to the 1e-4 grid as BIGINT first so the
    window sum is integer (order-independent); RANGE tie semantics
    (all ts-peers in frame) come free from the closed='both' time
    join. One vectorized rolling kernel per bucket of complete
    users."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"],
               rows_per_block=20_000)

    def roll_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        df = df.with_columns(
            _v=(pl.col("value") * 10000).round(0).cast(pl.Int64),
            _one=pl.lit(1, pl.Int64),
        )
        out = df.with_columns(
            _s=pl.col("_v").rolling_sum_by(
                "ts", window_size="1h", closed="both"
            ).over("user_id"),
            roll_n=pl.col("_one").rolling_sum_by(
                "ts", window_size="1h", closed="both"
            ).over("user_id"),
        ).select(["event_id", "user_id", "_s", "roll_n"]).to_arrow()
        # numpy division (see moving_avg: polars rewrites /const into
        # *reciprocal, off in the last ulp vs the SQL division)
        s = out.column("_s").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_id": out.column("event_id").cast(pa.int64()),
            "user_id": out.column("user_id").cast(pa.int64()),
            "roll_sum": pa.array(s / 10000.0, pa.float64()),
            "roll_n": out.column("roll_n").cast(pa.int64()),
        })

    return _bucketed_groups(
        ds, "user_id", roll_bucket, num_buckets=_buckets_for(sf_dir)
    )


def q_value_ntile_by_type(sf_dir: str):
    """GLOBAL NTILE(4) within each group, distributed — like
    percent_rank, a window op per-key bucketing cannot bound (a row's
    tile needs its whole group ordered). Same histogram-offset
    machinery: rows shuffle only by (group, value-bucket); each task
    turns its bucket's offset + a (value, event_id) lexsort into exact
    global ROW NUMBERS (the ORDER BY is determinized with event_id so
    both sides agree on tie placement — bare NTILE ties are
    engine-arbitrary), then SQL's uneven-bucket formula maps row
    number -> tile. Constant-value groups rank by the id histogram
    instead, same pass."""
    B = 512
    K = 4
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"],
               rows_per_block=20_000)
    stats = ds.groupby("event_type").aggregate(
        Count(),
        Min("value", alias_name="_mn"), Max("value", alias_name="_mx"),
        Min("event_id", alias_name="_imn"), Max("event_id", alias_name="_imx"),
    ).take_all()
    # per group: (n, lo, hi, use_id) — id-ranked when value is constant
    info = {}
    for r in stats:
        use_id = not (r["_mn"] < r["_mx"])
        lo, hi = (
            (float(r["_imn"]), float(r["_imx"])) if use_id
            else (r["_mn"], r["_mx"])
        )
        info[r["event_type"]] = (int(r["count()"]), lo, hi, use_id)

    def bucket_of(vals: np.ndarray, lo: float, hi: float) -> np.ndarray:
        if hi <= lo:  # single-row / fully-degenerate group
            return np.zeros(len(vals), dtype=np.int64)
        idx = np.floor((vals - lo) / (hi - lo) * B).astype(np.int64)
        return np.clip(idx, 0, B - 1)

    info_ref = ray.put(info)
    hist = {g: np.zeros(B, dtype=np.int64) for g in info}

    def hist_batch(t: pa.Table) -> pa.Table:
        inf = ray.get(info_ref)
        keys = t.column("event_type").combine_chunks()
        vals = t.column("value").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        out_g, out_h = [], []
        for code in range(len(enc.dictionary)):
            g = enc.dictionary[code].as_py()
            _, lo, hi, use_id = inf[g]
            mask = codes == code
            x = ids[mask].astype(np.float64) if use_id else vals[mask]
            out_g.append(g)
            out_h.append(
                np.bincount(bucket_of(x, lo, hi), minlength=B)
                .astype(np.int64).tolist()
            )
        return pa.table({"g": pa.array(out_g, keys.type),
                         "h": pa.array(out_h, pa.list_(pa.int64()))})

    for b in ds.map_batches(
        hist_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for g, h in zip(b.column("g").to_pylist(), b.column("h").to_pylist()):
            hist[g] += np.asarray(h, dtype=np.int64)

    offsets = {g: np.concatenate(([0], np.cumsum(hist[g])[:-1])) for g in hist}
    ctx_ref = ray.put({"info": info, "offsets": offsets})

    def route(t: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        keys = t.column("event_type").combine_chunks()
        vals = t.column("value").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vb = np.zeros(t.num_rows, dtype=np.int64)
        for code in range(len(enc.dictionary)):
            g = enc.dictionary[code].as_py()
            _, lo, hi, use_id = ctx["info"][g]
            mask = codes == code
            x = ids[mask].astype(np.float64) if use_id else vals[mask]
            vb[mask] = bucket_of(x, lo, hi)
        return pa.table({
            "event_id": t.column("event_id"), "g": keys,
            "v": t.column("value"), "_vb": pa.array(vb),
        })

    def tile_bucket(grp: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        g = grp.column("g")[0].as_py()
        n, _, _, use_id = ctx["info"][g]
        base = int(ctx["offsets"][g][grp.column("_vb")[0].as_py()])
        v = grp.column("v").to_numpy(zero_copy_only=False)
        ids = grp.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids,) if use_id else (ids, v))
        rn0 = np.empty(len(order), dtype=np.int64)  # 0-based global row#
        rn0[order] = base + np.arange(len(order))
        # SQL NTILE with uneven buckets: first n%K tiles get one extra
        q, r = divmod(n, K)
        big = r * (q + 1)
        tile = np.where(
            rn0 < big,
            rn0 // (q + 1) + 1,
            (r + (rn0 - big) // q + 1) if q else 1,
        )
        return pa.table({
            "event_id": grp.column("event_id"),
            "event_type": grp.column("g"),
            "tile": pa.array(tile.astype(np.int64)),
        })

    return ds.map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["g", "_vb"]).map_groups(tile_bucket, batch_format="pyarrow")


def q_chunk_documents(sf_dir: str):
    """CONTEXT-WINDOW CHUNKING (the RAG / training-sequence prep
    primitive): every document split into 50-token windows on a
    40-token stride (10-token overlap), emitted as (doc_id, chunk_idx,
    chunk_text) rows. Pure per-batch fan-out — tokenize, window-start
    ranges, explode, slice-join, all in ONE vectorized polars pass; no
    shuffle, streams at any corpus size (output rows ~ tokens/stride).
    Empty docs still emit one (empty) chunk so no document silently
    disappears from the prepared corpus."""
    W, S = 50, 40
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    def chunk_batch(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .with_columns(toks=pl.col("text").str.extract_all(r"[A-Za-z0-9]+"))
            .with_columns(n=pl.col("toks").list.len())
            .with_columns(
                start=pl.int_ranges(0, pl.max_horizontal(pl.col("n"), 1), S)
            )
            .explode("start")
            .with_columns(
                chunk_idx=(pl.col("start") // S).cast(pl.Int64),
                chunk_text=pl.col("toks").list.slice(pl.col("start"), W)
                .list.join(" "),
            )
            .select(["doc_id", "chunk_idx", "chunk_text"])
        )
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
            ("chunk_text", pa.string()),
        ]))

    return ds.map_batches(
        chunk_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_robust_stats_by_type(sf_dir: str):
    """ROBUST STATISTICS per group (median / MAD / 3-MAD outlier
    count): the outlier-detection triple that survives heavy tails,
    where mean/stddev would be dragged by the outliers being hunted.
    COMPOSED distributed order statistics — pass 1: exact grouped
    median (bit-exact 3-pass selection); pass 2: the SAME machinery
    over |x - median| (the deviation column is derived per batch, the
    stream never lands); pass 3: a broadcast-threshold count combiner.
    No task ever holds a group; medians are identical doubles on both
    sides so the 3*MAD gate is hash-exact, not epsilon-close."""
    ds = _read(sf_dir, "events", ["event_type", "value"],
               rows_per_block=20_000)
    med = {
        g: qs[0.5]
        for g, qs in grouped_quantiles_distributed(
            ds, "event_type", "value", [0.5]
        ).items()
    }

    def absdev(t: pa.Table) -> pa.Table:
        m = np.fromiter(
            (med[g] for g in t.column("event_type").to_pylist()),
            dtype=np.float64, count=t.num_rows,
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t.column("event_type"),
            "value": pa.array(np.abs(v - m), pa.float64()),
        })

    dev = ds.map_batches(absdev, batch_format="pyarrow", zero_copy_batch=True)
    mad = {
        g: qs[0.5]
        for g, qs in grouped_quantiles_distributed(
            dev, "event_type", "value", [0.5]
        ).items()
    }

    def outlier_partial(t: pa.Table) -> pa.Table:
        m = np.fromiter(
            (med[g] for g in t.column("event_type").to_pylist()),
            dtype=np.float64, count=t.num_rows,
        )
        cut = np.fromiter(
            (3.0 * mad[g] for g in t.column("event_type").to_pylist()),
            dtype=np.float64, count=t.num_rows,
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        flagged = pa.table({
            "event_type": t.column("event_type"),
            "hit": pa.array((np.abs(v - m) > cut).astype(np.int64)),
        })
        return (
            flagged.group_by("event_type").aggregate([("hit", "sum")])
            .rename_columns(["event_type", "n"])
        )

    parts = [
        b for b in arrow_blocks(ds.map_batches(
            outlier_partial, batch_format="pyarrow", zero_copy_batch=True
        )) if b.num_rows
    ]
    counts = {g: 0 for g in med}
    for b in parts:
        for g, n in zip(b.column("event_type").to_pylist(),
                        b.column("n").to_pylist()):
            counts[g] += int(n)
    groups = sorted(med)
    return pa.table({
        "event_type": pa.array(groups, pa.string()),
        "median_value": pa.array(
            [_round2_half_away(med[g]) for g in groups], pa.float64()),
        "mad_value": pa.array(
            [_round2_half_away(mad[g]) for g in groups], pa.float64()),
        "n_outliers": pa.array([counts[g] for g in groups], pa.int64()),
    })


def q_brand_revenue(sf_dir: str):
    """Revenue by part brand: a SECOND fact-fact co-group join, keyed
    on partkey (revenue_by_nation exercises orderkey) — at TPC-H scale
    ``part`` grows with SF, so it may NOT be broadcast like a true
    dimension. Same scale shape: per-batch revenue combiner collapses
    lineitem to one row per partkey per block, both sides hash-bucket
    by partkey (footer-scaled count), ONE polars join per bucket emits
    brand partials, and the driver folds buckets x |brands| rows."""
    num_buckets = _buckets_for(sf_dir, "lineitem")

    def partial_rev(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(1.0, batch.column("l_discount")),
        )
        t = pa.table({"partkey": batch.column("l_partkey"), "revenue": rev})
        t = t.group_by("partkey").aggregate([("revenue", "sum")]).rename_columns(
            ["partkey", "revenue"]
        )
        return pa.table({
            "partkey": t.column("partkey"),
            "revenue": t.column("revenue"),
            "brand": pa.nulls(t.num_rows, pa.string()),
            "_bucket": _hash_bucket(t.column("partkey"), num_buckets),
        })

    def tag_parts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "partkey": batch.column("p_partkey"),
            "revenue": pa.nulls(batch.num_rows, pa.float64()),
            "brand": batch.column("p_brand"),
            "_bucket": _hash_bucket(batch.column("p_partkey"), num_buckets),
        })

    lineitem = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"],
        rows_per_block=20_000,
    ).map_batches(partial_rev, batch_format="pyarrow", zero_copy_batch=True)
    part = _read(
        sf_dir, "part", ["p_partkey", "p_brand"], rows_per_block=20_000
    ).map_batches(tag_parts, batch_format="pyarrow", zero_copy_batch=True)

    def cogroup_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        rev = (
            df.filter(pl.col("revenue").is_not_null())
            .group_by("partkey").agg(pl.col("revenue").sum())
        )
        brands = df.filter(pl.col("brand").is_not_null()).select(
            ["partkey", "brand"]
        )
        out = (
            rev.join(brands, on="partkey", how="inner")
            .group_by("brand").agg(pl.col("revenue").sum())
        )
        return out.to_arrow().cast(pa.schema([
            ("brand", pa.string()), ("revenue", pa.float64()),
        ]))

    partials = lineitem.union(part).groupby("_bucket").map_groups(
        lambda g: cogroup_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    blocks = [b for b in arrow_blocks(partials) if b.num_rows]
    schema = pa.schema([("p_brand", pa.string()), ("revenue", pa.float64())])
    if not blocks:
        return schema.empty_table()
    out = (
        pl.from_arrow(pa.concat_tables(blocks))
        .group_by("brand").agg(pl.col("revenue").sum())
        .rename({"brand": "p_brand"})
    )
    tab = out.to_arrow().cast(schema)
    return tab.set_column(1, "revenue", _round2(tab.column("revenue")))


def q_supplier_balance_by_nation(sf_dir: str):
    """Supplier account-balance rollup per nation (broadcast dim join +
    integer-cents combiner): acctbal is a 2-decimal money column, so
    each value snaps EXACTLY to bigint cents — the grouped sum is
    order-independent integer arithmetic and the /100 output division
    is one IEEE op, hash-exact by construction (no round-the-float-sum
    epsilon anywhere)."""
    nation_ref = _broadcast_dim(
        sf_dir, "nation", "n_nationkey", ["n_nationkey", "n_name"]
    )
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"],
               rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        nation = ray.get(nation_ref)
        name = _dim_lookup(nation, "n_nationkey", "n_name",
                           t.column("s_nationkey"))
        cents = pc.round(
            pc.multiply(t.column("s_acctbal"), 100.0)
        ).cast(pa.int64())
        loc = pa.table({
            "n_name": name, "cents": cents,
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        return (
            loc.group_by("n_name")
            .aggregate([("one", "sum"), ("cents", "sum")])
            .rename_columns(["n_name", "n_suppliers", "cents"])
        )

    parts = [
        b for b in arrow_blocks(ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )) if b.num_rows
    ]
    schema = pa.schema([
        ("n_name", pa.string()), ("n_suppliers", pa.int64()),
        ("total_bal", pa.float64()),
    ])
    if not parts:
        return schema.empty_table()
    agg = (
        pa.concat_tables(parts)
        .group_by("n_name")
        .aggregate([("n_suppliers", "sum"), ("cents", "sum")])
        .rename_columns(["n_name", "n_suppliers", "cents"])
    )
    bal = pc.divide(agg.column("cents").cast(pa.float64()), 100.0)
    return pa.table({
        "n_name": agg.column("n_name"),
        "n_suppliers": agg.column("n_suppliers"),
        "total_bal": bal,
    })


def q_cube_doc_counts(sf_dir: str):
    """CUBE grouping sets: doc counts + char sums at every subset of
    (lang, source) — the fourth level ROLLUP lacks is (source) alone.
    Same scale shape as the rollup: ONE distributed pass computes the
    finest aggregate, all four levels derive from that
    |lang| x |source| table — never a second corpus scan per level."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"],
               rows_per_block=20_000)
    agg = ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    blocks = arrow_blocks(agg)
    fine = pl.from_arrow(pa.concat_tables(
        b.select(["lang", "source", "n_docs", "sum_chars"]) for b in blocks
    )).with_columns(
        pl.col("n_docs").cast(pl.Int64), pl.col("sum_chars").cast(pl.Int64)
    )
    sums = [pl.col("n_docs").sum(), pl.col("sum_chars").sum()]
    lang_lvl = fine.group_by("lang").agg(sums).with_columns(
        pl.lit(None, dtype=pl.String).alias("source")
    )
    src_lvl = fine.group_by("source").agg(sums).with_columns(
        pl.lit(None, dtype=pl.String).alias("lang")
    )
    total = fine.select(sums).with_columns(
        pl.lit(None, dtype=pl.String).alias("lang"),
        pl.lit(None, dtype=pl.String).alias("source"),
    )
    cols = ["lang", "source", "n_docs", "sum_chars"]
    out = pl.concat([fine.select(cols), lang_lvl.select(cols),
                     src_lvl.select(cols), total.select(cols)])
    return out.to_arrow().cast(pa.schema([
        ("lang", pa.string()), ("source", pa.string()),
        ("n_docs", pa.int64()), ("sum_chars", pa.int64()),
    ]))


def q_dup_ngram_stats(sf_dir: str):
    """Duplicate-n-gram profile (the C4/Gopher "fraction of duplicate
    n-grams" curation signal): for every document, how many DISTINCT
    word 3-grams it contains (``n_grams``) and how many of those occur
    in at least one OTHER document too (``n_dup``) — integer-exact, so
    the downstream gate ``n_dup / n_grams > tau`` is reproducible.

    Scale shape (same two-exchange skeleton as ``rarest_term_per_doc``):

    1. per-block vectorized 3-gram extraction (explode + shift-over-doc,
       one polars kernel per block); docs are whole rows, so per-block
       ``unique`` IS the global per-doc distinct set;
    2. pairs hash-bucket by GRAM — each bucket holds complete gram
       groups, so the in-bucket occurrence count is the global document
       frequency, and every pair is classified (dup / unique) in the
       task that counted it. Each bucket collapses to ONE partial row
       per (bucket, doc) before the second exchange;
    3. a tiny integer grouped sum per doc_id re-assembles the profile.

    Docs with fewer than 3 tokens have no 3-grams and are absent on
    both sides, mirroring the SQL oracle's generate_series emptiness.
    At web scale the gram strings would be 128-bit fingerprints; kept
    as strings here for oracle parity (collision-free by construction).
    """
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    _PAIR = pa.schema([("doc_id", pa.int64()), ("gram", pa.string())])
    _PART = pa.schema([
        ("doc_id", pa.int64()), ("n_grams_p", pa.int64()),
        ("n_dup_p", pa.int64()),
    ])

    def gram_pairs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"[A-Za-z0-9]+").alias("tok"),
            )
            .explode("tok")
            .with_columns(
                t1=pl.col("tok").shift(-1).over("doc_id"),
                t2=pl.col("tok").shift(-2).over("doc_id"),
            )
            .drop_nulls()
            .select(
                "doc_id",
                pl.concat_str(["tok", "t1", "t2"], separator=" ")
                .alias("gram"),
            )
            .unique(subset=["doc_id", "gram"])
        )
        out = ex.to_arrow().cast(_PAIR)
        gh = pa.array(
            pl.from_arrow(out.column("gram").combine_chunks())
            .hash(seed=0).reinterpret(signed=True).to_numpy()
        )
        return out.append_column("_bucket", _hash_bucket(gh, num_buckets))

    def classify_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.with_columns(df=pl.len().over("gram"))
            .group_by("doc_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_grams_p"),
                (pl.col("df") >= 2).sum().cast(pl.Int64).alias("n_dup_p"),
            )
        )
        return out.to_arrow().cast(_PART)

    pairs = ds.map_batches(gram_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    parts = pairs.groupby("_bucket").map_groups(
        lambda g: classify_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )
    agg = parts.groupby("doc_id").aggregate(
        Sum("n_grams_p", alias_name="n_grams"),
        Sum("n_dup_p", alias_name="n_dup"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "n_grams", "n_dup"]).cast(pa.schema([
            ("doc_id", pa.int64()), ("n_grams", pa.int64()),
            ("n_dup", pa.int64()),
        ]))

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


#: Exact-substring-dedup gram width (word tokens). 50 in the paper;
#: 8 here so the synthetic corpus' near-dup pairs produce real spans.
_ESD_N = 8


def q_exact_substring_dedup(sf_dir: str):
    """Exact substring deduplication profile (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" mask
    pass): any word 8-gram occurring >= 2 times ANYWHERE in the corpus
    (across or within documents) marks its token span as duplicated;
    overlapping/adjacent spans merge per document. Emits per doc the
    total token count, removed (masked) token count, kept count and the
    number of merged duplicate spans — exactly the bookkeeping a
    masking rewrite needs.

    Scale shape (the paper's monolithic suffix array is replaced by a
    shuffle-native gram-position inverted stream):

    1. per-block vectorized tokenize + 8-gram fan-out WITH POSITIONS
       (one polars kernel per block); only (gram, doc_id, pos) rows
       leave the task — corpus text never moves;
    2. grams hash-bucket by gram: buckets hold complete gram groups, so
       the in-bucket occurrence count IS the global count; only the
       positions of duplicated grams survive, re-keyed by doc bucket;
    3. per-doc-bucket island merge (positions sorted, fixed-width
       intervals => one cum_sum break kernel), then a tiny integer
       ``groupby(doc_id)`` sum re-assembles spans against the per-doc
       token counts via a union-side co-group — no join shuffle.

    Gram strings stay strings for oracle parity (at web scale they'd
    be 128-bit fingerprints). Docs shorter than 8 tokens have no grams
    and emit removed=0, matching the oracle's LEFT JOIN.
    """
    n = _ESD_N
    num_buckets = _buckets_for(sf_dir, "documents", rows_per_bucket=50_000)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=2_000)

    _GRAM = pa.schema([
        ("doc_id", pa.int64()), ("pos", pa.int64()), ("gram", pa.string()),
    ])
    _HIT = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
    _STAT = pa.schema([
        ("doc_id", pa.int64()), ("total_p", pa.int64()),
        ("removed_p", pa.int64()), ("spans_p", pa.int64()),
    ])

    def gram_pos(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"[A-Za-z0-9]+").alias("tok"),
            )
            .explode("tok")
            .with_columns(pos=pl.int_range(pl.len()).over("doc_id"))
            .with_columns([
                pl.col("tok").shift(-j).over("doc_id").alias(f"t{j}")
                for j in range(1, n)
            ])
            .drop_nulls()
            .select(
                "doc_id",
                pl.col("pos").cast(pl.Int64),
                pl.concat_str(
                    ["tok"] + [f"t{j}" for j in range(1, n)], separator=" "
                ).alias("gram"),
            )
        )
        out = ex.to_arrow().cast(_GRAM)
        if out.num_rows == 0:
            return _GRAM.append(pa.field("_bucket", pa.int32())).empty_table()
        gh = pa.array(
            pl.from_arrow(out.column("gram").combine_chunks())
            .hash(seed=0).reinterpret(signed=True).to_numpy()
        )
        return out.append_column("_bucket", _hash_bucket(gh, num_buckets))

    def dup_hits(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["_bucket"]))
        out = (
            df.with_columns(cnt=pl.len().over("gram"))
            .filter(pl.col("cnt") >= 2)
            .select("doc_id", "pos")
        )
        t = out.to_arrow().cast(_HIT)
        if t.num_rows == 0:
            return _HIT.append(pa.field("_db", pa.int32())).empty_table()
        return t.append_column(
            "_db", _hash_bucket(t.column("doc_id"), num_buckets))

    def islands(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["_db"])).sort(["doc_id", "pos"])
        if df.height == 0:
            return _STAT.empty_table()
        out = (
            df.with_columns(
                brk=((pl.col("pos") - pl.col("pos").shift(1).over("doc_id"))
                     > n).fill_null(True).cast(pl.Int64))
            .with_columns(isl=pl.col("brk").cum_sum().over("doc_id"))
            .group_by(["doc_id", "isl"])
            .agg((pl.col("pos").max() + n - pl.col("pos").min()).alias("rem"))
            .group_by("doc_id")
            .agg(
                pl.col("rem").sum().cast(pl.Int64).alias("removed_p"),
                pl.len().cast(pl.Int64).alias("spans_p"),
            )
            .with_columns(total_p=pl.lit(0).cast(pl.Int64))
            .select(["doc_id", "total_p", "removed_p", "spans_p"])
        )
        return out.to_arrow().cast(_STAT)

    def len_rows(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.select(
                "doc_id",
                pl.col("text").str.extract_all(r"[A-Za-z0-9]+")
                .list.len().cast(pl.Int64).alias("total_p"),
            )
            .with_columns(
                removed_p=pl.lit(0).cast(pl.Int64),
                spans_p=pl.lit(0).cast(pl.Int64),
            )
            .select(["doc_id", "total_p", "removed_p", "spans_p"])
        )
        return out.to_arrow().cast(_STAT)

    grams = ds.map_batches(gram_pos, batch_format="pyarrow",
                           zero_copy_batch=True)
    hits = grams.groupby("_bucket").map_groups(dup_hits,
                                               batch_format="pyarrow")
    stats = hits.groupby("_db").map_groups(islands, batch_format="pyarrow")
    lens = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=2_000).map_batches(
        len_rows, batch_format="pyarrow", zero_copy_batch=True)

    agg = lens.union(stats).groupby("doc_id").aggregate(
        Sum("total_p", alias_name="total_tokens"),
        Sum("removed_p", alias_name="removed_tokens"),
        Sum("spans_p", alias_name="dup_spans"),
    )

    def finish(t: pa.Table) -> pa.Table:
        kept = pc.subtract(t.column("total_tokens"),
                           t.column("removed_tokens"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "total_tokens": t.column("total_tokens"),
            "removed_tokens": t.column("removed_tokens"),
            "kept_tokens": kept,
            "dup_spans": t.column("dup_spans"),
        }).cast(pa.schema([
            ("doc_id", pa.int64()), ("total_tokens", pa.int64()),
            ("removed_tokens", pa.int64()), ("kept_tokens", pa.int64()),
            ("dup_spans", pa.int64()),
        ]))

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_winsorized_stats_by_type(sf_dir: str):
    """Winsorized (p01/p99-clipped) grouped mean — the robust
    preprocessing step a feature pipeline applies before training on
    heavy-tailed metrics. Two passes, both scale-shaped:

    1. exact p01/p99 per group via the distributed order-statistic
       selection (``grouped_quantiles_distributed`` — no task holds a
       full group); the resulting |groups| x 2 clip table stays on the
       driver (a few rows) and is captured by the partial kernel;
    2. per-block (n, sum-of-clipped) partials, then the deterministic
       driver fold over blocks x groups rows with scale-4 rounding
       (the ``value_moments_by_type`` float-parity contract).

    Clip thresholds are the bit-exact ``quantile_cont`` values, so
    ``least/greatest`` clamping is bitwise identical to the oracle's.
    """
    ds = _read(sf_dir, "events", ["event_type", "value"],
               rows_per_block=20_000)
    qs = grouped_quantiles_distributed(ds, "event_type", "value",
                                       [0.01, 0.99])
    clip = {g: (v[0.01], v[0.99]) for g, v in qs.items()}

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        lo = pl.col("event_type").replace_strict(
            {g: c[0] for g, c in clip.items()}, return_dtype=pl.Float64)
        hi = pl.col("event_type").replace_strict(
            {g: c[1] for g, c in clip.items()}, return_dtype=pl.Float64)
        out = (
            df.with_columns(cv=pl.col("value").clip(lo, hi))
            .group_by("event_type")
            .agg(pl.len().cast(pl.Int64).alias("n"),
                 pl.col("cv").sum().alias("s1"))
        )
        return out.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("n", pa.int64()),
            ("s1", pa.float64()),
        ]))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    blocks = arrow_blocks(parts)
    out_schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("lo", pa.float64()), ("hi", pa.float64()),
        ("winsor_mean", pa.float64()),
    ])
    if not blocks:
        return out_schema.empty_table()
    df = (
        pl.from_arrow(pa.concat_tables(blocks))
        .sort(["event_type", "n", "s1"])
        .group_by("event_type", maintain_order=True)
        .agg(pl.col("n").sum(), pl.col("s1").sum())
        .sort("event_type")
    )
    types = df["event_type"].to_list()
    n = df["n"].to_numpy()
    mean = df["s1"].to_numpy() / n.astype(np.float64)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n": pa.array(df["n"].to_list(), pa.int64()),
        "lo": pa.array([_round4_half_away(clip[g][0]) for g in types],
                       pa.float64()),
        "hi": pa.array([_round4_half_away(clip[g][1]) for g in types],
                       pa.float64()),
        "winsor_mean": pa.array([_round4_half_away(x) for x in mean],
                                pa.float64()),
    })


def grouped_weighted_quantiles_distributed(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    weight_col: str,
    fracs: list[tuple[int, int]],
    *,
    num_value_buckets: int = 512,
) -> dict:
    """Exact LOWER weighted quantiles per group — for each rational
    ``p = num/den`` in ``fracs``, ``min{x : den·cumw(x) ≥ num·W}`` with
    ``cumw(x)`` the total weight of rows with value ≤ x — via the
    WEIGHTED variant of the distributed order-statistic selection
    (:func:`grouped_quantiles_distributed`): the per-batch histogram
    accumulates integer WEIGHT per value bucket instead of row counts,
    the cumulative histogram locates, per quantile, the first bucket
    whose cumulative weight reaches ``ceil(num·W/den)``, and only those
    buckets' rows (~n/B each) ship to per-(group, bucket) tasks that
    collapse value ties and scan the weighted cumsum. Ties are
    bucket-contained (equal values share a bucket), so the local scan
    sees the exact global cumw. Weights must be non-negative integers
    and ``p`` rational (exact integer arithmetic end to end); no task
    ever holds a full group. Returns ``{group: {(num, den): value}}``.
    """
    stats = ds.groupby(group_col).aggregate(
        Sum(weight_col, alias_name="_w"),
        Min(value_col, alias_name="_mn"),
        Max(value_col, alias_name="_mx"),
    ).take_all()
    B = num_value_buckets
    info = {
        r[group_col]: {"W": int(r["_w"]), "mn": r["_mn"], "mx": r["_mx"]}
        for r in stats
    }
    out = {
        g: {f: v["mn"] for f in fracs}
        for g, v in info.items() if v["mn"] == v["mx"]
    }
    todo = {g: v for g, v in info.items() if v["mn"] < v["mx"]}
    if not todo:
        return out

    def bucket_of(vals: np.ndarray, mn: float, mx: float) -> np.ndarray:
        idx = np.floor((vals - mn) / (mx - mn) * B).astype(np.int64)
        return np.clip(idx, 0, B - 1)

    bounds_ref = ray.put({g: (v["mn"], v["mx"]) for g, v in todo.items()})

    def hist_batch(t: pa.Table) -> pa.Table:
        bounds = ray.get(bounds_ref)
        keys = t.column(group_col).combine_chunks()
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        wts = t.column(weight_col).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        out_g, out_h = [], []
        for code in range(len(enc.dictionary)):
            g = enc.dictionary[code].as_py()
            if g not in bounds:
                continue
            mn, mx = bounds[g]
            mask = codes == code
            h = np.zeros(B, dtype=np.int64)
            np.add.at(h, bucket_of(vals[mask], mn, mx),
                      wts[mask].astype(np.int64))
            out_g.append(g)
            out_h.append(h.tolist())
        return pa.table(
            {"g": pa.array(out_g, keys.type),
             "h": pa.array(out_h, pa.list_(pa.int64()))}
        )

    hist = {g: np.zeros(B, dtype=np.int64) for g in todo}
    partials = ds.map_batches(
        hist_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in partials.iter_batches(batch_format="pyarrow"):
        for g, h in zip(b.column("g").to_pylist(), b.column("h").to_pylist()):
            hist[g] += np.asarray(h, dtype=np.int64)

    # per (g, bucket): {frac: (cum_weight_before, threshold)} — one
    # scan task can resolve several quantiles landing in its bucket
    target: dict = {}
    for g, v in todo.items():
        cum = np.cumsum(hist[g])
        for num, den in fracs:
            # den*cum >= num*W  <=>  cum >= ceil(num*W / den)
            thr = (num * v["W"] + den - 1) // den
            bk = int(np.searchsorted(cum, thr))
            bk = min(bk, B - 1)  # all-zero-weight group: min bucket
            target.setdefault((g, bk), {})[(num, den)] = (
                int(cum[bk - 1]) if bk > 0 else 0, thr
            )

    need_ref = ray.put(
        {"bounds": {g: (v["mn"], v["mx"]) for g, v in todo.items()},
         "buckets": {g: sorted({b for gg, b in target if gg == g})
                     for g in todo}}
    )

    def pick(t: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        keys = t.column(group_col).combine_chunks()
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        wts = t.column(weight_col).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        out_g, out_b, out_v, out_w = [], [], [], []
        for code in range(len(enc.dictionary)):
            g = enc.dictionary[code].as_py()
            if g not in need["bounds"]:
                continue
            mn, mx = need["bounds"][g]
            mask = codes == code
            sub, sw = vals[mask], wts[mask]
            bks = bucket_of(sub, mn, mx)
            keep = np.isin(bks, need["buckets"][g])
            out_g.extend([g] * int(keep.sum()))
            out_b.extend(bks[keep].tolist())
            out_v.extend(sub[keep].tolist())
            out_w.extend(sw[keep].astype(np.int64).tolist())
        return pa.table(
            {"g": pa.array(out_g, keys.type),
             "_vb": pa.array(out_b, pa.int64()),
             "v": pa.array(out_v, pa.float64()),
             "w": pa.array(out_w, pa.int64())}
        )

    tgt = dict(target)

    def scan_bucket(grp: pa.Table) -> pa.Table:
        g = grp.column("g")[0].as_py()
        bk = grp.column("_vb")[0].as_py()
        wanted = tgt[(g, bk)]
        v = grp.column("v").to_numpy(zero_copy_only=False)
        w = grp.column("w").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(v, return_inverse=True)  # sorted ascending
        wsum = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(wsum, inv, w)
        out_n, out_d, out_v = [], [], []
        for (num, den), (before, thr) in wanted.items():
            cum = before + np.cumsum(wsum)
            idx = min(int(np.searchsorted(cum, thr)), len(uniq) - 1)
            out_n.append(num)
            out_d.append(den)
            out_v.append(float(uniq[idx]))
        return pa.table({
            "g": pa.array([g] * len(out_n), grp.schema.field("g").type),
            "num": pa.array(out_n, pa.int64()),
            "den": pa.array(out_d, pa.int64()),
            "val": pa.array(out_v, pa.float64()),
        })

    picked = ds.map_batches(pick, batch_format="pyarrow",
                            zero_copy_batch=True)
    res = picked.groupby(["g", "_vb"]).map_groups(
        scan_bucket, batch_format="pyarrow"
    )
    for b in res.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "g" not in b.column_names:
            continue
        for g, num, den, val in zip(
            b.column("g").to_pylist(), b.column("num").to_pylist(),
            b.column("den").to_pylist(), b.column("val").to_pylist(),
        ):
            out.setdefault(g, {})[(num, den)] = val
    return out


def grouped_weighted_median_distributed(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    weight_col: str,
    *,
    num_value_buckets: int = 512,
) -> dict:
    """Exact lower weighted median — ``min{x : 2·cumw(x) ≥ W}`` — as the
    single-quantile case of
    :func:`grouped_weighted_quantiles_distributed`."""
    res = grouped_weighted_quantiles_distributed(
        ds, group_col, value_col, weight_col, [(1, 2)],
        num_value_buckets=num_value_buckets,
    )
    return {g: v[(1, 2)] for g, v in res.items()}


def _events_with_weight(sf_dir: str) -> ray.data.Dataset:
    """(event_type, value, k) stream with the ``props.k`` payload
    integer extracted per batch — shared by the weighted-selection
    queries."""
    ds = _read(sf_dir, "events", ["event_type", "value", "props"],
               rows_per_block=20_000)

    def extract(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).select(
            pl.col("event_type"), pl.col("value"),
            pl.col("props").str.json_path_match("$.k")
            .cast(pl.Int64).alias("k"),
        )
        return df.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("value", pa.float64()),
            ("k", pa.int64()),
        ]))

    return ds.map_batches(extract, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_weighted_median_by_type(sf_dir: str):
    """Weighted median of ``value`` per event_type, weight = the
    ``props.k`` payload integer — the budget-weighted robust center a
    curation pipeline uses when each record carries a size/importance
    weight. JSON extraction per batch, then the weighted selection
    machinery (:func:`grouped_weighted_median_distributed`)."""
    med = grouped_weighted_median_distributed(
        _events_with_weight(sf_dir), "event_type", "value", "k"
    )
    groups = sorted(med)
    return pa.table({
        "event_type": pa.array(groups, pa.string()),
        "wmedian": pa.array([med[g] for g in groups], pa.float64()),
    })


def q_weighted_quantiles_by_type(sf_dir: str):
    """Weighted p25/p50/p75 of ``value`` per event_type (weight =
    ``props.k``) — ONE selection pass serves all three quantiles: the
    weight histogram is shared, each quantile adds only a threshold
    lookup plus its target bucket's scan (buckets coincide when
    quantiles land close, and the scan task resolves every threshold
    routed to it)."""
    qs = grouped_weighted_quantiles_distributed(
        _events_with_weight(sf_dir), "event_type", "value", "k",
        [(1, 4), (1, 2), (3, 4)],
    )
    groups = sorted(qs)
    cols: dict = {"event_type": pa.array(groups, pa.string())}
    for name, f in (("wp25", (1, 4)), ("wp50", (1, 2)), ("wp75", (3, 4))):
        cols[name] = pa.array([qs[g][f] for g in groups], pa.float64())
    return pa.table(cols)


def q_embedding_covariance(sf_dir: str):
    """Distributed covariance matrix of the embedding columns — the
    PCA/whitening building block a representation pipeline computes
    before decorrelating features. One streaming pass: each batch
    collapses to a single (n, Σx, ΣxᵀX) partial via one float64 matmul
    (the Gram update — d² doubles per block, never rows), then the
    deterministic driver fold + scale-4 rounding of the
    ``value_moments_by_type`` float-parity contract. Emits the upper
    triangle (i ≤ j, 1-based to match SQL ``generate_subscripts``) as
    ``covar_samp`` values. At 100 TB the partial is still d² doubles
    per block — the reduction is embarrassingly combiner-shaped; the
    driver holds one d×d matrix."""
    ds = _read(sf_dir, "embeddings", ["embedding"], rows_per_block=20_000)

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        flat = arr.values.to_numpy(zero_copy_only=False)
        n = len(arr)
        d = len(flat) // n
        X = flat.astype(np.float64).reshape(n, d)
        s = X.sum(axis=0)
        m = X.T @ X
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "m": pa.array([m.reshape(-1).tolist()], pa.list_(pa.float64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    blocks = arrow_blocks(parts)
    out_schema = pa.schema([
        ("i", pa.int64()), ("j", pa.int64()), ("cov", pa.float64()),
    ])
    if not blocks:
        return out_schema.empty_table()
    rows = pa.concat_tables(blocks).to_pylist()
    # deterministic fold order (the moments contract): distributed
    # arrival order must not flip the 4th decimal run-to-run
    rows.sort(key=lambda r: (r["n"], r["s"][0], r["m"][0]))
    n = sum(r["n"] for r in rows)
    d = int(round(len(rows[0]["m"]) ** 0.5))
    s = np.zeros(d)
    m = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        m += np.asarray(r["m"]).reshape(d, d)
    cov = (m - np.outer(s, s) / n) / (n - 1)
    iu, ju = np.triu_indices(d)
    return pa.table({
        "i": pa.array((iu + 1).tolist(), pa.int64()),
        "j": pa.array((ju + 1).tolist(), pa.int64()),
        "cov": pa.array(
            [_round4_half_away(float(cov[a, b])) for a, b in zip(iu, ju)],
            pa.float64()),
    })


def q_time_weighted_avg_per_user(sf_dir: str):
    """Time-weighted average value per user — the streaming-metrics
    primitive (a gauge sampled at irregular events: each value is held
    until the user's next event, weight = holding time in integer μs).
    Same bucketed complete-user-groups shape as the window family; one
    vectorized lead/holding/aggregate kernel per bucket. Users with a
    single event (no holding interval) or zero total holding time are
    excluded on both sides; products are float64 with integer-exact μs
    weights, output under the scale-4 rounding contract."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"],
               rows_per_block=20_000)

    def twa_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        out = (
            df.with_columns(
                dur=(
                    pl.col("ts").shift(-1).over("user_id").cast(pl.Int64)
                    - pl.col("ts").cast(pl.Int64)
                )
            )
            .drop_nulls("dur")
            .group_by("user_id")
            .agg(
                (pl.col("value") * pl.col("dur")).sum().alias("vd"),
                pl.col("dur").sum().alias("d"),
            )
            .filter(pl.col("d") > 0)
        )
        vd = out["vd"].to_numpy()
        d = out["d"].to_numpy().astype(np.float64)
        twa = vd / d
        twa = np.sign(twa) * np.floor(np.abs(twa) * 1e4 + 0.5) / 1e4
        return pa.table({
            "user_id": pa.array(out["user_id"].to_list(), pa.int64()),
            "twa_value": pa.array(twa, pa.float64()),
        })

    return _bucketed_groups(
        ds, "user_id", twa_bucket, num_buckets=_buckets_for(sf_dir)
    )


#: PII-style scrub pattern set: the classic webtext redaction pass
#: (emails, IPv4s, long digit runs). On the synthetic tables only the
#: digit-run pattern fires (every ``props`` row carries one) — the
#: email/IP patterns are exercised structurally (compiled, applied,
#: zero matches) and the oracle proves all three replacements compose
#: identically.
_SCRUB_PATTERNS = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("[0-9]+", "<NUM>"),
]


def q_scrub_props(sf_dir: str):
    """Regex redaction (PII scrubbing) — the per-row text TRANSFORM
    class (replace, not extract/count): apply the ordered
    :data:`_SCRUB_PATTERNS` to ``props``, emitting the cleaned string
    plus the total match count the pass masked. Pure map stage — one
    vectorized polars ``replace_all``/``count_matches`` kernel per
    batch, no shuffle, streams at any scale. Pattern dialect is the
    RE2-compatible subset shared by polars(Rust regex) and DuckDB(RE2),
    so the oracle's ``regexp_replace(..., 'g')`` chain is bit-identical.
    """
    ds = _read(sf_dir, "events", ["event_id", "props"],
               rows_per_block=20_000)

    def scrub(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        clean = pl.col("props")
        masked = pl.lit(0, dtype=pl.Int64)
        for pat, repl in _SCRUB_PATTERNS:
            masked = masked + clean.str.count_matches(pat).cast(pl.Int64)
            clean = clean.str.replace_all(pat, repl)
        out = df.select(
            pl.col("event_id"),
            clean.alias("props_clean"),
            masked.alias("n_masked"),
        )
        return out.to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("props_clean", pa.string()),
            ("n_masked", pa.int64()),
        ]))

    return ds.map_batches(scrub, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

# NOTE on ordering: the correctness driver samples a fixed-size prefix of
# this registry (insertion order).  The first ~50 entries are therefore a
# deliberate priority prefix: the flagship CDC/lake-semantics family first
# (the engine's reason to exist), then the curate pipelines, then the
# strongest single-operator evidence for SURVEY.md §2.  Every entry —
# prefix or not — carries the identical oracle check in
# tests/test_queries_oracle.py.
QUERIES = {
    # -- flagship CDC / lake semantics (driver priority prefix) --
    "cdc_lake_state": q_cdc_lake_state,
    "cdc_lake_state_objstore": q_cdc_lake_state_objstore,
    "cdc_lake_state_mor": q_cdc_lake_state_mor,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    "cdc_multi_source": q_cdc_multi_source,
    "cdc_change_feed": q_cdc_change_feed,
    "cdc_dedup_index": q_cdc_dedup_index,
    "cdc_simhash_index": q_cdc_simhash_index,
    "cdc_canonical_corpus": q_cdc_canonical_corpus,
    "scd2_history": q_scd2_history,
    "cdc_delete_where": q_cdc_delete_where,
    "cdc_update_where": q_cdc_update_where,
    "cdc_purge": q_cdc_purge,
    "cdc_purge_history": q_cdc_purge_history,
    "cdc_wap_publish": q_cdc_wap_publish,
    "cdc_merge_branch": q_cdc_merge_branch,
    "cdc_catalog": q_cdc_catalog,
    "cdc_restore_feed": q_cdc_restore_feed,
    "cdc_entity_lake": q_cdc_entity_lake,
    "entity_change_feed": q_entity_change_feed,
    "lake_point_lookup": q_lake_point_lookup,
    "lake_time_slice": q_lake_time_slice,
    "lake_bloom_lookup": q_lake_bloom_lookup,
    "incremental_lang_counts": q_incremental_lang_counts,
    "incremental_lang_stats": q_incremental_lang_stats,
    "incremental_lang_segment_counts": q_incremental_lang_segment_counts,
    "incremental_lang_distinct_segments": q_incremental_lang_distinct_segments,
    "replica_purchase_pages": q_replica_purchase_pages,
    "curate_filter": q_curate_filter,
    "curate_corpus": q_curate_corpus,
    "curate_corpus_exact": q_curate_corpus_exact,
    # -- core §2 operator evidence (rest of the priority prefix) --
    "watermark_filter": q_watermark_filter,
    "lww_latest_by_user": q_lww_latest_by_user,
    "fanout_entities": q_fanout_entities,
    "page_entities": q_page_entities,
    "exclusion_filter": q_exclusion_filter,
    "null_normalize": q_null_normalize,
    "multimodal_decode": q_multimodal_decode,
    "max_ts_per_type": q_max_ts_per_type,
    "dedup_first_event": q_dedup_first_event,
    "tumbling_window_counts": q_tumbling_window_counts,
    "top_terms": q_top_terms,
    "dedup_exact_docs": q_dedup_exact_docs,
    "jaccard_dedup_docs": q_jaccard_dedup_docs,
    "minhash_dedup_docs": q_minhash_dedup_docs,
    "ann_topk": q_ann_topk,
    "prepare_training_corpus": q_prepare_training_corpus,
    "decontaminate_ngrams": q_decontaminate_ngrams,
    "pack_token_shards": q_pack_token_shards,
    "mixture_by_token_budget": q_mixture_by_token_budget,
    "doc_token_stats": q_doc_token_stats,
    # -- remainder (unordered beyond here; all rehearsal-checked) --
    "hopping_window_counts": q_hopping_window_counts,
    "events_in_prior_hour": q_events_in_prior_hour,
    "distinct_users_per_type": q_distinct_users_per_type,
    "hll_distinct_users_per_type": q_hll_distinct_users_per_type,
    "top_terms_sketch": q_top_terms_sketch,
    "hourly_distinct_users": q_hourly_distinct_users,
    "quality_gate_by_lang": q_quality_gate_by_lang,
    "sessionize": q_sessionize,
    "asof_last_signup": q_asof_last_signup,
    "customers_without_orders": q_customers_without_orders,
    "distinct_segments": q_distinct_segments,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "top_customers": q_top_customers,
    "order_priority_count": q_order_priority_count,
    "sample_documents": q_sample_documents,
    "stratified_sample_by_lang": q_stratified_sample_by_lang,
    "top2_events_per_user": q_top2_events_per_user,
    "cumulative_value_per_user": q_cumulative_value_per_user,
    "median_value_by_type": q_median_value_by_type,
    "value_percentile_by_type": q_value_percentile_by_type,
    "value_quantiles_by_type": q_value_quantiles_by_type,
    "event_type_pivot": q_event_type_pivot,
    "embedding_scores": q_embedding_scores,
    "doc_bpeish_tokens": q_doc_bpeish_tokens,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "simhash_dedup_docs": q_simhash_dedup_docs,
    "embedding_dedup": q_embedding_dedup,
    "ann_topk_ivf": q_ann_topk_ivf,
    "rollup_doc_counts": q_rollup_doc_counts,
    "orders_left_join_recent_revenue": q_orders_left_join_recent_revenue,
    "funnel_signup_purchase": q_funnel_signup_purchase,
    "decontaminate_bloom": q_decontaminate_bloom,
    "value_quantiles_tdigest": q_value_quantiles_tdigest,
    "distinct_sources_by_lang": q_distinct_sources_by_lang,
    "bigram_counts": q_bigram_counts,
    "value_moments_by_type": q_value_moments_by_type,
    "weighted_sample_docs": q_weighted_sample_docs,
    "moving_avg_value_per_user": q_moving_avg_value_per_user,
    "next_event_gap": q_next_event_gap,
    "event_transitions": q_event_transitions,
    "debounce_events": q_debounce_events,
    "purchase_attribution": q_purchase_attribution,
    "events_above_type_p90": q_events_above_type_p90,
    "mode_event_type_per_user": q_mode_event_type_per_user,
    "profile_documents": q_profile_documents,
    "contamination_pairs": q_contamination_pairs,
    "doc_length_histogram": q_doc_length_histogram,
    "kmeans_embeddings": q_kmeans_embeddings,
    "doc_repetition_stats": q_doc_repetition_stats,
    "props_value_stats": q_props_value_stats,
    "rarest_term_per_doc": q_rarest_term_per_doc,
    "tfidf_top_terms": q_tfidf_top_terms,
    "term_postings": q_term_postings,
    "peak_concurrency_by_type": q_peak_concurrency_by_type,
    "unshipped_orders_revenue": q_unshipped_orders_revenue,
    "top_terms_per_lang": q_top_terms_per_lang,
    "local_supplier_revenue": q_local_supplier_revenue,
    "events_per_user_histogram": q_events_per_user_histogram,
    "term_cooccurrence_topk": q_term_cooccurrence_topk,
    "gini_by_type": q_gini_by_type,
    "order_fulfillment_lag": q_order_fulfillment_lag,
    "corr_value_props_by_type": q_corr_value_props_by_type,
    "lang_entropy_by_source": q_lang_entropy_by_source,
    "retention_cohorts": q_retention_cohorts,
    "doc_lm_score": q_doc_lm_score,
    "regr_value_vs_time_by_type": q_regr_value_vs_time_by_type,
    "users_signup_and_purchase": q_users_signup_and_purchase,
    "users_view_no_purchase": q_users_view_no_purchase,
    "embedding_norm_stats_by_label": q_embedding_norm_stats_by_label,
    "change_feed_op_counts": q_change_feed_op_counts,
    "user_journeys": q_user_journeys,
    "hourly_signup_purchase": q_hourly_signup_purchase,
    "revenue_share_by_nation": q_revenue_share_by_nation,
    "region_top_nations": q_region_top_nations,
    "minmax_scale_events": q_minmax_scale_events,
    "rolling_hour_value_per_user": q_rolling_hour_value_per_user,
    "value_ntile_by_type": q_value_ntile_by_type,
    "chunk_documents": q_chunk_documents,
    "robust_stats_by_type": q_robust_stats_by_type,
    "brand_revenue": q_brand_revenue,
    "supplier_balance_by_nation": q_supplier_balance_by_nation,
    "cube_doc_counts": q_cube_doc_counts,
    "dup_ngram_stats": q_dup_ngram_stats,
    "exact_substring_dedup": q_exact_substring_dedup,
    "winsorized_stats_by_type": q_winsorized_stats_by_type,
    "scrub_props": q_scrub_props,
    "weighted_median_by_type": q_weighted_median_by_type,
    "embedding_covariance": q_embedding_covariance,
    "weighted_quantiles_by_type": q_weighted_quantiles_by_type,
    "time_weighted_avg_per_user": q_time_weighted_avg_per_user,
}

_TOKEN_SQL = "length(regexp_extract_all(text, '[A-Za-z0-9]+'))"
_PUNCT_SQL = "length(regexp_extract_all(text, '[.,;:!?]'))"
_STOP_SQL = (
    r"length(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b'))"
)


def _lang_count(words: tuple[str, ...]) -> str:
    return (
        r"length(regexp_extract_all(lower(text), '\b("
        + "|".join(words)
        + r")\b'))"
    )


_QUALITY_SQL = (
    "round( (least({t}, 200) / 200.0 * 0.5"
    " + {st} * 1.0 / greatest({t}, 1) * 0.3"
    " + (1 - {p} * 1.0 / greatest(length(text), 1)) * 0.2)"
    " * 10000) / 10000"
).format(t=_TOKEN_SQL, st=_STOP_SQL, p=_PUNCT_SQL)

_LANG_CASE = f"""
CASE
  WHEN {_lang_count(ts.LANG_STOPWORDS['en'])} = 0
   AND {_lang_count(ts.LANG_STOPWORDS['de'])} = 0
   AND {_lang_count(ts.LANG_STOPWORDS['fr'])} = 0
   AND {_lang_count(ts.LANG_STOPWORDS['es'])} = 0 THEN 'und'
  WHEN {_lang_count(ts.LANG_STOPWORDS['en'])} >= {_lang_count(ts.LANG_STOPWORDS['de'])}
   AND {_lang_count(ts.LANG_STOPWORDS['en'])} >= {_lang_count(ts.LANG_STOPWORDS['fr'])}
   AND {_lang_count(ts.LANG_STOPWORDS['en'])} >= {_lang_count(ts.LANG_STOPWORDS['es'])} THEN 'en'
  WHEN {_lang_count(ts.LANG_STOPWORDS['de'])} >= {_lang_count(ts.LANG_STOPWORDS['fr'])}
   AND {_lang_count(ts.LANG_STOPWORDS['de'])} >= {_lang_count(ts.LANG_STOPWORDS['es'])} THEN 'de'
  WHEN {_lang_count(ts.LANG_STOPWORDS['fr'])} >= {_lang_count(ts.LANG_STOPWORDS['es'])} THEN 'fr'
  ELSE 'es'
END
"""

ORACLE_SQL = {
    "lww_latest_by_user": """
        SELECT user_id, event_id, ts, value FROM (
          SELECT user_id, event_id, ts, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
    "watermark_filter": """
        SELECT event_id, ts, user_id FROM events
        WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
    "max_ts_per_type": """
        SELECT event_type, max(ts) AS max_ts, count(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "dedup_first_event": """
        SELECT user_id, event_type, event_id AS first_event_id FROM (
          SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts ASC, event_id ASC) AS rn
          FROM events) WHERE rn = 1
    """,
    "fanout_entities": """
        SELECT event_id, 'value' AS entity_type, value AS v FROM events
        UNION ALL
        SELECT event_id, 'prop_k' AS entity_type,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS v
        FROM events
    """,
    "tumbling_window_counts": """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               count(*) AS n_events,
               round(sum(value) * 100) / 100 AS sum_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "hopping_window_counts": """
        SELECT event_type, window_start, count(*) AS n_events FROM (
          SELECT event_type, date_trunc('hour', ts) AS window_start
          FROM events
          UNION ALL
          SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR
          FROM events)
        GROUP BY event_type, window_start
    """,
    "events_in_prior_hour": """
        SELECT a.event_id, count(b.event_id) AS n_prior
        FROM events a
        LEFT JOIN events b
          ON b.user_id = a.user_id
         AND b.ts >= a.ts - INTERVAL 1 HOUR
         AND b.ts <  a.ts
        GROUP BY a.event_id
    """,
    "value_percentile_by_type": """
        SELECT event_id,
               round(percent_rank() OVER (PARTITION BY event_type
                                          ORDER BY value) * 1000000)
                 / 1000000 AS pct_rank
        FROM events
    """,
    "distinct_users_per_type": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "hourly_distinct_users": """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    # ordered prefix sum: DuckDB's windowed SUM over ints is HUGEINT;
    # CAST to BIGINT for hash parity with the engine's int64
    "pack_token_shards": f"""
        WITH t AS (SELECT doc_id, {_TOKEN_SQL} AS n_tokens FROM documents),
        c AS (SELECT doc_id, n_tokens,
                CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS cum_before
              FROM t)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               cum_before // {PACK_SHARD_TOKENS} AS shard_id
        FROM c
    """,
    # per-source greedy prefix fill: admitted iff the source's tokens
    # BEFORE this doc are under budget (= half the source's total)
    "mixture_by_token_budget": f"""
        WITH t AS (
          SELECT doc_id, source, {_TOKEN_SQL} AS n_tokens FROM documents
        ),
        b AS (
          SELECT source, CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget
          FROM t GROUP BY source
        ),
        c AS (
          SELECT doc_id, source, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cum_before
          FROM t)
        SELECT c.doc_id, c.source, CAST(c.n_tokens AS BIGINT) AS n_tokens
        FROM c JOIN b ON c.source = b.source
        WHERE c.cum_before < b.budget
    """,
    # the full training-prep flow as ONE statement (gate ->
    # decontaminate -> exact dedup -> stratified sample -> pack)
    "prepare_training_corpus": f"""
        WITH q AS (
          SELECT doc_id, lang, text, {_TOKEN_SQL} AS n_tokens,
                 {_QUALITY_SQL} AS quality
          FROM documents
        ),
        gated AS (
          SELECT * FROM q
          WHERE quality >= {_PREP_QUALITY_MIN}
            AND doc_id >= {_DECON_BENCH_SQL}
        ),
        toks AS (
          SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS tk
          FROM documents
        ),
        grams AS (
          SELECT doc_id, array_to_string(tk[i:i+{_DECON_NGRAM - 1}], ' ') AS gram
          FROM toks,
               unnest(generate_series(1, greatest(len(tk) - {_DECON_NGRAM - 1}, 0)))
                 AS g(i)
        ),
        bench AS (
          SELECT DISTINCT gram FROM grams WHERE doc_id < {_DECON_BENCH_SQL}
        ),
        decon AS (
          SELECT g.* FROM gated g
          WHERE NOT EXISTS (
            SELECT 1 FROM grams gr JOIN bench b ON gr.gram = b.gram
            WHERE gr.doc_id = g.doc_id)
        ),
        deduped AS (
          SELECT * FROM decon d
          WHERE d.doc_id = (SELECT min(x.doc_id) FROM decon x
                            WHERE x.text = d.text)
        ),
        sampled AS (
          SELECT doc_id, lang, n_tokens FROM deduped
          WHERE (doc_id * 2654435761) % 4294967296 <
            CASE lang
              WHEN 'en' THEN {int(_PREP_RATES["en"] * (1 << 32))}
              ELSE {int(_PREP_RATE_DEFAULT * (1 << 32))}
            END
        ),
        packed AS (
          SELECT doc_id, lang, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cum_before
          FROM sampled
        )
        SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
               cum_before // {PACK_SHARD_TOKENS} AS shard_id
        FROM packed
    """,
    "quality_gate_by_lang": f"""
        WITH q AS (SELECT doc_id, lang, {_QUALITY_SQL} AS quality
                   FROM documents),
        m AS (SELECT lang, quantile_cont(quality, 0.5) AS med
              FROM q GROUP BY lang)
        SELECT q.doc_id, q.lang, q.quality
        FROM q JOIN m ON q.lang = m.lang
        WHERE q.quality > m.med
    """,
    "top_terms": """
        SELECT term, count(*) AS n FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents)
        GROUP BY term
        ORDER BY n DESC, term
        LIMIT 50
    """,
    "sessionize": """
        WITH flagged AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
          SELECT user_id, event_id, ts,
                 -- CAST: DuckDB's windowed sum over ints is HUGEINT;
                 -- the engine emits int64 (hash parity requires BIGINT)
                 CAST(sum(is_new) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_index
          FROM flagged)
        SELECT user_id, session_index, count(*) AS n_events,
               min(ts) AS session_start
        FROM numbered GROUP BY user_id, session_index
    """,
    "asof_last_signup": """
        SELECT e.event_id, e.user_id, max(s.ts) AS last_signup_ts
        FROM events e
        LEFT JOIN events s
          ON s.user_id = e.user_id
         AND s.event_type = 'signup'
         AND s.ts <= e.ts
        WHERE e.event_type = 'purchase'
        GROUP BY e.event_id, e.user_id
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    """,
    "distinct_segments": """
        SELECT DISTINCT c_mktsegment FROM customer
    """,
    "exclusion_filter": """
        SELECT doc_id, lang, source FROM documents
        WHERE NOT regexp_matches(text, 'merge|fox')
    """,
    "null_normalize": """
        SELECT doc_id,
               coalesce(nullif(lang, ''), 'und') AS lang_norm,
               coalesce(nullif(source, ''), 'unknown') AS source_norm
        FROM documents
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity) * 100) / 100 AS sum_qty,
               round(sum(l_extendedprice) * 100) / 100 AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)) * 100) / 100 AS sum_disc_price,
               round(avg(l_quantity) * 100) / 100 AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "revenue_by_nation": """
        SELECT n.n_name AS n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) / 100 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "top_customers": """
        SELECT o_custkey, c_name, total_spent FROM (
          SELECT o_custkey,
                 round(sum(o_totalprice) * 100) / 100 AS total_spent
          FROM orders GROUP BY o_custkey)
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_spent DESC, o_custkey LIMIT 10
    """,
    "order_priority_count": """
        SELECT o_orderpriority, count(*) AS n_orders FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderpriority
    """,
    "sample_documents": """
        SELECT doc_id, lang, source FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 < 429496729
    """,
    "stratified_sample_by_lang": f"""
        SELECT doc_id, lang FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 <
          CASE lang
            WHEN 'en' THEN {int(0.05 * (1 << 32))}
            ELSE {int(0.25 * (1 << 32))}
          END
    """,
    # train/eval n-gram overlap filter; gram construction in lock-step
    # with queries._gram_hash_list (8 tokens, space-joined)
    "decontaminate_ngrams": f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS tk
          FROM documents
        ),
        grams AS (
          SELECT doc_id, array_to_string(tk[i:i+{_DECON_NGRAM - 1}], ' ') AS gram
          FROM toks,
               unnest(generate_series(1, greatest(len(tk) - {_DECON_NGRAM - 1}, 0)))
                 AS g(i)
        ),
        bench AS (
          SELECT DISTINCT gram FROM grams WHERE doc_id < {_DECON_BENCH_SQL}
        )
        SELECT d.doc_id, d.lang FROM documents d
        WHERE d.doc_id >= {_DECON_BENCH_SQL} AND NOT EXISTS (
          SELECT 1 FROM grams g JOIN bench b ON g.gram = b.gram
          WHERE g.doc_id = d.doc_id)
    """,
    "top2_events_per_user": """
        SELECT user_id, event_id, value, rank FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rank
          FROM events) WHERE rank <= 2
    """,
    "cumulative_value_per_user": """
        SELECT event_id, user_id,
               round(sum(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) * 100) / 100
                 AS cum_value
        FROM events
    """,
    "median_value_by_type": """
        SELECT event_type,
               round(quantile_cont(value, 0.5) * 100) / 100 AS median_value
        FROM events GROUP BY event_type
    """,
    "value_quantiles_by_type": """
        SELECT event_type,
               round(quantile_cont(value, 0.25) * 100) / 100 AS p25,
               round(quantile_cont(value, 0.50) * 100) / 100 AS p50,
               round(quantile_cont(value, 0.75) * 100) / 100 AS p75,
               round(quantile_cont(value, 0.90) * 100) / 100 AS p90
        FROM events GROUP BY event_type
    """,
    "event_type_pivot": """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS n_click,
               count(*) FILTER (WHERE event_type = 'view')     AS n_view,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               count(*) FILTER (WHERE event_type = 'error')    AS n_error
        FROM events GROUP BY user_id
    """,
    "embedding_scores": None,  # filled below with the literal weight vector
    "doc_token_stats": f"""
        SELECT doc_id,
               {_TOKEN_SQL} AS n_tokens,
               length(text) AS n_chars_computed,
               {_PUNCT_SQL} AS n_punct,
               {_STOP_SQL} AS n_stop,
               {_QUALITY_SQL} AS quality
        FROM documents
    """,
    "lang_id": f"""
        SELECT doc_id, {_LANG_CASE} AS lang_pred FROM documents
    """,
    "doc_bpeish_tokens": """
        SELECT doc_id,
               length(regexp_extract_all(text,
                   ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+')) AS n_bpeish
        FROM documents
    """,
    "dedup_exact_docs": """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    # Near-dup dedup oracle: prefix blocking + exact trigram Jaccard +
    # recursive-CTE transitive closure; survivor = component minimum.
    # Must stay in lock-step with stages/dedup.jaccard_dedup /
    # _token_trigram_set.
    "jaccard_dedup_docs": """
        WITH RECURSIVE d AS (
          SELECT doc_id,
                 regexp_extract_all(text, '[A-Za-z0-9]+') AS toks,
                 substr(text, 1, 24) AS blk
          FROM documents
        ), s AS (
          SELECT doc_id, blk,
                 CASE WHEN len(toks) >= 3
                      THEN list_distinct(list_transform(
                             generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                      ELSE [array_to_string(toks, ' ')] END AS tri
          FROM d
        ), pairs AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib
          FROM s a JOIN s b ON a.blk = b.blk AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.tri, b.tri))::DOUBLE
                / len(list_distinct(a.tri || b.tri)) >= 0.8
        ), sym AS (
          SELECT ia AS a, ib AS b FROM pairs
          UNION ALL SELECT ib, ia FROM pairs
        ), reach(a, b) AS (
          SELECT a, b FROM sym
          UNION
          SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
          WHERE e.b != r.a
        )
        SELECT doc_id FROM d
        WHERE NOT EXISTS (
          SELECT 1 FROM reach WHERE reach.a = d.doc_id AND reach.b < d.doc_id)
    """,
    # Flagship CDC lake state: the WAL is DERIVED from `events`
    # (sources/synthetic.derive_wal_from_events), so the committed lake
    # equals a window LWW over events; text is the tag-free html string
    # (byte-identical extraction invariant, checked by hash).
    "cdc_lake_state": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
    """,
    # The storage backend is invisible to logical state: the objstore
    # flagship shares cdc_lake_state's window-LWW oracle verbatim.
    # Metadata-only DDL: the rename is pure SQL aliasing of the SAME
    # window-LWW state (event_type AS language), the added column is
    # NULL for every row (no writer ever populated it), the dropped
    # scratch column never appears. Identical row set to cdc_lake_state
    # — an alter invents and loses nothing.
    "cdc_schema_evolution": """
        SELECT url, warc_ts, seq, text, language,
               CAST(NULL AS DOUBLE) AS quality
        FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS language,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
    """,
    # Merge-on-read layout of the same logical table: identical oracle
    # (CoW and MOR must be observationally indistinguishable).
    "cdc_lake_state_mor": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
    """,
    # Write-audit-publish: main ingests half the WAL, a branch tails
    # the rest, publish fast-forwards — the published lake must equal
    # the SAME full-WAL window LWW (fork/publish invent nothing).
    "cdc_wap_publish": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
    """,
    # Three-way branch merge: both sides advanced; LWW commutativity
    # means the merged lake equals the full-WAL window LWW.
    "cdc_merge_branch": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
    """,
    # Bloom-index lookup: live winner rows of the user_id%50==7 cohort
    # — the probe set is each such user's LWW-winner event id, so the
    # filter "seq IN (winner ids)" lands exactly on the cohort's live
    # rows (deleted winners are tombstones, filtered on both sides).
    "lake_bloom_lookup": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 user_id % 50 AS cohort,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del AND cohort = 7
    """,
    # Predicate DML DELETE: the window-LWW state minus the matched
    # rows (an ordinary new version — history keeps the old rows).
    "cdc_delete_where": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del AND lang <> 'purchase'
    """,
    # Predicate DML UPDATE: matched rows re-emit with the SET column
    # replaced at a bumped (warc_ts, seq + 1) LWW version.
    "cdc_update_where": """
        SELECT url, warc_ts,
               seq + (CASE WHEN lang = 'view' THEN 1 ELSE 0 END) AS seq,
               text,
               CASE WHEN lang = 'view' THEN 'seen' ELSE lang END AS lang
        FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
    """,
    # Right-to-be-forgotten purge: the full-WAL window LWW minus the
    # purged cohort (user_id % 10 == 3) — the scrub removes exactly
    # the cohort and touches nothing else.
    "cdc_purge": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 user_id % 10 AS cohort,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del AND cohort <> 3
    """,
    # History-rewrite half of the purge: time travel to the pre-purge
    # snapshot (first 4 of 8 segments == first half of event_id order)
    # must ALSO miss the purged cohort — the old snapshot's files were
    # scrubbed in place.
    "cdc_purge_history": """
        WITH ranked AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (ORDER BY event_id) AS rk,
                 count(*) OVER () AS n
          FROM events
        )
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 user_id % 10 AS cohort,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM ranked WHERE rk <= 4 * ceil(n / 8.0))
        WHERE rn = 1 AND NOT is_del AND cohort <> 3
    """,
    # Constrained lake reads: the SAME window-LWW state, with the read
    # predicate as the WHERE — the engine side goes through the scan
    # planner (url hash routing / manifest zone maps) and must land on
    # identical rows.
    "lake_point_lookup": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
          AND url = 'https://u7.example/page'
    """,
    "lake_time_slice": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
          AND warc_ts >= TIMESTAMP '2024-01-16 00:00:00'
    """,
    # Change feed between lake v1 (first 4 of 8 derived segments =
    # first ceil(n/8)*4 events in event_id order) and v2 (all events):
    # two window-LWW states LEFT-joined on the key, classified
    # insert/update/delete; delete rows carry the winning tombstone's
    # warc_ts/seq and NULL text (exactly what the lake stores).
    "cdc_change_feed": """
        WITH ranked AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (ORDER BY event_id) AS rk,
                 count(*) OVER () AS n
          FROM events
        ), old_state AS (
          SELECT user_id, ts, event_id, event_type, is_del FROM (
            SELECT user_id, ts, event_id, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked WHERE rk <= 4 * ceil(n / 8.0)) WHERE rn = 1
        ), new_state AS (
          SELECT user_id, ts, event_id, event_type, is_del FROM (
            SELECT user_id, ts, event_id, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked) WHERE rn = 1
        )
        SELECT 'https://u' || CAST(w.user_id AS VARCHAR) || '.example/page' AS url,
               CASE WHEN NOT w.is_del AND (o.user_id IS NULL OR o.is_del)
                      THEN 'insert'
                    WHEN NOT w.is_del THEN 'update'
                    ELSE 'delete' END AS change_op,
               w.ts AS warc_ts, w.event_id AS seq,
               CASE WHEN NOT w.is_del
                      THEN 'page u' || CAST(w.user_id AS VARCHAR)
                           || ' rev ' || CAST(w.event_id AS VARCHAR)
               END AS text,
               w.event_type AS lang
        FROM new_state w LEFT JOIN old_state o ON w.user_id = o.user_id
        WHERE (NOT w.is_del AND (o.user_id IS NULL OR o.is_del))
           OR (NOT w.is_del AND o.user_id IS NOT NULL AND NOT o.is_del
               AND (w.ts <> o.ts OR w.event_id <> o.event_id))
           OR (w.is_del AND o.user_id IS NOT NULL AND NOT o.is_del)
    """,
    # SCD2 history over the same two committed states: v1 live rows
    # open intervals that the v1->v2 feed closes (update AND delete
    # both close; only non-deletes open a v2 interval). valid_to NULL
    # = current.
    "scd2_history": """
        WITH ranked AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (ORDER BY event_id) AS rk,
                 count(*) OVER () AS n
          FROM events
        ), old_state AS (
          SELECT user_id, ts, event_id, event_type, is_del FROM (
            SELECT user_id, ts, event_id, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked WHERE rk <= 4 * ceil(n / 8.0)) WHERE rn = 1
        ), new_state AS (
          SELECT user_id, ts, event_id, event_type, is_del FROM (
            SELECT user_id, ts, event_id, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked) WHERE rn = 1
        ), feed AS (
          SELECT w.user_id, w.ts, w.event_id, w.event_type, w.is_del
          FROM new_state w LEFT JOIN old_state o ON w.user_id = o.user_id
          WHERE (NOT w.is_del AND (o.user_id IS NULL OR o.is_del))
             OR (NOT w.is_del AND o.user_id IS NOT NULL AND NOT o.is_del
                 AND (w.ts <> o.ts OR w.event_id <> o.event_id))
             OR (w.is_del AND o.user_id IS NOT NULL AND NOT o.is_del)
        )
        SELECT 'https://u' || CAST(user_id AS VARCHAR)
                 || '.example/page' AS url,
               warc_ts, seq,
               'page u' || CAST(user_id AS VARCHAR) || ' rev '
                 || CAST(seq AS VARCHAR) AS text,
               lang, valid_from, valid_to
        FROM (
          SELECT o.user_id AS user_id, o.ts AS warc_ts,
                 o.event_id AS seq, o.event_type AS lang,
                 CAST(1 AS BIGINT) AS valid_from,
                 CASE WHEN f.user_id IS NOT NULL
                      THEN CAST(2 AS BIGINT) END AS valid_to
          FROM old_state o LEFT JOIN feed f ON o.user_id = f.user_id
          WHERE NOT o.is_del
          UNION ALL
          SELECT f.user_id, f.ts, f.event_id, f.event_type,
                 CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
          FROM feed f WHERE NOT f.is_del
        )
    """,
    # Restore feed (v2 -> restored v3 == v1): the change-feed SQL with
    # the LWW states ROLE-SWAPPED — old = all events, new = first half.
    # Urls born in the second half have NO first-half row at all ->
    # delete with NULL identity/payload (the engine's live->ABSENT
    # case); rolled-back deletes whose v1 winner is a tombstone carry
    # that tombstone's identity.
    "cdc_restore_feed": """
        WITH ranked AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (ORDER BY event_id) AS rk,
                 count(*) OVER () AS n
          FROM events
        ), new_state AS (
          SELECT user_id, ts, event_id, event_type, is_del FROM (
            SELECT user_id, ts, event_id, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked WHERE rk <= 4 * ceil(n / 8.0)) WHERE rn = 1
        ), old_state AS (
          SELECT user_id, ts, event_id, event_type, is_del FROM (
            SELECT user_id, ts, event_id, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked) WHERE rn = 1
        )
        SELECT 'https://u' || CAST(o.user_id AS VARCHAR)
                 || '.example/page' AS url,
               CASE WHEN w.user_id IS NOT NULL AND NOT w.is_del
                         AND o.is_del THEN 'insert'
                    WHEN w.user_id IS NOT NULL AND NOT w.is_del
                         THEN 'update'
                    ELSE 'delete' END AS change_op,
               CASE WHEN w.user_id IS NOT NULL THEN w.ts END AS warc_ts,
               CASE WHEN w.user_id IS NOT NULL THEN w.event_id END AS seq,
               CASE WHEN w.user_id IS NOT NULL AND NOT w.is_del
                      THEN 'page u' || CAST(w.user_id AS VARCHAR)
                           || ' rev ' || CAST(w.event_id AS VARCHAR)
               END AS text,
               CASE WHEN w.user_id IS NOT NULL
                      THEN w.event_type END AS lang
        FROM old_state o LEFT JOIN new_state w ON o.user_id = w.user_id
        WHERE (w.user_id IS NULL AND NOT o.is_del)
           OR (w.user_id IS NOT NULL AND NOT w.is_del AND o.is_del)
           OR (w.user_id IS NOT NULL AND NOT w.is_del AND NOT o.is_del
               AND (w.ts <> o.ts OR w.event_id <> o.event_id))
           OR (w.user_id IS NOT NULL AND w.is_del AND NOT o.is_del)
    """,
    # Incremental materialized view: final live-row count per lang ==
    # a from-scratch recount of the LWW-live state (the Ray side
    # produced it by signed-feed refresh, which must land on the same
    # numbers).
    "incremental_lang_counts": """
        SELECT lang, count(*) AS n FROM (
          SELECT event_type AS lang FROM (
            SELECT event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1 AND NOT is_del)
        GROUP BY lang
    """,
    # Group-valued change feed: the page-feed classification (two
    # window-LWW states LEFT-joined) cross-joined with the entity
    # fan-out literals; deletes are a single NULL-entity tombstone row.
    "entity_change_feed": """
        WITH ranked AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (ORDER BY event_id) AS rk,
                 count(*) OVER () AS n
          FROM events
        ), old_state AS (
          SELECT user_id, ts, event_id, is_del FROM (
            SELECT user_id, ts, event_id,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked WHERE rk <= 4 * ceil(n / 8.0)) WHERE rn = 1
        ), new_state AS (
          SELECT user_id, ts, event_id, is_del FROM (
            SELECT user_id, ts, event_id,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked) WHERE rn = 1
        ), changed AS (
          SELECT w.user_id, w.ts, w.event_id, w.is_del,
                 CASE WHEN NOT w.is_del AND (o.user_id IS NULL OR o.is_del)
                        THEN 'insert'
                      WHEN NOT w.is_del THEN 'update'
                      ELSE 'delete' END AS change_op
          FROM new_state w LEFT JOIN old_state o ON w.user_id = o.user_id
          WHERE (NOT w.is_del AND (o.user_id IS NULL OR o.is_del))
             OR (NOT w.is_del AND o.user_id IS NOT NULL AND NOT o.is_del
                 AND (w.ts <> o.ts OR w.event_id <> o.event_id))
             OR (w.is_del AND o.user_id IS NOT NULL AND NOT o.is_del)
        ), base AS (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 change_op, ts AS warc_ts, event_id AS seq,
                 user_id, event_id
          FROM changed WHERE NOT is_del
        )
        SELECT url, change_op, warc_ts, seq, 'page' AS entity_type,
               'T' || CAST(user_id AS VARCHAR) AS title,
               NULL::VARCHAR AS href, NULL::VARCHAR AS anchor,
               NULL::INTEGER AS link_index, NULL::INTEGER AS level,
               NULL::VARCHAR AS text
        FROM base
        UNION ALL
        SELECT url, change_op, warc_ts, seq, 'heading', NULL, NULL,
               NULL, NULL, CAST(1 AS INTEGER),
               'H' || CAST(event_id AS VARCHAR)
        FROM base
        UNION ALL
        SELECT url, change_op, warc_ts, seq, 'link', NULL,
               'https://l' || CAST(event_id AS VARCHAR) || '.example/',
               'A' || CAST(event_id AS VARCHAR),
               CAST(0 AS INTEGER), NULL, NULL
        FROM base
        UNION ALL
        SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page',
               'delete', ts, event_id, NULL, NULL, NULL, NULL,
               NULL::INTEGER, NULL::INTEGER, NULL
        FROM changed WHERE is_del
    """,
    # Generalized incremental view: count + summed live text length per
    # lang == a from-scratch recount over the LWW-live state (the Ray
    # side maintained it by ±len retraction arithmetic off the feed).
    "incremental_lang_stats": """
        SELECT lang, count(*) AS n,
               CAST(sum(length(text)) AS BIGINT) AS chars
        FROM (
          SELECT event_type AS lang,
                 'page u' || CAST(user_id AS VARCHAR)
                 || ' rev ' || CAST(event_id AS VARCHAR) AS text
          FROM (
            SELECT user_id, event_id, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1 AND NOT is_del)
        GROUP BY lang
    """,
    # Composite-key view: counts per (lang, winning event's WAL segment)
    # — the segment index is the winner's event_id rank bucketed by
    # ceil(n/8), mirroring derive_wal_from_events' slicing.
    "incremental_lang_segment_counts": """
        WITH ranked AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (ORDER BY event_id) AS rk,
                 count(*) OVER () AS total
          FROM events
        ), win AS (
          SELECT event_type AS lang, rk, total FROM (
            SELECT event_type, rk, total,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked) WHERE rn = 1 AND NOT is_del
        )
        SELECT lang,
               'segment-' || lpad(CAST(CAST(
                   floor((rk - 1) / ceil(total / 8.0)) AS BIGINT
               ) AS VARCHAR), 5, '0') || '.parquet' AS _src_segment,
               count(*) AS n
        FROM win
        GROUP BY 1, 2
    """,
    # Non-invertible distinct view: winners' distinct segment buckets
    # per lang, recomputed from scratch (the Ray side maintained it by
    # affected-key recompute off the pre-image feed).
    "incremental_lang_distinct_segments": """
        WITH ranked AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (ORDER BY event_id) AS rk,
                 count(*) OVER () AS total
          FROM events
        ), win AS (
          SELECT event_type AS lang, rk, total FROM (
            SELECT event_type, rk, total,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ranked) WHERE rn = 1 AND NOT is_del
        )
        SELECT lang,
               count(DISTINCT CAST(
                   floor((rk - 1) / ceil(total / 8.0)) AS BIGINT
               )) AS n_distinct__src_segment
        FROM win
        GROUP BY lang
    """,
    # Filtered replica: the final replica == the LWW-live state
    # restricted to lang='purchase' (the Ray side converged to it by
    # applying two change-feed deltas, never rescanning the source).
    "replica_purchase_pages": """
        SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
               ts AS warc_ts, event_id AS seq,
               'page u' || CAST(user_id AS VARCHAR)
               || ' rev ' || CAST(event_id AS VARCHAR) AS text,
               event_type AS lang
        FROM (
          SELECT user_id, ts, event_id, event_type,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del AND event_type = 'purchase'
    """,
    # Entity-lake CDC: each winning event fans out to page/heading/link
    # entity rows whose values are literals of the event row.
    "cdc_entity_lake": """
        WITH live AS (
          SELECT user_id, event_id, ts FROM (
            SELECT user_id, event_id, ts,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
          WHERE rn = 1 AND NOT is_del
        ), base AS (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq, user_id, event_id
          FROM live
        )
        SELECT url, warc_ts, seq, 'page' AS entity_type,
               'T' || CAST(user_id AS VARCHAR) AS title,
               NULL::VARCHAR AS href, NULL::VARCHAR AS anchor,
               NULL::INTEGER AS link_index, NULL::INTEGER AS level,
               NULL::VARCHAR AS text
        FROM base
        UNION ALL
        SELECT url, warc_ts, seq, 'heading', NULL, NULL, NULL, NULL,
               CAST(1 AS INTEGER), 'H' || CAST(event_id AS VARCHAR)
        FROM base
        UNION ALL
        SELECT url, warc_ts, seq, 'link', NULL,
               'https://l' || CAST(event_id AS VARCHAR) || '.example/',
               'A' || CAST(event_id AS VARCHAR),
               CAST(0 AS INTEGER), NULL, NULL
        FROM base
    """,
    # Incrementally-maintained dedup index: the maintained (key ->
    # urls) state must equal a plain GROUP BY over the full-WAL
    # window-LWW live state with the same colliding-text derivation.
    "cdc_dedup_index": """
        WITH final AS (
          SELECT url, text FROM (
            SELECT 'https://u' || CAST(user_id AS VARCHAR)
                     || '.example/page' AS url,
                   'page rev ' || CAST(event_id % 7 AS VARCHAR) AS text,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                     AS rn
            FROM events)
          WHERE rn = 1 AND NOT is_del)
        SELECT text AS key, CAST(count(*) AS BIGINT) AS n_urls,
               min(url) AS min_url
        FROM final GROUP BY text HAVING count(*) >= 2
    """,
    # SimHash index clusters: the 7 colliding texts are >= 7 Hamming
    # apart, so max_hamming=3 clusters == identical-text groups — each
    # live url in a >=2 group, tagged with its group's min url.
    "cdc_simhash_index": """
        WITH final AS (
          SELECT url, text FROM (
            SELECT 'https://u' || CAST(user_id AS VARCHAR)
                     || '.example/page' AS url,
                   'page rev ' || CAST(event_id % 7 AS VARCHAR) AS text,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                     AS rn
            FROM events)
          WHERE rn = 1 AND NOT is_del),
        g AS (SELECT text, count(*) AS c, min(url) AS m
              FROM final GROUP BY text)
        SELECT f.url AS url, g.m AS min_url
        FROM final f JOIN g USING (text)
        WHERE g.c >= 2
    """,
    # Multi-WAL fan-in: two parity-sharded WALs interleave-ingested
    # under per-source watermarks must land on the SAME window-LWW
    # state as one WAL over all events — the cdc_lake_state SQL.
    "cdc_multi_source": """
        SELECT url, warc_ts, seq, text, lang FROM (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq,
                 'page u' || CAST(user_id AS VARCHAR) || ' rev '
                   || CAST(event_id AS VARCHAR) AS text,
                 event_type AS lang,
                 (event_type = 'error') AS is_del,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND NOT is_del
    """,
    # Canonical corpus: window-LWW live state restricted to each
    # text group's min url (unique texts keep their only row).
    "cdc_canonical_corpus": """
        WITH final AS (
          SELECT url, warc_ts, seq, text, lang FROM (
            SELECT 'https://u' || CAST(user_id AS VARCHAR)
                     || '.example/page' AS url,
                   ts AS warc_ts, event_id AS seq,
                   'page rev ' || CAST(event_id % 7 AS VARCHAR) AS text,
                   event_type AS lang,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                     AS rn
            FROM events)
          WHERE rn = 1 AND NOT is_del),
        g AS (SELECT text, min(url) AS m FROM final GROUP BY text)
        SELECT f.url, f.warc_ts, f.seq, f.text, f.lang
        FROM final f JOIN g ON f.text = g.text AND f.url = g.m
    """,
    # Cross-table catalog: the pinned page state is the same window
    # LWW, and the pinned entity lake holds exactly the page/heading/
    # link triple per live url (the cdc_entity_lake fan-out grouped
    # by url) — both read through ONE catalog document.
    "cdc_catalog": """
        WITH live AS (
          SELECT user_id, event_id, ts, event_type FROM (
            SELECT user_id, event_id, ts, event_type,
                   (event_type = 'error') AS is_del,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
          WHERE rn = 1 AND NOT is_del
        ), base AS (
          SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example/page' AS url,
                 ts AS warc_ts, event_id AS seq, event_type AS lang
          FROM live
        ), ents AS (
          SELECT url FROM base          -- page entity
          UNION ALL SELECT url FROM base  -- heading entity
          UNION ALL SELECT url FROM base  -- link entity
        )
        SELECT b.url, b.warc_ts, b.seq, b.lang, c.n_entities
        FROM base b
        JOIN (SELECT url, COUNT(*) AS n_entities FROM ents GROUP BY url) c
          USING (url)
    """,
    # Entity fan-out: pages built from doc_id with literal-valued
    # entities; lateral generate_series reproduces the fan-out.
    "page_entities": """
        WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 2000)
        SELECT 'page' AS entity_type,
               'https://site-' || CAST(doc_id AS VARCHAR) || '.example/p' AS url,
               'T' || CAST(doc_id AS VARCHAR) AS title,
               NULL::VARCHAR AS href, NULL::VARCHAR AS anchor,
               NULL::INTEGER AS link_index, NULL::INTEGER AS level,
               NULL::VARCHAR AS text
        FROM ids
        UNION ALL
        SELECT 'heading',
               'https://site-' || CAST(doc_id AS VARCHAR) || '.example/p',
               NULL, NULL, NULL, NULL, CAST(j + 1 AS INTEGER),
               'H' || CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR)
        FROM (SELECT doc_id, unnest(generate_series(0, doc_id % 2)) AS j
              FROM ids)
        UNION ALL
        SELECT 'link',
               'https://site-' || CAST(doc_id AS VARCHAR) || '.example/p',
               NULL,
               'https://d' || CAST(doc_id AS VARCHAR) || '-'
                 || CAST(j AS VARCHAR) || '.example/',
               'A' || CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR)
                 || ' & co',
               CAST(j AS INTEGER), NULL, NULL
        FROM (SELECT doc_id, unnest(generate_series(0, doc_id % 3)) AS j
              FROM ids)
    """,
    # Multimodal decode: fake-payload header dims are a pure function
    # of media_id == doc_id.
    "multimodal_decode": """
        SELECT doc_id AS media_id,
               'https://site-' || CAST(doc_id AS VARCHAR)
                 || '.example/img.png' AS url,
               'image' AS kind, 'image/png' AS content_type,
               CAST(64 + doc_id % 100 AS INTEGER) AS width,
               CAST(48 + doc_id % 50 AS INTEGER) AS height,
               CAST(3 AS INTEGER) AS channels
        FROM documents WHERE doc_id < 2000
    """,
    # Rolling polynomial hash over tokens, mod 2^61-1 — expressible via
    # DuckDB list_reduce with HUGEINT intermediates (tokens are ASCII by
    # the [A-Za-z0-9]+ definition, so unicode(char) == utf-8 byte).
    # Lock-step with functions/textstats.fingerprint_text.
    "doc_fingerprint": """
        SELECT doc_id,
               CAST(list_reduce(
                 list_prepend(0::HUGEINT, list_transform(
                   regexp_extract_all(text, '[A-Za-z0-9]+'),
                   t -> (list_reduce(
                           list_prepend(0::HUGEINT, list_transform(
                             split(t, ''), c -> unicode(c)::HUGEINT)),
                           (h, c) -> (h * 31 + c) % 2305843009213693951)
                         + 1))),
                 (h, t) -> (h * 1000003 + t) % 2305843009213693951)
               AS BIGINT) AS fingerprint
        FROM documents
    """,
    "ann_topk": """
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS e FROM embeddings
          WHERE vec_id IN (0, 1, 2)
        ), scored AS (
          -- cast to DOUBLE[] so DuckDB computes cosine in float64 like
          -- the numpy side (float32 kernels differ in the 7th decimal)
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(CAST(q.e AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[]))
                       * 1000000) / 1000000 AS cosine
          FROM q CROSS JOIN embeddings c
        ), ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
    "curate_filter": f"""
        SELECT doc_id, quality, lang_pred FROM (
          SELECT doc_id,
                 round( (least({_TOKEN_SQL}, 200) / 200.0 * 0.5
                       + {_STOP_SQL} * 1.0 / greatest({_TOKEN_SQL}, 1) * 0.3
                       + (1 - {_PUNCT_SQL} * 1.0 / greatest(length(text), 1)) * 0.2)
                       * 10000) / 10000 AS quality,
                 {_LANG_CASE} AS lang_pred
          FROM documents)
        WHERE quality >= 0.3 AND lang_pred IN ('en', 'de', 'fr', 'es')
    """,
    # Whole curation pipeline in one statement: quality/lang filter +
    # exact dedup (group min) + prefix-blocked trigram-Jaccard near-dup
    # with recursive-CTE transitive closure. Lock-step with
    # pipelines/curate.curate_exact.
    "curate_corpus_exact": f"""
        WITH RECURSIVE ann AS (
          SELECT doc_id, text,
                 round( (least({_TOKEN_SQL}, 200) / 200.0 * 0.5
                       + {_STOP_SQL} * 1.0 / greatest({_TOKEN_SQL}, 1) * 0.3
                       + (1 - {_PUNCT_SQL} * 1.0 / greatest(length(text), 1)) * 0.2)
                       * 10000) / 10000 AS q,
                 {_LANG_CASE} AS lp
          FROM documents
        ), filtered AS (
          SELECT doc_id, text FROM ann
          WHERE q >= 0.3 AND lp IN ('en', 'de', 'fr', 'es')
        ), ex AS (
          SELECT min(doc_id) AS doc_id FROM filtered GROUP BY text
        ), d AS (
          SELECT f.doc_id,
                 regexp_extract_all(f.text, '[A-Za-z0-9]+') AS toks,
                 substr(f.text, 1, 24) AS blk
          FROM filtered f JOIN ex USING (doc_id)
        ), s AS (
          SELECT doc_id, blk,
                 CASE WHEN len(toks) >= 3
                      THEN list_distinct(list_transform(
                             generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                      ELSE [array_to_string(toks, ' ')] END AS tri
          FROM d
        ), pairs AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib
          FROM s a JOIN s b ON a.blk = b.blk AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.tri, b.tri))::DOUBLE
                / len(list_distinct(a.tri || b.tri)) >= 0.8
        ), sym AS (
          SELECT ia AS a, ib AS b FROM pairs
          UNION ALL SELECT ib, ia FROM pairs
        ), reach(a, b) AS (
          SELECT a, b FROM sym
          UNION
          SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
          WHERE e.b != r.a
        )
        SELECT doc_id FROM d
        WHERE NOT EXISTS (
          SELECT 1 FROM reach WHERE reach.a = d.doc_id AND reach.b < d.doc_id)
    """,
    # rows-only (non-SQL-expressible — probabilistic LSH / IVF):
    # minhash_dedup_docs, simhash_dedup_docs, embedding_dedup,
    # ann_topk_ivf, curate_corpus
}

# The scoring oracle embeds the deterministic weight vector as a SQL
# literal (same seed as the Ray side).
_W_LITERAL = "[" + ", ".join(f"{w:.4f}" for w in _score_weights()) + "]"
ORACLE_SQL["embedding_scores"] = f"""
    SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST({_W_LITERAL} AS DOUBLE[]))
                 * 1000000) / 1000000 AS score
    FROM embeddings
    ORDER BY score DESC, vec_id LIMIT 50
"""

ORACLE_SQL["rollup_doc_counts"] = """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY ROLLUP(lang, source)
"""

ORACLE_SQL["funnel_signup_purchase"] = """
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase_ts
    FROM s JOIN events e
      ON e.user_id = s.user_id
     AND e.event_type = 'purchase' AND e.ts > s.signup_ts
    GROUP BY s.user_id, s.signup_ts
"""

ORACLE_SQL["orders_left_join_recent_revenue"] = """
    -- per-term snap to the exact 1e-4 grid before summing, then
    -- INTEGER half-up to cents (matches the engine bit for bit:
    -- integer sums are order-independent and the final rounding never
    -- touches a float)
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(FLOOR((SUM(CAST(ROUND(
               l.l_extendedprice * (1 - l.l_discount) * 10000
           ) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0
               AS recent_revenue
    FROM orders o LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderpriority
"""

# identical result contract to decontaminate_ngrams: the bloom is a
# prefilter, the semi-join restores exactness — same NOT EXISTS oracle.
ORACLE_SQL["decontaminate_bloom"] = ORACLE_SQL["decontaminate_ngrams"]
ORACLE_SQL["cdc_lake_state_objstore"] = ORACLE_SQL["cdc_lake_state"]

ORACLE_SQL["distinct_sources_by_lang"] = """
    SELECT lang,
           string_agg(source, ',' ORDER BY source) AS sources,
           count(*) AS n_sources
    FROM (SELECT DISTINCT lang, source FROM documents)
    GROUP BY lang
"""

ORACLE_SQL["bigram_counts"] = """
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      FROM documents
    ), pairs AS (
      -- two unnests in one SELECT zip positionally in DuckDB
      SELECT unnest(tk[1:len(tk) - 1]) AS a,
             unnest(tk[2:len(tk)]) AS b
      FROM toks
    )
    SELECT a || ' ' || b AS bigram, count(*) AS n
    FROM pairs GROUP BY 1 HAVING count(*) >= 5
"""

ORACLE_SQL["value_moments_by_type"] = """
    SELECT event_type, count(*) AS n,
           round(avg(value), 4) AS mean_value,
           round(stddev_samp(value), 4) AS std_value
    FROM events GROUP BY event_type
"""

ORACLE_SQL["contamination_pairs"] = f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, array_to_string(tk[i:i+{_DECON_NGRAM - 1}], ' ') AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(tk) - {_DECON_NGRAM - 1}, 0)))
             AS g(i)
    ),
    bench AS (
      SELECT DISTINCT doc_id, gram FROM grams
      WHERE doc_id < {_DECON_BENCH_SQL}
    ),
    train AS (
      SELECT DISTINCT doc_id, gram FROM grams
      WHERE doc_id >= {_DECON_BENCH_SQL}
    )
    SELECT DISTINCT t.doc_id AS train_doc_id, b.doc_id AS bench_doc_id
    FROM train t JOIN bench b USING (gram)
"""

ORACLE_SQL["doc_length_histogram"] = f"""
    SELECT n_chars // {_LEN_BIN} AS bin, count(*) AS n
    FROM documents GROUP BY 1
"""

ORACLE_SQL["profile_documents"] = """
    SELECT 'lang' AS col, count(*) AS n,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS nulls,
           count(DISTINCT lang) AS n_distinct,
           CAST(min(lang) AS VARCHAR) AS min_s,
           CAST(max(lang) AS VARCHAR) AS max_s
    FROM documents
    UNION ALL
    SELECT 'source', count(*),
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT source),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*),
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
"""

ORACLE_SQL["moving_avg_value_per_user"] = """
    -- per-term snap to the 1e-4 grid -> INTEGER window sum (order-
    -- independent) -> IEEE-exact divisions: hash-stable, no epsilon
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) OVER w AS DOUBLE)
             / (COUNT(*) OVER w) / 10000.0 AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""

ORACLE_SQL["next_event_gap"] = """
    SELECT event_id, user_id,
           date_diff('microsecond', ts,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) AS gap_us
    FROM events
"""

ORACLE_SQL["event_transitions"] = """
    SELECT prev_type, next_type, count(*) AS n FROM (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type AS next_type
      FROM events)
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
"""

ORACLE_SQL["debounce_events"] = """
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events)
    WHERE gap_us IS NULL OR gap_us >= 60000000
"""

ORACLE_SQL["purchase_attribution"] = """
    SELECT event_id, user_id, ts, last_view_ts FROM (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_ts
      FROM events WHERE event_type IN ('view', 'purchase'))
    WHERE event_type = 'purchase'
"""

ORACLE_SQL["events_above_type_p90"] = """
    SELECT event_id, event_type, value FROM (
      SELECT event_id, event_type, value,
             quantile_cont(value, 0.9)
               OVER (PARTITION BY event_type) AS p90
      FROM events) WHERE value > p90
"""

ORACLE_SQL["mode_event_type_per_user"] = """
    SELECT user_id, mode_type, n FROM (
      SELECT user_id, event_type AS mode_type, count(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type ASC)
               AS rn
      FROM events GROUP BY user_id, event_type) WHERE rn = 1
"""

ORACLE_SQL["doc_repetition_stats"] = """
    -- integer-exact Gopher-style repetition gate; the two unnests in
    -- bg zip positionally (same idiom as bigram_counts)
    WITH tk AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), wc AS (
      SELECT doc_id, w, count(*) AS c FROM tk GROUP BY 1, 2
    ), wagg AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(max(c) AS BIGINT) AS top_word_count
      FROM wc GROUP BY 1
    ), arr AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS a
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(a[1:len(a) - 1]) || ' ' || unnest(a[2:len(a)]) AS b
      FROM arr
    ), bstat AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(count(DISTINCT b) AS BIGINT) AS nd
      FROM bg GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(n_tokens, 0) AS n_tokens,
           coalesce(top_word_count, 0) AS top_word_count,
           coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(n_bigrams - nd, 0) AS dup_bigram_count,
           (coalesce(top_word_count, 0) * 10 <= coalesce(n_tokens, 0) * 3
            AND coalesce(n_bigrams - nd, 0) * 10
                <= coalesce(n_bigrams, 0) * 2) AS rep_ok
    FROM documents d
    LEFT JOIN wagg USING (doc_id) LEFT JOIN bstat USING (doc_id)
"""

ORACLE_SQL["props_value_stats"] = """
    SELECT event_type, count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k, max(k) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
"""

ORACLE_SQL["rarest_term_per_doc"] = """
    WITH tk AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), df AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df FROM tk GROUP BY 1
    )
    SELECT doc_id, w AS term, df FROM (
      SELECT t.doc_id, t.w, d.df,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY d.df, t.w) AS rn
      FROM tk t JOIN df d USING (w)) WHERE rn = 1
"""

ORACLE_SQL["tfidf_top_terms"] = """
    -- score snapped to a 1e-4 integer grid on BOTH sides; ln(N/df) is
    -- the same libm log on the same doubles, and the grid absorbs any
    -- last-ulp drift before the DESC rank
    WITH tk AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tk GROUP BY 1, 2
    ), df AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w, tf.tf, df.df,
             CAST(round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000)
                  AS BIGINT) AS score_i
      FROM tf JOIN df USING (w) CROSS JOIN n
    )
    SELECT doc_id, w AS term, tf, df, score_i FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_i DESC, w) AS rn
      FROM scored) WHERE rn = 1
"""

ORACLE_SQL["term_postings"] = """
    WITH tk AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tk GROUP BY 1, 2
    ), ranked AS (
      SELECT w, doc_id,
             row_number() OVER (PARTITION BY w ORDER BY doc_id) AS rn
      FROM tf
    ), post AS (
      SELECT w, string_agg(CAST(doc_id AS VARCHAR), ','
                           ORDER BY doc_id) AS postings
      FROM ranked WHERE rn <= 5 GROUP BY w
    )
    SELECT tf.w AS term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf.tf) AS BIGINT) AS cf, any_value(post.postings) AS postings
    FROM tf JOIN post ON tf.w = post.w
    GROUP BY tf.w
"""

ORACLE_SQL["order_fulfillment_lag"] = """
    -- per-item floor (NOT floor-of-sum), integer day arithmetic,
    -- one IEEE division + half-up 4dp round — engine-identical
    WITH lag AS (
      SELECT o.o_orderpriority,
             (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
               // 86400000000 AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(days) AS DOUBLE) / count(*), 4) AS avg_lag_days,
           CAST(max(days) AS BIGINT) AS max_lag_days
    FROM lag GROUP BY 1
"""

ORACLE_SQL["gini_by_type"] = """
    -- x on the 1e-4 grid; A = sum(rank*x) is permutation-invariant
    -- across rank ties, so the bare ORDER BY value is deterministic
    -- for the metric even though tie ORDER is engine-arbitrary
    WITH gr AS (
      SELECT event_type, value,
             CAST(ROUND(value * 10000) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value) AS rk
      FROM events WHERE value IS NOT NULL
    ), agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             SUM(x) AS s, SUM(rk * x) AS a
      FROM gr GROUP BY 1
    )
    SELECT event_type, n,
           CASE WHEN s = 0 THEN NULL
                ELSE CAST(2 * a - (n + 1) * s AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
           END AS gini
    FROM agg
"""

ORACLE_SQL["term_cooccurrence_topk"] = """
    -- same deterministic per-doc cap (32 lexicographically-first
    -- distinct terms) as the engine; ties determinized by (ta, tb)
    WITH tk AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), cap AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, w,
               row_number() OVER (PARTITION BY doc_id ORDER BY w) AS rn
        FROM tk) WHERE rn <= 32
    ), pairs AS (
      SELECT a.w AS ta, b.w AS tb
      FROM cap a JOIN cap b
        ON a.doc_id = b.doc_id AND a.w < b.w
    )
    SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_docs
    FROM pairs GROUP BY 1, 2
    ORDER BY n_docs DESC, ta, tb LIMIT 20
"""

ORACLE_SQL["events_per_user_histogram"] = """
    SELECT n_events, CAST(count(*) AS BIGINT) AS n_users FROM (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1) GROUP BY 1
"""

ORACLE_SQL["local_supplier_revenue"] = """
    -- Q5 shape; same 1e-4 grid + integer half-up-to-cents arithmetic
    -- as the engine
    SELECT n.n_name,
           CAST(FLOOR((SUM(CAST(ROUND(
               l.l_extendedprice * (1 - l.l_discount) * 10000
           ) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
"""

ORACLE_SQL["top_terms_per_lang"] = """
    WITH tk AS (
      SELECT lang,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ), cnt AS (
      SELECT lang, w, CAST(count(*) AS BIGINT) AS tf
      FROM tk GROUP BY 1, 2
    )
    SELECT lang, w AS term, tf FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY tf DESC, w) AS rn
      FROM cnt) WHERE rn <= 3
"""

ORACLE_SQL["unshipped_orders_revenue"] = """
    -- Q3 shape; revenue snapped per-row to the 1e-4 grid, integer
    -- half-up to cents — identical arithmetic to the engine
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(FLOOR((SUM(CAST(ROUND(
               l.l_extendedprice * (1 - l.l_discount) * 10000
           ) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, o_orderkey LIMIT 10
"""

ORACLE_SQL["peak_concurrency_by_type"] = """
    -- sweep line over [ts, ts+300s) sessions; tie order pinned by
    -- (t, d) with -1 before +1 = end-exclusive intervals, identical to
    -- the engine's sort key, so peak and first-peak time are exact
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 300 SECOND, -1 FROM events
    ), run AS (
      SELECT event_type, t, d,
             sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS c
      FROM pts
    ), pk AS (
      SELECT event_type, CAST(max(c) AS BIGINT) AS peak
      FROM run GROUP BY 1
    )
    SELECT r.event_type, pk.peak, min(r.t) AS first_peak_ts
    FROM run r JOIN pk ON r.event_type = pk.event_type AND r.c = pk.peak
    GROUP BY r.event_type, pk.peak
"""

ORACLE_SQL["weighted_sample_docs"] = """
    -- priority (bottom-k) weighted sample: rank by hash/weight; IEEE
    -- double division is bit-exact on both sides (ln()/pow() is not)
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ((doc_id * 2654435761) % 4294967296) * 1.0 / n_chars AS k
      FROM documents WHERE n_chars > 0
      ORDER BY k ASC, doc_id ASC LIMIT 50)
"""

ORACLE_SQL["corr_value_props_by_type"] = """
    SELECT event_type, count(*) AS n,
           round(corr(value, length(props)), 4) AS corr_vp,
           round(covar_samp(value, length(props)), 4) AS covar_vp
    FROM events
    WHERE value IS NOT NULL AND props IS NOT NULL
    GROUP BY event_type
"""

ORACLE_SQL["lang_entropy_by_source"] = """
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    ), t AS (
      SELECT source, sum(n) AS tot, CAST(count(*) AS BIGINT) AS n_langs
      FROM c GROUP BY 1
    )
    SELECT t.source, t.n_langs,
           round(-sum((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 4)
             AS lang_entropy
    FROM c JOIN t ON c.source = t.source
    GROUP BY t.source, t.n_langs
"""

ORACLE_SQL["retention_cohorts"] = """
    WITH s AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), a AS (
      SELECT DISTINCT e.user_id, s.cohort_week,
             (date_diff('day', s.cohort_week,
                        date_trunc('week', e.ts)) // 7) AS week_offset
      FROM events e JOIN s USING (user_id)
      WHERE date_trunc('week', e.ts) >= s.cohort_week
    )
    SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
    FROM a GROUP BY 1, 2
"""

ORACLE_SQL["doc_lm_score"] = """
    -- Laplace-smoothed bigram LM self-scoring (floor 5 on both count
    -- tables = the engine's bounded-broadcast Zipf head)
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ), ucnt AS (
      SELECT tk, count(*) AS n
      FROM (SELECT unnest(w) AS tk FROM d)
      GROUP BY tk HAVING count(*) >= 5
    ), vocab AS (SELECT count(*) AS v FROM ucnt),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS bg
      FROM d
    ), bcnt AS (
      SELECT bg, count(*) AS n FROM big GROUP BY bg HAVING count(*) >= 5
    ), scored AS (
      SELECT b.doc_id,
             ln((coalesce(bc.n, 0) + 1.0)
                / (coalesce(uc.n, 0) + (SELECT v FROM vocab))) AS lp
      FROM big b
      LEFT JOIN bcnt bc ON bc.bg = b.bg
      LEFT JOIN ucnt uc ON uc.tk = split_part(b.bg, ' ', 1)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lp), 4) AS lm_score
    FROM scored GROUP BY doc_id
"""

ORACLE_SQL["regr_value_vs_time_by_type"] = """
    SELECT event_type, count(*) AS n,
           round(regr_slope(value,
             date_diff('microsecond', TIMESTAMP '2024-01-01', ts)
               / 1000000.0 / 86400.0), 4) AS slope_per_day,
           round(regr_intercept(value,
             date_diff('microsecond', TIMESTAMP '2024-01-01', ts)
               / 1000000.0 / 86400.0), 4) AS intercept
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
"""

ORACLE_SQL["users_signup_and_purchase"] = """
    SELECT user_id FROM events WHERE event_type = 'signup' AND value > 150
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
"""

ORACLE_SQL["users_view_no_purchase"] = """
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 150
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
"""

ORACLE_SQL["embedding_norm_stats_by_label"] = """
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           round(avg(sqrt(list_sum(list_transform(
             CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS mean_norm,
           round(max(sqrt(list_sum(list_transform(
             CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS max_norm
    FROM embeddings GROUP BY label
"""

ORACLE_SQL["change_feed_op_counts"] = (
    "SELECT change_op, CAST(count(*) AS BIGINT) AS n FROM ("
    + ORACLE_SQL["cdc_change_feed"]
    + ") GROUP BY change_op"
)

ORACLE_SQL["user_journeys"] = """
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT p.user_id, p.journey_prefix, c.n_steps FROM
      (SELECT user_id,
              string_agg(event_type, '>' ORDER BY rn) AS journey_prefix
       FROM ranked WHERE rn <= 8 GROUP BY user_id) p
    JOIN
      (SELECT user_id, count(*) AS n_steps FROM events GROUP BY user_id) c
    USING (user_id)
"""

ORACLE_SQL["hourly_signup_purchase"] = """
    SELECT COALESCE(s.hour, p.hour) AS hour,
           COALESCE(s.n_signups, 0) AS n_signups,
           COALESCE(p.n_purchases, 0) AS n_purchases
    FROM (SELECT date_trunc('hour', ts) AS hour, count(*) AS n_signups
          FROM events WHERE event_type = 'signup' GROUP BY 1) s
    FULL OUTER JOIN
         (SELECT date_trunc('hour', ts) AS hour, count(*) AS n_purchases
          FROM events WHERE event_type = 'purchase' GROUP BY 1) p
    ON s.hour = p.hour
"""

ORACLE_SQL["revenue_share_by_nation"] = """
    -- integer-cents total: order-independent sum, one IEEE division
    WITH rev AS (
      SELECT n_name,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
                  AS BIGINT) AS cents
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           round(CAST(cents AS DOUBLE)
                 / (SELECT CAST(sum(cents) AS DOUBLE) FROM rev)
                 * 1000000) / 1000000 AS revenue_share
    FROM rev
"""

ORACLE_SQL["region_top_nations"] = """
    SELECT r_name, n_name, n_customers, rnk FROM (
      SELECT r_name, n_name, count(*) AS n_customers,
             dense_rank() OVER (PARTITION BY r_name
                                ORDER BY count(*) DESC) AS rnk
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name) WHERE rnk <= 2
"""

ORACLE_SQL["rolling_hour_value_per_user"] = """
    -- 1e-4 grid snap -> INTEGER range-window sum (order-independent)
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) OVER w AS DOUBLE)
             / 10000.0 AS roll_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS roll_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""

ORACLE_SQL["value_ntile_by_type"] = """
    SELECT event_id, event_type,
           CAST(ntile(4) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS BIGINT) AS tile
    FROM events
"""

ORACLE_SQL["cube_doc_counts"] = """
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY CUBE (lang, source)
"""

ORACLE_SQL["brand_revenue"] = """
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)) * 100) / 100
             AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
"""

ORACLE_SQL["supplier_balance_by_nation"] = """
    -- 2-decimal money snaps exactly to bigint cents: integer sum,
    -- one IEEE output division — no float-sum rounding anywhere
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
"""

ORACLE_SQL["robust_stats_by_type"] = """
    -- MAD spelled as quantile_cont-of-abs-dev (NOT mad()) so both
    -- sides share the exact interpolation arithmetic
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, m.med, abs(e.value - m.med) AS d
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           round(max(d.med) * 100) / 100 AS median_value,
           round(max(a.mad) * 100) / 100 AS mad_value,
           CAST(sum(CASE WHEN d.d > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
"""

ORACLE_SQL["chunk_documents"] = """
    -- 1-based inclusive list slicing: toks[s : s+49] is 50 tokens
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks), 1), 40)) AS start
      FROM tk)
    SELECT doc_id, CAST((start - 1) / 40 AS BIGINT) AS chunk_idx,
           array_to_string(toks[start:start + 49], ' ') AS chunk_text
    FROM s
"""

ORACLE_SQL["minmax_scale_events"] = """
    SELECT event_id, event_type,
           round((value - mn) / (mx - mn) * 10000) / 10000 AS scaled
    FROM (SELECT event_id, event_type, value,
                 min(value) OVER (PARTITION BY event_type) AS mn,
                 max(value) OVER (PARTITION BY event_type) AS mx
          FROM events)
"""

ORACLE_SQL["dup_ngram_stats"] = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS tk
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS g(i)),
    df AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE d.df >= 2) AS BIGINT) AS n_dup
    FROM grams g JOIN df d USING (gram)
    GROUP BY g.doc_id
"""

ORACLE_SQL["exact_substring_dedup"] = f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS tk
      FROM documents),
    lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS total_tokens
             FROM toks),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(tk[i:i+{_ESD_N - 1}], ' ') AS gram
      FROM toks,
           unnest(generate_series(1, greatest(len(tk) - {_ESD_N} + 1, 0)))
             AS g(i)),
    dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
    hits AS (SELECT doc_id, pos FROM grams
             WHERE gram IN (SELECT gram FROM dup)),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= {_ESD_N}
                  THEN 0 ELSE 1 END AS brk
      FROM hits),
    isl AS (SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
            FROM marked),
    per_isl AS (SELECT doc_id, g, max(pos) + {_ESD_N} - min(pos) AS rem
                FROM isl GROUP BY 1, 2),
    per_doc AS (SELECT doc_id, CAST(sum(rem) AS BIGINT) AS removed_tokens,
                       CAST(count(*) AS BIGINT) AS dup_spans
                FROM per_isl GROUP BY 1)
    SELECT l.doc_id, l.total_tokens,
           coalesce(p.removed_tokens, 0) AS removed_tokens,
           l.total_tokens - coalesce(p.removed_tokens, 0) AS kept_tokens,
           coalesce(p.dup_spans, 0) AS dup_spans
    FROM lens l LEFT JOIN per_doc p USING (doc_id)
"""

ORACLE_SQL["winsorized_stats_by_type"] = """
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS lo,
             quantile_cont(value, 0.99) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(any_value(q.lo), 4) AS lo,
           round(any_value(q.hi), 4) AS hi,
           round(avg(least(greatest(e.value, q.lo), q.hi)), 4)
             AS winsor_mean
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
"""

# Oracle generated from the SAME pattern list the Ray kernel compiles,
# so the two sides can never drift; counts are taken on the
# progressively-cleaned string exactly like the kernel's fold.
_scrub_p = [p for p, _ in _SCRUB_PATTERNS]
ORACLE_SQL["scrub_props"] = f"""
    WITH s1 AS (
      SELECT event_id, props AS t0,
             regexp_replace(props, '{_scrub_p[0]}', '<EMAIL>', 'g') AS t1
      FROM events),
    s2 AS (
      SELECT event_id, t0, t1,
             regexp_replace(t1, '{_scrub_p[1]}', '<IP>', 'g') AS t2
      FROM s1)
    SELECT event_id,
           regexp_replace(t2, '{_scrub_p[2]}', '<NUM>', 'g') AS props_clean,
           CAST(len(regexp_extract_all(t0, '{_scrub_p[0]}'))
              + len(regexp_extract_all(t1, '{_scrub_p[1]}'))
              + len(regexp_extract_all(t2, '{_scrub_p[2]}')) AS BIGINT)
             AS n_masked
    FROM s2
"""

ORACLE_SQL["weighted_median_by_type"] = """
    WITH w AS (
      SELECT event_type, value,
             CAST(json_extract(props, '$.k') AS BIGINT) AS wt
      FROM events),
    c AS (
      SELECT event_type, value, sum(wt) AS vw
      FROM w GROUP BY event_type, value),
    cum AS (
      SELECT event_type, value,
             sum(vw) OVER (PARTITION BY event_type ORDER BY value) AS cw,
             sum(vw) OVER (PARTITION BY event_type) AS tw
      FROM c)
    SELECT event_type, min(value) AS wmedian
    FROM cum WHERE cw * 2 >= tw GROUP BY event_type
"""

ORACLE_SQL["embedding_covariance"] = """
    WITH e AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings)
    SELECT a.i AS i, b.i AS j,
           round(covar_samp(a.x, b.x), 4) AS cov
    FROM e a JOIN e b USING (vec_id)
    WHERE a.i <= b.i
    GROUP BY a.i, b.i
"""

ORACLE_SQL["weighted_quantiles_by_type"] = """
    WITH w AS (
      SELECT event_type, value,
             CAST(json_extract(props, '$.k') AS BIGINT) AS wt
      FROM events),
    c AS (
      SELECT event_type, value, sum(wt) AS vw
      FROM w GROUP BY event_type, value),
    cum AS (
      SELECT event_type, value,
             sum(vw) OVER (PARTITION BY event_type ORDER BY value) AS cw,
             sum(vw) OVER (PARTITION BY event_type) AS tw
      FROM c)
    SELECT event_type,
           min(value) FILTER (WHERE cw * 4 >= tw)     AS wp25,
           min(value) FILTER (WHERE cw * 2 >= tw)     AS wp50,
           min(value) FILTER (WHERE cw * 4 >= 3 * tw) AS wp75
    FROM cum GROUP BY event_type
"""

ORACLE_SQL["time_weighted_avg_per_user"] = """
    WITH d AS (
      SELECT user_id, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dur
      FROM events)
    SELECT user_id,
           round(sum(value * dur) / sum(dur), 4) AS twa_value
    FROM d WHERE dur IS NOT NULL
    GROUP BY user_id HAVING sum(dur) > 0
"""
