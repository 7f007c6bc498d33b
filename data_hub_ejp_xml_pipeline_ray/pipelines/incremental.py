"""Incrementally-maintained materialized views over a CDC lake.

The consumer story for the change feed (``cdc.changes_between``): a
downstream aggregate refreshes by applying only the delta between the
view's last-seen lake version and the current one — never rescanning
the lake. The reference has no equivalent; its consumers re-read whole
BigQuery tables per run (``bq_data_service.py``). At 100 TB that rescan
is the difference between a view refresh costing O(changed rows) and
O(corpus).

View state layout under ``view_dir``::

    _view.json           {"lake_version": V, "file": "counts-v{V}.parquet"}
    counts-v{V}.parquet  (key, n) — live-row count per key value

Refresh is atomic (new parquet written first, then the state json is
swapped via os.replace) and idempotent (same version -> no-op), so a
crashed refresh never leaves a torn view.

Scale shape: both the full build and the delta path pre-aggregate
per batch inside ``map_batches`` (one polars call per block), so the
final ``groupby`` only sees ``blocks x distinct-keys`` partial rows —
the lake's row volume never enters a shuffle.
"""
from __future__ import annotations

import json
import os

import polars as pl
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..stages.merge import DELETED_COL
from ..state.checkpoint import load_manifest
from .cdc import CHANGE_OP_COL, changes_between, read_lake

VIEW_STATE = "_view.json"

#: signed contribution of each preimage-mode change_op to a live count
_OP_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "update_preimage": -1,
    "delete": -1,
}


def _load_state(view_dir: str) -> dict | None:
    path = os.path.join(view_dir, VIEW_STATE)
    if not os.path.exists(path):
        return None
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def _partial_counts(key: str, signed: bool):
    """Per-batch combiner: collapse a block to (key, n) partials —
    one vectorized polars call, so the downstream groupby shuffles
    only ``blocks x distinct(key)`` rows."""

    def fn(batch: pa.Table) -> pa.Table:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        df = pl.from_arrow(batch)
        if signed:
            df = df.with_columns(
                pl.col(CHANGE_OP_COL)
                .replace_strict(_OP_SIGN, return_dtype=pl.Int64)
                .alias("n")
            )
        else:
            df = df.with_columns(pl.lit(1, dtype=pl.Int64).alias("n"))
        out = df.group_by(key).agg(pl.col("n").sum()).to_arrow()
        return out.cast(pa.schema([(key, batch.schema.field(key).type),
                                   ("n", pa.int64())]))

    return fn


def _aggregate(ds: ray.data.Dataset, key: str, signed: bool) -> pa.Table:
    partial = ds.map_batches(
        _partial_counts(key, signed), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )
    rows = partial.groupby(key).aggregate(Sum("n", alias_name="n")).take_all()
    return pa.table({
        key: [r[key] for r in rows],
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def refresh_live_counts(
    lake_dir: str, view_dir: str, key: str = "lang",
    *, at_version: int | None = None,
) -> dict:
    """Bring the live-row-count-per-``key`` view up to the lake's
    current (or ``at_version``'s) state.

    First call: full build from the PINNED snapshot (``read_lake``
    at that version — not the moving head, so a concurrent commit
    can't tear the build). Later calls: apply the signed change feed
    ``changes_between(last_seen, target, preimages=True)`` — cost
    O(changed rows), not O(lake)."""
    manifest = load_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed lake at {lake_dir}")
    target = manifest.version if at_version is None else int(at_version)
    state = _load_state(view_dir)
    if state is not None and state["lake_version"] == target:
        return {"refreshed": False, "mode": "noop", "lake_version": target}
    if state is not None and state["lake_version"] > target:
        raise ValueError(
            f"view at lake version {state['lake_version']} is newer than "
            f"requested {target}"
        )

    if state is None:
        ds = read_lake(lake_dir, version=target)
        if DELETED_COL in (ds.schema().names or []):
            def drop_tombstones(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                mask = pc.fill_null(pc.invert(t.column(DELETED_COL)), True)
                return t.filter(mask)

            ds = ds.map_batches(
                drop_tombstones, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=None,
            )
        counts = _aggregate(ds, key, signed=False)
        mode = "full"
    else:
        feed = changes_between(
            lake_dir, state["lake_version"], target, preimages=True
        )
        delta = _aggregate(feed, key, signed=True)
        # view (+) delta: both are aggregate-sized (distinct key values,
        # not lake rows), so the merge is a driver-side polars fold
        old_tab = pl.read_parquet(os.path.join(view_dir, state["file"]))
        new_tab = (
            pl.concat([old_tab, pl.from_arrow(delta)])
            .group_by(key).agg(pl.col("n").sum())
            .filter(pl.col("n") > 0)
        )
        counts = new_tab.to_arrow().cast(
            pa.schema([(key, old_tab.to_arrow().schema.field(key).type),
                       ("n", pa.int64())])
        )
        mode = "incremental"

    os.makedirs(view_dir, exist_ok=True)
    fname = f"counts-v{target:06d}.parquet"
    import pyarrow.parquet as pq

    pq.write_table(counts.sort_by(key), os.path.join(view_dir, fname))
    tmp = os.path.join(view_dir, VIEW_STATE + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"lake_version": target, "file": fname, "key": key}, f)
    os.replace(tmp, os.path.join(view_dir, VIEW_STATE))
    if state is not None and state["file"] != fname:
        try:
            os.remove(os.path.join(view_dir, state["file"]))
        except FileNotFoundError:
            pass
    return {
        "refreshed": True, "mode": mode, "lake_version": target,
        "keys": counts.num_rows,
    }


def read_view(view_dir: str) -> pa.Table:
    """The committed view as an Arrow table, sorted by key."""
    state = _load_state(view_dir)
    if state is None:
        raise FileNotFoundError(f"no committed view at {view_dir}")
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(view_dir, state["file"]))
