"""Small Dataset-consumption helpers shared across pipelines.

``arrow_blocks`` exists because ``Dataset.to_arrow_refs()`` on a LAZY
dataset executes the plan TWICE in Ray 2.49: once fully for the
blocks, then a second ``limit=1`` re-execution of the whole upstream
(an internal schema fetch on an uncached plan copy — measured 1.85 s
of a 8.0 s ``revenue_by_nation`` call, and proportional overhead on
every aggregate-tail consumer). Materializing first caches the
execution, so the ref fetch and any later schema access are free.

Only for DRIVER-BOUND results (grouped aggregates, bucket partials —
rows bounded by key cardinality, never raw data): ``materialize()``
pins the result in the object store, which is exactly right for a
small table about to be collected and wrong for a 100-TB stream.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def arrow_blocks(ds: ray.data.Dataset) -> list[pa.Table]:
    """Execute ``ds`` ONCE and return its non-empty Arrow blocks.

    Ray's hash aggregate emits zero-column blocks for empty partitions;
    those are dropped here so callers can ``pa.concat_tables`` safely.
    """
    refs = ds.materialize().to_arrow_refs()
    return [b for b in ray.get(refs) if b.num_rows > 0]
