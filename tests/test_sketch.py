"""HLL sketch: error bound vs exact distinct counts, merge laws."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from data_hub_ejp_xml_pipeline_ray.functions.sketch import (
    empty_registers,
    estimate,
    hll_count_distinct,
    merge_registers,
    update_registers,
)


@pytest.mark.parametrize("true_n", [50, 1_000, 20_000])
def test_hll_estimate_within_bound(true_n):
    reg = empty_registers(p=12)
    update_registers(reg, [f"item-{i}" for i in range(true_n)])
    est = estimate(reg)
    # p=12 -> ~1.6% std error; allow 5 sigma
    assert abs(est - true_n) / true_n < 0.08, (est, true_n)


def test_hll_merge_is_union_and_idempotent():
    a = update_registers(empty_registers(), [f"a{i}" for i in range(500)])
    b = update_registers(empty_registers(), [f"b{i}" for i in range(500)])
    ab = merge_registers(a, b)
    # union ~= 1000
    assert abs(estimate(ab) - 1000) / 1000 < 0.08
    # idempotent (safe under task retries) + commutative
    assert np.array_equal(merge_registers(ab, ab), ab)
    assert np.array_equal(merge_registers(a, b), merge_registers(b, a))
    # overlapping sets: union of identical sets stays ~500
    aa = merge_registers(a, update_registers(empty_registers(),
                                             [f"a{i}" for i in range(500)]))
    assert abs(estimate(aa) - 500) / 500 < 0.08


def test_hll_count_distinct_dataset_matches_exact():
    rows = [{"k": f"u{i % 700}", "t": ["x", "y"][i % 2]} for i in range(5000)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    est = hll_count_distinct(ds, "k")
    assert abs(est - 700) / 700 < 0.08
    grouped = hll_count_distinct(ds, "k", group_col="t")
    # each parity class sees either the even or odd half of u0..u699
    for g, e in grouped.items():
        exact = len({f"u{i % 700}" for i in range(5000)
                     if ["x", "y"][i % 2] == g})
        assert abs(e - exact) / exact < 0.08
