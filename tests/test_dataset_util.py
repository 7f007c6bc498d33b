"""arrow_blocks: the single-execution contract.

``Dataset.to_arrow_refs()`` on a LAZY dataset executes the plan twice
in Ray 2.49 (full run, then a ``limit=1`` re-execution of the whole
upstream for an internal schema fetch). ``arrow_blocks`` exists to
make that impossible; this test counts actual batch-function
invocations so a regression (or an upstream behavior change) is loud.
"""
import pyarrow as pa
import ray

from data_hub_ejp_xml_pipeline_ray.dataset_util import arrow_blocks


def test_arrow_blocks_executes_plan_exactly_once(ray_session):
    # defined in-function so cloudpickle ships the class BY VALUE
    # (workers can't import the test module)
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    counter = (
        ray.remote(num_cpus=0)(Counter).options(name="ab_probe").remote()
    )
    ray.get(counter.get.remote())  # ensure registered before tasks run

    def bump(t: pa.Table) -> pa.Table:
        h = ray.get_actor("ab_probe")
        ray.get(h.inc.remote())
        return t

    ds = ray.data.range(100, override_num_blocks=4).map_batches(
        bump, batch_size=None, batch_format="pyarrow"
    )
    blocks = arrow_blocks(ds)
    assert sum(b.num_rows for b in blocks) == 100
    # one batch per block, each processed exactly once — a lazy
    # to_arrow_refs would re-run at least one upstream task (>4)
    assert ray.get(counter.get.remote()) == 4
    ray.kill(counter)


def test_arrow_blocks_drops_empty_blocks(ray_session):
    ds = ray.data.range(10, override_num_blocks=2).map_batches(
        lambda t: t.filter(pa.compute.less(t.column("id"), 3)),
        batch_size=None, batch_format="pyarrow",
    )
    blocks = arrow_blocks(ds)
    assert all(b.num_rows > 0 for b in blocks)
    assert sum(b.num_rows for b in blocks) == 3
