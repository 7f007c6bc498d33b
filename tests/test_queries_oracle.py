"""Driver-gate rehearsal: run every registered query at sf0.001 and
compare row count + schema + order-insensitive values against its
DuckDB oracle (the same check CORRECTNESS_r{N}.json records)."""
import math
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_hub_ejp_xml_pipeline_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert len(ray_df) == len(sql_df), (
        f"{name}: row count {len(ray_df)} != oracle {len(sql_df)}"
    )
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if pd.isna(x) and pd.isna(y):
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == pytest.approx(y, abs=1e-9), f"{name}.{col}[{i}]: {x} != {y}"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


def test_driver_priority_prefix_covers_flagships():
    # the correctness driver samples a fixed-size registry PREFIX
    # (insertion order); the flagship CDC/lake family must sit inside
    # the first 50 entries so its driver rows exist — guard the order
    # against accidental re-sorting
    from data_hub_ejp_xml_pipeline_ray.pipelines.queries import QUERIES

    prefix = list(QUERIES)[:50]
    flagships = {
        "cdc_lake_state", "cdc_lake_state_objstore", "cdc_lake_state_mor",
        "cdc_schema_evolution", "cdc_multi_source", "cdc_change_feed",
        "cdc_dedup_index", "cdc_simhash_index", "cdc_canonical_corpus",
        "scd2_history", "cdc_delete_where", "cdc_update_where",
        "cdc_purge", "cdc_wap_publish", "cdc_merge_branch", "cdc_catalog",
        "cdc_entity_lake", "lake_point_lookup", "lake_bloom_lookup",
        "incremental_lang_counts", "replica_purchase_pages",
    }
    missing = flagships - set(prefix)
    assert not missing, f"flagships outside the driver prefix: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, con):
    ray_df = _to_pandas(QUERIES[name](SF_DIR))
    sql_df = con.execute(ORACLE_SQL[name]).df()
    _compare(ray_df, sql_df, name)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLE_SQL))
)
def test_rows_only_queries_run(name):
    """Non-SQL-expressible ops: at least verify they produce rows with a
    stable schema at the smoke tier."""
    df = _to_pandas(QUERIES[name](SF_DIR))
    assert len(df) > 0
    assert len(df.columns) > 0
