"""Distributed exact quantiles / count-distinct: bit-exactness vs a
full in-memory sort, and the bounded-per-task partitioning properties
that make them safe at 100x (no task holds a full group)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from data_hub_ejp_xml_pipeline_ray.pipelines.queries import (
    _hash_bucket,
    grouped_count_distinct,
    grouped_quantiles_distributed,
)


def _grouped_values(seed=1, sizes=(5000, 1, 3000, 40)):
    rng = np.random.default_rng(seed)
    g, v = [], []
    for i, n in enumerate(sizes):
        vals = (
            rng.standard_normal(n) * 100 if n > 1 else np.array([3.25])
        )
        g.extend([f"t{i}"] * n)
        v.extend(np.asarray(vals, dtype=np.float64).tolist())
    return pa.table(
        {"event_type": pa.array(g), "value": pa.array(v, pa.float64())}
    )


def test_grouped_quantiles_bit_exact_vs_full_sort():
    tbl = _grouped_values()
    ds = ray.data.from_arrow(tbl).repartition(8)
    ps = [0.25, 0.5, 0.75, 0.9]
    got = grouped_quantiles_distributed(
        ds, "event_type", "value", ps, num_value_buckets=64
    )
    df = tbl.to_pandas()
    for t in sorted(set(df.event_type)):
        vals = np.sort(df[df.event_type == t]["value"].to_numpy())
        n = len(vals)
        for p in ps:
            h = (n - 1) * p
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            expected = vals[lo] + (h - lo) * (vals[hi] - vals[lo])
            assert got[t][p] == expected  # bit-for-bit, not approx


def test_grouped_quantiles_duplicate_heavy_values():
    # ties spanning bucket boundaries must not shift ranks
    vals = [1.0] * 500 + [2.0] * 500 + [3.0] * 3
    tbl = pa.table(
        {"event_type": pa.array(["x"] * len(vals)),
         "value": pa.array(vals, pa.float64())}
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = grouped_quantiles_distributed(
        ds, "event_type", "value", [0.5, 0.9], num_value_buckets=8
    )
    arr = np.sort(np.asarray(vals))
    for p in [0.5, 0.9]:
        h = (len(arr) - 1) * p
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        assert got["x"][p] == arr[lo] + (h - lo) * (arr[hi] - arr[lo])


def test_quantile_selection_reads_only_target_buckets():
    """The selection pass must touch ~n/B rows per needed bucket, never
    the whole group: with B buckets, every needed bucket's histogram
    share of a uniform 10k-row group stays far below n."""
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 1000, 10_000)
    B = 64
    mn, mx = vals.min(), vals.max()
    idx = np.clip(
        np.floor((vals - mn) / (mx - mn) * B).astype(np.int64), 0, B - 1
    )
    counts = np.bincount(idx, minlength=B)
    # every single bucket (so in particular every TARGET bucket) holds
    # a small slice — the per-task bound the operator relies on
    assert counts.max() < len(vals) // 8


def test_grouped_count_distinct_exact_and_balanced():
    rng = np.random.default_rng(3)
    users = rng.integers(0, 10_000, 50_000)  # one hot type, many users
    types = np.where(rng.random(50_000) < 0.9, "hot", "cold")
    tbl = pa.table(
        {"event_type": pa.array(types.tolist()),
         "user_id": pa.array(users.tolist(), pa.int64())}
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = {
        r["event_type"]: r["n"]
        for r in grouped_count_distinct(
            ds, "event_type", "user_id", num_buckets=16
        ).take_all()
    }
    df = tbl.to_pandas()
    for t in ["hot", "cold"]:
        assert out[t] == df[df.event_type == t]["user_id"].nunique()
    # partitioning property: the value-hash splits the hot type's
    # distinct users across buckets so no task holds the full set
    hot_users = pa.array(
        sorted(set(df[df.event_type == "hot"]["user_id"])), pa.int64()
    )
    buckets = _hash_bucket(hot_users, 16).to_numpy(zero_copy_only=False)
    per_bucket = np.bincount(buckets, minlength=16)
    assert per_bucket.max() < len(hot_users) // 4


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(
                st.integers(-1000, 1000).map(float),
                st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            ),
        ),
        min_size=1,
        max_size=300,
    ),
    p=st.sampled_from([0.1, 0.25, 0.5, 0.9]),
)
def test_grouped_quantiles_property(data, p):
    """Any grouped float data (dups, negatives, singleton groups, tiny
    value ranges) — the 3-pass distributed selection must equal the
    full-sort interpolation bit-for-bit."""
    tbl = pa.table(
        {"g": pa.array([g for g, _ in data]),
         "v": pa.array([v for _, v in data], pa.float64())}
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = grouped_quantiles_distributed(ds, "g", "v", [p], num_value_buckets=16)
    by_g: dict = {}
    for g, v in data:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        arr = np.sort(np.asarray(vals, dtype=np.float64))
        h = (len(arr) - 1) * p
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        expected = arr[lo] + (h - lo) * (arr[hi] - arr[lo])
        assert got[g][p] == expected, (g, p, got[g][p], expected)


def test_percent_rank_tie_heavy(tmp_path):
    """Massive ties (incl. a whole constant group) must reproduce SQL
    percent_rank exactly: tied values share the rank of their first
    occurrence; constant groups rank 0 everywhere."""
    import os

    import duckdb
    import pyarrow.parquet as pq_

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(13)
    n = 4000
    vals = np.where(rng.random(n) < 0.5, 7.5, rng.uniform(0, 10, n))
    types = np.where(np.arange(n) % 3 == 0, "const", "mixed")
    vals[types == "const"] = 1.25  # constant group
    tbl = pa.table(
        {"event_id": pa.array(range(n), pa.int64()),
         "event_type": pa.array(types.tolist()),
         "value": pa.array(vals, pa.float64())}
    )
    sf = str(tmp_path)
    pq_.write_table(tbl, os.path.join(sf, "events.parquet"))
    got = (
        q.QUERIES["value_percentile_by_type"](sf)
        .to_pandas().sort_values("event_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'events.parquet')}')"
    )
    exp = con.execute(
        q.ORACLE_SQL["value_percentile_by_type"]
    ).fetchdf().sort_values("event_id", ignore_index=True)
    assert (got["pct_rank"].to_numpy() == exp["pct_rank"].to_numpy()).all()


def test_buckets_for_grows_with_input_rows(tmp_path):
    # the window-family bucket count must scale with data volume, so no
    # bucket task ever holds more than ~rows_per_bucket rows at 100x
    import pyarrow.parquet as pq

    from data_hub_ejp_xml_pipeline_ray.pipelines.queries import _buckets_for

    small = pa.table({"x": pa.array(np.zeros(1000, dtype=np.int64))})
    pq.write_table(small, tmp_path / "events.parquet")
    assert _buckets_for(str(tmp_path)) == 64  # floor for small inputs

    assert _buckets_for(str(tmp_path), rows_per_bucket=10) == 100
    assert _buckets_for(str(tmp_path), rows_per_bucket=3) == 334  # ceil


def test_nblocks_footer_sizing(tmp_path):
    # filtered reads share _read's footer heuristic: few fat blocks at
    # small inputs (per-task overhead dominated the r2 regressions),
    # block count growing with rows, a hard bytes ceiling per block
    import pyarrow.parquet as pq

    from data_hub_ejp_xml_pipeline_ray.pipelines.queries import _nblocks

    small = pa.table({"x": pa.array(np.zeros(1000, dtype=np.int64))})
    pq.write_table(small, tmp_path / "t.parquet")
    path = str(tmp_path / "t.parquet")
    assert _nblocks(path, 20_000) == 1  # 1000 rows -> one block
    assert _nblocks(path, 100) == 10   # grows with rows/rows_per_block
    assert _nblocks(path, 1) >= 16     # capped at cpus * 4, never rows


def test_setop_empty_result_keeps_schema():
    # EXCEPT can legitimately produce ZERO rows; the empty result must
    # still carry the contract schema (Ray drops block schema with the
    # last block) — exercised via the degenerate A-except-A op
    from data_hub_ejp_xml_pipeline_ray.pipelines.queries import (
        _users_by_type_setop,
    )

    out = _users_by_type_setop(
        "/root/testdata/sf0.001", "signup", "signup", require_b=False
    )
    assert isinstance(out, pa.Table)
    assert out.num_rows == 0
    assert out.schema == pa.schema([("user_id", pa.int64())])


def _write_events(tmp_path, tbl):
    import os

    import pyarrow.parquet as pq_

    sf = str(tmp_path)
    pq_.write_table(tbl, os.path.join(sf, "events.parquet"))
    return sf


def _duck_events(sf, sql):
    import os

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'events.parquet')}')"
    )
    return con.execute(sql).fetchdf()


def test_ntile_tie_heavy_constant_and_tiny_groups(tmp_path):
    """NTILE edges the sf tables never hit: massive value ties (the id
    tiebreak decides tile membership), a whole CONSTANT-VALUE group
    (ranked by the id histogram), and a group with n < K (fewer rows
    than tiles — every row its own tile, no division by zero in the
    uneven-bucket formula)."""
    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(29)
    n = 3001
    vals = np.where(rng.random(n) < 0.6, 4.25, rng.uniform(0, 10, n))
    types = np.where(np.arange(n) % 3 == 0, "const", "mixed").astype(object)
    vals[types == "const"] = 9.75          # constant-value group
    types[:3] = "tiny"                      # n=3 < K=4 tiles
    tbl = pa.table(
        {"event_id": pa.array(range(n), pa.int64()),
         "event_type": pa.array(types.tolist()),
         "value": pa.array(vals, pa.float64())}
    )
    sf = _write_events(tmp_path, tbl)
    got = (
        q.QUERIES["value_ntile_by_type"](sf)
        .to_pandas().sort_values("event_id", ignore_index=True)
    )
    exp = _duck_events(sf, q.ORACLE_SQL["value_ntile_by_type"]).sort_values(
        "event_id", ignore_index=True
    )
    assert (got["tile"].to_numpy() == exp["tile"].to_numpy()).all()
    assert set(got[got.event_type == "tiny"]["tile"]) == {1, 2, 3}


def test_rolling_hour_boundary_and_ts_peers(tmp_path):
    """RANGE-frame edges: events exactly 1 h apart (inclusive lower
    boundary — the 1h-older row IS in frame) and duplicate timestamps
    (ALL ts-peers in frame, even 'later' rows of the same instant),
    matching SQL RANGE semantics bit-exactly."""
    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3600, "s")
    ts = [
        base, base + hour,            # exactly 1h apart: both in frame
        base + 2 * hour, base + 2 * hour, base + 2 * hour,  # peers
        base + 3 * hour + np.timedelta64(1, "us"),  # just past 1h: alone
    ]
    tbl = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 6, pa.int64()),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0], pa.float64()),
    })
    sf = _write_events(tmp_path, tbl)
    got = (
        q.QUERIES["rolling_hour_value_per_user"](sf)
        .to_pandas().sort_values("event_id", ignore_index=True)
    )
    exp = _duck_events(
        sf, q.ORACLE_SQL["rolling_hour_value_per_user"]
    ).sort_values("event_id", ignore_index=True)
    assert (got["roll_sum"].to_numpy() == exp["roll_sum"].to_numpy()).all()
    assert (
        got["roll_n"].to_numpy() == exp["roll_n"].to_numpy().astype("int64")
    ).all()
    # the three ts-peers each see BOTH other peers + the 1h-old row
    assert got.loc[2:4, "roll_n"].tolist() == [4, 4, 4]


def _write_docs(tmp_path, tbl):
    import os

    import pyarrow.parquet as pq_

    sf = str(tmp_path)
    pq_.write_table(tbl, os.path.join(sf, "documents.parquet"))
    return sf


def _duck_docs(sf, sql):
    import os

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}')"
    )
    return con.execute(sql).fetchdf()


def test_peak_concurrency_end_meets_start_and_nesting(tmp_path):
    """Sweep-line edges: a session ENDING exactly where another starts
    must not double-count (end-exclusive: -1 sorts before +1 at equal
    t), and a 3-deep nest peaks at 3 with first_peak_ts = the THIRD
    event's start."""
    import pandas as pd

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    ts = [
        base, base + 300 * s,               # chain: end meets start
        base + 1000 * s, base + 1010 * s, base + 1020 * s,  # 3-deep nest
    ]
    types = ["chain", "chain", "nest", "nest", "nest"]
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types),
    })
    sf = _write_events(tmp_path, tbl)
    got = (
        q.QUERIES["peak_concurrency_by_type"](sf)
        .to_pandas().sort_values("event_type", ignore_index=True)
    )
    exp = _duck_events(
        sf, q.ORACLE_SQL["peak_concurrency_by_type"]
    ).sort_values("event_type", ignore_index=True)
    assert got["peak"].tolist() == [1, 3]
    assert (got["peak"].to_numpy() == exp["peak"].to_numpy()).all()
    assert (
        got["first_peak_ts"].to_numpy() == exp["first_peak_ts"].to_numpy()
    ).all()
    # first peak of the chain is the FIRST event (peak 1 reached at t0)
    assert got.loc[0, "first_peak_ts"] == pd.Timestamp("2024-01-01")
    # nest peaks when the third session opens
    assert got.loc[1, "first_peak_ts"] == pd.Timestamp(
        "2024-01-01 00:17:00"
    )


def test_tfidf_score_tie_breaks_lexicographic(tmp_path):
    """Two terms with identical tf AND df land on the same snapped
    score — the lexicographically smaller term must win on BOTH
    sides."""
    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "zebra apple zebra apple common",   # tie: apple wins
            "apple zebra common",                # tie at tf=1: apple
            "common only here",
        ]),
    })
    sf = _write_docs(tmp_path, tbl)
    got = (
        q.QUERIES["tfidf_top_terms"](sf)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    exp = _duck_docs(sf, q.ORACLE_SQL["tfidf_top_terms"]).sort_values(
        "doc_id", ignore_index=True
    )
    assert got["term"].tolist()[:2] == ["apple", "apple"]
    for col in ("term", "tf", "df", "score_i"):
        assert (
            got[col].to_numpy() == exp[col].to_numpy()
        ).all(), col


def test_term_postings_caps_at_five_and_counts_cf(tmp_path):
    """Posting sample holds the FIRST 5 doc_ids ascending; cf counts
    occurrences (not docs)."""
    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    texts = ["hot hot cold"] * 7  # 'hot' in 7 docs, tf 2 each
    tbl = pa.table({
        "doc_id": pa.array([9, 3, 5, 1, 7, 2, 8], pa.int64()),
        "text": pa.array(texts),
    })
    sf = _write_docs(tmp_path, tbl)
    got = (
        q.QUERIES["term_postings"](sf)
        .to_pandas().sort_values("term", ignore_index=True)
    )
    exp = _duck_docs(sf, q.ORACLE_SQL["term_postings"]).sort_values(
        "term", ignore_index=True
    )
    hot = got[got.term == "hot"].iloc[0]
    assert hot["df"] == 7 and hot["cf"] == 14
    assert hot["postings"] == "1,2,3,5,7"
    for col in ("df", "cf", "postings"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_cooccurrence_cap_applies_identically(tmp_path):
    """A doc with MORE than 32 distinct terms: pairs involving terms
    beyond the 32 lexicographically-first must not count on either
    side (the deterministic fan-out cap)."""
    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    # 40 distinct terms t00..t39 in one doc; 'zz' pairs only via doc 1
    big = " ".join(f"t{i:02d}" for i in range(40))
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([big, "t35 zz"]),
    })
    sf = _write_docs(tmp_path, tbl)
    got = (
        q.QUERIES["term_cooccurrence_topk"](sf)
        .to_pandas().sort_values(["ta", "tb"], ignore_index=True)
    )
    exp = _duck_docs(sf, q.ORACLE_SQL["term_cooccurrence_topk"]).sort_values(
        ["ta", "tb"], ignore_index=True
    )
    # t32..t39 never pair inside doc 0 (beyond the cap) but t35-zz
    # exists via doc 1
    all_pairs = set(zip(got["ta"], got["tb"]))
    assert ("t35", "zz") in all_pairs or len(got) == 20
    for col in ("ta", "tb", "n_docs"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_gini_constant_group_and_tie_heavy(tmp_path):
    """Gini edges: a CONSTANT-value group is exactly 0 (2A == (n+1)S
    identity), and massive value ties must not perturb the metric
    (rank-tie permutation invariance) — engine vs oracle bit-exact."""
    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(7)
    n = 4001
    vals = np.where(rng.random(n) < 0.7, 2.5, rng.uniform(1, 9, n))
    types = np.where(np.arange(n) % 4 == 0, "const", "ties").astype(object)
    vals[types == "const"] = 3.25
    tbl = pa.table({
        "event_type": pa.array(types.tolist()),
        "value": pa.array(vals, pa.float64()),
    })
    sf = _write_events(tmp_path, tbl)
    got = (
        q.QUERIES["gini_by_type"](sf)
        .to_pandas().sort_values("event_type", ignore_index=True)
    )
    exp = _duck_events(sf, q.ORACLE_SQL["gini_by_type"]).sort_values(
        "event_type", ignore_index=True
    )
    assert got.loc[0, "event_type"] == "const"
    assert got.loc[0, "gini"] == 0.0
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["gini"].to_numpy() == exp["gini"].to_numpy()).all()


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_gini_matches_naive_reference(tmp_path, seed):
    """Independent of the SQL oracle: the distributed Gini equals the
    naive single-array formula computed in numpy on the driver."""
    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(seed)
    n = 2000
    vals = np.round(rng.lognormal(1.0, 0.8, n), 2)
    types = rng.choice(["a", "b", "c"], n)
    tbl = pa.table({
        "event_type": pa.array(types.tolist()),
        "value": pa.array(vals, pa.float64()),
    })
    sf = _write_events(tmp_path, tbl)
    got = (
        q.QUERIES["gini_by_type"](sf)
        .to_pandas().set_index("event_type")["gini"]
    )
    for t in ("a", "b", "c"):
        x = np.sort(np.round(vals[types == t] * 10000).astype(np.int64))
        m = len(x)
        rank = np.arange(1, m + 1, dtype=np.int64)
        a = int(np.sum(rank * x)); s = int(x.sum())
        expect = float(2 * a - (m + 1) * s) / (float(m) * float(s))
        assert got[t] == expect, t


@pytest.mark.parametrize("seed", [5, 19])
def test_peak_concurrency_matches_naive_sweep(tmp_path, seed):
    """Independent of the SQL oracle: distributed sweep-line peak ==
    a naive driver-side sweep over the same (+1 at ts, -1 at ts+300s)
    points with ends-before-starts tie order."""
    import pandas as pd

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(seed)
    n = 1500
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + rng.integers(0, 3 * 86400, n) * np.timedelta64(1, "s")
    types = rng.choice(["x", "y"], n)
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types.tolist()),
    })
    sf = _write_events(tmp_path, tbl)
    got = (
        q.QUERIES["peak_concurrency_by_type"](sf)
        .to_pandas().set_index("event_type")
    )
    sess = np.timedelta64(300, "s")
    for t in ("x", "y"):
        tt = ts[types == t]
        pts = sorted(
            [(int(v.astype("datetime64[us]").astype(np.int64)), 1) for v in tt]
            + [(int((v + sess).astype("datetime64[us]").astype(np.int64)), -1)
               for v in tt]
        )  # tuple sort: -1 before +1 at equal time
        c = peak = 0
        first = None
        for time_us, d in pts:
            c += d
            if c > peak:
                peak, first = c, time_us
        assert got.loc[t, "peak"] == peak, t
        assert got.loc[t, "first_peak_ts"] == pd.Timestamp(first, unit="us"), t


@pytest.mark.parametrize("seed", [3, 23])
def test_dup_ngram_stats_matches_naive_reference(tmp_path, seed):
    """Independent of the SQL oracle: the bucketed df classification
    equals a naive driver-side Counter over per-doc distinct 3-grams
    (incl. docs with <3 tokens absent, shared-gram docs counted dup)."""
    import os
    import re
    from collections import Counter

    import pyarrow.parquet as pq_

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []
    for i in range(120):
        n = int(rng.integers(0, 12))  # includes 0/1/2-token docs
        docs.append(" ".join(rng.choice(vocab, n)))
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    })
    sf = str(tmp_path)
    pq_.write_table(tbl, os.path.join(sf, "documents.parquet"))

    got = (
        q.QUERIES["dup_ngram_stats"](sf).to_pandas()
        .set_index("doc_id").sort_index()
    )

    tok = re.compile(r"[A-Za-z0-9]+")
    gram_sets = {}
    for i, text in enumerate(docs):
        ws = tok.findall(text)
        gs = {" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)}
        if gs:
            gram_sets[i] = gs
    df = Counter(g for gs in gram_sets.values() for g in gs)
    assert set(got.index) == set(gram_sets)
    for i, gs in gram_sets.items():
        assert got.loc[i, "n_grams"] == len(gs), i
        assert got.loc[i, "n_dup"] == sum(1 for g in gs if df[g] >= 2), i


@pytest.mark.parametrize("seed", [5, 29])
def test_exact_substring_dedup_matches_naive(tmp_path, seed):
    """Independent of the SQL oracle: the bucketed gram-position mask
    equals a naive driver-side Counter + interval merge. The corpus is
    built to hit every edge: docs shorter than the gram width (zero
    grams, removed=0), a doc whose duplication is purely WITHIN-doc
    (a repeated phrase inside one doc still counts, occurrence >= 2),
    verbatim copies (entire doc masked), and partial overlaps that
    exercise the adjacent-span merge (gap == n collapses to one span).
    """
    import os
    import re
    from collections import Counter

    import pyarrow.parquet as pq_

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    n = q._ESD_N
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota", "kappa"]
    docs = []
    for i in range(80):
        ln = int(rng.integers(0, 40))  # includes docs with < n tokens
        docs.append(" ".join(rng.choice(vocab, ln)))
    # verbatim duplicate pair: whole docs masked end-to-end
    dup = " ".join(rng.choice(vocab, 30))
    docs += [dup, dup]
    # within-doc repetition only: phrase repeated twice inside ONE doc
    phrase = " ".join(rng.choice(vocab, n))
    docs.append(phrase + " " + " ".join(rng.choice(vocab, 5)) + " " + phrase)
    # partial overlap: shares a prefix run with the verbatim pair
    docs.append(dup.rsplit(" ", 10)[0] + " " + " ".join(rng.choice(vocab, 12)))

    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    })
    sf = str(tmp_path)
    pq_.write_table(tbl, os.path.join(sf, "documents.parquet"))

    got = (
        q.QUERIES["exact_substring_dedup"](sf).to_pandas()
        .set_index("doc_id").sort_index()
    )

    tok = re.compile(r"[A-Za-z0-9]+")
    toks = [tok.findall(t) for t in docs]
    cnt = Counter(
        " ".join(ws[j:j + n])
        for ws in toks for j in range(len(ws) - n + 1)
    )
    assert len(got) == len(docs)
    for i, ws in enumerate(toks):
        hits = [j for j in range(len(ws) - n + 1)
                if cnt[" ".join(ws[j:j + n])] >= 2]
        removed, spans, prev = 0, 0, None
        for j in hits:
            if prev is None or j - prev > n:
                spans += 1
                removed += n
            else:
                removed += j - prev
            prev = j
        assert got.loc[i, "total_tokens"] == len(ws), i
        assert got.loc[i, "removed_tokens"] == removed, i
        assert got.loc[i, "kept_tokens"] == len(ws) - removed, i
        assert got.loc[i, "dup_spans"] == spans, i
    # the engineered rows actually exercised their edges
    assert got.loc[len(docs) - 4, "removed_tokens"] == 30  # verbatim pair
    assert got.loc[len(docs) - 2, "removed_tokens"] > 0  # within-doc repeat


@pytest.mark.parametrize("seed", [11, 31])
def test_weighted_median_matches_naive(tmp_path, seed):
    """Independent of the SQL oracle: the weighted selection equals a
    naive driver-side weighted cumsum, incl. zero weights, tie-heavy
    values and a constant group."""
    import json
    import os

    import pyarrow.parquet as pq_

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(seed)
    rows_t, rows_v, rows_p = [], [], []
    # tie-heavy group "a" (values on a coarse grid), normal "b",
    # constant group "c", plus zero weights sprinkled everywhere
    for t, n in (("a", 800), ("b", 500), ("c", 40)):
        if t == "c":
            vals = np.full(n, 7.25)
        elif t == "a":
            vals = np.round(rng.uniform(0, 5, n) * 2) / 2
        else:
            vals = np.round(rng.standard_normal(n) * 50, 2)
        ws = rng.integers(0, 10, n)  # ~10% zeros
        rows_t += [t] * n
        rows_v += vals.tolist()
        rows_p += [json.dumps({"k": int(w)}) for w in ws]
    tbl = pa.table({
        "event_type": pa.array(rows_t), "value": pa.array(rows_v, pa.float64()),
        "props": pa.array(rows_p),
    })
    sf = str(tmp_path)
    pq_.write_table(tbl, os.path.join(sf, "events.parquet"))

    got = (
        q.QUERIES["weighted_median_by_type"](sf)
        .to_pandas().set_index("event_type")["wmedian"]
    )
    df = tbl.to_pandas()
    df["k"] = df["props"].map(lambda s: json.loads(s)["k"])
    for t in ("a", "b", "c"):
        sub = df[df.event_type == t].sort_values("value")
        cw = sub.groupby("value", sort=True)["k"].sum().cumsum()
        W = int(sub["k"].sum())
        expect = float(cw.index[int(np.searchsorted(cw.values, (W + 1) // 2))])
        assert got[t] == expect, t


def test_weighted_quantiles_matches_naive(tmp_path):
    """p25/p50/p75 from the one-pass multi-threshold selection equal
    the naive weighted cumsum at each rational threshold."""
    import json
    import os

    import pyarrow.parquet as pq_

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(17)
    n = 1200
    vals = np.round(rng.uniform(-20, 80, n), 2)
    ws = rng.integers(0, 7, n)
    types = rng.choice(["a", "b"], n)
    tbl = pa.table({
        "event_type": pa.array(types.tolist()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([json.dumps({"k": int(w)}) for w in ws]),
    })
    sf = str(tmp_path)
    pq_.write_table(tbl, os.path.join(sf, "events.parquet"))

    got = (
        q.QUERIES["weighted_quantiles_by_type"](sf)
        .to_pandas().set_index("event_type")
    )
    for t in ("a", "b"):
        m = types == t
        order = np.argsort(vals[m], kind="stable")
        v, w = vals[m][order], ws[m][order]
        # collapse ties
        uniq = np.unique(v)
        cw = np.array([w[v <= x].sum() for x in uniq], dtype=np.int64)
        W = int(w.sum())
        for col, (num, den) in (("wp25", (1, 4)), ("wp50", (1, 2)),
                                ("wp75", (3, 4))):
            thr = (num * W + den - 1) // den
            expect = float(uniq[int(np.searchsorted(cw, thr))])
            assert got.loc[t, col] == expect, (t, col)


@pytest.mark.parametrize("seed", [13, 37])
def test_mixture_by_token_budget_matches_naive_fill(tmp_path, seed):
    """Independent of the SQL oracle: the grouped ordered prefix-sum
    admission equals a naive per-source greedy fill on the driver —
    including a single-doc source (budget = half its tokens: admitted
    iff it has >= 2 tokens, since a 1-token doc's budget is 0)."""
    import re

    from data_hub_ejp_xml_pipeline_ray.pipelines import queries as q

    rng = np.random.default_rng(seed)
    n = 1200
    words = ["alpha", "beta", "gamma", "delta", "x1", "y22", "zz"]
    texts = [
        " ".join(rng.choice(words, rng.integers(1, 40)))
        for _ in range(n)
    ]
    sources = rng.choice(["a", "b", "c"], n).tolist()
    sources[0] = "solo"  # a source with exactly one document
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(sources),
    })
    sf = _write_docs(tmp_path, tbl)
    got = sorted(
        (r["doc_id"], r["source"], r["n_tokens"])
        for r in q.QUERIES["mixture_by_token_budget"](sf).take_all()
    )
    ntok = [len(re.findall(r"[A-Za-z0-9]+", t)) for t in texts]
    expected = []
    for src in set(sources):
        ids = [i for i in range(n) if sources[i] == src]
        budget = sum(ntok[i] for i in ids) // 2
        run = 0
        for i in ids:  # doc_id order
            if run < budget:
                expected.append((i, src, ntok[i]))
            run += ntok[i]
    assert got == sorted(expected)
