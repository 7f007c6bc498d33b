"""Property-based tests (hypothesis): algebraic laws the engine's
correctness rests on — LWW associativity/idempotence, schema-merge
laws, text-extraction agreement on arbitrary inputs."""
import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import HealthCheck, given, settings

from data_hub_ejp_xml_pipeline_ray.functions.text import (
    extract_text_column,
    extract_text_reference,
)
from data_hub_ejp_xml_pipeline_ray.schemas import merge_schemas, merge_types
from data_hub_ejp_xml_pipeline_ray.sources.synthetic import naive_replay
from data_hub_ejp_xml_pipeline_ray.stages.merge import local_lww

SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),      # url index
        st.integers(0, 1000),   # warc_ts micros
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=0,
    max_size=40,
)


def _to_table(evts):
    seq_counter = {}
    rows = []
    for url_i, ts, op in evts:
        url = f"https://site-{url_i}.example/"
        seq = seq_counter.get(url, 0)
        seq_counter[url] = seq + 1
        rows.append(
            {
                "op": op,
                "url": url,
                "warc_ts": ts,
                "seq": seq,
                "payload": f"{url}@{ts}/{seq}",
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("op", pa.string()), ("url", pa.string()),
             ("warc_ts", pa.int64()), ("seq", pa.int64()),
             ("payload", pa.string())]
        ),
    )


def _winners(table):
    out = {}
    for r in table.to_pylist():
        key = (r["warc_ts"], r["seq"])
        cur = out.get(r["url"])
        if cur is None or key > (cur["warc_ts"], cur["seq"]):
            out[r["url"]] = r
    return {u: (r["warc_ts"], r["seq"], r["payload"]) for u, r in out.items()}


@given(events_strategy)
@settings(**SETTINGS)
def test_local_lww_matches_naive_winner(evts):
    t = _to_table(evts)
    reduced = local_lww(t)
    # one row per url, and it is the max-(warc_ts, seq) row
    assert _winners(reduced) == _winners(t)
    urls = reduced.column("url").to_pylist()
    assert len(urls) == len(set(urls))


@given(events_strategy, st.integers(1, 39))
@settings(**SETTINGS)
def test_local_lww_is_associative_over_splits(evts, cut):
    """Combiner law: reduce(reduce(A) + reduce(B)) == reduce(A + B) —
    this is what makes per-block pre-reduction correct."""
    t = _to_table(evts)
    if t.num_rows < 2:
        return
    cut = min(cut, t.num_rows - 1)
    a, b = t.slice(0, cut), t.slice(cut)
    two_phase = local_lww(
        pa.concat_tables([local_lww(a), local_lww(b)])
    )
    one_shot = local_lww(t)
    assert _winners(two_phase) == _winners(one_shot)


@given(events_strategy)
@settings(**SETTINGS)
def test_duplicate_delivery_is_noop(evts):
    """LWW idempotence under at-least-once delivery: feeding the same
    events twice yields the same winners."""
    t = _to_table(evts)
    doubled = pa.concat_tables([t, t])
    assert _winners(local_lww(doubled)) == _winners(local_lww(t))


scalar_types = st.sampled_from(
    [pa.int32(), pa.int64(), pa.float32(), pa.float64(), pa.string(),
     pa.bool_(), pa.null(), pa.timestamp("us")]
)


@given(scalar_types, scalar_types)
@settings(max_examples=60, deadline=None)
def test_merge_types_total_and_idempotent(a, b):
    m = merge_types(a, b)
    assert isinstance(m, pa.DataType)
    assert merge_types(m, m) == m
    # merging the result with either input is stable (absorption)
    assert merge_types(m, b) == m


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), scalar_types),
        min_size=1, max_size=4, unique_by=lambda kv: kv[0],
    ),
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), scalar_types),
        min_size=1, max_size=4, unique_by=lambda kv: kv[0],
    ),
)
@settings(max_examples=60, deadline=None)
def test_merge_schemas_union_and_idempotent(f1, f2):
    s1 = pa.schema([pa.field(n, t) for n, t in f1])
    s2 = pa.schema([pa.field(n, t) for n, t in f2])
    m = merge_schemas(s1, s2)
    assert set(m.names) == set(s1.names) | set(s2.names)
    assert merge_schemas(m, m).equals(m)
    # existing field order is preserved as a prefix
    assert m.names[: len(s1.names)] == list(s1.names)


html_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(html_text)
@settings(max_examples=100, deadline=None)
def test_text_extraction_engine_matches_spec_on_arbitrary_input(doc):
    raw = doc.encode("utf-8")
    expected = extract_text_reference(raw)
    got = extract_text_column(pa.array([raw], type=pa.binary())).to_pylist()[0]
    assert got == expected


@given(events_strategy)
@settings(**SETTINGS)
def test_lww_winner_rows_keeps_exactly_the_winning_version_group(evts):
    """Group-valued LWW law (entity tables): output rows are exactly the
    input rows whose (url, warc_ts, seq) equals the url's max version."""
    from data_hub_ejp_xml_pipeline_ray.stages.merge import lww_winner_rows

    t = _to_table(evts)
    if t.num_rows == 0:
        return
    # fan out: duplicate each event row 1-3x to simulate multi-row versions
    import pyarrow as _pa
    reps = [1 + (i % 3) for i in range(t.num_rows)]
    idx = [i for i, r in enumerate(reps) for _ in range(r)]
    fanned = t.take(_pa.array(idx))
    out = lww_winner_rows(fanned)
    winners = _winners(t)
    got_rows = [
        (r["url"], r["warc_ts"], r["seq"]) for r in out.to_pylist()
    ]
    expected_rows = [
        (r["url"], r["warc_ts"], r["seq"])
        for r in fanned.to_pylist()
        if (r["warc_ts"], r["seq"]) == winners[r["url"]][:2]
    ]
    assert sorted(got_rows) == sorted(expected_rows)


@given(st.lists(st.text(max_size=80), min_size=0, max_size=50))
@settings(**SETTINGS)
def test_crc32_column_matches_zlib_on_arbitrary_strings(strings):
    import zlib

    import numpy as np

    from data_hub_ejp_xml_pipeline_ray.stages.merge import crc32_column

    got = crc32_column(pa.array(strings, pa.string()))
    ref = np.array(
        [zlib.crc32(s.encode("utf-8")) for s in strings], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, ref)


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.tuples(st.integers(-1000, 1000),
                          st.one_of(st.none(), st.text(max_size=8))),
                max_size=4,
            ),
        ),
        min_size=0,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_conform_array_nested_add_preserves_values_and_nulls(rows):
    from data_hub_ejp_xml_pipeline_ray.schemas import conform_array

    s1 = pa.list_(pa.struct([("a", pa.int64()), ("b", pa.string())]))
    s2 = pa.list_(pa.struct([("a", pa.int64()), ("b", pa.string()),
                             ("c", pa.int32())]))
    pyrows = (
        None if r is None else [{"a": a, "b": b} for a, b in r]
        for r in rows
    )
    arr = pa.array(list(pyrows), s1)
    out = conform_array(arr, s2)
    assert out.type.equals(s2)
    expect = [
        None if r is None else [{"a": a, "b": b, "c": None} for a, b in r]
        for r in rows
    ]
    assert out.to_pylist() == expect


@given(
    st.integers(2, 6),                     # log2-ish P selector
    st.lists(st.integers(0, 1 << 31), min_size=1, max_size=40),  # crcs
    st.integers(0, 10),                    # number of splits to apply
    st.randoms(use_true_random=False),
)
@settings(**SETTINGS)
def test_split_map_always_routes_to_exactly_one_live_partition(
    p_sel, crcs, n_splits, rnd
):
    """Invariant: after ANY chain of splits, resolve_partition maps
    every crc to a residue whose modulus (per residue_modulus) is
    consistent, and the vectorized partitioner agrees with the scalar
    resolver."""
    import numpy as np

    from data_hub_ejp_xml_pipeline_ray.state.checkpoint import (
        residue_modulus,
        resolve_partition,
    )

    P = 1 << p_sel
    splits = set()
    # grow a random valid split chain: only live (unsplit) coverings split
    for _ in range(n_splits):
        # pick a random crc's current residue to split
        c = rnd.choice(crcs)
        r = resolve_partition(c, P, frozenset(splits))
        m = residue_modulus(r, P, frozenset(splits))
        splits.add((r, m))
    fs = frozenset(splits)
    for c in crcs:
        r = resolve_partition(c, P, fs)
        m = residue_modulus(r, P, fs)
        assert c % m == r            # the residue really is c's class
        assert (r, m) not in fs      # routed partition is live (unsplit)


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(min_size=1, max_size=20)),  # url
            st.one_of(st.none(), st.binary(max_size=40)),            # html
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_quarantine_partitions_every_row_exactly_once(rows):
    """Arbitrary (url, html-bytes) rows: quarantine never crashes,
    good + bad == input, and bad rows are exactly the contract
    violators (null url or undecodable html)."""
    from datetime import datetime, timezone

    from data_hub_ejp_xml_pipeline_ray.stages.merge import quarantine_bad_rows

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    batch = pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "warc_ts": pa.array([ts] * len(rows), pa.timestamp("us", tz="UTC")),
            "seq": pa.array(list(range(len(rows))), pa.int64()),
            "html": pa.array([h for _, h in rows], pa.binary()),
        }
    )
    good, err, raw = quarantine_bad_rows(batch)
    n_err = 0 if err is None else err.num_rows
    assert good.num_rows + n_err == batch.num_rows
    # the raw (redrive) table mirrors the tagged rows one-for-one
    assert (raw.num_rows if raw is not None else 0) == n_err

    def is_bad(u, h):
        if u is None:
            return True
        if h is None:
            return False
        try:
            h.decode("utf-8")
            return False
        except UnicodeDecodeError:
            return True

    expected_bad = sum(1 for u, h in rows if is_bad(u, h))
    assert n_err == expected_bad
    # good rows individually decodable
    for h in (good.column("html").to_pylist() if good.num_rows else []):
        if isinstance(h, bytes):
            h.decode("utf-8")


# --- weighted selection law: distributed == naive for any weights ----

weighted_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),            # group
        st.integers(-5, 5),                     # value on a tie-heavy grid
        st.integers(0, 4),                      # integer weight (zeros ok)
    ),
    min_size=1,
    max_size=60,
).filter(lambda rows: all(
    # the selection needs at least one positive weight per present group
    sum(w for g2, _, w in rows if g2 == g) > 0
    for g in {g for g, _, _ in rows}
))


@given(weighted_rows)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_weighted_quantiles_equal_naive_scan(rows):
    """min{x : den*cumw(x) >= num*W} from the bucketed distributed
    selection equals a direct scan, for arbitrary tie-heavy values and
    weights including zeros."""
    import ray.data

    from data_hub_ejp_xml_pipeline_ray.pipelines.queries import (
        grouped_weighted_quantiles_distributed,
    )

    tbl = pa.table({
        "g": pa.array([r[0] for r in rows]),
        "v": pa.array([float(r[1]) for r in rows], pa.float64()),
        "w": pa.array([r[2] for r in rows], pa.int64()),
    })
    fracs = [(1, 4), (1, 2), (3, 4)]
    got = grouped_weighted_quantiles_distributed(
        ray.data.from_arrow(tbl), "g", "v", "w", fracs,
        num_value_buckets=8,  # tiny B: forces multi-bucket paths
    )
    for g in {r[0] for r in rows}:
        sub = sorted((v, w) for g2, v, w in rows if g2 == g)
        W = sum(w for _, w in sub)
        for num, den in fracs:
            thr = (num * W + den - 1) // den
            cum = 0
            expect = None
            seen = {}
            for v, w in sub:
                seen[v] = seen.get(v, 0) + w
            for v in sorted(seen):
                cum += seen[v]
                if cum >= thr:
                    expect = float(v)
                    break
            if expect is None:  # thr == 0 with all-zero prefix
                expect = float(sorted(seen)[0])
            assert got[g][(num, den)] == expect, (g, num, den)


# ---------------------------------------------------------------------------
# zone-map pruning soundness (state/zones.py)
# ---------------------------------------------------------------------------

_zone_words = st.sampled_from(["en", "de", "fr", "zz", "", "aa", "zzz"])
_zone_ints = st.one_of(st.none(), st.integers(-5, 25))
_zone_strs = st.one_of(st.none(), _zone_words)
_zone_ops = st.sampled_from(
    ["<", "<=", ">", ">=", "==", "!=", "in", "not_in", "not_null", "matches"]
)


@given(
    ints=st.lists(_zone_ints, min_size=1, max_size=12),
    strs=st.lists(_zone_strs, min_size=1, max_size=12),
    col=st.sampled_from(["i", "s"]),
    op=_zone_ops,
    iv=st.integers(-8, 30),
    sv=_zone_words,
    lst=st.lists(st.one_of(st.integers(-8, 30), _zone_words),
                 min_size=1, max_size=4),
)
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_zone_allows_is_sound(tmp_path_factory_bypass, ints, strs, col, op,
                              iv, sv, lst):
    """SOUNDNESS law: whenever zone_allows says a file cannot hold a
    matching row, the brute-force SQL-WHERE evaluation over the actual
    file finds ZERO matches — for every op, over tables with nulls,
    all-null columns, constants and empty strings. (Completeness is not
    required: allowing a read is always safe.)"""
    import os
    import uuid

    import pyarrow.parquet as pq

    from data_hub_ejp_xml_pipeline_ray.state.zones import (
        constraints_to_expression,
        file_zone_doc,
        zone_allows,
    )

    n = max(len(ints), len(strs))
    ints = (ints * n)[:n]
    strs = (strs * n)[:n]
    t = pa.table({
        "i": pa.array(ints, pa.int64()),
        "s": pa.array(strs, pa.string()),
    })
    path = os.path.join(tmp_path_factory_bypass, f"{uuid.uuid4().hex}.parquet")
    pq.write_table(t, path)
    if op == "not_null":
        spec = [col, op]
    elif op in ("in", "not_in"):
        spec = [col, op, lst]
    elif op == "matches":
        spec = [col, op, sv or "x"]
    else:
        spec = [col, op, iv if col == "i" else sv]
    doc = file_zone_doc(path)
    if zone_allows(doc["cols"], *spec[:2], *spec[2:]):
        return  # allowed -> nothing to prove
    try:
        expr = constraints_to_expression([spec], t.schema)
        matches = t.filter(expr).num_rows
    except Exception:
        matches = 0  # an unevaluable predicate matches nothing
    assert matches == 0, (
        f"zone pruned a file with {matches} matching rows: {spec}, "
        f"zone={doc['cols'][col] if col in doc['cols'] else None}"
    )
