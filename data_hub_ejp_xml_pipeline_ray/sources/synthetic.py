"""Deterministic synthetic data: HTML page grammar + CDC WAL segments.

Mirrors the reference's programmatic fixture construction
(``tests/unit_test/utils/dict_to_xml.py:33-60`` builds XML from dicts,
then tests assert golden parsed output): pages are assembled from a
seeded template grammar so the expected extracted ``text`` is computable
independently of the engine's extractor, and WAL segments cover every
FIXTURES.md §3 scenario — hot-key skew, out-of-order ``warc_ts``,
exact-``warc_ts`` ties broken by ``seq``, deletes, entity-decode corpus,
and schema-v2 segments interleaved with v1.

Everything is a pure function of the seed — no clocks, no ambient
randomness — so replay and resume tests are deterministic.
"""
from __future__ import annotations

import html as html_mod
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import EVENTS_SCHEMA_V1, EVENTS_SCHEMA_V2

_WORDS = (
    "the quick brown fox jumps over lazy dog stream merge shuffle partition "
    "arrow block actor lake upsert delta commit manifest watermark lineage "
    "crawl page fetch index token corpus sample batch schema column"
).split()

_ENTITIES = ["&amp;", "&apos;", "&quot;", "&#233;", "&#x00fc;", "&amp;apos;", "&lt;b&gt;"]

_TAGS = ["p", "div", "span", "li", "h1", "em"]


def _text_chunk(rng: random.Random) -> str:
    words = rng.choices(_WORDS, k=rng.randint(3, 12))
    if rng.random() < 0.4:
        words.insert(rng.randrange(len(words)), rng.choice(_ENTITIES))
    return " ".join(words)


def generate_page(rng: random.Random, version: int = 0) -> tuple[bytes, str]:
    """Build one HTML page; returns ``(html_bytes, expected_text)``.

    ``expected_text`` is the ground truth for the byte-identical
    extraction invariant: double ``html.unescape`` over the concatenated
    text chunks (see :mod:`..functions.text` for why double).
    """
    pieces: list[str] = []
    raw_text: list[str] = []
    pieces.append(f"<!DOCTYPE html><html><head><title>v{version}</title></head><body>")
    raw_text.append(f"v{version}")
    for _ in range(rng.randint(2, 8)):
        kind = rng.random()
        if kind < 0.55:
            tag = rng.choice(_TAGS)
            chunk = _text_chunk(rng)
            attr = ' class="c%d"' % rng.randint(0, 9) if rng.random() < 0.3 else ""
            closing = f"</{tag}>" if rng.random() < 0.85 else ""  # unclosed tags: lenient parse
            pieces.append(f"<{tag}{attr}>{chunk}{closing}")
            raw_text.append(chunk)
        elif kind < 0.7:
            pieces.append(f"<!-- comment {rng.randint(0, 999)} <b>ignored</b> -->")
        elif kind < 0.85:
            pieces.append(f"<script type='text/javascript'>var x = {rng.randint(0, 99)} < 5;</script>")
        else:
            pieces.append(f"<style>.c{rng.randint(0, 9)} {{ color: red }}</style>")
    pieces.append("</body></html>")
    raw = "".join(pieces)
    expected = html_mod.unescape(html_mod.unescape("".join(raw_text)))
    return raw.encode("utf-8"), expected


def generate_rich_page(rng: random.Random, version: int = 0) -> tuple[bytes, dict]:
    """Page with links, headings and a title, plus the ground-truth
    entity record (title/links/headings) for the nested-extraction
    tests. Entity truth mirrors :mod:`..stages.entities` semantics:
    fragment text is markup-stripped + double-unescaped."""
    pieces: list[str] = []
    truth = {"title": None, "links": [], "headings": []}
    title_words = " ".join(rng.choices(_WORDS, k=3))
    truth["title"] = title_words
    pieces.append(f"<html><head><title>{title_words}</title></head><body>")
    n_links = rng.randint(0, 5)
    n_heads = rng.randint(0, 3)
    for i in range(n_heads):
        level = rng.randint(1, 3)
        text = " ".join(rng.choices(_WORDS, k=4))
        pieces.append(f"<h{level}>{text}</h{level}>")
        truth["headings"].append({"level": level, "text": text})
    for i in range(n_links):
        href = f"https://site-{rng.randint(0, 99)}.example/x/{rng.randint(0, 999)}"
        anchor = " ".join(rng.choices(_WORDS, k=2))
        entity = rng.random() < 0.3
        shown_anchor = anchor + (" &amp; more" if entity else "")
        expected_anchor = anchor + (" & more" if entity else "")
        pieces.append(f'<a href="{href}"><b>{shown_anchor}</b></a>')
        truth["links"].append(
            {"href": href, "anchor": expected_anchor, "link_index": i}
        )
    pieces.append(f"<p>{_text_chunk(rng)}</p></body></html>")
    return "".join(pieces).encode("utf-8"), truth


def make_url(i: int, rng: random.Random) -> str:
    return f"https://site-{i}.example/p/{rng.randint(0, 9999):04d}"


def write_segment_jsonl(table: pa.Table, path: str) -> None:
    """Serialize a WAL segment as newline-delimited JSON — the classic
    CDC wire encoding (Debezium/Maxwell-style change records). Canonical
    conventions, mirrored by the reader's type canon in
    :mod:`.wal`:

    * timestamps → ISO-8601 strings (tz-aware, ``+00:00`` offset);
    * ``html`` bytes → UTF-8 text (JSON has no binary type; the wire
      format is therefore limited to UTF-8 page payloads — a documented
      JSONL-wire restriction, not an engine one);
    * absent columns (schema v1 rows) simply omit the key.
    """
    import json as _json

    rows = table.to_pylist()
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            enc = {}
            for k, v in r.items():
                if isinstance(v, bytes):
                    v = v.decode("utf-8")
                elif isinstance(v, datetime):
                    v = v.isoformat()
                enc[k] = v
            f.write(_json.dumps(enc, ensure_ascii=False) + "\n")


def generate_wal(
    wal_dir: str,
    *,
    seed: int = 42,
    n_urls: int = 100,
    n_events: int = 1_000,
    n_segments: int = 10,
    hot_fraction: float = 0.02,
    hot_mass: float = 0.5,
    delete_fraction: float = 0.05,
    tie_fraction: float = 0.05,
    v2_from_segment: int | None = None,
    start_segment: int = 0,
    rich_pages: bool = False,
    segment_format: str = "parquet",
) -> list[str]:
    """Write ``n_segments`` WAL segment parquet files under ``wal_dir``.

    * ~``hot_fraction`` of urls receive ~``hot_mass`` of all events (skew).
    * ``warc_ts`` is NOT monotonic in ``seq`` (out-of-order events), but
      ``seq`` is globally monotonic per url (the tiebreak invariant).
    * ~``tie_fraction`` of update events reuse the url's previous
      ``warc_ts`` exactly (same-timestamp ties, LWW resolved by ``seq``).
    * Segments with index >= ``v2_from_segment`` are schema v2
      (``content_type`` added, ``fetch_status`` widened to int64).
    * ``segment_format="jsonl"`` writes newline-delimited-JSON segments
      (:func:`write_segment_jsonl`) instead of parquet — same logical
      rows, the tailer's second wire format.

    Returns the list of segment paths written.
    """
    rng = random.Random(seed)
    os.makedirs(wal_dir, exist_ok=True)

    urls = [make_url(i, rng) for i in range(n_urls)]
    n_hot = max(1, int(n_urls * hot_fraction))
    hot = urls[:n_hot]
    cold = urls[n_hot:]

    base_ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    seq_counter: dict[str, int] = {}
    last_ts: dict[str, datetime] = {}
    seen: set[str] = set()
    page_version: dict[str, int] = {}

    per_segment = max(1, n_events // n_segments)
    paths: list[str] = []
    ev_global = 0
    for seg_i in range(n_segments):
        is_v2 = v2_from_segment is not None and seg_i >= v2_from_segment
        rows = {
            "op": [], "url": [], "warc_ts": [], "seq": [], "html": [],
            "lang": [], "schema_version": [], "fetch_status": [],
        }
        if is_v2:
            rows["content_type"] = []
        for _ in range(per_segment):
            if rng.random() < hot_mass and hot:
                url = rng.choice(hot)
            else:
                url = rng.choice(cold or hot)
            first = url not in seen
            if first:
                op = "insert"
            elif rng.random() < delete_fraction:
                op = "delete"
            else:
                op = "update"
            seen.add(url)
            seq = seq_counter.get(url, 0)
            seq_counter[url] = seq + 1
            if not first and url in last_ts and rng.random() < tie_fraction:
                ts = last_ts[url]  # exact tie: LWW must fall back to seq
            else:
                # out-of-order: event time jitters backwards up to 1h
                ts = (
                    base_ts
                    + timedelta(seconds=ev_global * 7)
                    - timedelta(seconds=rng.randint(0, 3600))
                )
            last_ts[url] = ts
            if op == "delete":
                page_html, lang = None, None
            else:
                v = page_version.get(url, 0)
                page_version[url] = v + 1
                if rich_pages:  # title/link/heading entity grammar
                    page_html, _ = generate_rich_page(rng, version=v)
                else:
                    page_html, _ = generate_page(rng, version=v)
                lang = rng.choice(["en", "de", "fr", "es", "zh"])
            rows["op"].append(op)
            rows["url"].append(url)
            rows["warc_ts"].append(ts)
            rows["seq"].append(seq)
            rows["html"].append(page_html)
            rows["lang"].append(lang)
            rows["schema_version"].append(2 if is_v2 else 1)
            rows["fetch_status"].append(rng.choice([200, 200, 200, 301, 404]))
            if is_v2:
                rows["content_type"].append(rng.choice(["text/html", "application/xhtml+xml"]))
            ev_global += 1
        schema = EVENTS_SCHEMA_V2 if is_v2 else EVENTS_SCHEMA_V1
        table = pa.Table.from_pydict(rows, schema=schema)
        if segment_format == "jsonl":
            path = os.path.join(
                wal_dir, f"segment-{start_segment + seg_i:05d}.jsonl"
            )
            write_segment_jsonl(table, path)
        else:
            path = os.path.join(
                wal_dir, f"segment-{start_segment + seg_i:05d}.parquet"
            )
            pq.write_table(table, path)
        paths.append(path)
    return paths


def derive_wal_from_events(
    events_path: str,
    wal_dir: str,
    *,
    n_segments: int = 8,
    entity_html: bool = False,
    text_mod: int | None = None,
) -> list[str]:
    """Derive a deterministic CDC WAL from a driver ``events`` parquet
    table, so the final lake state is expressible as PURE SQL over the
    same table (the driver-oracle trick for the flagship pipelines):

    * ``url``     = ``https://u<user_id>.example/page``  (key = user)
    * ``warc_ts`` = ``ts`` (read as UTC), ``seq`` = ``event_id``
    * ``op``      = ``delete`` when ``event_type = 'error'`` else ``update``
    * ``html``    — tag/entity-free plain text (page lake: extracted
      ``text`` == the html string), or, with ``entity_html``, a fixed
      title/h1/link skeleton whose parsed entities are SQL literals
    * ``lang``    = ``event_type``

    Segments slice the event_id order; ``warc_ts`` stays naturally
    out-of-order per url across segments (the LWW stress the real WAL
    generator also exercises)."""
    import pyarrow.compute as pc

    t = pq.read_table(
        events_path, columns=["event_id", "ts", "user_id", "event_type"]
    ).sort_by("event_id")
    n = t.num_rows
    user_s = pc.cast(t.column("user_id"), pa.string())
    eid_s = pc.cast(t.column("event_id"), pa.string())
    sep = pa.scalar("", pa.string())
    url = pc.binary_join_element_wise("https://u", user_s, ".example/page", sep)
    is_del = pc.equal(t.column("event_type"), "error")
    op = pc.if_else(is_del, "delete", "update")
    if entity_html:
        html = pc.binary_join_element_wise(
            "<html><head><title>T", user_s, "</title></head><body><h1>H",
            eid_s, '</h1><a href="https://l', eid_s, '.example/">A', eid_s,
            "</a></body></html>", sep,
        )
    elif text_mod is not None:
        # COLLIDING texts (cross-url duplicates) for the dedup-index
        # oracles: the winning text per url is 'page rev <eid % mod>',
        # so ~mod distinct texts span the whole lake and group-by-text
        # is expressible as the same arithmetic in SQL
        mod_s = pc.cast(
            pc.subtract(
                t.column("event_id"),
                pc.multiply(
                    pc.divide(t.column("event_id"), text_mod), text_mod
                ),
            ),
            pa.string(),
        )
        html = pc.binary_join_element_wise("page rev ", mod_s, sep)
    else:
        html = pc.binary_join_element_wise("page u", user_s, " rev ", eid_s, sep)
    html = pc.if_else(is_del, pa.scalar(None, pa.string()), html)
    wire = pa.table(
        {
            "op": op,
            "url": url,
            "warc_ts": pc.assume_timezone(t.column("ts"), "UTC"),
            "seq": t.column("event_id"),
            "html": pc.cast(html, pa.binary()),
            "lang": t.column("event_type"),
            "schema_version": pa.array([1] * n, pa.int32()),
            "fetch_status": pa.array([200] * n, pa.int32()),
        },
        schema=EVENTS_SCHEMA_V1,
    )
    os.makedirs(wal_dir, exist_ok=True)
    per = max(1, (n + n_segments - 1) // n_segments)
    paths = []
    for i in range(0, n, per):
        seg = wire.slice(i, per)
        path = os.path.join(wal_dir, f"segment-{i // per:05d}.parquet")
        pq.write_table(seg, path)
        paths.append(path)
    return paths


def naive_replay(event_tables: list[pa.Table]) -> dict[str, dict]:
    """Independent LWW replay oracle: fold all events in (warc_ts, seq)
    order per url; final state = payload of the winning event unless it
    is a delete. Used by tests to check the distributed merge; must stay
    a trivially-auditable pure-Python reduction."""
    best: dict[str, dict] = {}
    for table in event_tables:
        for row in table.to_pylist():
            url = row["url"]
            key = (row["warc_ts"], row["seq"])
            cur = best.get(url)
            if cur is None or key > (cur["warc_ts"], cur["seq"]):
                best[url] = row
    return {
        url: row for url, row in best.items() if row["op"] != "delete"
    }
