"""Property-based tests (SURVEY §5.5): pure-Python properties of the
shared leaf functions — no Spark session needed, so hypothesis can run
hundreds of cases cheaply.

* canonicalization is idempotent: canon(canon(u)) == canon(u);
* canonicalization never raises (parse-failure passthrough,
  crawler.py:472-474 semantics);
* the politeness virtual schedule obeys the invariant: at most ``limit``
  fetches per host per window, FIFO order preserved;
* span render/extract round trip: extract(render(spans)) == spans.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_service_spark.functions.html import extract_page, render_html
from crawler_service_spark.functions.urls import canonicalize_url, host_of

# URL-ish strings: a mix of well-formed and garbage
_scheme = st.sampled_from(["http", "https", "HTTP", "ftp", "weird+x"])
_host = st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_path = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,10}){0,4}/?", fullmatch=True)
_query = st.sampled_from(
    ["", "?b=2&a=1", "?a=1&a=0", "?k=", "?x=%20y", "?a=1&b=2&c=3"]
)
_frag = st.sampled_from(["", "#f", "#frag-1"])

well_formed = st.builds(
    lambda s, h, po, pa, q, f: f"{s}://{h}{po}{pa}{q}{f}",
    _scheme, _host, _port, _path, _query, _frag,
)
garbage = st.text(min_size=0, max_size=40)
urls = st.one_of(well_formed, garbage)


@given(urls)
@settings(max_examples=300, deadline=None)
def test_canon_idempotent(u):
    once = canonicalize_url(u, sort_query=True)
    assert canonicalize_url(once, sort_query=True) == once


@given(urls)
@settings(max_examples=300, deadline=None)
def test_canon_total_and_host_total(u):
    # never raises; host extraction never raises either
    canonicalize_url(u, sort_query=True)
    canonicalize_url(u, sort_query=False)
    host_of(u)


@given(st.integers(1, 20), st.integers(1, 200))
@settings(max_examples=50, deadline=None)
def test_politeness_schedule_invariant(limit, n):
    """virtual_fetch_time = floor((rn-1)/limit)*window ⇒ at most `limit`
    fetches per host in any [t, t+window) and FIFO within host."""
    window = 60.0
    times = [(rn // limit) * window for rn in range(n)]
    for start in set(times):
        assert sum(1 for t in times if start <= t < start + window) <= limit
    assert times == sorted(times)


# render_html emits head-kinds (title/meta) before body-kinds, so the
# round-trip property holds for span sequences in that grammar order —
# exactly the corpus's shape (sources/corpus.py doc_record).
_head_kinds = st.sampled_from(["title", "meta"])
_body_kinds = st.sampled_from(["h1", "h2", "h3", "text", "media", "link"])
_span_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)


@given(
    st.lists(st.tuples(_head_kinds, _span_text), min_size=0, max_size=4),
    st.lists(st.tuples(_body_kinds, _span_text), min_size=0, max_size=10),
)
@settings(max_examples=200, deadline=None)
def test_span_render_extract_round_trip(head, body):
    spans = []
    for i, (kind, text) in enumerate(head + body):
        spans.append({
            "kind": kind,
            "text": text,
            "media_ref": f"/img/{i}.png" if kind == "media" else None,
            "offset": i,
        })
    ext = extract_page(render_html(spans), "https://h.example.com/p")
    got = [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ext["spans"]
    ]
    want = [
        (s["kind"], s["text"], s["media_ref"] if s["kind"] == "media" else None, s["offset"])
        for s in spans
    ]
    assert got == want
