"""X1–X8 extraction: render→extract round trip preserves the interleaved
span sequence (the per-row invariant from BASELINE.json input_hint)."""

from crawler_service_spark.functions.html import extract_page, render_html
from crawler_service_spark.sources.corpus import build_store_pandas, host_blocks, doc_record


def test_round_trip_simple():
    spans = [
        {"kind": "title", "text": "hello world", "media_ref": None, "offset": 0},
        {"kind": "meta", "text": "a desc", "media_ref": None, "offset": 1},
        {"kind": "h1", "text": "head", "media_ref": None, "offset": 2},
        {"kind": "text", "text": "body text here", "media_ref": None, "offset": 3},
        {"kind": "media", "text": "alt a", "media_ref": "/img/1.png", "offset": 4},
        {"kind": "link", "text": "/page/2", "media_ref": None, "offset": 5},
    ]
    html = render_html(spans)
    ext = extract_page(html, "https://h.example.com/page/1")
    assert ext["spans"] == spans
    assert ext["title"] == "hello world"
    assert ext["meta_description"] == "a desc"
    assert ext["headings"]["h1"] == ["head"]
    assert ext["images"] == ["https://h.example.com/img/1.png"]
    assert ext["image_alt_text"] == ["alt a"]
    assert ext["links"] == ["https://h.example.com/page/2"]
    assert "hello world" in ext["text_content"]


def test_escaping_round_trip():
    spans = [
        {"kind": "title", "text": 'a<b>&"c', "media_ref": None, "offset": 0},
        {"kind": "text", "text": "x & y < z", "media_ref": None, "offset": 1},
    ]
    ext = extract_page(render_html(spans), "https://h/")
    assert ext["spans"] == spans


def test_corpus_round_trip():
    store = build_store_pandas(n_docs=120, n_hosts=6)
    for _, row in store.iterrows():
        ext = extract_page(row["html"], row["doc_id"])
        assert ext["spans"] == row["spans"], row["doc_id"]
        # every out_link appears as a link span in order
        hrefs = [s["text"] for s in ext["spans"] if s["kind"] == "link"]
        assert hrefs == row["out_links"]


def test_flags_disable_outputs():
    blocks = host_blocks(10, 2)
    rec = doc_record(4, blocks)  # i%2==0 -> h2 present, i%3!=0, media 4%3=1
    ext = extract_page(rec["html"], rec["doc_id"], extract_links=False,
                       extract_images=False, extract_text=False)
    assert ext["links"] == []
    assert ext["images"] == []
    assert ext["text_content"] is None
    # spans still carry the full sequence (storage contract, not flag-gated)
    assert len(ext["spans"]) == len(rec["spans"])
