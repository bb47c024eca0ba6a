"""Deterministic HTML rendering + extraction (SURVEY.md §2 X1–X8).

The synthetic corpus renders each document's interleaved span sequence
(`input_hint` shape: array<struct<kind,text,media_ref,offset>>) into HTML;
the engine's extraction stage parses it back. The per-row invariant —
span-sequence equality on (kind, text, media_ref, order) — is a round
trip: extract(render(spans)) == spans.

Extraction mirrors the reference's BeautifulSoup pipeline
(/root/reference/app/services/crawler.py:284-344): title (X2), meta
description (X3), whitespace-collapsed text content (X4), images + alt
text (X5), absolute http(s) links (X6), h1–h3 headings (X7), canonical
URL (X8).

Two parsers, auto-dispatched per page (`extract_page_auto`):

* `extract_page` — strict regex tokenizer, exact and ~10× faster on the
  corpus grammar `render_html` emits (verified per page by
  `is_corpus_grammar`).
* `extract_page_tolerant` — stdlib ``html.parser.HTMLParser`` (the very
  parser the reference hands to BeautifulSoup) for arbitrary real-world
  HTML: uppercase tags, single/no quotes, reordered or extra attributes,
  nested inline tags, unclosed elements, script/style stripping. Equal
  to the strict parser on the corpus grammar (property-tested), so the
  oracle-equality contracts are unchanged.

These are plain functions: the engine calls them inside `mapInPandas`
batches (operators/extract.py); the oracle simulator calls them directly.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

# span kinds
TEXT_KINDS = ("title", "meta", "h1", "h2", "h3", "text")
ALL_KINDS = TEXT_KINDS + ("media", "link", "canonical")

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]


def _esc(s: str) -> str:
    for raw, enc in _ESCAPES:
        s = s.replace(raw, enc)
    return s


def _unesc(s: str) -> str:
    for raw, enc in reversed(_ESCAPES):
        s = s.replace(enc, raw)
    return s


def render_html(spans: list[dict]) -> str:
    """Render an interleaved span sequence to HTML, preserving order.

    `spans` rows: {kind, text, media_ref, offset}; `text` holds the href
    for kind='link' and the alt text for kind='media' (FIXTURES.md §2).
    """
    out = ["<html><head>"]
    body = []
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span["kind"]
        text = _esc(span.get("text") or "")
        ref = _esc(span.get("media_ref") or "")
        if kind == "title":
            out.append(f"<title>{text}</title>")
        elif kind == "meta":
            out.append(f'<meta name="description" content="{text}">')
        elif kind == "canonical":
            out.append(f'<link rel="canonical" href="{text}">')
        elif kind in ("h1", "h2", "h3"):
            body.append(f"<{kind}>{text}</{kind}>")
        elif kind == "text":
            body.append(f"<p>{text}</p>")
        elif kind == "media":
            body.append(f'<img src="{ref}" alt="{text}">')
        elif kind == "link":
            body.append(f'<a href="{text}">go</a>')
        else:
            raise ValueError(f"unknown span kind: {kind}")
    out.append("</head><body>")
    out.extend(body)
    out.append("</body></html>")
    return "".join(out)


_TOKEN_RE = re.compile(
    r"<title>(?P<title>.*?)</title>"
    r'|<meta name="description" content="(?P<meta>.*?)">'
    r'|<link rel="canonical" href="(?P<canonical>.*?)">'
    r"|<h(?P<hlvl>[123])>(?P<htext>.*?)</h[123]>"
    r"|<p>(?P<p>.*?)</p>"
    r'|<img src="(?P<src>.*?)" alt="(?P<alt>.*?)">'
    r'|<a href="(?P<href>.*?)">(?P<anchor>.*?)</a>'
)

_WS_RE = re.compile(r"\s+")


def extract_page(
    html: str,
    base_url: str,
    *,
    extract_text: bool = True,
    extract_images: bool = True,
    extract_links: bool = True,
    extract_headings: bool = True,
    extract_image_alt_text: bool = True,
    extract_canonical_url: bool = True,
) -> dict:
    """Parse rendered HTML back into the reference's extraction outputs.

    Returns dict with keys: title, meta_description, text_content, images,
    links, headings, image_alt_text, canonical_url, spans. Flag semantics
    follow crawler.py:286-344 (title/meta are always extracted; the rest
    are flag-gated; links are urljoined and filtered to http(s),
    crawler.py:325-327).
    """
    title = None
    meta_description = None
    canonical_url = None
    text_parts: list[str] = []
    images: list[str] = []
    image_alt_text: list[str] = []
    links: list[str] = []
    headings: dict[str, list[str]] = {"h1": [], "h2": [], "h3": []}
    spans: list[dict] = []
    offset = 0

    for m in _TOKEN_RE.finditer(html):
        kind_text = None
        if m.group("title") is not None:
            if title is None:  # first <title> wins (crawler.py:287)
                title = _unesc(m.group("title")).strip()
            kind_text = ("title", _unesc(m.group("title")), None)
            text_parts.append(_unesc(m.group("title")))
        elif m.group("meta") is not None:
            if meta_description is None:
                meta_description = _unesc(m.group("meta")).strip()
            kind_text = ("meta", _unesc(m.group("meta")), None)
        elif m.group("canonical") is not None:
            href = _unesc(m.group("canonical"))
            if extract_canonical_url and canonical_url is None and href:
                canonical_url = urljoin(base_url, href)
            kind_text = ("canonical", href, None)
        elif m.group("hlvl") is not None:
            lvl = "h" + m.group("hlvl")
            text = _unesc(m.group("htext"))
            if extract_headings and text.strip():
                headings[lvl].append(text.strip())
            kind_text = (lvl, text, None)
            text_parts.append(text)
        elif m.group("p") is not None:
            text = _unesc(m.group("p"))
            kind_text = ("text", text, None)
            text_parts.append(text)
        elif m.group("src") is not None:
            src = _unesc(m.group("src"))
            alt = _unesc(m.group("alt"))
            if extract_images and src:
                images.append(urljoin(base_url, src))
            if extract_image_alt_text and alt.strip():
                image_alt_text.append(alt.strip())
            kind_text = ("media", alt, src)
        elif m.group("href") is not None:
            href = _unesc(m.group("href"))
            if extract_links and href:
                absolute = urljoin(base_url, href)
                if absolute.startswith(("http://", "https://")):
                    links.append(absolute)
            kind_text = ("link", href, None)
            text_parts.append(_unesc(m.group("anchor")))
        if kind_text is not None:
            spans.append(
                {
                    "kind": kind_text[0],
                    "text": kind_text[1],
                    "media_ref": kind_text[2],
                    "offset": offset,
                }
            )
            offset += 1

    text_content = None
    if extract_text:
        # BS4 get_text() parity (crawler.py:299): adjacent text nodes
        # CONCATENATE with no separator, then collapse whitespace —
        # `a<b>b</b>` yields "ab", not "a b"
        text_content = _WS_RE.sub(" ", "".join(text_parts)).strip()

    return {
        "title": title,
        "meta_description": meta_description,
        "text_content": text_content,
        "images": images,
        "links": links,
        "headings": headings,
        "image_alt_text": image_alt_text,
        "canonical_url": canonical_url,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# Tolerant path: stdlib HTMLParser for arbitrary real-world HTML
# ---------------------------------------------------------------------------

# sound (never-false-positive) recognizer for render_html's exact output:
# escaped text/attrs contain no raw < > ", so each token is delimited
_GRAMMAR_RE = re.compile(
    r"<html><head>"
    r'(?:<title>[^<>]*</title>'
    r'|<meta name="description" content="[^<>"]*">'
    r'|<link rel="canonical" href="[^<>"]*">)*'
    r"</head><body>"
    r'(?:<h([123])>[^<>]*</h\1>'
    r"|<p>[^<>]*</p>"
    r'|<img src="[^<>"]*" alt="[^<>"]*">'
    r'|<a href="[^<>"]*">[^<>]*</a>)*'
    r"</body></html>\Z"
)


def is_corpus_grammar(html: str) -> bool:
    """True iff ``html`` is provably `render_html` output, where the
    strict regex tokenizer is exact."""
    return _GRAMMAR_RE.match(html) is not None


from html.parser import HTMLParser as _HTMLParser

_CAPTURE_TAGS = frozenset(("title", "h1", "h2", "h3", "p"))
_VOID_TAGS = frozenset((
    "img", "meta", "link", "br", "hr", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
))


class _TolerantExtractor(_HTMLParser):
    """Event collector mirroring the reference's BeautifulSoup usage
    (crawler.py:284-344) on messy HTML: html.parser lowercases tag and
    attribute names, accepts single/un-quoted and reordered attributes,
    and decodes character references (convert_charrefs)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.events: list[tuple[str, str, str | None]] = []
        self.text_parts: list[str] = []
        self._captures: list[tuple[str, list[str]]] = []  # nested title/h*/p
        self._suppress = 0                                # inside script/style

    # -- helpers
    def _attr(self, attrs, name, default=None):
        for k, v in attrs:
            if k == name:
                return v if v is not None else ""
        return default

    def _open_capture(self, tag):
        self._captures.append((tag, []))

    def _close_capture(self, tag):
        # close the nearest matching capture; auto-close any deeper
        # unclosed captures the way html.parser's tree-builders would
        while self._captures:
            open_tag, parts = self._captures.pop()
            text = "".join(parts)
            kind = "text" if open_tag == "p" else open_tag
            self.events.append((kind, text, None))
            if open_tag == tag:
                return

    # -- parser hooks
    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._suppress += 1
            return
        if tag in _CAPTURE_TAGS:
            self._open_capture(tag)
        elif tag == "meta":
            if self._attr(attrs, "name") == "description":
                self.events.append(
                    ("meta", (self._attr(attrs, "content") or ""), None))
        elif tag == "link":
            rel = (self._attr(attrs, "rel") or "").lower().split()
            href = self._attr(attrs, "href")
            if "canonical" in rel and href is not None:
                self.events.append(("canonical", href, None))
        elif tag == "img":
            src = self._attr(attrs, "src")
            alt = self._attr(attrs, "alt") or ""
            self.events.append(("media", alt, src))
        elif tag == "a":
            href = self._attr(attrs, "href")
            if href is not None:
                self.events.append(("link", href, None))

    def handle_startendtag(self, tag, attrs):
        if tag in _VOID_TAGS or tag not in _CAPTURE_TAGS:
            self.handle_starttag(tag, attrs)
            if tag in ("script", "style"):
                self._suppress = max(0, self._suppress - 1)
        else:  # <p/> style self-closed container: empty element
            self._open_capture(tag)
            self._close_capture(tag)

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._suppress = max(0, self._suppress - 1)
            return
        if tag in _CAPTURE_TAGS and any(t == tag for t, _ in self._captures):
            self._close_capture(tag)

    def handle_data(self, data):
        if self._suppress:
            return
        if data:
            self.text_parts.append(data)
            for _, parts in self._captures:
                parts.append(data)

    def close(self):
        super().close()
        while self._captures:           # unclosed containers at EOF
            self._close_capture(self._captures[-1][0])


def extract_page_tolerant(
    html: str,
    base_url: str,
    *,
    extract_text: bool = True,
    extract_images: bool = True,
    extract_links: bool = True,
    extract_headings: bool = True,
    extract_image_alt_text: bool = True,
    extract_canonical_url: bool = True,
) -> dict:
    """`extract_page` semantics over arbitrary HTML via stdlib
    HTMLParser. Identical output to the strict parser on the corpus
    grammar; on real-world HTML it mirrors the reference's BeautifulSoup
    calls (first title / first meta-description / first canonical win;
    every img/a/h1-3 collected; script+style text dropped; text nodes
    concatenated with no separator per ``get_text()`` then
    whitespace-collapsed — crawler.py:299-300)."""
    p = _TolerantExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # salvage whatever was parsed before the error

    title = None
    meta_description = None
    canonical_url = None
    images: list[str] = []
    image_alt_text: list[str] = []
    links: list[str] = []
    headings: dict[str, list[str]] = {"h1": [], "h2": [], "h3": []}
    spans: list[dict] = []

    for offset, (kind, text, ref) in enumerate(p.events):
        if kind == "title" and title is None:
            title = text.strip()
        elif kind == "meta" and meta_description is None:
            meta_description = text.strip()
        elif kind == "canonical":
            if extract_canonical_url and canonical_url is None and text:
                canonical_url = urljoin(base_url, text)
        elif kind in ("h1", "h2", "h3"):
            if extract_headings and text.strip():
                headings[kind].append(text.strip())
        elif kind == "media":
            if extract_images and ref:
                images.append(urljoin(base_url, ref))
            if extract_image_alt_text and text.strip():
                image_alt_text.append(text.strip())
        elif kind == "link":
            if extract_links and text:
                absolute = urljoin(base_url, text)
                if absolute.startswith(("http://", "https://")):
                    links.append(absolute)
        spans.append({"kind": kind, "text": text, "media_ref": ref,
                      "offset": offset})

    text_content = None
    if extract_text:
        # get_text() concatenation semantics — see extract_page
        text_content = _WS_RE.sub(" ", "".join(p.text_parts)).strip()

    return {
        "title": title,
        "meta_description": meta_description,
        "text_content": text_content,
        "images": images,
        "links": links,
        "headings": headings,
        "image_alt_text": image_alt_text,
        "canonical_url": canonical_url,
        "spans": spans,
    }


def extract_page_auto(html: str, base_url: str, **flags) -> dict:
    """Per-page dispatch: strict tokenizer on provable corpus grammar,
    tolerant HTMLParser otherwise."""
    if is_corpus_grammar(html):
        return extract_page(html, base_url, **flags)
    return extract_page_tolerant(html, base_url, **flags)
