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
URL (X8). BeautifulSoup is not available in this container, and the HTML
is produced by `render_html` below, so a strict regex parser is exact on
this grammar (and ~10× faster inside Arrow batches).

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
        text_content = _WS_RE.sub(" ", " ".join(text_parts)).strip()

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
