"""HTML wrapper / extractor — byte-identical text recovery per url.

The corpus generator wraps each document's text in a fixed HTML template;
the extractor recovers the text **byte-identically** (BASELINE.json:15
invariant). No entity decoding, no whitespace normalization, no unicode
normalization — CRLF and trailing whitespace survive the round trip
(mirrors the reference's byte-fidelity rules, src/filesystem.cpp:46-54).

Both directions are also expressible as native SQL (Spark and DuckDB):

    wrap:    concat('<html><head><title>', url, '</title></head><body><pre>',
                    text, '</pre></body></html>')
    extract: the text between the first '<pre>' and the last '</pre>'
"""

from __future__ import annotations

_PRE_OPEN = "<pre>"
_PRE_CLOSE = "</pre>"
_PRE_OPEN_B = b"<pre>"
_PRE_CLOSE_B = b"</pre>"


def wrap_html(text: str, url: str = "") -> bytes:
    """Deterministic HTML wrapper; UTF-8 bytes for the ``html`` column."""
    return (
        "<html><head><title>" + url + "</title></head><body>"
        + _PRE_OPEN + text + _PRE_CLOSE + "</body></html>"
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    """Recover the wrapped text byte-identically.

    Takes the span between the *first* ``<pre>`` and the *last*
    ``</pre>`` so text containing the markers round-trips as long as the
    outermost pair is the template's. Returns "" when no marker pair is
    present (non-template page).
    """
    start = html.find(_PRE_OPEN_B)
    if start == -1:
        return ""
    start += len(_PRE_OPEN_B)
    end = html.rfind(_PRE_CLOSE_B)
    if end == -1 or end < start:
        return ""
    return html[start:end].decode("utf-8", errors="surrogateescape")
