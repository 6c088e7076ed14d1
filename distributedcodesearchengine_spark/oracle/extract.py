"""Oracle html -> text extractor.

The web-corpus analog of the reference's file read + parse step
(``codesearch/parser/python_parser.py:35-42``): decode the raw bytes as
UTF-8 with ``errors='replace'`` (MANDATORY for byte-identity — the
reference uses exactly this mode), then extract the body text.

Contract: the synthetic pages corpus wraps ``text`` as
``<html><head><title>..</title></head><body><p>{text}</p></body></html>``
(FIXTURES.md §1), so extraction is "first ``<p>`` to last ``</p>``";
for html without a ``<p>`` element we fall back to stripping all tags.
The per-row invariant (BASELINE.json input_hint) is that
``extract_text(html) == text`` byte-identically per url.
"""

from __future__ import annotations

import re

_P_BODY = re.compile(r"(?s)<p>(.*)</p>")
_TAG = re.compile(r"(?s)<[^>]*>")


def extract_text(html: bytes) -> str:
    s = html.decode("utf-8", errors="replace")
    m = _P_BODY.search(s)
    if m:
        return m.group(1)
    return _TAG.sub("", s)
