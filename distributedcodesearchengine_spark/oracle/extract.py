"""Oracle html -> text extractor.

The web-corpus analog of the reference's file read + parse step
(``codesearch/parser/python_parser.py:35-42``): decode the raw bytes as
UTF-8 with ``errors='replace'`` (MANDATORY for byte-identity — the
reference uses exactly this mode), then extract the body text.

Extraction semantics (robust to real pages, not just the synthetic
wrapper; the reference's analog of its per-language AST extractors,
python_parser.py:78-97 / javascript_parser.py:78-113):

1. strip ``<!-- -->`` comments and ``<script>``/``<style>`` elements
   (attributes allowed, case-insensitive);
2. if the page has ``<p>`` elements (attributes allowed), the text is
   the tag-stripped inner content of each paragraph, joined by
   newlines;
3. otherwise, tag-strip the whole remaining document;
4. decode numeric (&#NN; / &#xHH;) and the common named entities,
   ``&amp;`` last so escaped entities stay escaped.

The per-row invariant (BASELINE.json input_hint) is that
``extract_text(html) == text`` byte-identically per url: the synthetic
corpus wraps ``text`` as
``<html><head><title>..</title></head><body><p>{text}</p></body></html>``
(FIXTURES.md §1) and ``text`` never contains ``<`` or ``&``, so every
step above is the identity on it — asserted in tests/test_extract.py,
plus adversarial property tests for the robustness paths.
"""

from __future__ import annotations

import re

_COMMENT = re.compile(r"(?s)<!--.*?-->")
_SCRIPT_STYLE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_P_ITEM = re.compile(r"(?s)<[pP]\b[^>]*>(.*?)</[pP]\s*>")
_TAG = re.compile(r"(?s)<[^>]*>")

_NUM_ENT = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_NAMED_ENTS = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: "&amp;lt;" must decode to the literal "&lt;"
]


def _chr_ent(m: re.Match) -> str:
    v = m.group(1)
    try:
        return chr(int(v[1:], 16) if v[0] in "xX" else int(v))
    except (ValueError, OverflowError):
        return m.group(0)


def _decode_entities(s: str) -> str:
    if "&" not in s:
        return s
    s = _NUM_ENT.sub(_chr_ent, s)
    for k, v in _NAMED_ENTS:
        s = s.replace(k, v)
    return s


def extract_text(html: bytes) -> str:
    s = html.decode("utf-8", errors="replace")
    s = _COMMENT.sub("", s)
    s = _SCRIPT_STYLE.sub("", s)
    paras = _P_ITEM.findall(s)
    if paras:
        out = "\n".join(_TAG.sub("", p) for p in paras)
    else:
        out = _TAG.sub("", s)
    return _decode_entities(out)
