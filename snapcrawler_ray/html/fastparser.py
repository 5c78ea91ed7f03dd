"""Fast HTML tokenizer with a strictly-verified grammar.

``parse_fast(text)`` builds the SAME Node tree that
``parser._TreeBuilder`` (stdlib ``html.parser`` with
``convert_charrefs=True``) builds — but only for documents made of
constructs inside a strict grammar it provably handles identically;
the moment it sees anything else (malformed tag, bare ``<``, marked
section ``<![``, attribute shapes only the stdlib's *tolerant* regexes
accept, EOF-truncated construct) it returns ``None`` and the caller
reparses the whole page with the stdlib builder.  Correctness is
therefore unconditional: the fast path never guesses on input it
hasn't been proven on, and tests/test_fastparser.py differential-tests
tree equality against the stdlib over corpus pages, the extractor
fixtures, and hypothesis fuzz.

Grammar/semantics notes (each mirrors a verified stdlib behavior —
CPython 3.11 html/parser.py + _markupbase.py):

- text runs go ``handle_data(unescape(run))`` in one chunk per run
  between ``<`` positions (goahead's convert_charrefs branch);
- start tags: strict subset of ``locatestarttagend_tolerant`` —
  ``\\s+``-separated attributes, single ``=``, quoted values without
  ``<>`` or unquoted values without ``\\s\"'<>=`` ` — for which the
  tolerant parse is positionally identical; names lowercased, values
  entity-unescaped (``unescape`` applied exactly when non-empty, same
  as parse_starttag), duplicate attrs first-wins (builder semantics);
- ``<x/>`` → startendtag (never pushed, never cdata);
- ``<script>/<style>``: cdata mode — data is raw (no unescape) up to
  the first ``</\\s*name\\s*>`` (case-insensitive), the exact
  ``set_cdata_mode`` interesting-regex; unterminated → rest is data;
- end tags: ``</\\s*name\\s*>`` (subset of ``endtagfind``);
- comments ``<!--``: skip past ``--\\s*>`` (``_commentclose``);
- ``<?``: skip past first ``>`` (parse_pi, no handler);
- other ``<!``: skip past first ``>`` (doctype and bogus comments both
  reduce to this, no handler); ``<![`` marked sections → fallback.
"""

from __future__ import annotations

import re
from html import unescape

from .parser import Node, _VOID

_RAWTEXT = ("script", "style")

# Strict start tag: name, \s+-separated attrs (optionally =value with
# "…" / '…' quoted [no <>] or unquoted safe chars), optional /, then >.
# Everything this accepts, locatestarttagend_tolerant accepts with the
# same end position and attrfind_tolerant splits into the same attrs.
_START_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9\-]*)"
    r"((?:\s+[^\s/=>\"'<][^\s/=>\"'<]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s\"'<>`=]+))?)*)"
    r"\s*(/?)>"
)
_ATTR_RE = re.compile(
    r"\s+([^\s/=>\"'<][^\s/=>\"'<]*)"
    r"(?:\s*=\s*(?:\"([^\"<>]*)\"|'([^'<>]*)'|([^\s\"'<>`=]+)))?"
)
_END_RE = re.compile(r"</\s*([a-zA-Z][a-zA-Z0-9\-]*)\s*>")
_COMMENT_CLOSE_RE = re.compile(r"--\s*>")  # _markupbase._commentclose


def _rawtext_close(name: str):
    # the exact regex set_cdata_mode installs as `interesting`
    return re.compile(r"</\s*%s\s*>" % name, re.IGNORECASE)


_SCRIPT_CLOSE = _rawtext_close("script")
_STYLE_CLOSE = _rawtext_close("style")


def parse_fast(data: str) -> Node | None:
    """Node tree for ``data``, or None if any construct falls outside
    the verified strict grammar (caller must use the stdlib parser)."""
    root = Node("[document]", {}, None)
    stack = [root]
    pos = 0
    n = len(data)
    find = data.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            run = data[pos:]
            if run:
                if "&" in run:
                    run = unescape(run)
                # guard the POST-unescape text: invalid charrefs like
                # '&#1' unescape to '' and the stdlib builder's
                # handle_data drops empty data
                if run:
                    stack[-1].children.append(run)
            break
        if lt > pos:
            run = data[pos:lt]
            if "&" in run:
                run = unescape(run)
            if run:
                stack[-1].children.append(run)
        nxt = data[lt + 1 : lt + 2]
        if nxt.isalpha():
            m = _START_RE.match(data, lt)
            if m is None:
                return None
            tag = m.group(1).lower()
            attrs: dict[str, str | None] = {}
            for am in _ATTR_RE.finditer(m.group(2)):
                name = am.group(1).lower()
                if name in attrs:
                    continue  # first occurrence wins (builder semantics)
                v = am.group(2)
                if v is None:
                    v = am.group(3)
                if v is None:
                    v = am.group(4)
                if v:
                    v = unescape(v)
                attrs[name] = v
            node = Node(tag, attrs, stack[-1])
            stack[-1].children.append(node)
            pos = m.end()
            if m.group(3):  # <x/> startendtag: never pushed, no cdata
                continue
            if tag in _RAWTEXT:
                close = (
                    _SCRIPT_CLOSE if tag == "script" else _STYLE_CLOSE
                )
                cm = close.search(data, pos)
                if cm is None:
                    # unterminated rawtext: the stdlib's cdata branch
                    # BREAKs without emitting (content is discarded,
                    # goahead's `if self.cdata_elem: break`)
                    pos = n
                    continue
                raw = data[pos : cm.start()]
                if raw:
                    node.children.append(raw)
                pos = cm.end()
            elif tag not in _VOID:
                stack.append(node)
        elif nxt == "/":
            m = _END_RE.match(data, lt)
            if m is None:
                return None
            name = m.group(1).lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].name == name:
                    del stack[i:]
                    break
            pos = m.end()
        elif nxt == "!":
            if data.startswith("<!--", lt):
                cm = _COMMENT_CLOSE_RE.search(data, lt + 4)
                if cm is None:
                    return None
                pos = cm.end()
            elif data.startswith("<![", lt):
                return None  # marked section: stdlib-only
            else:
                gt = find(">", lt + 2)
                if gt < 0:
                    return None
                pos = gt + 1
        elif nxt == "?":
            gt = find(">", lt + 2)
            if gt < 0:
                return None
            pos = gt + 1
        else:
            # bare '<' (data), EOF '<', or anything tolerant-only
            return None
    return root
