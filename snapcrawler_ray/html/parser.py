"""Minimal DOM on top of stdlib ``html.parser``.

The reference parses pages with ``BeautifulSoup(content, 'html.parser')``
(reference: snapcrawler/core/crawling_module.py:225).  BeautifulSoup's
``html.parser`` tree builder uses this same stdlib tokenizer, so for the
well-formed HTML in our corpus the resulting element order, attributes
and text nodes are identical.  We only implement the query surface the
reference extractor needs: ``find_all`` by tag / attribute presence,
``get`` on attributes, ``find_parent``, ``string`` and text traversal.

BeautifulSoup is not available in this environment; this is a
from-scratch reimplementation of the subset of its *semantics* the
extractor relies on (public API behavior only).
"""

from __future__ import annotations

from html.parser import HTMLParser

# HTML void elements never take children (HTML5 spec list).
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose raw text content html.parser reports via handle_data
# but which we must keep attached as the element's string (style/script).
_RAWTEXT = frozenset(("script", "style"))


class Node:
    """One element node. ``children`` holds Node and str (text) entries."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict[str, str | None], parent: "Node | None"):
        self.name = name
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    # -- BeautifulSoup-compatible query subset ------------------------------

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    @property
    def string(self) -> str | None:
        """The single text child, if the element has exactly one child and
        it is a string — mirrors ``bs4.Tag.string`` for the ``<style>``
        case used by the reference (crawling_module.py:310-312)."""
        if len(self.children) == 1 and isinstance(self.children[0], str):
            return self.children[0]
        return None

    def find_parent(self, name: str) -> "Node | None":
        p = self.parent
        while p is not None:
            if p.name == name:
                return p
            p = p.parent
        return None

    def iter_nodes(self):
        """Pre-order document traversal of element nodes (iterative —
        nested ``yield from`` generators cost a frame per tree level in
        the extractor hot path)."""
        todo = list(reversed(self.children))
        pop = todo.pop
        while todo:
            c = pop()
            if isinstance(c, Node):
                yield c
                if c.children:
                    todo.extend(reversed(c.children))

    def iter_text(self, skip: frozenset[str] = _RAWTEXT):
        """Document-order text nodes, skipping subtrees named in ``skip``."""
        todo = list(reversed(self.children))
        pop = todo.pop
        while todo:
            c = pop()
            if isinstance(c, str):
                yield c
            elif c.name not in skip and c.children:
                todo.extend(reversed(c.children))

    def find_all(
        self,
        name: str | None = None,
        attrs: dict | None = None,
        href: bool | None = None,
        style: bool | None = None,
    ) -> list["Node"]:
        """Document-order element matches.

        Supports the four call shapes the reference uses:
        ``find_all('img')``, ``find_all(attrs={'data-file-url': True})``,
        ``find_all(style=True)``, ``find_all('a', href=True)``.
        """
        out = []
        for n in self.iter_nodes():
            if name is not None and n.name != name:
                continue
            if href and n.attrs.get("href") is None:
                continue
            if style and n.attrs.get("style") is None:
                continue
            if attrs:
                ok = True
                for k, v in attrs.items():
                    if v is True:
                        if k not in n.attrs:
                            ok = False
                            break
                    elif n.attrs.get(k) != v:
                        ok = False
                        break
                if not ok:
                    continue
            out.append(n)
        return out


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        # Duplicate attributes: first occurrence wins (html.parser yields
        # them in order; dict() keeps the last, so build explicitly).
        ad: dict[str, str | None] = {}
        for k, v in attrs:
            if k not in ad:
                ad[k] = v
        node = Node(tag, ad, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        ad: dict[str, str | None] = {}
        for k, v in attrs:
            if k not in ad:
                ad[k] = v
        self.stack[-1].children.append(Node(tag, ad, self.stack[-1]))

    def handle_endtag(self, tag):
        # Close the nearest matching open element; ignore strays.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html_stdlib(data: str) -> Node:
    """The reference-semantics stdlib build (always correct; the fast
    tokenizer falls back to this on anything outside its grammar)."""
    b = _TreeBuilder()
    b.feed(data)
    b.close()
    return b.root


#: (fast_hits, stdlib_fallbacks) since process start — observability
#: for tests and benchmarks (the speedup only exists while the corpus
#: stays inside the fast grammar).
parse_counts = [0, 0]


def parse_html(data: bytes | str) -> Node:
    """Parse HTML into a Node tree. Bytes are decoded as UTF-8 with
    replacement (the corpus stores UTF-8 ``html:binary``).

    Tries the strict fast tokenizer first (html/fastparser.py, tree
    bit-identical by construction + differential tests); any construct
    outside its verified grammar reparses with the stdlib builder."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        data = bytes(data).decode("utf-8", errors="replace")
    from .fastparser import parse_fast

    root = parse_fast(data)
    if root is not None:
        parse_counts[0] += 1
        return root
    parse_counts[1] += 1
    return parse_html_stdlib(data)
