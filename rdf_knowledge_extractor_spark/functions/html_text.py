"""HTML → text extraction, byte-identical to the reference extractor.

Reference semantics (ref:src/handlers/mod.rs:96-141, UrlHandler):

1. Parse the document as HTML5 (html5ever `Html::parse_document`).
2. For every ``body`` element (HTML5 tree building guarantees at most
   one): collect **all descendant text nodes** in tree order, join
   them with a single space, trim; keep if non-empty
   (ref:src/handlers/mod.rs:114-122).  NOTE: ``script``/``style``
   text inside ``body`` IS included by this path.
3. If no parts were produced, fall back to iterating **every element**
   in the document (the ``*`` selector) in tree order, skipping
   elements *named* ``script``/``style`` (their text still leaks in
   via ancestor elements!), emitting each element's descendant-text
   join (ref:src/handlers/mod.rs:124-138).  This path double-counts
   nested text by construction — reproduced faithfully.
4. Output is ``"\\n".join(parts)`` (ref:src/handlers/mod.rs:140).

The tree builder below implements the subset of the WHATWG tree
construction that affects *text-node placement* (head/body sectioning,
implied tags, void elements, rawtext script/style, entity decoding,
CRLF normalization).  Full adoption-agency / foster-parenting is not
modeled (does not move text across the head/body boundary for the
web-page corpus we target); deviations are documented in tests.

Spark surface: `html_to_text` / `html_metadata` are Arrow-batched
pandas UDFs (no per-row Python dispatch through Spark; the per-row
parse itself is inherently scalar work, batched via Arrow transfer).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Void elements never hold children (WHATWG §13.1.2)
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements that belong to <head> during tree construction (WHATWG "in head")
_HEAD_ONLY = frozenset("title meta link base basefont bgsound noframes".split())

# script/style go to head before body exists, body afterwards
_HEAD_OR_BODY = frozenset(("script", "style", "template", "noscript"))


class Node:
    """One element; children are Node or str (text node)."""

    __slots__ = ("name", "children", "attrs")

    def __init__(self, name: str, attrs: dict | None = None):
        self.name = name
        self.children: list = []
        self.attrs = attrs or {}

    # -- traversal ----------------------------------------------------
    def descendant_texts(self) -> list[str]:
        """All descendant text nodes in tree order (scraper `.text()`)."""
        out: list[str] = []
        stack = [iter(self.children)]
        while stack:
            it = stack[-1]
            child = next(it, None)
            if child is None:
                stack.pop()
                continue
            if isinstance(child, str):
                out.append(child)
            else:
                stack.append(iter(child.children))
        return out

    def iter_elements(self):
        """All elements in tree order, self included (the `*` selector)."""
        yield self
        for child in self.children:
            if not isinstance(child, str):
                yield from child.iter_elements()

    def find_all(self, name: str):
        return [el for el in self.iter_elements() if el.name == name]


class _TreeBuilder(HTMLParser):
    """HTML5-ish tree builder: correct head/body text placement."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("html")
        self.head = Node("head")
        self.body = Node("body")
        self.root.children = [self.head, self.body]
        self._stack: list[Node] = []  # open elements *inside* head or body
        self._section: Node | None = None  # None → before head/body decided
        self._body_opened = False
        self._text_buf: list[str] = []

    # -- text buffering (coalesce adjacent character runs into one
    #    text node, like html5ever) --
    def _flush_text(self):
        if not self._text_buf:
            return
        text = "".join(self._text_buf)
        self._text_buf.clear()
        self._current().children.append(text)

    def _current(self) -> Node:
        if self._stack:
            return self._stack[-1]
        return self._section if self._section is not None else self.body

    def _open_body(self):
        self._flush_text()
        self._section = self.body
        self._body_opened = True
        self._stack.clear()

    def _ensure_body(self):
        if self._section is not self.body:
            self._open_body()

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == "html":
            return
        if tag == "head":
            if not self._body_opened:
                self._flush_text()
                self._section = self.head
                self._stack.clear()
            return
        if tag == "body":
            if not self._body_opened:
                self._open_body()
            return

        # decide section for this element
        if not self._stack:  # only section-switch at top level
            if tag in _HEAD_ONLY:
                if not self._body_opened:
                    self._flush_text()
                    self._section = self.head
                else:
                    self._ensure_body()
            elif tag in _HEAD_OR_BODY:
                if not self._body_opened:
                    self._flush_text()
                    self._section = self.head
                # else: stays in body
            else:
                self._ensure_body()
        self._flush_text()
        node = Node(tag, dict(attrs))
        self._current().children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        if tag in ("html", "head", "body"):
            return
        if not self._stack:
            if tag in _HEAD_ONLY and not self._body_opened:
                self._flush_text()
                self._section = self.head
            elif tag not in _HEAD_ONLY and tag not in _HEAD_OR_BODY:
                self._ensure_body()
        self._flush_text()
        self._current().children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in ("html", "body"):
            return  # "after body" char tokens are reprocessed in body anyway
        if tag == "head":
            if not self._body_opened:
                self._flush_text()
                self._section = None
            return
        # pop to the matching open element; ignore stray end tags
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].name == tag:
                self._flush_text()
                del self._stack[i:]
                return

    def handle_data(self, data):
        if not data:
            return
        if self._section is None and not self._stack:
            # before head/body: whitespace-only runs are dropped
            # (WHATWG "before html"/"before head" ignore whitespace)
            stripped_lead = data.lstrip("\t\n\x0c\r ")
            if not stripped_lead:
                return
            self._ensure_body()
            data = stripped_lead
        elif self._section is self.head and not self._stack:
            # text directly in <head> (not inside title/script/…):
            # spec reprocesses it "in body"
            stripped_lead = data.lstrip("\t\n\x0c\r ")
            if not stripped_lead:
                return
            self._open_body()
            data = stripped_lead
        self._text_buf.append(data)

    def handle_comment(self, data):
        self._flush_text()  # comment ends a character run

    def handle_decl(self, decl):
        pass

    def close(self):
        self._flush_text()
        super().close()


def parse_document(html: str) -> Node:
    """Parse an HTML document into a minimal DOM (root = <html>)."""
    builder = _TreeBuilder()
    # WHATWG input-stream preprocessing: normalize CRLF / CR to LF
    builder.feed(html.replace("\r\n", "\n").replace("\r", "\n"))
    builder.close()
    return builder.root


def extract_text(html: str) -> str:
    """Reference-faithful HTML→text (ref:src/handlers/mod.rs:109-140)."""
    root = parse_document(html)

    parts: list[str] = []
    for body in root.find_all("body"):  # tree builder yields exactly one
        joined = " ".join(body.descendant_texts())
        trimmed = joined.strip()
        if trimmed:
            parts.append(trimmed)

    if not parts:  # fallback: every element, skipping script/style by name
        for el in root.iter_elements():
            if el.name in ("script", "style"):
                continue
            joined = " ".join(el.descendant_texts())
            trimmed = joined.strip()
            if trimmed:
                parts.append(trimmed)

    return "\n".join(parts)


def extract_metadata(html: str, source: str = "") -> dict[str, str]:
    """HTML metadata (ref:src/handlers/mod.rs:143-177): title text +
    <meta name=description|keywords|author content=…>."""
    root = parse_document(html)
    meta: dict[str, str] = {"source": source, "type": "url"}
    titles = root.find_all("title")
    if titles:
        meta["title"] = "".join(t for t in titles[0].descendant_texts())
    for el in root.find_all("meta"):
        name = el.attrs.get("name")
        content = el.attrs.get("content")
        if name in ("description", "keywords", "author") and content is not None:
            meta[name] = content
    return meta


# ---------------------------------------------------------------------------
# Spark surface — Arrow-batched pandas UDFs
# ---------------------------------------------------------------------------

def _decode(b) -> str:
    if b is None:
        return ""
    if isinstance(b, (bytes, bytearray)):
        return bytes(b).decode("utf-8", errors="replace")
    return str(b)


@F.pandas_udf(T.StringType())
def html_to_text(html: pd.Series) -> pd.Series:
    """binary html → extracted text (vectorized Arrow transfer)."""
    return html.map(lambda b: extract_text(_decode(b)))


@F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
def html_metadata(html: pd.Series) -> pd.Series:
    return html.map(lambda b: extract_metadata(_decode(b)))


def with_extracted_text(pages_df, html_col: str = "html", out_col: str = "text"):
    """pages(url, warc_ts, html, …) → same + extracted `text` column."""
    return pages_df.withColumn(out_col, html_to_text(F.col(html_col)))
