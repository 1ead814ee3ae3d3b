"""Byte-identity tests for the HTML→text extractor.

Oracle = the synthetic generator's by-construction expected text (it
records exactly which text nodes it emits while composing the HTML),
plus hand-derived goldens for parser edge cases drawn from the
reference traversal spec (ref:src/handlers/mod.rs:109-140)."""

from __future__ import annotations

import pytest

from rdf_knowledge_extractor_spark.functions.html_text import (
    extract_metadata,
    extract_text,
)
from rdf_knowledge_extractor_spark.sources.pages import generate_corpus


def test_corpus_byte_identity():
    corpus = generate_corpus(300, seed=42)
    for p in corpus:
        assert extract_text(p.html.decode("utf-8")) == p.text, p.url


def test_corpus_byte_identity_alt_seed():
    for p in generate_corpus(100, seed=7):
        assert extract_text(p.html.decode("utf-8")) == p.text, p.url


CASES = [
    # (html, expected) — expected derived by hand from the reference spec
    ("<html><head><title>T</title></head><body><p>Hi</p></body></html>", "Hi"),
    # no body tags: tree builder still places content in implied body
    ("<p>No body tags</p>", "No body tags"),
    # script INSIDE body: its text IS included (ref body path collects all
    # descendants; scraper element.text() does not skip script)
    (
        "<body><p>A</p><script>var x=1;</script><p>B</p></body>",
        "A var x=1; B",
    ),
    # style inside body likewise included
    ("<body><style>.a{color:red}</style>Hello</body>", ".a{color:red} Hello"),
    # whitespace text nodes participate in the join then get trimmed away
    ("<body>\n  <p>Hi</p>\n</body>", "Hi"),
    # entities decoded
    ("<body>a &amp; b &lt;c&gt; &#65;</body>", "a & b <c> A"),
    # nested inline elements: text nodes in tree order, single body part
    ("<body><p>x <b>y</b> z</p></body>", "x  y  z"),
    # multiple top-level blocks: still ONE body part (single join)
    ("<body><p>one</p><p>two</p></body>", "one two"),
    # head text excluded from body path
    ("<html><head><title>T</title></head><body>B</body></html>", "B"),
    # empty body + head content → fallback path with double-counting:
    # elements html, head, title (script skipped by NAME but its text
    # leaks via ancestors html/head)
    (
        "<html><head><title>Only title</title><script>var x=1;</script></head>"
        "<body></body></html>",
        "Only title var x=1;\nOnly title var x=1;\nOnly title",
    ),
    # entirely empty
    ("", ""),
    ("<body></body>", ""),
    # whitespace-only body
    ("<body>   \n  </body>", ""),
    # CRLF normalized to LF (WHATWG preprocessing, html5ever does this)
    ("<body>a\r\nb</body>", "a\nb"),
    # unclosed tags
    ("<body><p>open<div>nested</body>", "open nested"),
    # attributes ignored; quotes in attrs don't leak
    ('<body><a href="http://x.example/?q=1&amp;r=2">link</a></body>', "link"),
    # comments are not text
    ("<body>a<!-- hidden -->b</body>", "a b"),
    # void elements don't swallow following text
    ("<body>a<br>b<img src=x>c</body>", "a b c"),
]


@pytest.mark.parametrize("html,expected", CASES, ids=range(len(CASES)))
def test_edge_cases(html, expected):
    assert extract_text(html) == expected


def test_metadata():
    html = (
        "<html><head><title>My Page</title>"
        '<meta name="description" content="desc here">'
        '<meta name="keywords" content="a,b">'
        '<meta name="author" content="Jane">'
        '<meta name="viewport" content="ignored">'
        "</head><body>x</body></html>"
    )
    md = extract_metadata(html, source="http://x.example/")
    assert md["title"] == "My Page"
    assert md["description"] == "desc here"
    assert md["keywords"] == "a,b"
    assert md["author"] == "Jane"
    assert md["source"] == "http://x.example/"
    assert md["type"] == "url"
    assert "viewport" not in md


def test_spark_udf_matches_local(spark):
    from rdf_knowledge_extractor_spark.functions.html_text import with_extracted_text
    from rdf_knowledge_extractor_spark.sources.pages import pages_dataframe

    pages = pages_dataframe(spark, 60, seed=42).withColumnRenamed("text", "expected")
    out = with_extracted_text(pages).select("url", "expected", "text").collect()
    assert len(out) == 60
    for r in out:
        assert r["text"] == r["expected"], r["url"]


def test_adversarial_empty_endtag_runs_no_recursion():
    """'</>'*5000 used to blow the recursion limit in the tokenizer's
    data state (ADVICE r2) — must parse iteratively."""
    from rdf_knowledge_extractor_spark.functions.html_text import extract_text

    assert extract_text("<body>" + "</>" * 5000 + "x") == "x"
    assert extract_text("<p>a" + "</>b" * 3000) == "a" + "b" * 3000
