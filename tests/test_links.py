"""Link extraction through the WHATWG parser: messy-web cases."""

from __future__ import annotations

from rdf_knowledge_extractor_spark.functions.links import (
    extract_links,
    with_extracted_links,
)


def test_wellformed_links():
    html = '<html><body><a href="https://x.com/1">one</a>' \
           '<a href="/rel">two</a></body></html>'
    assert extract_links(html) == [
        ("https://x.com/1", "one"), ("/rel", "two"),
    ]


def test_messy_web_cases_regex_would_miss():
    # uppercase tag+attr, unquoted value, attribute before href,
    # nested markup in the anchor, unclosed <a> (parser auto-closes)
    html = (
        '<A CLASS=x HREF=https://up.example.com>UP</A>'
        "<a rel=nofollow href='/sq'>s<b>q</b></a>"
        '<p><a href="/open">open link<p>after</p>'
    )
    links = extract_links(html)
    assert ("https://up.example.com", "UP") in links
    got = dict(links)
    assert got["/sq"] == "s q"  # nested element text contributes
    assert "/open" in got
    # href-less anchors are not edges
    assert extract_links("<a name=anchor>no href</a>") == []


def test_entity_decoding_in_href_and_text():
    html = '<a href="/q?a=1&amp;b=2">A &amp; B</a>'
    assert extract_links(html) == [("/q?a=1&b=2", "A & B")]


def test_spark_surface_explodes_per_link(spark):
    pages = spark.createDataFrame(
        [
            (1, '<a href="/a">x</a><a href="/b">y</a>'),
            (2, "<p>no links</p>"),
            (3, None),
        ],
        ["doc_id", "html"],
    )
    rows = with_extracted_links(pages, html_col="html", id_col="doc_id")
    got = sorted((r.doc_id, r.href, r.anchor) for r in rows.collect())
    assert got == [(1, "/a", "x"), (1, "/b", "y")]
