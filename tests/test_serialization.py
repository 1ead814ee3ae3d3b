"""Serializer tests: ports of the reference's own unit tests
(ref:src/utils/serialization.rs:207-250) plus golden-file round trips
against the reference repo's checked-in outputs."""

from __future__ import annotations

import json

import pytest

from rdf_knowledge_extractor_spark.operators.validate import validation_issues
from rdf_knowledge_extractor_spark.sinks.serialization import (
    serialize,
    serialize_jsonld,
    serialize_ntriples,
    serialize_rdf_xml,
    serialize_turtle,
)
from rdf_knowledge_extractor_spark.sources.kg_json import read_kg_json
from rdf_knowledge_extractor_spark.sources.ntriples import read_ntriples

REF = "/root/reference"


def _triples(spark, rows):
    from rdf_knowledge_extractor_spark.schemas import TRIPLE_SCHEMA

    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


# -- port of test_validate_rdf_triples (ref:serialization.rs:211-229) --
def test_validate_rdf_triples(spark):
    df = _triples(
        spark,
        [
            ("http://example.org/person1", "http://example.org/hasName", "John Doe", 1.0, None, {}, 0, 0),
            ("invalid_uri", "http://example.org/hasAge", "30", 1.0, None, {}, 0, 1),
        ],
    )
    issues = [r.issue for r in validation_issues(df).collect()]
    assert len(issues) == 1
    assert "Invalid subject URI" in issues[0]
    assert issues[0] == "Triple 1: Invalid subject URI: invalid_uri"


# -- port of test_serialize_json (ref:serialization.rs:231-250) --
def test_serialize_json(spark):
    df = _triples(
        spark,
        [("http://example.org/person1", "http://example.org/hasName", "John Doe", 1.0, None, {}, 0, 0)],
    )
    out = serialize(df, "json", "http://example.org/", "ex")
    parsed = json.loads(out)
    assert parsed == [
        {
            "subject": "http://example.org/person1",
            "predicate": "http://example.org/hasName",
            "object": "John Doe",
            "confidence": 1.0,
            "metadata": {},
        }
    ]


def test_ntriples_strict_escaping(spark):
    df = _triples(
        spark,
        [
            ("http://x/s", "http://x/p", 'He said "hi"', 1.0, None, {}, 0, 0),
            ("http://x/s", "http://x/p2", "https://x/obj", 1.0, None, {}, 0, 1),
        ],
    )
    out = serialize_ntriples(df, strict=True)
    assert '<http://x/s> <http://x/p> "He said \\"hi\\"" .' in out
    assert "<http://x/s> <http://x/p2> <https://x/obj> ." in out


def test_ntriples_store_vs_strict_divergence(spark):
    # "httpFoo" object: URI in the store export (loose startswith("http"),
    # ref:knowledge_graph/mod.rs:264-268) but literal in the serializer
    # (strict http(s)://, ref:serialization.rs:98-102)
    df = _triples(spark, [("http://x/s", "http://x/p", "httpFoo", 1.0, None, {}, 0, 0)])
    assert '"httpFoo"' in serialize_ntriples(df, strict=True)
    assert "<httpFoo>" in serialize_ntriples(df, strict=False)


def test_turtle_prefix_compression(spark):
    ns, px = "http://biz.example/ont#", "biz"
    df = _triples(
        spark,
        [
            ("http://biz.example/ont#Thing", ns + "hasName", "A name", 1.0, None, {}, 0, 0),
            ("http://other.example/x", ns + "rel", "https://other.example/y", 1.0, None, {}, 0, 1),
        ],
    )
    out = serialize_turtle(df, ns, px)
    assert out.startswith(f"@prefix {px}: <{ns}> .\n@prefix rdf: ")
    assert "biz:Thing biz:hasName \"A name\" ." in out
    assert "<http://other.example/x> biz:rel <https://other.example/y> ." in out


def test_jsonld_shape_and_last_wins(spark):
    ns, px = "http://biz.example/ont#", "biz"
    df = _triples(
        spark,
        [
            ("http://e/s", ns + "p", "first", 1.0, None, {}, 0, 0),
            ("http://e/s", ns + "p", "second", 1.0, None, {}, 0, 1),  # wins
            ("http://e/s", ns + "q", "http://e/other", 1.0, None, {}, 0, 2),
        ],
    )
    doc = json.loads(serialize_jsonld(df, ns, px))
    assert doc["@context"] == {px: ns}
    node = doc["@graph"][0]
    assert node["@id"] == "http://e/s"
    assert node["biz:p"] == "second"
    assert node["biz:q"] == {"@id": "http://e/other"}


def test_rdf_xml_escaping(spark):
    ns, px = "http://biz.example/ont#", "biz"
    df = _triples(
        spark,
        [
            ("http://e/s", ns + "p", "a < b & c", 1.0, None, {}, 0, 0),
            ("http://e/s", "http://other/x#rel", "http://e/o", 1.0, None, {}, 0, 1),
        ],
    )
    out = serialize_rdf_xml(df, ns, px)
    assert '<rdf:Description rdf:about="http://e/s">' in out
    assert "<biz:p>a &lt; b &amp; c</biz:p>" in out
    assert '<rel rdf:resource="http://e/o"/>' in out  # split('#').last fallback


def test_unsupported_format_raises(spark):
    df = _triples(spark, [("s", "p", "o", 1.0, None, {}, 0, 0)])
    with pytest.raises(ValueError):
        serialize(df, "parquetish", "ns", "px")


# -- golden-file round trips against the reference repo --

def test_golden_sales2_db_to_ntriples(spark):
    """Ingest the reference store file (122 triples), re-serialize with
    the STRICT N-Triples serializer, and verify every line of the
    checked-in .nt export (94 lines — written before the store's last
    growth; escaped `\\"` quotes prove it used the strict serializer,
    ref:src/utils/serialization.rs:92-108) is reproduced exactly."""
    df = read_kg_json(spark, f"{REF}/example-sales-2/knowledge_graph.db")
    ours = set(serialize_ntriples(df, strict=True).splitlines())
    golden = [
        line
        for line in open(f"{REF}/example-sales-2/knowledge_graph.nt").read().splitlines()
        if line.strip()
    ]
    assert len(golden) == 94 and len(ours) == 122
    missing = [g for g in golden if g not in ours]
    assert not missing, missing[:3]


def test_golden_sales3_nt_roundtrip(spark):
    """Parse the sales-3 golden .nt (has URI objects and \\" escapes),
    re-serialize strict, byte-compare per line."""
    path = f"{REF}/example-sales-3/output/knowledge_graph.nt"
    df = read_ntriples(spark, path).withColumns(
        {"confidence": __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1.0)}
    )
    golden = [l for l in open(path).read().splitlines() if l.strip()]
    ours = serialize_ntriples(df.select("subject", "predicate", "object"), strict=True).splitlines()
    assert set(ours) == set(golden)
    assert len(golden) == 40


def test_golden_jsonld_shape(spark):
    """Our JSON-LD matches the reference's output.jsonld node-for-node
    (subject order differs: reference HashMap vs our sorted)."""
    golden = json.loads(open(f"{REF}/output.jsonld").read())
    ns = golden["@context"]["biz"]
    # reconstruct triples from the golden JSON-LD, then re-serialize
    rows = []
    i = 0
    for node in golden["@graph"]:
        subj = node["@id"]
        for k, v in node.items():
            if k == "@id":
                continue
            pred = ns + k.split(":", 1)[1] if k.startswith("biz:") else k
            obj = v["@id"] if isinstance(v, dict) else v
            rows.append((subj, pred, obj, 1.0, None, {}, 0, i))
            i += 1
    df = _triples(spark, rows)
    ours = json.loads(serialize_jsonld(df, ns, "biz"))
    ours_nodes = {n["@id"]: n for n in ours["@graph"]}
    golden_nodes = {n["@id"]: n for n in golden["@graph"]}
    assert ours["@context"] == golden["@context"]
    assert ours_nodes == golden_nodes


def test_serialize_json_shortest_f32_confidence(spark):
    """serde/ryu writes f32 0.95 as '0.95'; a widened double would print
    0.949999988079071 (ADVICE fix)."""
    from rdf_knowledge_extractor_spark.schemas import TRIPLE_SCHEMA
    from rdf_knowledge_extractor_spark.sinks.serialization import serialize_json

    df = spark.createDataFrame(
        [
            ("http://e/s", "http://e/p", "o", 0.95, None, {}, 0, 0),
            ("http://e/s2", "http://e/p", "o2", 1.0, "src", {}, 0, 1),
        ],
        TRIPLE_SCHEMA,
    )
    text = serialize_json(df)
    assert '"confidence": 0.95' in text
    assert '"confidence": 1.0' in text
    assert "0.949999988079071" not in text
    import json as _json

    parsed = _json.loads(text)  # substitution must keep valid JSON
    assert parsed[0]["confidence"] == 0.95


def test_kg_store_rows_precede_new_batch(spark, tmp_path):
    """Loaded store rows carry doc_seq=-1 so a save after an extract
    appends new triples AFTER existing content (Vec-push order,
    ref:src/knowledge_graph/mod.rs:91-114) instead of interleaving."""
    import json as _json

    from rdf_knowledge_extractor_spark.operators.dedup import insert_new_triples
    from rdf_knowledge_extractor_spark.schemas import TRIPLE_SCHEMA
    from rdf_knowledge_extractor_spark.sources.kg_json import (
        read_kg_json,
        write_kg_json,
    )

    store = tmp_path / "kg.json"
    old = spark.createDataFrame(
        [(f"http://e/old{i}", "http://e/p", f"o{i}", 1.0, None, {}, 0, i) for i in range(3)],
        TRIPLE_SCHEMA,
    )
    write_kg_json(old, str(store))

    loaded = read_kg_json(spark, str(store))
    assert {r.doc_seq for r in loaded.collect()} == {-1}
    new = spark.createDataFrame(
        [(f"http://e/new{i}", "http://e/p", f"x{i}", 1.0, None, {}, 0, i) for i in range(2)],
        TRIPLE_SCHEMA,
    )
    _, updated = insert_new_triples(loaded, new)
    write_kg_json(updated, str(store))
    subjects = [t["subject"] for t in _json.loads(store.read_text())]
    assert subjects == [
        "http://e/old0", "http://e/old1", "http://e/old2",
        "http://e/new0", "http://e/new1",
    ]


def test_serialize_json_sentinel_injection_safe(spark):
    """A data string that mimics the old '@F32@…@' sentinel must survive
    verbatim — quotes intact, valid JSON (ADVICE r2: nonce sentinel)."""
    import json as _json

    from rdf_knowledge_extractor_spark.schemas import TRIPLE_SCHEMA
    from rdf_knowledge_extractor_spark.sinks.serialization import serialize_json

    evil = "@F32@0.5@"
    df = spark.createDataFrame(
        [("http://e/s", "http://e/p", evil, 0.95, evil, {"k": evil}, 0, 0)],
        TRIPLE_SCHEMA,
    )
    parsed = _json.loads(serialize_json(df))
    assert parsed[0]["object"] == evil
    assert parsed[0]["source"] == evil
    assert parsed[0]["metadata"]["k"] == evil
    assert parsed[0]["confidence"] == 0.95
