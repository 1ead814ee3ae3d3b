"""Entity linking + connected components + canonicalization tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_knowledge_extractor_spark.operators.canonicalize import canonicalize_triples
from rdf_knowledge_extractor_spark.operators.components import connected_components
from rdf_knowledge_extractor_spark.operators.linking import (
    entity_universe,
    link_entities,
    lsh_candidate_pairs,
    with_canonical_key,
)

BASE = "http://business.example.org/resource/"
NS = "http://business.example.org/ontology#"


def _triples(spark, rows):
    from rdf_knowledge_extractor_spark.schemas import TRIPLE_SCHEMA

    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")], "src string, dst string"
    )
    cc = {r.node: r.component for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["x"] == cc["y"] == "x"
    assert cc["z"] == "z"


def test_connected_components_chain(spark):
    # path graph: propagation needs several rounds
    nodes = [f"n{i:02d}" for i in range(10)]
    edges = spark.createDataFrame(
        list(zip(nodes, nodes[1:])), "src string, dst string"
    )
    cc = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(cc.values()) == {"n00"}


def test_canonical_key_strips_suffix(spark):
    ents = spark.createDataFrame(
        [
            (BASE + "TechcorpInc",),
            (BASE + "Techcorp",),
            (BASE + "TechcorpGroup",),
            (BASE + "DatasystemsCorp",),
        ],
        "uri string",
    )
    keyed = {r.uri: r.key for r in with_canonical_key(ents).collect()}
    assert keyed[BASE + "TechcorpInc"] == "techcorp"
    assert keyed[BASE + "Techcorp"] == "techcorp"
    assert keyed[BASE + "TechcorpGroup"] == "techcorp"
    assert keyed[BASE + "DatasystemsCorp"] == "datasystems"


def test_lsh_blocks_same_key_entities(spark):
    ents = with_canonical_key(
        spark.createDataFrame(
            [(BASE + "TechcorpInc",), (BASE + "Techcorp",), (BASE + "ZzzOther",)],
            "uri string",
        )
    )
    pairs, dropped = lsh_candidate_pairs(ents, max_bucket_size=50)
    got = {(r.uri_a, r.uri_b) for r in pairs.collect()}
    key = (min(BASE + "TechcorpInc", BASE + "Techcorp"), max(BASE + "TechcorpInc", BASE + "Techcorp"))
    assert key in got
    assert dropped.count() == 0


def test_link_and_canonicalize_end_to_end(spark):
    rows = [
        (BASE + "TechcorpInc", NS + "hasName", "TechCorp Inc.", 1.0, "d1", {}, 0, 0),
        (BASE + "Techcorp", NS + "locatedIn", "Austin", 1.0, "d2", {}, 1, 0),
        (BASE + "TechcorpInc", NS + "locatedIn", "Austin", 1.0, "d1", {}, 0, 1),
        (BASE + "JohnSmith", NS + "worksFor", BASE + "TechcorpGroup", 1.0, "d3", {}, 2, 0),
        (BASE + "DatasystemsCorp", NS + "hasName", "DataSystems Corp", 1.0, "d4", {}, 3, 0),
    ]
    triples = _triples(spark, rows)
    mapping = link_entities(triples)
    m = {r.uri: r.canonical for r in mapping.collect()}
    # all TechCorp variants merge to one canonical (min uri = …/Techcorp)
    assert m[BASE + "TechcorpInc"] == m[BASE + "Techcorp"] == m[BASE + "TechcorpGroup"]
    canon = m[BASE + "Techcorp"]
    # DataSystems and the person stay separate
    assert m[BASE + "DatasystemsCorp"] != canon
    assert m[BASE + "JohnSmith"] != canon
    assert m[BASE + "JohnSmith"] != m[BASE + "DatasystemsCorp"]

    out = canonicalize_triples(triples, mapping)
    rows_out = out.collect()
    # the two locatedIn Austin rows collapse to one (first wins: d1)
    located = [r for r in rows_out if r.predicate.endswith("locatedIn")]
    assert len(located) == 1 and located[0].subject == canon and located[0].source == "d1"
    # object remap: worksFor object now canonical
    wf = [r for r in rows_out if r.predicate.endswith("worksFor")][0]
    assert wf.object == canon
    # literal objects untouched
    names = {r.object for r in rows_out if r.predicate.endswith("hasName")}
    assert names == {"TechCorp Inc.", "DataSystems Corp"}


def test_linking_on_generated_corpus(spark, example_config):
    """Alias mentions in the synthetic corpus must merge: cluster
    assignment = stem rule (same stripped key ⇒ same component)."""
    from rdf_knowledge_extractor_spark.functions.extract import (
        extract_triples_stage,
        split_triples_and_lineage,
    )
    from rdf_knowledge_extractor_spark.sources.pages import pages_dataframe

    pages = pages_dataframe(spark, 40, seed=42)
    extracted = extract_triples_stage(pages, example_config, client_kind="stub")
    triples, _ = split_triples_and_lineage(extracted)
    triples = triples.cache()

    mapping = link_entities(triples)
    ent = with_canonical_key(entity_universe(triples))
    joined = ent.join(mapping, on="uri").select("key", "canonical").distinct().collect()
    by_key: dict[str, set] = {}
    by_canon: dict[str, set] = {}
    for r in joined:
        by_key.setdefault(r.key, set()).add(r.canonical)
        by_canon.setdefault(r.canonical, set()).add(r.key)
    # recall: one component per key
    bad_recall = {k: v for k, v in by_key.items() if len(v) > 1}
    assert not bad_recall, bad_recall
    # precision: one key per component
    bad_precision = {c: v for c, v in by_canon.items() if len(v) > 1}
    assert not bad_precision, bad_precision
