"""Query layer tests: faithful reference dispatcher + real mini-SPARQL."""

from __future__ import annotations

import pytest

from rdf_knowledge_extractor_spark.query.sparql import (
    SparqlError,
    execute_simple_sparql,
    execute_sparql,
)

NS = "http://sales.intelligence.org/ontology#"
R = "http://sales.intelligence.org/resource/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        (R + "Acme", RDF_TYPE, NS + "Organization"),
        (R + "Acme", NS + "hasName", "Acme Corp"),
        (R + "Acme", NS + "hasPriorityScore", "90"),
        (R + "Beta", RDF_TYPE, NS + "Organization"),
        (R + "Beta", NS + "hasName", "Beta Inc"),
        (R + "Beta", NS + "hasPriorityScore", "75"),
        (R + "Beta", NS + "hasRevenue", "$10M"),
        (R + "Jane", NS + "hasRole", "CEO"),
        (R + "Jane", NS + "worksFor", R + "Acme"),
    ]
    return spark.createDataFrame(rows, "subject string, predicate string, object string")


# -- faithful dispatcher (ref:src/knowledge_graph/mod.rs:116-166) --

def test_simple_name_pattern(graph):
    out = execute_simple_sparql(graph, "SELECT ?name WHERE { ?e hasName ?name }")
    rows = {(r.name, r.entity) for r in out.collect()}
    assert rows == {("Acme Corp", R + "Acme"), ("Beta Inc", R + "Beta")}
    assert out.columns == ["name", "entity"]


def test_simple_role_pattern(graph):
    out = execute_simple_sparql(graph, "select ?role where { ?p hasRole ?role }")
    assert [(r.role, r.person) for r in out.collect()] == [("CEO", R + "Jane")]


def test_simple_fallback_dump(graph):
    out = execute_simple_sparql(graph, "SELECT ?s WHERE { ?s ?p ?o }")
    assert out.count() == graph.count()
    assert out.columns == ["subject", "predicate", "object"]


def test_simple_rejects_non_select(graph):
    with pytest.raises(SparqlError):
        execute_simple_sparql(graph, "ASK { ?s ?p ?o }")


# -- real mini-SPARQL engine --

def test_bgp_join(graph):
    q = f"""
    PREFIX sales: <{NS}>
    SELECT ?name ?score WHERE {{
      ?c a sales:Organization ;
         sales:hasName ?name ;
         sales:hasPriorityScore ?score .
    }}
    ORDER BY DESC(?score)
    LIMIT 5
    """
    out = execute_sparql(graph, q)
    assert [(r.name, r.score) for r in out.collect()] == [
        ("Acme Corp", "90"),
        ("Beta Inc", "75"),
    ]


def test_optional(graph):
    q = f"""
    PREFIX sales: <{NS}>
    SELECT ?name ?revenue WHERE {{
      ?c sales:hasName ?name .
      OPTIONAL {{ ?c sales:hasRevenue ?revenue }}
    }}
    ORDER BY ?name
    """
    rows = [(r.name, r.revenue) for r in execute_sparql(graph, q).collect()]
    assert rows == [("Acme Corp", None), ("Beta Inc", "$10M")]


def test_join_across_entities(graph):
    q = f"""
    PREFIX sales: <{NS}>
    SELECT ?role ?orgname WHERE {{
      ?p sales:hasRole ?role ;
         sales:worksFor ?org .
      ?org sales:hasName ?orgname .
    }}
    """
    assert [(r.role, r.orgname) for r in execute_sparql(graph, q).collect()] == [
        ("CEO", "Acme Corp")
    ]


def test_literal_constant(graph):
    q = f'PREFIX s: <{NS}> SELECT ?e WHERE {{ ?e s:hasName "Acme Corp" }}'
    assert [r.e for r in execute_sparql(graph, q).collect()] == [R + "Acme"]


def test_select_star(graph):
    q = f"PREFIX s: <{NS}> SELECT * WHERE {{ ?e s:hasRole ?r }}"
    out = execute_sparql(graph, q)
    assert sorted(out.columns) == ["e", "r"]


def test_fallback_on_unparsable(graph):
    # parses as SELECT but the body isn't our subset → falls back to the
    # reference dispatcher (name pattern)
    out = execute_sparql(graph, "SELECT ?name WHERE { FILTER(?name) hasName }")
    assert out.columns == ["name", "entity"]


def test_sparql_fallback_only_for_loose_queries(spark):
    """A real-engine query (PREFIX/IRIs) with an unsupported feature
    must raise, not silently dump the whole graph (ADVICE fix)."""
    import pytest

    from rdf_knowledge_extractor_spark.query.sparql import (
        SparqlError,
        execute_sparql,
    )
    from rdf_knowledge_extractor_spark.schemas import TRIPLE_SCHEMA

    graph = spark.createDataFrame(
        [("http://e/s", "http://e/hasName", "Acme", 1.0, None, {}, 0, 0)],
        TRIPLE_SCHEMA,
    )
    # loose reference-style query → fallback dispatcher is fine
    rows = execute_sparql(graph, "SELECT ?name WHERE { ?e hasName ?name }").collect()
    assert rows[0]["name"] == "Acme"

    # prefixed query using an unsupported feature → propagate the error
    with pytest.raises(SparqlError):
        execute_sparql(
            graph,
            "PREFIX biz: <http://e/>\n"
            "SELECT ?s WHERE { ?s biz:hasName ?n . MINUS { ?s biz:x ?y } }",
        )
    # IRI-bearing query with a syntax error → propagate too
    with pytest.raises(SparqlError):
        execute_sparql(graph, "SELECT ?s WHERE { ?s <http://e/hasName ?n }")
