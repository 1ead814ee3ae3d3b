"""Template layer tests: helpers, renderer, data queries, field scan."""

from __future__ import annotations

import pytest

from rdf_knowledge_extractor_spark.templates.engine import (
    TemplateManager,
    _helper_capitalize,
    _helper_format_list,
    _helper_truncate,
    extract_template_fields,
    load_template,
    render_template,
    type_value,
)

NS = "http://sales.intelligence.org/ontology#"
R = "http://sales.intelligence.org/resource/"


# -- helpers (ref:src/templates/mod.rs:372-439) --

def test_format_list():
    assert _helper_format_list([["a", "b", "c"]]) == "a, b, c"
    assert _helper_format_list([["a", "b"], " | "]) == "a | b"
    assert _helper_format_list([["a", 5, "b"]]) == "a, b"  # non-strings dropped
    assert _helper_format_list(["not a list"]) == ""


def test_truncate_bytes():
    assert _helper_truncate(["hello", 100]) == "hello"
    assert _helper_truncate(["hello world", 5]) == "hello..."
    # BYTE semantics: é is 2 bytes
    assert _helper_truncate(["ééé", 4]) == "éé..."
    assert _helper_truncate(["abc"]) == "abc"  # default 100


def test_capitalize():
    assert _helper_capitalize(["hello"]) == "Hello"
    assert _helper_capitalize([""]) == ""
    assert _helper_capitalize(["already Up"]) == "Already Up"


# -- dynamic typing (ref:src/templates/mod.rs:249-257) --

def test_type_value():
    assert type_value("42") == 42 and isinstance(type_value("42"), int)
    assert type_value("4.5") == 4.5
    assert type_value("true") is True and type_value("false") is False
    assert type_value("True") == "True"  # Rust bool parse is lowercase-only
    assert type_value("hello") == "hello"
    assert type_value("99999999999999999999999") == 1e23  # i64 overflow → f64


# -- renderer --

def test_render_variables_and_paths():
    ctx = {"name": "Acme", "stats": {"total": 7}}
    assert render_template("Hi {{name}}: {{stats.total}}", ctx) == "Hi Acme: 7"
    assert render_template("missing: [{{nope}}]", ctx) == "missing: []"


def test_render_each_and_if():
    ctx = {
        "companies": [
            {"name": "Acme", "score": 90},
            {"name": "Beta", "score": 75},
        ],
        "empty": [],
    }
    out = render_template(
        "{{#each companies}}{{@index}}:{{name}}={{score}};{{/each}}", ctx
    )
    assert out == "0:Acme=90;1:Beta=75;"
    out2 = render_template("{{#each empty}}x{{else}}none{{/each}}", ctx)
    assert out2 == "none"
    out3 = render_template("{{#if companies}}yes{{else}}no{{/if}}", ctx)
    assert out3 == "yes"
    out4 = render_template("{{#unless empty}}empty!{{/unless}}", ctx)
    assert out4 == "empty!"


def test_render_helpers_inline():
    ctx = {"tags": ["x", "y"], "desc": "a" * 200}
    assert render_template('{{format_list tags " / "}}', ctx) == "x / y"
    assert render_template("{{truncate desc 10}}", ctx) == "a" * 10 + "..."
    assert render_template("{{capitalize name}}", {"name": "acme"}) == "Acme"


def test_render_scalar_each():
    ctx = {"items": ["a", "b"]}
    assert render_template("{{#each items}}[{{this}}]{{/each}}", ctx) == "[a][b]"


# -- field scanning (ref:src/templates/llm_population.rs:129-188) --

def test_extract_template_fields():
    tpl = (
        "Name: [FIELD: Company Name]\n"
        "Tier: [DROPDOWN: Gold, Silver]\n"
        "Date: [DATE FIELD]\n"
        "Options: [CHECKLIST: a, b, c]\n"
        "Notes: [TEXT AREA: Summary]\n"
    )
    fields = extract_template_fields(tpl)
    kinds = [(f.field_type, f.field_name, f.required) for f in fields]
    assert ("text", "Company Name", True) in kinds
    assert ("dropdown", "Dropdown: Gold, Silver", True) in kinds
    assert ("date", "Date", False) in kinds
    assert ("checklist", "Checklist: a, b, c", False) in kinds
    assert ("textarea", "Summary", False) in kinds
    assert len(fields) == 5


# -- end-to-end over the Spark query layer --

@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        (R + "Acme", NS + "hasName", "Acme Corp"),
        (R + "Acme", NS + "hasPriorityScore", "90"),
        (R + "Beta", NS + "hasName", "Beta Inc"),
        (R + "Beta", NS + "hasPriorityScore", "75"),
    ]
    return spark.createDataFrame(rows, "subject string, predicate string, object string")


def test_generate_document(graph, tmp_path):
    tpl_yaml = f"""
id: top_report
name: Top Companies
template_type: report
data_queries:
  - id: top_companies
    required: true
    sparql_query: |
      PREFIX s: <{NS}>
      SELECT ?name ?score WHERE {{
        ?c s:hasName ?name ; s:hasPriorityScore ?score .
      }}
      ORDER BY DESC(?score)
      LIMIT 5
template_content: |
  # Top Companies
  {{{{#each top_companies}}}}
  - {{{{name}}}} ({{{{score}}}})
  {{{{/each}}}}
"""
    p = tmp_path / "tpl.yaml"
    p.write_text(tpl_yaml)
    mgr = TemplateManager(graph)
    mgr.load(p)
    doc = mgr.generate_document("top_report")
    assert "- Acme Corp (90)" in doc.generated_content
    assert "- Beta Inc (75)" in doc.generated_content
    assert doc.generated_content.index("Acme") < doc.generated_content.index("Beta")
    assert doc.queries_executed == ["top_companies"]
    assert doc.word_count > 0
    # typed values: score became an int
    assert doc.data_context["top_companies"][0]["score"] == 90


def test_required_query_failure(graph, tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(
        "id: bad\ndata_queries:\n  - id: q1\n    required: true\n"
        "    sparql_query: 'DELETE WHERE { ?s ?p ?o }'\ntemplate_content: 'x'\n"
    )
    mgr = TemplateManager(graph)
    mgr.load(p)
    import pytest as _pytest

    with _pytest.raises(Exception, match="Required query 'q1' failed"):
        mgr.generate_document("bad")


def test_optional_query_failure_is_null(graph, tmp_path):
    p = tmp_path / "opt.yaml"
    p.write_text(
        "id: opt\ndata_queries:\n  - id: q1\n    required: false\n"
        "    sparql_query: 'DELETE WHERE'\n"
        "template_content: '{{#if q1}}have{{else}}missing{{/if}}'\n"
    )
    mgr = TemplateManager(graph)
    mgr.load(p)
    doc = mgr.generate_document("opt")
    assert doc.generated_content == "missing"
    assert doc.data_context["q1"] is None


def test_population_prompt_shape(graph):
    mgr = TemplateManager(graph)
    prompt = mgr.build_population_prompt(
        "Report: [FIELD: Company Name]",
        {"q1": [{"name": "Acme", "score": 90}]},
        instructions="Be brief.",
    )
    assert prompt.startswith("## Template to Populate\n\nReport: [FIELD: Company Name]\n\n")
    assert "### Query: q1\n" in prompt
    assert "Result 1:\n" in prompt and "  - name: Acme\n" in prompt
    assert "## Additional Instructions\n\nBe brief.\n\n" in prompt
    assert prompt.rstrip().endswith("Make the report professional and actionable.")


def test_stub_population_fills_placeholders(graph):
    from rdf_knowledge_extractor_spark.functions.llm import StubLlmClient

    mgr = TemplateManager(
        graph,
        llm_client=StubLlmClient("http://e.org/r/", "http://e.org/o#"),
    )
    prompt = mgr.build_population_prompt(
        "### [FIELD: Company Name]\nScore: [FIELD: Score]/100\n"
        "Industry: [FIELD: Industry Type]\n"
        "Contact: [DROPDOWN: LinkedIn | Email]\nLast: [DATE FIELD]",
        {"q1": [{"name": "Acme", "score": 90}]},
    )
    out = mgr.llm_client.generate_structured_batch([prompt], None)[0]
    assert "[FIELD:" not in out and "[DROPDOWN:" not in out and "[DATE FIELD]" not in out
    assert "Acme" in out  # 'name' key matched the Company Name label
    assert "90" in out  # 'score' key matched the Score label
    assert "Not Available" in out  # no datum for Industry Type
    assert "LinkedIn" in out  # first dropdown option


def test_load_reference_template():
    t = load_template("/root/reference/templates/sales_target_companies.yaml")
    assert t.id == "sales_target_companies"
    assert len(t.data_queries) >= 2
    assert t.data_queries[0].id == "top_companies"
    assert "ORDER BY DESC(?score)" in t.data_queries[0].sparql_query
