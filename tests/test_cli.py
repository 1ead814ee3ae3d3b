"""CLI surface tests — driven through the real argv entry point
(subprocess for the no-session commands, in-process main() for the
Spark ones to reuse the test session's JVM)."""

from __future__ import annotations

import json
import subprocess
import sys

import yaml

CONFIG_YAML = """
name: cli-test
extraction_questions:
  - id: q1
    question: What companies are mentioned?
rdf_schema:
  namespace: "http://business.example.org/ontology#"
  prefix: biz
  base_uri: "http://business.example.org/resource/"
  predicates:
    hasName: name
    hasRole: role
    worksFor: works
    locatedIn: located
    partneredWith: partner
validation_rules: [require_valid_uri, require_known_predicates]
"""

DOC_TEXT = (
    "Acme Corp is led by Jane Doe, who serves as CEO. "
    "Acme Corp is headquartered in Austin."
)


def _run_cli(argv, cwd="/root/repo"):
    from rdf_knowledge_extractor_spark.cli import main

    return main(argv)


def test_generate_config(tmp_path):
    out = tmp_path / "cfg.yaml"
    rc = subprocess.run(
        [sys.executable, "-m", "rdf_knowledge_extractor_spark.cli",
         "generate-config", "-o", str(out)],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    cfg = yaml.safe_load(out.read_text())
    assert cfg["name"] == "Example RDF Extraction Config"
    assert "hasName" in cfg["rdf_schema"]["predicates"]


def test_extract_query_export_stats_roundtrip(spark, tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CONFIG_YAML)
    doc = tmp_path / "doc.txt"
    doc.write_text(DOC_TEXT)
    kg = tmp_path / "kg.json"
    nt = tmp_path / "out.nt"

    rc = _run_cli([
        "--master", "local[2]", "extract", str(doc),
        "--config", str(cfg), "--kg", str(kg), "--merge",
        "-o", str(nt), "--format", "n-triples",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Extracted" in out and "new in knowledge graph" in out
    lines = [l for l in nt.read_text().splitlines() if l]
    assert any("hasName> \"Acme Corp\"" in l for l in lines)
    assert any("locatedIn> \"Austin\"" in l for l in lines)
    store = json.loads(kg.read_text())
    assert len(store) == len(lines)

    # query (reference name pattern)
    rc = _run_cli([
        "--master", "local[2]", "query",
        "SELECT ?name WHERE { ?e hasName ?name }",
        "--kg", str(kg), "--format", "json",
    ])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert {"name": "Acme Corp", "entity": "http://business.example.org/resource/AcmeCorp"} in rows

    # export turtle (store variant)
    ttl = tmp_path / "g.ttl"
    rc = _run_cli([
        "--master", "local[2]", "export", "--kg", str(kg),
        "-o", str(ttl), "--format", "turtle",
        "--namespace", "http://business.example.org/ontology#", "--prefix", "biz",
    ])
    assert rc == 0
    text = ttl.read_text()
    assert text.startswith("@prefix rdf:")
    assert "biz:hasName" in text

    # stats
    rc = _run_cli(["--master", "local[2]", "stats", "--kg", str(kg)])
    assert rc == 0
    stats_out = capsys.readouterr().out
    assert "Knowledge Graph Statistics:" in stats_out
    assert f"Total Triples: {len(lines)}" in stats_out

    # extract the SAME doc again: insert-if-absent adds 0
    rc = _run_cli([
        "--master", "local[2]", "extract", str(doc),
        "--config", str(cfg), "--kg", str(kg), "--merge",
    ])
    assert rc == 0
    assert "(0 new in knowledge graph" in capsys.readouterr().out


def test_generate_document_cli(spark, tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CONFIG_YAML)
    doc = tmp_path / "doc.txt"
    doc.write_text(DOC_TEXT)
    kg = tmp_path / "kg.json"
    _run_cli(["--master", "local[2]", "extract", str(doc), "--config", str(cfg), "--kg", str(kg)])
    capsys.readouterr()

    tpl = tmp_path / "tpl.yaml"
    tpl.write_text(
        "id: rpt\nname: Report\ndata_queries:\n"
        "  - id: names\n    required: true\n"
        "    sparql_query: 'SELECT ?name WHERE { ?e hasName ?name }'\n"
        "template_content: |\n  # Companies\n  {{#each names}}\n  - {{name}}\n  {{/each}}\n"
    )
    out = tmp_path / "report.md"
    rc = _run_cli([
        "--master", "local[2]", "generate", "--template", str(tpl),
        "--kg", str(kg), "-o", str(out),
    ])
    assert rc == 0
    assert "- Acme Corp" in out.read_text()
