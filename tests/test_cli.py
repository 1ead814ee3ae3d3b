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


def test_validate_command(tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CONFIG_YAML)
    rc = _run_cli(["validate", "-c", str(cfg)])
    assert rc == 0
    out = capsys.readouterr().out
    # reference prints name/version/questions/namespace/model (main.rs:503-529)
    assert "Configuration is valid!" in out
    assert "Name: cli-test" in out
    assert "Questions: 1" in out
    assert "Namespace: http://business.example.org/ontology#" in out

    bad = tmp_path / "bad.yaml"
    bad.write_text("name: x\nextraction_questions: []\nrdf_schema:\n  namespace: n\n  prefix: p\n  base_uri: b\n")
    rc = _run_cli(["validate", "-c", str(bad)])
    assert rc == 1


def test_list_templates_command(tmp_path, capsys):
    rc = _run_cli(["list-templates", "-t", str(tmp_path / "missing")])
    assert rc == 0
    assert "Template directory not found" in capsys.readouterr().out

    rc = _run_cli(["generate-templates", "-o", str(tmp_path)])
    assert rc == 0
    capsys.readouterr()
    rc = _run_cli(["list-templates", "-t", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    # reference shape: count + name (id) + Type/Description/Queries lines
    assert "Found 2 templates" in out
    assert "Company Report (company_report)" in out
    assert "Executive Summary (executive_summary)" in out
    assert "Queries: 2" in out and "Queries: 1" in out


def test_generate_templates_yaml_shape(tmp_path):
    _run_cli(["generate-templates", "-o", str(tmp_path)])
    rpt = yaml.safe_load((tmp_path / "company_report.yaml").read_text())
    assert rpt["id"] == "company_report"
    assert [q["id"] for q in rpt["data_queries"]] == ["companies", "people_roles"]
    assert rpt["post_processing"]["enhance_with_llm"] is True
    summ = yaml.safe_load((tmp_path / "executive_summary.yaml").read_text())
    assert summ["post_processing"]["word_limit"] == 500


def test_check_server_unreachable(capsys):
    rc = _run_cli(["check-server", "--server-url", "http://127.0.0.1:59999"])
    assert rc == 0  # reference returns Ok(()) on unhealthy
    assert "Server is not responding" in capsys.readouterr().out


def test_check_server_healthy_lists_models(capsys):
    import http.server
    import json as _json
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/health":
                self.send_response(200); self.end_headers()
            elif self.path == "/v1/models":
                body = _json.dumps({"data": [{"id": "m1"}, {"id": "m2"}]}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404); self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rc = _run_cli(["check-server", "--server-url", f"http://127.0.0.1:{srv.server_port}"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Server is healthy" in out
        assert "- m1" in out and "- m2" in out
    finally:
        srv.shutdown()


def test_export_jsonld_and_rdfxml(spark, tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CONFIG_YAML)
    doc = tmp_path / "doc.txt"
    doc.write_text(DOC_TEXT)
    kg = tmp_path / "kg.json"
    _run_cli(["--master", "local[2]", "extract", str(doc), "--config", str(cfg), "--kg", str(kg)])
    capsys.readouterr()

    from rdf_knowledge_extractor_spark.sinks.serialization import (
        serialize_jsonld,
        serialize_rdf_xml,
    )
    from rdf_knowledge_extractor_spark.sources.kg_json import read_kg_json

    ns, px = "http://business.example.org/ontology#", "biz"
    jld = tmp_path / "g.jsonld"
    rc = _run_cli(["--master", "local[2]", "export", "--kg", str(kg), "-o", str(jld),
                   "--format", "json-ld", "--namespace", ns, "--prefix", px])
    assert rc == 0
    graph = read_kg_json(spark, str(kg))
    assert jld.read_text() == serialize_jsonld(graph, ns, px)
    doc_j = json.loads(jld.read_text())
    assert "@context" in doc_j and "@graph" in doc_j

    rx = tmp_path / "g.rdf"
    rc = _run_cli(["--master", "local[2]", "export", "--kg", str(kg), "-o", str(rx),
                   "--format", "rdf-xml", "--namespace", ns, "--prefix", px])
    assert rc == 0
    assert rx.read_text() == serialize_rdf_xml(graph, ns, px)
    assert rx.read_text().startswith("<?xml")


def test_extract_reports_unprocessable_inputs(spark, tmp_path, capsys):
    """pdf-without-library and URL-without-pages inputs must produce
    error lines, not vanish (ADVICE: ExtractionResult.errors parity)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CONFIG_YAML)
    doc = tmp_path / "doc.txt"
    doc.write_text(DOC_TEXT)
    kg = tmp_path / "kg.json"

    rc = _run_cli([
        "--master", "local[2]", "extract", str(doc), "https://nosuch.example/x",
        "--config", str(cfg), "--kg", str(kg),
    ])
    assert rc == 0
    captured = capsys.readouterr()
    assert "ERROR processing https://nosuch.example/x" in captured.err
    # summary counts only actually-processed documents
    assert "from 1 documents" in captured.out
    assert "1 errors" in captured.out


def test_demo_command(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.chdir("/root/repo")
    kg = tmp_path / "demo_kg.json"
    out = tmp_path / "report.md"
    nt = tmp_path / "demo.nt"
    rc = _run_cli([
        "--master", "local[2]", "demo",
        "--kg", str(kg), "-o", str(out), "--nt-output", str(nt),
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "PHASE 1" in printed and "PHASE 2" in printed
    assert "Knowledge graph saved with" in printed
    assert out.exists() and nt.exists()
    assert len(nt.read_text().splitlines()) > 0

    # skip-extraction path reuses the saved KG
    rc = _run_cli([
        "--master", "local[2]", "demo", "--skip-extraction",
        "--kg", str(kg), "-o", str(out), "--nt-output", str(nt),
    ])
    assert rc == 0
    assert "Using existing knowledge graph" in capsys.readouterr().out
