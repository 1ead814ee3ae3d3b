"""Command-line surface mirroring the reference binary's subcommands
(ref:src/main.rs:294-358 dispatch): extract, query, export, stats,
generate, generate-config, list-templates, validate, check-server,
generate-templates, demo — the full 11-subcommand surface, so a user
of the reference can run every workflow against the Spark engine.

Usage examples:
    python -m rdf_knowledge_extractor_spark.cli extract \
        --config cfg.yaml doc1.txt doc2.txt --merge --kg kg.json \
        -o out.nt --format n-triples
    python -m rdf_knowledge_extractor_spark.cli query \
        --kg kg.json "SELECT ?name WHERE { ?e hasName ?name }" --format csv
    python -m rdf_knowledge_extractor_spark.cli export \
        --kg kg.json -o graph.ttl --format turtle
    python -m rdf_knowledge_extractor_spark.cli stats --kg kg.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _spark(args):
    """(session, owns): only stop sessions this process created —
    in-process callers (tests, notebooks) keep theirs."""
    from pyspark.sql import SparkSession

    from rdf_knowledge_extractor_spark.session import get_spark

    existing = SparkSession.getActiveSession()
    if existing is not None:
        return existing, False
    return get_spark(app_name=f"kgcli-{args.command}", master=args.master), True


def _load_kg(spark, path: str):
    from rdf_knowledge_extractor_spark.sources.kg_json import read_kg_json

    if path and Path(path).exists():
        return read_kg_json(spark, path)
    from rdf_knowledge_extractor_spark.schemas import TRIPLE_SCHEMA

    return spark.createDataFrame([], TRIPLE_SCHEMA)


def cmd_extract(args) -> int:
    from rdf_knowledge_extractor_spark.config import Configuration
    from rdf_knowledge_extractor_spark.functions.extract import (
        extract_triples_stage,
        split_triples_and_lineage,
    )
    from rdf_knowledge_extractor_spark.operators.dedup import (
        insert_new_triples,
        merge_results,
    )
    from rdf_knowledge_extractor_spark.operators.validate import validation_issues
    from rdf_knowledge_extractor_spark.sinks.serialization import serialize
    from rdf_knowledge_extractor_spark.sources.kg_json import write_kg_json
    from rdf_knowledge_extractor_spark.sources.text_files import process_documents
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    config = Configuration.from_file(args.config)
    config.validate()
    spark, owns = _spark(args)
    pages = None
    if args.pages:
        pages = spark.read.parquet(args.pages)
    docs = process_documents(spark, args.inputs, pages)
    # assign doc_seq by CLI input order (the reference processes inputs
    # sequentially in argument order, ref:src/core/extractor.rs:199-208)
    order = {src: i for i, src in enumerate(args.inputs)}
    order_df = spark.createDataFrame(
        [(s, i) for s, i in order.items()], "source string, doc_seq long"
    )
    docs = docs.join(order_df, on="source").cache()
    # per-document errors surface instead of silently vanishing
    # (ExtractionResult.errors parity, ref:src/core/extractor.rs:60-71)
    doc_errors = [
        (r["source"], r["error"])
        for r in docs.filter(F.col("error").isNotNull()).select("source", "error").collect()
    ]
    for src, err in doc_errors:
        print(f"ERROR processing {src}: {err}", file=sys.stderr)
    docs_ok = docs.filter(F.col("error").isNull())
    extracted = extract_triples_stage(
        docs_ok.withColumnRenamed("source", "url"),
        config,
        client_kind=args.llm,
    ).cache()
    triples, lineage = split_triples_and_lineage(extracted)

    if args.merge:
        triples = merge_results(triples, config.post_processing.deduplicate)

    if args.validate:
        issues = [r.issue for r in validation_issues(triples).collect()]
        for issue in issues:
            print(f"VALIDATION: {issue}", file=sys.stderr)

    kg = _load_kg(spark, args.kg)
    new_rows, updated = insert_new_triples(kg, triples)
    added = new_rows.count()
    if args.kg:
        write_kg_json(updated, args.kg)

    if args.output:
        text = serialize(
            triples, args.format, config.rdf_schema.namespace, config.rdf_schema.prefix
        )
        Path(args.output).write_text(text, encoding="utf-8")

    errs = (lineage.agg(F.sum(F.size("errors"))).collect()[0][0] or 0) + len(doc_errors)
    n_processed = len(args.inputs) - len(doc_errors)
    print(
        f"Extracted {triples.count()} triples from {n_processed} documents "
        f"({added} new in knowledge graph, {errs} errors)"
    )
    if owns:
        spark.stop()
    return 0


def cmd_query(args) -> int:
    from rdf_knowledge_extractor_spark.query.sparql import execute_sparql

    spark, owns = _spark(args)
    graph = _load_kg(spark, args.kg)
    query = args.query
    if query.startswith("@"):  # query from file, like the reference's --file
        query = Path(query[1:]).read_text()
    result = execute_sparql(graph, query)
    rows = [r.asDict() for r in result.collect()]
    if args.format == "json":
        print(json.dumps(rows, indent=2, default=str))
    elif args.format == "csv":
        cols = result.columns
        print(",".join(cols))
        for r in rows:
            # reference quotes iff the value contains a comma (ref:src/main.rs CSV path)
            print(",".join(
                (f'"{v}"' if "," in str(v) else str(v)) if (v := r.get(c)) is not None else ""
                for c in cols
            ))
    else:
        result.show(args.limit, truncate=False)
    if owns:
        spark.stop()
    return 0


def cmd_export(args) -> int:
    from rdf_knowledge_extractor_spark.sinks.serialization import (
        serialize_json,
        serialize_jsonld,
        serialize_ntriples,
        serialize_rdf_xml,
        serialize_turtle,
    )

    spark, owns = _spark(args)
    graph = _load_kg(spark, args.kg)
    fmt = args.format.lower()
    # ref:src/knowledge_graph/mod.rs:273-313 export_to_file formats
    # (turtle | jsonld | ntriples | rdfxml | json — ref:src/main.rs:794-800)
    if fmt in ("turtle", "ttl"):
        text = serialize_turtle(graph, args.namespace, args.prefix, store=True)
    elif fmt in ("ntriples", "nt", "n-triples"):
        text = serialize_ntriples(graph, strict=False)
    elif fmt in ("jsonld", "json-ld"):
        text = serialize_jsonld(graph, args.namespace, args.prefix)
    elif fmt in ("rdfxml", "rdf-xml"):
        text = serialize_rdf_xml(graph, args.namespace, args.prefix)
    elif fmt == "json":
        text = serialize_json(graph)
    else:
        print(
            f"Unsupported export format: {fmt}. "
            "Supported: turtle, ntriples, jsonld, rdfxml, json",
            file=sys.stderr,
        )
        if owns:
            spark.stop()
        return 1
    Path(args.output).write_text(text, encoding="utf-8")
    print(f"Knowledge graph exported to: {args.output} (format: {fmt})")
    if owns:
        spark.stop()
    return 0


def cmd_stats(args) -> int:
    from rdf_knowledge_extractor_spark.operators.stats import graph_statistics

    spark, owns = _spark(args)
    graph = _load_kg(spark, args.kg)
    s = graph_statistics(graph).collect()[0]
    # ref:src/knowledge_graph/mod.rs:342-356 Display format
    print(
        "Knowledge Graph Statistics:\n"
        f"Total Triples: {s.total_triples}\n"
        f"Unique Subjects: {s.unique_subjects}\n"
        f"Unique Predicates: {s.unique_predicates}\n"
        f"Unique Objects: {s.unique_objects}"
    )
    if owns:
        spark.stop()
    return 0


def cmd_generate(args) -> int:
    from rdf_knowledge_extractor_spark.templates.engine import TemplateManager

    spark, owns = _spark(args)
    graph = _load_kg(spark, args.kg)
    mgr = TemplateManager(graph)
    template = mgr.load(args.template)
    doc = mgr.generate_document(template.id, context=json.loads(args.context or "{}"))
    Path(args.output).write_text(doc.generated_content, encoding="utf-8")
    print(
        f"Generated document: {args.output} "
        f"({doc.word_count} words, queries: {', '.join(doc.queries_executed)})"
    )
    if owns:
        spark.stop()
    return 0


def cmd_generate_config(args) -> int:
    # ref:src/config/mod.rs:120-184 example config
    from dataclasses import asdict

    from rdf_knowledge_extractor_spark.config import Configuration

    cfg = Configuration.example()
    import yaml

    Path(args.output).write_text(yaml.safe_dump(asdict(cfg), sort_keys=False))
    print(f"Example configuration written to: {args.output}")
    return 0


def cmd_list_templates(args) -> int:
    """ListTemplates parity (ref:src/main.rs:808-852): count + per-template
    name/id/type/description/query-count lines."""
    from rdf_knowledge_extractor_spark.templates.engine import (
        load_templates_from_dir,
    )

    if not Path(args.template_dir).exists():
        print(f"Template directory not found: {args.template_dir}")
        return 0  # reference returns Ok(()) here too
    try:
        templates = load_templates_from_dir(args.template_dir)
    except Exception as e:  # ref prints failure, exits Ok
        print(f"Failed to load templates: {e}")
        return 0
    print(f"Found {len(templates)} templates in {args.template_dir}")
    for t in templates.values():
        print(f"\n{t.name} ({t.id})")
        print(f"   Type: {t.template_type}")
        print(f"   Description: {t.description}")
        print(f"   Queries: {len(t.data_queries)}")
    return 0


def cmd_validate(args) -> int:
    """Standalone config validation (ref:src/main.rs:503-529)."""
    from rdf_knowledge_extractor_spark.config import Configuration

    try:
        config = Configuration.from_file(args.config)
        config.validate()
    except Exception as e:
        print(f"Configuration validation failed: {e}", file=sys.stderr)
        return 1
    print("Configuration is valid!")
    print(f"Name: {config.name}")
    print(f"Version: {config.version}")
    print(f"Questions: {len(config.extraction_questions)}")
    print(f"Namespace: {config.rdf_schema.namespace}")
    print(f"Model: {config.llm_settings.model}")
    return 0


def cmd_check_server(args) -> int:
    """CheckServer parity (ref:src/main.rs:531-567): health probe, then
    model listing (listing failure is a warning, not an error)."""
    from rdf_knowledge_extractor_spark.functions.llm import HttpLlmClient

    client = HttpLlmClient(args.server_url, model="test", api_key=args.api_key)
    if client.check_health():
        print(f"Server is healthy at {args.server_url}")
    else:
        print(f"Server is not responding at {args.server_url}")
        return 0  # reference returns Ok(()) on unhealthy
    try:
        models = client.list_models()
        print("Available models:")
        for m in models:
            print(f"  - {m}")
    except Exception as e:
        print(f"Could not list models: {e}", file=sys.stderr)
    return 0


def cmd_generate_templates(args) -> int:
    """GenerateTemplates parity (ref:src/main.rs:856-938): write the two
    example templates (company_report, executive_summary)."""
    from rdf_knowledge_extractor_spark.templates.examples import (
        COMPANY_REPORT_YAML,
        EXECUTIVE_SUMMARY_YAML,
    )

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    report = out / "company_report.yaml"
    summary = out / "executive_summary.yaml"
    report.write_text(COMPANY_REPORT_YAML, encoding="utf-8")
    summary.write_text(EXECUTIVE_SUMMARY_YAML, encoding="utf-8")
    print("Generated example templates:")
    print(f"  {report}")
    print(f"  {summary}")
    print("Edit these templates to customize for your use case")
    return 0


def cmd_demo(args) -> int:
    """Demo parity (ref:src/main.rs:1088-1214): extract from the example
    source docs (unless --skip-extraction), save the KG, then populate
    the template via LLM population.  The stub client keeps the demo
    runnable offline; --llm http targets a live vLLM server."""
    import yaml

    from rdf_knowledge_extractor_spark.config import Configuration
    from rdf_knowledge_extractor_spark.functions.extract import (
        extract_triples_stage,
        split_triples_and_lineage,
    )
    from rdf_knowledge_extractor_spark.operators.dedup import insert_new_triples
    from rdf_knowledge_extractor_spark.operators.stats import graph_statistics
    from rdf_knowledge_extractor_spark.sinks.serialization import serialize_ntriples
    from rdf_knowledge_extractor_spark.sources.kg_json import write_kg_json
    from rdf_knowledge_extractor_spark.sources.text_files import process_documents
    from rdf_knowledge_extractor_spark.templates.engine import TemplateManager
    from pyspark.sql import functions as F

    print("Running complete workflow demo...")
    config = Configuration.from_file(args.config)
    config.validate()
    spark, owns = _spark(args)
    kg = _load_kg(spark, args.kg)

    if not args.skip_extraction:
        print("PHASE 1: Extracting knowledge from documents...")
        docs = process_documents(spark, args.inputs, None)
        order_df = spark.createDataFrame(
            [(s, i) for i, s in enumerate(args.inputs)], "source string, doc_seq long"
        )
        docs = docs.filter(F.col("error").isNull()).join(order_df, on="source")
        extracted = extract_triples_stage(
            docs.withColumnRenamed("source", "url"), config, client_kind=args.llm
        )
        triples, _ = split_triples_and_lineage(extracted)
        per_doc = triples.groupBy("source").count().collect()
        for r in sorted(per_doc, key=lambda r: r["source"] or ""):
            print(f"  Extracted {r['count']} triples from {r['source']}")
        _, kg = insert_new_triples(kg, triples)
        if args.kg:
            write_kg_json(kg, args.kg)
        Path(args.nt_output).write_text(serialize_ntriples(kg, strict=False))
        total = graph_statistics(kg).collect()[0].total_triples
        print(f"Knowledge graph saved with {total} total triples")
    else:
        print(f"Using existing knowledge graph at {args.kg}")
        s = graph_statistics(kg).collect()[0]
        print(f"  - Total triples: {s.total_triples}")
        print(f"  - Unique subjects: {s.unique_subjects}")
        print(f"  - Unique predicates: {s.unique_predicates}")

    print("PHASE 2: Populating template with knowledge graph data...")
    mgr = TemplateManager(kg, llm_client=_demo_llm(args, config))
    template = mgr.load(args.template)
    template_yaml = yaml.safe_load(Path(args.template).read_text())
    content = template_yaml.get("template_content")
    if not content:
        print("No template_content found in template", file=sys.stderr)
        if owns:
            spark.stop()
        return 1
    populated = mgr.generate_with_llm_population(template.id, content)
    Path(args.output).write_text(populated, encoding="utf-8")
    print(f"Demo complete! Populated template written to: {args.output}")
    if owns:
        spark.stop()
    return 0


def _demo_llm(args, config):
    from rdf_knowledge_extractor_spark.functions.llm import make_client

    return make_client(args.llm, config)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sparkkg")
    p.add_argument("--master", default=None, help="spark master (default local[*])")
    sub = p.add_subparsers(dest="command", required=True)

    ext = sub.add_parser("extract", help="extract triples from documents")
    ext.add_argument("inputs", nargs="+")
    ext.add_argument("--config", required=True)
    ext.add_argument("--kg", default=None, help="knowledge-graph JSON store path")
    ext.add_argument("--pages", default=None, help="crawled pages parquet (for URL inputs)")
    ext.add_argument("--merge", action="store_true")
    ext.add_argument("--validate", action="store_true")
    ext.add_argument("-o", "--output", default=None)
    ext.add_argument("--format", default="n-triples",
                     choices=["turtle", "json-ld", "n-triples", "rdf-xml", "json"])
    ext.add_argument("--llm", default="stub", choices=["stub", "http"])
    ext.set_defaults(fn=cmd_extract)

    q = sub.add_parser("query", help="run a SPARQL query")
    q.add_argument("query")
    q.add_argument("--kg", required=True)
    q.add_argument("--format", default="table", choices=["table", "json", "csv"])
    q.add_argument("--limit", type=int, default=50)
    q.set_defaults(fn=cmd_query)

    ex = sub.add_parser("export", help="export the knowledge graph")
    ex.add_argument("--kg", required=True)
    ex.add_argument("-o", "--output", required=True)
    ex.add_argument("--format", default="ntriples")
    ex.add_argument("--namespace", default="http://example.org/ontology#")
    ex.add_argument("--prefix", default="ex")
    ex.set_defaults(fn=cmd_export)

    st = sub.add_parser("stats", help="knowledge-graph statistics")
    st.add_argument("--kg", required=True)
    st.set_defaults(fn=cmd_stats)

    gen = sub.add_parser("generate", help="generate a document from a template")
    gen.add_argument("--template", required=True)
    gen.add_argument("--kg", required=True)
    gen.add_argument("-o", "--output", required=True)
    gen.add_argument("--context", default=None, help="JSON object of extra context")
    gen.set_defaults(fn=cmd_generate)

    gc = sub.add_parser("generate-config", help="write an example config")
    gc.add_argument("-o", "--output", required=True)
    gc.set_defaults(fn=cmd_generate_config)

    lt = sub.add_parser("list-templates", help="list available templates")
    lt.add_argument("-t", "--template-dir", default="templates")
    lt.set_defaults(fn=cmd_list_templates)

    va = sub.add_parser("validate", help="validate a configuration file")
    va.add_argument("-c", "--config", required=True)
    va.set_defaults(fn=cmd_validate)

    cs = sub.add_parser("check-server", help="check LLM server status")
    cs.add_argument("--server-url", default="http://localhost:8000")
    cs.add_argument("--api-key", default=None)
    cs.set_defaults(fn=cmd_check_server)

    gt = sub.add_parser("generate-templates", help="write example templates")
    gt.add_argument("-o", "--output-dir", default="templates")
    gt.set_defaults(fn=cmd_generate_templates)

    dm = sub.add_parser("demo", help="end-to-end extract + template population")
    dm.add_argument("--config", default="examples/business_config.yaml")
    dm.add_argument("--kg", default="demo_knowledge_graph.db")
    dm.add_argument("--inputs", nargs="+", default=["examples/sample_report.txt"])
    dm.add_argument("--skip-extraction", action="store_true")
    dm.add_argument("-t", "--template", default="examples/sales_llm_template.yaml")
    dm.add_argument("-o", "--output", default="populated_sales_report.md")
    dm.add_argument("--nt-output", default="demo_knowledge.nt")
    dm.add_argument("--llm", default="stub", choices=["stub", "http"])
    dm.set_defaults(fn=cmd_demo)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except Exception as e:  # one-line operator-facing error, like the
        # reference's anyhow::Error display (ref:src/main.rs main's `?`)
        msg = str(e).strip().splitlines()[0] if str(e).strip() else repr(e)
        print(f"Error: {msg}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
