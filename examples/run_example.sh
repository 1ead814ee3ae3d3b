#!/usr/bin/env bash
# End-to-end example: extract → stats → query → export → report
# (mirrors the reference's example-sales-* workflow scripts).
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=$(mktemp -d)

python -m rdf_knowledge_extractor_spark.cli extract \
  examples/sample_report.txt \
  --config examples/business_config.yaml \
  --kg "$WORK/kg.json" --merge --validate \
  -o "$WORK/triples.nt" --format n-triples

python -m rdf_knowledge_extractor_spark.cli stats --kg "$WORK/kg.json"

python -m rdf_knowledge_extractor_spark.cli query \
  "SELECT ?name WHERE { ?e hasName ?name }" \
  --kg "$WORK/kg.json" --format csv

python -m rdf_knowledge_extractor_spark.cli export \
  --kg "$WORK/kg.json" -o "$WORK/graph.ttl" --format turtle \
  --namespace "http://business.example.org/ontology#" --prefix biz

python -m rdf_knowledge_extractor_spark.cli generate \
  --template examples/top_entities_template.yaml \
  --kg "$WORK/kg.json" -o "$WORK/report.md"

# full-surface extras (round 2): validate config, list templates,
# LLM-populated demo against the same KG
python -m rdf_knowledge_extractor_spark.cli validate -c examples/business_config.yaml
python -m rdf_knowledge_extractor_spark.cli generate-templates -o "$WORK/templates"
python -m rdf_knowledge_extractor_spark.cli list-templates -t "$WORK/templates"
python -m rdf_knowledge_extractor_spark.cli demo --skip-extraction \
  --config examples/business_config.yaml --kg "$WORK/kg.json" \
  -t examples/sales_llm_template.yaml -o "$WORK/populated.md" \
  --nt-output "$WORK/demo.nt"

echo "--- report.md ---"
cat "$WORK/report.md"
echo "--- artifacts in $WORK ---"
ls -la "$WORK"
