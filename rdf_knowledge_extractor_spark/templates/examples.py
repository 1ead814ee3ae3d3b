"""Example templates emitted by `generate-templates` — behavioral port
of the reference's embedded template strings (ref:src/main.rs:856-938,
generate_templates_command).  These are data artifacts (YAML text the
reference writes verbatim), reproduced so a reference user gets the
same starter files.
"""

COMPANY_REPORT_YAML = '''id: "company_report"
name: "Company Report"
description: "Generate a comprehensive report about companies and their employees"
template_type: "report"
data_queries:
  - id: "companies"
    description: "Get all companies with their basic information"
    sparql_query: |
      SELECT ?company ?name ?location WHERE {
        ?company biz:hasName ?name .
        OPTIONAL { ?company biz:basedIn ?location }
      }
    required: true

  - id: "people_roles"
    description: "Get people and their roles in companies"
    sparql_query: |
      SELECT ?person ?name ?role ?company WHERE {
        ?person biz:hasName ?name .
        OPTIONAL { ?person biz:hasRole ?role }
        OPTIONAL { ?person biz:worksFor ?company }
      }
    required: false

template_content: |
  # Company Report

  ## Companies Overview
  {{#each companies}}
  ### {{name}}
  {{#if location}}**Location:** {{location}}{{/if}}

  {{/each}}

  ## People and Roles
  {{#each people_roles}}
  - **{{name}}**{{#if role}} - {{role}}{{/if}}{{#if company}} ({{company}}){{/if}}
  {{/each}}

  ---
  *Generated on {{generation_timestamp}}*

output_format: "markdown"
llm_instructions: "Enhance the report with professional language and clear structure"
post_processing:
  enhance_with_llm: true
  style_guide: "Professional business report style"
  include_sources: true
'''

EXECUTIVE_SUMMARY_YAML = '''id: "executive_summary"
name: "Executive Summary"
description: "Generate an executive summary from company data"
template_type: "summary"
data_queries:
  - id: "key_metrics"
    description: "Get key business metrics and relationships"
    sparql_query: |
      SELECT ?subject ?predicate ?object WHERE {
        ?subject ?predicate ?object .
        FILTER(
          ?predicate = biz:partneredWith ||
          ?predicate = biz:foundedBy ||
          ?predicate = biz:ceoOf
        )
      }
    required: true

template_content: |
  # Executive Summary

  ## Key Business Insights
  {{#each key_metrics}}
  - **{{subject}}** {{predicate}} **{{object}}**
  {{/each}}

  ## Strategic Overview
  *This section will be enhanced by the LLM to provide strategic insights based on the extracted data.*

output_format: "markdown"
llm_instructions: "Create a strategic executive summary with insights about business relationships, leadership, and growth opportunities. Write in a professional, executive-level tone."
post_processing:
  enhance_with_llm: true
  style_guide: "Executive-level strategic communication"
  word_limit: 500
  include_sources: false
'''
