"""Template layer (Phase 2): data queries → rendered reports.

Driver-side by design — templates and their query results are small;
the heavy lifting (the actual SELECT/ORDER/LIMIT) happens in the
distributed query layer (query/sparql.py), which is an upgrade over
the reference where the LLM did the sorting/limiting by prompt
(ref:example-sales-3/CURRENT_STATUS.md "FAKE SPARQL").

Parity targets:
- Template/DataQuery model + YAML/JSON load + dir walk
  (ref:src/templates/mod.rs:16-58, :118-155)
- data-query loop with required/optional semantics and per-request
  query overrides (ref:src/templates/mod.rs:170-194)
- dynamic result typing i64 → f64 → bool → string
  (ref:src/templates/mod.rs:249-257; bool parse accepts only
  "true"/"false" like Rust's FromStr)
- a Handlebars-subset renderer with the reference's three helpers
  (ref:src/templates/mod.rs:372-439): format_list (string arrays,
  default ", "), truncate (first N BYTES + "..." — byte semantics like
  Rust's &text[..limit]), capitalize (first char uppercased)
- template-field scanning regexes (ref:src/templates/llm_population.rs:129-188)
- LLM population prompt builder (ref:src/templates/llm_population.rs:73-126)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame


class TemplateError(ValueError):
    pass


@dataclass
class DataQuery:
    # ref:src/templates/mod.rs:51-58
    id: str
    description: str = ""
    sparql_query: str = ""
    required: bool = True
    transform: str | None = None


@dataclass
class Template:
    # ref:src/templates/mod.rs:16-27
    id: str
    name: str = ""
    description: str = ""
    template_type: str = "report"
    data_queries: list[DataQuery] = field(default_factory=list)
    template_content: str = ""
    output_format: str = "markdown"
    llm_instructions: str | None = None
    post_processing: dict | None = None


@dataclass
class TemplateField:
    # ref:src/templates/llm_population.rs:10-16
    field_name: str
    field_type: str
    description: str
    required: bool


def load_template(path: str | Path) -> Template:
    # ref:src/templates/mod.rs:118-131 (JSON iff .json else YAML)
    path = Path(path)
    content = path.read_text(encoding="utf-8")
    if path.suffix == ".json":
        d = json.loads(content)
    else:
        import yaml

        d = yaml.safe_load(content)
    return Template(
        id=d.get("id", path.stem),
        name=d.get("name", ""),
        description=d.get("description", ""),
        template_type=str(d.get("template_type", "report")),
        data_queries=[
            DataQuery(
                id=q.get("id", ""),
                description=q.get("description", ""),
                sparql_query=q.get("sparql_query", ""),
                required=bool(q.get("required", True)),
                transform=q.get("transform"),
            )
            for q in d.get("data_queries", [])
        ],
        template_content=d.get("template_content", ""),
        output_format=d.get("output_format", "markdown"),
        llm_instructions=d.get("llm_instructions"),
        post_processing=d.get("post_processing"),
    )


def load_templates_from_dir(dir_path: str | Path) -> dict[str, Template]:
    # ref:src/templates/mod.rs:133-155 (recursive walk, .yaml/.yml/.json)
    out: dict[str, Template] = {}
    for p in sorted(Path(dir_path).rglob("*")):
        if p.suffix in (".yaml", ".yml", ".json") and p.is_file():
            t = load_template(p)
            out[t.id] = t
    return out


# ---------------------------------------------------------------------------
# dynamic typing of query-result values (ref:src/templates/mod.rs:249-257)
# ---------------------------------------------------------------------------

_INT_RE = re.compile(r"^[+-]?\d+$")


def type_value(value_str):
    if value_str is None:
        return None
    s = str(value_str)
    if _INT_RE.match(s):
        try:
            v = int(s)
            if -(2**63) <= v < 2**63:  # i64 range, like Rust parse::<i64>
                return v
        except ValueError:
            pass
    try:
        return float(s)
    except ValueError:
        pass
    if s == "true":
        return True
    if s == "false":
        return False
    return s


def process_query_results(df: DataFrame) -> list[dict]:
    """DataFrame → typed row dicts (SimpleSparqlResults::Solutions analog)."""
    return [
        {k: type_value(v) for k, v in row.asDict().items()} for row in df.collect()
    ]


# ---------------------------------------------------------------------------
# Handlebars-subset renderer with the reference's helpers
# ---------------------------------------------------------------------------

def _helper_format_list(args: list) -> str:
    # ref:src/templates/mod.rs:374-396 — string items only, default ", "
    if not args or not isinstance(args[0], list):
        return ""
    sep = args[1] if len(args) > 1 and isinstance(args[1], str) else ", "
    return sep.join(x for x in args[0] if isinstance(x, str))


def _helper_truncate(args: list) -> str:
    # ref:src/templates/mod.rs:398-419 — BYTE truncation + "..."
    if not args or not isinstance(args[0], str):
        return ""
    text = args[0]
    limit = int(args[1]) if len(args) > 1 and isinstance(args[1], (int, float)) else 100
    raw = text.encode("utf-8")
    if len(raw) > limit:
        return raw[:limit].decode("utf-8", errors="ignore") + "..."
    return text


def _helper_capitalize(args: list) -> str:
    # ref:src/templates/mod.rs:421-439
    if not args or not isinstance(args[0], str):
        return ""
    t = args[0]
    return t[0].upper() + t[1:] if t else t


HELPERS = {
    "format_list": _helper_format_list,
    "truncate": _helper_truncate,
    "capitalize": _helper_capitalize,
}

_TAG_RE = re.compile(r"\{\{([^}]+)\}\}")


def _lookup(path: str, ctx: dict, scopes: list):
    path = path.strip()
    if path == "this":
        for s in reversed(scopes):
            if isinstance(s, dict) and "this" in s:
                return s["this"]
        return scopes[-1] if scopes else ctx
    if path.startswith("@index"):
        for s in reversed(scopes):
            if isinstance(s, dict) and "@index" in s:
                return s["@index"]
        return None
    parts = path.split(".")
    # innermost scope first, then root context
    candidates = list(reversed(scopes)) + [ctx]
    for cand in candidates:
        cur = cand
        ok = True
        for p in parts:
            if isinstance(cur, dict) and p in cur:
                cur = cur[p]
            else:
                ok = False
                break
        if ok:
            return cur
    return None


def _parse_arg(tok: str, ctx: dict, scopes: list):
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1]
    if _INT_RE.match(tok):
        return int(tok)
    return _lookup(tok, ctx, scopes)


def render_template(template: str, context: dict) -> str:
    """Subset renderer: {{var.path}}, {{this}}, {{@index}},
    {{helper arg1 "arg2"}}, {{#each list}}…{{/each}}, {{#if x}}…
    {{else}}…{{/if}}, {{#unless x}}…{{/unless}}."""

    def render_block(text: str, scopes: list) -> str:
        out: list[str] = []
        i = 0
        while i < len(text):
            m = _TAG_RE.search(text, i)
            if not m:
                out.append(text[i:])
                break
            out.append(text[i : m.start()])
            tag = m.group(1).strip()
            if tag.startswith("#"):
                kind, _, expr = tag[1:].partition(" ")
                close = "{{/" + kind + "}}"
                depth = 1
                j = m.end()
                body_start = j
                while depth:
                    nxt = _TAG_RE.search(text, j)
                    if not nxt:
                        raise TemplateError(f"unclosed block {{{{#{kind}}}}}")
                    t2 = nxt.group(1).strip()
                    if t2.startswith("#" + kind):
                        depth += 1
                    elif t2 == "/" + kind:
                        depth -= 1
                        if depth == 0:
                            body = text[body_start : nxt.start()]
                            i = nxt.end()
                            break
                    j = nxt.end()
                # optional {{else}} split at depth 0
                else_body = ""
                depth2 = 0
                for em in _TAG_RE.finditer(body):
                    t3 = em.group(1).strip()
                    if t3.startswith("#"):
                        depth2 += 1
                    elif t3.startswith("/"):
                        depth2 -= 1
                    elif t3 == "else" and depth2 == 0:
                        else_body = body[em.end() :]
                        body = body[: em.start()]
                        break
                val = _parse_arg(expr.strip(), context, scopes)
                if kind == "each":
                    if isinstance(val, list) and val:
                        for idx, item in enumerate(val):
                            if isinstance(item, dict):
                                scope = dict(item)
                                scope["@index"] = idx
                            else:
                                scope = {"this": item, "@index": idx}
                            out.append(render_block(body, scopes + [scope]))
                    else:
                        out.append(render_block(else_body, scopes))
                elif kind == "if":
                    out.append(render_block(body if val else else_body, scopes))
                elif kind == "unless":
                    out.append(render_block(else_body if val else body, scopes))
                else:
                    raise TemplateError(f"unknown block helper {kind}")
                continue
            if tag == "else" or tag.startswith("/"):
                i = m.end()
                continue
            # inline tag: helper call or variable
            toks = re.findall(r'"[^"]*"|\S+', tag)
            if toks and toks[0] in HELPERS:
                args = [_parse_arg(t, context, scopes) for t in toks[1:]]
                out.append(HELPERS[toks[0]](args))
            else:
                val = _lookup(tag, context, scopes)
                out.append("" if val is None else _to_str(val))
            i = m.end()
        return "".join(out)

    return render_block(template, [])


def _to_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


# ---------------------------------------------------------------------------
# field scanning (ref:src/templates/llm_population.rs:129-188)
# ---------------------------------------------------------------------------

_FIELD_RE = re.compile(r"\[FIELD: ([^\]]+)\]")
_DROPDOWN_RE = re.compile(r"\[DROPDOWN: ([^\]]+)\]")
_DATE_RE = re.compile(r"\[DATE FIELD\]")
_CHECKLIST_RE = re.compile(r"\[CHECKLIST: ([^\]]+)\]")
_TEXTAREA_RE = re.compile(r"\[TEXT AREA: ([^\]]+)\]")


def extract_template_fields(template: str) -> list[TemplateField]:
    fields: list[TemplateField] = []
    for m in _FIELD_RE.finditer(template):
        fields.append(TemplateField(m.group(1), "text", f"Text field: {m.group(1)}", True))
    for m in _DROPDOWN_RE.finditer(template):
        fields.append(
            TemplateField(f"Dropdown: {m.group(1)}", "dropdown", f"Select from: {m.group(1)}", True)
        )
    for _ in _DATE_RE.finditer(template):
        fields.append(TemplateField("Date", "date", "Date field", False))
    for m in _CHECKLIST_RE.finditer(template):
        fields.append(
            TemplateField(f"Checklist: {m.group(1)}", "checklist", f"Multiple selection: {m.group(1)}", False)
        )
    for m in _TEXTAREA_RE.finditer(template):
        fields.append(TemplateField(m.group(1), "textarea", f"Long text: {m.group(1)}", False))
    return fields


# ---------------------------------------------------------------------------
# manager: data queries → context → render (→ optional LLM step)
# ---------------------------------------------------------------------------

@dataclass
class GeneratedDocument:
    template_id: str
    generated_content: str
    word_count: int
    queries_executed: list[str]
    data_context: dict


class TemplateManager:
    """ref:src/templates/mod.rs:100-354 re-expressed over the Spark
    query layer.  `llm_client` (optional) only powers enhance/populate."""

    def __init__(self, graph: DataFrame, llm_client=None):
        self.graph = graph
        self.llm_client = llm_client
        self.templates: dict[str, Template] = {}

    def load(self, path: str | Path) -> Template:
        t = load_template(path)
        self.templates[t.id] = t
        return t

    def load_dir(self, path: str | Path) -> None:
        self.templates.update(load_templates_from_dir(path))

    def run_data_queries(
        self, template: Template, overrides: dict[str, str] | None = None
    ) -> tuple[dict, list[str]]:
        # ref:src/templates/mod.rs:170-194
        from rdf_knowledge_extractor_spark.query.sparql import execute_sparql

        data_context: dict = {}
        executed: list[str] = []
        for q in template.data_queries:
            sparql = (overrides or {}).get(q.id, q.sparql_query)
            try:
                df = execute_sparql(self.graph, sparql)
                data_context[q.id] = process_query_results(df)
                executed.append(q.id)
            except Exception as e:
                if q.required:
                    raise TemplateError(f"Required query '{q.id}' failed: {e}") from e
                data_context[q.id] = None
        return data_context, executed

    def generate_document(
        self,
        template_id: str,
        context: dict | None = None,
        overrides: dict[str, str] | None = None,
    ) -> GeneratedDocument:
        template = self.templates.get(template_id)
        if template is None:
            raise TemplateError(f"Template not found: {template_id}")
        data_context, executed = self.run_data_queries(template, overrides)
        if context:
            data_context.update(context)
        content = render_template(template.template_content, data_context)
        pp = template.post_processing or {}
        if pp.get("enhance_with_llm") and self.llm_client is not None:
            content = self._enhance_with_llm(content, template, pp)
        return GeneratedDocument(
            template_id=template.id,
            generated_content=content,
            word_count=len(content.split()),  # ref:mod.rs:226 split_whitespace
            queries_executed=executed,
            data_context=data_context,
        )

    def _enhance_with_llm(self, content: str, template: Template, pp: dict) -> str:
        # ref:src/templates/mod.rs:273-304
        prompt = (
            f"Please enhance and improve the following {template.template_type} "
            f"content:\n\n{content}"
        )
        if pp.get("style_guide"):
            prompt += f"\n\nStyle Guide: {pp['style_guide']}"
        if pp.get("word_limit"):
            prompt += f"\n\nWord limit: {pp['word_limit']} words"
        if template.llm_instructions:
            prompt += f"\n\nAdditional instructions: {template.llm_instructions}"
        prompt += "\n\nProvide the enhanced content as your response."
        system = (
            "You are a skilled editor and writer. Your task is to enhance and "
            "improve the provided content while maintaining its core information "
            "and structure. Make the text more engaging, clear, and professional "
            "while preserving all important facts and data."
        )
        return self.llm_client.generate_structured_batch([prompt], system)[0]

    # -- LLM population path (ref:src/templates/mod.rs:315-354,
    #    llm_population.rs:37-126) --
    def build_population_prompt(
        self,
        template_text: str,
        query_results: dict[str, list[dict]],
        instructions: str | None = None,
    ) -> str:
        parts = ["## Template to Populate\n\n", template_text, "\n\n"]
        parts.append("## Extracted Data from Knowledge Graph\n\n")
        for query_id in query_results:  # insertion order (we sort at call site if needed)
            parts.append(f"### Query: {query_id}\n")
            rows = query_results[query_id]
            if not rows:
                parts.append("No results found.\n\n")
            else:
                for idx, row in enumerate(rows):
                    parts.append(f"Result {idx + 1}:\n")
                    for key, value in row.items():
                        parts.append(f"  - {key}: {_to_str(value) if value is not None else ''}\n")
                parts.append("\n")
        if instructions:
            parts.append("## Additional Instructions\n\n")
            parts.append(instructions)
            parts.append("\n\n")
        parts.append("## Task\n\n")
        parts.append(
            "Populate the template above with the actual data from the knowledge graph. "
            "Replace all placeholder fields with real values from the extracted data. "
            "Make the report professional and actionable.\n"
        )
        return "".join(parts)

    def generate_with_llm_population(self, template_id: str, template_text: str) -> str:
        template = self.templates.get(template_id)
        if template is None:
            raise TemplateError(f"Template not found: {template_id}")
        data_context, _ = self.run_data_queries(template)
        prompt = self.build_population_prompt(
            template_text, {k: v or [] for k, v in data_context.items()},
            template.llm_instructions,
        )
        if self.llm_client is None:
            raise TemplateError("LLM population requires an llm_client")
        return self.llm_client.generate_structured_batch([prompt], None)[0]
