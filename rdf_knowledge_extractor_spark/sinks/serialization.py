"""RDF serializers.

Two families, mirroring the reference's (inconsistent) duplicates:

- *serializer* variants (ref:src/utils/serialization.rs:14-175): used
  by `-o/--format`; strict `http://`/`https://` URI test for objects,
  `"` escaped as `\\"`.
- *store* variants (ref:src/knowledge_graph/mod.rs:255-331): used by
  `kg export`; loose `starts_with("http")` URI test, NO escaping.

Each format has a **distributed** form (pure Catalyst column
expressions producing one line/JSON-object per row or per subject —
whole-stage codegen, writable with `df.write.text` at any scale) and a
**driver-side** `serialize_*` string assembler for byte-compat tests
and small exports (collects ordered by `(doc_seq, triple_seq)` — the
reference's Vec insertion order).

JSON-LD notes (ref:src/utils/serialization.rs:50-90): triples group by
subject; per predicate the LAST value wins (`subject_entry.insert`
overwrites); serde_json::Map is a BTreeMap ⇒ keys serialize sorted
("@id" sorts first naturally).  Subject order in the reference is
HashMap iteration (nondeterministic); we emit subjects sorted —
documented determinism deviation.
"""

from __future__ import annotations

import html as _html
import json
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"


# ---------------------------------------------------------------------------
# column-expression helpers
# ---------------------------------------------------------------------------

def _strict_uri(c: Column) -> Column:
    return c.startswith("http://") | c.startswith("https://")


def _angle(c: Column) -> Column:
    return F.concat(F.lit("<"), c, F.lit(">"))


def _quote_escaped(c: Column) -> Column:
    # `"` → `\"` (ref:src/utils/serialization.rs:101)
    return F.concat(F.lit('"'), F.regexp_replace(c, '"', '\\\\"'), F.lit('"'))


def _quote_raw(c: Column) -> Column:
    # store path quotes WITHOUT escaping (ref:src/knowledge_graph/mod.rs:259,267)
    return F.concat(F.lit('"'), c, F.lit('"'))


# ---------------------------------------------------------------------------
# N-Triples
# ---------------------------------------------------------------------------

def ntriples_line(strict: bool = True) -> Column:
    """One N-Triples line per row as a Column.

    strict=True  → serializer variant (ref:src/utils/serialization.rs:92-108)
    strict=False → store variant (ref:src/knowledge_graph/mod.rs:255-271)
    """
    s, p, o = F.col("subject"), F.col("predicate"), F.col("object")
    if strict:
        subj = _angle(s)
        obj = F.when(_strict_uri(o), _angle(o)).otherwise(_quote_escaped(o))
    else:
        subj = F.when(s.startswith("http"), _angle(s)).otherwise(_quote_raw(s))
        obj = F.when(o.startswith("http"), _angle(o)).otherwise(_quote_raw(o))
    return F.concat(subj, F.lit(" "), _angle(p), F.lit(" "), obj, F.lit(" ."))


def ntriples_lines(df: DataFrame, strict: bool = True) -> DataFrame:
    return df.select(ntriples_line(strict).alias("line"))


def _ordered_collect(df: DataFrame) -> list:
    order = [c for c in ("doc_seq", "triple_seq") if c in df.columns]
    if order:
        df = df.orderBy(*order)
    return df.collect()


def serialize_ntriples(df: DataFrame, strict: bool = True) -> str:
    cols = ["subject", "predicate", "object"] + [
        c for c in ("doc_seq", "triple_seq") if c in df.columns
    ]
    lines = _ordered_collect(df.select(*cols, ntriples_line(strict).alias("line")))
    return "".join(r["line"] + "\n" for r in lines)


# ---------------------------------------------------------------------------
# Turtle
# ---------------------------------------------------------------------------

def _turtle_term_serializer(c: Column, namespace: str, prefix: str) -> Column:
    # ref:src/utils/serialization.rs:161-167 — prefix-compress iff the term
    # starts with the namespace, else ALWAYS <…> (even non-URIs; faithful)
    return F.when(
        c.startswith(namespace),
        F.concat(F.lit(prefix + ":"), F.substring(c, len(namespace) + 1, 2**24)),
    ).otherwise(_angle(c))


def _turtle_term_store(c: Column, namespace: str, prefix: str) -> Column:
    # ref:src/knowledge_graph/mod.rs:315-331 — http → prefixed/<…>, else "…"
    return F.when(
        c.startswith("http"),
        F.when(
            c.startswith(namespace),
            F.concat(F.lit(prefix + ":"), F.substring(c, len(namespace) + 1, 2**24)),
        ).otherwise(_angle(c)),
    ).otherwise(_quote_raw(c))


def turtle_line(namespace: str, prefix: str, store: bool = False) -> Column:
    s, p, o = F.col("subject"), F.col("predicate"), F.col("object")
    if store:
        subj = _turtle_term_store(s, namespace, prefix)
        pred = _turtle_term_store(p, namespace, prefix)
        obj = _turtle_term_store(o, namespace, prefix)
    else:
        subj = _turtle_term_serializer(s, namespace, prefix)
        pred = _turtle_term_serializer(p, namespace, prefix)
        obj = F.when(_strict_uri(o), _angle(o)).otherwise(_quote_escaped(o))
    return F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, F.lit(" ."))


def turtle_header(namespace: str, prefix: str, store: bool = False) -> str:
    if store:
        # ref:src/knowledge_graph/mod.rs:283-285 (rdf, rdfs, then user)
        return (
            f"@prefix rdf: <{RDF_NS}> .\n"
            f"@prefix rdfs: <{RDFS_NS}> .\n"
            f"@prefix {prefix}: <{namespace}> .\n\n"
        )
    # ref:src/utils/serialization.rs:33-36 (user, rdf, rdfs)
    return (
        f"@prefix {prefix}: <{namespace}> .\n"
        f"@prefix rdf: <{RDF_NS}> .\n"
        f"@prefix rdfs: <{RDFS_NS}> .\n\n"
    )


def serialize_turtle(df: DataFrame, namespace: str, prefix: str, store: bool = False) -> str:
    rows = _ordered_collect(
        df.select(
            *[c for c in df.columns],
            turtle_line(namespace, prefix, store).alias("line"),
        )
    )
    return turtle_header(namespace, prefix, store) + "".join(r["line"] + "\n" for r in rows)


# ---------------------------------------------------------------------------
# JSON-LD
# ---------------------------------------------------------------------------

def _jsonld_subject_obj(rows: list, namespace: str, prefix: str) -> dict:
    """Fold one subject's triples (ordered) → JSON-LD node object."""
    node: dict = {"@id": rows[0]["subject"]}
    for r in rows:
        pred = r["predicate"]
        key = (
            f"{prefix}:{pred[len(namespace):]}" if pred.startswith(namespace) else pred
        )
        o = r["object"]
        node[key] = (
            {"@id": o} if o.startswith("http://") or o.startswith("https://") else o
        )  # last value wins, like subject_entry.insert (ref:serialization.rs:76)
    return {k: node[k] for k in sorted(node)}  # serde BTreeMap key order


def serialize_jsonld(df: DataFrame, namespace: str, prefix: str) -> str:
    rows = _ordered_collect(df)
    by_subject: dict[str, list] = {}
    for r in rows:
        by_subject.setdefault(r["subject"], []).append(r)
    graph = [
        _jsonld_subject_obj(by_subject[s], namespace, prefix)
        for s in sorted(by_subject)  # deterministic subject order (deviation)
    ]
    doc = {"@context": {prefix: namespace}, "@graph": graph}
    return json.dumps(doc, indent=2, ensure_ascii=False)


def jsonld_node_lines(df: DataFrame, namespace: str, prefix: str) -> DataFrame:
    """Distributed JSON-LD: one JSON node object per subject per line
    (JSON-lines flavor for scale; the tiny @context is a sidecar).
    Pure Catalyst — one shuffle on subject, whole-stage codegen
    expressions, no Python."""
    pred_key = F.when(
        F.col("predicate").startswith(namespace),
        F.concat(
            F.lit(prefix + ":"),
            F.substring(F.col("predicate"), len(namespace) + 1, 2**24),
        ),
    ).otherwise(F.col("predicate"))

    # JSON-escape via to_json(array(x)) → ["…"]; strip the brackets
    def jstr(c: Column) -> Column:
        j = F.to_json(F.array(c))
        return F.substring(j, 2, F.length(j) - F.lit(2))

    value = F.when(
        _strict_uri(F.col("object")),
        F.concat(F.lit('{"@id":'), jstr(F.col("object")), F.lit("}")),
    ).otherwise(jstr(F.col("object")))

    order = [F.col(c) for c in ("doc_seq", "triple_seq") if c in df.columns]
    if not order:
        order = [F.lit(1)]
    from pyspark.sql import Window

    # last value wins per (subject, predicate) — ref:serialization.rs:76
    w = Window.partitionBy("subject", "_k").orderBy(*[o.desc() for o in order])
    nodes = (
        df.withColumn("_k", pred_key)
        .withColumn("_v", value)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("subject")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_k"), F.col("_v")))
                    ),
                    lambda e: F.concat(
                        F.to_json(F.array(e["_k"])).substr(
                            F.lit(2),
                            F.length(F.to_json(F.array(e["_k"]))) - F.lit(2),
                        ),
                        F.lit(":"),
                        e["_v"],
                    ),
                ),
                ",",
            ).alias("_props")
        )
    )
    subj_json = F.to_json(F.array(F.col("subject")))
    return nodes.select(
        F.concat(
            F.lit('{"@id":'),
            F.substring(subj_json, 2, F.length(subj_json) - F.lit(2)),
            F.when(F.length("_props") > 0, F.concat(F.lit(","), F.col("_props"))).otherwise(F.lit("")),
            F.lit("}"),
        ).alias("line")
    )


# ---------------------------------------------------------------------------
# RDF/XML
# ---------------------------------------------------------------------------

def serialize_rdf_xml(df: DataFrame, namespace: str, prefix: str) -> str:
    # ref:src/utils/serialization.rs:110-154
    rows = _ordered_collect(df)
    by_subject: dict[str, list] = {}
    for r in rows:
        by_subject.setdefault(r["subject"], []).append(r)
    out = ['<?xml version="1.0" encoding="UTF-8"?>\n']
    out.append(
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:{prefix}="{namespace}">\n'
    )
    for subject in sorted(by_subject):  # deterministic (ref: HashMap order)
        out.append(f'  <rdf:Description rdf:about="{subject}">\n')
        for r in by_subject[subject]:
            pred = r["predicate"]
            if pred.startswith(namespace):
                pname = f"{prefix}:{pred[len(namespace):]}"
            else:
                pname = pred.split("#")[-1]
            o = r["object"]
            if o.startswith("http://") or o.startswith("https://"):
                out.append(f'    <{pname} rdf:resource="{o}"/>\n')
            else:
                out.append(f"    <{pname}>{_html.escape(o, quote=False)}</{pname}>\n")
        out.append("  </rdf:Description>\n")
    out.append("</rdf:RDF>\n")
    return "".join(out)


# ---------------------------------------------------------------------------
# raw JSON (triple structs)
# ---------------------------------------------------------------------------

def _f32_repr(v: float) -> str:
    """Shortest round-trip float32 representation.

    The reference's confidence is an f32 serialized by serde_json/ryu,
    which writes the shortest f32 form ('0.95'); a Python float widened
    from float32 would print 0.949999988079071."""
    import numpy as np

    return np.format_float_positional(np.float32(v), unique=True, trim="0")


def serialize_json(df: DataFrame) -> str:
    """Pretty JSON array of triple structs, field order/shape matching
    serde (ref:src/utils/serialization.rs:156-159; struct
    ref:src/core/extractor.rs:13-26 — `source` skipped when null).
    Confidence is emitted in shortest-f32 form via token substitution
    (json.dumps hardwires float.__repr__, which is f64)."""
    import secrets

    rows = [r.asDict() for r in _ordered_collect(df)]
    # Sentinel carries a per-call random nonce so document-derived data
    # can never collide with it (a literal '"@F32@…@"' in a subject/
    # object string must NOT have its quotes stripped — ADVICE r2).
    data_strings = "\x00".join(
        str(v)
        for r in rows
        for v in (
            r.get("subject"), r.get("predicate"), r.get("object"),
            r.get("source"), *(r.get("metadata") or {}).items(),
        )
    )
    while True:
        nonce = secrets.token_hex(16)
        if nonce not in data_strings:
            break
    items = []
    for r in rows:
        d = {
            "subject": r["subject"],
            "predicate": r["predicate"],
            "object": r["object"],
            "confidence": f"@F32:{nonce}@" + _f32_repr(r.get("confidence", 1.0)) + "@",
        }
        if r.get("source") is not None:
            d["source"] = r["source"]
        d["metadata"] = dict(r["metadata"]) if r.get("metadata") else {}
        items.append(d)
    blob = json.dumps(items, indent=2, ensure_ascii=False)
    return re.sub(r'"@F32:' + nonce + r'@([^"@]+)@"', r"\1", blob)


SERIALIZERS = {
    "n-triples": lambda df, ns, px: serialize_ntriples(df, strict=True),
    "turtle": serialize_turtle,
    "json-ld": serialize_jsonld,
    "rdf-xml": serialize_rdf_xml,
    "json": lambda df, ns, px: serialize_json(df),
}


def serialize(df: DataFrame, fmt: str, namespace: str, prefix: str) -> str:
    # ref:src/utils/serialization.rs:14-28
    try:
        fn = SERIALIZERS[fmt]
    except KeyError:
        raise ValueError(f"Unsupported format: {fmt}") from None
    return fn(df, namespace, prefix)
