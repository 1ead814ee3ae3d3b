"""Deterministic triples derived from the driver's `documents` table.

The driver's correctness gate (DuckDB oracle) needs the KG operator
suite exercised over tables it can also compute in ANSI SQL.  This
module derives a triple table from `documents` with the exact SQL
mirror used by `__spark_entry__.py`'s `oracle_sql()` — every statement
below has a corresponding UNION ALL branch there.

Statements per document (triple_seq):
  0  (doc,  hasLang,   lang)           literal
  1  (doc,  hasSource, source)         literal
  2  (doc,  belongsTo, src_uri)        URI object → traversal/JSON-LD @id
  3  (doc,  rdf:type,  Document)       predicate contains "type"
  4  (src,  hasName,   source)         repeated across docs → dedup food
  5  (lang, hasRole,   lang)           NON-URI subject → validation food

`doc_seq = doc_id` materializes insertion order for first-occurrence
semantics (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = "http://kg.example.org/resource/"
NS = "http://kg.example.org/ontology#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

KNOWN_PREDICATES = {"hasLang": "", "hasSource": "", "belongsTo": "", "hasName": ""}


def derive_triples(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → triples.

    Single scan: the six statements per document are emitted through
    ONE `inline(array(struct…))` Generate instead of a six-branch
    union.  The union form scanned `documents` six times and carried a
    six-subtree plan into every downstream query (the optimizer also
    pushed joins/filters through the union, sextupling join nodes in
    e.g. insert-if-absent); the inline form reads the parquet once and
    keeps the plan a single chain.  Row multiset (and therefore every
    oracle hash) is unchanged — only the physical shape differs.
    """
    doc_uri = F.concat(F.lit(BASE + "doc"), F.col("doc_id").cast("string"))
    src_uri = F.concat(F.lit(BASE + "src_"), F.col("source"))

    def stmt(seq: int, s, p, o):
        return F.struct(
            s.alias("subject"),
            (F.lit(p) if isinstance(p, str) else p).alias("predicate"),
            o.alias("object"),
            F.lit(seq).cast("int").alias("triple_seq"),
        )

    stmts = F.array(
        stmt(0, doc_uri, NS + "hasLang", F.col("lang")),
        stmt(1, doc_uri, NS + "hasSource", F.col("source")),
        stmt(2, doc_uri, NS + "belongsTo", src_uri),
        stmt(3, doc_uri, RDF_TYPE, F.lit(NS + "Document")),
        stmt(4, src_uri, NS + "hasName", F.col("source")),
        stmt(5, F.col("lang"), NS + "hasRole", F.col("lang")),
    )
    return docs.select(
        F.col("doc_id"), F.inline(stmts)
    ).select(
        "subject",
        "predicate",
        "object",
        F.lit(1.0).cast("float").alias("confidence"),
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("source"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.col("doc_id").cast("long").alias("doc_seq"),
        F.col("triple_seq"),
    )


def derive_triples_dedup(docs: DataFrame) -> DataFrame:
    """First-occurrence dedup of `derive_triples(docs)`, computed on
    the narrow PRE-IMAGE instead of the (s,p,o) URI strings, projected
    to (subject, predicate, object, doc_seq, triple_seq).

    Row-for-row equal to
    `first_occurrence_dedup(derive_triples(docs))` (guide §2.3 /
    §8: make the dedup shuffle carry a lightweight proxy, rebuild the
    heavy strings after the aggregate).  Proof of equivalence:

    - The six statement families carry six DISTINCT constant
      predicates (hasLang / hasSource / belongsTo / rdf:type /
      hasName / hasRole), so a cross-family (s,p,o) collision is
      impossible for ANY data values.
    - Families 0-3: subject = BASE+'doc'+doc_id is injective in
      doc_id, and the object is determined by (triple_seq, attr)
      where attr is lang (0), source (1, 2) or '' (3) — so the
      string key is a bijection of the narrow tuple
      (doc_id, triple_seq, attr).  Every member of a duplicate group
      shares doc_seq = doc_id and triple_seq, so first-occurrence =
      DISTINCT on the narrow tuple.  NULL attrs/doc_ids group in the
      distinct exactly as the NULL string keys they map to.
    - Family 4: key is determined by `source` alone; the surviving
      doc_seq is min(doc_id) (min ignores NULLs = the ordinal's
      nulls-last rule; all-NULL groups yield NULL, as the original).
      Family 5: likewise by `lang`.

    The dedup therefore shuffles ~20-byte tuples (long, int, short
    attr) instead of three ~40-byte URI strings per row, and the two
    repeated-key families collapse to tiny value-cardinality
    aggregates — the URI concat work happens once per SURVIVOR.
    """
    doc_uri = F.concat(F.lit(BASE + "doc"), F.col("doc_id").cast("string"))
    src_uri_of = lambda c: F.concat(F.lit(BASE + "src_"), c)  # noqa: E731

    fam03 = (
        docs.select(
            F.col("doc_id"),
            F.inline(
                F.array(
                    F.struct(F.lit(0).alias("ts"), F.col("lang").alias("attr")),
                    F.struct(F.lit(1).alias("ts"), F.col("source").alias("attr")),
                    F.struct(F.lit(2).alias("ts"), F.col("source").alias("attr")),
                    F.struct(F.lit(3).alias("ts"), F.lit("").alias("attr")),
                )
            ),
        )
        .distinct()
        .select(
            doc_uri.alias("subject"),
            F.element_at(
                F.array(
                    F.lit(NS + "hasLang"),
                    F.lit(NS + "hasSource"),
                    F.lit(NS + "belongsTo"),
                    F.lit(RDF_TYPE),
                ),
                F.col("ts") + 1,
            ).alias("predicate"),
            F.when(F.col("ts") == 2, src_uri_of(F.col("attr")))
            .when(F.col("ts") == 3, F.lit(NS + "Document"))
            .otherwise(F.col("attr"))
            .alias("object"),
            F.col("doc_id").cast("long").alias("doc_seq"),
            F.col("ts").cast("int").alias("triple_seq"),
        )
    )
    fam4 = docs.groupBy("source").agg(F.min("doc_id").alias("_d")).select(
        src_uri_of(F.col("source")).alias("subject"),
        F.lit(NS + "hasName").alias("predicate"),
        F.col("source").alias("object"),
        F.col("_d").cast("long").alias("doc_seq"),
        F.lit(4).cast("int").alias("triple_seq"),
    )
    fam5 = docs.groupBy("lang").agg(F.min("doc_id").alias("_d")).select(
        F.col("lang").alias("subject"),
        F.lit(NS + "hasRole").alias("predicate"),
        F.col("lang").alias("object"),
        F.col("_d").cast("long").alias("doc_seq"),
        F.lit(5).cast("int").alias("triple_seq"),
    )
    return fam03.unionByName(fam4).unionByName(fam5)


# the exact ANSI-SQL mirror (DuckDB), parameterized as a CTE body
DERIVE_TRIPLES_SQL = f"""
  SELECT '{BASE}doc' || CAST(doc_id AS VARCHAR) AS subject,
         '{NS}hasLang' AS predicate, lang AS object,
         doc_id AS doc_seq, 0 AS triple_seq
  FROM documents
  UNION ALL
  SELECT '{BASE}doc' || CAST(doc_id AS VARCHAR), '{NS}hasSource', source,
         doc_id, 1 FROM documents
  UNION ALL
  SELECT '{BASE}doc' || CAST(doc_id AS VARCHAR), '{NS}belongsTo',
         '{BASE}src_' || source, doc_id, 2 FROM documents
  UNION ALL
  SELECT '{BASE}doc' || CAST(doc_id AS VARCHAR), '{RDF_TYPE}',
         '{NS}Document', doc_id, 3 FROM documents
  UNION ALL
  SELECT '{BASE}src_' || source, '{NS}hasName', source, doc_id, 4 FROM documents
  UNION ALL
  SELECT lang, '{NS}hasRole', lang, doc_id, 5 FROM documents
"""

# first-occurrence dedup of the derived set, as SQL (window mirror of
# operators/dedup.first_occurrence_dedup)
DEDUP_SQL = f"""
  SELECT subject, predicate, object, doc_seq, triple_seq FROM (
    SELECT *, row_number() OVER (
      PARTITION BY subject, predicate, object ORDER BY doc_seq, triple_seq
    ) AS rn
    FROM ({DERIVE_TRIPLES_SQL})
  ) WHERE rn = 1
"""
