"""Hyperlink extraction from HTML via the WHATWG tree builder.

The web-pipeline bridge between the HTML layer and the graph layer:
anchors become edges (src page → href), which feed pagerank /
triangles / k-core / domain analytics.  Uses the SAME spec-faithful
parser as text extraction (functions/html5_tree.py), so malformed
real-web markup — unclosed tags, nested inline elements, attribute
soup — yields the links a browser would see, not what a regex hopes
for.  (Reference: the engine only fetches pages —
/root/reference/src/handlers/mod.rs — link structure is untouched.)

Spark surface: Arrow-batched pandas UDF returning
array<struct<href,anchor>> — one parse per page shared with nothing
crossing back but the link structs; explode JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from rdf_knowledge_extractor_spark.functions.html5_tree import parse_document

LINK_TYPE = ArrayType(
    StructType(
        [
            StructField("href", StringType()),
            StructField("anchor", StringType()),
        ]
    )
)


def extract_links(html: str) -> list[tuple[str, str]]:
    """[(href, anchor_text)] for every <a> carrying an href, in
    document order; anchor text is the space-joined descendant text,
    stripped (nested markup inside the anchor contributes its
    text)."""
    root = parse_document(html)
    out: list[tuple[str, str]] = []
    for el in root.iter_elements():
        if el.name == "a":
            href = el.attrs.get("href")
            if href is not None:
                out.append((href, " ".join(el.descendant_texts()).strip()))
    return out


@F.pandas_udf(LINK_TYPE)
def html_links(html: pd.Series) -> pd.Series:
    return html.map(lambda h: extract_links(h or ""))


def with_extracted_links(
    pages: DataFrame, html_col: str = "html", id_col: str = "url"
) -> DataFrame:
    """(id, href, anchor) — one row per link; pages with no links
    vanish (explode, not explode_outer: link-graph edges)."""
    return pages.select(
        F.col(id_col),
        F.explode(html_links(F.col(html_col))).alias("_l"),
    ).select(id_col, F.col("_l.href").alias("href"), F.col("_l.anchor").alias("anchor"))
