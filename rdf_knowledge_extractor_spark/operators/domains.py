"""Domain-level web-corpus analytics: registrable-domain extraction,
per-domain rollups, and list-based admission filtering.

At 100 TB of web text the natural curation unit above the document is
the DOMAIN: quota capping, blocklists, and quality triage all key on
the registrable domain (example.co.uk, not deep.sub.example.co.uk).
Beyond-reference family (the reference engine has no URL handling
beyond fetching a page — /root/reference/src/handlers/mod.rs).

Scale shape: extraction is pure Catalyst string work evaluated at
scan speed (no UDF, no shuffle); the per-domain report is ONE
map-side-combined hash aggregate; list filters broadcast the list
side (block/allow lists are small by construction).

The suffix handling is a deliberately small embedded subset of the
public-suffix list — the common two-label country suffixes — kept
tiny so the DuckDB oracle can mirror the exact same decision table;
swapping in the full PSL is a data change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# two-label public suffixes under which the registrable domain is the
# LAST THREE labels (subset of the public-suffix list; extend as data)
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "co.in", "co.nz", "co.za", "co.kr",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def url_host(url_col) -> F.Column:
    """Lowercased host of a URL (scheme required; userinfo, port,
    path, query, fragment stripped; trailing dot removed).  Returns
    '' for unparseable input — regexp_extract's no-match value —
    which downstream treats as an unknown domain."""
    host = F.lower(F.regexp_extract(url_col, _HOST_RE, 1))
    return F.regexp_replace(host, r"\.$", "")


def registrable_domain(url_col) -> F.Column:
    """eTLD+1 of the URL's host: the last two labels, or the last
    THREE when the last two are a known multi-label public suffix
    (co.uk and friends).  IP-literal hosts pass through whole."""
    host = url_host(url_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    is_ip = host.rlike(r"^[0-9.]+$")
    return (
        F.when(host == "", F.lit(""))
        .when(is_ip | (n <= 2), host)
        .when(last2.isin(*MULTI_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def domain_report(
    docs: DataFrame, url_col: str = "url", chars_col: str = "n_chars"
) -> DataFrame:
    """(domain, n_docs, total_chars, avg_chars, share) — one
    map-side-combined hash aggregate keyed on the registrable domain;
    `share` is each domain's fraction of all docs (4 dp), computed
    from a 1-row broadcast total so the corpus is aggregated once."""
    per = (
        docs.select(
            registrable_domain(F.col(url_col)).alias("domain"),
            F.col(chars_col).alias("_c"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_c").cast("long").alias("total_chars"),
            F.round(F.avg("_c"), 4).alias("avg_chars"),
        )
    )
    total = per.agg(F.sum("n_docs").cast("double").alias("_t"))
    return per.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        "total_chars",
        "avg_chars",
        F.round(F.col("n_docs") / F.col("_t"), 4).alias("share"),
    )


def filter_domains(
    docs: DataFrame,
    blocklist: list[str] | None = None,
    allowlist: list[str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Admission filter on the registrable domain.  With an allowlist
    only listed domains survive; a blocklist removes listed domains;
    both may be given (allow first, then block).  The lists ride as
    broadcast hash joins (left_semi / left_anti) so the corpus is
    never re-shuffled."""
    if blocklist is None and allowlist is None:
        raise ValueError("need a blocklist and/or an allowlist")
    spark = docs.sparkSession
    out = docs.withColumn("_dom", registrable_domain(F.col(url_col)))
    if allowlist is not None:
        allow = spark.createDataFrame(
            [(d.lower(),) for d in allowlist], ["_dom"]
        )
        out = out.join(F.broadcast(allow), on="_dom", how="left_semi")
    if blocklist is not None:
        block = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], ["_dom"]
        )
        out = out.join(F.broadcast(block), on="_dom", how="left_anti")
    return out.drop("_dom")


def registrable_domain_sql(url_expr: str) -> str:
    """DuckDB twin of `registrable_domain` over a URL expression —
    the exact same host regex, suffix table, and IP passthrough, so
    oracle comparisons test semantics, not implementations."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    host = (
        f"regexp_replace(lower(coalesce(regexp_extract({url_expr}, "
        f"'{_HOST_RE}', 1), '')), '\\.$', '')"
    )
    ls = f"string_split({host}, '.')"
    n = f"len({ls})"
    last2 = f"array_to_string(({ls})[greatest({n}-1,1):{n}], '.')"
    last3 = f"array_to_string(({ls})[greatest({n}-2,1):{n}], '.')"
    return f"""CASE
      WHEN {host} = '' THEN ''
      WHEN regexp_matches({host}, '^[0-9.]+$') OR {n} <= 2 THEN {host}
      WHEN {last2} IN ({suffixes}) THEN {last3}
      ELSE {last2}
    END"""
