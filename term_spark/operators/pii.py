"""PII detection and redaction over text columns.

Training-data pipelines scrub personally identifiable information
before a corpus ships; these operators count and mask the standard
structured-PII families (emails, phone numbers, IPv4 addresses, SSNs,
card numbers) with JVM-side regex only — ``regexp_count`` /
``regexp_replace`` stay inside whole-stage codegen, so the scan is
map-only and embarrassingly parallel at any scale (no UDF, no shuffle).

The patterns are intentionally high-precision/recall-bounded (the
usual production trade-off: a regex pass catches structured PII;
free-text names/addresses need an NER model, which is out of scope
for a regex engine and stubbed per the build brief's multimodal rule).

Reference relationship: the reference has no PII operators — this is
the build-brief training-pipeline extension; the format-family regex
plumbing mirrors operators/format.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Java-regex patterns per PII kind. Order matters for redaction:
#: longer/more-specific families first so e.g. an IPv4 inside a URL is
#: masked before the phone pattern can claim a 3-3-4 digit substring.
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{15,16}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # the paren alternative matters for redaction: \b cannot sit before
    # '(', so a single \b(?:...)\(? pattern never consumes the opening
    # paren and redaction would leave a dangling '(' artifact
    "phone": r"(?:\+?1[-. ])?(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b",
}


def _kinds(kinds: Optional[Sequence[str]]) -> Sequence[str]:
    if kinds is None:
        return tuple(PII_PATTERNS)
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)} "
                         f"(have: {sorted(PII_PATTERNS)})")
    return tuple(kinds)


def pii_counts(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               kinds: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-document PII match counts: one ``n_<kind>`` column per kind,
    plus ``n_pii`` (total) and ``has_pii``. Map-only (codegen regex)."""
    ks = _kinds(kinds)
    # NULL text counts as zero matches (a NULL has_pii would silently
    # drop NULL-text docs from ~has_pii filters — three-valued logic)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.regexp_count(txt, F.lit(PII_PATTERNS[k]))
             .cast("bigint").alias(f"n_{k}") for k in ks]
    out = df.select(F.col(id_col), *cols)
    total = sum((F.col(f"n_{k}") for k in ks), F.lit(0).cast("bigint"))
    return (out.withColumn("n_pii", total)
               .withColumn("has_pii", F.col("n_pii") > 0))


def redact_pii(df: DataFrame, text_col: str = "text",
               kinds: Optional[Sequence[str]] = None,
               output_col: Optional[str] = None,
               placeholder: str = "[{kind}]") -> DataFrame:
    """Mask PII in place (or into ``output_col``): each kind's matches
    become ``placeholder`` (``{kind}`` expands to the upper-cased kind,
    e.g. ``[EMAIL]``). Patterns apply in PII_PATTERNS order — chained
    ``regexp_replace``, one codegen stage, no UDF."""
    ks = _kinds(kinds)
    col = F.col(text_col)
    for k in ks:
        col = F.regexp_replace(col, PII_PATTERNS[k],
                               placeholder.format(kind=k.upper()))
    return df.withColumn(output_col or text_col, col)


def corpus_pii_summary(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       kinds: Optional[Sequence[str]] = None) -> DataFrame:
    """One-row corpus rollup: total matches and affected-doc counts per
    kind — the go/no-go gate before a corpus release. Single fused
    aggregation over the map-only per-doc counts (one job, no joins)."""
    ks = _kinds(kinds)
    per = pii_counts(df, text_col, id_col, ks)
    aggs = []
    for k in ks:
        aggs.append(F.sum(f"n_{k}").cast("bigint").alias(f"total_{k}"))
        aggs.append(F.count(F.when(F.col(f"n_{k}") > 0, 1))
                     .alias(f"docs_with_{k}"))
    aggs.append(F.count(F.lit(1)).alias("n_docs"))
    aggs.append(F.count(F.when(F.col("has_pii"), 1)).alias("docs_with_pii"))
    return per.agg(*aggs)


# ---------------------------------------------------------------------------
# URLs / domains (web-corpus curation: domain stats + blocklists)
# ---------------------------------------------------------------------------

URL_PATTERN = r"https?://[^\s<>\"')\]]+"
#: capture group 1 = registrable host (strips scheme, creds, port, path)
DOMAIN_PATTERN = r"https?://(?:[^/@\s]+@)?([A-Za-z0-9.-]+)"


def url_counts(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document URL count + distinct lowercased domains (array).
    Codegen regex only — map-only scan, no UDF, no shuffle."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    domains = F.array_distinct(F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, DOMAIN_PATTERN, 1))))
    return df.select(F.col(id_col),
                     F.size(urls).cast("bigint").alias("n_urls"),
                     F.filter(domains, lambda d: d != "").alias("domains"))


def domain_counts(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Corpus-level domain frequency: (domain, n_docs, n_urls) —
    the input to manual blocklist review. One explode + one groupBy
    on the domain key."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    ex = df.select(
        F.col(id_col),
        F.explode(F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, DOMAIN_PATTERN, 1))))
         .alias("domain")).filter(F.col("domain") != "")
    return (ex.groupBy("domain")
            .agg(F.count_distinct(F.col(id_col)).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_urls"))
            .orderBy(F.desc("n_urls"), "domain"))


def blocklist_filter(df: DataFrame, blocked_domains, text_col: str = "text",
                     id_col: str = "doc_id",
                     match_subdomains: bool = True) -> DataFrame:
    """Drop documents containing a URL on a blocked domain (or any of
    its subdomains when ``match_subdomains``). The blocklist broadcasts
    (it is human-curated, bounded); the corpus pass stays map-side plus
    one anti-join on the offender ids."""
    spark = df.sparkSession
    bl = F.broadcast(spark.createDataFrame(
        [(d.lower(),) for d in blocked_domains], "blocked string"))
    docs = (url_counts(df, text_col, id_col)
            .select(F.col(id_col), F.explode("domains").alias("domain")))
    if match_subdomains:
        cond = (F.col("domain") == F.col("blocked")) | \
               F.col("domain").endswith(F.concat(F.lit("."), F.col("blocked")))
    else:
        cond = F.col("domain") == F.col("blocked")
    offenders = docs.join(bl, cond).select(F.col(id_col)).distinct()
    return df.join(offenders, id_col, "left_anti")
