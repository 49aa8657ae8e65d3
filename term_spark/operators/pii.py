"""PII detection and redaction over text columns.

Training-data pipelines scrub personally identifiable information
before a corpus ships; these operators count and mask the standard
structured-PII families (emails, NANP + E.164 phone numbers, IPv4 and
IPv6 addresses, SSNs, card numbers) with JVM-side regex only —
``regexp_count`` / ``regexp_replace`` stay inside whole-stage codegen,
so the scan is map-only and embarrassingly parallel at any scale (no
UDF, no shuffle). Kinds with a checksum (credit cards) run a two-step
match: the regex proposes candidates, a JVM column predicate (Luhn)
confirms them — still codegen, no Python.

The patterns are intentionally high-precision/recall-bounded (the
usual production trade-off: a regex pass catches structured PII;
free-text names/addresses need an NER model, which is out of scope
for a regex engine and stubbed per the build brief's multimodal rule).

Reference relationship: the reference has no PII operators — this is
the build-brief training-pipeline extension; the format-family regex
plumbing mirrors operators/format.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..core.constraint import Constraint, metric_alias
from ..session import local_df
from ..core.result import ConstraintResult
from ..functions.security import validate_identifier

#: Java-regex patterns per PII kind. Order matters for redaction:
#: longer/more-specific families first so e.g. an IPv4 inside a URL is
#: masked before the phone pattern can claim a 3-3-4 digit substring,
#: and IPv6 (colon-hex) is masked before IPv4 can claim a dotted-quad
#: tail of an IPv4-mapped address.
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # candidates only — a bare 15/16-digit run is NOT a card unless it
    # passes the Luhn checksum (PII_VALIDATORS below); without that gate
    # every order id / hash / timestamp in a corpus would be redacted
    "credit_card": r"\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{15,16}\b",
    # free-text IPv6: full form, or compressed (::) forms. Requires ≥1
    # digit inside the colon-hex run so C++ `std::vector` / pure-word hex
    # ("dead:beef") don't match — recall-bounded by design, like the rest
    # of the regex families.
    "ipv6": (
        r"(?<![0-9A-Fa-f:.])(?=[0-9A-Fa-f:]*\d)(?:"
        r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"       # full 8 groups
        r"|(?:[0-9A-Fa-f]{1,4}:){1,7}:"                    # trailing ::
        r"|(?:[0-9A-Fa-f]{1,4}:){1,6}(?::[0-9A-Fa-f]{1,4}){1,6}"  # mid ::
        r"|::(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,6})"      # leading ::
        r")(?![0-9A-Fa-f:])"
    ),
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # E.164 international form: '+' then 7-15 digits, no separators.
    # The NANP 'phone' pattern below requires separators, so the two
    # families are disjoint in what they match.
    "phone_e164": r"(?<![\d+])\+[1-9]\d{6,14}\b",
    # the paren alternative matters for redaction: \b cannot sit before
    # '(', so a single \b(?:...)\(? pattern never consumes the opening
    # paren and redaction would leave a dangling '(' artifact
    "phone": r"(?:\+?1[-. ])?(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b",
}


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum over a digit string (separators stripped) — pure
    JVM column expression (split / reverse / transform / aggregate), so
    validation stays inside whole-stage codegen like the regex scan.

    Standard algorithm: from the rightmost digit, double every second
    digit, subtract 9 when the doubled value exceeds 9, and require the
    total to be ≡ 0 (mod 10).
    """
    digits = F.filter(
        F.split(F.regexp_replace(candidate, r"[- ]", ""), ""),
        lambda ch: ch != "")
    vals = F.transform(
        F.reverse(digits),
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
             .otherwise(d.cast("int") * 2),
        ).otherwise(d.cast("int")))
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return total % 10 == 0


#: Post-regex validators: the regex finds candidates, the validator
#: (a JVM column predicate on the matched string) confirms them. Only
#: confirmed matches are counted/redacted.
PII_VALIDATORS: Dict[str, Callable[[Column], Column]] = {
    "credit_card": luhn_valid,
}


def _kinds(kinds: Optional[Sequence[str]]) -> Sequence[str]:
    if kinds is None:
        return tuple(PII_PATTERNS)
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)} "
                         f"(have: {sorted(PII_PATTERNS)})")
    return tuple(kinds)


def pii_count_expr(txt: Column, kind: str) -> Column:
    """Confirmed-match count for one PII kind over a text Column —
    regex candidates filtered through the kind's validator when it has
    one. Pure codegen expression, reusable in any select/agg."""
    if kind in PII_VALIDATORS:
        matched = F.regexp_extract_all(txt, F.lit(PII_PATTERNS[kind]), 0)
        return F.size(F.filter(matched, PII_VALIDATORS[kind]))
    return F.regexp_count(txt, F.lit(PII_PATTERNS[kind]))


def pii_counts(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               kinds: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-document PII match counts: one ``n_<kind>`` column per kind,
    plus ``n_pii`` (total) and ``has_pii``. Map-only (codegen regex)."""
    ks = _kinds(kinds)
    # NULL text counts as zero matches (a NULL has_pii would silently
    # drop NULL-text docs from ~has_pii filters — three-valued logic)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    cols = [pii_count_expr(txt, k).cast("bigint").alias(f"n_{k}")
            for k in ks]
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
        mask = placeholder.format(kind=k.upper())
        if k in PII_VALIDATORS:
            # two-step: the regex proposes candidates, the validator
            # confirms them, and only confirmed strings are replaced
            # (word-bounded, so a confirmed PAN never clips a longer
            # digit run elsewhere in the text). Candidates are digits,
            # spaces and hyphens only — safe to inline into a regex.
            confirmed = F.array_distinct(F.filter(
                F.regexp_extract_all(col, F.lit(PII_PATTERNS[k]), 0),
                PII_VALIDATORS[k]))
            col = F.aggregate(
                confirmed, col,
                lambda acc, c: F.regexp_replace(
                    acc, F.concat(F.lit(r"\b"), c, F.lit(r"\b")),
                    F.lit(mask)))
        else:
            col = F.regexp_replace(col, PII_PATTERNS[k], mask)
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


class PiiConstraint(Constraint):
    """``has_no_pii``: the affected-row ratio for the given PII kinds
    must not exceed ``max_ratio`` (default 0 — a release gate).

    Scalar protocol: two aggregate expressions (row count + count of
    rows with a confirmed match) ride the suite's shared fused
    aggregation — the corpus gate costs no extra scan when it runs
    beside other checks on the same table.
    """

    name = "no_pii"

    def __init__(self, column: str, kinds: Optional[Sequence[str]] = None,
                 max_ratio: float = 0.0):
        if not 0.0 <= max_ratio <= 1.0:
            raise ValueError(f"max_ratio must be in [0, 1], got {max_ratio}")
        self.column = validate_identifier(column)
        self.kinds = tuple(_kinds(kinds))
        self.max_ratio = float(max_ratio)
        self._rows = metric_alias("no_pii_rows", column)
        self._hits = metric_alias("no_pii_hits", column, *self.kinds)

    def scalar_metrics(self, df: DataFrame) -> Dict[str, Column]:
        txt = F.coalesce(F.col(self.column), F.lit(""))
        total = sum((pii_count_expr(txt, k) for k in self.kinds),
                    F.lit(0))
        return {self._rows: F.count(F.lit(1)),
                self._hits: F.count(F.when(total > 0, 1))}

    def result_from_metrics(self, metrics) -> ConstraintResult:
        rows = int(metrics[self._rows])
        if rows == 0:
            return self._finish(ConstraintResult.skipped(
                f"no_pii({self.column}): empty table"))
        hits = int(metrics[self._hits])
        ratio = hits / rows
        if ratio <= self.max_ratio:
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio,
            f"no_pii({self.column}): {hits} of {rows} rows "
            f"({ratio:.4%}) contain {'/'.join(self.kinds)}; allowed "
            f"ratio is {self.max_ratio}"))


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
    bl = F.broadcast(local_df(
        spark, [(d.lower(),) for d in blocked_domains], "blocked string"))
    docs = (url_counts(df, text_col, id_col)
            .select(F.col(id_col), F.explode("domains").alias("domain")))
    if match_subdomains:
        cond = (F.col("domain") == F.col("blocked")) | \
               F.col("domain").endswith(F.concat(F.lit("."), F.col("blocked")))
    else:
        cond = F.col("domain") == F.col("blocked")
    offenders = docs.join(bl, cond).select(F.col(id_col)).distinct()
    return df.join(offenders, id_col, "left_anti")


def _badwords_pattern(terms, caller: str) -> str:
    """One case-insensitive alternation over the curated term list.
    Word-boundary anchors are applied PER TERM and only on the ends
    that are word characters — `\\b` next to a non-word char (e.g. a
    term starting with `$`) can never match, silently disabling that
    term."""
    import re as _re
    cleaned = sorted({t.strip().lower() for t in terms if t and t.strip()})
    if not cleaned:
        raise ValueError(f"{caller}: empty term list")

    def anchored(t):
        pre = r"\b" if _re.match(r"\w", t[0]) else ""
        post = r"\b" if _re.match(r"\w", t[-1]) else ""
        return f"{pre}{_re.escape(t)}{post}"

    return "(?i)(?:" + "|".join(anchored(t) for t in cleaned) + ")"


def badwords_filter(df: DataFrame, terms, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_hits: int = 0) -> DataFrame:
    """C4-style blocklisted-term document filter: drop documents whose
    text contains more than ``max_hits`` whole-word occurrences of any
    blocklisted term (C4 drops on a single hit — the default). The
    list is human-curated and bounded, so it compiles into ONE
    case-insensitive alternation regex evaluated map-side by codegen
    ``regexp_count`` — no join, no explode, no per-term passes.

    Terms are regex-escaped and matched at word boundaries, so "ass"
    does not fire inside "associate" — the classic C4 false-positive.
    Returns the surviving documents unchanged.
    """
    pattern = _badwords_pattern(terms, "badwords_filter")
    hits = F.regexp_count(F.col(text_col), F.lit(pattern))
    return df.filter(F.col(text_col).isNull() | (hits <= int(max_hits)))


def badwords_ratio(df: DataFrame, terms, text_col: str = "text") -> DataFrame:
    """One-row accounting for badwords_filter at max_hits=0: n_docs,
    docs_flagged, flag_ratio, total_hits — run it before committing to
    the drop (the release-gate form, like corpus_pii_summary)."""
    pattern = _badwords_pattern(terms, "badwords_ratio")
    hits = F.regexp_count(F.col(text_col), F.lit(pattern))
    return (df.filter(F.col(text_col).isNotNull())
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.count(F.when(hits > 0, 1)).alias("docs_flagged"),
                   F.round(F.count(F.when(hits > 0, 1)) / F.count(F.lit(1)),
                           6).alias("flag_ratio"),
                   F.sum(hits).alias("total_hits")))


class BadwordsConstraint(Constraint):
    """``has_acceptable_badwords_ratio``: the share of rows whose text
    contains a whole-word blocklisted term must not exceed
    ``max_ratio`` (default 0 — C4 drops on a single hit).

    Scalar protocol: the curated term list compiles into ONE
    case-insensitive alternation (``_badwords_pattern`` — per-term
    word-boundary anchoring, metachars escaped) and the two aggregate
    expressions (row count + flagged-row count) ride the suite's
    shared fused aggregation — no extra scan next to other checks.
    """

    name = "badwords"

    def __init__(self, column: str, terms, max_ratio: float = 0.0):
        if not 0.0 <= max_ratio <= 1.0:
            raise ValueError(f"max_ratio must be in [0, 1], got {max_ratio}")
        self.column = validate_identifier(column)
        self.pattern = _badwords_pattern(terms, "has_acceptable_badwords_ratio")
        self.max_ratio = float(max_ratio)
        self._rows = metric_alias("badwords_rows", column)
        # the raw pattern is an alias part (metric_alias md5-digests its
        # parts, so length is fine); Python's builtin hash() is salted
        # per process and would make the alias nondeterministic across
        # driver runs
        self._hits = metric_alias("badwords_hits", column, self.pattern)

    def scalar_metrics(self, df: DataFrame) -> Dict[str, Column]:
        hits = F.regexp_count(F.coalesce(F.col(self.column), F.lit("")),
                              F.lit(self.pattern))
        return {self._rows: F.count(F.lit(1)),
                self._hits: F.count(F.when(hits > 0, 1))}

    def result_from_metrics(self, metrics) -> ConstraintResult:
        rows = int(metrics[self._rows])
        if rows == 0:
            return self._finish(ConstraintResult.skipped(
                f"badwords({self.column}): empty table"))
        hits = int(metrics[self._hits])
        ratio = hits / rows
        if ratio <= self.max_ratio:
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio,
            f"badwords({self.column}): {hits} of {rows} rows "
            f"({ratio:.4%}) contain a blocklisted term; allowed ratio "
            f"is {self.max_ratio}"))


class BlockedDomainsConstraint(Constraint):
    """``has_no_blocked_domains``: the share of rows citing a URL on a
    blocked domain (or any subdomain) must not exceed ``max_ratio``.

    The blocklist is human-curated and bounded, so it inlines as an
    ARRAY literal and the per-row test is a pure JVM expression —
    extract URLs (codegen regex), map to lowercased hosts, and
    ``exists``-match against the list (exact or dot-suffix) — riding
    the shared fused aggregation like every scalar gate.  The
    anti-join form for actually DROPPING offenders is
    ``pii.blocklist_filter``; this is its go/no-go twin.
    """

    name = "blocked_domains"

    def __init__(self, column: str, blocked_domains,
                 max_ratio: float = 0.0, match_subdomains: bool = True):
        if not 0.0 <= max_ratio <= 1.0:
            raise ValueError(f"max_ratio must be in [0, 1], got {max_ratio}")
        cleaned = sorted({d.strip().lower() for d in blocked_domains
                          if d and d.strip()})
        if not cleaned:
            raise ValueError("has_no_blocked_domains: empty domain list")
        self.column = validate_identifier(column)
        self.blocked = cleaned
        self.max_ratio = float(max_ratio)
        self.match_subdomains = bool(match_subdomains)
        self._rows = metric_alias("blocked_domains_rows", column)
        # the alias must cover EVERYTHING the expression depends on —
        # the FULL domain list and the subdomain flag — or two gates
        # differing only past a prefix would collide and the fused-agg
        # executor would dedup them onto one hit count
        self._hits = metric_alias("blocked_domains_hits", column,
                                  str(self.match_subdomains), *cleaned)

    def _row_flagged(self) -> Column:
        txt = F.coalesce(F.col(self.column), F.lit(""))
        urls = F.regexp_extract_all(txt, F.lit(URL_PATTERN), 0)
        domains = F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, DOMAIN_PATTERN, 1)))
        bl = F.array(*[F.lit(d) for d in self.blocked])
        if self.match_subdomains:
            match = lambda d: F.exists(  # noqa: E731
                bl, lambda b: (d == b) | d.endswith(F.concat(F.lit("."), b)))
        else:
            match = lambda d: F.array_contains(bl, d)  # noqa: E731
        return F.exists(domains, lambda d: (d != "") & match(d))

    def scalar_metrics(self, df: DataFrame) -> Dict[str, Column]:
        return {self._rows: F.count(F.lit(1)),
                self._hits: F.count(F.when(self._row_flagged(), 1))}

    def result_from_metrics(self, metrics) -> ConstraintResult:
        rows = int(metrics[self._rows])
        if rows == 0:
            return self._finish(ConstraintResult.skipped(
                f"blocked_domains({self.column}): empty table"))
        hits = int(metrics[self._hits])
        ratio = hits / rows
        if ratio <= self.max_ratio:
            return self._finish(ConstraintResult.success(ratio))
        return self._finish(ConstraintResult.failure(
            ratio,
            f"blocked_domains({self.column}): {hits} of {rows} rows "
            f"({ratio:.4%}) cite a blocked domain; allowed ratio is "
            f"{self.max_ratio}"))
