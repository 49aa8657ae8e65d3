"""Text-analysis operators for training-data pipelines: tokenization,
quality scoring, language ID, document fingerprinting.

These extend the reference's capability set toward LLM data curation
(build-brief extension; SURVEY §7.2 step 9). All expressions are
JVM-side built-ins (no Python UDFs) so they pipeline with the rest of
a scan at 100 TB: tokenize/quality/fingerprint are row-local
(narrow), language-ID is a CASE over substring counts.

Determinism: every function here has an exact SQL equivalent (the
oracle strings live in term_spark/queries_llm.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pyspark.sql.functions as F

# Marker stopwords per language for the n-gram/marker heuristic
# language-ID. Chosen to be disjoint across languages.
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "und", "die", "nicht", "das"],
    "fr": ["le", "les", "des", "est", "une"],
    "es": ["el", "los", "las", "es", "una"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: a run of anything that is neither a letter nor a digit (punctuation
#: and whitespace alike) — identical semantics in Java regex (Spark)
#: and RE2 (DuckDB oracles)
NON_ALNUM_RUN = r"[^\p{L}\p{N}]+"


def normalize_text(column) -> "F.Column":
    """Canonical text normalization shared by EVERY identity-ish
    operator (fingerprint, shingling, simhash): lowercase, strip
    punctuation to spaces, collapse whitespace, trim.

    Without the punctuation strip, "Hello, world" and "Hello world"
    produce different fingerprints AND different shingles, so near-dup
    detection and n-gram decontamination miss trivially-reformatted
    contamination. Real decontamination pipelines strip punctuation
    before k-gram matching. The DuckDB oracles mirror this expression
    exactly (queries_llm._NORM_SQL).
    """
    col = F.col(column) if isinstance(column, str) else column
    # single pass: a run of anything non-alphanumeric (punctuation AND
    # whitespace) collapses to one space — equivalent to strip-punct +
    # collapse-whitespace, at half the regex cost (this runs per
    # document in every dedup/decontamination scan)
    return F.trim(F.regexp_replace(F.lower(col), NON_ALNUM_RUN, " "))


def norm_tokens(column) -> "F.Column":
    """Token array over normalized text (single-space split — the
    normalizer already collapsed runs). Empty text → [\"\"]."""
    return F.split(normalize_text(column), " ")


def token_count(column: str) -> "F.Column":
    """Whitespace token count; 0 for empty/blank text. bigint to match
    engines whose len() is int64."""
    col = F.trim(F.col(column))
    return F.when(col == "", 0).otherwise(
        F.size(F.split(col, r"\s+"))).cast("bigint").alias("n_tokens")


def bpe_ish_token_count(column: str) -> "F.Column":
    """Sub-word-ish token count: split on word/number/punct boundaries
    (a cheap BPE proxy: words + digits + punctuation marks each count)."""
    col = F.col(column)
    # count matches of: word chars run | digit run | single non-space punct
    stripped = F.regexp_replace(col, r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]", "\x01")
    return (F.length(F.regexp_replace(stripped, r"[^\x01]", ""))
            .cast("bigint").alias("n_bpe_tokens"))


def punct_ratio(column: str) -> "F.Column":
    col = F.col(column)
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return (n_punct / F.greatest(F.length(col), F.lit(1))).alias("punct_ratio")


def stopword_ratio(column: str, stopwords: Sequence[str] = tuple(STOPWORDS_EN)) -> "F.Column":
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    toks = F.split(F.lower(F.trim(F.col(column))), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin([s.lower() for s in stopwords])))
    total = F.greatest(F.size(toks), F.lit(1))
    return (hits / total).alias("stopword_ratio")


def quality_score(column: str) -> "F.Column":
    """Composite [0,1] quality heuristic: length band + punctuation
    sanity + stopword presence (mirrors C4/Gopher-style filters in
    spirit; each term is a clamped linear score)."""
    n = F.length(F.col(column))
    ln_score = F.least(n / F.lit(200.0), F.lit(1.0))           # longer is better up to 200 chars
    p = F.length(F.regexp_replace(F.col(column), r"[^.,;:!?]", "")) / \
        F.greatest(n, F.lit(1))
    punct_score = F.lit(1.0) - F.least(p * 10, F.lit(1.0))      # >10% punct → 0
    toks = F.split(F.lower(F.trim(F.col(column))), r"\s+")
    sw = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN)))
    sw_score = F.least(sw / F.lit(3.0), F.lit(1.0))             # ≥3 stopwords → 1
    return ((ln_score + punct_score + sw_score) / 3).alias("quality_score")


def language_id(column: str, markers: Optional[Dict[str, List[str]]] = None) -> "F.Column":
    """Marker-token-count language ID: the language with the most
    marker hits wins; ties broken by language code order; no hits →
    'und'. Marker hits are counted as whole tokens.
    """
    markers = markers or LANG_MARKERS
    toks = F.split(F.lower(F.trim(F.col(column))), r"\s+")

    # NB: the lambda must be unary — F.filter treats a 2-arg lambda as
    # (element, index), so a `ws=words` default would receive the index.
    def _isin(ws):
        return lambda t: t.isin(ws)

    scores = {lang: F.size(F.filter(toks, _isin(words)))
              for lang, words in markers.items()}
    best = None
    best_score = None
    for lang in sorted(markers):  # later langs must beat, not tie
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, lang).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise("und").alias("predicted_lang")


def fingerprint(column: str) -> "F.Column":
    """Deterministic document fingerprint: md5 of punctuation-stripped,
    whitespace-normalized lowercase text (rolling-hash-equivalent
    identity for dedup; see ``normalize_text``)."""
    return F.md5(normalize_text(column)).alias("fingerprint")


def char_ngrams(column: str, n: int = 5) -> "F.Column":
    """Array of character n-grams via slicing (JVM-side, no UDF)."""
    col = F.col(column)
    # sequence of start positions 1..len-n+1; substring per position
    starts = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.transform(starts, lambda i: col.substr(i, F.lit(n))).alias(f"char_{n}grams")


def word_shingles_from(toks_col: "F.Column", k: int = 3) -> "F.Column":
    """k-word shingles from an ALREADY-MATERIALIZED token-array column.

    Performance: the lambda body must reference a plain attribute —
    if it references the `split(...)` expression tree directly, Spark
    re-evaluates the split for every array element (O(tokens²) per
    row; measured 10× slowdown on 5k docs). Project the token array
    first, then shingle.
    """
    n = F.size(toks_col)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks_col, i + 1, k)))
    ).otherwise(F.array(F.concat_ws(" ", toks_col))).alias("shingles")


def word_shingles(column: str, k: int = 3) -> "F.Column":
    """Array of k-word shingles (space-joined) over NORMALIZED tokens
    (lowercase, punctuation stripped — ``normalize_text``).

    Prefer ``word_shingles_from`` over a pre-projected token column in
    hot paths (see its docstring).
    """
    return word_shingles_from(norm_tokens(column), k)
