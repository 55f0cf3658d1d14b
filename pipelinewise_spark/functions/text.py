"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen-friendly): language ID by
stopword-marker counting, quality scoring from length/token/stopword
statistics, token counting (whitespace + BPE-ish regex), and canonical
document fingerprinting (sorted distinct token set → md5). Each has an exact
DuckDB-SQL twin in queries/llmdata.py.

Scale: every operator is a narrow per-row projection — no shuffle, no UDF,
scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace tokenizer shared by all operators (regex identical in Java/RE2)
_WS = r"\s+"
# BPE-ish pretokenizer: letter runs | single digits | single non-alnum marks
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# language marker words (tiny demonstration lexicons; real deployments swap in
# fasttext-style models via a pandas UDF — the plumbing is identical)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|a)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
    "es": r"\b(el|los|las|es|una|y)\b",
}
# CJK codepoint range as literal characters (portable across regex engines)
CJK_PATTERN = "[一-鿿]"
LANG_ORDER = ["en", "de", "fr", "es", "zh"]

STOPWORD_PATTERN = r"\b(the|a|and|of|to|in|is)\b"


def tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), _WS)


def token_count(col: Column) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_token_count(col: Column) -> Column:
    """BPE-ish pretoken count — upper-bounds subword token usage."""
    return F.regexp_count(col, F.lit(BPE_PATTERN)).cast("bigint")


def lang_scores(col: Column) -> dict[str, Column]:
    low = F.lower(col)
    scores = {
        lang: F.regexp_count(low, F.lit(pat)).cast("bigint")
        for lang, pat in LANG_MARKERS.items()
    }
    scores["zh"] = F.regexp_count(col, F.lit(CJK_PATTERN)).cast("bigint")
    return scores


def lang_id(col: Column) -> Column:
    """Argmax of marker scores, first-wins tie-break in LANG_ORDER;
    'unknown' when every score is 0."""
    s = lang_scores(col)
    # CASE: WHEN s_en>0 AND s_en>=s_de AND ... THEN 'en' WHEN s_de>0 AND
    # s_de>=s_fr ... — earlier languages win ties
    case = None
    for idx, lang in enumerate(LANG_ORDER):
        cond = s[lang] > 0
        for other in LANG_ORDER[idx + 1:]:
            cond = cond & (s[lang] >= s[other])
        for other in LANG_ORDER[:idx]:
            cond = cond & (s[lang] > s[other])
        case = F.when(cond, F.lit(lang)) if case is None else case.when(
            cond, F.lit(lang)
        )
    return case.otherwise(F.lit("unknown"))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic from deterministic statistics:
    0.5·min(tokens,100)/100 + 0.3·stopword_ratio + 0.2·min(avg_tok_len,10)/10.
    """
    n_tok = token_count(col).cast("double")
    n_alpha = F.length(F.regexp_replace(F.trim(col), _WS, "")).cast("double")
    stop = F.regexp_count(F.lower(col), F.lit(STOPWORD_PATTERN)).cast("double")
    avg_len = n_alpha / n_tok
    return (
        F.least(n_tok, F.lit(100.0)) / F.lit(100.0) * F.lit(0.5)
        + (stop / n_tok) * F.lit(0.3)
        + F.least(avg_len, F.lit(10.0)) / F.lit(10.0) * F.lit(0.2)
    )


def fingerprint(col: Column) -> Column:
    """Canonical fingerprint: md5 of the sorted distinct token set (the
    OpenRefine/key-collision method) — the standard exact-dedup key after
    canonicalization."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def gopher_stats(col: Column, toks: Column | None = None) -> dict[str, Column]:
    """Gopher-rule quality signals (Rae et al. 2021, public filtering
    heuristics for web-scale training corpora): word count, mean word
    length, symbol-to-word ratio, alphabetic-word fraction, duplicate
    3-gram fraction. Pass ``toks`` as a pre-materialized token-array column
    (withColumn) — higher-order lambdas re-evaluate inlined subexpressions
    per element, so the split must not be inlined five times."""
    if toks is None:
        toks = tokens(col)
    n = F.size(toks).cast("double")
    mean_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / n
    symbol_ratio = (F.regexp_count(col, F.lit(r"[#…]")) .cast("double")) / n
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1),
            F.element_at(toks, i + 2)
        ),
    )
    dup_3gram_frac = F.when(
        F.size(grams) > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
    ).otherwise(F.lit(0.0))
    return {
        "n_words": F.size(toks).cast("bigint"),
        "mean_word_len": F.round(mean_len, 6),
        "symbol_ratio": F.round(symbol_ratio, 6),
        "alpha_frac": F.round(alpha_frac, 6),
        "dup_3gram_frac": F.round(dup_3gram_frac, 6),
    }


def gopher_keep(stats: dict[str, Column]) -> Column:
    """The composite Gopher keep-rule over ``gopher_stats`` output."""
    return (
        stats["n_words"].between(50, 100_000)
        & stats["mean_word_len"].between(3.0, 10.0)
        & (stats["symbol_ratio"] < 0.1)
        & (stats["alpha_frac"] > 0.8)
        & (stats["dup_3gram_frac"] < 0.3)
    )
