"""Exact duplicated-span detection across a corpus.

The substring-level twin of document-level exact dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better"): a span that
appears verbatim in more than one document is memorization fuel even when
the documents as a whole differ. The published implementation builds a
suffix array over the concatenated corpus; the Spark-native shape below
pays the same O(total tokens) cost as a stride-1 token-window explode —
every hash/groupBy stage is map-side combinable, so nothing quadratic or
single-task ever forms:

1. explode token windows of length ``window`` (stride 1) per document —
   |tokens| rows, the honest suffix-array-scale cost;
2. a window hash is DUPLICATED when it occurs in >1 distinct document —
   detected with ``min(doc) != max(doc)`` (map-side combinable; the Zipf
   head of boilerplate spans collapses in the combiner, so a
   million-document boilerplate span never concentrates on one reducer
   the way a count-distinct would);
3. duplicated window hashes join back to their positions (dup set is
   answer-sized — AQE broadcasts it when small);
4. per-document covered-position count via the classic interval-merge
   sweep as a running-max window — partitioned BY DOCUMENT, so the sort
   is bounded by document length, never corpus-sized.

md5-hex hashing throughout: bit-identical in DuckDB, so the operator has
an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipelinewise_spark.functions.text import tokens
from pipelinewise_spark.partitioning import spread

_SEP = "\x1f"



def _window_grams(df: DataFrame, id_col: str, text_col: str, window: int):
    """(base(id, n_tokens, __toks), grams(id, pos, h)) shared by the span
    operators: stride-1 window hashes over the normalized token stream."""
    toks = tokens(F.col(text_col))
    base = spread(df).select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.alias("__toks"),
    )
    idx = F.sequence(F.lit(0), F.col("n_tokens") - F.lit(window))
    gram = F.transform(
        idx,
        lambda p: F.md5(
            F.concat_ws(_SEP, F.slice(F.col("__toks"), p + 1, window))
        ),
    )
    grams = (
        base.filter(F.col("n_tokens") >= window)
        .select(F.col(id_col), F.posexplode(gram).alias("pos", "h"))
    )
    return base, grams


def _cross_doc_dup_hashes(grams: DataFrame, id_col: str) -> DataFrame:
    """Window hashes occurring in >1 DISTINCT document. min(doc)!=max(doc)
    is map-side combinable, so the Zipf head of boilerplate spans collapses
    in the combiner instead of concentrating on one reducer the way a
    count-distinct would."""
    return (
        grams.groupBy("h")
        .agg(F.min(id_col).alias("__a"), F.max(id_col).alias("__b"))
        .filter(F.col("__a") != F.col("__b"))
        .select("h")
    )


def _interval_coverage(hits: DataFrame, id_col: str, window: int) -> DataFrame:
    """Merged covered-position count per id from window-start hits."""
    w_doc = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + F.lit(window)).over(w_doc)
    contrib = (F.col("pos") + F.lit(window)) - F.greatest(
        F.coalesce(prev_end, F.col("pos")), F.col("pos")
    )
    return (
        hits.withColumn("__c", contrib)
        .groupBy(id_col)
        .agg(F.sum("__c").cast("bigint").alias("__covered"))
    )


def duplicated_span_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of token
    positions covered by at least one exact ``window``-token span that
    also occurs in ANOTHER document. Returns
    ``(id_col, n_tokens, dup_positions, dup_fraction)`` for every input
    document (0.0 where nothing repeats; NULL fraction for NULL text).

    Downstream use: filter ``dup_fraction >= threshold`` to drop
    boilerplate-heavy documents, or feed the positions variant into span
    excision."""
    base, grams = _window_grams(df, id_col, text_col, window)
    dup = _cross_doc_dup_hashes(grams, id_col)
    hits = grams.join(dup, "h").select(F.col(id_col), F.col("pos"))
    covered = _interval_coverage(hits, id_col, window)

    out = (
        base.drop("__toks")
        .join(covered, id_col, "left")
        .withColumn(
            "dup_positions",
            F.coalesce(F.col("__covered"), F.lit(0).cast("bigint")),
        )
        .drop("__covered")
        .withColumn(
            # plain IEEE division of two exact integers — bit-identical in
            # any engine, so the oracle needs no rounding epsilon
            "dup_fraction",
            F.col("dup_positions").cast("double")
            / F.col("n_tokens").cast("double"),
        )
    )
    return out.select(id_col, "n_tokens", "dup_positions", "dup_fraction")


def excise_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
) -> DataFrame:
    """Exact substring deduplication proper (Lee et al. 2022 ExactSubstr):
    REMOVE every token position covered by a cross-document duplicated
    ``window``-token span and rebuild the document from the surviving
    tokens. Output text is the normalized-token reconstruction
    (lower/trim, single-space joined) — the operator's contract is over
    the token stream, as the published tool's is over the byte stream.

    Returns ``(id_col, clean_text, n_tokens, n_removed)``: NULL text stays
    NULL; a fully-duplicated document becomes the empty string.

    Scale shape on top of :func:`duplicated_span_coverage`'s stages: the
    covered-position explode multiplies duplicate HITS by ``window``
    (answer-sized, not corpus-sized); the token stream explodes once
    (|tokens| rows, the cost already paid for window hashing); the
    kept-token anti-join and the ordered per-document reassembly both key
    on the document id, so no stage ever exceeds per-document scale after
    the one corpus-wide duplicate-detection groupBy."""
    base, grams = _window_grams(df, id_col, text_col, window)
    dup = _cross_doc_dup_hashes(grams, id_col)
    covered = (
        grams.join(dup, "h")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    tok_stream = base.select(
        F.col(id_col), F.posexplode("__toks").alias("tpos", "tok")
    )
    kept = tok_stream.join(covered, [id_col, "tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("__clean"),
        F.count("*").cast("bigint").alias("__n_kept"),
    )
    return (
        base.drop("__toks")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("n_tokens").isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("__clean"), F.lit("")))
            .alias("clean_text"),
            F.col("n_tokens"),
            (
                F.col("n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0))
            ).cast("bigint").alias("n_removed"),
        )
    )


def contamination_span_coverage(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    threshold: float = 0.2,
) -> DataFrame:
    """Span-level train/eval DECONTAMINATION signal: per corpus document,
    the fraction of token positions covered by an exact ``window``-token
    span that also appears in the BENCHMARK set — the 8-13-gram overlap
    check production pipelines run against eval suites before training
    (doc-level collision drop is `decontaminate`; this grades HOW MUCH of
    each document is contaminated and flags >= ``threshold``).

    Scale shape: the benchmark's distinct span-hash set is eval-suite-
    sized (broadcast); the corpus pays one window explode (the cost the
    self-dup operators already price in) and a semi join against that
    set; coverage merges per document. Returns
    (id, n_tokens, contaminated_positions, contamination_fraction,
    is_contaminated)."""
    base, grams = _window_grams(corpus, id_col, text_col, window)
    _, bench_grams = _window_grams(benchmark, id_col, text_col, window)
    bench_set = bench_grams.select("h").distinct()
    hits = grams.join(F.broadcast(bench_set), "h").select(
        F.col(id_col), F.col("pos")
    )
    covered = _interval_coverage(hits, id_col, window)
    frac = F.col("contaminated_positions").cast("double") / F.col(
        "n_tokens"
    ).cast("double")
    return (
        base.drop("__toks")
        .join(covered, id_col, "left")
        .withColumn(
            "contaminated_positions",
            F.coalesce(F.col("__covered"), F.lit(0).cast("bigint")),
        )
        .drop("__covered")
        .withColumn("contamination_fraction", frac)
        .withColumn(
            "is_contaminated",
            F.when(
                F.col("n_tokens").isNotNull(),
                F.coalesce(
                    F.col("contamination_fraction") >= threshold, F.lit(False)
                ),
            ),
        )
        .select(
            id_col, "n_tokens", "contaminated_positions",
            "contamination_fraction", "is_contaminated",
        )
    )
