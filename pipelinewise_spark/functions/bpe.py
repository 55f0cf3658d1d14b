"""Distributed BPE (byte-pair encoding) vocabulary training.

The textbook merge loop, map-reduce shaped: the corpus collapses once into a
(word, frequency) table — for natural text this is heavy-hitter-small
relative to the corpus (Zipf), and it is the ONLY state the loop touches.
Each iteration counts adjacent symbol pairs weighted by word frequency (one
explode + groupBy over the word table), picks the most frequent pair
(deterministic tie-break: lexicographic), and rewrites the symbol sequences.
The driver holds only the chosen merge per round; pair counting and symbol
rewriting stay distributed.

At 100 TB the word-frequency collapse is the one corpus-sized shuffle;
everything after runs on the vocabulary table. ``localCheckpoint`` per
iteration truncates the growing lineage exactly like the dedup-cluster
label propagation (functions/clusters.py).

No SQL oracle (iterative — not expressible as one query); correctness is
pinned against a pure-Python reference implementation in tests.
"""

from __future__ import annotations

import os

from pipelinewise_spark.partitioning import local_frame
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"


def _driver_vocab_bound() -> int:
    """Vocabulary size below which the merge loop runs driver-side.

    The BPE loop's only state is the (word, freq, syms) vocabulary —
    Zipf-small relative to the corpus. Below this bound the loop is pure
    answer-scale iteration: 2 Spark jobs per merge round (pair-count
    collect + rewrite checkpoint) collapse into ONE collect total, with
    bit-identical results (same integer counts, same lexicographic
    tie-break, same greedy left-to-right rewrite — the word table and
    its initial symbol split still come from the SAME distributed
    expressions, so tokenization semantics cannot diverge). Above the
    bound (a 100 TB web corpus can exceed 10M distinct words) the
    distributed loop below runs unchanged. 0 disables the driver path."""
    try:
        return int(os.environ.get("PWS_BPE_MAX_DRIVER_VOCAB", "65536"))
    except ValueError:
        return 65536


def _merge_syms(
    syms: list[str], left: str, right: str, merged: str
) -> list[str]:
    """Greedy left-to-right fold of one merge over a symbol list — the
    exact Python twin of the Catalyst ``F.aggregate`` rewrite."""
    out: list[str] = []
    for tok in syms:
        if out and out[-1] == left and tok == right:
            out[-1] = merged
        else:
            out.append(tok)
    return out


def _train_local(rows, num_merges: int) -> list[tuple[str, str, int]]:
    """Driver-side merge loop over a collected (freq, syms) vocabulary.
    Pair counting: integer freq sums; winner: max count, ties broken by
    ascending ``"left right"`` string (Python str comparison is
    codepoint order, the same order Spark's binary UTF8String orderBy
    yields); rewrite: greedy left-to-right, identical to the
    distributed fold."""
    freqs = [int(r["freq"]) for r in rows]
    syms = [list(r["syms"]) for r in rows]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for f, s in zip(freqs, syms):
            for a, b in zip(s, s[1:]):
                k = (a, b)
                pairs[k] = pairs.get(k, 0) + f
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((left, right, int(n)))
        merged = left + right
        syms = [
            _merge_syms(s, left, right, merged)
            if any(a == left and b == right for a, b in zip(s, s[1:]))
            else s
            for s in syms
        ]
    return merges


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    from pipelinewise_spark.functions.text import tokens
    from pipelinewise_spark.partitioning import local_frame, spread

    return (
        spread(df)
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        # initial symbols: characters + end-of-word marker
        .withColumn(
            "syms",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))),
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    idx = F.sequence(F.lit(1), F.size("syms") - 1)
    pair = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("syms"), i),
            F.element_at(F.col("syms"), i + 1)
        ),
    )
    return (
        words.select(F.explode(pair).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_train(
    df: DataFrame, text_col: str, num_merges: int
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, count), …]
    in merge order."""
    words = _word_table(df, text_col)
    bound = _driver_vocab_bound()
    if bound > 0:
        # answer-scale fast path: ONE job collects the vocabulary (take
        # fetches at most bound+1 rows — driver memory stays bounded even
        # over a 100M-word corpus), the merge loop runs driver-side
        sample = words.take(bound + 1)
        if len(sample) <= bound:
            return _train_local(sample, num_merges)
    words = words.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["pair"].split(" ")
        merges.append((left, right, int(top[0]["n"])))
        # rewrite: fold over symbols, merging adjacent (left, right)
        merged = F.lit(left + right)
        words = words.withColumn(
            "syms",
            F.aggregate(
                F.col("syms"),
                F.array().cast("array<string>"),
                lambda acc, s: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(left))
                    & (s == F.lit(right)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
                ).otherwise(F.concat(acc, F.array(s))),
            ),
        ).localCheckpoint()
    return merges


def bpe_train_df(
    spark: SparkSession, df: DataFrame, text_col: str, num_merges: int
) -> DataFrame:
    """Merge table as a DataFrame: (rank, left, right, count)."""
    rows = [
        (i + 1, left, right, n)
        for i, (left, right, n) in enumerate(bpe_train(df, text_col, num_merges))
    ]
    return local_frame(spark, 
        rows, "rank long, left string, right string, count long"
    )


def bpe_apply(
    words: DataFrame, merges: list[tuple[str, str, int]], syms_col: str = "syms"
) -> DataFrame:
    """Apply a trained merge sequence to a (word, syms) vocabulary table —
    the ENCODE half of BPE. Same distributed fold as training's rewrite,
    replayed in merge-rank order; ``localCheckpoint`` every few merges keeps
    the expression tree (and lineage) bounded. Encoding operates on the
    VOCABULARY (Zipf-small), never the corpus — the corpus only joins the
    finished vocab."""
    for i, (left, right, _n) in enumerate(merges):
        merged = F.lit(left + right)
        words = words.withColumn(
            syms_col,
            F.aggregate(
                F.col(syms_col),
                F.array().cast("array<string>"),
                lambda acc, s: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(left))
                    & (s == F.lit(right)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
                ).otherwise(F.concat(acc, F.array(s))),
            ),
        )
        if (i + 1) % 4 == 0:
            words = words.localCheckpoint()
    return words.localCheckpoint()


def bpe_encode_counts(
    df: DataFrame, key_col: str, text_col: str, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Per-document subword statistics under a trained BPE vocabulary:
    (key, n_words, n_subwords). The distinct-word vocab is encoded once via
    ``bpe_apply`` and broadcast back onto the corpus tokens — the corpus
    itself is never rewritten symbol-by-symbol."""
    from pipelinewise_spark.functions.text import tokens
    from pipelinewise_spark.partitioning import local_frame, spread

    d = spread(df).withColumn("__toks", tokens(F.col(text_col)))
    vocab = (
        d.select(F.explode("__toks").alias("word"))
        .distinct()
        .withColumn(
            "syms", F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
        )
    )
    enc = None
    bound = _driver_vocab_bound()
    if bound > 0:
        # answer-scale fast path (same guard as bpe_train): encode the
        # collected vocabulary driver-side — the per-word merge replay is
        # the exact Python twin of bpe_apply's fold — and broadcast the
        # (word, n_syms) result back. Initial symbols still come from the
        # distributed split expression, so character semantics match.
        rows = vocab.take(bound + 1)
        if len(rows) <= bound:
            out = []
            for r in rows:
                s = list(r["syms"])
                for left, right, _n in merges:
                    s = _merge_syms(s, left, right, left + right)
                out.append((r["word"], len(s)))
            enc = local_frame(
                df.sparkSession, out, "word string, __n_syms int"
            )
    if enc is None:
        enc = bpe_apply(vocab, merges).select(
            "word", F.size("syms").alias("__n_syms")
        )
    tok = d.select(key_col, F.explode("__toks").alias("word"))
    return (
        tok.join(F.broadcast(enc), "word")
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("__n_syms").cast("long").alias("n_subwords"),
        )
    )
