"""Text retrieval scoring: BM25 over a document corpus.

The classic ranking function, computed corpus-parallel:

    score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1-b+b·|D|/avgdl))
    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )      (the +1 form)

Shapes for scale: document frequencies for the (few) query terms reduce to a
tiny aggregate that BROADCASTS; per-document term frequencies come from one
explode + filtered aggregation over query terms only — the corpus is scanned
once, nothing quadratic. Deterministic: same op order in the DuckDB oracle →
bit-identical doubles (rounded to 6 dp for belt-and-braces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinewise_spark.functions.text import tokens
from pipelinewise_spark.partitioning import spread

K1 = 1.2
B = 0.75


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(id, score) for every document containing at least one query term."""
    d = spread(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    d = d.withColumn("__dl", F.size("__toks").cast("double"))

    stats = d.agg(
        F.count("*").alias("n"), F.avg("__dl").alias("avgdl")
    ).first()
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])

    terms = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        d.select(id_col, "__dl", F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # document frequency per query term: tiny frame, broadcast
    dfreq = (
        tf.groupBy("term").agg(F.countDistinct(id_col).cast("double").alias("df"))
    )
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn(
            "__s",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / avgdl)),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    _ = terms  # documented shape: terms list is driver-side metadata
    return scored


def hybrid_rerank(
    bm25: DataFrame,
    embeddings: DataFrame,
    query_vec_id: int,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Two-stage hybrid retrieval: lexical BM25 candidates reranked by
    embedding cosine to the query vector — the standard search pipeline
    (recall from the inverted/lexical stage, precision from the dense
    stage). hybrid = alpha * bm25/max_bm25 + (1-alpha) * cosine, top-k with
    a deterministic id tie-break.

    Scale shape: the dense join touches ONLY the lexical candidate set
    (candidates broadcast into the embedding scan when small); the
    max-score normalizer is a broadcast 1-row aggregate; the rank window
    runs on candidates, never the corpus. Scores round to 6 decimals so
    rank order is reproducible across FP summation orders.
    """
    from pyspark.sql import Window

    from pipelinewise_spark.functions.similarity import cosine

    qv = embeddings.filter(F.col(vec_id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv")
    )
    cand = bm25.join(
        embeddings.select(
            F.col(vec_id_col).alias(id_col), F.col(vec_col).alias("__cv")
        ),
        id_col,
    ).crossJoin(F.broadcast(qv))
    mx = bm25.agg(F.max("score").alias("__mx"))
    scored = cand.crossJoin(F.broadcast(mx)).select(
        id_col,
        F.col("score").alias("bm25"),
        F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cos"),
        F.round(
            F.lit(alpha) * F.col("score") / F.col("__mx")
            + F.lit(1.0 - alpha)
            * F.round(cosine(F.col("__cv"), F.col("__qv")), 6),
            6,
        ).alias("hybrid"),
    )
    w = Window.orderBy(F.col("hybrid").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N candidate rankings — the standard
    score-free way to merge a lexical list and a dense list (and any
    others) when their score scales don't compare:

        rrf(d) = Σ_lists 1 / (k + rank_list(d))        (k = 60 classic)

    Each list contributes ``floor(1e9 / (k + rank))`` integer "ppb"
    points instead of the float reciprocal: integer addition is
    associative, so the fused ordering is bit-identical under any
    partitioning / engine (a float Σ over 3+ lists is summation-order
    sensitive), and the quantization can only merge ranks beyond
    ~30k — far past any candidate-list depth. Docs missing from a list
    contribute nothing (the graceful-degradation property RRF is chosen
    for). Returns top-``topk`` with ``rrf_ppb``, ``n_lists`` (how many
    lists proposed the doc) and the fused ``rank``.

    Scale shape: inputs are candidate lists (top-n each), so the union,
    the groupBy and the final rank window all run on ≤ N·n rows —
    metadata-scale however big the corpus behind the lists is. The
    single-partition window is therefore safe by construction here,
    unlike corpus-ranking windows."""
    from functools import reduce

    from pyspark.sql import Window

    pts = F.floor(
        F.lit(10**9) / (F.lit(int(k)) + F.col(rank_col))
    ).cast("long")
    scored = [
        r.select(F.col(id_col), pts.alias("__pts")) for r in rankings
    ]
    fused = (
        reduce(DataFrame.unionByName, scored)
        .groupBy(id_col)
        .agg(
            F.sum("__pts").cast("long").alias("rrf_ppb"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
    )
    w = Window.orderBy(F.col("rrf_ppb").desc(), F.col(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    topk: int = 3,
    min_len: int = 3,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction — the standard cheap
    "what is this document about" enrichment a curation pipeline runs
    before clustering / mixing / reporting:

        score(t, D) = tf(t, D) · ln(N / df(t))

    Terms shorter than ``min_len`` chars drop (function-word noise).
    Scores round to 6 dp so the per-doc ranking (score desc, term asc)
    is engine-stable despite libm ulp differences in ln(); a term that
    appears in every document scores exactly 0 (idf = ln 1).

    Scale shape: one explode + (doc, term) aggregate (map-side
    combinable), a vocab-sized document-frequency aggregate joined back
    on the term key (sort-merge, Zipf-bounded vocab ≪ corpus tokens),
    the corpus-count scalar broadcast, and a per-doc rank window — every
    shuffle keyed and linear, nothing all-pairs. Output is topk rows per
    document (an enrichment, so row-scale output is inherent)."""
    from pyspark.sql import Window

    pairs = (
        spread(df)
        .select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
        )
        .filter(F.length("term") >= min_len)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    dfreq = pairs.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("__df")
    )
    scored = (
        pairs.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("__df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
    )


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
    k: int = 10,
) -> DataFrame:
    """Per-query ranking quality — the EVAL verb of the retrieval
    family (BM25 / hybrid / ANN / RRF produce rankings; this scores
    them against graded judgments): ``hits_at_k``, ``precision_ppm`` /
    ``recall_ppm`` (exact integer ppm), ``mrr`` (reciprocal rank of the
    first relevant hit) and ``ndcg`` at ``k``.

    Engine-exact by construction: precision/recall stay in integer
    cross-multiplication; MRR is one round-6 division; and the DCG /
    ideal-DCG sums — irrational ``grade/log2(1+rank)`` terms — are
    ORDER-PINNED fold-lefts over rank-sorted arrays (``F.aggregate``
    here, ``list_reduce`` in SQL), so the float summation order is
    identical in any engine and the round-6 quotient hash-compares.
    nDCG's ideal ranking is the top-``k`` judged grades sorted
    descending; queries with no relevant documents score 0.

    Scale shape: results are answer-sized (n_queries × k) and qrels
    judgment-sized — every aggregate here is a groupBy on the query
    key over small frames; the expensive part of evaluation is the
    retrieval run that PRODUCED ``results``, not this scoring.
    Returns (query, hits_at_k, n_relevant, precision_ppm, recall_ppm,
    mrr, ndcg)."""
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).cast("int").alias("__r"),
    )
    # duplicate judgments collapse to the max grade — a doubled qrel
    # row must never double-count a hit or fan out the results join
    judged = (
        qrels.select(
            F.col(query_col).alias("__q"),
            F.col(doc_col).alias("__d"),
            F.col(grade_col).cast("double").alias("__g"),
        )
        .groupBy("__q", "__d")
        .agg(F.max("__g").alias("__g"))
    )
    j = res.join(judged, ["__q", "__d"], "left").withColumn(
        "__g", F.coalesce(F.col("__g"), F.lit(0.0))
    )
    log2r = lambda r: F.log2(r.cast("double") + F.lit(1.0))  # noqa: E731
    per = j.groupBy("__q").agg(
        F.sum((F.col("__g") > 0).cast("long")).alias("hits_at_k"),
        F.min(F.when(F.col("__g") > 0, F.col("__r"))).alias("__first"),
        F.sort_array(
            F.collect_list(F.struct(F.col("__r").alias("r"),
                                    F.col("__g").alias("g")))
        ).alias("__ranked"),
    )
    dcg = F.aggregate(
        F.transform("__ranked", lambda x: x["g"] / log2r(x["r"])),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # ideal DCG: the top-k judged grades, descending, folded in order
    ideal = judged.filter(F.col("__g") > 0).groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_relevant"),
        F.slice(
            F.sort_array(F.collect_list("__g"), asc=False), 1, k
        ).alias("__ideal"),
    )
    idcg = F.aggregate(
        F.zip_with(
            "__ideal",
            F.sequence(F.lit(1), F.size("__ideal")),
            lambda g, i: g / log2r(i),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    out = per.join(ideal, "__q", "left").select(
        F.col("__q").alias(query_col),
        "hits_at_k",
        F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
        F.floor(F.col("hits_at_k") * 1_000_000 / F.lit(k))
        .cast("long")
        .alias("precision_ppm"),
        F.when(
            F.coalesce("n_relevant", F.lit(0)) > 0,
            F.floor(F.col("hits_at_k") * 1_000_000 / F.col("n_relevant")),
        )
        .otherwise(0)
        .cast("long")
        .alias("recall_ppm"),
        F.when(
            F.col("__first").isNotNull(),
            F.round(F.lit(1.0) / F.col("__first"), 6),
        )
        .otherwise(0.0)
        .alias("mrr"),
        F.when(
            F.coalesce("n_relevant", F.lit(0)) > 0,
            F.round(dcg / idcg, 6),
        )
        .otherwise(0.0)
        .alias("ndcg"),
    )
    return out
