"""LLM-training-data pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing — each with an exact DuckDB oracle built from
the same constants so both engines compute literally the same function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinewise_spark.functions import dedup as D
from pipelinewise_spark.functions import multimodal as M
from pipelinewise_spark.functions import similarity as S
from pipelinewise_spark.functions import text as TX
from pipelinewise_spark.queries.registry import register
from pipelinewise_spark.sources.files import read_table

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


# ------------------------------------------------------------ text analysis
@register(
    "text_quality_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{TX.BPE_PATTERN}')) AS BIGINT)
               AS bpe_tokens,
           least(CAST(len({_TOKS}) AS DOUBLE), 100.0) / 100.0 * 0.5
             + CAST(len(regexp_extract_all(lower(text),
                        '{TX.STOPWORD_PATTERN}')) AS DOUBLE)
               / CAST(len({_TOKS}) AS DOUBLE) * 0.3
             + least(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                          AS DOUBLE)
                     / CAST(len({_TOKS}) AS DOUBLE), 10.0) / 10.0 * 0.2
               AS quality
    FROM documents
    """.replace("\\b", "\\b"),
)
def text_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and composite quality
    score — pure projections, no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.bpe_token_count(t).alias("bpe_tokens"),
        TX.quality_score(t).alias("quality"),
    )


def _langid_oracle() -> str:
    score = {
        lang: f"len(regexp_extract_all(lower(text), '{pat}'))"
        for lang, pat in TX.LANG_MARKERS.items()
    }
    score["zh"] = f"len(regexp_extract_all(text, '{TX.CJK_PATTERN}'))"
    whens = []
    for idx, lang in enumerate(TX.LANG_ORDER):
        conds = [f"s_{lang} > 0"]
        conds += [f"s_{lang} >= s_{o}" for o in TX.LANG_ORDER[idx + 1:]]
        conds += [f"s_{lang} > s_{o}" for o in TX.LANG_ORDER[:idx]]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    cases = "\n           ".join(whens)
    scores_sql = ",\n           ".join(
        f"{expr} AS s_{lang}" for lang, expr in score.items()
    )
    return f"""
    WITH scored AS (
        SELECT doc_id,
           {scores_sql}
        FROM documents)
    SELECT doc_id,
           CASE {cases} ELSE 'unknown' END AS lang_detected
    FROM scored
    """


@register("lang_id_documents", oracle=_langid_oracle())
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID with deterministic argmax tie-break."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.lang_id(F.col("text")).alias("lang_detected"))


_FP = f"md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))"


@register(
    "winnowing_fingerprint_documents",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               list_transform(range(1, length(lower(trim(text))) - 6),
                   i -> md5(substring(lower(trim(text)), i, 8))) AS hs
        FROM documents
        WHERE length(lower(trim(text))) >= 8)
    SELECT doc_id, list_min(hs) AS winnow_fp, CAST(len(hs) AS BIGINT) AS n_grams
    FROM g
    """,
)
def winnowing_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window (winnowing-style) fingerprint: minimum hash over all
    char-8-gram windows — the plagiarism-detection document signature. Pure
    per-row projection (no shuffle)."""
    from pipelinewise_spark.partitioning import spread

    # single-split parquet would run ~300 md5/row on one core
    d = spread(read_table(spark, sf_dir, "documents"))
    t = F.col("__t")
    idx = F.sequence(F.lit(1), F.length(t) - 7)
    hs = F.transform(idx, lambda i: F.md5(F.substring(t, i, F.lit(8))))
    return (
        d.withColumn("__t", F.lower(F.trim(F.col("text"))))
        .filter(F.length(t) >= 8)
        .select(
            "doc_id",
            F.array_min(hs).alias("winnow_fp"),
            F.size(hs).cast("bigint").alias("n_grams"),
        )
    )


@register(
    "fingerprint_documents",
    oracle=f"SELECT doc_id, {_FP} AS fingerprint FROM documents",
)
def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical set-of-words fingerprint (key-collision method)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))


# ------------------------------------------------------------------- dedup
@register(
    "exact_dedup_documents",
    oracle=f"""
    SELECT {_FP} AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the canonical fingerprint — one hash-groupBy shuffle;
    survivor = lowest doc_id."""
    d = read_table(spark, sf_dir, "documents")
    return D.exact_dedup(d, "doc_id", "text")


def _minhash_oracle(threshold: float = 0.3) -> str:
    k, b = D.NUM_HASHES, D.NUM_BANDS
    r = k // b
    sigs = ",\n             ".join(
        f"min(substr(md5('{i // 4}:' || shingle), {1 + 8 * (i % 4)}, 8)) AS h{i}"
        for i in range(k)
    )
    band_rows = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, md5('{b}|' || {cols}) AS band_key FROM sig".format(
            b=bi, cols=" || ".join(f"h{bi * r + ri}" for ri in range(r))
        )
        for bi in range(b)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM tok WHERE len(toks) >= 3),
    ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
    sig AS (
        SELECT doc_id,
             {sigs}
        FROM ex GROUP BY doc_id),
    band AS (
        {band_rows}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band a JOIN band b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    verified AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
               AS jaccard
        FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {threshold}
    """


@register("minhash_lsh_pairs_documents", oracle=_minhash_oracle())
def minhash_lsh_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(8 bands×2) near-dup pairs, exact-Jaccard verified at
    0.3 — band-bucket join, never a cross product."""
    d = read_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, "doc_id", "text", threshold=0.3)


def _minhash_bounded_oracle(threshold: float = 0.3, cap: int = 2) -> str:
    """Same signature/band scheme as _minhash_oracle, with the
    per-bucket emission guard: buckets whose full pair set exceeds
    ``cap`` emit the spanning path over their id-sorted members."""
    base = _minhash_oracle(threshold)
    return base.replace(
        """cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band a JOIN band b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id),""",
        f"""sized AS (
        SELECT doc_id, band_key,
               COUNT(*) OVER (PARTITION BY band_key) AS bn,
               LEAD(doc_id) OVER (
                   PARTITION BY band_key ORDER BY doc_id) AS nxt
        FROM band),
    cand AS (
        SELECT DISTINCT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sized a JOIN sized b
              ON a.band_key = b.band_key AND a.doc_id < b.doc_id
            WHERE a.bn * (a.bn - 1) <= 2 * {cap}
            UNION ALL
            SELECT doc_id AS id_a, nxt AS id_b FROM sized
            WHERE bn * (bn - 1) > 2 * {cap} AND nxt IS NOT NULL)),""",
    )


@register(
    "minhash_lsh_bounded_pairs_documents",
    oracle=_minhash_bounded_oracle(),
)
def minhash_lsh_bounded_pairs_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash+LSH near-dup pairs under the per-bucket EMISSION GUARD
    (functions/dedup.py:bounded_bucket_candidates): band buckets past
    the pair cap degrade to a spanning path over their id-sorted
    members — per-bucket emission drops from C(n,2) to n−1 while
    connected components over the verified pairs stay intact for
    replica runs (pinned in tests/test_bounded_pairs.py). On a
    degenerate-duplicate corpus the unguarded answer is
    output-quadratic BY CONSTRUCTION (SCALE.md r10 had to omit the
    R=100 dedup-pair measurement for exactly this reason); this guard
    is what makes that measurement publishable. The cap here is
    fixture-calibrated (2) so BOTH branches — full pairs in small
    buckets, spanning in dense ones — execute at every test scale;
    production runs set it ~1000s."""
    d = read_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        d, "doc_id", "text", threshold=0.3, max_pairs_per_bucket=2
    )


def _minhash_against_oracle(threshold: float = 0.3) -> str:
    """Same signature/band scheme as _minhash_oracle, but candidate pairs
    are restricted to (corpus side: doc_id % 10 <> 0) × (batch side:
    doc_id % 10 = 0) — the incremental ingest-dedup contract."""
    base = _minhash_oracle(threshold)
    return base.replace(
        """SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band a JOIN band b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id""",
        """SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band a JOIN band b
          ON a.band_key = b.band_key AND a.doc_id <> b.doc_id
        WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0""",
    )


@register(
    "minhash_incremental_batch_documents",
    oracle=_minhash_against_oracle(),
)
def minhash_incremental_batch_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ingest dedup (functions/dedup.py:
    minhash_lsh_pairs_against): the 10 % of documents arriving as a new
    batch are near-dup-checked against the standing 90 % corpus — corpus
    self-pairs never form, so per-batch cost is O(batch × collision rate)
    instead of re-running the full corpus dedup. At 100 TB the corpus
    signatures/bands are the materialized LSH index this plan derives."""
    d = read_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    return D.minhash_lsh_pairs_against(
        corpus, batch, "doc_id", "text", threshold=0.3
    )


@register(
    "lsh_index_lifecycle_documents",
    oracle=_minhash_against_oracle(),
)
def lsh_index_lifecycle_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-LSH-index LIFECYCLE (functions/dedup.py): build the
    standing index on 80 % of the corpus, EXTEND it with a 10 % ingest
    batch, COMPACT the accumulated fragments into re-clustered files and
    VACUUM the superseded dirs — then probe with the final 10 % batch.
    The whole maintenance cycle must be candidate-set-preserving: the
    probe's pairs are checked against the SAME oracle as the one-shot
    incremental contract (minhash_incremental_batch_documents), i.e. index
    side = doc_id %% 10 <> 0, batch side = doc_id %% 10 = 0. At 100 TB
    this is the months-long ingest-daemon story: per-batch appends stay
    batch-sized, compaction bounds fragment counts, vacuum bounds storage
    — same verbs, same pointer semantics as ManifestTable."""
    import tempfile

    from pipelinewise_spark.queries.fixturetime import fixture_timer

    d = read_table(spark, sf_dir, "documents")
    mod = F.col("doc_id") % 10
    path = tempfile.mkdtemp(prefix="pws_lshidx_") + "/idx"
    with fixture_timer():
        D.build_lsh_index(
            d.filter((mod != 0) & (mod != 5)), path, "doc_id", "text"
        )
        D.extend_lsh_index(d.filter(mod == 5), path)
        D.compact_lsh_index(spark, path)
        D.vacuum_lsh_index(path)
    return D.minhash_lsh_pairs_against_index(
        spark, path, d.filter(mod == 0), threshold=0.3
    )


def _simhash_oracle() -> str:
    bits = D.SIMHASH_BITS
    sums = ",\n             ".join(
        f"sum((h >> {j}) & 1) AS b{j}" for j in range(bits)
    )
    terms = "\n             + ".join(
        f"(CASE WHEN b{j} * 2 > n_tokens THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents),
    h AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h
        FROM tok),
    agg AS (
        SELECT doc_id, count(*) AS n_tokens,
             {sums}
        FROM h GROUP BY doc_id)
    SELECT doc_id,
           CAST({terms} AS BIGINT) AS simhash,
           n_tokens
    FROM agg
    """


@register("simhash_documents", oracle=_simhash_oracle())
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit Charikar SimHash signatures (bit-majority over token hashes)."""
    d = read_table(spark, sf_dir, "documents")
    return D.simhash(d, "doc_id", "text")


@register(
    "ngram_jaccard_pairs_documents",
    oracle="""
    WITH g AS (
        SELECT doc_id, lang, source,
               list_distinct(list_transform(
                   range(1, length(lower(trim(text))) - 1),
                   i -> substring(lower(trim(text)), i, 3))) AS grams
        FROM documents),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / (len(a.grams) + len(b.grams)
                  - len(list_intersect(a.grams, b.grams))) AS jaccard
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
    """,
)
def ngram_jaccard_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard near-dups, blocked by (lang, source) with a
    4×4 salted-grid self-join (quadratic only within a block, parallel even
    when a block is hot)."""
    d = read_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", block_cols=["lang", "source"], threshold=0.5, grid=4
    )


# -------------------------------------------------------- similarity search
_DOT = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"


def _cosine_topk_oracle(k: int = 3) -> str:
    cos = (
        f"round({_DOT.format(a='qv', b='cv')} / "
        f"(sqrt({_DOT.format(a='qv', b='qv')}) * "
        f"sqrt({_DOT.format(a='cv', b='cv')})), 6)"
    )
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    s AS (SELECT query_id, neighbor_id, {cos} AS cos
          FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cos,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
               FROM s)
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
    """


@register("embedding_cosine_topk", oracle=_cosine_topk_oracle())
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-3 for query vectors (vec_id < 10) —
    broadcast queries × one corpus scan, ranked window."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.cosine_topk(emb, queries, "vec_id", "embedding", k=3)


def _lsh_buckets_oracle() -> str:
    planes = S.hyperplanes()
    terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        dot = f"list_sum(list_transform(range(1, 65), i -> ev[i] * ({lit})[i]))"
        terms.append(f"(CASE WHEN {dot} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)")
    expr = "\n           + ".join(terms)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
    SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM e
    """


@register("embedding_lsh_buckets", oracle=_lsh_buckets_oracle())
def embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing with deterministic sha256-derived hyperplanes —
    the scale path for ANN (bucket = map stage, search within buckets)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.lsh_buckets(emb, "vec_id", "embedding")


def _ann_bucket_top1_oracle() -> str:
    planes = S.hyperplanes()
    terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        dot = f"list_sum(list_transform(range(1, 65), i -> ev[i] * ({lit})[i]))"
        terms.append(f"(CASE WHEN {dot} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)")
    bucket = " + ".join(terms)
    cos = (
        f"round({_DOT.format(a='a.ev', b='b.ev')} / "
        f"(sqrt({_DOT.format(a='a.ev', b='a.ev')}) * "
        f"sqrt({_DOT.format(a='b.ev', b='b.ev')})), 6)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
                      CAST({bucket} AS BIGINT) AS bucket
               FROM embeddings),
    scored AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, {cos} AS cos
        FROM e a JOIN e b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
    ranked AS (
        SELECT vec_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored)
    SELECT vec_id, neighbor_id, cos FROM ranked WHERE rn = 1
    """


@register("embedding_ann_bucket_top1", oracle=_ann_bucket_top1_oracle())
def embedding_ann_bucket_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup scale path: nearest neighbor *within the LSH
    bucket* for every vector — candidates ≪ corpus², the ANN contract."""
    from pyspark.sql import Window

    from pipelinewise_spark.partitioning import spread

    emb = read_table(spark, sf_dir, "embeddings")
    # bucket computed inline (no (id,bucket)->vector join-back): each side
    # of the bucket self-join is one narrow scan+projection
    e = S.with_lsh_bucket(spread(emb), "embedding")
    a = e.select(
        F.col("vec_id"), F.col("embedding").alias("__av"), "bucket"
    ).alias("a")
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__bv"),
        F.col("bucket").alias("__b2"),
    ).alias("b")
    scored = (
        a.join(c, (F.col("bucket") == F.col("__b2"))
               & (F.col("vec_id") != F.col("neighbor_id")))
        .withColumn("cos", F.round(S.cosine(F.col("__av"), F.col("__bv")), 6))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "neighbor_id", "cos")
    )


def _near_dup_pairs_oracle(
    threshold: float = 0.4, bands: int = 4, planes_per_band: int = 4
) -> str:
    planes = S.hyperplanes(bands * planes_per_band)
    keys = []
    for b in range(bands):
        terms = []
        for j in range(planes_per_band):
            plane = planes[b * planes_per_band + j]
            lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
            d = f"list_sum(list_transform(range(1, 65), i -> ev[i] * ({lit})[i]))"
            terms.append(f"(CASE WHEN {d} > 0 THEN (1 << {j}) ELSE 0 END)")
        keys.append(f"({' + '.join(terms)}) AS k{b}")
    band_match = " OR ".join(f"a.k{b} = b.k{b}" for b in range(bands))
    cos = (
        f"round({_DOT.format(a='ea.ev', b='eb.ev')} / "
        f"(sqrt({_DOT.format(a='ea.ev', b='ea.ev')}) * "
        f"sqrt({_DOT.format(a='eb.ev', b='eb.ev')})), 6)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    k AS (SELECT vec_id, ev, {', '.join(keys)} FROM e),
    cand AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM k a JOIN k b ON a.vec_id < b.vec_id AND ({band_match})),
    scored AS (
        SELECT c.a_id, c.b_id, {cos} AS cos
        FROM cand c
        JOIN e ea ON ea.vec_id = c.a_id
        JOIN e eb ON eb.vec_id = c.b_id)
    SELECT a_id, b_id, cos FROM scored WHERE cos >= {threshold}
    """


@register("embedding_near_dup_pairs", oracle=_near_dup_pairs_oracle())
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-LSH (the
    embedding-space member of the dedup family, beside MinHash/SimHash/
    n-gram Jaccard): band-key equi-join candidates, exact-cosine verify at
    threshold — never all-pairs."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.signlsh_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4)


def _ann_contract(ann: DataFrame, exact: DataFrame, recall_bound: float) -> DataFrame:
    """Reduce an ANN result to a driver-hashable contract against its exact
    twin: per query, the exact top-k id-sum (SQL-reproducible — the exact
    ranking is the oracle-green ``embedding_cosine_topk`` plan) plus two
    corpus-wide BOOLEANs — recall(ANN vs exact) >= bound and no
    self-matches. FP centroid means / int8 rounding stay un-oracled; what
    the driver hashes is the exact twin's values and the published recall
    contract, which holds under any partitioning."""
    from pipelinewise_spark.caching import register_cache

    # the exact twin feeds three branches (per-query sums, the hit join,
    # the denominator) — persist it once; the session-wide release sweep
    # frees it between driver queries
    ex_pairs = register_cache(
        exact.select("query_id", "neighbor_id").persist()
    )
    per_q = ex_pairs.groupBy("query_id").agg(
        F.sum("neighbor_id").alias("exact_topk_id_sum")
    )
    joined = ann.select("query_id", "neighbor_id").join(
        ex_pairs.withColumn("__hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    flags = (
        joined.agg(
            F.sum(F.coalesce("__hit", F.lit(0))).alias("__hits"),
            F.max(
                (F.col("query_id") == F.col("neighbor_id")).cast("int")
            ).alias("__selfs"),
        )
        .crossJoin(ex_pairs.agg(F.count(F.lit(1)).alias("__n_exact")))
        .select(
            (
                F.col("__hits") >= F.lit(recall_bound) * F.col("__n_exact")
            ).alias("recall_ok"),
            (F.col("__selfs") == 0).alias("no_self_match"),
        )
    )
    return per_q.crossJoin(F.broadcast(flags))


_ANN_CONTRACT_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    s AS (SELECT query_id, neighbor_id,
                 round(list_sum(list_transform(range(1, 65),
                           i -> qv[i] * cv[i])) /
                       (sqrt(list_sum(list_transform(range(1, 65),
                           i -> qv[i] * qv[i]))) *
                        sqrt(list_sum(list_transform(range(1, 65),
                           i -> cv[i] * cv[i])))), 6) AS cos
          FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
    ranked AS (SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
               FROM s)
    SELECT query_id,
           CAST(SUM(neighbor_id) AS BIGINT) AS exact_topk_id_sum,
           TRUE AS recall_ok,
           TRUE AS no_self_match
    FROM ranked WHERE rank <= 3 GROUP BY query_id
"""


@register("embedding_ivf_topk", oracle=_ANN_CONTRACT_ORACLE)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means inverted lists, n_probe-list search.
    Driver contract via _ann_contract: exact-twin top-k id-sums (DuckDB
    reproduces the exact cosine ranking) + recall >= 0.5 and
    no-self-match BOOLEANs pinned TRUE by the oracle. Tight recall curve
    asserted in tests/test_llmdata.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ivf = S.ivf_topk(emb, queries, "vec_id", "embedding", k=3,
                     num_centroids=8, n_probe=4)
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    return _ann_contract(ivf, exact, recall_bound=0.5)


@register(
    "embedding_mean_pool_by_label",
    oracle="""
    WITH ex AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS x
        FROM embeddings)
    SELECT CAST(label AS INT) AS label, CAST(pos AS INT) AS pos,
           -- outer BIGINT cast: DuckDB returns SUM(BIGINT) as HUGEINT,
           -- which pandas renders as float64 and breaks the driver's
           -- value hash even when every value is exactly equal (r6 red)
           CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))
                AS BIGINT) AS sum_micro,
           COUNT(*) AS n
    FROM ex GROUP BY label, pos
    """,
)
def embedding_mean_pool_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector mean-pooling (similarity.py:mean_pool_vectors): chunk/passage
    embeddings pooled position-wise into one vector per group (here the
    label column stands in for a parent-document id). Shuffle cardinality
    is #groups × dim, never row count. The oracle checks the EXACT
    position-wise aggregation state — integer micro-unit sums and counts,
    no float division anywhere (engines disagree on decimal-quotient and
    double rounding at the last digit; sums cannot) — from which the mean
    follows; the double-mean operator output itself is unit-tested against
    these sums in tests/test_llmdata.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos", "__x")
    )
    # per-element micro-unit conversion: double multiply + half-away round
    # are the same IEEE ops in both engines (decimal casts of FLOAT are not)
    micro = F.round(F.col("__x").cast("double") * 1000000, 0).cast("long")
    return ex.groupBy("label", "pos").agg(
        F.sum(micro).alias("sum_micro"),
        F.count(F.lit(1)).alias("n"),
    )


@register("ivf_index_lifecycle_embeddings", oracle=_ANN_CONTRACT_ORACLE)
def ivf_index_lifecycle_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-IVF-index lifecycle (similarity.py:build_ivf_index /
    extend_ivf_index / ivf_topk_against_index): build the inverted lists
    on 2/3 of the corpus (lists = parquet partition dirs), EXTEND with the
    remaining third (assign-to-nearest-centroid append), then probe — the
    scan reads only the probed lists via partition pruning. Same driver
    contract as the in-plan IVF (_ann_contract): exact-twin top-k id-sums
    + recall >= 0.5 / no-self-match booleans. The embedding twin of
    lsh_index_lifecycle_documents."""
    import tempfile

    from pipelinewise_spark.queries.fixturetime import fixture_timer

    emb = read_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pws_ivfidx_") + "/idx"
    with fixture_timer():
        S.build_ivf_index(
            emb.filter(F.col("vec_id") % 3 != 0), path, "vec_id",
            "embedding", num_centroids=8,
        )
        S.extend_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), path,
                           "embedding")
        # full maintenance cycle (shared IndexLifecycle verbs): compact
        # the extend's fragments, vacuum the superseded list dirs —
        # probe results must be unchanged (checked by the contract below)
        S.compact_ivf_index(spark, path)
        S.vacuum_ivf_index(path)
        assert S.ivf_index_status(path)["extensions_since_compaction"] == 0
    queries = emb.filter(F.col("vec_id") < 10)
    ann = S.ivf_topk_against_index(
        spark, path, queries, "embedding", k=3, n_probe=4
    )
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    return _ann_contract(ann, exact, recall_bound=0.5)


@register("embedding_pq_topk", oracle=_ANN_CONTRACT_ORACLE)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.py:pq_topk — the FAISS IVFPQ
    recipe minus the coarse stage): 8 sub-codebooks x 16 codes trained by
    deterministic Lloyd (one Arrow-kernel job per iteration, all subspaces
    at once), corpus encoded to 8 small ints per vector (16-64x working-set
    compression — at 100 TB the PQ scan reads the code table, never the
    floats), ADC lookup-table scoring, exact cosine re-rank of the
    64-deep shortlist. Completes the ANN triad (IVF / int8 / PQ). Driver
    contract via _ann_contract: exact-twin top-k id-sums + recall >= 0.5
    and no-self-match booleans pinned TRUE by the oracle; measured recall
    ~0.8 (tests/test_pq.py bounds it)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    pq = S.pq_topk(emb, queries, "vec_id", "embedding", k=3,
                   num_subspaces=8, codes_per_subspace=16, refine=64)
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    return _ann_contract(pq, exact, recall_bound=0.5)


@register("embedding_quantized_topk", oracle=_ANN_CONTRACT_ORACLE)
def embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over int8-quantized embeddings (similarity.py:
    quantize_embeddings) — 1/4 the working set of the float path with the
    same plan shape. Int8 rounding at the quantization boundary isn't
    engine-portable, so the driver contract (_ann_contract) hashes the
    exact twin's top-k id-sums plus recall >= 0.8 / no-self-match
    BOOLEANs; cosine error and recall are bounded tightly in
    tests/test_quantized.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    quant = S.quantized_cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    return _ann_contract(quant, exact, recall_bound=0.8)


# -------------------------------------------------------------- multimodal
@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS media_type,
           sha256(text) AS content_hash,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media table: content hash + byte size computed JVM-side
    (media payload simulated from text bytes)."""
    d = read_table(spark, sf_dir, "documents")
    media = M.to_media_table(d, "doc_id", "text", media_type="image")
    return media.select("media_id", "media_type", "content_hash", "n_bytes")


@register(
    "multimodal_features_stub",
    oracle="""
    WITH b AS (
        SELECT doc_id AS media_id,
               strlen(text) AS n,
               ascii(substr(text, 1, 1)) AS b0,
               ascii(substr(text, CASE WHEN strlen(text) >= 2
                                       THEN 2 ELSE 1 END, 1)) AS b1,
               ascii(substr(text, LEAST(3, GREATEST(strlen(text), 1)), 1))
                   AS b2
        FROM documents)
    SELECT media_id, 'image' AS media_type, CAST(n AS BIGINT) AS n_bytes,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE 16 + (b0 % 64) * 16 END AS INTEGER) AS width,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE 16 + (b1 % 64) * 16 END AS INTEGER) AS height,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE 1 + (b2 % 8) END AS INTEGER) AS n_frames
    FROM b
    """,
)
def multimodal_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode plumbing with deterministic stub
    decoder (real codecs not in this environment). The stub derives pseudo
    width/height/frame-count from the first three payload bytes
    (multimodal.py:_fake_decode), which IS SQL-reproducible, so the whole
    mapInPandas pipeline — schema, batching, byte handling — is
    value-oracle-checked rather than rows-only. (ascii()/strlen() agree
    with byte indexing because the documents corpus is ASCII, which the
    oracle-green multimodal_resize_images sha256 check already pins.)"""
    d = read_table(spark, sf_dir, "documents")
    media = M.to_media_table(d, "doc_id", "text", media_type="image")
    return M.extract_features(media, decode_stub=True)


@register(
    "multimodal_resize_images",
    oracle="""
    SELECT doc_id AS media_id,
           sha256(substr(text, 1, 512)) AS content_hash,
           CAST(least(strlen(text), 512) AS BIGINT) AS n_bytes,
           CAST(64 AS INTEGER) AS width,
           CAST(64 AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize pipeline stage (decode → resize → re-encode) as
    Arrow-batched mapInPandas; deterministic stub re-encode makes the whole
    1→1 transform value-oracle-checkable while keeping the Spark plumbing
    (schema, batching, hash/size recompute) real."""
    d = read_table(spark, sf_dir, "documents")
    media = M.to_media_table(d, "doc_id", "text", media_type="image")
    out = M.resize_media(media, target_w=64, target_h=64)
    return out.select("media_id", "content_hash", "n_bytes", "width", "height")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, text,
               1 + ascii(substr(text, 3, 1)) % 8 AS n_frames
        FROM documents),
    f AS (SELECT media_id, text,
                 unnest(range(0, n_frames, 2)) AS fi
          FROM m)
    SELECT media_id,
           CAST(fi AS INTEGER) AS frame_index,
           CAST(fi * 40 AS BIGINT) AS ts_ms,
           sha256(text || '-' || CAST(fi AS VARCHAR)) AS frame_hash
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 1→N row expansion through Arrow mapInPandas
    (every 2nd frame at 25 fps), deterministic stub frame hashes — the
    row-multiplying decode path a video training pipeline needs."""
    d = read_table(spark, sf_dir, "documents")
    media = M.to_media_table(d, "doc_id", "text", media_type="video")
    return M.sample_frames(media, every_n=2, fps=25)


# ---------------------------------------------------------------- curation
_SQL_QUALITY = f"""least(CAST(len({_TOKS}) AS DOUBLE), 100.0) / 100.0 * 0.5
             + CAST(len(regexp_extract_all(lower(text),
                        '{TX.STOPWORD_PATTERN}')) AS DOUBLE)
               / CAST(len({_TOKS}) AS DOUBLE) * 0.3
             + least(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                          AS DOUBLE)
                     / CAST(len({_TOKS}) AS DOUBLE), 10.0) / 10.0 * 0.2"""


@register(
    "stratified_sample_documents",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)
          < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
    """,
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-class downsampling (keep 50% of en, 20% of the
    rest) via the md5 key hash — the training-mix sampler that re-selects
    identical rows on every run of a 100 TB job. No shuffle."""
    from pipelinewise_spark.functions.curation import stratified_sample

    d = read_table(spark, sf_dir, "documents")
    out = stratified_sample(
        d, key_col="doc_id", stratum_col="lang",
        rates={"en": 50}, default_rate=20,
    )
    return out.select("doc_id", "lang")


@register(
    "quality_filter_documents",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, lang, {_SQL_QUALITY} AS quality
        FROM documents),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY quality DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM q)
    SELECT doc_id, lang, quality FROM r WHERE rn <= FLOOR(n * 0.5)
    """,
)
def quality_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filtering as a rank cutoff: keep the top half of each
    language by quality score (ties on doc_id). Exact and deterministic
    where a float percentile threshold would flip rows between engines."""
    from pipelinewise_spark.functions.curation import top_fraction_by

    d = read_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", TX.quality_score(F.col("text")).alias("quality")
    )
    return top_fraction_by(
        scored, stratum_col="lang", order_col="quality",
        key_col="doc_id", fraction=0.5,
    )


@register(
    "shard_documents_by_tokens",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents)
    SELECT doc_id, n_tokens,
           CAST(FLOOR((sum(n_tokens) OVER (ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING)
                       - n_tokens) / 2000.0) AS BIGINT) AS shard
    FROM t
    """,
)
def shard_documents_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding for training (each shard ~2000 tokens, rows in
    key order) via the two-phase distributed prefix sum — range partitions
    compute running sums in parallel; only #partitions offset rows reach
    the driver."""
    from pipelinewise_spark.functions.curation import shard_by_token_budget

    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    out = shard_by_token_budget(
        t, key_col="doc_id", tokens_col="n_tokens", budget=2000
    )
    return out.select("doc_id", "n_tokens", "shard")


@register(
    "pack_sequences_documents",
    oracle=f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents),
    s AS (
        SELECT doc_id, n_tokens,
               CAST(FLOOR((sum(n_tokens) OVER (ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / 2000.0) AS BIGINT) AS shard
        FROM t),
    d AS (
        SELECT s.*, row_number() OVER (
            PARTITION BY shard ORDER BY doc_id) AS rn
        FROM s),
    pack(shard, rn, doc_id, n_tokens, example, acc) AS (
        SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
               CASE WHEN p.acc + d.n_tokens > 512
                    THEN p.example + 1 ELSE p.example END,
               CASE WHEN p.acc + d.n_tokens > 512
                    THEN d.n_tokens ELSE p.acc + d.n_tokens END
        FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
    SELECT doc_id, n_tokens, shard, example FROM pack
    """,
)
def pack_sequences_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into <=512-token training examples
    (functions/curation.py:pack_sequences): hierarchical — the distributed
    prefix sum cuts ~2000-token shards in parallel, then every shard packs
    independently inside one Arrow batch; thousands of shards pack
    concurrently and no global scan serializes. The oracle replays the
    greedy recurrence exactly with a recursive CTE (one recursion step per
    row position within a shard)."""
    from pipelinewise_spark.functions.curation import pack_sequences

    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", TX.token_count(F.col("text")).alias("n_tokens"))
    out = pack_sequences(
        t, key_col="doc_id", tokens_col="n_tokens",
        max_tokens=512, shard_budget=2000,
    )
    return out.select("doc_id", "n_tokens", "shard", "example")


@register(
    "gopher_quality_documents",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, text, toks,
               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   AS grams
        FROM tok),
    s AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               round(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
                     / len(toks), 6) AS mean_word_len,
               round(CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE)
                     / len(toks), 6) AS symbol_ratio,
               round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                          AS DOUBLE) / len(toks), 6) AS alpha_frac,
               round(CASE WHEN len(grams) > 0
                          THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                               / len(grams)
                          ELSE 0.0 END, 6) AS dup_3gram_frac
        FROM g)
    SELECT *,
           (n_words BETWEEN 50 AND 100000)
           AND (mean_word_len BETWEEN 3.0 AND 10.0)
           AND (symbol_ratio < 0.1)
           AND (alpha_frac > 0.8)
           AND (dup_3gram_frac < 0.3) AS keep
    FROM s
    """,
)
def gopher_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule corpus filtering signals + composite keep decision
    (functions/text.py:gopher_stats) — the published heuristics a web-scale
    training pipeline applies before anything expensive runs. Pure
    projections over one materialized token array; no shuffle."""
    d = read_table(spark, sf_dir, "documents").withColumn(
        "__toks", TX.tokens(F.col("text"))
    )
    stats = TX.gopher_stats(F.col("text"), toks=F.col("__toks"))
    return d.select(
        "doc_id",
        *[c.alias(name) for name, c in stats.items()],
    ).withColumn(
        "keep",
        (F.col("n_words").between(50, 100_000))
        & (F.col("mean_word_len").between(3.0, 10.0))
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_frac") > 0.8)
        & (F.col("dup_3gram_frac") < 0.3),
    )


@register(
    "pii_scrub_documents",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               text || ' contact: user' || doc_id ||
               '@example.com from 10.0.' || (doc_id % 256) || '.7 tel +1 555 '
               || (1000000 + doc_id) AS raw
        FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw,
                 '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+',
                 '<EMAIL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
             '\\+?\\d[\\d -]{7,}\\d', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(raw,
               '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+')) AS BIGINT)
               AS email_count,
           CAST(len(regexp_extract_all(raw,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
               AS ip_count,
           CAST(len(regexp_extract_all(raw, '\\+?\\d[\\d -]{7,}\\d')) AS BIGINT)
               AS phone_count
    FROM t
    """,
)
def pii_scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text PII scrubbing (emails/IPs/phones → token placeholders) with
    per-rule audit counts — pure regexp_replace chain, no shuffle. The test
    corpus gets deterministic synthetic PII appended so the rules actually
    fire (the raw-text construction is part of the oracle)."""
    from pipelinewise_spark.functions.pii import pii_counts, scrub_pii

    d = read_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"), F.lit(" contact: user"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".7 tel +1 555 "),
        (F.col("doc_id") + 1_000_000).cast("string"),
    )
    d = d.withColumn("__raw", raw)
    counts = pii_counts(F.col("__raw"))
    return d.select(
        "doc_id",
        scrub_pii(F.col("__raw")).alias("scrubbed"),
        *[c.alias(name) for name, c in counts.items()],
    )


@register(
    "decontaminate_documents",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3])) AS grams
        FROM tok WHERE len(toks) >= 4),
    bench AS (
        SELECT doc_id AS bench_id, unnest(grams) AS gram
        FROM sh WHERE doc_id % 50 = 0),
    train AS (
        SELECT doc_id, unnest(grams) AS gram
        FROM sh WHERE doc_id % 50 <> 0)
    SELECT DISTINCT t.doc_id AS contaminated_doc_id
    FROM train t JOIN bench b ON t.gram = b.gram
    """,
)
def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: flag training documents sharing any
    4-gram with a benchmark set (here: every 50th document). The scalable
    shape is shingle-explode + SEMI join on the gram (the benchmark side is
    tiny and broadcasts; candidates never materialize a cross product) —
    the n-gram-collision protocol used for public benchmark decontamination."""
    ev = read_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    sh = (
        ev.withColumn("__toks", toks)
        .filter(F.size("__toks") >= 4)
        .withColumn(
            "gram",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("__toks") - 3),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(F.col("__toks"), i),
                            F.element_at(F.col("__toks"), i + 1),
                            F.element_at(F.col("__toks"), i + 2),
                            F.element_at(F.col("__toks"), i + 3),
                        ),
                    )
                )
            ),
        )
        .select("doc_id", "gram")
    )
    bench = sh.filter(F.col("doc_id") % 50 == 0).select("gram")
    train = sh.filter(F.col("doc_id") % 50 != 0)
    return (
        train.join(F.broadcast(bench), "gram", "left_semi")
        .select(F.col("doc_id").alias("contaminated_doc_id"))
        .distinct()
    )


@register(
    "weighted_sample_documents",
    oracle=f"""
    WITH u AS (
        SELECT doc_id, lang, n_chars,
               ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % {2**31 - 1}) + 1.0) / {float(2**31)} AS uval
        FROM documents),
    s AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ln(uval) / CAST(n_chars AS DOUBLE) DESC,
                            doc_id) AS rn
        FROM u)
    SELECT doc_id, lang, n_chars FROM s WHERE rn <= 20
    """,
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, md5-derived uniforms): 20 docs per language, selection
    probability proportional to n_chars, identical rows on every rerun."""
    from pipelinewise_spark.functions.curation import weighted_sample_top_n

    d = read_table(spark, sf_dir, "documents")
    out = weighted_sample_top_n(
        d, key_col="doc_id", weight_col="n_chars", n=20, stratum_col="lang"
    )
    return out.select("doc_id", "lang", "n_chars")


@register(
    "boilerplate_strip_documents",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               'home | news | about ' || source || chr(10) ||
               'subscribe to our newsletter' || chr(10) ||
               'ref ' || md5(CAST(doc_id AS VARCHAR)) || chr(10) ||
               text || chr(10) ||
               'copyright 2026 ' || source || ' all rights reserved' AS raw
        FROM documents),
    parts AS (SELECT doc_id, string_split(raw, chr(10)) AS parts FROM raw),
    lines AS (
        SELECT doc_id,
               unnest(range(1, len(parts) + 1)) AS pos,
               unnest(parts) AS line
        FROM parts),
    normed AS (
        SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM lines),
    boiler AS (
        SELECT norm FROM normed WHERE norm <> ''
        GROUP BY norm HAVING count(DISTINCT doc_id) >= 3),
    marked AS (
        SELECT n.doc_id, n.pos, n.line, (b.norm IS NOT NULL) AS is_b
        FROM normed n LEFT JOIN boiler b ON n.norm = b.norm)
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE NOT is_b), '') AS cleaned,
           CAST(sum(CASE WHEN is_b THEN 0 ELSE 1 END) AS BIGINT)
               AS n_lines_kept,
           CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lines_removed
    FROM marked GROUP BY doc_id
    """,
)
def boilerplate_strip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate stripping (functions/curation.py:
    strip_boilerplate): documents get deterministic per-source web chrome
    (header / global nav / footer) plus a unique ref line; any line present
    in >= 3 distinct docs is removed corpus-wide, CCNet-style. The chrome
    construction is part of the oracle so the rule demonstrably fires:
    header+nav+footer vanish, the ref line and body survive."""
    from pipelinewise_spark.functions.curation import strip_boilerplate
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    raw = F.concat_ws(
        "\n",
        F.concat(F.lit("home | news | about "), F.col("source")),
        F.lit("subscribe to our newsletter"),
        F.concat(F.lit("ref "), F.md5(F.col("doc_id").cast("string"))),
        F.col("text"),
        F.concat(
            F.lit("copyright 2026 "), F.col("source"),
            F.lit(" all rights reserved"),
        ),
    )
    return strip_boilerplate(
        d.select("doc_id", raw.alias("__raw")), "doc_id", "__raw", min_docs=3
    )


@register(
    "intra_doc_line_dedup_documents",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               'promo: subscribe today' || chr(10) ||
               text || chr(10) ||
               'promo: subscribe today' || chr(10) ||
               'unique ' || md5(CAST(doc_id AS VARCHAR)) || chr(10) ||
               text AS raw
        FROM documents),
    parts AS (SELECT doc_id, string_split(raw, chr(10)) AS parts FROM raw),
    lines AS (
        SELECT doc_id,
               unnest(range(1, len(parts) + 1)) AS pos,
               unnest(parts) AS line
        FROM parts),
    marked AS (
        SELECT doc_id, pos, line,
               row_number() OVER (PARTITION BY doc_id, lower(trim(line))
                                  ORDER BY pos) AS rn
        FROM lines)
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE rn = 1), '') AS cleaned,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lines_kept,
           CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_lines_removed
    FROM marked GROUP BY doc_id
    """,
)
def intra_doc_line_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition removal (functions/curation.py:
    dedupe_lines_within_doc): each doc gets a repeated promo line and its own
    body duplicated (the construction is part of the oracle so the rule
    demonstrably fires); only the first occurrence of each normalized line
    survives, order preserved."""
    from pipelinewise_spark.functions.curation import dedupe_lines_within_doc
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    raw = F.concat_ws(
        "\n",
        F.lit("promo: subscribe today"),
        F.col("text"),
        F.lit("promo: subscribe today"),
        F.concat(F.lit("unique "), F.md5(F.col("doc_id").cast("string"))),
        F.col("text"),
    )
    return dedupe_lines_within_doc(
        d.select("doc_id", raw.alias("__raw")), "doc_id", "__raw"
    )


@register(
    "chunk_documents_token_windows",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
        SELECT doc_id, toks, len(toks) AS n,
               unnest(range(1, len(toks) + 1, 48)) AS s
        FROM tok WHERE len(toks) > 0)
    SELECT doc_id,
           CAST((s - 1) // 48 AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           array_to_string(list_slice(toks, s, least(s + 63, n)), ' ')
               AS chunk_text,
           CAST(least(s + 63, n) - s + 1 AS BIGINT) AS n_tokens
    FROM c
    """,
)
def chunk_documents_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (functions/curation.py:
    chunk_by_tokens): 64-token context windows every 48 tokens, final
    partial window kept — the standard long-document → training-sample
    split. Narrow sequence/posexplode/slice plan, zero shuffles."""
    from pipelinewise_spark.functions.curation import chunk_by_tokens
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents")).withColumn(
        "__toks", TX.tokens(F.col("text"))
    )
    return chunk_by_tokens(d, "doc_id", "__toks", window=64, stride=48)


@register(
    "curation_pipeline_documents",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, text, toks,
               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   AS grams
        FROM tok),
    kept AS (
        SELECT doc_id, text
        FROM g
        WHERE (len(toks) BETWEEN 50 AND 100000)
          AND (list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
               / len(toks) BETWEEN 3.0 AND 10.0)
          AND (CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE)
               / len(toks) < 0.1)
          AND (CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                    AS DOUBLE) / len(toks) > 0.8)
          AND (CASE WHEN len(grams) > 0
                    THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                         / len(grams)
                    ELSE 0.0 END < 0.3)),
    scrubbed AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+',
                     '<EMAIL>', 'g'),
                   '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
                   '<IP>', 'g'),
                 '\\+?\\d[\\d -]{{7,}}\\d', '<PHONE>', 'g') AS clean
        FROM kept),
    fp AS (
        SELECT doc_id, clean,
               md5(array_to_string(list_sort(list_distinct(
                   regexp_split_to_array(lower(trim(clean)), '\\s+'))), ' '))
                   AS fingerprint
        FROM scrubbed),
    survivors AS (
        SELECT fingerprint, min(doc_id) AS doc_id FROM fp GROUP BY 1),
    surv_tok AS (
        SELECT s.doc_id, s.fingerprint,
               CAST(len(regexp_split_to_array(lower(trim(f.clean)), '\\s+'))
                    AS BIGINT) AS n_tokens
        FROM survivors s JOIN fp f ON f.doc_id = s.doc_id)
    SELECT doc_id, fingerprint, n_tokens,
           CAST(FLOOR((sum(n_tokens) OVER (ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING)
                       - n_tokens) / 2000.0) AS BIGINT) AS shard
    FROM surv_tok
    """,
)
def curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus curation dataflow, composed from the
    engine's operators: Gopher-rule filter → PII scrub → exact dedup
    (min-doc_id survivor per fingerprint) → token-budget sharding.
    One declarative plan — Catalyst pipelines the projections, and the
    only shuffles are the dedup groupBy and the prefix-sum range
    partitioning. The oracle recomputes the whole chain in SQL."""
    from pipelinewise_spark.functions.curation import shard_by_token_budget
    from pipelinewise_spark.functions.pii import scrub_pii
    from pipelinewise_spark.partitioning import spread

    # single-file parquet = one split: spread BEFORE the regex/lambda-heavy
    # projections or the whole chain runs on one core
    d = spread(read_table(spark, sf_dir, "documents")).withColumn(
        "__toks", TX.tokens(F.col("text"))
    )
    stats = TX.gopher_stats(F.col("text"), toks=F.col("__toks"))
    # evaluate the signals as a PROJECTION, then cut lineage before
    # filtering: a pushable filter would collapse into the scan and
    # re-evaluate the higher-order gram expressions outside codegen's
    # subexpression elimination (measured 40x slower than projecting)
    scored = d.select(
        "doc_id", "text", *[c.alias(k) for k, c in stats.items()]
    ).localCheckpoint(eager=False)
    kept = scored.filter(
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_frac") > 0.8)
        & (F.col("dup_3gram_frac") < 0.3)
    ).select("doc_id", "text")
    clean = kept.withColumn("__clean", scrub_pii(F.col("text")))
    fp = clean.select(
        "doc_id",
        F.col("__clean").alias("clean"),
        TX.fingerprint(F.col("__clean")).alias("fingerprint"),
    )
    # three consumers (dedup agg, survivor join, shard prefix-sum) would
    # each recompute the expensive chain — truncate the lineage once
    fp = fp.localCheckpoint(eager=False)
    survivors = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    surv = survivors.join(fp.select("doc_id", "clean"), "doc_id").select(
        "doc_id", "fingerprint",
        TX.token_count(F.col("clean")).alias("n_tokens"),
    )
    out = shard_by_token_budget(
        surv, key_col="doc_id", tokens_col="n_tokens", budget=2000
    )
    return out.select("doc_id", "fingerprint", "n_tokens", "shard")


@register(
    "bm25_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dlen, toks FROM d),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dlen) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, dlen, unnest(toks) AS term FROM dl),
    tfq AS (
        SELECT doc_id, dlen, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tf WHERE term IN ('data', 'pipeline', 'spark')
        GROUP BY 1, 2, 3),
    dfreq AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tfq GROUP BY 1)
    SELECT t.doc_id,
           round(sum(
               ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dlen / s.avgdl))
           ), 6) AS score
    FROM tfq t JOIN dfreq f USING (term) CROSS JOIN stats s
    GROUP BY 1
    """,
)
def bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scores for a fixed query over the corpus
    (functions/retrieval.py): one corpus scan, query-term document
    frequencies broadcast — retrieval-style quality scoring for curation
    and eval-set mining."""
    from pipelinewise_spark.functions.retrieval import bm25_scores

    d = read_table(spark, sf_dir, "documents")
    return bm25_scores(
        d, "doc_id", "text", query_terms=["data", "pipeline", "spark"]
    )


@register(
    "frequent_tokens_documents",
    oracle=f"""
    WITH t AS (
        SELECT unnest({_TOKS}) AS token FROM documents),
    tot AS (SELECT count(*) AS total FROM t)
    SELECT token, count(*) AS n
    FROM t GROUP BY token
    HAVING count(*) >= 0.002 * (SELECT total FROM tot)
    """,
)
def frequent_tokens_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy-hitter tokens (>= 0.2 % of the corpus) without shuffling
    the vocabulary long tail (operators/sketches.py:frequent_items): local
    per-partition candidate counts with a pigeonhole recall guarantee, then
    an exact broadcast-semi-join verify — shuffle volume proportional to
    the ANSWER, not the token space. The oracle is the direct full groupBy
    with the same threshold."""
    from pipelinewise_spark.functions.text import tokens
    from pipelinewise_spark.operators.sketches import frequent_items

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    return frequent_items(toks, "token", min_fraction=0.002)


@register(
    "edit_distance_pairs_documents",
    oracle="""
    WITH k AS (
        SELECT doc_id,
               substr(lower(trim(text)), 1, 40) AS head,
               substr(lower(trim(text)), 1, 8) AS block
        FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
    FROM k a JOIN k b
      ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 5
    """,
)
def edit_distance_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs for SHORT strings (titles, URLs,
    leading snippets) — the dedup family MinHash handles poorly (tiny
    shingle sets). Prefix BLOCKING keys the self-join (docs sharing an
    8-char normalized prefix), so levenshtein — O(len²) per comparison —
    only runs inside blocks, never all-pairs; the blocked join is the same
    scale shape as the banded-LSH candidate join. levenshtein is JVM-side
    in Spark and native in DuckDB: the oracle is the identical
    computation."""
    d = read_table(spark, sf_dir, "documents")
    k = d.select(
        "doc_id",
        F.substring(F.lower(F.trim(F.col("text"))), 1, 40).alias("head"),
        F.substring(F.lower(F.trim(F.col("text"))), 1, 8).alias("block"),
    )
    a, b = k.alias("a"), k.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("a.head"), F.col("b.head")).cast("bigint"),
        )
        .filter(F.col("dist") <= 5)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            "dist",
        )
    )


@register(
    "term_frequencies_documents",
    oracle=f"""
    WITH t AS (
        SELECT unnest({_TOKS}) AS term FROM documents),
    c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1)
    SELECT term, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
    FROM c
    """,
)
def term_frequencies_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics (term → frequency → Zipf rank) — the
    input a tokenizer/vocab-building step consumes. One explode + one
    groupBy; the rank window runs on the (tiny) vocabulary, not the corpus."""
    from pyspark.sql import Window

    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    counts = (
        d.select(F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("term"))
    return counts.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    )


def _bpe_recursive_sql(num_merges: int) -> str:
    """DuckDB twin of functions/bpe.py's greedy merge loop as ONE recursive
    CTE: the (word, syms, freq) vocabulary rides along as a single-row list
    state; each recursion step picks the max-count pair (lexicographic
    tie-break, same as Spark) via a LATERAL argmax over the flattened pair
    structs, then rewrites every word's symbols with the same left-fold the
    Spark side uses (F.aggregate ≡ list_reduce). Exact — not a bound
    contract: the driver hash-compares the full merge table."""
    return rf"""
    WITH RECURSIVE wf AS (
      SELECT word, COUNT(*)::BIGINT AS freq,
             string_split(word,'') || ['</w>'] AS syms
      FROM (SELECT unnest({_TOKS}) AS word FROM documents)
      GROUP BY word
    ),
    bpe AS (
      SELECT 0 AS rank, CAST(NULL AS VARCHAR) AS pair,
             CAST(NULL AS BIGINT) AS n,
             (SELECT list(struct_pack(word := word, syms := syms,
                                      freq := freq)) FROM wf) AS state
      UNION ALL
      SELECT rank+1, bst.pair, bst.n,
             list_transform(state, w -> struct_pack(
                word := w.word,
                syms := list_reduce(
                    [CAST([] AS VARCHAR[])] || list_transform(w.syms, s -> [s]),
                    (acc, x) -> CASE WHEN len(acc) > 0
                                      AND acc[-1] = split_part(bst.pair,' ',1)
                                      AND x[1] = split_part(bst.pair,' ',2)
                                 THEN acc[1:-2] || [split_part(bst.pair,' ',1)
                                                    || split_part(bst.pair,' ',2)]
                                 ELSE acc || x END),
                freq := w.freq)) AS state
      FROM bpe,
      LATERAL (
         SELECT q.pf.p AS pair, SUM(q.pf.f)::BIGINT AS n
         FROM (SELECT unnest(flatten(list_transform(bpe.state, w ->
                 list_transform(range(1, len(w.syms)),
                                i -> struct_pack(p := w.syms[i] || ' ' || w.syms[i+1],
                                                 f := w.freq))
               ))) AS pf) q
         GROUP BY q.pf.p ORDER BY n DESC, q.pf.p LIMIT 1
      ) bst
      WHERE rank < {num_merges}
    )
    """


@register(
    "bpe_merges_documents",
    oracle=_bpe_recursive_sql(10)
    + """
    SELECT rank::BIGINT AS rank,
           split_part(pair,' ',1) AS left,
           split_part(pair,' ',2) AS right,
           n AS count
    FROM bpe WHERE rank >= 1
    """,
)
def bpe_merges_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary training (functions/bpe.py): 10 merges
    learned from the corpus — map-reduce pair counting over the Zipf-small
    word-frequency table, greedy merge loop with lexicographic tie-break.
    Value-exact oracle: DuckDB replays the identical greedy loop as a
    recursive CTE (_bpe_recursive_sql)."""
    from pipelinewise_spark.functions.bpe import bpe_train_df

    d = read_table(spark, sf_dir, "documents")
    return bpe_train_df(spark, d, "text", num_merges=10)


@register(
    "bpe_encode_documents",
    oracle=_bpe_recursive_sql(8)
    + """
    , enc AS (
      SELECT q.w.word AS word, len(q.w.syms)::BIGINT AS n_syms
      FROM (SELECT unnest((SELECT state FROM bpe WHERE rank = 8)) AS w) q
    )
    SELECT d.doc_id,
           COUNT(*)::BIGINT AS n_words,
           CAST(SUM(e.n_syms) AS BIGINT) AS n_subwords
    FROM (SELECT doc_id, unnest({_TOKS}) AS word FROM documents) d
    JOIN enc e USING (word)
    GROUP BY d.doc_id
    """.format(_TOKS=_TOKS),
)
def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE (functions/bpe.py:bpe_encode_counts): train 8 merges,
    then compute per-document subword counts under that vocabulary. The
    encode rewrites only the distinct-word vocab (Zipf-small) and
    broadcasts it back onto corpus tokens — the scale contract for
    tokenizing 100 TB with a fixed vocab."""
    from pipelinewise_spark.functions.bpe import bpe_encode_counts, bpe_train

    d = read_table(spark, sf_dir, "documents")
    merges = bpe_train(d, "text", num_merges=8)
    return bpe_encode_counts(d, "doc_id", "text", merges)


@register(
    "ngram_lm_score_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    v AS (SELECT token, CAST(count(*) AS DOUBLE) AS c FROM t GROUP BY token),
    s AS (SELECT sum(c) AS n, CAST(count(*) AS DOUBLE) AS vs FROM v),
    p AS (SELECT token, ln((c + 1.0) / (n + vs)) AS log_p FROM v, s),
    h AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(CAST(ROUND(-avg(log_p), 6) AS DECIMAL(18,6)) AS DOUBLE)
                   AS cross_entropy
        FROM t JOIN p USING (token) GROUP BY doc_id)
    SELECT doc_id, n_tokens, cross_entropy,
           cross_entropy <= 8.0 AS is_fluent
    FROM h
    """,
)
def ngram_lm_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality filter (functions/lm.py): add-1 unigram LM
    trained on the corpus, every document scored by cross-entropy under it
    — the perplexity-band filter CCNet/Gopher pipelines cut on (here
    self-trained; at scale the LM trains once on a clean reference corpus
    and persists). LM is broadcast both ways; the fluency flag compares the
    ROUNDED score so the boolean is reproducible."""
    from pipelinewise_spark.functions.lm import (
        train_unigram_lm,
        unigram_cross_entropy,
    )
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    lm = train_unigram_lm(d, "text")
    scored = unigram_cross_entropy(d, lm, "doc_id", "text")
    return scored.select(
        "doc_id", "n_tokens", "cross_entropy",
        (F.col("cross_entropy") <= 8.0).alias("is_fluent"),
    )


@register(
    "hybrid_retrieval_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dlen, toks FROM d),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dlen) AS avgdl FROM dl),
    tf AS (SELECT doc_id, dlen, unnest(toks) AS term FROM dl),
    tfq AS (
        SELECT doc_id, dlen, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tf WHERE term IN ('data', 'pipeline', 'spark')
        GROUP BY 1, 2, 3),
    dfreq AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tfq GROUP BY 1),
    bm AS (
        SELECT t.doc_id,
               round(sum(
                   ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dlen / s.avgdl))
               ), 6) AS bm25
        FROM tfq t JOIN dfreq f USING (term) CROSS JOIN stats s
        GROUP BY 1),
    qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    ce AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sc AS (
        SELECT bm.doc_id, bm.bm25,
               round({_DOT.format(a='ce.v', b='qv.q')} /
                     (sqrt({_DOT.format(a='ce.v', b='ce.v')}) *
                      sqrt({_DOT.format(a='qv.q', b='qv.q')})), 6) AS cos
        FROM bm JOIN ce ON ce.vec_id = bm.doc_id CROSS JOIN qv),
    mx AS (SELECT max(bm25) AS m FROM bm),
    h AS (
        SELECT doc_id, bm25, cos,
               round(0.5 * bm25 / mx.m + 0.5 * cos, 6) AS hybrid
        FROM sc CROSS JOIN mx)
    SELECT doc_id, bm25, cos, hybrid,
           CAST(row_number() OVER (ORDER BY hybrid DESC, doc_id) AS BIGINT)
               AS rank
    FROM h
    QUALIFY rank <= 10
    """,
)
def hybrid_retrieval_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid search (functions/retrieval.py:hybrid_rerank):
    BM25 lexical candidates for a fixed term query, reranked by embedding
    cosine to a fixed query vector (vec_id 0 — embeddings map 1:1 to
    doc_id), blended 50/50 after max-normalizing the lexical score. The
    dense stage touches only the candidate set; the rank window runs on
    candidates, never the corpus."""
    from pipelinewise_spark.functions.retrieval import bm25_scores, hybrid_rerank

    d = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    bm = bm25_scores(d, "doc_id", "text", query_terms=["data", "pipeline", "spark"])
    return hybrid_rerank(bm, emb, query_vec_id=0)


@register(
    "bigram_lm_score_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (
        SELECT doc_id,
               CASE WHEN len(toks) > 1
                    THEN list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])
                    ELSE [] END AS bigs
        FROM d),
    bg AS (SELECT doc_id, unnest(bigs) AS bigram FROM b),
    c2 AS (SELECT bigram, CAST(count(*) AS DOUBLE) AS c2 FROM bg GROUP BY 1),
    c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c2) AS c1
           FROM c2 GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
          FROM (SELECT unnest(toks) AS tok FROM d)),
    p AS (
        SELECT bigram, ln((c2.c2 + 1.0) / (c1.c1 + v.v)) AS log_p
        FROM c2 JOIN c1 ON split_part(c2.bigram, ' ', 1) = c1.w1
        CROSS JOIN v)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(ROUND(-avg(log_p), 6) AS DECIMAL(18,6)) AS DOUBLE)
               AS cross_entropy2
    FROM bg JOIN p USING (bigram)
    GROUP BY doc_id
    """,
)
def bigram_lm_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 LM fluency scoring (functions/lm.py:train_bigram_lm): add-1
    smoothed bigram conditionals p(w2|w1) trained on the corpus, per-doc
    cross-entropy under them — catches shuffled/boilerplate text that
    unigram frequencies alone cannot (word SEQUENCE matters). Count tables
    are Zipf-small and broadcast; two corpus scans total (train + score)."""
    from pipelinewise_spark.functions.lm import (
        bigram_cross_entropy,
        train_bigram_lm,
    )
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    lm = train_bigram_lm(d, "text")
    return bigram_cross_entropy(d, lm, "doc_id", "text")


@register(
    "repeated_ngram_coverage_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    w AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 8
                    THEN list_transform(range(1, len(toks) - 6),
                         i -> array_to_string(toks[i:i+7], ' '))
                    ELSE [] END AS wins
        FROM d),
    win AS (SELECT doc_id, unnest(wins) AS win FROM w),
    dup AS (
        SELECT win FROM win GROUP BY win
        HAVING count(DISTINCT doc_id) > 1)
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(*) FILTER (WHERE d.win IS NOT NULL) AS BIGINT)
               AS dup_windows,
           CAST(CAST(ROUND(
               count(*) FILTER (WHERE d.win IS NOT NULL)
               / CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS DOUBLE)
               AS dup_fraction
    FROM win w LEFT JOIN dup d USING (win)
    GROUP BY w.doc_id
    """,
)
def repeated_ngram_coverage_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring signal (the exact-substring dedup
    statistic of Lee et al., 'Deduplicating Training Data Makes Language
    Models Better'): per document, the fraction of its 8-token sliding
    windows that also appear verbatim in ANOTHER document — high coverage
    = boilerplate/mirror content. One window explode + one groupBy on the
    window key (the same asymptotics the paper pays in its suffix-array
    sort, here as a shuffle) + a semi-join back; docs shorter than the
    window report zero windows and drop out, same as the oracle."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.col("doc_id"), TX.tokens(F.col("text")).alias("__t"))
    wins = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.expr("size(__t)") >= 8,
                F.expr(
                    "transform(sequence(1, size(__t) - 7), "
                    "i -> array_join(slice(__t, i, 8), ' '))"
                ),
            ).otherwise(F.expr("array()").cast("array<string>"))
        ).alias("win"),
    )
    dup = (
        wins.groupBy("win")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") > 1)
        .select("win", F.lit(True).alias("__dup"))
    )
    return (
        wins.join(dup, "win", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count(F.col("__dup")).alias("dup_windows"),
            F.round(
                F.count(F.col("__dup")) / F.count("*").cast("double"), 6
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("dup_fraction"),
        )
    )


@register(
    "incremental_lm_update_documents",
    oracle=f"""
    WITH live AS (
        SELECT * FROM documents
        WHERE NOT (doc_id % 7 = 0 AND doc_id % 5 <> 0)),
    t AS (SELECT unnest({_TOKS}) AS token FROM live)
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM t GROUP BY token
    """,
)
def incremental_lm_update_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained LM vocabulary (functions/lm.py counts ×
    operators/incremental_agg.py delta rule): the T0 vocab is built from
    the base corpus (doc_id % 5 != 0); then one change batch INSERTS the
    new docs (doc_id % 5 == 0) and DELETES the retired ones (doc_id % 7 ==
    0), and the count table folds forward from the token change feed alone
    — never re-reading the base corpus. Tokens whose count reaches zero
    leave the vocab, exactly as a retrain would produce. At 100 TB this is
    how a standing tokenizer/LM vocab tracks a growing corpus: per-ingest
    cost ∝ batch tokens, not corpus tokens."""
    from pipelinewise_spark.operators.incremental_agg import (
        apply_change_feed,
        build_aggregate,
    )

    d = read_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 5 != 0)
    t0 = build_aggregate(
        base.select(F.explode(TX.tokens(F.col("text"))).alias("token")),
        ["token"], {}, count_col="freq",
    )
    inserts = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .select(
            F.lit("i").alias("op"),
            F.lit(None).cast("string").alias("old_token"),
            F.col("token").alias("new_token"),
        )
    )
    deletes = (
        base.filter(F.col("doc_id") % 7 == 0)
        .select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .select(
            F.lit("d").alias("op"),
            F.col("token").alias("old_token"),
            F.lit(None).cast("string").alias("new_token"),
        )
    )
    feed = inserts.unionByName(deletes)
    return apply_change_feed(t0, feed, ["token"], {}, count_col="freq")


@register(
    "cross_doc_line_dedup_documents",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               'subscribe to our newsletter' || chr(10) ||
               'trending in ' || lang || chr(10) ||
               text || chr(10) ||
               'ref ' || md5(CAST(doc_id AS VARCHAR)) AS raw
        FROM documents),
    parts AS (SELECT doc_id, string_split(raw, chr(10)) AS parts FROM raw),
    lines AS (
        SELECT doc_id,
               unnest(range(1, len(parts) + 1)) AS pos,
               unnest(parts) AS line
        FROM parts),
    normed AS (
        SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM lines),
    marked AS (
        SELECT doc_id, pos, line,
               CASE WHEN norm = '' THEN TRUE
                    ELSE row_number() OVER (PARTITION BY norm
                                            ORDER BY doc_id, pos) = 1
               END AS keep
        FROM normed)
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE keep), '') AS cleaned,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lines_kept,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
               AS n_lines_removed
    FROM marked GROUP BY doc_id
    """,
)
def cross_doc_line_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level FIRST-OCCURRENCE line dedup (functions/curation.py:
    dedupe_lines_across_docs — the Dolma-style paragraph-dedup rule, distinct
    from boilerplate_strip_documents which removes *every* copy): documents
    get a global promo line, a per-language header, their body, and a unique
    ref line; each normalized line survives only in the (doc_id, pos)-first
    document. Duplicate document bodies in the corpus dedupe too. The winner
    per line is a map-side-combinable groupBy min — no window over the line,
    so the Zipf head cannot single-task the job."""
    from pipelinewise_spark.functions.curation import dedupe_lines_across_docs
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    raw = F.concat_ws(
        "\n",
        F.lit("subscribe to our newsletter"),
        F.concat(F.lit("trending in "), F.col("lang")),
        F.col("text"),
        F.concat(F.lit("ref "), F.md5(F.col("doc_id").cast("string"))),
    )
    return dedupe_lines_across_docs(
        d.select("doc_id", raw.alias("__raw")), "doc_id", "__raw"
    )


@register(
    "lang_percentile_filter_documents",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(text, '{TX.BPE_PATTERN}'))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents),
    r AS (
        SELECT doc_id, lang, n_bpe_tokens,
               percent_rank() OVER (PARTITION BY lang
                                    ORDER BY n_bpe_tokens NULLS FIRST, doc_id)
                   AS lang_pct
        FROM s)
    SELECT doc_id, lang, n_bpe_tokens, lang_pct
    FROM r WHERE lang_pct >= 0.25
    """,
)
def lang_percentile_filter_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language quality calibration: rank documents *within* their
    language and keep the top 75% — so a score scale that runs hot in one
    language cannot crowd the others out of the training mix (the
    per-stratum percentile normalization step in CCNet-style curation).

    Scale shape: a bare ``percent_rank() OVER (PARTITION BY lang ...)``
    funnels each language — terabytes at corpus scale — through ONE task.
    Instead the global rank over (lang, score, doc_id) comes from
    operators/rank.py:distributed_row_number (range-shuffle + per-partition
    windows + metadata offsets), and each language's percent_rank is
    recovered as (rank - first_rank_of_lang) / (docs_in_lang - 1) via a
    broadcast join of per-language bounds (one row per language). Integer
    ordering keys make the percentile exact and engine-portable — no FP
    comparator drift."""
    from pipelinewise_spark.operators.rank import distributed_row_number

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", TX.bpe_token_count(F.col("text")).alias("n_bpe_tokens")
    )
    ranked = distributed_row_number(
        d, ["lang", "n_bpe_tokens", "doc_id"], out_col="__grank"
    )
    bounds = ranked.groupBy(F.col("lang").alias("__lang")).agg(
        F.min("__grank").alias("__lo"), F.count("*").alias("__n")
    )
    # single-doc language: (rank-lo)/(n-1) is 0/0 = NaN, and NaN >= x is
    # TRUE in Spark — guard to 0.0 to match SQL percent_rank, which
    # defines a 1-row partition as 0 (and therefore drops it at >= 0.25)
    pct = F.when(
        F.col("__n") > 1,
        (F.col("__grank") - F.col("__lo")).cast("double")
        / (F.col("__n") - F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        # eqNullSafe: NULL-lang docs form their own stratum (the SQL
        # PARTITION BY groups NULLs), not silently dropped by the join
        ranked.join(
            F.broadcast(bounds), F.col("lang").eqNullSafe(F.col("__lang")),
            "inner",
        )
        .withColumn("lang_pct", pct)
        .filter(F.col("lang_pct") >= 0.25)
        .select("doc_id", "lang", "n_bpe_tokens", "lang_pct")
    )


@register(
    "curation_funnel_documents",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, text, toks,
               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   AS grams
        FROM tok),
    s AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               round(list_sum(list_transform(toks,
                         t -> CAST(length(t) AS DOUBLE))) / len(toks), 6)
                   AS mean_word_len,
               round(CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE)
                     / len(toks), 6) AS symbol_ratio,
               round(CAST(len(list_filter(toks,
                         t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                     / len(toks), 6) AS alpha_frac,
               round(CASE WHEN len(grams) > 0
                          THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                               / len(grams)
                          ELSE 0.0 END, 6) AS dup_3gram_frac,
               doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canon
        FROM g),
    ind AS (
        SELECT *,
               (n_words BETWEEN 50 AND 100000) AS p1,
               (n_words BETWEEN 50 AND 100000)
                 AND (mean_word_len BETWEEN 3.0 AND 10.0)
                 AND (symbol_ratio < 0.1) AND (alpha_frac > 0.8)
                 AND (dup_3gram_frac < 0.3) AS p2
        FROM s),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
               CAST(sum(CASE WHEN p2 AND is_canon THEN 1 ELSE 0 END)
                    AS BIGINT) AS c3
        FROM ind)
    SELECT CAST(0 AS BIGINT) AS stage_id, 'ingested' AS stage,
           total AS rows_in, total AS rows_out FROM c
    UNION ALL
    SELECT 1, 'word_count', total, c1 FROM c
    UNION ALL
    SELECT 2, 'gopher_quality', c1, c2 FROM c
    UNION ALL
    SELECT 3, 'exact_dedup', c2, c3 FROM c
    """,
)
def curation_funnel_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage curation accounting (the observability layer every 100 TB
    curation run needs: how many documents each filter stage admitted).
    All quality indicators are evaluated as columns of ONE scan and
    aggregated with conditional sums — the funnel costs one pass plus the
    map-side-combinable canonical-copy groupBy, never one job per stage.
    Stages: ingest → Gopher word-count gate → full Gopher rules → exact
    dedup (only the min-doc_id copy of identical text survives)."""
    d = read_table(spark, sf_dir, "documents").withColumn(
        "__toks", TX.tokens(F.col("text"))
    )
    stats = TX.gopher_stats(F.col("text"), toks=F.col("__toks"))
    canon = (
        d.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(F.min("doc_id").alias("__canon_id"))
    )
    # eqNullSafe: md5(NULL) = NULL never equals itself under `=`, so a
    # plain join would drop NULL-text documents from every stage's total
    # while the oracle counts them (its window PARTITION BY groups NULLs)
    d = d.join(canon, F.md5(F.col("text")).eqNullSafe(F.col("__h")), "inner")
    p1 = stats["n_words"].between(50, 100_000)
    p2 = TX.gopher_keep(stats)
    p3 = p2 & (F.col("doc_id") == F.col("__canon_id"))
    agg = d.agg(
        F.count("*").alias("total"),
        F.sum(p1.cast("long")).alias("c1"),
        F.sum(p2.cast("long")).alias("c2"),
        F.sum(p3.cast("long")).alias("c3"),
    )
    stages = F.array(
        F.struct(
            F.lit(0).cast("long").alias("stage_id"),
            F.lit("ingested").alias("stage"),
            F.col("total").alias("rows_in"), F.col("total").alias("rows_out"),
        ),
        F.struct(
            F.lit(1).cast("long").alias("stage_id"),
            F.lit("word_count").alias("stage"),
            F.col("total").alias("rows_in"), F.col("c1").alias("rows_out"),
        ),
        F.struct(
            F.lit(2).cast("long").alias("stage_id"),
            F.lit("gopher_quality").alias("stage"),
            F.col("c1").alias("rows_in"), F.col("c2").alias("rows_out"),
        ),
        F.struct(
            F.lit(3).cast("long").alias("stage_id"),
            F.lit("exact_dedup").alias("stage"),
            F.col("c2").alias("rows_in"), F.col("c3").alias("rows_out"),
        ),
    )
    return agg.select(F.explode(stages).alias("s")).select(
        "s.stage_id", "s.stage", "s.rows_in", "s.rows_out"
    )


def _near_dup_against_oracle(
    threshold: float = 0.4, bands: int = 4, planes_per_band: int = 4
) -> str:
    """Same plane/band scheme as _near_dup_pairs_oracle, restricted to
    (corpus: vec_id % 10 <> 0) × (batch: vec_id % 10 = 0) pairs — the
    incremental embedding ingest-dedup contract."""
    base = _near_dup_pairs_oracle(threshold, bands, planes_per_band)
    return base.replace(
        "FROM k a JOIN k b ON a.vec_id < b.vec_id AND",
        "FROM k a JOIN k b ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0 "
        "AND a.vec_id <> b.vec_id AND",
    )


@register(
    "embedding_incremental_batch",
    oracle=_near_dup_against_oracle(),
)
def embedding_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding ingest dedup (functions/similarity.py:
    signlsh_near_dup_pairs_against): the 10 % of vectors arriving as a new
    batch are cosine-near-dup-checked against the standing 90 % corpus via
    the corpus's banded sign-LSH index — corpus self-pairs never form, so
    per-batch cost is O(batch × collision rate). The embedding twin of
    minhash_incremental_batch_documents."""
    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    return S.signlsh_near_dup_pairs_against(
        corpus, batch, "vec_id", "embedding", threshold=0.4
    )


# ------------------------------------------------ exact duplicated spans
_SPAN_W = 8


@register(
    "duplicated_span_coverage_documents",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               {_TOKS} AS toks
        FROM documents),
    w AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
               md5(array_to_string(
                   list_slice(toks, i, i + {_SPAN_W - 1}), chr(31))) AS h
        FROM b, unnest(range(1, CAST(n_tokens AS INTEGER) - {_SPAN_W} + 2))
             AS t(i)
        WHERE n_tokens >= {_SPAN_W}),
    dup AS (
        SELECT h FROM w GROUP BY h HAVING min(doc_id) <> max(doc_id)),
    hits AS (
        SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)),
    cov AS (
        SELECT doc_id, pos,
               pos + {_SPAN_W} - greatest(
                   coalesce(max(pos + {_SPAN_W}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       pos),
                   pos) AS c
        FROM hits),
    agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_positions
        FROM cov GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens,
           coalesce(agg.dup_positions, 0) AS dup_positions,
           CAST(coalesce(agg.dup_positions, 0) AS DOUBLE)
               / CAST(b.n_tokens AS DOUBLE) AS dup_fraction
    FROM b LEFT JOIN agg USING (doc_id)
    """,
)
def duplicated_span_coverage_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact duplicated-SPAN coverage (functions/spans.py): per document,
    the fraction of token positions covered by an exact 8-token span that
    also occurs verbatim in another document — the substring-level dedup
    signal of Lee et al. (2022), whose suffix-array construction this
    re-expresses as a stride-1 window explode (same O(total tokens)
    asymptotics) + combinable min!=max duplicate detection + per-document
    interval-merge windows. The synthetic corpus repeats sentence
    templates across documents, so real cross-document spans exist at
    every SF."""
    from pipelinewise_spark.functions.spans import duplicated_span_coverage

    d = read_table(spark, sf_dir, "documents")
    return duplicated_span_coverage(d, "doc_id", "text", window=_SPAN_W)


# ------------------------------------------------- data-mixture sampling
@register(
    "token_budget_mixture_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               md5(source || '|' || CAST(doc_id AS VARCHAR)) AS pri
        FROM documents),
    c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY pri, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens
        FROM t)
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c
    WHERE cum_tokens - n_tokens <
          CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
               THEN 600 ELSE 300 END
    """,
)
def token_budget_mixture_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic training-data MIXTURE (functions/curation.py:
    token_budget_mixture): per source domain, admit documents in
    hash-shuffled order until the domain's token budget fills (even
    domains 600 tokens, odd 300 — a heterogeneous target composition).
    The per-domain running totals come from the per-group distributed
    prefix sum (range-partitioned on (domain, order); per-(partition,
    group) offsets join back broadcast), so the whole mixture is ONE pass
    with no per-domain window task — the DoReMi/Pile-style composition
    step at corpus scale. Deterministic: same corpus + budgets → same
    mixture, a resumability requirement for 100 TB jobs."""
    from pipelinewise_spark.functions.curation import token_budget_mixture

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        TX.token_count(F.col("text")).alias("n_tokens"),
        F.md5(
            F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string"))
        ).alias("__pri"),
    )
    budget = (
        F.when(F.substring("source", 4, 8).cast("int") % 2 == 0, F.lit(600))
        .otherwise(F.lit(300))
    )
    out = token_budget_mixture(
        d, "source", ["__pri", "doc_id"], "n_tokens", budget
    )
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


@register(
    "excise_duplicated_spans_documents",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               {_TOKS} AS toks
        FROM documents),
    w AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
               md5(array_to_string(
                   list_slice(toks, i, i + {_SPAN_W - 1}), chr(31))) AS h
        FROM b, unnest(range(1, CAST(n_tokens AS INTEGER) - {_SPAN_W} + 2))
             AS t(i)
        WHERE n_tokens >= {_SPAN_W}),
    dup AS (
        SELECT h FROM w GROUP BY h HAVING min(doc_id) <> max(doc_id)),
    cov AS (
        SELECT DISTINCT w.doc_id, CAST(u AS INTEGER) AS tpos
        FROM w JOIN dup USING (h),
             unnest(range(pos, pos + {_SPAN_W})) AS t(u)),
    tok AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS tpos, toks[i] AS tok
        FROM b, unnest(range(1, CAST(n_tokens AS INTEGER) + 1)) AS t(i)),
    kept AS (
        SELECT t.doc_id, t.tpos, t.tok
        FROM tok t LEFT JOIN cov c
          ON t.doc_id = c.doc_id AND t.tpos = c.tpos
        WHERE c.tpos IS NULL),
    r AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id)
    SELECT b.doc_id,
           CASE WHEN b.n_tokens IS NULL THEN NULL
                ELSE coalesce(r.clean, '') END AS clean_text,
           b.n_tokens,
           CAST(b.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM b LEFT JOIN r USING (doc_id)
    """,
)
def excise_duplicated_spans_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact substring DEDUPLICATION (functions/spans.py:
    excise_duplicated_spans): every token position covered by a
    cross-document duplicated 8-token span is removed and the document
    rebuilt from the surviving tokens — the Lee et al. (2022) ExactSubstr
    transform, as one declarative plan whose only corpus-wide stage is
    the combinable duplicate-span groupBy. The coverage twin
    (duplicated_span_coverage_documents) is the measure; this is the
    cure."""
    from pipelinewise_spark.functions.spans import excise_duplicated_spans

    d = read_table(spark, sf_dir, "documents")
    return excise_duplicated_spans(d, "doc_id", "text", window=_SPAN_W)


@register(
    "contamination_span_coverage_documents",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               {_TOKS} AS toks
        FROM documents WHERE doc_id % 50 <> 0),
    e AS (
        SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 50 = 0),
    ew AS (
        SELECT DISTINCT md5(array_to_string(
                   list_slice(toks, i, i + {_SPAN_W - 1}), chr(31))) AS h
        FROM e, unnest(range(1, len(toks) - {_SPAN_W} + 2)) AS t(i)
        WHERE len(toks) >= {_SPAN_W}),
    w AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
               md5(array_to_string(
                   list_slice(toks, i, i + {_SPAN_W - 1}), chr(31))) AS h
        FROM b, unnest(range(1, CAST(n_tokens AS INTEGER) - {_SPAN_W} + 2))
             AS t(i)
        WHERE n_tokens >= {_SPAN_W}),
    hits AS (SELECT w.doc_id, w.pos FROM w JOIN ew USING (h)),
    cov AS (
        SELECT doc_id, pos,
               pos + {_SPAN_W} - greatest(
                   coalesce(max(pos + {_SPAN_W}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       pos),
                   pos) AS c
        FROM hits),
    agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS contaminated_positions
        FROM cov GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens,
           coalesce(agg.contaminated_positions, 0)
               AS contaminated_positions,
           CAST(coalesce(agg.contaminated_positions, 0) AS DOUBLE)
               / CAST(b.n_tokens AS DOUBLE) AS contamination_fraction,
           CASE WHEN b.n_tokens IS NULL THEN NULL
                ELSE coalesce(CAST(coalesce(agg.contaminated_positions, 0)
                         AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) >= 0.2,
                     FALSE) END AS is_contaminated
    FROM b LEFT JOIN agg USING (doc_id)
    """,
)
def contamination_span_coverage_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Span-level train/eval decontamination grading (functions/spans.py:
    contamination_span_coverage): docs with doc_id % 50 == 0 play the eval
    suite; every other document is graded by the fraction of its token
    positions covered by an exact 8-token span from that suite, flagged at
    >= 20 %. The doc-level collision DROP is decontaminate_documents; this
    measures HOW MUCH overlaps — the difference between discarding a
    10k-token document over one quoted sentence and knowing it is 0.1 %
    contaminated. Benchmark span set broadcasts; the corpus pays one
    window explode + semi join."""
    from pipelinewise_spark.functions.spans import (
        contamination_span_coverage,
    )

    d = read_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    bench = d.filter(F.col("doc_id") % 50 == 0)
    return contamination_span_coverage(
        corpus, bench, "doc_id", "text", window=_SPAN_W, threshold=0.2
    )


# ---------------------------------------------------- r7: curation additions
_CE_SQL = f"""
    t AS (
        SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    v AS (SELECT token, CAST(count(*) AS DOUBLE) AS c FROM t GROUP BY token),
    s AS (SELECT sum(c) AS n, CAST(count(*) AS DOUBLE) AS vs FROM v),
    p AS (SELECT token, ln((c + 1.0) / (n + vs)) AS log_p FROM v, s),
    h AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(CAST(ROUND(-avg(log_p), 6) AS DECIMAL(18,6)) AS DOUBLE)
                   AS cross_entropy
        FROM t JOIN p USING (token) GROUP BY doc_id)
"""

_CUT_LO = 1.0 / 3.0
_CUT_HI = 2.0 / 3.0


@register(
    "ccnet_perplexity_buckets_documents",
    oracle=f"""
    WITH {_CE_SQL},
    j AS (
        SELECT d.doc_id, d.lang, h.n_tokens, h.cross_entropy
        FROM documents d JOIN h USING (doc_id)),
    b AS (
        SELECT lang,
               CAST(CAST(ROUND(percentile_cont({_CUT_LO!r})
                   WITHIN GROUP (ORDER BY cross_entropy), 6)
                   AS DECIMAL(18,6)) AS DOUBLE) AS b_head,
               CAST(CAST(ROUND(percentile_cont({_CUT_HI!r})
                   WITHIN GROUP (ORDER BY cross_entropy), 6)
                   AS DECIMAL(18,6)) AS DOUBLE) AS b_mid
        FROM j GROUP BY lang)
    SELECT j.doc_id, j.lang, j.n_tokens, j.cross_entropy,
           CASE WHEN j.cross_entropy <= b.b_head THEN 'head'
                WHEN j.cross_entropy <= b.b_mid THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM j JOIN b USING (lang)
    """,
)
def ccnet_perplexity_buckets_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet perplexity banding (functions/lm.py:ccnet_perplexity_buckets):
    per-language head/middle/tail split of the corpus at the 33rd/67th
    cross-entropy percentiles — the band selection CCNet applies after
    KenLM scoring (here the repo's unigram LM; the banding machinery is
    order-agnostic). Bounds come from ONE distributed rank shared by all
    languages and broadcast back; no per-language sort, no collect."""
    from pipelinewise_spark.functions.lm import ccnet_perplexity_buckets
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    return ccnet_perplexity_buckets(
        d, "doc_id", "text", "lang", cuts=(_CUT_LO, _CUT_HI)
    )


@register(
    "dsir_weights_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents),
    f AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS fb
        FROM t),
    sc AS (SELECT fb, CAST(count(*) AS DOUBLE) AS cs FROM f GROUP BY fb),
    tc AS (SELECT fb, CAST(count(*) AS DOUBLE) AS ct
           FROM f WHERE lang = 'en' GROUP BY fb),
    m AS (
        SELECT sc.fb, sc.cs, coalesce(tc.ct, 0.0) AS ct
        FROM sc LEFT JOIN tc USING (fb)),
    tot AS (SELECT sum(cs) AS ns, sum(ct) AS nt FROM m),
    r AS (
        SELECT fb,
               ln((ct + 1.0) / (nt + 64.0)) - ln((cs + 1.0) / (ns + 64.0))
                   AS lr
        FROM m, tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(CAST(ROUND(sum(lr), 6) AS DECIMAL(18,6)) AS DOUBLE)
               AS log_weight
    FROM f JOIN r USING (fb)
    GROUP BY doc_id
    """,
)
def dsir_weights_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (functions/lm.py:dsir_log_weights): hashed
    unigram bucket distributions for target (lang='en') vs the raw corpus;
    per-document log importance weight Σ ln(p_t/p_s) — the importance-
    resampling signal for steering a 100 TB crawl toward a target domain.
    The 64-row feature table broadcasts; corpus pays token explodes only."""
    from pipelinewise_spark.functions.lm import dsir_log_weights
    from pipelinewise_spark.partitioning import spread

    d = spread(read_table(spark, sf_dir, "documents"))
    return dsir_log_weights(
        d, d.filter(F.col("lang") == "en"), "doc_id", "text", num_buckets=64
    )


def _semantic_dedup_oracle(threshold: float = 0.4) -> str:
    planes = S.hyperplanes()
    terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        dotp = f"list_sum(list_transform(range(1, 65), i -> ev[i] * ({lit})[i]))"
        terms.append(f"(CASE WHEN {dotp} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)")
    bucket = "\n           + ".join(terms)
    cos = (
        f"round({_DOT.format(a='a.ev', b='b.ev')} / "
        f"(sqrt({_DOT.format(a='a.ev', b='a.ev')}) * "
        f"sqrt({_DOT.format(a='b.ev', b='b.ev')})), 6)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
                      CAST({bucket} AS BIGINT) AS bucket
               FROM embeddings),
    dup AS (
        SELECT DISTINCT a.vec_id
        FROM e a JOIN e b
          ON a.bucket = b.bucket AND b.vec_id < a.vec_id
        WHERE {cos} >= {threshold})
    SELECT e.vec_id, e.bucket,
           dup.vec_id IS NOT NULL AS is_semantic_dup
    FROM e LEFT JOIN dup USING (vec_id)
    """


@register("semantic_dedup_embeddings", oracle=_semantic_dedup_oracle())
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (functions/similarity.py:
    semantic_dedup): coarse-cluster the embedding space (sign-LSH), flag
    any vector with a smaller-id same-bucket neighbor at cosine >= 0.4 —
    keep-first greedy, one survivor per duplicate group, no iteration.
    Candidates form only within buckets (never corpus x corpus)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, "vec_id", "embedding", threshold=0.4)


@register(
    "temperature_sample_documents",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    s AS (
        SELECT lang, cnt,
               CAST(round(sqrt(CAST(cnt AS DOUBLE)) * 1e6, 0) AS BIGINT)
                   AS sm
        FROM c),
    t AS (
        SELECT CAST(sum(sm) AS HUGEINT) AS ssum,
               CAST(floor(CAST(sum(cnt) AS DOUBLE) * 50 / 100.0) AS HUGEINT)
                   AS budget
        FROM s)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN s USING (lang) CROSS JOIN t
    WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 10000)::HUGEINT * t.ssum * CAST(s.cnt AS HUGEINT)
          < 10000::HUGEINT * t.budget * CAST(s.sm AS HUGEINT)
    """,
)
def temperature_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (functions/curation.py:
    temperature_sample, alpha=0.5, 50% budget): per-language keep-rates
    derived from corpus counts as budget*sqrt(c_l)/(Sum sqrt(c)*c_l) — the
    tail-language up-weighting used when assembling multilingual training
    mixes, decided by exact integer cross-multiplication on the md5 hash
    so the identical row set is selected on every run and every engine."""
    from pipelinewise_spark.functions.curation import temperature_sample

    d = read_table(spark, sf_dir, "documents")
    out = temperature_sample(d, key_col="doc_id", stratum_col="lang")
    return out.select("doc_id", "lang")


@register(
    "epoch_upsample_documents",
    oracle="""
    WITH c AS (
        SELECT doc_id, lang,
               (CASE WHEN lang = 'en' THEN 1 ELSE 2 END)
               + (CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                              1, 8))::BIGINT % 10000)
                        < (CASE WHEN lang = 'en' THEN 5000 ELSE 0 END)
                  THEN 1 ELSE 0 END) AS copies
        FROM documents)
    SELECT doc_id, lang, CAST(r.epoch AS INTEGER) AS epoch
    FROM c CROSS JOIN LATERAL (
        SELECT unnest(range(1, copies + 1)) AS epoch) r
    """,
)
def epoch_upsample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch upsampling (functions/curation.py:epoch_upsample):
    English documents target 1.5 epochs (all once + a deterministic md5
    half once more), every other language 2 epochs — the repeat-the-good-
    data mix step of LLM training recipes, reproducing the identical copy
    set on every run. Pure projection + explode, no shuffle."""
    from pipelinewise_spark.functions.curation import epoch_upsample

    d = read_table(spark, sf_dir, "documents")
    out = epoch_upsample(
        d, key_col="doc_id", stratum_col="lang",
        epochs={"en": 1.5}, default_epochs=2.0,
    )
    return out.select("doc_id", "lang", F.col("epoch").cast("int"))


_NB_TOKENS = (
    "unnest(list_filter(string_split_regex(lower(text), '\\s+'), "
    "x -> x <> ''))"
)


@register(
    "nb_langid_documents",
    oracle=f"""
    WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    ev AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    tfeat AS (
        SELECT lang AS label, substring(t.tok, 1, 4) AS feat
        FROM train, {_NB_TOKENS} AS t(tok)
    ),
    feats AS (SELECT label, feat, COUNT(*) AS cnt FROM tfeat GROUP BY 1, 2),
    vocab AS (SELECT COUNT(DISTINCT feat) AS v FROM feats),
    totals AS (SELECT label, SUM(cnt) AS tot FROM feats GROUP BY 1),
    docs_l AS (SELECT lang AS label, COUNT(*) AS ndocs FROM train GROUP BY 1),
    nt AS (SELECT COUNT(*) AS n FROM train),
    labels AS (
        SELECT t.label,
               CAST(ROUND(LN(CAST(d.ndocs AS DOUBLE) / (SELECT n FROM nt))
                          * 1e6) AS BIGINT) AS prior,
               CAST(ROUND(LN(1.0 / (t.tot + (SELECT v FROM vocab)))
                          * 1e6) AS BIGINT) AS llr0
        FROM totals t JOIN docs_l d USING (label)
    ),
    lk AS (
        SELECT f.label, f.feat,
               CAST(ROUND(LN((f.cnt + 1.0)
                             / (t.tot + (SELECT v FROM vocab)))
                          * 1e6) AS BIGINT) AS llr
        FROM feats f JOIN totals t USING (label)
    ),
    efeat AS (
        SELECT doc_id, substring(t.tok, 1, 4) AS feat, COUNT(*) AS n
        FROM ev, {_NB_TOKENS} AS t(tok)
        GROUP BY 1, 2
    ),
    elen AS (SELECT doc_id, SUM(n) AS len FROM efeat GROUP BY 1),
    seen AS (
        SELECT e.doc_id, l.label,
               SUM(l.llr * e.n) AS seen_sum, SUM(e.n) AS seen_n
        FROM efeat e JOIN lk l USING (feat) GROUP BY 1, 2
    ),
    scores AS (
        SELECT el.doc_id, lb.label,
               lb.prior + COALESCE(s.seen_sum, 0)
               + (el.len - COALESCE(s.seen_n, 0)) * lb.llr0 AS score
        FROM elen el CROSS JOIN labels lb
        LEFT JOIN seen s ON s.doc_id = el.doc_id AND s.label = lb.label
    ),
    best AS (
        SELECT doc_id, label AS predicted, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, label) AS rn
        FROM scores
    )
    SELECT b.doc_id, e.lang AS actual, b.predicted,
           CAST(b.score AS BIGINT) AS score,
           b.predicted = e.lang AS correct
    FROM best b JOIN ev e USING (doc_id) WHERE rn = 1
    """,
)
def nb_langid_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-BASED curation: a multinomial Naive-Bayes language
    classifier trained in-engine on an 80% split and scored on the
    held-out 20% (functions/classifier.py — fastText/CCNet-style
    model filtering as pure aggregates; BIGINT micro-log scores make
    train+inference bit-identical across engines). Output: per held-out
    doc the true lang, argmax prediction, integer score, correctness."""
    from pipelinewise_spark.functions import classifier as C

    docs = read_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    ev = docs.filter(F.col("doc_id") % 5 == 0)
    model = C.nb_train(train, "lang", "text")
    scores = C.nb_score(ev, model, "doc_id", "text")
    pred = C.nb_predict(scores, "doc_id")
    return pred.join(ev.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        F.col("lang").alias("actual"),
        "predicted",
        "score",
        (F.col("predicted") == F.col("lang")).alias("correct"),
    )


def _semantic_decontam_oracle(threshold: float = 0.4) -> str:
    planes = S.hyperplanes()
    terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        dotp = (
            f"list_sum(list_transform(range(1, 65), i -> ev[i] * ({lit})[i]))"
        )
        terms.append(
            f"(CASE WHEN {dotp} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        )
    bucket = "\n           + ".join(terms)
    cos = (
        f"round({_DOT.format(a='t.ev', b='q.ev')} / "
        f"(sqrt({_DOT.format(a='t.ev', b='t.ev')}) * "
        f"sqrt({_DOT.format(a='q.ev', b='q.ev')})), 6)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
                      CAST({bucket} AS BIGINT) AS bucket
               FROM embeddings),
    tr AS (SELECT * FROM e WHERE vec_id % 10 <> 7),
    ev_set AS (SELECT * FROM e WHERE vec_id % 10 = 7),
    hit AS (
        SELECT DISTINCT t.vec_id
        FROM tr t JOIN ev_set q ON t.bucket = q.bucket
        WHERE {cos} >= {threshold})
    SELECT tr.vec_id, tr.bucket,
           hit.vec_id IS NOT NULL AS is_contaminated
    FROM tr LEFT JOIN hit USING (vec_id)
    """


@register(
    "semantic_decontaminate_embeddings",
    oracle=_semantic_decontam_oracle(0.2),
)
def semantic_decontaminate_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-corpus SEMANTIC decontamination
    (functions/similarity.py:semantic_decontaminate): a held-out eval
    slice (vec_id % 10 = 7) is bucketed and BROADCAST against the
    training slice — paraphrase-level benchmark leakage the exact
    n-gram decontaminate operator can't see, flagged at cosine >= 0.2,
    one corpus scan, no corpus shuffle."""
    emb = read_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 10 != 7)
    evalset = emb.filter(F.col("vec_id") % 10 == 7)
    return S.semantic_decontaminate(
        train, evalset, "vec_id", "embedding", threshold=0.2
    )


@register(
    "text_index_search_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dlen, toks FROM d),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dlen) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, dlen, unnest(toks) AS term FROM dl),
    tfq AS (
        SELECT doc_id, dlen, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tf WHERE term IN ('data', 'pipeline', 'spark')
        GROUP BY 1, 2, 3),
    dfreq AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tfq GROUP BY 1)
    SELECT t.doc_id,
           round(sum(
               ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dlen / s.avgdl))
           ), 6) AS score
    FROM tfq t JOIN dfreq f USING (term) CROSS JOIN stats s
    GROUP BY 1
    """,
)
def text_index_search_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Serving-grade retrieval from the PERSISTED inverted index across
    its FULL maintenance lifecycle (functions/textindex.py): build on
    half the corpus (term-bucketed postings with denormalized doc
    lengths, exact integer corpus stats), EXTEND with the other half
    (the ingest-loop growth path), COMPACT the accumulated per-extend
    fragments into a fresh versioned postings dir and VACUUM the
    superseded one — then probe. The probe reads ONLY the query terms'
    bucket dirs — never the corpus — and must reproduce the direct
    one-scan BM25 computation bit-for-bit: the maintenance cycle is
    result-preserving by contract (same lifecycle story as the LSH and
    IVF indexes; pinned fragment-bounding in tests/test_textindex.py)."""
    import os
    import tempfile

    from pipelinewise_spark.functions.textindex import (
        build_text_index,
        compact_text_index,
        extend_text_index,
        search_text_index,
        text_index_status,
        vacuum_text_index,
    )
    from pipelinewise_spark.queries.fixturetime import fixture_timer

    with fixture_timer():
        d = read_table(spark, sf_dir, "documents")
        idx = os.path.join(tempfile.mkdtemp(prefix="pws_tidx_"), "idx")
        build_text_index(
            d.filter(F.col("doc_id") % 2 == 0), idx, "doc_id", "text"
        )
        extend_text_index(d.filter(F.col("doc_id") % 2 == 1), idx)
        compact_text_index(spark, idx)
        vacuum_text_index(idx)
        assert text_index_status(idx)["extensions_since_compaction"] == 0
    return search_text_index(
        spark, idx, ["data", "pipeline", "spark"]
    )


@register(
    "source_reputation_filter_documents",
    oracle="""
    WITH stats AS (
        SELECT source,
               AVG(CASE WHEN n_chars BETWEEN 100 AND 2000
                        THEN 1.0 ELSE 0.0 END) AS pass_rate
        FROM documents GROUP BY source),
    kept AS (
        SELECT source FROM stats
        WHERE pass_rate >= 0.9 AND source NOT IN ('src13', 'src17'))
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN kept USING (source)
    WHERE d.n_chars BETWEEN 100 AND 2000
    """,
)
def source_reputation_filter_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Source/domain-level curation gate (the RefinedWeb/C4-style FIRST
    filter: judge the domain before the document): per-source quality
    pass rates reduce to an answer-sized stats frame that BROADCASTS
    back onto the corpus — sources below a 0.9 pass rate or on an
    explicit blocklist drop wholesale, then the surviving documents
    still face the per-document gate. Two corpus scans total (one
    aggregated), no corpus shuffle."""
    d = read_table(spark, sf_dir, "documents")
    ok = F.col("n_chars").between(100, 2000)
    stats = d.groupBy("source").agg(
        F.avg(ok.cast("double")).alias("pass_rate")
    )
    kept = stats.filter(
        (F.col("pass_rate") >= 0.9)
        & ~F.col("source").isin("src13", "src17")
    ).select("source")
    return (
        d.join(F.broadcast(kept), "source")
        .filter(ok)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "shuffle_shards_documents",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS pos
        FROM documents)
    SELECT doc_id, lang, pos,
           CAST((pos - 1) % 8 AS INTEGER) AS shard
    FROM r
    """,
)
def shuffle_shards_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + balanced sharding
    (functions/curation.py:shuffle_shards): the corpus is permuted by
    md5(seed||doc_id) — a seeded pseudo-random total order DuckDB
    reproduces bit-exactly — and dealt round-robin into 8 shards, so
    each shard is a size-balanced unbiased 1/8 sample. The permutation
    runs as the distributed exact row number (range-partition on the
    hash, no single-task sort); the oracle recomputes position and
    shard for every document."""
    from pipelinewise_spark.functions.curation import shuffle_shards

    docs = read_table(spark, sf_dir, "documents")
    out = shuffle_shards(docs, "doc_id", n_shards=8, seed=42)
    return out.select("doc_id", "lang", "pos", "shard")


@register(
    "phash_near_dup_media",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000, text FROM documents
        WHERE doc_id % 97 = 0),
    s AS (
        SELECT doc_id,
               list_transform(range(32),
                   i -> ord(substr(md5(text), i + 1, 1))) AS sm
        FROM corpus),
    sig AS (
        SELECT doc_id,
               list_sum(list_transform(range(32),
                   i -> CASE WHEN sm[i + 1] > list_sum(sm) / 32.0
                        THEN CAST(POWER(2, i) AS BIGINT)
                        ELSE 0 END)) AS phash
        FROM s)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """,
)
def phash_near_dup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-modality near-duplicate detection: documents stand in for
    media payloads (md5-derived bytes through the opaque-binary media
    table — the codec seam is where real decoded luma would enter), a
    blockhash-style perceptual signature is computed per payload
    (functions/multimodal.py:perceptual_hash — strided byte samples,
    mean threshold, all JVM-side exact arithmetic), and pairs within
    Hamming distance 3 surface via banded blocking
    (functions/dedup.py:hamming_near_dup_pairs — pigeonhole-COMPLETE
    with 4 bands, so this is the exact answer, never all-pairs; the
    oracle brute-forces every pair to prove it). Re-ingested copies of
    every 97th document guarantee genuine duplicate pairs exist at any
    scale factor. The same pair machinery serves SimHash text
    signatures."""
    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 97 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    )
    media = M.to_media_table(
        corpus.select("doc_id", F.md5(F.col("text")).alias("payload")),
        "doc_id", "payload",
    )
    ph = M.perceptual_hash(media)
    pairs = D.hamming_near_dup_pairs(
        ph, "media_id", "phash", bits=32, num_bands=4, max_hamming=3
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "hamming",
    )


def _kmeans_oracle(
    k: int = 8,
    iterations: int = 3,
    train_where: str = "TRUE",
    assign_where: str = "TRUE",
) -> str:
    """DuckDB twin of functions/kmeans.py:kmeans_exact — the Lloyd loop as
    one recursive CTE (the BPE-oracle pattern extended to numerical ML).
    Centroid state rides as a single-row list of (j, s BIGINT[], c); the
    vector table enters the recursive term as a LIST (pure correlation —
    DuckDB's binder forbids direct aggregates over a base-table scan in a
    LATERAL, and 3-deep lambda capture; list_zip keeps every capture at
    depth <= 2). Every distance compare is the same HUGEINT
    cross-multiplication the Spark side runs in DECIMAL(38,0), so
    assignments are value-exact."""

    def assign(state: str, qcol: str) -> str:
        return f"""
          (list_reduce(
             list_transform({state}, ce -> struct_pack(
                 N := list_aggregate(list_transform(list_zip({qcol}, ce.s),
                        p -> (CAST(ce.c AS HUGEINT) * p[1]
                              - CAST(p[2] AS HUGEINT))
                           * (CAST(ce.c AS HUGEINT) * p[1]
                              - CAST(p[2] AS HUGEINT))), 'sum'),
                 c2 := CAST(ce.c AS HUGEINT) * CAST(ce.c AS HUGEINT),
                 j := ce.j)),
             (a, b) -> CASE WHEN b.N * a.c2 < a.N * b.c2
                            THEN b ELSE a END)).j"""

    members = "list_filter(t1.asg, x -> x.cl = ce.j)"
    return f"""
    WITH RECURSIVE allvecs AS (
      SELECT vec_id,
             list_transform(embedding, x ->
                 CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
      FROM embeddings),
    vecs AS (SELECT * FROM allvecs WHERE {train_where}),
    init AS (
      SELECT list(struct_pack(j := rn, s := q, c := 1::BIGINT)
                  ORDER BY rn) AS cents
      FROM (SELECT q, row_number() OVER (ORDER BY vec_id) AS rn
            FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT {k}))),
    vlist AS (SELECT list(struct_pack(q := q)) AS vl FROM vecs),
    km AS (
      SELECT 0 AS it, (SELECT cents FROM init) AS cents
      UNION ALL
      SELECT it + 1,
             list_transform(km.cents, ce ->
                 CASE WHEN len({members}) = 0 THEN ce
                      ELSE struct_pack(
                          j := ce.j,
                          s := list_reduce(
                                 list_transform({members}, m -> m.q),
                                 (a, b) -> list_transform(list_zip(a, b),
                                             p -> p[1] + p[2])),
                          c := len({members})::BIGINT)
                 END)
      FROM km,
      -- lambdas may reference columns of the CURRENT scope's FROM but not
      -- outer-correlated ones: re-scope km.cents via a plain projection
      -- (t0) so the assignment fold can see it
      LATERAL (
        SELECT list_transform((SELECT vl FROM vlist), vv -> struct_pack(
                   q := vv.q,
                   cl := {assign("t0.cents0", "vv.q")})) AS asg
        FROM (SELECT km.cents AS cents0) t0
      ) t1
      WHERE it < {iterations}
    ),
    st AS (SELECT cents AS state FROM km WHERE it = {iterations}),
    targets AS (SELECT * FROM allvecs WHERE {assign_where})
    SELECT v.vec_id, CAST({assign("st.state", "v.q")} AS BIGINT) AS cluster_id
    FROM targets v, st
    """


@register("kmeans_embeddings", oracle=_kmeans_oracle())
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-EXACT distributed k-means over the embeddings table
    (functions/kmeans.py:kmeans_exact): 8 clusters, 3 Lloyd iterations,
    deterministic lowest-id init, all arithmetic in integer micro-units
    with cross-multiplied rational distance compares — per-vector
    assignments are bit-identical across engines (the DuckDB oracle
    replays the full iteration loop as a recursive CTE). Per iteration the
    corpus never shuffles: one map stage against k x dim literal centroid
    values into a k-row aggregate."""
    from pipelinewise_spark.functions.kmeans import kmeans_exact

    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans_exact(emb, "vec_id", "embedding", k=8, iterations=3)


@register(
    "kmeans_assign_embeddings",
    oracle=_kmeans_oracle(
        k=8, iterations=2,
        train_where="vec_id % 3 <> 0",
        assign_where="vec_id % 3 = 0",
    ),
)
def kmeans_assign_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means SERVING path (functions/kmeans.py:kmeans_train +
    kmeans_assign): centroids train on 2/3 of the corpus, and the
    HELD-OUT third — data the training loop never saw, the
    full-corpus/new-batch assignment story at 100 TB — assigns via the
    same Arrow kernel with the same exact-arithmetic contract: one
    broadcast map stage, zero shuffle, bit-identical to the DuckDB
    recursive-CTE oracle that replays training on the same split and
    assigns the same held-out rows in HUGEINT. The magnitude guard
    re-verifies against the ASSIGNED frame's own max|q|."""
    from pipelinewise_spark.functions.kmeans import (
        kmeans_assign,
        kmeans_train,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = kmeans_train(
        emb.filter(F.col("vec_id") % 3 != 0), "vec_id", "embedding",
        k=8, iterations=2,
    )
    return kmeans_assign(
        emb.filter(F.col("vec_id") % 3 == 0), "vec_id", "embedding", cents
    )


@register(
    "kmeans_model_lifecycle_embeddings",
    oracle=_kmeans_oracle(
        k=8, iterations=2,
        train_where="vec_id % 3 <> 0",
        assign_where="TRUE",
    ),
)
def kmeans_model_lifecycle_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The k-means SERVING state as a persisted, versioned artifact
    (functions/kmeans.py:save/load/retrain/vacuum_kmeans_model through
    the shared IndexLifecycle contract — the same maintenance story as
    the LSH/IVF/PQ/text indexes, closing the r9 gap where trained
    centroids lived only as driver memory): train 1 Lloyd iteration on
    2/3 of the corpus and SAVE (version 0), RETRAIN at 2 iterations
    (compact verb: new versioned centroids dir + atomic sidecar repoint;
    in-flight readers of v0 undisturbed), VACUUM the superseded version,
    then assign the FULL corpus from the RELOADED model. The reload is
    bit-identical by construction (integer state, no serialization
    rounding) — asserted in-query — so the output must match the DuckDB
    oracle that replays a 2-iteration train on the same split and
    assigns everything in HUGEINT. Lifecycle counters and the vacuum of
    exactly one superseded dir are asserted too."""
    from pipelinewise_spark.functions.kmeans import (
        kmeans_assign,
        kmeans_model_status,
        kmeans_train,
        load_kmeans_model,
        retrain_kmeans_model,
        save_kmeans_model,
        vacuum_kmeans_model,
    )
    from pipelinewise_spark.queries.fixturetime import fixture_timer

    emb = read_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 3 != 0)
    with fixture_timer():
        import tempfile

        path = tempfile.mkdtemp(prefix="pws_kmmodel_") + "/model"
        cents0 = kmeans_train(train, "vec_id", "embedding", k=8,
                              iterations=1)
        save_kmeans_model(spark, path, cents0)
        assert load_kmeans_model(spark, path) == sorted(cents0)
        cents = retrain_kmeans_model(train, "vec_id", "embedding", path,
                                     iterations=2)
        removed = vacuum_kmeans_model(path)
        assert removed == ["centroids-0000"], removed
        st = kmeans_model_status(path)
        assert st["compactions"] == 1 and st["centroids_dir"] != "centroids"
    loaded = load_kmeans_model(spark, path)
    assert loaded == sorted(cents), "reload must be bit-identical"
    return kmeans_assign(emb, "vec_id", "embedding", loaded)


def _mmr_oracle(k: int = 5, pool: int = 15, lam: float = 0.7) -> str:
    """DuckDB twin of similarity.py:mmr_diversify_topk — the greedy MMR
    loop replayed as a recursive CTE (the kmeans/BPE oracle pattern).
    Every rel/sim both engines consume is the rounded fold cosine (the
    proven _ANN_CONTRACT_ORACLE arithmetic), the score is the same two
    IEEE multiplies + subtract, and ties break to the lower neighbor id
    via a strictly-greater fold over a nid-ordered candidate list."""
    one_minus = 1.0 - lam
    cos = (
        "round(list_sum(list_transform(range(1, 65), i -> {a}.v[i] * {b}.v[i])) /"
        " (sqrt(list_sum(list_transform(range(1, 65), i -> {a}.v[i] * {a}.v[i]))) *"
        "  sqrt(list_sum(list_transform(range(1, 65), i -> {b}.v[i] * {b}.v[i])))), 6)"
    )
    return f"""
    WITH RECURSIVE qv AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 10),
    cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    rel AS (
      SELECT query_id, nid, cos FROM (
        SELECT q.query_id, c.vec_id AS nid,
               {cos.format(a='q', b='c')} AS cos,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {cos.format(a='q', b='c')} DESC, c.vec_id) AS rn
        FROM qv q CROSS JOIN cv c WHERE q.query_id <> c.vec_id)
      WHERE rn <= {pool}),
    prs AS (
      SELECT a.query_id,
             list(struct_pack(a := a.nid, b := b.nid,
                              sim := {cos.format(a='va', b='vb')})) AS ps
      FROM rel a
      JOIN rel b ON a.query_id = b.query_id AND a.nid <> b.nid
      JOIN cv va ON va.vec_id = a.nid
      JOIN cv vb ON vb.vec_id = b.nid
      GROUP BY a.query_id),
    base AS (
      SELECT c.query_id, c.cands, COALESCE(p.ps, []) AS ps
      FROM (SELECT query_id,
                   list(struct_pack(nid := nid, rel := cos) ORDER BY nid)
                     AS cands
            FROM rel GROUP BY query_id) c
      LEFT JOIN prs p USING (query_id)),
    mmr AS (
      SELECT query_id, 0 AS step, []::BIGINT[] AS sel FROM base
      UNION ALL
      SELECT t0.query_id, t0.step + 1,
             list_append(t0.sel, (list_reduce(
               list_transform(
                 list_filter(t0.cands, x -> NOT list_contains(t0.sel, x.nid)),
                 x -> struct_pack(
                   score := {lam} * x.rel - {one_minus} * COALESCE(
                     list_aggregate(
                       list_transform(
                         list_filter(t0.ps,
                           p -> p.a = x.nid AND list_contains(t0.sel, p.b)),
                         p -> p.sim), 'max'), 0),
                   nid := x.nid)),
               (a, b) -> CASE WHEN b.score > a.score THEN b ELSE a END)).nid)
      FROM (SELECT m.query_id, m.step, m.sel, b.cands, b.ps
            FROM mmr m JOIN base b USING (query_id)) t0
      WHERE t0.step < {k} AND len(t0.cands) > t0.step
    )
    SELECT query_id,
           unnest(sel) AS neighbor_id,
           CAST(generate_subscripts(sel, 1) AS INT) AS mmr_rank
    -- each query's DEEPEST step, not step = k: a pool smaller than k
    -- stops recursing early (the len(cands) > step guard) and the Spark
    -- greedy emits its partial selection — the oracle must too
    FROM mmr m
    WHERE step = (SELECT MAX(step) FROM mmr x
                  WHERE x.query_id = m.query_id)
      AND step > 0
    """


@register("mmr_diversified_topk_embeddings", oracle=_mmr_oracle())
def mmr_diversified_topk_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VALUE-EXACT maximal-marginal-relevance re-rank
    (similarity.py:mmr_diversify_topk): per query, greedy k=5 selection
    from an exact-cosine 15-deep pool with lambda=0.7 — the standard RAG
    diversification when plain top-k collapses onto near-duplicates. Every
    number the greedy consumes is the rounded JVM fold cosine, so the
    DuckDB oracle replays the full selection loop (recursive CTE) and the
    driver hash-checks per-step picks. Pool bound makes per-query state
    finite by construction: one broadcast scan for relevance, pool^2 rows
    per query for sims, applyInPandas for the sequential greedy."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.mmr_diversify_topk(
        emb, queries, "vec_id", "embedding", k=5, pool=15, lam=0.7
    )


@register("pq_index_lifecycle_embeddings", oracle=_ANN_CONTRACT_ORACLE)
def pq_index_lifecycle_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persisted-PQ-index lifecycle (similarity.py:build_pq_index /
    extend_pq_index / pq_topk_against_index): train codebooks + write the
    compressed CODE TABLE from 2/3 of the corpus, EXTEND with the
    remaining third (encode-against-existing-codebooks append), then
    probe — the ADC scan reads ONLY the code table (8 small ints per
    vector; the index deliberately carries no float vectors — the exact
    re-rank fetches its refine-deep shortlist from the source lake, which
    is the PQ memory story at 100 TB). Same driver contract as the
    in-plan PQ (_ann_contract): exact-twin top-k id-sums + recall >= 0.5 /
    no-self-match booleans. Completes the per-family index lifecycles:
    LSH (documents), IVF, text index, PQ."""
    import tempfile

    from pipelinewise_spark.queries.fixturetime import fixture_timer

    emb = read_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="pws_pqidx_") + "/idx"
    with fixture_timer():
        S.build_pq_index(
            emb.filter(F.col("vec_id") % 3 != 0), path, "vec_id", "embedding"
        )
        S.extend_pq_index(
            emb.filter(F.col("vec_id") % 3 == 0), path, "embedding"
        )
        # full maintenance cycle (shared IndexLifecycle verbs)
        S.compact_pq_index(spark, path)
        S.vacuum_pq_index(path)
        assert S.pq_index_status(path)["extensions_since_compaction"] == 0
    queries = emb.filter(F.col("vec_id") < 10)
    ann = S.pq_topk_against_index(
        spark, path, emb, queries, "embedding", k=3, refine=64
    )
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    return _ann_contract(ann, exact, recall_bound=0.5)


@register(
    "rrf_fusion_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dlen, toks FROM d),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dlen) AS avgdl FROM dl),
    tf AS (SELECT doc_id, dlen, unnest(toks) AS term FROM dl),
    tfq AS (
        SELECT doc_id, dlen, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tf WHERE term IN ('data', 'pipeline', 'spark')
        GROUP BY 1, 2, 3),
    dfreq AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tfq GROUP BY 1),
    bm AS (
        SELECT t.doc_id,
               round(sum(
                   ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dlen / s.avgdl))
               ), 6) AS score
        FROM tfq t JOIN dfreq f USING (term) CROSS JOIN stats s
        GROUP BY 1),
    lex AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS r
        FROM bm),
    qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
    ce AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id <> 0),
    cs AS (
        SELECT vec_id AS doc_id,
               round(list_sum(list_transform(range(1, 65), i -> ce.v[i] * qv.q[i])) /
                     (sqrt(list_sum(list_transform(range(1, 65), i -> ce.v[i] * ce.v[i]))) *
                      sqrt(list_sum(list_transform(range(1, 65), i -> qv.q[i] * qv.q[i])))), 6) AS cos
        FROM ce CROSS JOIN qv),
    den AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY cos DESC, doc_id) AS r
        FROM cs),
    pts AS (
        SELECT doc_id, CAST(FLOOR(1000000000.0 / (60 + r)) AS BIGINT) AS p
        FROM lex WHERE r <= 20
        UNION ALL
        SELECT doc_id, CAST(FLOOR(1000000000.0 / (60 + r)) AS BIGINT)
        FROM den WHERE r <= 20),
    fz AS (
        SELECT doc_id, CAST(SUM(p) AS BIGINT) AS rrf_ppb,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM pts GROUP BY 1)
    SELECT doc_id, rrf_ppb, n_lists,
           CAST(row_number() OVER (ORDER BY rrf_ppb DESC, doc_id) AS BIGINT)
               AS rank
    FROM fz
    QUALIFY rank <= 10
    """,
)
def rrf_fusion_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (functions/retrieval.py:rrf_fuse) of the
    lexical and dense retrieval stages: BM25 top-20 for a fixed term
    query fused with exact-cosine top-20 to query vector 0 (embeddings
    map 1:1 to doc_id) via integer-ppb RRF points floor(1e9/(60+rank)).
    Score-free fusion is the standard when lexical and dense scales
    don't compare; integer points keep the fused order engine-exact.
    All windows run on candidate lists, never the corpus."""
    from pyspark.sql import Window

    from pipelinewise_spark.functions.retrieval import bm25_scores, rrf_fuse

    d = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    bm = bm25_scores(
        d, "doc_id", "text", query_terms=["data", "pipeline", "spark"]
    )
    wlex = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lex = (
        bm.withColumn("rank", F.row_number().over(wlex))
        .filter(F.col("rank") <= 20)
        .select("doc_id", "rank")
    )
    dense = S.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=20
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, dense], id_col="doc_id", topk=10)


@register(
    "data_card_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text, lang, source, {_TOKS} AS toks FROM documents),
    t AS (
        SELECT doc_id, lang, source,
               CAST(len(toks) AS BIGINT) AS ntok,
               CAST(length(text) AS BIGINT) AS nchars,
               md5(array_to_string(list_sort(list_distinct(toks)), ' '))
                   AS fp
        FROM d),
    scal AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               SUM(ntok) AS tok, SUM(nchars) AS chars,
               CAST(count(DISTINCT fp) AS BIGINT) AS fps
        FROM t),
    scalars AS (
        SELECT 'corpus' AS section, 'docs' AS metric,
               CAST(n AS DOUBLE) AS value FROM scal
        UNION ALL
        SELECT 'corpus', 'total_tokens', CAST(tok AS DOUBLE) FROM scal
        UNION ALL
        SELECT 'corpus', 'total_chars', CAST(chars AS DOUBLE) FROM scal
        UNION ALL
        SELECT 'dedup', 'exact_dup_ppm',
               CAST(FLOOR(1000000.0 * (n - fps) / n) AS DOUBLE) FROM scal),
    r AS (
        SELECT ntok, row_number() OVER (ORDER BY ntok, doc_id) AS rn,
               count(*) OVER () AS cnt
        FROM t),
    q AS (
        SELECT 'token_quantiles' AS section,
               'p' || CAST(CAST(FLOOR(qq.q * 100) AS BIGINT) AS VARCHAR)
                   AS metric,
               CAST(r.ntok AS DOUBLE) AS value
        FROM (VALUES (0.1), (0.5), (0.9)) qq(q)
        JOIN r ON r.rn = GREATEST(1, CAST(ceil(qq.q * r.cnt) AS BIGINT))),
    lm AS (
        SELECT 'lang_mix_ppm' AS section,
               COALESCE(CAST(lang AS VARCHAR), '<null>') AS metric,
               CAST(FLOOR(1000000.0 * count(*) / (SELECT n FROM scal))
                    AS DOUBLE) AS value
        FROM t GROUP BY lang),
    sm AS (
        SELECT 'source_mix_ppm' AS section,
               COALESCE(CAST(source AS VARCHAR), '<null>') AS metric,
               CAST(FLOOR(1000000.0 * count(*) / (SELECT n FROM scal))
                    AS DOUBLE) AS value
        FROM t GROUP BY source)
    SELECT * FROM scalars
    UNION ALL SELECT * FROM q
    UNION ALL SELECT * FROM lm
    UNION ALL SELECT * FROM sm
    """,
)
def data_card_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publishable corpus datasheet (operators/datacard.py:data_card
    — "Datasheets for Datasets", Gebru et al. 2021): corpus scalars,
    exact-dup rate in ppm (canonical fingerprint), discrete token-count
    quantiles via the no-single-reducer distributed rank, and lang /
    source mix shares in integer ppm — one tall (section, metric, value)
    frame, every value integer-exact so the card hash-compares across
    engines. Each section is one column-pruned map-side-combinable
    pass; the answer is sections x cardinality, never row-scale."""
    from pipelinewise_spark.operators.datacard import data_card

    d = read_table(spark, sf_dir, "documents")
    return data_card(
        d, "doc_id", "text", mix_cols=("lang", "source")
    )


@register(
    "tfidf_keywords_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    p AS (
        SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM d) t
        WHERE length(term) >= 3
        GROUP BY 1, 2),
    f AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM p GROUP BY 1),
    s AS (
        SELECT p.doc_id, p.term,
               round(p.tf * ln(n.n / f.df), 6) AS score
        FROM p JOIN f USING (term) CROSS JOIN n),
    r AS (
        SELECT doc_id, term, score,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term
               ) AS rank
        FROM s)
    SELECT doc_id, term, score, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def tfidf_keywords_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (functions/retrieval.py:
    tfidf_keywords): top-3 terms per document by tf·ln(N/df), terms
    < 3 chars dropped, score rounded to 6 dp with a term tie-break so
    the enrichment is engine-exact. One explode aggregate + a
    Zipf-vocab df join + a per-doc rank window — all keyed, all linear."""
    from pipelinewise_spark.functions.retrieval import tfidf_keywords

    d = read_table(spark, sf_dir, "documents")
    return tfidf_keywords(d, "doc_id", "text", topk=3)


@register(
    "domain_cap_documents",
    oracle="""
    WITH d AS (
        SELECT doc_id, n_chars,
               CASE WHEN source IN ('src0', 'src1', 'src2') THEN 'bulk'
                    ELSE source END AS domain
        FROM documents),
    ranked AS (
        SELECT domain, doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY -CAST(n_chars AS DOUBLE),
                            md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS domain_rank
        FROM d),
    sized AS (SELECT domain, COUNT(*) AS nd FROM d GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM d)
    SELECT r.domain, r.doc_id, r.n_chars, r.domain_rank
    FROM ranked r JOIN sized USING (domain), tot
    WHERE r.domain_rank * 1000000 <= tot.n * 100000
      AND r.domain_rank * 1000000 <= sized.nd * 900000
    """,
)
def domain_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-aware corpus curation (functions/curation.py:
    domain_cap_mix) — the C4/RefinedWeb web-corpus lever the LLM-data
    family lacked: per-domain frequency caps ("no domain exceeds
    100000 ppm of the mix") + per-domain quality quotas ("each domain
    keeps only its best 900000 ppm by n_chars"). Three sources collapse
    into one flood 'bulk' domain so the CAP binds there (held to 10 %
    of the corpus) while the QUOTA binds on the organic domains (top
    90 % by quality) — both knobs exercised at every test scale. One
    distributed per-domain rank (group_prefix_sum — a flood domain
    stays parallel, never one window task), one broadcast domain-count
    join, one 1-row broadcast total; every comparison an integer
    cross-multiplication."""
    from pipelinewise_spark.functions.curation import domain_cap_mix

    d = read_table(spark, sf_dir, "documents")
    dom = F.when(
        F.col("source").isin("src0", "src1", "src2"), F.lit("bulk")
    ).otherwise(F.col("source"))
    out = domain_cap_mix(
        d.withColumn("domain", dom),
        "domain",
        "doc_id",
        max_domain_ppm=100_000,
        quality_col="n_chars",
        quality_quota_ppm=900_000,
    )
    return out.select("domain", "doc_id", "n_chars", "domain_rank")


@register(
    "retrieval_metrics_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                   AS term
        FROM documents),
    tf AS (
        SELECT term AS query_id, doc_id, CAST(count(*) AS DOUBLE) AS tf
        FROM toks WHERE term IN ('data', 'pipeline', 'spark')
        GROUP BY 1, 2),
    res AS (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY tf DESC, doc_id
               ) AS INT) AS r
        FROM tf QUALIFY r <= 10),
    qrels AS (
        SELECT query_id, doc_id, least(tf, 3.0) AS g
        FROM tf WHERE tf >= 2),
    j AS (
        SELECT res.query_id, res.r, COALESCE(qrels.g, 0.0) AS g
        FROM res LEFT JOIN qrels USING (query_id, doc_id)),
    per AS (
        SELECT query_id,
               CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hits_at_k,
               MIN(CASE WHEN g > 0 THEN r END) AS first_rel,
               list(struct_pack(r := r, g := g) ORDER BY r) AS ranked
        FROM j GROUP BY 1),
    ideal AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
               list(g ORDER BY g DESC, doc_id)[1:10] AS gs
        FROM qrels GROUP BY 1),
    scored AS (
        SELECT p.query_id, p.hits_at_k,
               COALESCE(i.n_relevant, 0) AS n_relevant,
               p.first_rel,
               list_reduce(
                   list_transform(p.ranked, x -> x.g / log2(x.r + 1)),
                   (a, b) -> a + b) AS dcg,
               CASE WHEN i.n_relevant > 0 THEN
                   list_reduce(
                       list_transform(i.gs,
                           (g, idx) -> g / log2(idx + 1)),
                       (a, b) -> a + b)
               END AS idcg
        FROM per p LEFT JOIN ideal i USING (query_id))
    SELECT query_id, hits_at_k, n_relevant,
           CAST(FLOOR(hits_at_k * 1000000 / 10) AS BIGINT)
               AS precision_ppm,
           CAST(CASE WHEN n_relevant > 0
                THEN FLOOR(hits_at_k * 1000000 / n_relevant)
                ELSE 0 END AS BIGINT) AS recall_ppm,
           CASE WHEN first_rel IS NOT NULL
                THEN round(1.0 / first_rel, 6) ELSE 0.0 END AS mrr,
           CASE WHEN n_relevant > 0 THEN round(dcg / idcg, 6)
                ELSE 0.0 END AS ndcg
    FROM scored
    """,
)
def retrieval_metrics_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation (functions/retrieval.py:
    ranking_metrics) — the eval verb that closes the retrieval loop:
    three term 'queries' rank documents by term frequency (top-10,
    doc-id tiebreak) and are scored against TF-derived graded judgments
    (grade = min(tf, 3) where tf >= 2): hits/precision/recall in exact
    integer ppm, MRR as one round-6 division, and nDCG@10 whose
    irrational grade/log2(1+rank) sums fold LEFT over rank-sorted
    arrays in BOTH engines (F.aggregate here, list_reduce in DuckDB) —
    float summation order pinned, so the round-6 quotient
    hash-compares. Everything after the one token-explode aggregate is
    answer-sized (queries × k)."""
    from pipelinewise_spark.functions.retrieval import ranking_metrics
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    terms = ["data", "pipeline", "spark"]
    tf = (
        d.select(
            "doc_id",
            F.explode(TX.tokens(F.col("text"))).alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy(F.col("term").alias("query_id"), "doc_id")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("tf").desc(), F.col("doc_id")
    )
    results = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    qrels = tf.filter(F.col("tf") >= 2).select(
        "query_id", "doc_id", F.least("tf", F.lit(3.0)).alias("grade")
    )
    return ranking_metrics(results, qrels, k=10)


def _bounded_near_dup_pairs_oracle(
    threshold: float = 0.4, bands: int = 4, planes_per_band: int = 4,
    cap: int = 200,
) -> str:
    """signlsh near-dup pairs under the per-bucket emission guard: the
    (band, key) buckets of _near_dup_pairs_oracle, full pairs where
    n(n-1) <= 2*cap, the id-sorted spanning path where denser."""
    planes = S.hyperplanes(bands * planes_per_band)
    keys = []
    for b in range(bands):
        terms = []
        for j in range(planes_per_band):
            plane = planes[b * planes_per_band + j]
            lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
            d = (
                "list_sum(list_transform(range(1, 65), "
                f"i -> ev[i] * ({lit})[i]))"
            )
            terms.append(f"(CASE WHEN {d} > 0 THEN (1 << {j}) ELSE 0 END)")
        keys.append(f"({' + '.join(terms)}) AS k{b}")
    cos = (
        f"round({_DOT.format(a='ea.ev', b='eb.ev')} / "
        f"(sqrt({_DOT.format(a='ea.ev', b='ea.ev')}) * "
        f"sqrt({_DOT.format(a='eb.ev', b='eb.ev')})), 6)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    k AS (SELECT vec_id, ev, {', '.join(keys)} FROM e),
    br AS (
        SELECT vec_id, b.band,
               CASE b.band WHEN 0 THEN k0 WHEN 1 THEN k1
                    WHEN 2 THEN k2 ELSE k3 END AS key
        FROM k CROSS JOIN (VALUES (0), (1), (2), (3)) b(band)),
    sized AS (
        SELECT vec_id, band, key,
               COUNT(*) OVER (PARTITION BY band, key) AS bn,
               LEAD(vec_id) OVER (
                   PARTITION BY band, key ORDER BY vec_id) AS nxt
        FROM br),
    cand AS (
        SELECT DISTINCT a_id, b_id FROM (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM sized a JOIN sized b
              ON a.band = b.band AND a.key = b.key
             AND a.vec_id < b.vec_id
            WHERE a.bn * (a.bn - 1) <= 2 * {cap}
            UNION ALL
            SELECT vec_id AS a_id, nxt AS b_id FROM sized
            WHERE bn * (bn - 1) > 2 * {cap} AND nxt IS NOT NULL)),
    scored AS (
        SELECT c.a_id, c.b_id, {cos} AS cos
        FROM cand c
        JOIN e ea ON ea.vec_id = c.a_id
        JOIN e eb ON eb.vec_id = c.b_id)
    SELECT a_id, b_id, cos FROM scored WHERE cos >= {threshold}
    """


@register(
    "embedding_bounded_near_dup_pairs",
    oracle=_bounded_near_dup_pairs_oracle(),
)
def embedding_bounded_near_dup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-cosine near-dup pairs under the per-bucket EMISSION
    GUARD (functions/dedup.py:bounded_bucket_candidates via
    signlsh_near_dup_pairs max_pairs_per_bucket) — the embedding twin
    of minhash_lsh_bounded_pairs_documents, and the driver-checkable
    face of the SCALE.md r11 measurement that closed the previously
    output-quadratic R=100 dedup point (unguarded ~26M pairs thrashed
    the box; guarded runs in 3.4s at eps=0.28). Cap 200 is calibrated
    so BOTH branches execute at every test scale (fixture buckets span
    13-53 members: <=20 keep full C(n,2) fidelity, denser degrade to
    the id-sorted spanning path). Components over the verified pairs
    stay equal to the unguarded clustering on replica corpora
    (tests/test_bounded_pairs.py)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.signlsh_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4,
        max_pairs_per_bucket=200,
    )


@register(
    "stream_domain_cap_documents",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN source IN ('src0', 'src1', 'src2') THEN 'bulk'
                    ELSE source END AS domain
        FROM documents),
    r AS (
        SELECT domain, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY doc_id) AS rn
        FROM d)
    SELECT domain, doc_id FROM r WHERE rn <= 12
    """,
)
def stream_domain_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST-TIME domain frequency caps (functions/curation.py:
    StreamingDomainCapAdmitter) — the streaming face of
    domain_cap_documents: at most 12 documents per domain admitted over
    the life of the stream, first-come, leftovers dropped at the door.
    Four id-range micro-batches arrive in order, so the admitted set is
    exactly the first 12 per domain by doc_id — the SQL oracle. State
    is O(domains) ({domain: admitted} + epoch high-water mark, MetaFS
    JSON); admitted rows land as per-epoch overwrite artifacts, so an
    at-least-once redelivery (exercised: replaying epoch 0 is a no-op)
    can never duplicate a row. Per batch: one batch-sized window + one
    broadcast budget join — the corpus never shuffles."""
    import os
    import tempfile

    from pipelinewise_spark.functions.curation import (
        StreamingDomainCapAdmitter,
    )
    from pipelinewise_spark.queries.fixturetime import fixture_timer

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("source").isin("src0", "src1", "src2"), F.lit("bulk")
        ).otherwise(F.col("source")).alias("domain"),
    )
    with fixture_timer():
        tmp = tempfile.mkdtemp(prefix="pws_sdcap_")
        lohi = d.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).first()
        lo, hi = int(lohi["lo"]), int(lohi["hi"])

    adm = StreamingDomainCapAdmitter(
        "domain", "doc_id", cap=12,
        state_dir=os.path.join(tmp, "state"),
        out_dir=os.path.join(tmp, "out"),
    )
    span = hi - lo + 1
    bounds = [lo + span * k // 4 for k in range(4)] + [hi + 1]
    first = None
    for k in range(4):
        batch = d.filter(
            (F.col("doc_id") >= bounds[k]) & (F.col("doc_id") < bounds[k + 1])
        )
        if k == 0:
            first = batch
        adm.on_batch(batch, k)
    assert adm.state["n_applied"] == 4
    # at-least-once redelivery: an already-folded epoch is a no-op
    adm.on_batch(first, 0)
    assert adm.state["n_applied"] == 4
    return adm.admitted(spark).select("domain", "doc_id")
