"""Training-data curation operators: deterministic sampling, quality
filtering, token-budget sharding.

Every operator here is (a) deterministic — re-running a 100 TB curation job
must select the same rows, so sampling derives from md5 of the key, never
``rand()`` — and (b) engine-portable, so each query has an exact DuckDB
oracle (md5 hex and integer arithmetic agree everywhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pipelinewise_spark.partitioning import local_frame
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def uniform_hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, buckets): first 8 md5 hex chars
    of the key as an integer. The engine-portable substitute for rand() —
    identical in Spark, DuckDB, and any warehouse with md5()."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum (0-100), chosen by
    the deterministic key hash — per-class downsampling for training mixes
    (e.g. keep 50% en, 20% everything else). Pure projection + filter:
    no shuffle, no state, trivially resumable."""
    bucket = uniform_hash_bucket(F.col(key_col))
    rate: Column = F.lit(default_rate)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def temperature_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    budget_frac_pct: int = 50,
) -> DataFrame:
    """Temperature-scaled mixture sampling (α = 0.5): instead of fixed
    per-class rates (:func:`stratified_sample`), derive each stratum's
    keep-rate from the data so the sampled mix follows
    w_l ∝ count_l^α — the standard up-weighting of tail languages /
    domains when assembling a training mixture (cf. multilingual LM
    sampling). The overall budget is ``budget_frac_pct``% of the corpus;
    stratum l receives budget·√c_l/Σ√c rows in expectation, i.e. keep
    probability budget·√c_l/(Σ√c·c_l), capped at 1.

    Determinism contract: the keep decision is the md5 hash (basis
    points) compared via an EXACT cross-multiplication —
    ``hash_bp·Σs·c_l < 10⁴·B·s_l`` with s_l = round(√c_l·10⁶) held as
    integers and the products in DECIMAL(38,0)/int128 — so no floating
    division or near-integer floor can flip a row between engines.

    Scale shape: stratum counts are a Zipf-small aggregate broadcast
    back onto one corpus scan; the filter itself is a pure projection —
    no shuffle of the corpus, trivially resumable (same rows selected on
    every run)."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("__c"))
    scaled = counts.withColumn(
        "__s", F.round(F.sqrt(F.col("__c").cast("double")) * 1e6, 0)
        .cast("long")
    )
    # budget = floor(N·pct/100): N·pct is an exact integer in double
    # (< 2⁵³) and /100 is correctly rounded, so the floor argument is the
    # identical double in every engine — FLOOR (not a double→int CAST,
    # which truncates in Spark but rounds in DuckDB) keeps it portable
    totals = scaled.agg(
        F.sum("__s").alias("__ssum"),
        F.floor(F.sum("__c") * F.lit(int(budget_frac_pct)) / F.lit(100.0))
        .cast("long").alias("__budget"),
    )
    dec = "decimal(38,0)"
    lhs = (
        uniform_hash_bucket(F.col(key_col), 10000).cast(dec)
        * F.col("__ssum").cast(dec)
        * F.col("__c").cast(dec)
    )
    rhs = (
        F.lit(10000).cast(dec)
        * F.col("__budget").cast(dec)
        * F.col("__s").cast(dec)
    )
    return (
        df.join(F.broadcast(scaled), stratum_col)
        .crossJoin(F.broadcast(totals))
        .filter(lhs < rhs)
        .select(*df.columns)
    )


def epoch_upsample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
) -> DataFrame:
    """Repeat each stratum's documents to a FRACTIONAL epoch target —
    the training-mix upsampler (see 1.5 epochs of high-quality sources in
    LLM data recipes): every row appears floor(e) times, plus once more
    for the deterministic md5 slice of size frac(e) — so exactly the
    same rows gain the extra copy on every run, and the realized epoch
    count converges to e. Output adds an ``epoch`` copy index (1-based)
    so downstream shuffling/packing can decorrelate copies.

    Epoch targets are taken to 4 decimal places (basis-point exactness —
    the comparison is integer-vs-integer, no float boundary). Pure
    projection + explode: no shuffle, corpus-linear, resumable."""
    base: Column = F.lit(int(default_epochs))
    bps: Column = F.lit(int(round((default_epochs % 1) * 10000)))
    for value, e in sorted(epochs.items()):
        whole, frac_bps = int(e), int(round((e % 1) * 10000))
        base = F.when(
            F.col(stratum_col) == value, F.lit(whole)
        ).otherwise(base)
        bps = F.when(
            F.col(stratum_col) == value, F.lit(frac_bps)
        ).otherwise(bps)
    copies = base + (
        uniform_hash_bucket(F.col(key_col), 10000) < bps
    ).cast("int")
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
        .drop("__copies")
    )


def top_fraction_by(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    key_col: str,
    fraction: float,
) -> DataFrame:
    """Keep the top ``fraction`` of each stratum by ``order_col`` (ties
    broken on the key, so both engines pick identical rows). Quality
    filtering as rank-cutoff — exact and deterministic where a float
    percentile threshold would flip rows on last-ulp differences.

    Scale: one window per stratum (shuffle on the stratum key); for global
    top-fraction over skewless scores, swap in an approx-quantile threshold
    instead."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(order_col).desc(), F.col(key_col).asc()
    )
    cnt = Window.partitionBy(stratum_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(cnt))
        .filter(F.col("__rn") <= F.floor(F.col("__n") * fraction))
        .drop("__rn", "__n")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    max_tokens: int,
    shard_budget: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy sequence packing: rows (in key order) concatenate into
    training examples of at most ``max_tokens`` tokens — a new example
    starts whenever the next row would overflow (a row alone larger than
    the budget gets its own example). Output adds ``shard`` and ``example``
    (example index within its shard).

    Greedy packing is a sequential recurrence (the running total RESETS at
    each boundary), which no window function expresses — a single global
    scan would serialize 100 TB onto one task. The scale shape is
    hierarchical: the distributed prefix sum first cuts the corpus into
    ~``shard_budget``-token shards (parallel, deterministic), then each
    shard packs independently inside one Arrow batch
    (``applyInPandas`` — thousands of shards pack concurrently).
    Examples never span shards; with ``shard_budget`` >> ``max_tokens``
    the packing loss at shard boundaries is one partial example per shard.
    This is how production training pipelines pack at scale, and the
    determinism contract holds: same corpus, same budgets → same examples.
    """
    import pandas as pd
    from pyspark.sql import types as T

    shard_budget = shard_budget or max_tokens * 64
    sharded = shard_by_token_budget(
        df, key_col, tokens_col, shard_budget, num_partitions
    )
    # copy: StructType.add mutates in place and .schema may be cached
    out_schema = T.StructType(
        list(sharded.schema.fields) + [T.StructField("example", T.LongType())]
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(key_col).reset_index(drop=True)
        ex, acc, cur = [], 0, 0
        for i, t in enumerate(pdf[tokens_col]):
            t = int(t)
            if i == 0:
                acc = t
            elif acc + t > max_tokens:
                cur += 1
                acc = t
            else:
                acc += t
            ex.append(cur)
        pdf["example"] = ex
        return pdf

    return sharded.groupBy("shard").applyInPandas(_pack, out_schema)


def shard_by_token_budget(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign rows (ordered by key) to training shards so each shard holds
    ~``budget`` tokens: shard = floor(prefix_sum_before_row / budget).

    A single global running-sum window would serialize onto one task; this
    is the classic TWO-PHASE distributed prefix sum instead: range-partition
    by key (so partitions are key-ordered), per-partition running sums in
    parallel, then add each partition's broadcast offset (#partitions rows
    of driver metadata — never row data)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, F.col(key_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # lazy checkpoint: the totals collect below materializes the running
    # sums once; the returned plan then reads them back instead of
    # re-executing the upstream scan + range shuffle + window a second time
    d = d.withColumn(
        "__run", F.sum(F.col(tokens_col)).over(w_in)
    ).localCheckpoint(eager=False)
    # per-partition totals -> cumulative offsets (metadata-scale collect),
    # applied via a broadcast (pid, offset) join — a chained CASE WHEN
    # grows the expression tree O(P) (see operators/rank.py, same fix)
    # fragment total = SUM of the fragment's values (NOT max of the running
    # sum, which only coincides for nonnegative values)
    totals = {
        r["__pid"]: r["t"]
        for r in d.groupBy("__pid")
        .agg(F.sum(F.col(tokens_col)).alias("t"))
        .collect()
    }
    rows = []
    acc = 0
    for pid in sorted(totals):
        rows.append((pid, acc))
        acc += totals[pid] or 0
    off = local_frame(spark, rows or [(0, 0)], "__pid int, __off long")
    cum = F.col("__run") + F.col("__off")
    return (
        d.join(F.broadcast(off), "__pid")
        .withColumn(
            "shard",
            F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("long"),
        )
        .drop("__pid", "__run", "__off")
    )


def strip_boilerplate(
    df: DataFrame,
    key_col: str,
    text_col: str,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate removal (CCNet-style line dedup): a line
    whose normalized form appears in ``min_docs``+ distinct documents is
    boilerplate (nav bars, footers, cookie banners) and is stripped from
    every document it appears in.

    Scale shape: one line-frequency groupBy (map-side partial aggregation;
    the output is the corpus line vocabulary, Zipf-shaped, and only the
    >= min_docs head survives the filter, so the boilerplate set is tiny
    and broadcasts), a broadcast left mark join, then one groupBy(key) to
    reassemble documents. Two shuffles on narrow rows; no all-pairs step.
    Returns (key, cleaned, n_lines_kept, n_lines_removed).
    """
    lines = df.select(
        key_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("__norm", F.lower(F.trim(F.col("line"))))
    boiler = (
        lines.filter(F.col("__norm") != "")
        .groupBy("__norm")
        .agg(F.count_distinct(key_col).alias("__docs"))
        .filter(F.col("__docs") >= min_docs)
        .select("__norm", F.lit(True).alias("__boiler"))
    )
    marked = lines.join(F.broadcast(boiler), "__norm", "left")
    is_b = F.coalesce(F.col("__boiler"), F.lit(False))
    # collect_list drops NULLs, so boilerplate lines vanish before the sort
    kept = F.when(~is_b, F.struct(F.col("pos"), F.col("line")))
    return marked.groupBy(key_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["line"]),
            "\n",
        ).alias("cleaned"),
        F.sum(F.when(is_b, 0).otherwise(1)).cast("long").alias("n_lines_kept"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_lines_removed"),
    )


def dedupe_lines_across_docs(
    df: DataFrame,
    key_col: str,
    text_col: str,
) -> DataFrame:
    """Corpus-level first-occurrence line dedup (the Dolma/RefinedWeb
    "paragraph dedup" rule): a line whose normalized form already appeared
    in an earlier document — ordered by (key, position) — is removed; the
    single globally-first occurrence survives. Complements
    [[strip_boilerplate]] (which removes *every* copy of high-frequency
    lines) and [[dedupe_lines_within_doc]] (which only looks inside one
    document).

    Scale shape: the winner per line is ``min(struct(key, pos))`` via a
    groupBy — map-side combinable, so a line present in half the corpus
    still reduces locally instead of funneling into one task (a
    ``row_number`` window over the line would not). Then one shuffle join
    of lines against winners on the normalized line, and one groupBy(key)
    to reassemble. Three shuffles on narrow rows; no all-pairs step; no
    driver-side state. Blank lines are never deduped.
    Returns (key, cleaned, n_lines_kept, n_lines_removed).
    """
    lines = df.select(
        key_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("__norm", F.lower(F.trim(F.col("line"))))
    winners = (
        lines.filter(F.col("__norm") != "")
        .groupBy("__norm")
        .agg(
            F.min(
                F.struct(F.col(key_col).alias("k"), F.col("pos").alias("p"))
            ).alias("__w")
        )
    )
    marked = lines.join(winners, "__norm", "left")
    keep = F.col("__w").isNull() | (
        (F.col("__w.k") == F.col(key_col)) & (F.col("__w.p") == F.col("pos"))
    )
    kept = F.when(keep, F.struct(F.col("pos"), F.col("line")))
    return marked.groupBy(key_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["line"]),
            "\n",
        ).alias("cleaned"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_lines_kept"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias(
            "n_lines_removed"
        ),
    )


def weighted_sample_top_n(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): rank by u^(1/w) where u = the uniform md5 hash of the
    key in (0,1); keep the top ``n`` (per stratum if given). Heavier rows
    are proportionally likelier to survive, yet reruns pick identical rows —
    the reproducibility contract a 100 TB curation job needs. One window
    shuffle; no driver state.

    The A-ES key is computed as (1/w)·ln(u) (monotone in u^(1/w)) to stay
    in a numerically safe range; ties on the md5 are broken by key.
    """
    u = (
        uniform_hash_bucket(F.col(key_col), buckets=2**31 - 1).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**31))  # (0, 1]
    score = F.log(u) / F.col(weight_col).cast("double")  # maximize => top-n
    strata = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*strata).orderBy(
        score.desc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def chunk_by_tokens(
    df: DataFrame,
    key_col: str,
    toks_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document's token array into overlapping training chunks:
    windows of ``window`` tokens every ``stride`` tokens (the standard LLM
    context-window preprocessing step). The final partial window is kept.

    Pure narrow plan — sequence + posexplode + slice, no shuffle, no Python.
    Each chunk row re-references the parent token array by pointer until the
    final projection, so the explode does not copy the document per chunk.
    Returns (key, chunk_id, chunk_start, chunk_text, n_tokens).
    """
    d = (
        df.withColumn("__n", F.size(F.col(toks_col)))
        .filter(F.col("__n") > 0)
        .select(
            key_col,
            toks_col,
            "__n",
            F.posexplode(
                F.sequence(F.lit(1), F.col("__n"), F.lit(stride))
            ).alias("chunk_id", "__s"),
        )
    )
    length = F.least(F.lit(window), F.col("__n") - F.col("__s") + 1)
    chunk = F.slice(F.col(toks_col), F.col("__s"), length)
    return d.select(
        key_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("__s").cast("long").alias("chunk_start"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def dedupe_lines_within_doc(
    df: DataFrame,
    key_col: str,
    text_col: str,
) -> DataFrame:
    """Intra-document repetition removal: keep only the FIRST occurrence of
    each (normalized) line within a document — the within-page half of
    CCNet-style cleanup ([[strip_boilerplate]] is the cross-document half).

    One window shuffle on (doc, normalized line); reassembly groups by doc.
    Returns (key, cleaned, n_lines_kept, n_lines_removed).
    """
    lines = df.select(
        key_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("__norm", F.lower(F.trim(F.col("line"))))
    w = Window.partitionBy(key_col, "__norm").orderBy(F.col("pos"))
    marked = lines.withColumn("__rn", F.row_number().over(w))
    first = F.col("__rn") == 1
    kept = F.when(first, F.struct(F.col("pos"), F.col("line")))
    return marked.groupBy(key_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["line"]),
            "\n",
        ).alias("cleaned"),
        F.sum(F.when(first, 1).otherwise(0)).cast("long").alias("n_lines_kept"),
        F.sum(F.when(first, 0).otherwise(1)).cast("long").alias(
            "n_lines_removed"
        ),
    )


def group_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
    max_offset_rows: int = 4_000_000,
) -> DataFrame:
    """Per-GROUP running sum with no per-group sort task.

    A bare ``sum() OVER (PARTITION BY group ORDER BY ...)`` funnels each
    group — terabytes at corpus scale — through one task. Same cure as the
    global prefix sum (shard_by_token_budget) generalized per group:
    range-partition on (group, order) so each group occupies a contiguous
    partition range; per-partition running sums windowed by
    (partition, group) run in parallel; per-(partition, group) totals
    collect to the driver (metadata: at most groups + partitions rows,
    because range partitioning keeps each group contiguous, so a partition
    only holds fragments of the groups that straddle it); each fragment's
    offset (sum of earlier partitions' totals of the SAME group) joins
    back via broadcast.

    The driver-side offset table is therefore O(|groups| + |partitions|) —
    fine for the shard/language/domain-grade group cardinality this
    operator targets, NOT for high-cardinality keys (user_id). The
    ``max_offset_rows`` guard (counted distributed, before any collect)
    fails fast with guidance instead of silently materializing a
    driver-sized table."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]
    d = df.repartitionByRange(n, *gcols, *ocols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn(
        "__run", F.sum(F.col(value_col)).over(w_in)
    ).localCheckpoint(eager=False)
    # fragment total = SUM of the fragment's values (NOT max of the running
    # sum — max only equals the fragment sum when every value is
    # nonnegative, and the documented contract is a general running sum)
    totals_df = d.groupBy("__pid", *group_cols).agg(
        F.sum(F.col(value_col)).alias("__t")
    )
    n_offsets = totals_df.count()
    if n_offsets > max_offset_rows:
        raise ValueError(
            f"group_prefix_sum offset table has {n_offsets} (partition, "
            f"group) rows (> max_offset_rows={max_offset_rows}): the group "
            f"cardinality is too high for the driver-side offset pass — "
            f"reduce group cardinality, raise max_offset_rows explicitly, "
            f"or fall back to a per-group window "
            f"(sum() OVER (PARTITION BY group ORDER BY ...))"
        )
    totals = totals_df.collect()
    acc: dict[tuple, int] = {}
    rows = []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        key = tuple(r[c] for c in group_cols)
        rows.append((r["__pid"], *key, acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + (r["__t"] or 0)
    schema_group = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in group_cols
    )
    off = local_frame(spark, 
        rows or [(0, *([None] * len(group_cols)), 0)],
        f"__pid int, {schema_group}, __off long",
    )
    join_cond = [d["__pid"] == off["__pid"]] + [
        d[c].eqNullSafe(off[c]) for c in group_cols
    ]
    return (
        d.join(F.broadcast(off), join_cond)
        .drop(off["__pid"])
        .withColumn(out_col, (F.col("__run") + F.col("__off")).cast("long"))
        .drop("__pid", "__run", "__off", *[off[c] for c in group_cols])
    )


def token_budget_mixture(
    df: DataFrame,
    domain_col: str,
    order_cols: Sequence[str],
    tokens_col: str,
    budget_col: Column,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic data-mixture sampling: per domain, admit documents in
    ``order_cols`` order until the domain's token budget is reached (the
    document that crosses the budget line is included — 'fill until
    full'). Budgets arrive as a per-row Column (typically a broadcast
    join against a config table, or an expression over the domain key), so
    a 100-TB corpus mixes down to a target composition in ONE pass: the
    per-group distributed prefix sum above plus a filter — no per-domain
    jobs, no driver loop over domains.

    Returns the admitted rows with ``cum_tokens`` (the domain's running
    token total through each row)."""
    d = group_prefix_sum(
        df, [domain_col], list(order_cols), tokens_col,
        out_col="cum_tokens", num_partitions=num_partitions,
    )
    return d.filter(
        (F.col("cum_tokens") - F.col(tokens_col)) < budget_col
    )


def domain_cap_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    max_domain_ppm: int,
    quality_col: str | None = None,
    quality_quota_ppm: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Domain-aware corpus curation — the C4/RefinedWeb web-corpus lever:
    per-domain FREQUENCY CAPS ("no domain exceeds ``max_domain_ppm`` of
    the mix") plus optional per-domain QUALITY QUOTAS ("each domain
    contributes only its top ``quality_quota_ppm`` share by quality").

    Every domain's documents are ranked best-first — ``quality_col``
    descending when given, md5-of-key otherwise (a deterministic uniform
    shuffle), key as the final tiebreak so reruns keep identical rows —
    and a document survives when its in-domain rank clears BOTH knobs:

    - cap:   rank · 1e6 ≤ N · max_domain_ppm   (N = input corpus size,
      the mix denominator — a flood domain is held to its ppm share of
      the corpus it arrived in);
    - quota: rank · 1e6 ≤ n_d · quality_quota_ppm   (n_d = the domain's
      own size — the domain keeps only its best slice).

    All comparisons are integer cross-multiplications (exact in both
    engines; longs hold rank·1e6 up to ~9·10¹² docs — far past any real
    corpus).

    Scale shape: ONE distributed per-domain rank (group_prefix_sum —
    range partitioning keeps a flood domain parallel instead of
    funnelling it through one window task), one broadcast join against
    the domain-cardinality count frame, one 1-row broadcast total.
    Returns the surviving rows plus ``domain_rank``.
    """
    if quality_quota_ppm is not None and quality_col is None:
        raise ValueError("quality_quota_ppm needs quality_col")
    order: list[str] = []
    d = df
    if quality_col is not None:
        # negated quality: group_prefix_sum orders ascending by name.
        # NULL quality ranks WORST explicitly (+inf) — engines disagree
        # on null placement in ascending sorts (Spark nulls-first,
        # DuckDB nulls-last), so a bare null must never reach the sort.
        d = d.withColumn(
            "__negq",
            F.coalesce(
                -F.col(quality_col).cast("double"),
                F.lit(float("inf")),
            ),
        )
        order.append("__negq")
    d = d.withColumn("__h", F.md5(F.col(key_col).cast("string")))
    order += ["__h", key_col]
    ranked = group_prefix_sum(
        d.withColumn("__one", F.lit(1)),
        [domain_col], order, "__one",
        out_col="domain_rank", num_partitions=num_partitions,
    ).drop("__one", "__h", *(["__negq"] if quality_col else []))
    sizes = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("__nd")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    rn6 = F.col("domain_rank").cast("long") * F.lit(1_000_000).cast("long")
    keep = rn6 <= F.col("__N") * F.lit(int(max_domain_ppm)).cast("long")
    if quality_quota_ppm is not None:
        keep = keep & (
            rn6 <= F.col("__nd") * F.lit(int(quality_quota_ppm)).cast("long")
        )
    return (
        ranked.join(F.broadcast(sizes), domain_col)
        .crossJoin(F.broadcast(total))
        .filter(keep)
        .drop("__nd", "__N")
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str | int = 42,
    pos_col: str = "pos",
    shard_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle + balanced sharding — the standard
    pre-training "shuffle then shard" step, reproducible across engines
    and reruns.

    The permutation is ``ORDER BY md5(seed || key)`` (a seeded
    pseudo-random total order any engine can recompute — no RNG state,
    no partition-count dependence), realized as a distributed exact row
    number (``operators/rank.py:distributed_row_number``: one
    range-partition on the hash + per-partition windows + a broadcast
    offset join — never a single-task global sort). Shards are assigned
    round-robin over the permutation (``(pos-1) % n_shards``): sizes
    balanced within one row, and because the order is already random,
    round-robin also decorrelates shard contents — every shard is an
    unbiased 1/n sample of the corpus, which is exactly what data-
    parallel training wants. At 100 TB the cost is one hash projection
    plus the rank's range shuffle: corpus-linear, skew-free (md5 is
    uniform by construction).

    Reference behavior modeled: deterministic batch ordering /
    partitioned export of a loaded table (fastsync split exports),
    upgraded to the seeded global permutation an LLM data pipeline
    ships to trainers.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pipelinewise_spark.operators.rank import distributed_row_number

    h = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), F.col(key_col).cast("string")
        )
    )
    ranked = distributed_row_number(
        df.withColumn("__h", h),
        ["__h", key_col],  # key tie-break: total order even on collision
        out_col=pos_col,
        num_partitions=num_partitions,
    )
    return ranked.withColumn(
        shard_col,
        ((F.col(pos_col) - 1) % n_shards).cast("int"),
    ).drop("__h")


class StreamingDomainCapAdmitter:
    """INGEST-TIME domain frequency caps — the streaming face of
    :func:`domain_cap_mix`: admit at most ``cap`` documents per domain
    over the LIFE of the stream, first-come (deterministically ordered
    by ``order_col`` within each micro-batch), with the leftovers
    dropped at the door instead of by a nightly re-curation pass.

    Determinism contract: ``order_col`` (extended by ``tiebreak_cols``
    when given) must be UNIQUE per domain within a batch — ties under
    row_number would make the admitted subset run-dependent, and the
    crash-safety argument below leans on a replay writing the SAME
    admitted set. Rows with a NULL domain are DROPPED at the door (an
    uncappable domain is not a domain; route them through a default-
    domain projection upstream if they must be kept).

    State is O(domains) and constant in stream length, and — because a
    real web crawl carries 10⁷–10⁸ domains — the per-domain budgets
    live as a PARQUET TABLE (``state_dir/budgets/v=N``), not driver
    JSON: the fold is a distributed full-outer join of the old budget
    table with the epoch's admitted counts, and the admit step joins
    the batch against the budget table with a PLAIN join (AQE turns it
    into a broadcast when the table is small, a shuffle join when it
    is not) — no driver-side materialization at any domain count. Only
    metadata (cap, epoch high-water mark, budget-table version) rides
    the JSON sidecar through the MetaFS seam (s3://-capable, atomic
    writes), the same at-least-once discipline as the streaming
    monitors (operators/drift.py): replaying a folded epoch is a
    no-op.

    Admitted rows land as PER-EPOCH parquet directories
    (``out_dir/epoch=N``, mode=overwrite) — the exactly-once-by-
    epoch-artifact pattern (cf. streaming/mv.py): a writer that dies
    between the artifact write and the state save replays into the
    SAME directory with the SAME admitted set (state unchanged ⇒ same
    budget-table version ⇒ same remaining budgets) and overwrites the
    same next budget version, so duplicates cannot exist.

    Per batch: one batch-sized window (row_number per domain — a batch
    is delta-sized, never the corpus) + one join against the
    O(domains) budget table + one filtered write + one O(domains)
    budget fold.
    """

    def __init__(
        self,
        domain_col: str,
        order_col: str,
        cap: int,
        state_dir: str,
        out_dir: str,
        tiebreak_cols: Sequence[str] | None = None,
    ):
        import json

        import pyarrow.fs as _pafs

        from pipelinewise_spark.operators.fsio import MetaFS

        self.domain_col = domain_col
        self.order_col = order_col
        self.tiebreak_cols = list(tiebreak_cols or [])
        self.cap = int(cap)
        self.out_dir = out_dir
        self.state_dir = state_dir
        self.mfs = MetaFS(state_dir)
        if isinstance(self.mfs.fs, _pafs.LocalFileSystem):
            self.mfs.mkdirs()
        if self.mfs.exists("_domain_cap_state.json"):
            self.state = json.loads(
                self.mfs.read_text("_domain_cap_state.json")
            )
            self.state.setdefault("budget_version", 0)
            return
        self.state = {
            "cap": self.cap,
            "budget_version": 0,
            "epoch_hwm": None,
            "n_applied": 0,
        }
        self._save()

    def _save(self) -> None:
        import json

        self.mfs.write_text(
            json.dumps(self.state), "_domain_cap_state.json", atomic=True
        )

    def _budget_path(self, version: int) -> str:
        return f"{self.state_dir}/budgets/v={int(version)}"

    def budgets(self, spark) -> DataFrame:
        """The live per-domain budget table (``__dom``, ``__used``) —
        a parquet read at the committed version; empty before the
        first fold. A legacy JSON ``admitted`` dict (pre-r12 state)
        is served as a driver frame until the next fold migrates it
        to parquet."""
        legacy = self.state.get("admitted")
        if legacy is not None:
            rows = [(d, int(n)) for d, n in sorted(legacy.items())]
            return local_frame(spark, 
                rows or [("", 0)], "__dom string, __used long"
            ).limit(len(rows))
        v = self.state.get("budget_version", 0)
        if v == 0:
            return local_frame(spark, [], "__dom string, __used long")
        return spark.read.parquet(self._budget_path(v))

    def on_batch(self, batch: DataFrame, epoch: int) -> None:
        """Admit this batch's rows against the remaining per-domain
        budgets; write the admitted slice as this epoch's artifact and
        fold the new counts into the next budget-table version.
        Idempotent per epoch."""
        hwm = self.state.get("epoch_hwm")
        if hwm is not None and epoch <= hwm:
            return
        spark = batch.sparkSession
        dom = F.col(self.domain_col).cast("string")
        used = self.budgets(spark)
        order = [F.col(self.order_col)] + [
            F.col(c) for c in self.tiebreak_cols
        ]
        w = Window.partitionBy(dom).orderBy(*order)
        admitted = (
            batch.filter(dom.isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .join(used, dom == F.col("__dom"), "left")
            .filter(
                F.col("__rn") + F.coalesce(F.col("__used"), F.lit(0))
                <= F.lit(self.cap)
            )
            .drop("__rn", "__dom", "__used")
        )
        admitted.write.mode("overwrite").parquet(
            f"{self.out_dir}/epoch={int(epoch)}"
        )
        # fold the written slice's counts into the next budget version:
        # old budgets ⊔ epoch counts, all distributed (O(domains) rows
        # never touch the driver), overwrite-idempotent on replay
        new_counts = (
            spark.read.parquet(f"{self.out_dir}/epoch={int(epoch)}")
            .groupBy(dom.alias("__dom"))
            .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        )
        next_v = int(self.state.get("budget_version", 0)) + 1
        merged = (
            self.budgets(spark)
            .join(new_counts, "__dom", "full_outer")
            .select(
                "__dom",
                (
                    F.coalesce(F.col("__used"), F.lit(0).cast("long"))
                    + F.coalesce(F.col("__n"), F.lit(0).cast("long"))
                ).alias("__used"),
            )
        )
        merged.write.mode("overwrite").parquet(self._budget_path(next_v))
        self.state["budget_version"] = next_v
        self.state.pop("admitted", None)  # legacy JSON budgets migrated
        self.state["epoch_hwm"] = (
            epoch if hwm is None else max(hwm, epoch)
        )
        self.state["n_applied"] = self.state.get("n_applied", 0) + 1
        self._save()
        # GC: keep the committed version and its predecessor (the
        # crash-replay window); each fold retires one trailing version,
        # so budget storage stays at 2 × O(domains) regardless of
        # stream length
        # sweep DOWNWARD so a crash between _save() and the delete
        # cannot orphan a version forever: the next fold's sweep walks
        # through any contiguous tail the crashed fold left behind
        stale = next_v - 2
        while stale >= 1 and self.mfs.exists("budgets", f"v={stale}"):
            self.mfs.delete_dir("budgets", f"v={stale}")
            stale -= 1

    def admitted(self, spark) -> DataFrame:
        """Every admitted row across all epochs (reads the per-epoch
        artifacts; the epoch partition column is not projected)."""
        return spark.read.parquet(f"{self.out_dir}/epoch=*")
