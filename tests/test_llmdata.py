"""Unit tests for LLM-data operators beyond the oracle comparisons."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pipelinewise_spark.functions import multimodal as M
from pipelinewise_spark.functions import similarity as S
from pipelinewise_spark.queries import QUERIES
from pipelinewise_spark.sources.files import read_table


def test_multimodal_features_stub_runs(spark, sf_dir):
    df = QUERIES["multimodal_features_stub"](spark, sf_dir)
    rows = df.limit(5).collect()
    assert rows and set(df.columns) == {
        "media_id", "media_type", "n_bytes", "width", "height", "n_frames"
    }
    for r in rows:
        assert r.width >= 16 and r.height >= 16 and 1 <= r.n_frames <= 8


def test_multimodal_decode_not_implemented_seam(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").limit(2)
    media = M.to_media_table(d, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        M.extract_features(media, decode_stub=False).collect()


def test_lsh_ann_recall_against_exact(spark, sf_dir):
    """ANN top-k within buckets must agree with exact top-k whenever the
    exact neighbor shares the query's bucket (sanity of the scale path)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in S.cosine_topk(emb, queries, "vec_id", "embedding", k=1).collect()
    }
    ann = S.lsh_ann_topk(emb, queries, "vec_id", "embedding", k=1).collect()
    assert exact, "exact top-k empty"
    # recall@1 of sign-LSH with 8 planes won't be perfect; just require the
    # plumbing returns ranked candidates for most queries
    assert len({r.query_id for r in ann}) >= 1


def test_minhash_pairs_are_subset_of_exact_jaccard(spark, sf_dir):
    """Every LSH-reported pair must truly meet the Jaccard threshold (no
    false positives after verification)."""
    pairs = QUERIES["minhash_lsh_pairs_documents"](spark, sf_dir).collect()
    for r in pairs:
        assert r.jaccard >= 0.3 and r.id_a < r.id_b


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    """IVF with n_probe lists must recover most exact top-1 neighbors
    (recall sanity of the scale path) and never return self-matches."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact_top1 = {
        r.query_id: r.neighbor_id
        for r in S.cosine_topk(emb, queries, "vec_id", "embedding", k=1).collect()
    }
    ivf = S.ivf_topk(emb, queries, "vec_id", "embedding", k=1,
                     num_centroids=8, n_probe=4).collect()
    got = {r.query_id: r.neighbor_id for r in ivf}
    assert all(r.query_id != r.neighbor_id for r in ivf)
    assert len(got) == len(exact_top1)
    hits = sum(1 for q, n in exact_top1.items() if got.get(q) == n)
    assert hits / len(exact_top1) >= 0.5, f"recall@1 too low: {hits}/{len(exact_top1)}"


def test_near_dup_pairs_subset_of_exact_cosine(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    got = {
        (r.a_id, r.b_id): r.cos
        for r in S.signlsh_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    # exact all-pairs reference (small corpus): every reported pair must be a
    # true >=threshold pair with the exact cosine; LSH may miss pairs (recall
    # < 1) but must never invent or mis-score one
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("av"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("bv"))
    exact = {
        (r.a_id, r.b_id): r.cos
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", F.round(S.cosine(F.col("av"), F.col("bv")), 6))
        .filter(F.col("cos") >= 0.4)
        .select("a_id", "b_id", "cos")
        .collect()
    }
    assert got, "banded LSH found no pairs at all"
    for pair, cos in got.items():
        assert pair in exact and exact[pair] == cos
    assert len(got) >= len(exact) * 0.3  # banded recall floor for weak sims


def test_resize_and_frame_sample_decode_seam(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").limit(5)
    media = M.to_media_table(d, "doc_id", "text", media_type="video")
    # the real-decoder seam raises exactly at the stub boundary
    with pytest.raises(Exception):
        M.resize_media(media, decode_stub=False).collect()
    with pytest.raises(Exception):
        M.sample_frames(media, decode_stub=False).collect()
    # row expansion: every media row yields >=1 sampled frame, frame 0 always
    frames = M.sample_frames(media).collect()
    assert {r.media_id for r in frames} == {r.media_id for r in media.collect()}
    assert all(r.ts_ms == r.frame_index * 40 for r in frames)
    assert [r.frame_index for r in frames if r.frame_index == 0]


def test_shard_by_token_budget_two_phase_prefix_sum(spark):
    import pyspark.sql.functions as F

    from pipelinewise_spark.functions.curation import shard_by_token_budget

    df = spark.createDataFrame(
        [(i, 10 * (1 + i % 3)) for i in range(100)], "k long, tok long"
    )
    out = shard_by_token_budget(
        df, "k", "tok", budget=100, num_partitions=7
    ).orderBy("k").collect()
    # reference: driver-side exact prefix sum
    rows = [(i, 10 * (1 + i % 3)) for i in range(100)]
    acc, expected = 0, []
    for k, tok in rows:
        expected.append(acc // 100)
        acc += tok
    assert [r.shard for r in out] == expected
    # shards are contiguous in key order and never skip
    shards = [r.shard for r in out]
    assert shards == sorted(shards)


def _bpe_reference(texts, num_merges):
    """Pure-Python BPE (greedy left-to-right merge, lexicographic
    tie-break) — the ground truth for the distributed trainer."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            words[w] += 1
    syms = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, freq in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((left, right, n))
        for w in syms:
            s, out = syms[w], []
            for tok in s:
                if out and out[-1] == left and tok == right:
                    out[-1] = left + right
                else:
                    out.append(tok)
            syms[w] = out
    return merges


def test_bpe_train_matches_reference(spark, sf_dir):
    from pipelinewise_spark.functions.bpe import bpe_train

    d = read_table(spark, sf_dir, "documents").limit(50)
    texts = [r.text for r in d.collect()]
    got = bpe_train(d, "text", num_merges=8)
    want = _bpe_reference(texts, 8)
    assert got == want
    # merges are usable: counts non-increasing is NOT guaranteed by BPE,
    # but every count is positive and pairs are distinct
    assert all(n > 0 for _, _, n in got)
    assert len({(a, b) for a, b, _ in got}) == len(got)


def test_strip_boilerplate_semantics(spark):
    from pipelinewise_spark.functions.curation import strip_boilerplate

    nav = "subscribe now"
    docs = [
        (1, f"{nav}\nunique one\nfooter"),
        (2, f"{nav}\nunique two\nfooter"),
        (3, f"{nav}\nunique three\nfooter"),
        (4, f"{nav}\nfooter"),  # becomes empty once boilerplate goes
        (5, "only here\nappears twice"),
        (6, "appears twice"),  # 2 docs < min_docs=3 -> kept
    ]
    out = {
        r["doc"]: r
        for r in strip_boilerplate(
            spark.createDataFrame(docs, "doc long, text string"),
            "doc", "text", min_docs=3,
        ).collect()
    }
    assert out[1]["cleaned"] == "unique one"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_removed"] == 2
    # NAV appears in 4 docs, footer in 4 -> doc 4 is pure chrome
    assert out[4]["cleaned"] == "" and out[4]["n_lines_kept"] == 0
    # below-threshold repeats survive, order preserved
    assert out[5]["cleaned"] == "only here\nappears twice"
    assert out[6]["cleaned"] == "appears twice"


def test_chunk_by_tokens_edges(spark):
    import pyspark.sql.functions as F

    from pipelinewise_spark.functions.curation import chunk_by_tokens

    cases = {
        1: list("abc"),            # n < window
        2: list("abcde"),          # n == window
        3: list("abcdef"),         # n == window + 1 -> second partial chunk
        4: [],                     # empty -> no rows
        5: list("abcdefghij"),     # several chunks
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in cases.items()], "doc long, toks array<string>"
    )
    out = chunk_by_tokens(df, "doc", "toks", window=5, stride=3)
    rows = sorted(
        ((r["doc"], r["chunk_id"], r["chunk_start"], r["chunk_text"], r["n_tokens"])
         for r in out.collect())
    )
    for doc, cid, start, text, n in rows:
        toks = cases[doc]
        assert start == 1 + cid * 3
        expect = toks[start - 1 : start - 1 + 5]
        assert text.split(" ") == expect and n == len(expect)
    # every token of every doc is inside at least one chunk
    for doc, toks in cases.items():
        covered = set()
        for d, cid, start, text, n in rows:
            if d == doc:
                covered.update(range(start - 1, start - 1 + n))
        assert covered == set(range(len(toks))), doc
    assert not [r for r in rows if r[0] == 4]


def test_strip_boilerplate_idempotent(spark):
    from pipelinewise_spark.functions.curation import strip_boilerplate

    nav = "subscribe now"
    docs = [(i, f"{nav}\nbody {i}\nfooter") for i in range(1, 7)]
    df = spark.createDataFrame(docs, "doc long, text string")
    once = strip_boilerplate(df, "doc", "text", min_docs=3)
    # a second pass over the cleaned corpus removes nothing: stripping is a
    # fixed point (cleaned docs contain only sub-threshold lines)
    twice = strip_boilerplate(
        once.select("doc", "cleaned"), "doc", "cleaned", min_docs=3
    )
    a = {r["doc"]: r["cleaned"] for r in once.collect()}
    b = {r["doc"]: r["cleaned"] for r in twice.collect()}
    assert a == b
    assert all(r["n_lines_removed"] == 0 for r in twice.collect())


def test_bpe_encode_matches_reference(spark, sf_dir):
    from pipelinewise_spark.functions.bpe import bpe_encode_counts, bpe_train

    d = read_table(spark, sf_dir, "documents").limit(40)
    texts = {r.doc_id: r.text for r in d.collect()}
    merges = bpe_train(d, "text", num_merges=8)

    # pure-Python encode with the same merges
    def encode(word):
        syms = list(word) + ["</w>"]
        for left, right, _ in merges:
            out = []
            for tok in syms:
                if out and out[-1] == left and tok == right:
                    out[-1] = left + right
                else:
                    out.append(tok)
            syms = out
        return syms

    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in bpe_encode_counts(d, "doc_id", "text", merges).collect()
    }
    for doc_id, text in texts.items():
        words = text.lower().strip().split()
        want = (len(words), sum(len(encode(w)) for w in words))
        assert got[doc_id] == want, doc_id


def test_cluster_aware_split_no_leakage(spark, sf_dir):
    """No near-dup component may span train and valid."""
    import pyspark.sql.functions as F

    from pipelinewise_spark.functions.clusters import cluster_aware_split
    from pipelinewise_spark.functions.dedup import minhash_lsh_pairs
    from pipelinewise_spark.sources.files import read_table

    d = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.3)
    out = cluster_aware_split(d, pairs, "doc_id", valid_percent=20)
    spanning = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("sides"))
        .filter(F.col("sides") > 1)
        .count()
    )
    assert spanning == 0
    # both sides exist at a 20% rate on 500 docs
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides == {"train", "valid"}


def test_mean_pool_vectors_matches_exact_sums(spark, sf_dir):
    import pyspark.sql.functions as F

    from pipelinewise_spark.functions.similarity import mean_pool_vectors
    from pipelinewise_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    pooled = mean_pool_vectors(emb, "label", "embedding")
    got = {
        (r["label"], r["pos"]): r["m"]
        for r in pooled.select(
            "label", F.posexplode("pooled").alias("pos", "m")
        ).collect()
    }
    exact = {
        (r["label"], r["pos"]): (r["s"], r["n"])
        for r in emb.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        )
        .groupBy("label", "pos")
        .agg(
            F.sum(F.col("x").cast("decimal(28,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, (s, n) in exact.items():
        assert abs(got[k] - float(s) / n) < 1e-12, k
    # vector shape survives: every label has a dim-64 pooled array
    dims = {len(r["pooled"]) for r in pooled.collect()}
    assert dims == {64}


def test_shuffle_shards_balance_and_determinism(spark):
    from pipelinewise_spark.functions.curation import shuffle_shards

    df = spark.range(103).select(F.col("id").alias("k"))
    a = shuffle_shards(df, "k", n_shards=8, seed=7, num_partitions=4)
    sizes = {r["shard"]: r["n"] for r in
             a.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert set(sizes) == set(range(8))
    # partition-count invariance: identical (pos, shard) assignment
    b = shuffle_shards(df, "k", n_shards=8, seed=7, num_partitions=13)
    assert a.select("k", "pos", "shard").exceptAll(
        b.select("k", "pos", "shard")
    ).count() == 0
    # a different seed is a different permutation
    c = shuffle_shards(df, "k", n_shards=8, seed=8, num_partitions=4)
    assert c.select("k", "pos").exceptAll(a.select("k", "pos")).count() > 0


def test_perceptual_hash_locality_and_hamming_completeness(spark):
    from pipelinewise_spark.functions.dedup import hamming_near_dup_pairs
    from pipelinewise_spark.functions.multimodal import (
        perceptual_hash,
        to_media_table,
    )

    base = b"A" * 200 + bytes(range(56))
    tweaked = base[:-3] + b"zzz"          # re-save with a changed tail
    other = bytes((i * 37 + 11) % 251 for i in range(256))
    df = spark.createDataFrame(
        [(1, base), (2, tweaked), (3, other)], "id long, payload binary"
    )
    ph = perceptual_hash(to_media_table(df, "id", "payload"))
    sigs = {r["media_id"]: r["phash"] for r in ph.collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sigs[1], sigs[2]) <= 3, "near-identical payloads diverge"
    assert ham(sigs[1], sigs[3]) > 3, "unrelated payloads collide"

    # pigeonhole completeness: banded pairs == brute force at ham <= 3
    import random

    rnd = random.Random(11)
    rows = [(i, rnd.getrandbits(32)) for i in range(120)]
    # plant near pairs
    rows += [(1000 + i, rows[i][1] ^ (1 << (i % 32))) for i in range(10)]
    sdf = spark.createDataFrame(rows, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup_pairs(
            sdf, "id", "sig", bits=32, num_bands=4, max_hamming=3
        ).collect()
    }
    brute = {
        (a, b, bin(x ^ y).count("1"))
        for (a, x) in rows
        for (b, y) in rows
        if a < b and bin(x ^ y).count("1") <= 3
    }
    assert got == brute and len(brute) >= 10


def test_hamming_pairs_signed_signatures(spark):
    """A 32-bit signature stored SIGNED (top bit set -> negative long)
    must not sign-extend through the XOR: a pair differing only in bit
    31 is Hamming 1, not 33."""
    from pipelinewise_spark.functions.dedup import hamming_near_dup_pairs

    a = 0x80000001 - (1 << 32)   # negative: bits 0 and 31 set
    b = 0x00000001               # bit 0 set
    sdf = spark.createDataFrame([(1, a), (2, b)], "id long, sig long")
    got = hamming_near_dup_pairs(
        sdf, "id", "sig", bits=32, num_bands=4, max_hamming=3
    ).collect()
    assert len(got) == 1 and got[0]["hamming"] == 1
