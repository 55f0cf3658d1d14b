"""Round-7 new operators: CCNet perplexity banding, DSIR importance
weights, SemDeDup semantic dedup, temperature mixture sampling —
semantics vs independent pure-Python references and plan shapes vs the
scale contract (no cartesian candidate joins, broadcast-only small
sides, determinism across reruns)."""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from pipelinewise_spark.functions.curation import temperature_sample
from pipelinewise_spark.functions.lm import (
    ccnet_perplexity_buckets,
    dsir_log_weights,
)
from pipelinewise_spark.functions.similarity import semantic_dedup


def _plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


# ------------------------------------------------- CCNet buckets


def test_ccnet_buckets_partition_each_language(spark):
    """Every language splits into head/middle/tail with sizes within one
    of n/3 each, heads have the LOWEST cross-entropy, and the three bands
    are a partition of the language's documents."""
    # doc i mixes i rare tokens with (30-i) common ones — cross-entropy
    # strictly increases with i, so the band split is unambiguous
    rows = [
        (
            i,
            " ".join(["rare%d" % (i * 31 + j) for j in range(i)])
            + " " + " ".join(["the"] * (30 - i)),
            "en" if i % 2 == 0 else "fr",
        )
        for i in range(30)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_perplexity_buckets(d).collect()
    assert len(out) == 30
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        bands = {b: [r for r in rs if r.ppl_bucket == b]
                 for b in ("head", "middle", "tail")}
        assert sum(len(v) for v in bands.values()) == len(rs)
        n = len(rs)
        for b, members in bands.items():
            assert abs(len(members) - n / 3) <= 1 + 1e-9, (lang, b)
        # band ordering: max CE of head <= min CE of tail
        if bands["head"] and bands["tail"]:
            assert max(r.cross_entropy for r in bands["head"]) <= min(
                r.cross_entropy for r in bands["tail"]
            )


def test_ccnet_buckets_no_per_group_sort_task(spark):
    """The banding plan must not contain a cartesian product, and the
    bounds join back as a broadcast."""
    rows = [(i, "a b c", "en") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    plan = _plan_of(ccnet_perplexity_buckets(d), "extended")
    assert "CartesianProduct" not in plan


# ------------------------------------------------- DSIR weights


def _py_dsir(docs, target_langs, num_buckets=64, add_k=1.0):
    """Pure-Python replica: md5-bucketed unigram importance weights."""
    import hashlib

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % num_buckets

    cs: dict = {}
    ct: dict = {}
    for _id, text, lang in docs:
        for tok in text.lower().strip().split():
            b = bucket(tok)
            cs[b] = cs.get(b, 0) + 1
            if lang in target_langs:
                ct[b] = ct.get(b, 0) + 1
    ns = float(sum(cs.values()))
    nt = float(sum(ct.values()))
    out = {}
    for _id, text, lang in docs:
        toks = text.lower().strip().split()
        w = 0.0
        for tok in toks:
            b = bucket(tok)
            w += math.log((ct.get(b, 0) + add_k) / (nt + add_k * num_buckets))
            w -= math.log((cs.get(b, 0) + add_k) / (ns + add_k * num_buckets))
        out[_id] = (len(toks), round(w, 6))
    return out


def test_dsir_matches_pure_python(spark):
    docs = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha alpha delta", "en"),
        (3, "omega psi chi phi", "fr"),
        (4, "beta omega alpha", "fr"),
        (5, "gamma gamma gamma beta", "en"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.n_tokens, r.log_weight)
        for r in dsir_log_weights(
            d, d.filter(F.col("lang") == "en"), "doc_id", "text"
        ).collect()
    }
    want = _py_dsir(docs, {"en"})
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-9, k


def test_dsir_target_docs_weigh_higher(spark):
    """With disjoint vocabularies, target-language documents must receive
    strictly higher importance weights than off-target ones."""
    docs = [(i, "en%d en%d en%d" % (i, i + 1, i + 2), "en") for i in range(8)]
    docs += [(100 + i, "fr%d fr%d fr%d" % (i, i + 1, i + 2), "fr")
             for i in range(8)]
    d = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(
            d, d.filter(F.col("lang") == "en"), "doc_id", "text",
            num_buckets=512,
        ).collect()
    }
    en = [w[i] for i in range(8)]
    fr = [w[100 + i] for i in range(8)]
    assert min(en) > max(fr)


# ------------------------------------------------- SemDeDup


def test_semantic_dedup_keep_first_within_bucket(spark, sf_dir):
    """Against brute force on real embeddings: a vector is flagged iff a
    smaller-id vector shares its LSH bucket at cosine >= tau; exactly one
    survivor (the min id) per duplicate-closure chain start."""
    from pipelinewise_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(80)
    out = {
        r.vec_id: (r.bucket, r.is_semantic_dup)
        for r in semantic_dedup(emb, "vec_id", "embedding", 0.4).collect()
    }
    rows = emb.collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return round(num / (da / 1 * db), 6)

    by_bucket: dict = {}
    for vid, (bkt, _) in out.items():
        by_bucket.setdefault(bkt, []).append(vid)
    for vid, (bkt, flag) in out.items():
        expect = any(
            o < vid and cos(vecs[o], vecs[vid]) >= 0.4
            for o in by_bucket[bkt]
        )
        assert flag == expect, vid
    # survivors: every bucket's minimum id is never flagged
    for bkt, ids in by_bucket.items():
        assert out[min(ids)][1] is False


def test_semantic_dedup_no_cartesian(spark, sf_dir):
    from pipelinewise_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    plan = _plan_of(semantic_dedup(emb, "vec_id", "embedding"), "extended")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------- temperature sampling


def test_temperature_sample_rates_and_determinism(spark):
    """alpha=0.5 temperature: rate_l ∝ budget·√c_l/(Σ√c·c_l). With a
    512:32 head/tail split the tail's keep-RATE must exceed the head's by
    ~4x (√(512/32)=4), realized counts must be within binomial noise of
    expectation, and a rerun selects the identical row set."""
    rows = [(i, "en") for i in range(512)] + [(1000 + i, "fr") for i in range(32)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(d, "doc_id", "lang").collect()
    kept_ids = sorted(r.doc_id for r in kept)
    n_en = sum(1 for r in kept if r.lang == "en")
    n_fr = sum(1 for r in kept if r.lang == "fr")
    s = math.sqrt(512) + math.sqrt(32)
    budget = math.floor(544 * 0.5)
    exp_en = budget * math.sqrt(512) / s
    exp_fr = budget * math.sqrt(32) / s
    assert abs(n_en - exp_en) < 4 * math.sqrt(exp_en)
    assert abs(n_fr - exp_fr) < 4 * math.sqrt(exp_fr) + 2
    # tail rate ≈ 4x head rate
    assert (n_fr / 32) / (n_en / 512) > 2.0
    again = sorted(
        r.doc_id for r in temperature_sample(d, "doc_id", "lang").collect()
    )
    assert again == kept_ids


def test_temperature_sample_rate_caps_at_one(spark):
    """A stratum whose fair-share budget exceeds its size keeps ALL its
    rows (p capped at 1) — the cross-multiplied comparison must not
    overflow or drop rows."""
    rows = [(i, "big") for i in range(5000)] + [(10000, "tiny")]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(d, "doc_id", "lang", budget_frac_pct=90)
    tiny = [r for r in kept.collect() if r.lang == "tiny"]
    assert len(tiny) == 1


def test_temperature_sample_no_corpus_shuffle(spark):
    """The corpus itself must not shuffle: counts aggregate, broadcast
    back, and the filter is a projection."""
    rows = [(i, "en") for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    plan = _plan_of(temperature_sample(d, "doc_id", "lang"))
    # the only exchanges allowed feed the broadcast count/total frames
    import re

    shuffles = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for cols in shuffles:
        assert "lang" in cols, f"unexpected corpus shuffle on ({cols})"


# ------------------------------------------------- epoch upsampling


def test_epoch_upsample_fractional_targets(spark):
    from pipelinewise_spark.functions.curation import epoch_upsample

    rows = [(i, "en" if i < 1000 else "fr") for i in range(1200)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_upsample(
        d, "doc_id", "lang", epochs={"en": 1.25, "fr": 3.0}
    ).collect()
    en = [r for r in out if r.lang == "en"]
    fr = [r for r in out if r.lang == "fr"]
    # fr: exactly 3 copies each, epoch index 1..3
    assert len(fr) == 200 * 3
    assert {r.epoch for r in fr} == {1, 2, 3}
    # en: every doc >= 1 copy; realized epochs ~1.25 (md5 quarter-slice)
    per_doc: dict = {}
    for r in en:
        per_doc[r.doc_id] = max(per_doc.get(r.doc_id, 0), r.epoch)
    assert set(per_doc) == set(range(1000))
    assert set(per_doc.values()) == {1, 2}
    ratio = len(en) / 1000
    assert 1.15 < ratio < 1.35
    # deterministic: same copy set on rerun
    again = epoch_upsample(
        d, "doc_id", "lang", epochs={"en": 1.25, "fr": 3.0}
    ).collect()
    assert sorted((r.doc_id, r.epoch) for r in again) == sorted(
        (r.doc_id, r.epoch) for r in out
    )


def test_epoch_upsample_zero_epochs_drops_stratum(spark):
    from pipelinewise_spark.functions.curation import epoch_upsample

    d = spark.createDataFrame(
        [(1, "keep"), (2, "drop")], "doc_id long, lang string"
    )
    out = epoch_upsample(d, "doc_id", "lang", epochs={"drop": 0.0}).collect()
    assert {r.doc_id for r in out} == {1}
