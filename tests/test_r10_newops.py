"""Unit pins for the r10 second/third-wave operators: k-anonymity
report, Markov transition matrix, reciprocal-rank fusion, corpus data
card, frequent event paths, TF-IDF keyword extraction.

Edge semantics each operator must hold (the registry compare proves the
happy path against DuckDB; these pin the branches the sf tables don't
exercise)."""

from __future__ import annotations


from pipelinewise_spark.functions.retrieval import rrf_fuse
from pipelinewise_spark.operators.compliance import (
    k_anonymity_report,
    k_anonymity_summary,
)
from pipelinewise_spark.operators.datacard import data_card
from pipelinewise_spark.operators.transitions import transition_matrix


def test_k_anonymity_report_classes_and_risk(spark):
    df = spark.createDataFrame(
        [
            ("a", "x", 1),
            ("a", "x", 1),
            ("a", "x", 2),
            ("b", "y", 3),  # singleton class: k=1, l=1
        ],
        "qi1 string, qi2 string, secret int",
    )
    rep = {
        (r["qi1"], r["qi2"]): r
        for r in k_anonymity_report(
            df, ["qi1", "qi2"], "secret", k=2
        ).collect()
    }
    assert rep[("a", "x")]["class_size"] == 3
    assert rep[("a", "x")]["l_diversity"] == 2
    assert not rep[("a", "x")]["at_risk"]
    assert rep[("b", "y")]["class_size"] == 1
    assert rep[("b", "y")]["l_diversity"] == 1
    assert rep[("b", "y")]["at_risk"]


def test_k_anonymity_no_sensitive_degenerates_to_class_size(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "qi string"
    )
    rep = {
        r["qi"]: r for r in k_anonymity_report(df, ["qi"], k=2).collect()
    }
    assert rep["a"]["l_diversity"] == rep["a"]["class_size"] == 2
    assert rep["b"]["at_risk"]


def test_k_anonymity_summary_ppm(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 3 + [("b", 2)], "qi string, secret int"
    )
    row = k_anonymity_summary(df, ["qi"], "secret", k=2).collect()[0]
    assert row["k_anonymity"] == 1
    assert row["l_diversity"] == 1
    assert row["n_classes"] == 2
    assert row["rows_at_risk"] == 1
    assert row["at_risk_ppm"] == 250000  # floor(1e6 * 1/4)


def test_transition_matrix_counts_and_ppm(spark):
    # user 1: a -> b -> a -> b ; user 2: b -> b
    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
            (2, 1, "b"), (2, 2, "b"),
        ],
        "uid int, seq int, state string",
    )
    out = {
        (r["prev_state"], r["next_state"]): r
        for r in transition_matrix(df, "uid", "state", ["seq"]).collect()
    }
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "b")]["p_ppm"] == 1000000  # a always -> b
    assert out[("b", "a")]["n"] == 1
    assert out[("b", "b")]["n"] == 1
    assert out[("b", "a")]["p_ppm"] == 500000
    # single-event entities contribute no pairs
    assert len(out) == 3


def test_transition_matrix_min_count_keeps_denominator(spark):
    df = spark.createDataFrame(
        [(1, i, s) for i, s in enumerate(["a", "b", "a", "b", "a", "c"])],
        "uid int, seq int, state string",
    )
    out = {
        (r["prev_state"], r["next_state"]): r
        for r in transition_matrix(
            df, "uid", "state", ["seq"], min_count=2
        ).collect()
    }
    # (a,c) n=1 dropped, but (a,b) keeps its TRUE denominator of 3
    assert ("a", "c") not in out
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "b")]["p_ppm"] == 666666


def test_rrf_fuse_missing_doc_and_order(spark):
    l1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id int, rank int"
    )
    l2 = spark.createDataFrame(
        [(20, 1), (10, 2)], "doc_id int, rank int"
    )
    rows = {
        r["doc_id"]: r
        for r in rrf_fuse([l1, l2], k=60, topk=10).collect()
    }
    pts = lambda r: 10**9 // (60 + r)  # noqa: E731
    assert rows[10]["rrf_ppb"] == pts(1) + pts(2)
    assert rows[20]["rrf_ppb"] == pts(2) + pts(1)
    assert rows[30]["rrf_ppb"] == pts(3)
    assert rows[30]["n_lists"] == 1
    # 10 and 20 tie exactly on integer points -> id tie-break
    assert rows[10]["rank"] == 1 and rows[20]["rank"] == 2
    assert rows[30]["rank"] == 3


def test_rrf_fuse_topk_cuts(spark):
    l1 = spark.createDataFrame(
        [(i, i) for i in range(1, 8)], "doc_id int, rank int"
    )
    out = rrf_fuse([l1], topk=3).collect()
    assert len(out) == 3
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1, 2, 3,
    ]


def test_data_card_tiny_corpus(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world", "en"),
            (2, "hello world", "en"),  # exact dup of doc 1
            (3, "bonjour", "fr"),
            (4, "le monde entier", "fr"),
        ],
        "doc_id int, text string, lang string",
    )
    card = {
        (r["section"], r["metric"]): r["value"]
        for r in data_card(df, "doc_id", "text", mix_cols=("lang",)).collect()
    }
    assert card[("corpus", "docs")] == 4.0
    assert card[("corpus", "total_tokens")] == 8.0
    assert card[("dedup", "exact_dup_ppm")] == 250000.0  # 1 of 4 is a dup
    assert card[("lang_mix_ppm", "en")] == 500000.0
    assert card[("lang_mix_ppm", "fr")] == 500000.0
    # discrete quantiles of token counts [1, 2, 2, 3]
    assert card[("token_quantiles", "p10")] == 1.0
    assert card[("token_quantiles", "p50")] == 2.0
    assert card[("token_quantiles", "p90")] == 3.0


def test_data_card_null_mix_bucket(spark):
    df = spark.createDataFrame(
        [(1, "a b", None), (2, "c", "web")],
        "doc_id int, text string, src string",
    )
    card = {
        (r["section"], r["metric"]): r["value"]
        for r in data_card(df, "doc_id", "text", mix_cols=("src",)).collect()
    }
    assert card[("src_mix_ppm", "<null>")] == 500000.0
    assert card[("src_mix_ppm", "web")] == 500000.0


def test_frequent_paths_trigrams(spark):
    from pipelinewise_spark.operators.transitions import frequent_paths

    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
            (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
        ],
        "uid int, seq int, state string",
    )
    out = {
        r["path"]: r
        for r in frequent_paths(df, "uid", "state", ["seq"], n=3).collect()
    }
    assert out["a>b>c"]["n_occurrences"] == 2
    assert out["b>c>a"]["n_occurrences"] == 1
    assert len(out) == 2  # entity boundaries never produce cross-user paths
    assert out["a>b>c"]["rank"] == 1


def test_frequent_paths_short_entities_drop(spark):
    from pipelinewise_spark.operators.transitions import frequent_paths

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "x")],
        "uid int, seq int, state string",
    )
    assert frequent_paths(df, "uid", "state", ["seq"], n=3).count() == 0
    # but the same data still yields a bigram
    rows = frequent_paths(df, "uid", "state", ["seq"], n=2).collect()
    assert len(rows) == 1 and rows[0]["path"] == "a>b"


def test_frequent_paths_null_state_drops_window(spark):
    """A NULL state anywhere in the window disqualifies the path —
    concat_ws would otherwise silently skip it and render a string
    indistinguishable from a genuine shorter path (r10 ADVICE)."""
    from pipelinewise_spark.operators.transitions import frequent_paths

    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, None), (1, 3, "c"), (1, 4, "d"),
            (2, 1, "a"), (2, 2, "c"),
        ],
        "uid int, seq int, state string",
    )
    out = {
        r["path"]: r["n_occurrences"]
        for r in frequent_paths(df, "uid", "state", ["seq"], n=3).collect()
    }
    # user 1's a>NULL>c and NULL>c>d windows must NOT collapse into
    # "a>c" / "c>d" lookalikes; only the clean NULL-free window survives
    assert out == {}
    bi = {
        r["path"]: r["n_occurrences"]
        for r in frequent_paths(df, "uid", "state", ["seq"], n=2).collect()
    }
    # the genuine a>c bigram (user 2) counts ONCE — user 1's a>NULL
    # and NULL>c windows are dropped, not rendered as "a" / "c"
    assert bi == {"a>c": 1, "c>d": 1}


def test_tfidf_keywords_scores_and_cut(spark):
    import math

    from pipelinewise_spark.functions.retrieval import tfidf_keywords

    df = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
        ],
        "doc_id int, text string",
    )
    out = {
        (r["doc_id"], r["term"]): r
        for r in tfidf_keywords(df, "doc_id", "text", topk=2).collect()
    }
    # 'common' appears in all docs -> idf 0 -> never a top keyword when
    # a rarer term exists; doc 1's top term is apple (tf=2, df=1)
    assert out[(1, "apple")]["rank"] == 1
    assert abs(
        out[(1, "apple")]["score"] - round(2 * math.log(3 / 1), 6)
    ) < 1e-9
    assert out[(3, "cherry")]["rank"] == 1
    # every doc gets at most topk rows
    from collections import Counter

    c = Counter(doc for doc, _ in out)
    assert max(c.values()) <= 2


def test_tfidf_min_len_filters_short_terms(spark):
    from pipelinewise_spark.functions.retrieval import tfidf_keywords

    df = spark.createDataFrame(
        [(1, "an it to zebra"), (2, "an it to")],
        "doc_id int, text string",
    )
    rows = tfidf_keywords(df, "doc_id", "text", topk=5).collect()
    assert {r["term"] for r in rows} == {"zebra"}


def test_vocab_drift_oov_accounting_and_flags(spark):
    from pipelinewise_spark.operators.drift import vocab_drift

    ref = spark.createDataFrame(
        [("aa bb aa",), ("aa cc",)], "text string"
    )  # counts: aa=3 bb=1 cc=1 -> top-2 alphabet = {aa, bb} (cc ties bb,
    #    term tie-break keeps bb)
    cur = spark.createDataFrame(
        [("aa zz zz zz",)], "text string"
    )  # zz is out-of-alphabet: 3 of 4 current tokens land in (oov)
    rows = {
        r["term"]: r
        for r in vocab_drift(ref, cur, "text", top_k=2,
                             threshold_ppm=100_000).collect()
    }
    assert set(rows) == {"aa", "bb", "(oov)"}
    assert rows["aa"]["ref_cnt"] == 3 and rows["aa"]["cur_cnt"] == 1
    assert rows["(oov)"]["ref_cnt"] == 1  # cc
    assert rows["(oov)"]["cur_cnt"] == 3  # zz
    assert rows["aa"]["ref_ppm"] == 600000 and rows["aa"]["cur_ppm"] == 250000
    # TVD = (|3*4-1*5| + |1*4-0*5| + |1*4-3*5|)/(2*5*4) = 22/40 = 550000ppm
    assert rows["aa"]["tvd_ppm"] == 550000
    assert rows["aa"]["drifted"]


def test_vocab_drift_empty_current_is_max_drift(spark):
    from pipelinewise_spark.operators.drift import vocab_drift

    ref = spark.createDataFrame([("aa bb",)], "text string")
    cur = spark.createDataFrame([], "text string")
    rows = vocab_drift(ref, cur, "text", top_k=5).collect()
    assert rows and all(r["tvd_ppm"] == 1000000 for r in rows)
    assert all(r["cur_ppm"] == 0 for r in rows)


def test_ranking_metrics_perfect_and_empty(spark):
    from pipelinewise_spark.functions.retrieval import ranking_metrics

    results = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 20, 2), ("q2", 30, 1), ("q2", 40, 2)],
        "query_id string, doc_id int, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 10, 2.0), ("q1", 20, 1.0)],
        "query_id string, doc_id int, grade double",
    )
    out = {
        r["query_id"]: r
        for r in ranking_metrics(results, qrels, k=2).collect()
    }
    # q1: perfect ranking (grades already descending) -> ndcg 1, mrr 1
    assert out["q1"]["ndcg"] == 1.0 and out["q1"]["mrr"] == 1.0
    assert out["q1"]["precision_ppm"] == 1_000_000
    assert out["q1"]["recall_ppm"] == 1_000_000
    # q2: nothing judged relevant -> all zeros, no division blowups
    assert out["q2"]["ndcg"] == 0.0 and out["q2"]["mrr"] == 0.0
    assert out["q2"]["hits_at_k"] == 0 and out["q2"]["n_relevant"] == 0


def test_ranking_metrics_inverted_order_and_recall(spark):
    from pipelinewise_spark.functions.retrieval import ranking_metrics

    # best doc (grade 3) ranked LAST of 3; one relevant doc missed
    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id int, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 3, 3.0), ("q", 2, 1.0), ("q", 99, 2.0)],
        "query_id string, doc_id int, grade double",
    )
    row = ranking_metrics(results, qrels, k=3).collect()[0]
    import math

    dcg = 1.0 / math.log2(3) + 3.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert row["ndcg"] == round(dcg / idcg, 6)
    assert row["mrr"] == 0.5  # first relevant at rank 2
    assert row["hits_at_k"] == 2 and row["n_relevant"] == 3
    assert row["recall_ppm"] == 666666
    assert row["precision_ppm"] == 666666
