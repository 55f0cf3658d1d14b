"""Property-based invariants for the r10 second/third-wave operators,
checked against plain-Python models on randomized inputs (one batched
Spark round-trip per property, masking-properties style).

- transition_matrix: counts equal the Python lag model exactly; per-prev
  p_ppm floors sum to (1e6 - residue) with 0 <= residue < #next-states;
  entity boundaries never leak pairs.
- rrf_fuse: invariant to the ORDER of the rankings list (integer points
  are associative), and equal to the Python reciprocal-points model.
- k_anonymity_report: class sizes partition the table (sum == rows);
  l_diversity <= class_size; at_risk == (class_size < k).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import given, settings, strategies as st

from pipelinewise_spark.functions.retrieval import rrf_fuse
from pipelinewise_spark.operators.compliance import k_anonymity_report
from pipelinewise_spark.operators.transitions import transition_matrix

STATES = "abcd"

EVENTS = st.lists(
    st.tuples(st.integers(0, 4), st.sampled_from(STATES)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(EVENTS)
def test_transition_matrix_matches_python_lag_model(spark, events):
    rows = [(uid, i, s) for i, (uid, s) in enumerate(events)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "uid int, seq int, state string")
    got = {
        (r["prev_state"], r["next_state"]): (r["n"], r["p_ppm"])
        for r in transition_matrix(df, "uid", "state", ["seq"]).collect()
    }
    seqs = defaultdict(list)
    for uid, i, s in sorted(rows, key=lambda r: r[1]):
        seqs[uid].append(s)
    want = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            want[(a, b)] += 1
    assert {k: v[0] for k, v in got.items()} == dict(want)
    totals = Counter()
    for (a, _), n in want.items():
        totals[a] += n
    for (a, b), (n, ppm) in got.items():
        assert ppm == (1000000 * n) // totals[a]
    # floors per prev sum to 1e6 minus a residue < #next-states
    by_prev = defaultdict(list)
    for (a, _), (_, ppm) in got.items():
        by_prev[a].append(ppm)
    for a, ppms in by_prev.items():
        assert 1000000 - len(ppms) < sum(ppms) <= 1000000


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 30), min_size=1, max_size=10, unique=True),
        min_size=1,
        max_size=4,
    )
)
def test_rrf_fuse_order_invariant_and_matches_model(spark, lists_):
    frames = [
        spark.createDataFrame(
            [(d, i + 1) for i, d in enumerate(docs)], "doc_id int, rank int"
        )
        for docs in lists_
    ]
    model = Counter()
    seen = Counter()
    for docs in lists_:
        for i, d in enumerate(docs):
            model[d] += 10**9 // (60 + i + 1)
            seen[d] += 1
    fwd = {
        r["doc_id"]: (r["rrf_ppb"], r["n_lists"], r["rank"])
        for r in rrf_fuse(frames, topk=1000).collect()
    }
    rev = {
        r["doc_id"]: (r["rrf_ppb"], r["n_lists"], r["rank"])
        for r in rrf_fuse(list(reversed(frames)), topk=1000).collect()
    }
    assert fwd == rev  # list order can never matter
    assert {d: v[0] for d, v in fwd.items()} == dict(model)
    assert {d: v[1] for d, v in fwd.items()} == dict(seen)
    # ranks follow (points desc, id asc) strictly
    order = sorted(fwd, key=lambda d: (-fwd[d][0], d))
    assert [fwd[d][2] for d in order] == list(range(1, len(order) + 1))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("xy"), st.sampled_from("uv"),
                  st.integers(0, 3)),
        min_size=1,
        max_size=30,
    )
)
def test_k_anonymity_partitions_table(spark, rows):
    df = spark.createDataFrame(rows, "q1 string, q2 string, secret int")
    rep = k_anonymity_report(df, ["q1", "q2"], "secret", k=3).collect()
    assert sum(r["class_size"] for r in rep) == len(rows)
    classes = Counter((q1, q2) for q1, q2, _ in rows)
    secrets = defaultdict(set)
    for q1, q2, s in rows:
        secrets[(q1, q2)].add(s)
    assert len(rep) == len(classes)
    for r in rep:
        key = (r["q1"], r["q2"])
        assert r["class_size"] == classes[key]
        assert r["l_diversity"] == len(secrets[key])
        assert r["l_diversity"] <= r["class_size"]
        assert r["at_risk"] == (r["class_size"] < 3)
