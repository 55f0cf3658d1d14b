"""pack_sequences: greedy semantics (reset at overflow), oversized rows get
their own example, determinism across partition counts."""

from __future__ import annotations

from pipelinewise_spark.functions.curation import pack_sequences


def _packed(df):
    return sorted(
        (r["doc_id"], r["shard"], r["example"]) for r in df.collect()
    )


def test_greedy_and_oversized(spark):
    # one shard (budget 10000): tokens 300+200=500, +400 overflows -> ex 1,
    # then 9000 (oversized alone) -> ex 2, then 100 -> ex 3
    df = spark.createDataFrame(
        [(1, 300), (2, 200), (3, 400), (4, 9000), (5, 100)],
        "doc_id long, n_tokens long",
    )
    out = pack_sequences(
        df, "doc_id", "n_tokens", max_tokens=512, shard_budget=100000
    )
    got = {r["doc_id"]: r["example"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}


def test_deterministic_across_parallelism(spark):
    rows = [(i, 50 + (i * 37) % 400) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = pack_sequences(df, "doc_id", "n_tokens", 512, 2000, num_partitions=2)
    b = pack_sequences(
        df.repartition(13), "doc_id", "n_tokens", 512, 2000, num_partitions=7
    )
    assert _packed(a) == _packed(b)


def test_random_matches_pure_python_reference(spark):
    import random

    def ref_pack(tokens):
        ex, out, acc, cur = [], [], 0, 0
        for i, t in enumerate(tokens):
            if i == 0:
                acc = t
            elif acc + t > 512:
                cur += 1
                acc = t
            else:
                acc += t
            out.append(cur)
        return out

    for seed in range(3):
        rng = random.Random(seed)
        toks = [rng.randint(1, 700) for _ in range(rng.randint(1, 120))]
        rows = [(i, t) for i, t in enumerate(toks)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        # one giant shard => the Spark pack must equal the GLOBAL greedy
        out = pack_sequences(
            df, "doc_id", "n_tokens", max_tokens=512, shard_budget=10**9
        )
        got = [
            r["example"]
            for r in out.orderBy("doc_id").collect()
        ]
        assert got == ref_pack(toks), f"seed {seed}"
