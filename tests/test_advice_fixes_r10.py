"""Round-10 ADVICE fixes, pinned by test.

1. MetaFS._s3_put_if_absent mirrors the S3 addressing baked into the root
   URI (region / endpoint_override / credentials) instead of defaulting
   to boto3's ambient AWS config — the conditional-PUT CAS object must
   land on the SAME store as the rest of the metadata IO. URIs carrying
   options the mirror does not understand degrade to the warned
   probe+PUT path rather than CAS-ing the wrong store.
2. Zero-row Arrow batches: the k-means argmin kernel and the PQ code
   kernel early-return an empty series instead of raising IndexError on
   the 1-D (0,) array a zero-row tolist() produces.
3. KS / Mann-Whitney drift ppm arithmetic runs in decimal(38,0): with
   ~3M+ rows per side per segment, 1e6·d2 (and MW's rank products) pass
   2^63 and plain LongType would wrap SILENTLY in non-ANSI Spark while
   the DuckDB HUGEINT oracle stays exact. Same fix in the global KS
   (queries/analytics.py).
4. StreamingDriftMonitor epoch bookkeeping is O(1): a high-water mark +
   count instead of an ever-growing applied-epoch list with O(n)
   membership and a linearly-growing JSON sidecar; legacy sidecars with
   ``applied_epochs`` lists migrate losslessly on load.
"""

from __future__ import annotations

import json
import os
import tempfile

import pandas as pd
import pyspark.sql.functions as F

from pipelinewise_spark.operators.fsio import MetaFS


# --------------------------------------------------------------- fix 1
def test_s3_client_kwargs_mirrors_uri_options():
    mfs = MetaFS.__new__(MetaFS)  # no S3 construction needed: the mirror
    mfs.root_uri = (                # reads only the root URI
        "s3://bucket/meta?endpoint_override=minio.local:9000&scheme=http"
        "&region=eu-west-1&access_key=ak&secret_key=sk"
    )
    kw = mfs._s3_client_kwargs()
    assert kw == {
        "region_name": "eu-west-1",
        "endpoint_url": "http://minio.local:9000",
        "aws_access_key_id": "ak",
        "aws_secret_access_key": "sk",
    }


def test_s3_client_kwargs_plain_uri_is_default_client():
    mfs = MetaFS.__new__(MetaFS)
    mfs.root_uri = "s3://bucket/meta"
    assert mfs._s3_client_kwargs() == {}


def test_s3_client_kwargs_unknown_option_degrades():
    mfs = MetaFS.__new__(MetaFS)
    mfs.root_uri = "s3://bucket/meta?role_arn=arn:aws:iam::1:role/x"
    assert mfs._s3_client_kwargs() is None  # -> warned probe+PUT path


# --------------------------------------------------------------- fix 2
def test_kmeans_argmin_kernel_empty_batch(spark):
    from pipelinewise_spark.functions.kmeans import _argmin_udf

    udf = _argmin_udf([(1, [0, 0], 1), (2, [10, 10], 1)])
    out = udf.func(pd.Series([], dtype=object))
    assert len(out) == 0


def test_pq_codes_kernel_empty_batch(spark):
    from pipelinewise_spark.functions.similarity import _pq_codes_udf

    udf = _pq_codes_udf([[[0.0, 0.0], [1.0, 1.0]]], dim=2)
    out = udf.func(pd.Series([], dtype=object))
    assert len(out) == 0


# --------------------------------------------------------------- fix 3
def _two_sided(spark, n):
    # disjoint value ranges maximize the sup-distance / rank separation:
    # d2 == n_ref*n_cur and 2*U_ref == 2*n_ref*n_cur, so 1e6*d2 ~ 3.3e19
    # overflows int64 exactly where the old LongType arithmetic wrapped
    ref = spark.range(n).select(
        F.lit("s").alias("seg"), (F.col("id") + 100_000_000).alias("v")
    )
    cur = spark.range(n).select(
        F.lit("s").alias("seg"), F.col("id").alias("v")
    )
    return ref, cur


def test_ks_drift_ppm_exact_past_int64(spark):
    from pipelinewise_spark.operators.drift import ks_drift_by_segment

    n = 3_200_000  # n^2 = 1.024e13 -> 1e6*d2 = 1.024e19 > 2^63
    ref, cur = _two_sided(spark, n)
    row = ks_drift_by_segment(ref, cur, "v", "seg").first()
    assert row["d_ppm"] == 1_000_000 and bool(row["significant"])


def test_mw_drift_ppm_exact_past_int64(spark):
    from pipelinewise_spark.operators.drift import mw_drift_by_segment

    n = 3_200_000
    ref, cur = _two_sided(spark, n)  # ref values ABOVE cur: U_ref maximal
    row = mw_drift_by_segment(ref, cur, "v", "seg").first()
    assert row["effect_ppm"] == 1_000_000 and bool(row["drifted"])


# --------------------------------------------------------------- fix 4
def test_streaming_monitor_epoch_state_is_constant_size(spark):
    from pipelinewise_spark.operators.drift import StreamingDriftMonitor

    ref = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 17).cast("double").alias("x")
    )
    tmp = tempfile.mkdtemp(prefix="pws_r10_mon_")
    mon = StreamingDriftMonitor(ref, "x", ["k"], tmp, n_buckets=4)
    batch = ref.limit(10)
    for epoch in (0, 1, 2):
        mon.on_batch(batch, epoch)
    assert mon.state["n_applied"] == 3 and mon.state["epoch_hwm"] == 2
    before = dict(mon.state["cur"])
    mon.on_batch(batch, 1)  # redelivery below the mark: no-op
    mon.on_batch(batch, 2)
    assert mon.state["n_applied"] == 3 and mon.state["cur"] == before
    assert "applied_epochs" not in mon.state
    mon.on_batch(batch, 3)
    assert mon.state["n_applied"] == 4 and mon.state["epoch_hwm"] == 3


def test_streaming_monitor_migrates_legacy_epoch_list(spark):
    from pipelinewise_spark.operators.drift import StreamingDriftMonitor

    ref = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("x")
    )
    tmp = tempfile.mkdtemp(prefix="pws_r10_mig_")
    mon = StreamingDriftMonitor(ref, "x", ["k"], tmp, n_buckets=4)
    legacy = dict(mon.state)
    legacy.pop("epoch_hwm"), legacy.pop("n_applied")
    legacy["applied_epochs"] = [0, 1, 2, 3, 4]
    with open(os.path.join(tmp, "_drift_state.json"), "w") as fh:
        json.dump(legacy, fh)
    mon2 = StreamingDriftMonitor(ref, "x", ["k"], tmp, n_buckets=4)
    assert mon2.state["epoch_hwm"] == 4 and mon2.state["n_applied"] == 5
    assert "applied_epochs" not in mon2.state
    before = dict(mon2.state["cur"])
    mon2.on_batch(ref.limit(5), 2)  # below the migrated mark: no-op
    assert mon2.state["cur"] == before
