"""Z-order clustering — multi-dimensional layout for footer-stats skipping.

ManifestTable skips files whose [min, max] can't overlap a predicate
(manifest_table.py:select_entries). That only pays if the layout makes
per-file ranges TIGHT: a table sorted by one column prunes on that column
alone, while a point/box query on two columns (customer AND price band; the
canonical lakehouse ask) still reads every file. Interleaving the bits of
both columns (the Morton / Z-curve) gives files that are small rectangles
in the 2-D space, so min/max on BOTH columns are tight and a 2-D box prunes
to the handful of files its rectangle intersects — the same layout Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite produce.

Plan shape: one metadata-scale agg to learn each column's [min, max], then
a pure-Column Z-value expression (bit tests + shifts, whole-stage codegen —
no UDF), a repartitionByRange on it (one skew-aware range shuffle; Spark
samples the keys) and a within-partition sort. Cost is one shuffle of the
data being laid out, identical to any OPTIMIZE run, amortized over every
subsequent pruned read.

Linear min-max normalization is used per dimension (like Delta's
range-partition-id approach it tolerates moderate skew because
repartitionByRange equalizes FILE sizes regardless of where the curve
spends its time; a heavily skewed column should be bucketed/log-scaled by
the caller first — documented, not hidden).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(c: Column, dtype: str) -> Column:
    """Numeric / date / timestamp dimension -> double position."""
    if dtype in ("date",):
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("double")
    if dtype.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    return c.cast("double")


def zvalue(df: DataFrame, cols: Sequence[str], bits: int = 16) -> Column:
    """The Morton key as a Column expression.

    Each dimension is normalized to an integer grid cell in [0, 2^bits) by
    linear min-max scaling (one driver-side agg collects 2*len(cols)
    scalars — metadata, not data), then the cells' bits are interleaved:
    bit i of dimension j lands at position i*ndims + j. NULL orders last
    (all-ones cell). 16 bits x 2-4 dims stays inside a bigint.
    """
    if not cols:
        raise ValueError("zvalue needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*ndims must fit a bigint: {bits}*{len(cols)}")
    dtypes = dict(df.dtypes)
    stats = df.agg(
        *[F.min(_as_double(F.col(c), dtypes[c])).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(_as_double(F.col(c), dtypes[c])).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]

    ndims = len(cols)
    cell_max = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = stats[f"mn_{j}"], stats[f"mx_{j}"]
        v = _as_double(F.col(c), dtypes[c])
        if mn is None or mx is None or mx == mn:
            cell = F.lit(0).cast("long")
        else:
            scaled = (v - F.lit(float(mn))) / F.lit(float(mx) - float(mn))
            cell = F.floor(scaled * F.lit(float(cell_max))).cast("long")
            # clamp: values can brush the edges of [mn, mx] in FP
            cell = F.least(F.greatest(cell, F.lit(0)), F.lit(cell_max))
        cell = F.when(F.col(c).isNull(), F.lit(cell_max)).otherwise(cell)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, i).bitwiseAND(F.lit(1)),
                    i * ndims + j,
                )
            )
    return z


def cluster_by(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Lay ``df`` out along the Z-curve of ``cols``: range-repartition on
    the Z-value (contiguous curve segments -> one file each, sizes
    equalized by Spark's range sampler) and sort within partitions so row
    groups are tight too. The Z expression is passed straight to the
    exchange/sort — no helper column survives into the output schema."""
    z = zvalue(df, cols, bits)
    part = (
        df.repartitionByRange(num_files, z)
        if num_files is not None
        else df.repartitionByRange(z)
    )
    return part.sortWithinPartitions(z)
