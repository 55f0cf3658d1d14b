"""Aggregate navigation: route a (dims, measures) query to the smallest
materialized rollup that can answer it — the OLAP serving-layer rewrite
(Kylin/Druid cube routing, BigQuery/Snowflake MV rewrite) the reference's
warehouse targets perform behind the scenes.

Reference behavior modeled: the reference ships rows INTO warehouses that
do this (target_snowflake et al.); an analytics engine must own it. The
rollup tables themselves are maintained by the repo's incremental-MV
machinery (operators/incremental_agg.py, streaming/mv.py) — this module
is the READ side: given registered rollups and a query shape, pick the
cheapest source and rewrite the aggregation over it.

Scale: a 100 TB fact table with a handful of KB..GB rollups — answering
from a rollup turns a full fact scan into a scan of the pre-aggregated
table (often 4-6 orders of magnitude smaller), and re-aggregating a
finer rollup to a coarser grouping costs only the rollup's size. Routing
logic is pure metadata (no data touched until the chosen frame runs).

Rewrite rules (standard summary-table algebra):
- A rollup with dimension set D can answer any query grouping by G ⊆ D
  by re-aggregating (additivity).
- SUM/COUNT re-aggregate as SUM of the stored partials.
- AVG is derived as SUM(sum_col)/SUM(count_col) — never stored.
- MIN/MAX re-aggregate as MIN/MAX (they are semi-additive: fine for
  re-grouping, not for subtraction — deletes are the MV maintainers'
  problem, not the router's).
- Among eligible rollups the router picks the one with the FEWEST
  dimensions (coarsest ⇒ smallest); ties break on registration order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Measure:
    """How a logical measure is stored in a rollup and re-aggregated.

    kind: 'sum' | 'count' | 'min' | 'max' store one column and re-agg
    with the same (or SUM for count) function; 'avg' is virtual —
    derived from the named sum/count measures at query time."""

    name: str
    kind: str
    source_col: str | None = None  # base-table column ('count' needs none)
    sum_measure: str | None = None  # for kind='avg'
    count_measure: str | None = None


@dataclass
class Rollup:
    name: str
    dims: tuple[str, ...]
    reader: Callable[[SparkSession], DataFrame]
    # measure name -> stored column in this rollup
    stored: dict[str, str] = field(default_factory=dict)


_REAGG = {
    "sum": F.sum,
    "count": F.sum,  # partial counts re-aggregate by summing
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class Dimension:
    """One arm of a star/snowflake: joined to the fact (or to an earlier
    dimension's attribute — snowflake chains) on fk = pk, contributing
    ``attributes`` as groupable columns."""

    name: str
    reader: Callable[[SparkSession], DataFrame]
    fact_fk: str  # column on the fact side (or an earlier dim's attribute)
    dim_pk: str
    attributes: tuple[str, ...]


class StarSchema:
    """A fact table + dimension arms, with JOIN PRUNING: building the
    base frame for a query joins ONLY the dimensions whose attributes
    the query references (an inner join Catalyst cannot prune itself —
    it changes cardinality — so the router prunes at build time; FK
    integrity is the star contract, as in every OLAP cube). Dimensions
    broadcast — they are the small side by definition.

    Declare snowflake chains in join order: a later dimension may key on
    an earlier one's attribute (customer → nation below). A needed late
    dimension automatically pulls in the earlier one that produces its
    foreign key."""

    def __init__(self, fact_reader: Callable[[SparkSession], DataFrame]):
        self._fact = fact_reader
        self._dims: list[Dimension] = []

    def add_dimension(self, dim: Dimension) -> None:
        self._dims.append(dim)

    def _needed_dims(self, cols: set[str]) -> list[Dimension]:
        """Dimensions to join, in declaration order, including chain
        prerequisites (resolved right-to-left so a needed snowflake arm
        marks the arm that produces its foreign key as needed too)."""
        needed = [
            any(a in cols for a in d.attributes) for d in self._dims
        ]
        for i in range(len(self._dims) - 1, -1, -1):
            if not needed[i]:
                continue
            fk = self._dims[i].fact_fk
            for j in range(i):
                if fk in self._dims[j].attributes:
                    needed[j] = True
        return [d for d, n in zip(self._dims, needed) if n]

    def frame(self, spark: SparkSession, cols: set[str]) -> DataFrame:
        df = self._fact(spark)
        for d in self._needed_dims(cols):
            side = d.reader(spark).select(
                F.col(d.dim_pk).alias("__sk"), *d.attributes
            )
            df = df.join(
                F.broadcast(side), df[d.fact_fk] == side["__sk"]
            ).drop("__sk")
        return df


class RollupCatalog:
    """Registry of rollup tables over one logical fact table + the router.

    ``base_reader`` loads the fact table (the fallback when no rollup
    matches); measures declare the aggregation algebra once, rollups
    declare which measures they store at which grain."""

    def __init__(
        self,
        base_reader: "Callable[[SparkSession], DataFrame] | StarSchema",
    ) -> None:
        """``base_reader`` is a plain reader for a single-table base, or
        a :class:`StarSchema` — then unroutable queries fall back to the
        join-pruned star frame and rollups materialize denormalized."""
        self._base = base_reader
        self._measures: dict[str, Measure] = {}
        self._rollups: list[Rollup] = []

    def add_measure(self, m: Measure) -> None:
        if m.kind not in ("sum", "count", "min", "max", "avg"):
            raise ValueError(f"unknown measure kind: {m.kind}")
        if m.kind == "avg" and not (m.sum_measure and m.count_measure):
            raise ValueError("avg measures derive from sum+count measures")
        self._measures[m.name] = m

    def add_rollup(self, rollup: Rollup) -> None:
        unknown = set(rollup.stored) - set(self._measures)
        if unknown:
            raise ValueError(f"rollup stores unknown measures: {unknown}")
        self._rollups.append(rollup)

    # ------------------------------------------------------------ routing
    def _required_stored(self, measures: list[str]) -> set[str]:
        """Physical measures a rollup must store to answer the request
        (an avg expands to its sum+count)."""
        need: set[str] = set()
        for name in measures:
            m = self._measures[name]
            if m.kind == "avg":
                need.add(m.sum_measure)  # type: ignore[arg-type]
                need.add(m.count_measure)  # type: ignore[arg-type]
            else:
                need.add(name)
        return need

    def route(self, dims: list[str], measures: list[str]) -> Rollup | None:
        """The chosen rollup, or None ⇒ base table. Pure metadata."""
        need = self._required_stored(measures)
        best: Rollup | None = None
        for r in self._rollups:
            if not set(dims) <= set(r.dims):
                continue
            if not need <= set(r.stored):
                continue
            if best is None or len(r.dims) < len(best.dims):
                best = r
        return best

    # ------------------------------------------------------------ rewrite
    def query(
        self,
        spark: SparkSession,
        dims: list[str],
        measures: list[str],
    ) -> DataFrame:
        """The rewritten aggregation: grouped by ``dims``, one output
        column per requested measure (named after the measure)."""
        for name in measures:
            if name not in self._measures:
                raise ValueError(f"unknown measure: {name}")
        rollup = self.route(dims, measures)
        if rollup is None:
            return self._from_base(spark, dims, measures)
        return self._from_rollup(spark, rollup, dims, measures)

    def _agg_exprs(
        self, measures: list[str], col_of: Callable[[Measure], F.Column]
    ) -> list[F.Column]:
        """Aggregate expressions for the physical (non-avg) measures."""
        exprs = []
        for name in sorted(self._required_stored(measures)):
            m = self._measures[name]
            exprs.append(_REAGG[m.kind](col_of(m)).alias(name))
        return exprs

    def _finish(self, grouped: DataFrame, dims: list[str],
                measures: list[str]) -> DataFrame:
        """Project the requested measures (deriving avgs) in order."""
        cols: list[F.Column] = [F.col(d) for d in dims]
        for name in measures:
            m = self._measures[name]
            if m.kind == "avg":
                cols.append(
                    (
                        F.col(m.sum_measure)
                        / F.col(m.count_measure)
                    ).alias(name)
                )
            else:
                cols.append(F.col(name))
        return grouped.select(*cols)

    def _from_base(
        self, spark: SparkSession, dims: list[str], measures: list[str]
    ) -> DataFrame:
        if isinstance(self._base, StarSchema):
            cols = set(dims)
            for name in self._required_stored(measures):
                m = self._measures[name]
                if m.source_col:
                    cols.add(m.source_col)
            base = self._base.frame(spark, cols)
        else:
            base = self._base(spark)

        def col_of(m: Measure) -> F.Column:
            if m.kind == "count":
                return F.lit(1)
            return F.col(m.source_col)

        grouped = base.groupBy(*dims).agg(*self._agg_exprs(measures, col_of))
        return self._finish(grouped, dims, measures)

    def _from_rollup(
        self,
        spark: SparkSession,
        rollup: Rollup,
        dims: list[str],
        measures: list[str],
    ) -> DataFrame:
        df = rollup.reader(spark)

        def col_of(m: Measure) -> F.Column:
            return F.col(rollup.stored[m.name])

        # an exact-grain hit still re-aggregates: rollup rows are unique
        # per grain by the MV maintainers' contract, so the groupBy
        # collapses map-side to an answer-sized shuffle and stays correct
        # even if a maintainer ever emits partial rows
        grouped = df.groupBy(*dims).agg(*self._agg_exprs(measures, col_of))
        return self._finish(grouped, dims, measures)

    def materialize_rollup(
        self,
        spark: SparkSession,
        name: str,
        dims: tuple[str, ...],
        measures: list[str],
        writer: Callable[[DataFrame], Callable[[SparkSession], DataFrame]],
    ) -> Rollup:
        """Build a rollup at ``dims`` grain from the base table, hand the
        frame to ``writer`` (which persists it and returns a reader), and
        register the result. Stored column = measure name."""
        frame = self._from_base(
            spark, list(dims),
            sorted(self._required_stored(measures)),
        )
        reader = writer(frame)
        stored = {
            m: m for m in self._required_stored(measures)
        }
        rollup = Rollup(name=name, dims=dims, reader=reader, stored=stored)
        self.add_rollup(rollup)
        return rollup
