"""Row-level operators ("convertors" in the reference).

Each class re-expresses one reference operator as declarative
DataFrame transformations (file:line citations point into
/root/reference). Where the reference runs arbitrary JS per row, the
Spark version takes SQL expressions / Columns so the work stays inside
whole-stage codegen; a Pandas-UDF escape hatch exists only on ``Thru``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable, Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .base import Transform

if TYPE_CHECKING:
    from ..context import Context


def _to_col(c: str | Column) -> Column:
    return F.expr(c) if isinstance(c, str) else c


class Filter(Transform):
    """Keep rows where the predicate holds.

    Reference: jobs/convertors/job-filter.js:10-16 (arbitrary JS
    predicate). Here: a SQL boolean expression / Column — pushdown-able
    by Catalyst all the way into the scan.
    """

    def __init__(self, predicate: str | Column, name: str | None = None) -> None:
        super().__init__(name)
        self.predicate = predicate

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        return df.filter(_to_col(self.predicate))


class Mapper(Transform):
    """1:1 projection/rewrite.

    Reference: jobs/convertors/job-mapper.js:15-17 (JS ``row -> row``;
    used for renames, computed keys, pruning — tests/jobs.js:85).
    Here: ``select`` of named expressions, which gives Catalyst exact
    column-pruning information.

    ``exprs`` maps output column name -> SQL expression / Column.
    If ``keep`` is None only ``exprs`` survive (strict projection);
    otherwise listed passthrough columns are retained first.
    """

    def __init__(
        self,
        exprs: Mapping[str, str | Column],
        keep: Sequence[str] | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.exprs = dict(exprs)
        self.keep = list(keep) if keep is not None else None

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        cols: list[Column] = [F.col(c) for c in (self.keep or [])]
        cols += [_to_col(e).alias(n) for n, e in self.exprs.items()]
        return df.select(*cols)


class Thru(Transform):
    """Generic 1:N transform (flatMap analogue).

    Reference: jobs/convertors/job-thru.js:17-53 — a JS processor that
    may push 0..N rows per input and keep cross-row state. Spark-first
    decomposition:

    * ``explode=<array/map expr>``      -> 1:N via native ``explode``
      (the reference's dominant use, e.g. examples/bor-dwc.js:645-663);
    * ``unpivot=(ids, values, var, val)`` -> native ``unpivot/stack``
      (examples/bor-dwc.js:263-276 key-row emission);
    * ``pandas_fn=<fn(iter[pd.DataFrame])->iter[pd.DataFrame]>`` with
      ``schema`` -> ``mapInPandas`` escape hatch for genuinely
      imperative logic (Arrow-batched; never row-at-a-time Python).
    """

    def __init__(
        self,
        explode: str | Column | None = None,
        explode_as: Sequence[str] | None = None,
        unpivot: tuple[Sequence[str], Sequence[str], str, str] | None = None,
        pandas_fn: Callable | None = None,
        schema: str | None = None,
        keep: Sequence[str] | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.explode = explode
        self.explode_as = list(explode_as) if explode_as else None
        self.unpivot = unpivot
        self.pandas_fn = pandas_fn
        self.schema = schema
        self.keep = list(keep) if keep is not None else None

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        if self.explode is not None:
            exploded = F.explode(_to_col(self.explode))
            keep = self.keep if self.keep is not None else df.columns
            out = df.select(*[F.col(c) for c in keep], exploded)
            if self.explode_as:
                # map explode yields (key, value); array explode yields col
                auto = [c for c in out.columns if c not in keep]
                for old, new in zip(auto, self.explode_as):
                    out = out.withColumnRenamed(old, new)
            return out
        if self.unpivot is not None:
            ids, values, var_name, val_name = self.unpivot
            return df.unpivot(list(ids), list(values), var_name, val_name)
        if self.pandas_fn is not None:
            if not self.schema:
                raise ValueError("Thru(pandas_fn=...) requires schema")
            return df.mapInPandas(self.pandas_fn, schema=self.schema)
        raise ValueError("Thru requires explode=, unpivot= or pandas_fn=")


class Sorter(Transform):
    """Total ordering, optionally with a limit (top-k).

    Reference: jobs/convertors/job-sorter.js:47-54 buffers the whole
    input in heap and sorts with a JS comparator. Here: distributed
    sort (range-partitioned sample + local sort). With ``limit``,
    Spark plans TakeOrderedAndProject — per-partition top-k then a
    k-row merge on the driver, no full shuffle: the scalable form of
    the reference's spy+stop "take n" idiom (tests/jobs.js:300-308).
    """

    def __init__(
        self,
        by: Sequence[str | Column],
        ascending: Sequence[bool] | None = None,
        limit: int | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.by = list(by)
        self.ascending = list(ascending) if ascending is not None else None
        self.limit = limit

    def _sort_cols(self) -> list[Column]:
        cols = []
        asc = self.ascending or [True] * len(self.by)
        for c, a in zip(self.by, asc):
            col = _to_col(c)
            cols.append(col.asc() if a else col.desc())
        return cols

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        out = df.orderBy(*self._sort_cols())
        if self.limit is not None:
            out = out.limit(self.limit)
        return out


class Reducer(Transform):
    """Hash aggregation.

    Reference: jobs/convertors/job-reducer.js:44-58 — user JS mutates a
    shared dict per row, one output row per key on flush (single-phase,
    whole-input-in-heap). Here: ``groupBy().agg()`` — Spark runs
    partial (map-side) + final aggregation with spill, the scalable
    two-phase form.

    ``aggs`` maps output name -> aggregate Column or SQL expression.
    ``exact_sum_cols`` is a convenience: each listed numeric column is
    summed through DECIMAL(18,6) and cast back to double, making the
    result independent of partitioning/summation order (bit-exact
    across engines — important for oracle parity and reproducibility).
    """

    def __init__(
        self,
        keys: Sequence[str | Column],
        aggs: Mapping[str, str | Column],
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.keys = list(keys)
        self.aggs = dict(aggs)

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        key_cols = [_to_col(k) if not isinstance(k, str) else F.col(k) for k in self.keys]
        agg_cols = [_to_col(a).alias(n) for n, a in self.aggs.items()]
        return df.groupBy(*key_cols).agg(*agg_cols)


class Uniquer(Transform):
    """Distinct by computed key, keeping the first occurrence.

    Reference: jobs/convertors/job-uniquer.js:15-26 — O(n²)
    ``Array.indexOf`` scan keeping first arrival. Spark has no stream
    order, so "first" needs an explicit arrival ordering: with
    ``order_by`` we keep the min row per key via ``row_number`` (one
    shuffle, deterministic); without it, ``dropDuplicates`` (hash-based,
    arbitrary representative — fine when any representative works).
    """

    def __init__(
        self,
        keys: Sequence[str],
        order_by: Sequence[str | Column] | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.keys = list(keys)
        self.order_by = list(order_by) if order_by else None

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        if not self.order_by:
            return df.dropDuplicates(self.keys)
        w = Window.partitionBy(*self.keys).orderBy(
            *[_to_col(c) for c in self.order_by]
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )


class Array2Map(Transform):
    """Pivot an array<struct> column into a map keyed by an id field.

    Reference: jobs/convertors/job-array2map.js:22-52 — for each listed
    dotted field, ``[{id, ...}]`` becomes ``{id: value}``. Here:
    ``map_from_entries(transform(...))`` — pure Catalyst expressions.
    ``value_field=None`` keeps the whole struct as the map value.
    """

    def __init__(
        self,
        fields: Sequence[str],
        id_key: str = "id",
        value_field: str | None = None,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.fields = list(fields)
        self.id_key = id_key
        self.value_field = value_field

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        out = df
        for field in self.fields:
            arr = F.col(field)
            if self.value_field:
                entry = lambda x: F.struct(  # noqa: E731
                    x[self.id_key].alias("key"), x[self.value_field].alias("value")
                )
            else:
                entry = lambda x: F.struct(  # noqa: E731
                    x[self.id_key].alias("key"), x.alias("value")
                )
            out = out.withColumn(field, F.map_from_entries(F.transform(arr, entry)))
        return out


class Map2Array(Transform):
    """Inverse pivot: map column -> array of {id, value} structs.

    Reference: jobs/convertors/job-map2array.js:23-44. Here:
    ``transform(map_entries(m), ...)``; set ``explode=True`` for the
    row-per-entry form the reference feeds downstream operators.
    """

    def __init__(
        self,
        fields: Sequence[str],
        id_key: str = "id",
        value_key: str = "value",
        explode: bool = False,
        name: str | None = None,
    ) -> None:
        super().__init__(name)
        self.fields = list(fields)
        self.id_key = id_key
        self.value_key = value_key
        self.explode = explode

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        out = df
        for field in self.fields:
            entries = F.transform(
                F.map_entries(F.col(field)),
                lambda e: F.struct(
                    e["key"].alias(self.id_key), e["value"].alias(self.value_key)
                ),
            )
            out = out.withColumn(field, entries)
            if self.explode:
                keep = [c for c in out.columns if c != field]
                out = out.select(*keep, F.explode(F.col(field)).alias(field))
        return out


class Nothing(Transform):
    """Null sink / devnull (reference jobs/job-nothing.js:10-12).

    As a transform it is identity; ``drain`` runs a no-op write action
    so the upstream plan executes for its side effects only.
    """

    def apply(self, df: DataFrame, ctx: "Context") -> DataFrame:
        return df

    @staticmethod
    def drain(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()
