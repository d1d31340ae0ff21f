"""PQL call objects compiling to DataFrame plans.

Every class mirrors one PQL call from the reference dispatch table
(``/root/reference/executor.go:723-835``); per-class docstrings cite the
reference implementation it models. The compilation contract:

- Row-calls (bitmap producers) expose:
    ``predicate(idx) -> Column | None``
        Boolean expression over the base table. Two-valued bitmap semantics:
        a record is *in* the bitmap iff the predicate is TRUE — SQL NULL
        compares are coerced to False at composition points, matching the
        reference where a record either has the bit set or not.
    ``ids(idx) -> DataFrame["_id"]``
        Fallback materialization as a record-ID frame.
    ``filter_df(idx) -> DataFrame``
        The base table restricted to the bitmap (predicate-pushdown filter
        when possible, semi-join otherwise).
- Reader-calls (Count/Sum/.../Extract) expose ``to_df(idx) -> DataFrame``.

Scale notes: predicate-form composition keeps arbitrary Intersect/Union/
Difference/Xor/Not trees inside ONE whole-stage-codegen'd parquet scan with
pushdown — the plan you want at 100 TB. Aggregating readers compile to
partial+final hash aggregation (Catalyst does map-side combine, mirroring the
reference's per-shard map + tournament reduce, executor.go:6449-6830).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dc_field
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


# ---------------------------------------------------------------------------
# Index = the queryable table ("index" in FeatureBase, index.go:26-63)
# ---------------------------------------------------------------------------


@dataclass
class Index:
    """A queryable table. ``id_col`` is the record-ID (``_id``) column;
    ``time_col`` is the event-time column used for ``from_``/``to`` ranges on
    time-quantum-style queries (reference views time.go:106-142 — we model
    time-quantum views as plain timestamp predicates, which parquet
    partition/row-group pruning serves the same way the minimal view cover
    did, field.go:1063-1120)."""

    df: DataFrame
    id_col: str = "_id"
    time_col: Optional[str] = None
    #: field name → time quantum string ("YMDH", "YM", …) for QUANTUM SET
    #: FIELDS — columns typed array<struct<value, ts>> where every bit
    #: carries its own timestamp (OptFieldTypeTime, field.go:176-189; the
    #: reference stores one view per enabled unit). from_/to ranges on
    #: these fields compile to the view-cover predicate of
    #: pql/timeviews.py instead of the per-record Index.time_col.
    quantums: dict = dc_field(default_factory=dict)
    #: optional field name → reference field-type declaration ("int",
    #: "decimal", "bool", "timestamp", "mutex", "set", "time"). A Spark
    #: schema cannot distinguish a BSI int field from a mutex field of
    #: row IDs (both are scalar longs), so type-dependent validation
    #: (Rows() refusing value fields, executor.go:4128) consults this
    #: map first and falls back to unambiguous dtype signals.
    field_types: dict = dc_field(default_factory=dict)
    #: fields created with CacheTypeNone (OptFieldTypeSet(CacheTypeNone,
    #: 0)): the reference cannot serve TopN from them — no ranked cache
    #: (executor_test.go TopN/ErrCacheNone). Spark needs no cache, but
    #: the refusal is part of the declared surface, so a field listed
    #: here refuses TopN with the reference's text.
    no_cache: set = dc_field(default_factory=set)

    def dtype_of(self, name: str) -> str:
        """Cached column-dtype lookup: ``df.dtypes`` is a JVM schema
        round trip, and a single compile touches it once per Row/Rows
        node (an Intersect of k Rows = k lookups). The cache lives on
        the Index instance, whose df never changes."""
        m = getattr(self, "_dtypes_cache", None)
        if m is None:
            m = dict(self.df.dtypes)
            self._dtypes_cache = m
        return m.get(name, "")

    def is_array_field(self, name: str) -> bool:
        return self.dtype_of(name).startswith("array")

    def field_type(self, name: str) -> str:
        """The reference field type of a column: declared type if given,
        else inferred from dtype (array<struct> → time-quantum "time",
        array → "set", boolean → "bool", decimal → "decimal",
        timestamp → "timestamp", scalar long/string → "mutex" — the
        row-ID-per-record shape, which is what undeclared scalar
        columns are used as by Rows/GroupBy)."""
        if name in self.field_types:
            return self.field_types[name]
        dt = self.dtype_of(name)
        if dt.startswith("array<struct<"):
            return "time"
        if dt.startswith("array"):
            return "set"
        if dt == "boolean":
            return "bool"
        if dt.startswith("decimal"):
            return "decimal"
        if dt.startswith("timestamp"):
            return "timestamp"
        return "mutex"

    def is_keyed_field(self, name: str) -> bool:
        """String-valued fields are keyed (OptFieldKeys): row keys, not
        integer row IDs."""
        dt = self.dtype_of(name)
        # string-valued time-quantum fields (array<struct<value:string,
        # ts:…>>) are keyed too — Rows(like=) on them must not be
        # refused with the unkeyed-translation error
        return (
            dt == "string"
            or dt == "array<string>"
            or dt.startswith("array<struct<value:string")
        )

    def is_quantum_field(self, name: str) -> bool:
        return self.dtype_of(name).startswith("array<struct<")

    def quantum_of(self, name: str) -> str:
        return self.quantums.get(name, "YMDH")

    def id_frame(self, df: DataFrame) -> DataFrame:
        return df.select(F.col(self.id_col).alias("_id"))


_TRUNC_UNITS = {"Y": "year", "M": "month", "D": "day", "H": "hour"}


def _quantum_view_pred(idx: Index, field: str, from_, to):
    """ts-membership lambda for a quantum field's view cover — None when
    the call has no time range (standard view / union of all views:
    every bit matches, TestExecutorTimeRange both subtests). Returns a
    function ts_col → BooleanColumn usable inside ``F.exists``/
    ``F.filter`` lambdas and on exploded structs.

    Bounded ranges compile to the exact view-name cover (the literal
    viewsByTimeRange walk, pql/timeviews.py) as date_trunc-IN-set
    terms. OPEN-ENDED ranges (from-only / to-only, executor_test.go:
    9886-9899) must not walk to the time horizon; for them the walk
    from an aligned start is provably equivalent to a range predicate
    on the finest-unit truncation — trunc(ts) >= trunc(from) for
    from-only (the walk's steps from `from` truncate onto every
    contiguous unit upward), trunc(ts) < to for to-only (the zero-time
    start is unit-aligned, so the emitted views are exactly the units
    below `to`). The same range form backstops a bounded range whose
    cover would exceed 4096 views (a multi-millennium literal span) —
    exact whenever `from` is aligned to the finest unit."""
    if from_ is None and to is None:
        return None
    from featurebase_spark.pql import timeviews as TV

    q = idx.quantum_of(field)
    fin = _TRUNC_UNITS[TV.finest_unit(q)]
    start = TV.parse_pql_time(from_) if from_ is not None else None
    end = TV.parse_pql_time(to) if to is not None else None

    views = None
    if start is not None and end is not None:
        views = TV.views_by_time_range(start, end, q)
        if sum(len(v) for v in views.values()) > 4096:
            views = None  # range-predicate backstop below

    if views is not None:

        def pred(ts):
            if not views:
                return F.lit(False)
            terms = [
                F.date_trunc(_TRUNC_UNITS[u], ts).isin(
                    [F.lit(v) for v in vs]
                )
                for u, vs in views.items()
            ]
            out = terms[0]
            for t in terms[1:]:
                out = out | t
            return out

        return pred

    def pred(ts):
        out = F.lit(True)
        if start is not None:
            out = out & (
                F.date_trunc(fin, ts)
                >= F.lit(TV._view(TV.finest_unit(q), start))
            )
        if end is not None:
            out = out & (F.date_trunc(fin, ts) < F.lit(end))
        return out

    return pred


def _truthy(col: Column) -> Column:
    """NULL → False: bitmap membership is two-valued (bit set or not)."""
    return F.coalesce(col, F.lit(False))


# ---------------------------------------------------------------------------
# Row-calls (bitmap producers)
# ---------------------------------------------------------------------------


class RowCall:
    def predicate(self, idx: Index) -> Optional[Column]:  # pragma: no cover
        raise NotImplementedError

    def ids(self, idx: Index) -> DataFrame:
        pred = self.predicate(idx)
        if pred is None:
            raise NotImplementedError(f"{type(self).__name__} has no id fallback")
        # plain predicate, NOT coalesce-wrapped: WHERE already excludes
        # NULL evaluations, and an un-wrapped comparison reaches the parquet
        # scan as a PushedFilter (coalesce() around it blocks pushdown).
        return idx.id_frame(idx.df.where(pred))

    def filter_df(self, idx: Index) -> DataFrame:
        pred = self.predicate(idx)
        if pred is not None:
            return idx.df.where(pred)
        # Semi-join fallback: Spark broadcasts when the id set is small.
        return idx.df.join(
            self.ids(idx).withColumnRenamed("_id", idx.id_col),
            on=idx.id_col,
            how="left_semi",
        )


@dataclass
class Row(RowCall):
    """``Row(field=value)`` / ``Row(field <op> value)`` / time-range rows.

    Reference: executeRowShard executor.go:5120-5248 (equality on set/mutex
    fields), executeRowBSIGroupShard executor.go:5249-5356 (BSI ``<,<=,>,>=,
    ==,!=,><`` range decomposition — here Catalyst + parquet min/max stats do
    the range pruning natively), time-range rows via from/to (view cover
    field.go:1063-1120 → plain timestamp BETWEEN predicate).

    - scalar field: comparison predicate.
    - array (set) field: equality → ``array_contains`` (one bitmap per value
      in the reference, field.go:43).
    - ``value is None`` with ``==``/``!=`` → IS NULL / IS NOT NULL (the
      reference's existence-bitmap queries, executor.go:5554).
    - ``between=(lo, hi)`` → inclusive range (PQL ``><``, pql/token.go:10-44).
    - ``from_``/``to`` restrict by ``idx.time_col`` (half-open [from, to)).
    """

    field: str
    op: str = "=="
    value: object = None
    between: Optional[tuple] = None
    from_: object = None
    to: object = None

    def _validate_value(self, idx: Index) -> None:
        """``fieldValidateValue`` mirror (executor.go:7150-7200) for the
        cases a Spark schema can adjudicate: integer row IDs against
        keyed fields, negative IDs against set fields, non-bool values
        against bool fields. Undeclared scalar longs are left alone —
        they are equally a BSI int field (where any signed value is
        legal) and a mutex field, and the reference's check is
        type-table-driven; declare ``Index.field_types`` to get the
        full surface."""
        if self.value is None or self.between is not None:
            return
        if self.op not in ("==", "!="):
            return
        f, v = self.field, self.value
        ft = idx.field_type(f)
        dt = idx.dtype_of(f)
        declared = f in idx.field_types
        if ft == "bool":
            if not isinstance(v, bool):
                raise ValueError(f'invalid value {v} for bool field "{f}"')
            return
        if ft in ("set", "mutex", "time"):
            # only validate when the schema pins the field's nature:
            # arrays and strings are unambiguous; a bare long column
            # may be BSI-int-used and stays permissive unless declared
            if not (declared or dt.startswith("array") or dt == "string"):
                return
            if isinstance(v, bool):
                raise ValueError(
                    f'invalid value {str(v).lower()} for field "{f}" '
                    f"of type {ft}"
                )
            if isinstance(v, int):
                if v < 0:
                    raise ValueError(f'negative ID {v} for set field "{f}"')
                if idx.is_keyed_field(f):
                    raise ValueError(
                        f'found integer ID {v} on keyed field "{f}"'
                    )
        elif declared and ft == "int" and isinstance(v, bool):
            raise ValueError(
                f'invalid value {str(v).lower()} for int field "{f}"'
            )

    def predicate(self, idx: Index) -> Column:
        if self.field is None:
            # Row() parses (pqlpeg_test UnionNested); the executor's
            # FieldArg lookup refuses at run time (executor.go:5133)
            raise ValueError("Row() argument required: field")
        if self.field not in idx.df.columns:
            # ErrFieldNotFound (Row_BSIGroup ErrFieldNotFound subtest:
            # Row(bad_field >= 20))
            raise ValueError("field not found")
        self._validate_value(idx)
        c = F.col(self.field)
        if idx.is_quantum_field(self.field):
            # quantum set field: the bit must exist in a covered view
            # (executor_test.go:7849-7860 Row(f2='R', from=, to=) —
            # from/to apply PER BIT, not per record)
            if self.op not in ("==", "!="):
                raise ValueError(
                    f"op {self.op} invalid on set field {self.field}"
                )
            if self.op == "!=" and self.value is not None:
                # the executor.go:5189 refusal covers the whole
                # set/mutex/TIME class
                raise ValueError(
                    "only support != for null, not for other values, "
                    "on set/mutex fields"
                )
            if self.value is None:
                # null checks walk the per-field EXISTENCE row, which
                # has no views — a time range is refused outright
                # (executor.go:5173-5186, Row_BSIGroup "time quantum EQ
                # null"). Clear does NOT reset field existence in the
                # reference, so a cleared-empty record stays non-null —
                # which is exactly Spark's NULL (never set) vs []
                # (existed, cleared) distinction: plain isNull matches.
                if self.from_ is not None or self.to is not None:
                    raise ValueError(
                        "can't use a time range with a check "
                        "for/against null"
                    )
                return c.isNull() if self.op == "==" else c.isNotNull()
            tp = _quantum_view_pred(idx, self.field, self.from_, self.to)
            v = F.lit(self.value)
            if tp is None:
                pred = F.exists(c, lambda x: x["value"] == v)
            else:
                pred = F.exists(
                    c, lambda x: (x["value"] == v) & tp(x["ts"])
                )
            if self.op == "!=":
                pred = ~_truthy(pred)
            return pred
        is_set_like = (
            idx.is_array_field(self.field)
            or idx.dtype_of(self.field) == "string"
        ) and idx.field_types.get(self.field) not in (
            # a string column DECLARED as a BSI type is a foreign-index
            # field (FieldTypeInt + OptFieldForeignIndex holds the
            # parent's keys, executor_test.go:5885-5888) — it keeps the
            # full BSI op set, != against a value included
            "int", "decimal", "timestamp",
        )
        if self.between is not None:
            lo, hi = self.between
            pred = c.between(F.lit(lo), F.lit(hi))
        elif self.value is None and self.op == "==":
            # null = NEVER set. The reference's null-row walk is
            # index-existence minus FIELD-existence, and ClearBit does
            # not reset field existence (Row_BSIGroup: after
            # Clear(0, idset=3), Row(idset != null) still returns 0) —
            # Spark's NULL (never set) vs [] (cleared) maps 1:1.
            pred = c.isNull()
        elif self.value is None and self.op == "!=":
            pred = c.isNotNull()
        elif self.op != "==" and is_set_like:
            # executor.go:5187-5189 — set/mutex fields take ONLY == (or
            # a null check): every other op, != against a value AND the
            # range ops (< <= > >=), hits the same refusal (the
            # DeleteWithBitmapError case drives Row(setfield > 1) into
            # it, delete_test.go:238); BSI int ranges keep their full
            # op set, scalar longs stay permissive — they are equally
            # BSI fields
            raise ValueError(
                "only support != for null, not for other values, on "
                "set/mutex fields"
            )
        elif idx.is_array_field(self.field):
            if self.op == "==":
                pred = F.array_contains(c, F.lit(self.value))
            else:
                raise ValueError(f"op {self.op} invalid on set field {self.field}")
        else:
            v = F.lit(self.value)
            pred = {
                "==": c == v,
                "!=": c != v,
                "<": c < v,
                "<=": c <= v,
                ">": c > v,
                ">=": c >= v,
            }[self.op]
        if self.from_ is not None or self.to is not None:
            if idx.time_col is None:
                # executor.go / field.go: time options on a plain field
                # (TestExecutorTimeRange "Field not a time field" —
                # exact substring). The flat-table Index.time_col form
                # is our EXTENSION for per-record event time.
                raise ValueError(
                    f"field {self.field} is not a time-field, 'from' "
                    f"and 'to' are not valid options for this field type"
                )
            t = F.col(idx.time_col)
            if self.from_ is not None:
                pred = pred & (t >= F.lit(self.from_))
            if self.to is not None:
                pred = pred & (t < F.lit(self.to))
        return pred


@dataclass
class All(RowCall):
    """All existing records (executeAllCallShard executor.go:5781-5817).
    Existence is implicit in a row-oriented table — every row exists."""

    def predicate(self, idx: Index) -> Column:
        return F.lit(True)


@dataclass
class ConstRow(RowCall):
    """Literal bitmap from an ID list (executeConstRow executor.go:5604-5673).
    Compiles to ``isin`` (Catalyst turns large lists into an in-set hash)."""

    columns: Sequence

    def predicate(self, idx: Index) -> Column:
        return F.col(idx.id_col).isin(list(self.columns))


class _Composite(RowCall):
    children: Sequence[RowCall]

    def _child_preds(self, idx: Index) -> Optional[list[Column]]:
        preds = [c.predicate(idx) for c in self.children]
        return None if any(p is None for p in preds) else preds


@dataclass
class Intersect(_Composite):
    """Bitmap AND (executeIntersectShard executor.go:5357-5381).
    Predicate form: conjunction inside one scan. Fallback: repeated
    semi-joins on ``_id``."""

    children: Sequence[RowCall]

    def __init__(self, *children: RowCall):
        self.children = children

    def predicate(self, idx: Index) -> Optional[Column]:
        if not self.children:
            # executor.go:5363 (TestExecutor_Execute_Empty_Intersect)
            raise ValueError(
                "empty Intersect query is currently not supported"
            )
        preds = self._child_preds(idx)
        if preds is None:
            return None
        # plain conjunction: NULL∧x never evaluates TRUE, so WHERE semantics
        # equal bitmap-AND; unwrapped operands stay pushdown-eligible.
        return reduce(lambda a, b: a & b, preds)

    def ids(self, idx: Index) -> DataFrame:
        pred = self.predicate(idx)
        if pred is not None:
            return super().ids(idx)
        return reduce(lambda a, b: a.join(b, "_id", "left_semi"), [c.ids(idx) for c in self.children])


@dataclass
class Union(_Composite):
    """Bitmap OR (executeUnionShard executor.go:5382-5405)."""

    children: Sequence[RowCall]

    def __init__(self, *children: RowCall):
        self.children = children

    def predicate(self, idx: Index) -> Optional[Column]:
        if not self.children:
            # Union() of nothing is the EMPTY row, not an error
            # (executeUnionShard starts from NewRow(),
            # TestExecutor_Execute_Empty_Union)
            return F.lit(False)
        preds = self._child_preds(idx)
        if preds is None:
            return None
        # plain disjunction: NULL∨TRUE=TRUE, NULL∨FALSE=NULL→excluded — both
        # match bitmap-OR membership.
        return reduce(lambda a, b: a | b, preds)

    def ids(self, idx: Index) -> DataFrame:
        pred = self.predicate(idx)
        if pred is not None:
            return super().ids(idx)
        return reduce(lambda a, b: a.union(b), [c.ids(idx) for c in self.children]).distinct()


@dataclass
class Difference(_Composite):
    """a AND NOT b AND NOT c... (executeDifferenceShard executor.go:2950-2975)."""

    children: Sequence[RowCall]

    def __init__(self, *children: RowCall):
        self.children = children

    def predicate(self, idx: Index) -> Optional[Column]:
        if not self.children:
            # executor.go:2956 (TestExecutor_Execute_Empty_Difference)
            raise ValueError(
                "empty Difference query is currently not supported"
            )
        preds = self._child_preds(idx)
        if preds is None:
            return None
        # only NEGATED operands need NULL→FALSE coercion (NOT NULL = NULL
        # would wrongly drop rows that are in `a` but null under `b`); the
        # positive head stays unwrapped for pushdown.
        head, *rest = preds
        return reduce(lambda a, b: a & ~_truthy(b), rest, head)

    def ids(self, idx: Index) -> DataFrame:
        pred = self.predicate(idx)
        if pred is not None:
            return super().ids(idx)
        ids = [c.ids(idx) for c in self.children]
        return reduce(lambda a, b: a.join(b, "_id", "left_anti"), ids[1:], ids[0])


@dataclass
class Xor(_Composite):
    """Symmetric difference (executeXorShard executor.go:5513-5534)."""

    children: Sequence[RowCall]

    def __init__(self, *children: RowCall):
        self.children = children

    def predicate(self, idx: Index) -> Optional[Column]:
        if not self.children:
            # like Union: executeXorShard folds from NewRow() — the
            # empty Xor is the empty row, not an error
            return F.lit(False)
        preds = self._child_preds(idx)
        if preds is None:
            return None
        return reduce(lambda a, b: a != b, [_truthy(p) for p in preds])


@dataclass
class Not(RowCall):
    """Existence-complement (executeNotShard executor.go:5554-5603; requires
    ``trackExistence`` in the reference — implicit here). NULL-valued records
    exist, so ``Not(Row(f=v))`` INCLUDES records where f is NULL — hence the
    ``_truthy`` coercion before negation."""

    child: RowCall

    def predicate(self, idx: Index) -> Optional[Column]:
        p = self.child.predicate(idx)
        return None if p is None else ~_truthy(p)

    def ids(self, idx: Index) -> DataFrame:
        pred = self.predicate(idx)
        if pred is not None:
            return super().ids(idx)
        return idx.id_frame(idx.df).join(self.child.ids(idx), "_id", "left_anti")


@dataclass
class UnionRows(RowCall):
    """OR of the row-bitmaps of the rows its CHILD CALLS produce
    (executeUnionRows executor.go:5696-5780). A child may be a bare
    field name / argless ``Rows(f)`` — "record has ANY value of f",
    a single whole-column predicate — or a rows-producing call whose
    arguments restrict WHICH rows union: ``Rows(f, limit/previous/…)``
    or ``TopN``/``TopK`` (``Count(UnionRows(TopN(s, n=1)))`` = only the
    top row's bitmap, Test_Executor_Execute_UnionRows). The restricted
    form computes the child's row VALUES (a tiny frame) and semi-joins
    membership — broadcast, no extra shuffle."""

    calls: Sequence

    def __init__(self, *calls):
        self.calls = calls

    @staticmethod
    def _trivial_field(c) -> Optional[str]:
        """Field name when the child is 'every row of f', else None."""
        if isinstance(c, str):
            return c
        if isinstance(c, Rows) and all(
            v is None for v in (c.like, c.in_, c.previous, c.limit,
                                c.column, c.from_, c.to)
        ):
            return c.field
        return None

    def predicate(self, idx: Index) -> Optional[Column]:
        preds = []
        for call in self.calls:
            f = self._trivial_field(call)
            if f is None:
                return None  # restricted child → join form via ids()
            c = F.col(f)
            if idx.is_array_field(f):
                preds.append(c.isNotNull() & (F.size(c) > 0))
            else:
                preds.append(c.isNotNull())
        return reduce(lambda a, b: a | b, preds)

    def ids(self, idx: Index) -> DataFrame:
        pred = self.predicate(idx)
        if pred is not None:
            return super().ids(idx)
        frames = []
        for call in self.calls:
            f = self._trivial_field(call)
            if f is not None:
                frames.append(
                    idx.id_frame(idx.df.where(
                        (F.col(f).isNotNull() & (F.size(F.col(f)) > 0))
                        if idx.is_array_field(f) else F.col(f).isNotNull()
                    ))
                )
                continue
            fld = call.field
            vals = call.to_df(idx).select(F.col(fld).alias("__v"))
            if idx.is_quantum_field(fld):
                memb = idx.df.select(
                    F.col(idx.id_col).alias("_id"),
                    F.explode(
                        F.transform(F.col(fld), lambda x: x["value"])
                    ).alias("__v"),
                )
            elif idx.is_array_field(fld):
                memb = idx.df.select(
                    F.col(idx.id_col).alias("_id"),
                    F.explode(fld).alias("__v"),
                )
            else:
                memb = idx.df.select(
                    F.col(idx.id_col).alias("_id"),
                    F.col(fld).alias("__v"),
                )
            frames.append(
                memb.join(F.broadcast(vals), "__v", "left_semi")
                .select("_id")
            )
        return reduce(lambda a, b: a.unionByName(b), frames).distinct()


@dataclass
class Shift(RowCall):
    """Record-ID arithmetic: every bit shifted up by n
    (executeShiftShard executor.go:5818-5838). Inherently an ID transform, so
    only the id-frame representation exists."""

    child: RowCall
    n: int = 1

    def predicate(self, idx: Index) -> None:
        return None

    def ids(self, idx: Index) -> DataFrame:
        return self.child.ids(idx).select((F.col("_id") + self.n).alias("_id"))


@dataclass
class Limit(RowCall):
    """``Limit(child, limit=, offset=)`` — first N record IDs in ID order
    (executeLimitCall executor.go:1027-1102). ID-ordered ``offset().limit()``;
    Spark plans this as a TakeOrdered-style global limit."""

    child: RowCall
    limit: Optional[int] = None
    offset: int = 0

    def predicate(self, idx: Index) -> None:
        return None

    def ids(self, idx: Index) -> DataFrame:
        out = self.child.ids(idx).orderBy("_id")
        if self.offset:
            out = out.offset(self.offset)
        if self.limit is not None:
            # DataFrame.limit takes a JVM int; the reference's implicit
            # "unlimited" (math.MaxUint64, executor.go:1036) maps to no limit.
            out = out.limit(min(self.limit, 2**31 - 1))
        return out


# ---------------------------------------------------------------------------
# Reader-calls
# ---------------------------------------------------------------------------


class ReaderCall:
    def to_df(self, idx: Index) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


def _filtered(idx: Index, flt: Optional[RowCall]) -> DataFrame:
    if isinstance(flt, Distinct):
        # a Distinct in a filter position is its value set consumed as
        # a column bitmap (GroupBy(Rows(type), filter=Distinct(…)) —
        # executor_test.go:7072-7095)
        flt = DistinctAsRow(flt)
    if flt is not None and not isinstance(flt, RowCall):
        # e.g. Count(Arrow(...)): reader calls are not row filters — the
        # reference's analyzer rejects non-bitmap children the same way
        raise TypeError(
            f"{type(flt).__name__}() does not produce a row set and "
            "cannot be used as a filter argument"
        )
    return idx.df if flt is None else flt.filter_df(idx)


@dataclass
class Count(ReaderCall):
    """Bitmap cardinality (executeCount executor.go:5839-5894) → 1-row
    DataFrame ``count``. Compiles to a partial+final count — the exact
    map/reduce shape of the reference's per-shard Count."""

    child: RowCall

    def to_df(self, idx: Index) -> DataFrame:
        if isinstance(self.child, Distinct):
            # Count(Distinct(…)) counts the DISTINCT VALUES — the child
            # is precomputed into a value row and Count takes its
            # cardinality (handlePreCalls, executor.go:544-641;
            # executor_test.go:8745-8755 pins Count(Distinct(
            # field=likenums)) = 7 and = 5 over a signed BSI field,
            # negatives included)
            return self.child.to_df(idx).agg(
                F.count(F.lit(1)).alias("count")
            )
        if not isinstance(self.child, RowCall):
            # e.g. Count(Arrow(...)): reader calls are not row filters —
            # the reference's analyzer rejects non-bitmap children too
            raise TypeError(
                f"{type(self.child).__name__}() does not produce a row "
                "set and cannot be used as a filter argument"
            )
        # filter-then-count keeps the predicate at the scan (PushedFilters)
        # and counts no columns at all — parquet answers from row-group
        # metadata where possible.
        return self.child.filter_df(idx).agg(F.count(F.lit(1)).alias("count"))


@dataclass
class _FieldAgg(ReaderCall):
    field: str
    filter: Optional[RowCall] = None

    def _check_field(self, idx: Index) -> None:
        """The reference's per-shard mapper refuses an unknown field
        ('executing: executeSum/executeMinRow/…: mapping on primary
        node: field not found' — TestExecutor_Execute_Sum/
        SumNonExistent, MinMaxRow/Min+MaxRowNonExistent); without this
        the Spark plan would surface an UNRESOLVED_COLUMN analysis
        error instead."""
        if self.field not in idx.df.columns:
            raise ValueError("field not found")


class Sum(_FieldAgg):
    """Sum of a BSI (int/decimal) field over the filtered bitmap, plus the
    contributing-record count the reference carries for AVG
    (executeSum executor.go:1119-1172, shard 2155-2217)."""

    def to_df(self, idx: Index) -> DataFrame:
        self._check_field(idx)
        df = _filtered(idx, self.filter)
        return df.agg(
            F.sum(self.field).alias("sum"),
            F.count(self.field).alias("count"),
        )


class Min(_FieldAgg):
    """executeMin executor.go:1225-1260 — ValCount result: the extreme
    value AND the number of records holding it (TestExecutor_Execute_
    MinMaxCountEqual pins Min(field=f)={Val:3, Count:4}; the timestamp
    corpus renders 'value,count' rows). One aggregation pass: the count
    conditions on equality with the running extreme."""

    _AGG = "min"

    def to_df(self, idx: Index) -> DataFrame:
        self._check_field(idx)
        # same plan class as MinRow: partial (value, count) aggregation
        # per partition, shuffle |distinct values|, TakeOrdered 1 — the
        # reference's per-shard min + count merge (executor.go:6560-
        # 6650). Empty/all-null input → a single NULL,0 row (the
        # reference's zero ValCount renders as null).
        df = _filtered(idx, self.filter)
        vals = df.select(F.col(self.field).alias("__v__")).where(
            F.col("__v__").isNotNull()
        )
        agged = vals.groupBy("__v__").agg(F.count(F.lit(1)).alias("count"))
        order = (
            F.col("__v__").asc() if self._AGG == "min"
            else F.col("__v__").desc()
        )
        one = agged.orderBy(order).limit(1).select(
            F.col("__v__").alias(self._AGG), "count"
        )
        spark = df.sparkSession
        from pyspark.sql.types import StructField, StructType

        nullable = StructType(
            [StructField(f.name, f.dataType, True) for f in one.schema.fields]
        )
        empty = spark.createDataFrame([(None, 0)], nullable)
        # union-limit keeps the 1-row contract on empty input without a
        # driver-side count: the real row (if any) sorts first
        return one.unionByName(empty).orderBy(
            F.col(self._AGG).isNull().asc()
        ).limit(1)


class Max(Min):
    """executeMax executor.go:1261-1309 — ValCount like Min."""

    _AGG = "max"


class MinRow(_FieldAgg):
    """Lowest field value having ≥1 record, with its record count
    (executeMinRow executor.go:1604-1642)."""

    _AGG = "min"

    def to_df(self, idx: Index) -> DataFrame:
        self._check_field(idx)
        df = _filtered(idx, self.filter)
        if idx.is_array_field(self.field):
            vals = df.select(F.explode(self.field).alias("__v__"))
        else:
            vals = df.select(F.col(self.field).alias("__v__"))
        extreme = vals.agg(getattr(F, self._AGG)("__v__").alias("__extreme__"))
        return (
            vals.join(F.broadcast(extreme), F.col("__v__") == F.col("__extreme__"))
            .groupBy("__extreme__")
            .agg(F.count(F.lit(1)).alias("count"))
            .select(F.col("__extreme__").alias(self.field), "count")
        )  # wire headers: (field-name, count) — dax_test PQLTests
        # 'minrow'/'maxrow' pin hdr("an_id_set")


class MaxRow(MinRow):
    """executeMaxRow executor.go:1643-1681."""

    _AGG = "max"


@dataclass
class Distinct(_FieldAgg):
    """Distinct values of a field over the filtered bitmap
    (executeDistinct executor.go:1173-1224, shard 1820-2154). Set fields
    explode first (one bitmap per value in the reference). Plan: partial
    hash-distinct per partition then exchange on the value — same shape as
    the reference's per-shard distinct + merge.

    ``index_name`` carries the TEXT form's ``index=other`` cross-index
    argument (defs_join.go 'distinctjoin'); parser.execute resolves it
    against its ``indexes`` registry into DistinctAsRow.source."""

    index_name: Optional[str] = None

    def to_df(self, idx: Index) -> DataFrame:
        df = _filtered(idx, self.filter)
        if idx.is_quantum_field(self.field):
            df = df.select(
                F.explode(
                    F.transform(F.col(self.field), lambda x: x["value"])
                ).alias(self.field)
            )
        elif idx.is_array_field(self.field):
            df = df.select(F.explode(self.field).alias(self.field))
        return df.select(self.field).where(F.col(self.field).isNotNull()).distinct()


@dataclass
class DistinctAsRow(RowCall):
    """A ``Distinct`` consumed in a BITMAP position — TopN src, Store
    child, GroupBy/Count filter, set-op operand. The reference
    precomputes the Distinct and hands its result row to the outer call
    (handlePreCalls executor.go:544-641; executor_test.go
    TestExecutor_Execute_CountDistinct wraps the same Distinct in
    Count/GroupBy/Store, TestExecutor_Execute_TopNDistinct in TopN).
    The distinct VALUES become record ids of the consuming index; the
    consumer's semi-join broadcasts when the value set is small.

    ``source`` carries the ``index=other`` cross-index form — the
    Distinct runs on the SOURCE index and the ids land on the consuming
    one (the ForeignIndex battery's join shape)."""

    distinct: "Distinct"
    source: Optional[Index] = None

    def predicate(self, idx: Index) -> Optional[Column]:
        return None  # join form — see RowCall.filter_df fallback

    def ids(self, idx: Index) -> DataFrame:
        src = self.source if self.source is not None else idx
        return self.distinct.to_df(src).select(
            F.col(self.distinct.field).alias("_id")
        )


def as_row_call(obj):
    """Wrap a Distinct appearing in a bitmap position; pass row calls
    through unchanged."""
    if isinstance(obj, Distinct):
        return DistinctAsRow(obj)
    return obj


def foreign_distinct_rows(
    target: Index, source: Index, distinct: "Distinct"
) -> DataFrame:
    """Cross-index ``Distinct`` consumption — the foreign-index query
    pattern (field.go:133-141; executor.go dispatches a nested
    ``Distinct(index=other, field=fk)`` remotely and feeds the resulting
    row set into the OUTER index's filter): the fk values distinct-ed on
    the SOURCE index are record ids of the TARGET index, so the target
    consumes them as a row filter — Spark-first this is one LEFT-SEMI
    join of the target on its id column (the ``Row(in=…)`` form), which
    Catalyst broadcasts when the distinct side is small. Returns the
    target rows whose ``_id`` is referenced."""
    vals = distinct.to_df(source).select(
        F.col(distinct.field).alias("__fk")
    )
    return target.df.join(
        vals, F.col(target.id_col) == F.col("__fk"), "left_semi"
    )


@dataclass
class Percentile(ReaderCall):
    """PQL Percentile with the reference's EXACT bisection semantics
    (executePercentile executor.go:1310-1603).

    The reference does NOT return a nearest-rank order statistic: it
    bisects the value domain and returns the first midpoint ``v`` with
    ``count(<v) <= desiredLess`` and ``count(>v) <= desiredGreater`` —
    a value that may be ABSENT from the data (defs_aggregate.go pins
    ``percentile(d1, 50)`` over {10,10,11,12,12,13} = 11.50, the
    min/max midpoint). When the loop's bracket collapses before a
    midpoint qualifies, the LAST midpoint computed is returned even
    though it was rejected (executor.go:1546-1576 falls out of the
    ``for minLessthanMax()`` loop with ``possibleNthVal`` still set) —
    median of {0,1,1,1} is 0. Both behaviors are replayed here; see
    :func:`reference_percentile` for the scale strategy.

    Column dtypes: int columns replay the Go int path (truncating
    average, executor.go:1484-1490); decimal(p,s) columns replay the
    pql.Decimal path (scaled ints, floor average — big.Int Div in
    DivideDecimal, pql/decimal.go:150-161). Float/double columns keep
    exact NEAREST-RANK as a documented EXTENSION — the reference has
    no float BSI fields, so there is no reference behavior to match.

    The result is a 1-row literal frame."""

    field: str
    nth: float
    filter: Optional[RowCall] = None

    def to_df(self, idx: Index) -> DataFrame:
        from pyspark.sql.types import StructField, StructType

        if self.nth is None:
            raise ValueError("Percentile(): nth required")
        nthf = float(self.nth)
        if nthf < 0 or nthf > 100.0:
            raise ValueError(
                f"Percentile(): invalid nth value ({nthf:f}), should be "
                f"a number between 0 and 100 inclusive"
            )
        df = _filtered(idx, self.filter).select(self.field).where(
            F.col(self.field).isNotNull()
        )
        dt = dict(df.dtypes)[self.field]
        if dt in ("int", "bigint", "smallint", "tinyint") or dt.startswith(
            "decimal"
        ):
            val = reference_percentile(df, self.field, nthf)
        else:
            # float/double: nearest-rank EXTENSION (no reference dtype)
            val = percentile_search(df, self.field, nthf)
        schema = StructType(
            [StructField("percentile", df.schema[self.field].dataType, True)]
        )
        return idx.df.sparkSession.createDataFrame([(val,)], schema)


def _go_trunc_mid(lo: int, hi: int) -> int:
    """The reference's overflow-safe int midpoint with Go division
    semantics — truncation toward zero for both / and % (executor.go:
    1484-1490: ``(min/2)+(max/2)+(((min%2)+(max%2))/2)``)."""

    def d2(x: int) -> int:
        return x // 2 if x >= 0 else -((-x) // 2)

    def m2(x: int) -> int:
        return x - d2(x) * 2

    return d2(lo) + d2(hi) + d2(m2(lo) + m2(hi))


def _floor_mid(lo: int, hi: int) -> int:
    """Decimal-path midpoint: DivideDecimal(Add(min,max), 2) reduces to
    big.Int Div = FLOOR division on the scaled values (pql/decimal.go:
    150-161) — differs from the int path's truncation for negatives."""
    return (lo + hi) // 2


def _bisect_replay(lo: int, hi: int, a: int, b: int, mid_fn) -> int:
    """Arithmetic replay of the executePercentile loop given the two
    order statistics that drive its branches: ``leftCount(mid) >
    desiredLess  ⟺  mid > b`` (b = 0-indexed sorted[desiredLess]) and
    ``rightCount(mid) > desiredGreater  ⟺  mid < a`` (a =
    sorted[n-1-desiredGreater]). With those equivalences the loop needs
    NO further data access — including the fall-out behavior where a
    rejected midpoint is returned once the bracket collapses."""
    val = lo
    while lo < hi:
        val = mid_fn(lo, hi)
        if val > b:  # leftCount > desiredLess
            hi = val - 1
        elif val < a:  # rightCount > desiredGreater
            lo = val + 1
        else:
            break
    return val


def _rank_value(vals: DataFrame, field: str, rank: int, lo_v: int, hi_v: int):
    """Value at 1-indexed ``rank`` of the non-null int column ``field``
    within [lo_v, hi_v] — the scale machinery shared by nearest-rank and
    the bisection's order statistics: 2^16-bucket range histograms narrow
    the span 65536× per level (≤4 levels for a 64-bit domain), then one
    in-bucket value histogram resolves the rank. Driver memory ≤ 2^16
    pairs per level; every scan past the first carries a pushed-down
    range filter."""
    below = 0
    while hi_v - lo_v > (1 << 20):
        nb = 1 << 16
        width = ((hi_v - lo_v) // nb) + 1
        buckets = (
            vals.where((F.col(field) >= lo_v) & (F.col(field) <= hi_v))
            .groupBy(
                F.floor((F.col(field) - F.lit(lo_v)) / F.lit(width)).alias("b")
            )
            .count()
            .orderBy("b")
            .collect()
        )
        running, bi = below, 0
        for r in buckets:
            if running + r["count"] >= rank:
                bi = int(r["b"])
                break
            running += r["count"]
        below = running
        new_lo = lo_v + bi * width
        lo_v, hi_v = new_lo, min(hi_v, new_lo + width - 1)
    hist = (
        vals.where((F.col(field) >= lo_v) & (F.col(field) <= hi_v))
        .groupBy(field)
        .count()
        .orderBy(field)
        .collect()
    )
    running = below
    for r in hist:
        running += r["count"]
        if running >= rank:
            return r[field]
    return hist[-1][field] if hist else hi_v  # defensive


def reference_percentile(df: DataFrame, field: str, nth: float):
    """Distributed replay of executePercentile (executor.go:1310-1603)
    with the reference's exact outputs, including midpoints absent from
    the data and the rejected-midpoint fall-out (see Percentile).

    Strategy: the bisection's branch at each probe depends only on two
    order statistics (b = sorted[desiredLess], a =
    sorted[n-1-desiredGreater]), so instead of the reference's 2 Count
    queries per iteration (over every shard, up to ~64 iterations) this
    runs ONE stats aggregate + at most two rank searches — each ≤ 5
    pushed-down scans via 2^16-bucket histogram narrowing — then replays
    the loop as driver-side arithmetic. Same answers, O(1) jobs instead
    of O(log range) jobs. Small spans (≤ 2^20) resolve both ranks from a
    single value histogram.

    Decimal(p, s) columns run the same replay on 10^s-scaled longs with
    the floor-average midpoint (DivideDecimal semantics) and unscale the
    result to decimal.Decimal at the column's scale."""
    import decimal as _dec

    dt = dict(df.dtypes)[field]
    scale = 0
    vals = df.select(field).where(F.col(field).isNotNull())
    if dt.startswith("decimal"):
        scale = int(dt.rstrip(")").split(",")[1]) if "," in dt else 0
        vals = vals.select(
            (F.col(field) * F.lit(10**scale)).cast("long").alias(field)
        )
        mid_fn = _floor_mid
    else:
        mid_fn = _go_trunc_mid

    row = vals.agg(
        F.min(field).alias("lo"),
        F.max(field).alias("hi"),
        F.count(field).alias("n"),
    ).first()
    minv, maxv, n = row["lo"], row["hi"], row["n"]

    def unscale(v):
        if v is None or scale == 0:
            return v if not dt.startswith("decimal") else _dec.Decimal(v)
        return _dec.Decimal(v).scaleb(-scale)

    if n == 0:
        return None  # the median of nothing is NULL (executor.go:1404)
    # float math ordered exactly as Go: (float64(n) * nth) / 100.0
    desired_less = int((float(n) * nth) / 100.0)
    desired_greater = int((float(n) * (100.0 - nth)) / 100.0)
    if desired_greater != 0 and desired_less == 0:
        return unscale(int(minv))
    if desired_greater == 0:
        return unscale(int(maxv))
    lo_v, hi_v = int(minv), int(maxv)
    if hi_v - lo_v <= (1 << 20):
        hist = (
            vals.groupBy(field).count().orderBy(field).collect()
        )
        cum, b_val, a_val = 0, None, None
        for r in hist:
            cum += r["count"]
            # b = value at rank desired_less+1; a = at rank n-desired_greater
            if b_val is None and cum >= desired_less + 1:
                b_val = r[field]
            if a_val is None and cum >= n - desired_greater:
                a_val = r[field]
        a, b = int(a_val), int(b_val)
    else:
        b = int(_rank_value(vals, field, desired_less + 1, lo_v, hi_v))
        a = int(_rank_value(vals, field, n - desired_greater, lo_v, hi_v))
    return unscale(_bisect_replay(lo_v, hi_v, a, b, mid_fn))


def percentile_search(df: DataFrame, field: str, nth: float, max_iters: int = 80):
    """Exact NEAREST-RANK percentile with the minimum number of scans —
    the float/double EXTENSION path and the generic rank→value machinery.
    Reference-parity Percentile semantics (bisection midpoints that may
    be absent from the data) live in :func:`reference_percentile`; this
    function keeps the order-statistic definition for dtypes the
    reference cannot hold (float BSI does not exist).

    Int columns resolve via :func:`_rank_value` (2^16-bucket histogram
    narrowing, ≤4 levels for a 64-bit domain, every scan pushed down,
    driver holds ≤2^16 pairs per level). Floats keep the bracket search:
    count(<=lo) < rank <= count(<=hi) until the bracket is ~1e-12
    relative, then the few candidate values resolve the rank exactly."""
    vals = df.where(F.col(field).isNotNull())
    row = vals.agg(
        F.min(field).alias("lo"), F.max(field).alias("hi"), F.count(field).alias("n")
    ).first()
    minv, maxv, n = row["lo"], row["hi"], row["n"]
    if n == 0:
        return None
    rank = max(1, math.ceil(nth / 100.0 * n))
    is_int = dict(df.dtypes)[field] in ("int", "bigint", "smallint", "tinyint")
    if is_int:
        return _rank_value(vals, field, rank, int(minv), int(maxv))
    lo_cnt = vals.where(F.col(field) <= F.lit(minv)).count()
    if lo_cnt >= rank:
        return minv
    lo, hi = float(minv), float(maxv)  # decimals: probe in float space,
    # exactness restored by the candidate-resolution step below
    for _ in range(max_iters):
        if (hi - lo) <= max(abs(hi), abs(lo), 1e-300) * 1e-12:
            break
        mid = (lo + hi) / 2.0
        if mid <= lo or mid >= hi:
            break  # adjacent doubles — cannot split further
        cnt = vals.where(F.col(field) <= F.lit(mid)).count()
        if cnt >= rank:
            hi = mid
        else:
            lo, lo_cnt = mid, cnt
    # Resolve exactly among the values left in (lo, hi] — a handful after
    # the search — by cumulating their counts from the known count(<=lo).
    cands = (
        vals.where((F.col(field) > F.lit(lo)) & (F.col(field) <= F.lit(hi)))
        .groupBy(field)
        .count()
        .orderBy(field)
        .collect()
    )
    running = lo_cnt
    for r in cands:
        running += r["count"]
        if running >= rank:
            return r[field]
    return cands[-1][field] if cands else hi  # defensive; invariant makes it unreachable


@dataclass
class TopN(ReaderCall):
    """Top-n field values by record count. The reference serves TopN from
    per-fragment ranked caches and is APPROXIMATE (executeTopN
    executor.go:2779-2868, cache.go:19-45); TopK is exact (executeTopK
    executor.go:2357-2487). On Spark both compile to the same exact plan —
    partial count per partition, merge, global top-k (an exact superset of
    TopN; divergence recorded per SURVEY §7 risk register).

    Ties broken by value ascending for determinism. ``n=None`` ranks ALL
    values descending — the reference's no-k form (``TopK(dinner)``,
    executor_test.go:9003-9016; executor.go:2381-2390 only limits when
    hasK). Plan shape at scale: map-side partial aggregation shrinks the
    shuffle to |distinct values|; the final sort+limit is a cheap
    TakeOrdered over the merged counts."""

    field: str
    n: Optional[int] = None
    filter: Optional[RowCall] = None
    from_: object = None
    to: object = None

    def to_df(self, idx: Index) -> DataFrame:
        if self.field not in idx.df.columns:
            # executor_test.go TopN/ErrFieldNotFound exact text
            raise ValueError(f'field "{self.field}" not found')
        if not isinstance(self, TopK):
            # the ranked-cache surface is TopN-only; the exact texts
            # are the reference's (executor_test.go TopN/ErrBSIField,
            # /ErrCacheNone). Spark needs neither cache nor row-bitmap
            # storage, but the refusals are part of the declared API.
            if idx.field_types.get(self.field) in (
                "int", "decimal", "timestamp"
            ):
                raise ValueError(
                    "cannot compute TopN() on integer, decimal, or "
                    f'timestamp field: "{self.field}"'
                )
            if self.field in idx.no_cache:
                raise ValueError(
                    f'cannot compute TopN(), field has no cache: '
                    f'"{self.field}"'
                )
        df = _filtered(idx, self.filter)
        if idx.is_quantum_field(self.field):
            # time-quantum field: from=/to= restrict bits through the
            # view cover, and counts are per-RECORD (the reference
            # unions the value's view bitmaps before counting —
            # TopK_Time pins record 0 holding f=0 in TWO covered views
            # as Count 1 contribution, executor_test.go:1811-1844)
            tp = _quantum_view_pred(idx, self.field, self.from_, self.to)
            ent = F.col(self.field)
            if tp is not None:
                ent = F.filter(ent, lambda x: tp(x["ts"]))
            df = (
                df.select(
                    F.col(idx.id_col).alias("__rec"),
                    F.explode(
                        F.transform(ent, lambda x: x["value"])
                    ).alias(self.field),
                )
                .dropDuplicates(["__rec", self.field])
            )
        elif idx.is_array_field(self.field):
            df = df.select(F.explode(self.field).alias(self.field))
        elif self.from_ is not None or self.to is not None:
            raise ValueError(
                f"field {self.field} is not a time-field, 'from' "
                f"and 'to' are not valid options for this field type"
            )
        out = (
            df.where(F.col(self.field).isNotNull())
            .groupBy(self.field)
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), F.asc(self.field))
        )
        return out.limit(self.n) if self.n is not None else out


class TopK(TopN):
    """Exact top-k (executeTopK executor.go:2357-2487; per-shard count-BSI +
    PivotDescending bsi.go:18-64). Identical exact plan as TopN here;
    k omitted → all values ranked (executor.go:2381-2390); from=/to= on
    a time-quantum field count within the view cover (executeTopK
    filters views via field.viewsByTimeRange, executor.go:2403-2437)."""

    def __init__(
        self, field: str, k: Optional[int] = None,
        filter: Optional[RowCall] = None, from_=None, to=None,
    ):
        super().__init__(field=field, n=k, filter=filter, from_=from_, to=to)


@dataclass
class Rows(ReaderCall):
    """List the distinct values ("row IDs") of a field with paging/pattern
    restrictions (executeRows executor.go:3987-4076, shard 4077-4356; LIKE
    planner like.go:12-190 → native Spark LIKE).

    Args mirror the reference: ``like`` (key glob), ``in_`` (explicit list),
    ``previous`` (exclusive paging cursor), ``limit``, ``column`` (restrict to
    one record's values), ``from_``/``to`` (time range on Index.time_col).

    DOCUMENTED DIVERGENCE (TestExecutor_Execute_Rows_Keys): on keyed
    fields the reference pages in ROW-ID order — i.e. key CREATION
    order, an artifact of its translation store. A relational table
    has no creation order, so ``previous`` here pages in VALUE order
    (lexicographic for keys) — deterministic and total, but a cursor
    taken from the reference will not resume at the same position
    when keys were created out of sorted order. ``like`` requires a
    keyed (string) field, as in the reference (unkeyed fields have no
    keys to match — the 'translating call' refusal)."""

    field: str
    like: Optional[str] = None
    in_: Optional[Sequence] = None
    previous: object = None
    limit: Optional[int] = None
    column: object = None
    from_: object = None
    to: object = None

    def validate(self) -> None:
        """'in' is exclusive of every other restriction — the reference
        refuses the combination outright rather than guessing an
        intersection order (executor.go:4006-4016, exact text with the
        offending argument name)."""
        if self.limit is not None and int(self.limit) < 0:
            # pql/ast.go:810 UintArg — Rows(f, limit=-1) and the same
            # call nested under GroupBy both surface this
            # (TestExecutor_Execute_Query_Error cases 3-4)
            raise ValueError(
                f"value for 'limit' must be positive, but got {self.limit}"
            )
        if self.in_ is None:
            return
        for arg, v in (
            ("like", self.like),
            ("previous", self.previous),
            ("limit", self.limit),
            ("column", self.column),
            ("from", self.from_),
            ("to", self.to),
        ):
            if v is not None:
                raise ValueError(
                    f"Rows call with 'in' does not support other "
                    f"arguments, but found '{arg}'"
                )

    def guard(self, idx: Index) -> None:
        """The executeRows entry checks, shared by the scan path and
        the bitmap-routed path (pql/parser._route_reader) so both doors
        refuse identically: arg exclusivity/limit (validate), field
        existence, like-needs-keys, and the field-type whitelist."""
        self.validate()
        if self.field not in idx.df.columns:
            raise ValueError("field not found")  # ErrFieldNotFound
        if self.like is not None and not idx.is_keyed_field(self.field):
            # like matches KEYS; an unkeyed field has none —
            # Rows(f_id, like="__") is the reference's 'executing:
            # translating call:' refusal (TestExecutor_Execute_Rows_Keys)
            raise ValueError(
                f'translating call: cannot match like pattern on '
                f'unkeyed field "{self.field}"'
            )
        ft = idx.field_type(self.field)
        if ft not in ("set", "mutex", "time"):
            # executeRows accepts set/mutex/time fields only
            # (executor.go:4124-4129, exact text with f.Type()); note
            # GroupBy children are NOT guarded — the reference's
            # groupByIterator handles int/timestamp fields there
            raise ValueError(f"{ft} fields not supported by Rows() query")

    def to_df(self, idx: Index) -> DataFrame:
        self.guard(idx)
        df = idx.df
        if self.column is not None:
            df = df.where(F.col(idx.id_col) == F.lit(self.column))
        if idx.is_quantum_field(self.field):
            # quantum set field: from/to filter BITS through the view
            # cover (Rows-with-time, executor.go:4077-4170 walks only
            # the covered views), then values distinct as usual
            tp = _quantum_view_pred(idx, self.field, self.from_, self.to)
            ent = F.col(self.field)
            if tp is not None:
                ent = F.filter(ent, lambda x: tp(x["ts"]))
            df = df.select(
                F.explode(F.transform(ent, lambda x: x["value"])).alias(
                    self.field
                )
            )
        else:
            if self.from_ is not None:
                df = df.where(F.col(idx.time_col) >= F.lit(self.from_))
            if self.to is not None:
                df = df.where(F.col(idx.time_col) < F.lit(self.to))
            if idx.is_array_field(self.field):
                df = df.select(F.explode(self.field).alias(self.field))
        vals = df.select(self.field).where(F.col(self.field).isNotNull()).distinct()
        if self.like is not None:
            vals = vals.where(F.col(self.field).like(self.like))
        if self.in_ is not None:
            vals = vals.where(F.col(self.field).isin(list(self.in_)))
        if self.previous is not None:
            vals = vals.where(F.col(self.field) > F.lit(self.previous))
        vals = vals.orderBy(self.field)
        if self.limit is not None:
            vals = vals.limit(self.limit)
        return vals


@dataclass
class GroupBy(ReaderCall):
    """Multi-field group-by with optional aggregate/having/sort/limit
    (executeGroupBy executor.go:3176-3438; having 3389-3405; count-distinct
    via nested Distinct 3370-3386).

    ``rows``: Rows-call fields to group on (set fields explode — the
    reference cross-products row bitmaps, so records lacking a value in any
    grouped field are excluded → ``dropna`` on group keys). Each child's
    ``like``/``in_`` restricts that field's grouped values, and
    ``previous`` pages: the cursor is the full GROUP TUPLE (fields
    without previous contribute their first row id), results resume
    STRICTLY AFTER it in lexicographic (odometer) order — the wrapping
    semantics of the reference's groupByIterator
    (executor_test.go "test wrapping with previous": previous=1 on the
    last of three fields yields (0,0,2) then WRAPS to (0,1,0)).
    ``aggregate``: None → count; ("sum", f) — Count counts only records
    WITH a value in f and all-null groups drop (executeSumCountShard via
    groupByIterator.Next, executor.go:8901-8911; executor_test.go
    "Aggregate" expects Count=2 of a 3-column group);
    ("count_distinct", f) — plain Count plus the distinct count in an
    ``aggregate`` column, zero-aggregate groups kept (coordinator
    post-pass executor.go:3340-3386; GroupCounts.AggregateColumn names
    it "aggregate"); or a LIST of ("sum"|"min"|"max"|"avg"|
    "count_distinct", f) tuples — the reference runs one PQL GroupBy per
    aggregate and merges (PlanOpPQLMultiGroupBy oppqlmultigroupby.go);
    Spark computes them all in the SAME single-shuffle pass (aliases
    ``{kind}_{field}``, plain count semantics — documented superset).
    ``having``: (aggname, op, value) post-agg filter; only count/sum
    subjects, like the reference's Condition (executor.go:3398-3404).
    ``sort``: comma-separated "<subject> [asc|desc]" entries over
    count/aggregate/sum (getSorter executor.go:3117-3156 — direction
    DEFAULTS TO DESC, "aggregate" and "sum" both name the aggregate
    column); a plain column name of the aggregated frame also works
    (extension for the multi-aggregate form); anything else raises the
    reference's exact error. The sort is stable w.r.t. group order
    (sort.Stable), so group keys ascending break ties.

    Plan at scale: single shuffle on the group keys with map-side partial
    aggregation; having/sort/limit run on the (small) aggregated result —
    the same coordinator post-step as the reference (executor.go:3389-3438)."""

    rows: Sequence[Rows]
    filter: Optional[RowCall] = None
    aggregate: Optional[tuple] = None
    having: Optional[tuple] = None
    sort: Optional[str] = None
    limit: Optional[int] = None
    offset: int = 0

    def to_df(self, idx: Index) -> DataFrame:
        if not self.rows:
            # executor.go:3181 — GroupBy() with no Rows children
            raise ValueError("need at least one child call")
        for name, v in (("limit", self.limit), ("offset", self.offset)):
            if v is not None and int(v) < 0:
                # pql/ast.go:810 (UintArg on a negative literal)
                raise ValueError(
                    f"value for '{name}' must be positive, but got {v}"
                )
        df = _filtered(idx, self.filter)
        keys, quantum_grouped = [], False
        for r in self.rows:
            r.validate()
            f = r.field
            if idx.is_quantum_field(f):
                # quantum set field: per-bit view-cover filter, then the
                # value becomes the group key. A record may hold the
                # SAME value in several covered views (toronto in 2019-08
                # AND 2020-01) but the reference groups the UNION of the
                # value's view bitmaps — one membership per record —
                # so duplicates are dropped after the explode.
                tp = _quantum_view_pred(idx, f, r.from_, r.to)
                ent = F.col(f)
                if tp is not None:
                    ent = F.filter(ent, lambda x: tp(x["ts"]))
                df = df.withColumn(f, F.explode(F.transform(ent, lambda x: x["value"])))
                quantum_grouped = True
            elif idx.is_array_field(f):
                df = df.withColumn(f, F.explode(f))
            # per-child value restrictions cross-product into the group
            # lattice exactly like the reference's row-filtered iterators
            # (roaring.NewBitmapRowsFilter, executor.go:8740-8742)
            if r.like is not None:
                df = df.where(F.col(f).like(r.like))
            if r.in_ is not None:
                df = df.where(F.col(f).isin(list(r.in_)))
            if not idx.is_quantum_field(f):
                if r.from_ is not None:
                    df = df.where(F.col(idx.time_col) >= F.lit(r.from_))
                if r.to is not None:
                    df = df.where(F.col(idx.time_col) < F.lit(r.to))
            keys.append(f)
        if quantum_grouped:
            df = df.dropDuplicates([idx.id_col, *keys])
        # chained isNotNull instead of na.drop: na.drop compiles to
        # atleastnnonnulls(k, ...), which Spark does NOT push to the
        # parquet scan; per-column IsNotNull reaches PushedFilters and
        # lets row-group stats skip all-null stripes at scale
        for k in keys:
            df = df.where(F.col(k).isNotNull())
        self._page_df = df  # first-row minima source for previous paging
        if self.aggregate is None:
            agged = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))
        elif isinstance(self.aggregate, list):
            fns = {
                "sum": F.sum,
                "min": F.min,
                "max": F.max,
                "avg": F.avg,
                "count_distinct": F.countDistinct,
            }
            aggs = [F.count(F.lit(1)).alias("count")]
            for kind, fld in self.aggregate:
                if kind not in fns:
                    raise ValueError(f"unknown aggregate {kind}")
                aggs.append(fns[kind](fld).alias(f"{kind}_{fld}"))
            agged = df.groupBy(*keys).agg(*aggs)
        else:
            kind, fld, *agg_rest = self.aggregate
            if kind == "sum":
                # reference Sum: the group's bitmap intersects the BSI
                # existence bitmap BEFORE counting, so Count counts only
                # records with a value in fld and groups whose members
                # are all-null vanish (ret.Count==0 → skipped,
                # executor.go:8913-8919) — not Count-with-null-sum
                agged = (
                    df.where(F.col(fld).isNotNull())
                    .groupBy(*keys)
                    .agg(
                        F.count(F.lit(1)).alias("count"),
                        F.sum(fld).alias("sum"),
                    )
                )
            elif kind == "count_distinct":
                # coordinator post-pass (executor.go:3340-3386): the
                # group list and Count come from the PLAIN GroupBy; the
                # distinct count rides in the 'aggregate' column and MAY
                # be 0 without dropping the group. An optional RowCall
                # third element mirrors Count(Distinct(Row(...), field))
                # — the inner filter restricts the DISTINCT side only
                # (executor_test.go "AggregateCountDistinctFilterDistinct")
                dcol = F.col(fld)
                if agg_rest:
                    dcol = F.when(agg_rest[0].predicate(idx), dcol)
                agged = df.groupBy(*keys).agg(
                    F.count(F.lit(1)).alias("count"),
                    F.countDistinct(dcol).alias("aggregate"),
                )
            else:
                raise ValueError(f"unknown aggregate {kind}")
        return self._finish(agged, keys)

    def _finish(self, agged: DataFrame, keys: Sequence[str]) -> DataFrame:
        """having/sort/limit/offset post-step over the aggregated frame —
        the coordinator-side tail of executeGroupBy (executor.go:
        3389-3438), shared by the scan plan and the fragment-routed plan
        (pql/parser._route_reader). Also applies the previous-cursor
        paging filter (group tuple strictly after the cursor in
        lexicographic order — groupByIterator's odometer wrap)."""
        prevs = [getattr(r, "previous", None) for r in self.rows]
        if any(p is not None for p in prevs):
            cursor: list = list(prevs)
            missing = [
                keys[i] for i, p in enumerate(prevs) if p is None
            ]
            if missing:
                # fields without previous contribute their FIRST row id
                # to the cursor (the iterator starts at the beginning
                # and the whole odometer advances once). Bounded driver
                # collect: exactly ONE row of per-field minima.
                base = getattr(self, "_page_df", agged)
                first = base.agg(
                    *[F.min(k).alias(k) for k in missing]
                ).collect()[0]
                for i, p in enumerate(prevs):
                    if p is None:
                        cursor[i] = first[keys[i]]
            strictly_after = F.lit(False)
            ties = F.lit(True)
            for k, cv in zip(keys, cursor):
                strictly_after = strictly_after | (
                    ties & (F.col(k) > F.lit(cv))
                )
                ties = ties & (F.col(k) == F.lit(cv))
            agged = agged.where(strictly_after)
        if self.having is not None:
            name, op, val = self.having
            if name not in ("count", "sum"):
                # executor.go:3398-3404
                raise ValueError("Condition() only supports count or sum")
            if name == "sum" and "sum" not in agged.columns:
                # 'sum' reads the group's Agg value whatever the
                # aggregate is — Condition(sum>2) filters a
                # Count(Distinct(…)) aggregate's column
                # (applyConditionToGroupCounts executor.go:3447-3462;
                # executor_test.go pins having=Condition(sum>2) over
                # aggregate=Count(Distinct(field=zip_code)))
                name = "aggregate"
            c = F.col(name)
            if op == "><":  # range Condition (pql/ast.go:145 — [low, high])
                lo, hi = val
                agged = agged.where((c >= F.lit(lo)) & (c <= F.lit(hi)))
            else:
                v = F.lit(val)
                agged = agged.where(
                    {"==": c == v, "!=": c != v, "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]
                )
        order = [F.asc(k) for k in keys]
        if self.sort is not None:
            sort_cols = []
            for directive in str(self.sort).split(","):
                parts = directive.strip().split()
                if not parts:
                    # getSorter executor.go:3121-3124
                    raise ValueError(
                        f"invalid sorting directive: '{directive.strip()}'"
                    )
                subj = parts[0]
                if subj == "count":
                    col = "count"
                elif subj in ("aggregate", "sum"):
                    # both name the aggregate column (getSorter:3143)
                    col = (
                        "aggregate" if "aggregate" in agged.columns
                        else "sum"
                    )
                elif subj in agged.columns:
                    col = subj  # extension: multi-agg column names
                else:
                    raise ValueError(
                        "sorting is only supported on count, aggregate, "
                        f"or sum, not '{subj}'"
                    )
                # direction DEFAULTS TO DESC (getSorter:3148-3156)
                asc = len(parts) > 1 and parts[1].lower() == "asc"
                sort_cols.append(F.asc(col) if asc else F.desc(col))
            # sort.Stable over group order → group keys break ties
            order = sort_cols + order
        agged = agged.orderBy(*order)
        if self.offset:
            agged = agged.offset(self.offset)
        if self.limit is not None:
            agged = agged.limit(self.limit)
        return agged


@dataclass
class Extract(ReaderCall):
    """Materialize records: for each record in the filter bitmap, the values
    of the listed fields (executeExtract executor.go:4711-5119 — THE
    table-scan primitive; SQL SELECT compiles to Extract in the reference,
    oppqltablescan.go:235-280). Here: a projection over a pushed-down filter —
    Catalyst prunes the scan to exactly ``ReadSchema: _id + fields``.

    A field may be given as a ``Rows`` call instead of a bare name; on a
    time-quantum field its from=/to= restricts the extracted VALUE LIST
    through the view cover — records stay in the output with an empty
    list when none of their bits fall in the range (ExtractWithTime,
    executor_test.go:9708-9820)."""

    filter: RowCall
    fields: Sequence

    def __init__(self, filter: RowCall, *fields):
        self.filter = filter
        self.fields = fields

    def to_df(self, idx: Index) -> DataFrame:
        cols = []
        for f in self.fields:
            rows_call = f if isinstance(f, Rows) else None
            name = rows_call.field if rows_call is not None else f
            if idx.is_quantum_field(name):
                ent = F.col(name)
                if rows_call is not None:
                    tp = _quantum_view_pred(
                        idx, name, rows_call.from_, rows_call.to
                    )
                    if tp is not None:
                        ent = F.filter(ent, lambda x: tp(x["ts"]))
                # the reference presents quantum values as a []string
                # set — distinct values, not one entry per view bit
                cols.append(
                    F.array_distinct(
                        F.transform(ent, lambda x: x["value"])
                    ).alias(name)
                )
            else:
                cols.append(F.col(name))
        if isinstance(self.filter, Sort):
            # Extract over Sort keeps the SORTED record order with
            # limit/offset already applied (TestExecutor_Sort drives
            # Extract(Sort(...), Rows(f)) and pins the ordered ids,
            # executor_test.go:4333-4400). Join the page of ids back to
            # the base table and re-impose the sort key — the page is
            # small (it went through limit), so this is a broadcast.
            s = self.filter
            page = s.to_df(idx).select(idx.id_col)
            key = F.desc(s.field) if s.desc else F.asc(s.field)
            return (
                idx.df.join(F.broadcast(page), on=idx.id_col, how="inner")
                .orderBy(key, F.asc(idx.id_col))
                .select(idx.id_col, *cols)
            )
        return self.filter.filter_df(idx).select(idx.id_col, *cols)


@dataclass
class Sort(ReaderCall):
    """Record IDs sorted by a BSI field (executeSort executor.go:9321-9450 —
    per-shard sort + k-way merge; Spark's TakeOrdered/global sort is the same
    algorithm). Ties broken by ``_id`` for determinism."""

    child: RowCall
    field: str
    desc: bool = False
    limit: Optional[int] = None
    offset: int = 0

    def to_df(self, idx: Index) -> DataFrame:
        df = self.child.filter_df(idx).select(idx.id_col, self.field)
        key = F.desc(self.field) if self.desc else F.asc(self.field)
        df = df.orderBy(key, F.asc(idx.id_col))
        if self.offset:
            df = df.offset(self.offset)
        if self.limit is not None:
            df = df.limit(self.limit)
        return df


@dataclass
class IncludesColumn(ReaderCall):
    """Does the bitmap contain record N? (executeIncludesColumnCall
    executor.go:907-942) → 1-row boolean DataFrame."""

    child: RowCall
    column: object

    def to_df(self, idx: Index) -> DataFrame:
        pred = self.child.predicate(idx)
        base = idx.df.where(F.col(idx.id_col) == F.lit(self.column))
        if pred is not None:
            return base.agg(
                _truthy(F.max(_truthy(pred))).alias("result")
            )
        return self.child.ids(idx).where(F.col("_id") == F.lit(self.column)).agg(
            (F.count(F.lit(1)) > 0).alias("result")
        )  # wire header 'result' (dax_test PQLTests 'includescolumn')


@dataclass
class FieldValue(ReaderCall):
    """Point-read one field value for one record (executeFieldValueCall
    executor.go:943-1026). A pushed-down point filter — parquet row-group
    stats prune all but the matching chunk."""

    field: str
    column: object

    def to_df(self, idx: Index) -> DataFrame:
        # wire shape is a ValCount: (value, count=1) — dax_test
        # PQLTests 'fieldvalue' pins hdrs(value, count), row (33, 1)
        return (
            idx.df.where(F.col(idx.id_col) == F.lit(self.column))
            .select(
                F.col(self.field).alias("value"),
                F.lit(1).cast("long").alias("count"),
            )
        )


Range = Row  # deprecated alias of Row-with-time-range (executor.go:1729,1791)


@dataclass
class Options(RowCall):
    """``Options(child, shards=[...])`` — restrict execution to the given
    shards (executeOptionsCall executor.go:883-906). A shard is
    ``_id >> shard_exp`` (shardwidth/helper.go:14); the predicate form keeps
    the restriction pushdown-eligible, which is Spark's partition-pruning
    analogue of the reference's shard routing."""

    child: RowCall
    shards: Sequence[int] = ()
    shard_exp: int = 20

    def _shard_pred(self, idx: Index) -> Column:
        return F.shiftright(F.col(idx.id_col).cast("long"), self.shard_exp).isin(
            [int(s) for s in self.shards]
        )

    def predicate(self, idx: Index) -> Optional[Column]:
        pred = self.child.predicate(idx)
        if pred is None:
            return None
        return pred & self._shard_pred(idx)

    def ids(self, idx: Index) -> DataFrame:
        if self.child.predicate(idx) is not None:
            return super().ids(idx)
        exp = self.shard_exp
        shards = [int(s) for s in self.shards]
        return self.child.ids(idx).where(
            F.shiftright(F.col("_id").cast("long"), exp).isin(shards)
        )


@dataclass
class Arrow(ReaderCall):
    """``Arrow(filter, header=[...])`` — raw Arrow table of the filtered
    records' columns (arrow.go:26-120, dispatch executor.go:835). Arrow is
    already Spark's interchange format: filter+project, then ``to_arrow``
    yields a ``pyarrow.Table`` without a row-wise conversion step."""

    filter: RowCall
    header: Sequence[str] = ()

    def __init__(self, filter: RowCall, *header: str):
        self.filter = filter
        self.header = header

    def to_df(self, idx: Index) -> DataFrame:
        df = self.filter.filter_df(idx)
        if self.header:
            df = df.select(idx.id_col, *self.header)
        return df

    def to_arrow(self, idx: Index):
        """Collect as a pyarrow.Table (driver-side; use to_df for the
        distributed form)."""
        return self.to_df(idx).toArrow()


# ---------------------------------------------------------------------------
# Write-calls (executor.go:5895-6353, 9050-9320) — pure copy-on-write form:
# ``to_table`` returns the TRANSFORMED table; commit the result through
# Catalog/materialize_view (Delta MERGE in a lakehouse deployment).
# ---------------------------------------------------------------------------


@dataclass
class Apply(ReaderCall):
    """``Apply(filter?, "ivy-map" [, "reduce"])`` — run an ivy program over
    the dataframe store (apply.go:14-120, dispatch executor.go:831). The
    supported ivy subset compiles straight to Spark Column expressions
    (pql/ivy.py) — elementwise programs stay inside Tungsten codegen and
    ``op/`` reductions become one aggregate, which is exactly the
    map-shards-then-reduce contract of IvyReduce (apply.go:50-120). The
    third argument is ``"_"`` (concat — Spark's collect IS the concat) or
    an ivy reduce program (``"+/"``, ``"max/ x"``) applied to the mapped
    vector; arbitrary ivy beyond the subset → use a pandas_udf (the
    documented superset path, queries.pql_apply)."""

    ivy: str
    filter: Optional[RowCall] = None
    reduce_op: str = "_"

    def to_df(self, idx: Index) -> DataFrame:
        from featurebase_spark.pql.ivy import apply_ivy, reduce_program

        src = _filtered(idx, self.filter)
        if self.reduce_op != "_":
            return reduce_program(src, self.ivy, self.reduce_op, idx.id_col)
        return apply_ivy(src, self.ivy, idx.id_col)


class WriteCall:
    def to_table(self, idx: Index) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


@dataclass
class Set(WriteCall):
    """``Set(col, field=value[, field2=value2...][, timestamp])``
    (executeSet executor.go:6194-6353; grammar pqlpeg_test SetManyArgs /
    SetTimestamp). DIVERGENCE (documented): with several field args the
    reference sets ONE arbitrary field (FieldArg iterates a Go map,
    ast.go:736-742); here all listed fields set deterministically. The
    optional trailing timestamp lands in the Index's ``time_col`` when
    one is configured (the reference writes the bit into that time's
    quantum views)."""

    col: int
    field: str
    value: object
    more: Optional[dict] = None
    ts: Optional[str] = None

    def to_table(self, idx: Index) -> DataFrame:
        from featurebase_spark.operators.writes import set_bit

        # key-translation refusals (cluster.go:366/575, executor_test
        # SetValue/Err subtests): a string column key needs a keyed
        # index; a string row value needs a keyed field
        id_dt = idx.dtype_of(idx.id_col)
        if isinstance(self.col, str) and id_dt != "string":
            raise ValueError(
                f'cannot find keys on unkeyed index "{idx.id_col}"'
            )
        for f, v in [(self.field, self.value), *(self.more or {}).items()]:
            dt = idx.dtype_of(f)
            # write-side fieldValidateValue (executor.go:7150-7200 via
            # executeSet): a bool field takes ONLY true/false —
            # Set(c, f=1) and Set(c, f="true") both refuse
            # (TestExecutor_Execute_SetBool/Error)
            if dt == "boolean" and not isinstance(v, bool):
                vtxt = f'"{v}"' if isinstance(v, str) else str(v)
                raise ValueError(
                    f'invalid value {vtxt} for bool field "{f}"'
                )
            # a float row value is not an ID (executor.go:7162-7171:
            # only uint64/int64 pass for set/mutex/time — float64 hits
            # the default branch; Set(2, f=1.2) on a keyed field must
            # refuse, executor_test.go:1487-1494). int fields refuse
            # too (:7189); decimal fields accept floats (:7196).
            if isinstance(v, float) and not isinstance(v, bool):
                ft = idx.field_type(f)
                keyed_rows = (
                    dt in ("string", "array<string>")
                    or dt.startswith("array<struct<value:string")
                )
                if keyed_rows or (
                    f in idx.field_types and ft in ("set", "mutex", "time")
                ):
                    raise ValueError(
                        f'invalid value {v} for field "{f}" of type {ft}'
                    )
                if f in idx.field_types and ft == "int":
                    raise ValueError(
                        f'invalid value {v} for int field "{f}"'
                    )
            unkeyed_rows = (
                dt in (
                    "bigint", "int", "long", "array<bigint>",
                    "array<int>",
                )
                or dt.startswith("decimal")
                # quantum set fields with integer row IDs: a string
                # value would silently cast to a (NULL, ts) entry
                or dt.startswith("array<struct<value:bigint")
                or dt.startswith("array<struct<value:int")
            )
            if isinstance(v, str) and unkeyed_rows:
                raise ValueError(
                    f'cannot create keys on unkeyed field "{f}"'
                )

        def one(df, f, v):
            # a quantum field takes the timestamp INSIDE the bit (the
            # reference writes into that time's views,
            # executor.go:6263-6330); flat fields take it in time_col
            ts = self.ts if idx.is_quantum_field(f) else None
            return set_bit(df, self.col, f, v, idx.id_col, ts=ts)

        out = one(idx.df, self.field, self.value)
        for f, v in (self.more or {}).items():
            out = one(out, f, v)
        any_flat = any(
            not idx.is_quantum_field(f)
            for f, _ in [(self.field, self.value), *(self.more or {}).items()]
        )
        if (
            self.ts is not None
            and any_flat
            and idx.time_col in out.columns
        ):
            out = out.withColumn(
                idx.time_col,
                F.when(
                    F.col(idx.id_col) == F.lit(self.col),
                    F.lit(self.ts).cast("timestamp"),
                ).otherwise(F.col(idx.time_col)),
            )
        return out


@dataclass
class Clear(WriteCall):
    """``Clear(col, field=value[, field2=value2...])`` (executeClearBit
    executor.go:5895-5975; multi-field divergence as in :class:`Set`)."""

    col: int
    field: str
    value: object
    more: Optional[dict] = None

    def to_table(self, idx: Index) -> DataFrame:
        from featurebase_spark.operators.writes import clear_bit

        def one(df, f, v):
            # BSI fields (int/decimal/timestamp) clear UNCONDITIONALLY
            # (f.ClearValue ignores the value arg, executor.go:6354)
            bsi = idx.field_type(f) in ("int", "decimal", "timestamp")
            return clear_bit(df, self.col, f, v, idx.id_col, bsi=bsi)

        out = one(idx.df, self.field, self.value)
        for f, v in (self.more or {}).items():
            out = one(out, f, v)
        return out


@dataclass
class ClearRow(WriteCall):
    """``ClearRow(field=value)`` (executeClearRow executor.go:5976-6076)."""

    field: str
    value: object

    def to_table(self, idx: Index) -> DataFrame:
        from featurebase_spark.operators.writes import clear_row

        ft = idx.field_type(self.field)
        if ft in ("int", "decimal", "timestamp"):
            # executor.go:5991-5996 — only set/time/mutex/bool support it
            raise ValueError(
                f"ClearRow() is not supported on {ft} field types"
            )
        return clear_row(idx.df, self.field, self.value)


@dataclass
class Store(WriteCall):
    """``Store(child, field=value)`` (executeSetRow executor.go:6077-6193)."""

    child: RowCall
    field: str
    value: object

    def to_table(self, idx: Index) -> DataFrame:
        from featurebase_spark.operators.writes import store_row

        return store_row(idx.df, self.child.ids(idx), self.field, self.value, idx.id_col)


@dataclass
class Delete(WriteCall):
    """``Delete(child)`` (executeDeleteRecords executor.go:9050-9320).
    An invalid bitmap child surfaces with the delete path's
    'row call: ' wrap instead of panicking (FB-1281,
    delete_test.go:233-240)."""

    child: RowCall

    def to_table(self, idx: Index) -> DataFrame:
        from featurebase_spark.operators.writes import delete_records

        try:
            ids = self.child.ids(idx)
        except ValueError as e:
            raise ValueError(f"row call: {e}") from e
        return delete_records(idx.df, ids, idx.id_col)
