"""FeatureBase type system → Spark types (SURVEY §1.2).

Reference physical field types: ``field.go:42-50``; SQL base types:
``dax/table.go:76-85``; SQL language types ``sql3/parser/astdatatype.go``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


@dataclass(frozen=True)
class FieldDef:
    """One FeatureBase field (column) definition with its options
    (functional opts, field.go:144-380)."""

    name: str
    fb_type: str  # set|mutex|int|decimal|timestamp|time|bool|id|string|...
    keys: bool = False  # string keys vs integer ids (field.go OptFieldKeys)
    scale: int = 2  # decimal scale 0-19 (field.go:252-323)
    min: Optional[int] = None  # BSI declared range (field.go:173-191)
    max: Optional[int] = None
    time_quantum: Optional[str] = None  # Y|YM|YMD|YMDH (field.go:325-351)
    ttl: Optional[str] = None  # Go duration, e.g. '720h' (field.go:339)
    foreign_index: Optional[str] = None  # cross-table ref (field.go:133-141)
    time_unit: Optional[str] = None  # timestamp s/ms/us/ns (field.go:192-251)
    cache_type: Optional[str] = None  # ranked|lru TopN cache (field.go:31)
    cache_size: Optional[int] = None  # cache SIZE n (field.go:96-101)


def spark_type(f: FieldDef) -> DataType:
    """FB physical type → Spark type (SURVEY §1.2 table)."""
    t = f.fb_type.lower()
    if t in ("set", "idset"):
        return ArrayType(StringType() if f.keys else LongType())
    if t in ("stringset",):
        return ArrayType(StringType())
    if t in ("mutex", "id"):
        return StringType() if f.keys else LongType()
    if t in ("string",):
        return StringType()
    if t in ("int",):
        return LongType()
    if t in ("decimal",):
        if not 0 <= f.scale <= 19:
            raise ValueError("decimal scale must be 0-19 (field.go:252)")
        return DecimalType(38, f.scale)
    if t in ("timestamp",):
        return TimestampType()
    if t in ("time", "idsetq"):
        # time-quantum set: (value, ts) pairs; quantum views are derived
        return ArrayType(
            StructType(
                [
                    StructField("value", StringType() if f.keys else LongType()),
                    StructField("ts", TimestampType()),
                ]
            )
        )
    if t in ("stringsetq",):
        return ArrayType(
            StructType(
                [StructField("value", StringType()), StructField("ts", TimestampType())]
            )
        )
    if t in ("bool",):
        return BooleanType()
    raise ValueError(f"unknown FeatureBase type {f.fb_type!r}")


@dataclass
class TableDef:
    """An index/table definition (index.go:26-63): ``_id`` + fields."""

    name: str
    fields: list[FieldDef] = dc_field(default_factory=list)
    keys: bool = False  # string record keys (index.go:36)
    track_existence: bool = True  # index.go:39 (implicit in row tables)

    def spark_schema(self) -> StructType:
        id_type = StringType() if self.keys else LongType()
        cols = [StructField("_id", id_type, nullable=False)]
        cols += [StructField(f.name, spark_type(f), nullable=True) for f in self.fields]
        return StructType(cols)


# --------------------------------------------------------------------------
# Spark-safe view names
# --------------------------------------------------------------------------

import re as _re

_SPARK_IDENT = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def spark_view_name(name: str) -> str:
    """Spark temp-view name for a FeatureBase table name.

    The reference's lexer treats ``-`` as an identifier character
    (sql3/parser/scanner.go:338-339 — Pilosa index names allowed dashes),
    so table names like ``un-keyed`` are legal there (defs_select.go
    "table-with-hyphens"). Spark rejects hyphens in view names, so any
    name that is not a plain Spark identifier is deterministically mangled
    at the view boundary; ``Catalog._defs`` and every user-facing surface
    (fb_tables, SHOW, error messages) keep the original spelling.
    """
    if _SPARK_IDENT.fullmatch(name):
        return name
    return "fbh__" + _re.sub(r"[^A-Za-z0-9_]", "_", name)
