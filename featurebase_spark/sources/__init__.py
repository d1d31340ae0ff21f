"""Batch ingest: the reference's BULK INSERT statement and idk consumer
field-mapping semantics on Spark readers (SURVEY §2.4).

- :func:`bulk_insert` — CSV / NDJSON / PARQUET with MAP (position/JSONPath)
  + TRANSFORM expressions (opbulkinsert.go:24-1195).
- :func:`read_idk_csv` — idk CSV consumer typed headers (``name__Int`` etc.,
  idk/csv/ + idk/interfaces.go:258-770).
- :func:`read_jdbc` / :func:`external_lookup` — idk SQL consumer and the
  PQL ExternalLookup bridge (executor.go:4357-4710) via spark JDBC.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType


def bulk_insert(
    spark: SparkSession,
    path: str,
    format: str,
    map_spec: Mapping[str, str],
    transforms: Optional[Mapping[str, str]] = None,
    header: bool = False,
    batch_size: Optional[int] = None,
) -> DataFrame:
    """``BULK INSERT ... FROM 'file' WITH FORMAT 'CSV'|'NDJSON'|'PARQUET'
    MAP (...) TRANSFORM (...)`` (opbulkinsert.go:24-1195; grammar
    parser.go:1788-1890).

    ``map_spec``: output column → source locator + type, e.g.
        CSV:     {"_id": "0 ID", "name": "1 STRING", "age": "2 INT"}
                 (position, compilebulkinsert.go)
        NDJSON:  {"_id": "$.id ID", "name": "$.name STRING"} (JSONPath)
        PARQUET: {"_id": "id ID", "name": "name STRING"} (column name)
    ``transforms``: output column → SQL expression over ``@column`` refs
    (reference TRANSFORM uses @n positional refs; here use mapped names).

    Scale: the reader IS the parallelism (file splits); no driver-side
    batching needed — the reference's 1M-row client batches
    (idk/ingest.go:59-95) correspond to Spark task partitions.
    """
    import re as _re

    fmt = format.upper()
    _SQL_TYPES = {
        "ID": "bigint",
        "INT": "bigint",
        "DECIMAL": "decimal(38,2)",
        "STRING": "string",
        "BOOL": "boolean",
        "TIMESTAMP": "timestamp",
        "IDSET": "array<bigint>",
        "STRINGSET": "array<string>",
    }

    def parse_spec(spec: str) -> tuple[str, str]:
        locator, _, t = spec.rpartition(" ")
        t = t.strip().upper()
        # FB DECIMAL(n) declares the SCALE (astdatatype.go) — not the
        # precision Spark's bare decimal(n) would read it as
        m = _re.fullmatch(r"DECIMAL\((\d+)\)", t)
        if m:
            return locator.strip(), f"decimal(38,{m.group(1)})"
        return locator.strip(), _SQL_TYPES.get(t, t.lower())

    def _csv_cast(src, t: str):
        # set-typed CSV fields hold delimiter-joined members
        if t.startswith("array"):
            inner = t[t.index("<") + 1 : -1]
            return F.transform(F.split(src, ","), lambda x: x.cast(inner))
        return src.cast(t)

    def _json_cast(j, t: str):
        # NDJSON set fields may be a scalar OR a JSON array per row
        # (opbulkinsert.go path extraction accepts both shapes)
        if t.startswith("array"):
            inner = t[t.index("<") + 1 : -1]
            return F.when(
                F.trim(j).startswith("["), F.from_json(j, t)
            ).otherwise(
                F.when(j.isNotNull(), F.array(j.cast(inner)))
            )
        return j.cast(t)

    if fmt == "CSV":
        raw = spark.read.csv(path, header=header, inferSchema=False)
        cols = []
        for out, spec in map_spec.items():
            locator, t = parse_spec(spec)
            src = F.col(raw.columns[int(locator)]) if locator.isdigit() else F.col(locator)
            cols.append(_csv_cast(src, t).alias(out))
        df = raw.select(*cols)
    elif fmt == "NDJSON":
        raw = spark.read.text(path)
        cols = []
        for out, spec in map_spec.items():
            locator, t = parse_spec(spec)
            # the reference accepts bare key names as NDJSON paths
            # (sql_complex_test.go:2833 maps 'id', not '$.id')
            if not locator.startswith("$"):
                locator = "$." + locator
            j = F.get_json_object(F.col("value"), locator)
            cols.append(_json_cast(j, t).alias(out))
        df = raw.select(*cols)
    elif fmt == "PARQUET":
        raw = spark.read.parquet(path)
        cols = []
        for out, spec in map_spec.items():
            locator, t = parse_spec(spec)
            src = F.col(locator)
            # a scalar parquet column mapped to a SET type becomes a
            # one-member set (sql_complex_test.go:2984 maps a string
            # column to STRINGSET)
            if t.startswith("array") and not isinstance(
                raw.schema[locator].dataType, ArrayType
            ):
                inner = t[t.index("<") + 1 : -1]
                cols.append(
                    F.when(src.isNotNull(), F.array(src.cast(inner)))
                    .alias(out)
                )
            else:
                cols.append(src.cast(t).alias(out))
        df = raw.select(*cols)
    else:
        raise ValueError(
            f"unsupported format {format!r} (CSV|NDJSON|PARQUET, "
            "compilebulkinsert.go:197-224)"
        )

    if transforms:
        df = df.select(
            *[F.expr(expr).alias(out) for out, expr in transforms.items()]
        )
    return df


#: idk typed-header suffix → Spark cast, keyed LOWERCASE — the reference
#: folds the type token before matching (idk/header.go:71). Two
#: non-cast kinds carry sentinels: ``signedintboolkey`` expands to the
#: (set, exists) column pair and ``ignore`` drops the column.
IDK_HEADER_TYPES = {
    "id": "bigint",
    "int": "bigint",
    "decimal": "decimal(38,2)",
    "string": "string",
    # external lookup-DB payload: NOT indexed, carried through verbatim
    # (idk/interfaces.go:538-558; ingest.go:1979 routes it to the
    # lookupWriter instead of the pilosa batch)
    "lookuptext": "string",
    "bool": "boolean",
    "timestamp": "timestamp",
    "recordtime": "timestamp",
    "idarray": "array<bigint>",
    "stringarray": "array<string>",
    "ignore": None,
    "signedintboolkey": "signedintboolkey",
}


def _split_idk_header(c: str) -> tuple[str, str]:
    """``SourceName[___DestName]__FieldType[_Arg...]`` → (dest, type).

    Mirrors idk's splitHeader (idk/header.go:404-453): the LAST triple
    underscore separates source from dest, the LAST double underscore
    separates name from fieldspec, and the type token is the fieldspec
    up to its first ``_`` (args are accepted and ignored, as the
    reference logs-and-ignores extras). An untyped header falls back to
    a lowercased string column — the csv source's JustDoIt posture
    (idk/csv/source.go:84-89)."""
    rest = c
    if "___" in c:
        _, _, rest = c.rpartition("___")
    dest, sep, spec = rest.rpartition("__")
    if not sep:
        return c.lower(), "string"
    kind = spec.split("_")[0].lower()
    return dest, kind


#: Go reference-time layout tokens → (regex, semantic key). Longest
#: first; anything else in a layout is a literal. Covers the layouts
#: the idk corpus uses (RFC3339, RFC3339Nano, date-only).
_GO_LAYOUT_TOKENS = [
    (".999999999", r"(?:\.(\d{1,9}))?", "frac"),
    (".999999", r"(?:\.(\d{1,6}))?", "frac"),
    (".999", r"(?:\.(\d{1,3}))?", "frac"),
    ("Z07:00", r"(Z|[+-]\d{2}:\d{2})", "tz"),
    ("2006", r"(\d{4})", "year"),
    ("01", r"(\d{2})", "month"),
    ("02", r"(\d{2})", "day"),
    ("15", r"(\d{2})", "hour"),
    ("04", r"(\d{2})", "minute"),
    ("05", r"(\d{2})", "second"),
]


def go_time_parse(layout: str, value: str):
    """Parse ``value`` against a Go reference-time ``layout`` the way
    ``time.Parse`` does, with the SAME error shape: on mismatch,
    ``parsing time "<value>" as "<layout>": cannot parse "<suffix>"``
    where suffix is the unconsumed tail (idk header epochs,
    header_test.go date-int cases pin ``cannot parse "d-04"``).
    Returns a naive UTC datetime."""
    import datetime as _dt
    import re as _re

    tokens = []
    i = 0
    while i < len(layout):
        for tok, rx, sem in _GO_LAYOUT_TOKENS:
            if layout.startswith(tok, i):
                tokens.append((rx, sem))
                i += len(tok)
                break
        else:
            tokens.append((_re.escape(layout[i]), None))
            i += 1

    parts: dict = {}
    pos = 0
    for rx, sem in tokens:
        m = _re.match(rx, value[pos:])
        if m is None:
            raise ValueError(
                f'parsing time "{value}" as "{layout}": '
                f'cannot parse "{value[pos:]}"'
            )
        if sem and m.groups() and m.group(1) is not None:
            parts[sem] = m.group(1)
        pos += m.end()
    if pos != len(value):
        raise ValueError(
            f'parsing time "{value}" as "{layout}": '
            f'extra text: "{value[pos:]}"'
        )
    micro = int(parts.get("frac", "").ljust(6, "0")[:6] or 0)
    out = _dt.datetime(
        int(parts.get("year", 0)), int(parts.get("month", 1)),
        int(parts.get("day", 1)), int(parts.get("hour", 0)),
        int(parts.get("minute", 0)), int(parts.get("second", 0)),
        micro,
    )
    tz = parts.get("tz")
    if tz and tz != "Z":
        sign = 1 if tz[0] == "+" else -1
        out -= sign * _dt.timedelta(
            hours=int(tz[1:3]), minutes=int(tz[4:6])
        )
    return out


_GO_DUR_UNITS = ("ns", "us", "µs", "μs", "ms", "s", "m", "h")


def go_duration_error(s: str):
    """Validate a Go ``time.ParseDuration`` string; returns None when
    valid, else the reference's exact error text (time/format.go):
    'time: unknown unit "z" in duration "127z"' / 'time: missing unit
    in duration "7"' / 'time: invalid duration "x"'."""
    import re as _re

    rest = s
    if rest and rest[0] in "+-":
        rest = rest[1:]
    if rest in ("0", ""):
        return None if rest == "0" else f'time: invalid duration "{s}"'
    any_group = False
    while rest:
        m = _re.match(r"\d+(\.\d*)?", rest)
        if not m:
            return f'time: invalid duration "{s}"'
        rest = rest[m.end():]
        for u in sorted(_GO_DUR_UNITS, key=len, reverse=True):
            if rest.startswith(u):
                rest = rest[len(u):]
                any_group = True
                break
        else:
            if not rest:
                return f'time: missing unit in duration "{s}"'
            um = _re.match(r"[^0-9.]+", rest)
            return (
                f'time: unknown unit "{um.group(0)}" in duration "{s}"'
            )
    return None if any_group else f'time: invalid duration "{s}"'


#: time units (idk/interfaces.go:340-380): lowercased; '' → default 's'
_IDK_UNITS = {"d", "h", "m", "s", "ms", "us", "ns", "c"}

_RFC3339 = "2006-01-02T15:04:05Z07:00"
_RFC3339NANO = "2006-01-02T15:04:05.999999999Z07:00"

_NAME_RX = None  # compiled lazily


def _validate_pilosa_name(name: str) -> None:
    """pilosa.ValidateName for header destNames (ErrInvalidFieldName,
    idk/header.go:35)."""
    import re as _re

    global _NAME_RX
    if _NAME_RX is None:
        _NAME_RX = _re.compile(r"[a-z][a-z0-9Θ_-]{0,229}\Z")
    if not _NAME_RX.match(name):
        raise ValueError("field name must match [a-z][a-z0-9Θ_-]{0,229}")


def split_header(s: str) -> tuple[str, str, str]:
    """idk splitHeader EXACT mirror (idk/header.go:404-453) →
    (sourceName, destName, typeSpec); the lenient JustDoIt wrapper is
    :func:`_split_idk_header`."""
    if "___" in s:
        src, _, rest = s.rpartition("___")
        dest, sep, spec = rest.rpartition("__")
        if not sep:
            raise ValueError("no field spec in this header")
    else:
        dest, sep, spec = s.rpartition("__")
        if not sep:
            raise ValueError("no field spec in this header")
        src = dest
    if dest != "":  # "" is valid for RecordTimeField and IgnoreField
        _validate_pilosa_name(dest)
    return src, dest, spec


def header_to_field(header: str, logs: Optional[list] = None) -> dict:
    """``HeaderToField`` mirror (idk/header.go:56-402,
    idk/header_test.go TestHeaderToField): parse one
    ``SourceName[___DestName]__FieldType[_Arg...]`` header into a field
    description dict with the reference's arg semantics and EXACT error
    texts. ``logs`` collects the ignoring-extra-arguments messages the
    reference sends to its logger."""
    if logs is None:
        logs = []
    src, dest, spec = split_header(header)
    fieldspec = spec.split("_")
    kind = fieldspec[0].lower()
    if src == "" and kind != "recordtime":
        raise ValueError(f"field '{header}' has no sourceName")
    f: dict = {"kind": kind, "name": src, "dest": dest}
    n = len(fieldspec)

    def extra(from_i: int, label: str) -> None:
        if n > from_i:
            logs.append(
                f"ignoring extra arguments to {label} {header}: "
                f"{fieldspec[from_i:]}"
            )

    if kind in ("string", "id"):
        label = "StringField" if kind == "string" else "IDField"
        f["mutex"] = False
        if n > 1:
            if fieldspec[1] == "T":
                f["mutex"] = True
            elif fieldspec[1] != "F":
                raise ValueError(
                    f"can't interpret '{fieldspec[1]}' for "
                    f"{label}.Mutex for field '{src}'"
                )
        f["quantum"] = fieldspec[2] if n > 2 else None
        f["ttl"] = fieldspec[3] if n > 3 else None
        extra(4, label)
    elif kind in ("bool", "lookuptext", "signedintboolkey", "ignore"):
        label = {
            "bool": "BoolField", "lookuptext": "LookupTextField",
            "signedintboolkey": "SignedIntBoolKeyField",
            "ignore": "IgnoreField",
        }[kind]
        extra(1, label)
    elif kind == "int":
        for i, which in ((1, "min"), (2, "max")):
            f[which] = None
            if n > i:
                try:
                    f[which] = int(fieldspec[i])
                except ValueError:
                    raise ValueError(f"parsing {which} for {src}")
        f["foreign_index"] = fieldspec[3] if n > 3 else None
        extra(4, "IntField")
    elif kind == "foreignkey":
        if n < 2:
            raise ValueError(
                f"need foreign index for foreign key field: {header}"
            )
        f["foreign_index"] = fieldspec[1]
        extra(2, "ForeignKey Field")
    elif kind == "decimal":
        f["scale"] = 0
        if n > 1:
            try:
                f["scale"] = int(fieldspec[1])
            except ValueError:
                raise ValueError(f"parsing scale for {src}")
        extra(2, "DecimalField")
    elif kind in ("stringarray", "idarray"):
        label = "StringArrayField" if kind == "stringarray" else "IDArrayField"
        f["quantum"] = fieldspec[1] if n > 1 else None
        f["ttl"] = fieldspec[2] if n > 2 else None
        extra(3, label)
    elif kind in ("dateint", "recordtime"):
        label = "DateIntField" if kind == "dateint" else "RecordTimeField"
        f["layout"] = fieldspec[1] if n > 1 else _RFC3339
        f["epoch"] = None
        if n > 2 and fieldspec[2]:
            f["epoch"] = go_time_parse(f["layout"], fieldspec[2])
        f["unit"] = None
        f["custom_unit"] = None
        if n > 3:
            unit = fieldspec[3].lower()
            f["unit"] = unit
            if kind == "dateint" and unit == "c" and n > 4:
                err = go_duration_error(fieldspec[4])
                if err is not None:
                    raise ValueError(
                        f"parsing custom unit {fieldspec[4]}: {err}"
                    )
                f["custom_unit"] = fieldspec[4]
            elif unit == "c" or unit not in _IDK_UNITS:
                # 'c' without a custom duration hits Unit.Duration()'s
                # default branch like any unknown unit
                raise ValueError(
                    f'unknown unit "{unit}", please choose from '
                    "d/h/m/s/ms/us/ns"
                )
        extra(5 if kind == "dateint" else 4, label)
    elif kind == "timestamp":
        f["granularity"] = fieldspec[1] if n > 1 else "s"
        f["layout"] = fieldspec[2] if n > 2 else _RFC3339NANO
        f["epoch"] = None
        if n > 3 and fieldspec[3]:
            f["epoch"] = go_time_parse(f["layout"], fieldspec[3])
        f["unit"] = None
        if n > 4:
            unit = fieldspec[4].lower()
            if unit not in _IDK_UNITS or unit == "c":
                raise ValueError(
                    f"invalid unit for TimestampField {header}"
                )
            f["unit"] = unit
        extra(5, "TimestampField")
    else:
        raise ValueError(f"unknown field '{fieldspec[0]}' for '{header}'")
    return f


def primary_key_recordizer(schema: Sequence[dict], pk_fields: Sequence[str]):
    """``getPrimaryKeyRecordizer`` mirror (idk/ingest.go:1733-1808,
    idk/ingest_test.go TestGetPrimaryKeyRecordizer): build the record-ID
    maker for a list of primary-key field names over an ordered
    ``schema`` of :func:`header_to_field` dicts.

    Returns ``(make_id, skips)``: ``make_id(raw_record) -> id`` — the
    single-string-pk fast path passes the value through; multi-pk
    concatenates values with ``'|'`` IN pkFields ORDER — and ``skips``,
    the schema indices to drop from the value columns (only a single
    STRING pk skips; the reference keeps int pks as value fields)."""
    if not schema:
        raise ValueError(
            "can't call getPrimaryKeyRecordizer with empty schema"
        )
    if not pk_fields:
        raise ValueError(
            "can't call getPrimaryKeyRecordizer with empty pkFields"
        )
    by_dest = {f.get("dest") or f.get("name"): i
               for i, f in enumerate(schema)}
    indices = []
    for pk in pk_fields:
        pk = pk.strip()
        i = by_dest.get(pk)
        if i is not None and schema[i]["kind"] == "stringarray":
            raise ValueError(
                f"field {pk} cannot be a primary key field because it "
                "is a StringArray field."
            )
        if i is None:
            raise ValueError(
                f"no field with primary key field name {pk} found. "
                f"fields: {[f.get('name') for f in schema]}"
            )
        indices.append(i)
    skips: set = set()
    if len(pk_fields) == 1 and schema[indices[0]]["kind"] == "string":
        skips = {indices[0]}

    def make_id(raw):
        if len(indices) == 1 and isinstance(
            raw[indices[0]], (str, bytes)
        ):
            return raw[indices[0]]
        return "|".join(str(raw[i]) for i in indices)

    return make_id, skips


def with_primary_key(
    df: DataFrame, pk_cols: Sequence[str], id_col: str = "_id"
) -> DataFrame:
    """Spark form of the primary-key recordizer: the record key is the
    ``'|'``-concatenation of the pk columns in order (single string pk →
    the column itself, which is then DROPPED from the value columns per
    the reference's skipFields)."""
    if len(pk_cols) == 1 and dict(df.dtypes)[pk_cols[0]] == "string":
        return df.withColumn(id_col, F.col(pk_cols[0])).drop(pk_cols[0])
    return df.withColumn(
        id_col, F.concat_ws("|", *[F.col(c).cast("string") for c in pk_cols])
    )


def validate_ingest_config(
    schema: Sequence[dict],
    id_field: Optional[str] = None,
    pk_fields: Optional[Sequence[str]] = None,
    autogen: bool = False,
):
    """The idk Main.Setup / batchFromSchema validation surface
    (idk/ingest.go:2494 mode exclusivity, :1767/:1800 id resolution,
    validateField :2202-2220, TTL parse interfaces.go:237;
    ingest_test.go TestBatchFromSchema validation cases). Raises the
    reference's texts; returns the pk recordizer pair (or None)."""
    modes = sum(1 for x in (id_field, pk_fields, autogen) if x)
    if modes != 1:
        raise ValueError(
            "must set exactly one of --primary-key-field <fieldnames>, "
            "--id-field <fieldname>, --auto-generate"
        )
    for fld in schema:
        name = fld.get("name")
        if fld["kind"] in ("string", "id") and fld.get("mutex"):
            label = fld["kind"] if fld["kind"] == "string" else "id"
            if fld.get("quantum"):
                raise ValueError(
                    f"can't specify a time quantum on a {label} mutex "
                    f"field: '{name}'"
                )
            if fld.get("ttl") not in (None, "", "0s"):
                raise ValueError(
                    f"can't specify a TTL on a {label} mutex field: "
                    f"'{name}'"
                )
        ttl = fld.get("ttl")
        if ttl and go_duration_error(ttl) is not None:
            raise ValueError(f"unable to parse TTL from field {name}")
    if pk_fields:
        # pk resolution precedes the empty-batch check (batchFromSchema
        # wraps its error first — TestBatchFromSchema 'pk error' has no
        # schema yet still reports the recordizer wrap)
        try:
            return primary_key_recordizer(schema, pk_fields)
        except ValueError as e:
            raise ValueError(
                f"getting primary key recordizer: {e}"
            ) from e
    if not schema:
        raise ValueError("can't batch with no fields")
    if id_field is not None:
        names = {f.get("dest") or f.get("name") for f in schema}
        if id_field not in names:
            raise ValueError(f"ID field {id_field} not found")
    return None


#: FeatureBase timestamp bounds (idk/interfaces.go:321-324): ns
#: granularity stores offsets in an int64 of nanos around ±2^32
#: SECONDS; coarser granularities span the RFC3339 year range.
_TS_MIN_NANO_S, _TS_MAX_NANO_S = -(1 << 32), 1 << 32
_TS_MIN_S, _TS_MAX_S = -62135596799, 253402300799  # 0001..9999
_UNIT_NANOS = {
    "d": 86_400_000_000_000, "h": 3_600_000_000_000,
    "m": 60_000_000_000, "s": 1_000_000_000, "ms": 1_000_000,
    "us": 1_000, "ns": 1,
}


def _go_layout_to_spark(layout: str) -> str:
    """Go reference-time layout → Spark datetime pattern (letters not in
    a token are quoted literals)."""
    mapping = [
        (".999999999", "[.SSSSSSSSS]"), (".999999", "[.SSSSSS]"),
        (".999", "[.SSS]"), ("Z07:00", "XXX"),
        ("2006", "yyyy"), ("01", "MM"), ("02", "dd"),
        ("15", "HH"), ("04", "mm"), ("05", "ss"),
    ]
    out = []
    i = 0
    while i < len(layout):
        for tok, rep in mapping:
            if layout.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            ch = layout[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def _epoch_val(epoch, gran: str) -> int:
    """TimestampToVal (idk/interfaces.go:801-818): the epoch rendered in
    granularity units since the Unix epoch (integer arithmetic)."""
    import datetime as _dt

    delta = epoch - _dt.datetime(1970, 1, 1)
    secs = delta.days * 86400 + delta.seconds
    nanos = secs * 1_000_000_000 + delta.microseconds * 1000
    return nanos // _UNIT_NANOS[gran]


def _exact_floordiv(col, k: int):
    """Integer floor-division on a BIGINT column without the double
    round-trip (epoch-scale values near 2^58 lose precision under `/`):
    subtract the non-negative pmod, then divide the exact multiple as
    DECIMAL."""
    return (
        (col.cast("decimal(38,0)") - F.pmod(col, F.lit(k))) / F.lit(k)
    ).cast("bigint")


def _gran_bounds(gran: str) -> tuple[int, int]:
    per_s = 1_000_000_000 // _UNIT_NANOS[gran]
    if gran == "ns":
        return _TS_MIN_NANO_S * per_s, _TS_MAX_NANO_S * per_s
    return _TS_MIN_S * per_s, _TS_MAX_S * per_s


#: coercion-failure target type per header kind, for the reference's
#: "couldn't convert %v of %T to <type>" texts (interfaces.go:1142,
#: 1223, 1164, 1322; decimal wraps via :679)
_IDK_CONVERT_TARGET = {
    "id": "uint64",
    "int": "int64",
    "timestamp": "time.Time",
    "recordtime": "time.Time",
    "idarray": "[]uint64",
}


def read_idk_csv(
    spark: SparkSession, path: str, skip_bad_rows: int = 0,
    allow_int_oor: bool = False,
    allow_decimal_oor: bool = False,
    allow_timestamp_oor: bool = False,
    just_do_it: bool = True,
    headers: Optional[Sequence[str]] = None,
) -> DataFrame:
    """idk CSV consumer: headers like ``asset_tag__String``,
    ``fan_time__Timestamp`` declare types (idk/csv/, header parsing in
    idk/header.go:404-453, field kinds idk/interfaces.go:258-770).
    Array fields are comma-joined strings.

    ``signedintboolkey`` (interfaces.go:685-711) renders as the same
    TWO fields the reference ingester materializes (ingest.go:2084-2114
    with ``Exists = "-exists"``): for signed value v, column ``name``
    holds |v| when v > 0 (the set bit — a clear contributes no set
    bit) and ``name-exists`` holds |v| whenever a value was present,
    so a cleared bit is exactly "exists non-null, set null". NULL and
    empty-string inputs leave both NULL (PilosafyVal's nil rules).

    ``skip_bad_rows`` mirrors idk's SkipBadRows flag (ingest.go:97,
    522-553, TestSkipBadRowsFunctionality*): 0 (the default) errors on
    the first unconvertible record — the raise happens INSIDE the scan
    expressions, so the strict path stays one pass with no extra job.
    With n > 0, records that fail coercion are dropped, UNLESS the
    first n+1 records of the file are ALL bad before any success —
    then the consumer refuses with the reference's 'consecutive bad
    records exceeded limit' text (the reference counts consecutive
    failures only until the first good record; a head-of-file probe of
    n+1 rows decides exactly that, bounded driver state).

    Header ARGUMENTS are honored per idk (csv/csv_test.go):

    - ``Int_min_max``: parseable values outside [min, max] are OUT OF
      RANGE — NULL with ``allow_int_oor`` (AllowIntOutOfRange), a
      halting error without (TestIntOpts / TestFailureConditions).
    - ``Decimal_scale``: values whose scaled form overflows the
      reference's int64 storage are OOR under ``allow_decimal_oor``.
      A BARE ``Decimal`` keeps this repo's established decimal(38,2)
      read (oracle-locked since r2); the reference's scale-0 default
      would truncate fractions — declare the scale to match it.
    - ``Timestamp_gran_layout_epoch_unit``: timestrings parse via the
      Go layout and validate against the granularity's bounds
      (interfaces.go:898-917 — ns spans ±2^32 seconds, coarser
      granularities years 0001-9999); integer values scale from unit
      to granularity with the reference's float64 multiply + overflow
      sign check (:876-893). Out-of-range → NULL with
      ``allow_timestamp_oor``, halting error without. An epoch outside
      the granularity's range halts REGARDLESS of the flag
      (:825-828). DOCUMENTED CONFLATION: the JVM parser cannot
      distinguish Go's "month out of range" (OOR-able) from other
      layout errors (always halting) — any unparseable timestring
      classifies as OOR here.
    - ``just_do_it=False`` disables the JustDoIt fallback: a header
      HeaderToField refuses becomes an error instead of a lowercased
      string column (idk/csv/source.go:84-89).
    """
    if headers is not None:
        # externally-supplied header list (csv Main.Header,
        # TestCSVCommandCustomHeader): the file is headerless and
        # columns beyond the list are ignored
        raw = spark.read.csv(path, header=False, inferSchema=False)
        raw = raw.select(
            *[
                F.col(raw.columns[i]).alias(h)
                for i, h in enumerate(headers)
            ]
        )
    else:
        raw = spark.read.csv(path, header=True, inferSchema=False)
    cols = []
    bad_preds = []

    def _strict(expr, bad, src, kind):
        """In strict mode a bad cell errors on contact with the
        reference's coercion text; in skip mode the caller filters."""
        if skip_bad_rows > 0 or bad is None:
            return expr
        target = _IDK_CONVERT_TARGET.get(kind, kind)
        return F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("couldn't convert "),
                    src,
                    F.lit(f" of string to {target}"),
                )
            ),
        ).otherwise(expr)

    for c in raw.columns:
        try:
            fld = header_to_field(c)
        except ValueError:
            if not just_do_it:
                raise
            fld = {"kind": "string", "name": c.lower(), "dest": c.lower()}
        kind = fld["kind"]
        name = fld.get("dest") or fld.get("name") or c.lower()
        t = IDK_HEADER_TYPES.get(kind, "string")
        if t is None:
            continue
        # backtick-quoted: layout args put DOTS in header names
        # ('ts__Timestamp_s_2006-01-02 15:04:05.999') and a bare
        # F.col would parse them as struct access
        src = F.col(f"`{c}`")
        present = src.isNotNull() & (F.trim(src) != "")
        if kind == "decimal" and fld.get("scale"):
            t = f"decimal(38,{fld['scale']})"
        if t == "signedintboolkey":
            # try_cast: ANSI-mode cast would THROW on garbage before
            # the bad-predicate machinery can classify it
            v = src.try_cast("bigint")
            bad = present & v.isNull()
            cols.append(_strict(F.when(v > 0, v), bad, src, "int").alias(name))
            cols.append(F.abs(v).alias(f"{name}-exists"))
            bad_preds.append(bad)
        elif t.startswith("array"):
            # toStringArray/toUint64Array (interfaces.go:1227-1260):
            # '' → nil (NOT an empty array), the bracketed '[a,b,c]'
            # form strips its brackets, members split on ',' UNtrimmed
            inner = t[t.index("<") + 1 : -1]
            body = F.when(
                src.startswith("[") & src.endswith("]"),
                F.expr(f"substring(`{c}`, 2, length(`{c}`) - 2)"),
            ).otherwise(src)
            arr = F.transform(
                F.split(body, ","), lambda x: x.try_cast(inner)
            )
            bad = None
            if inner != "string":
                bad = present & F.exists(arr, lambda y: y.isNull())
                bad_preds.append(bad)
            cols.append(
                _strict(
                    F.when(src.isNull() | (src == ""), F.lit(None))
                    .otherwise(arr),
                    bad, src, kind,
                ).alias(name)
            )
        elif kind == "timestamp":
            import datetime as _dt

            gran = fld.get("granularity") or "s"
            layout = fld.get("layout") or _RFC3339NANO
            unit = fld.get("unit")
            epoch = fld.get("epoch")
            fmt_ = _go_layout_to_spark(layout)
            lo, hi = _gran_bounds(gran)
            # epoch alone out of range halts regardless of the flag
            # (interfaces.go:825-828)
            ev = _epoch_val(epoch or _dt.datetime(1970, 1, 1), gran)
            if not (lo <= ev <= hi):
                raise ValueError(
                    "validating epoch: timestamp value must be within "
                    f"min and max for granularity {gran}"
                )
            ts_try = F.try_to_timestamp(src, F.lit(fmt_))
            us = F.unix_micros(ts_try)
            if gran == "ns":
                ts_val = us * F.lit(1000)
            else:
                k = _UNIT_NANOS[gran] // 1000  # µs per gran unit
                ts_val = _exact_floordiv(us, k)
            iv = src.try_cast("bigint")
            if epoch is None and unit is None:
                final_val = ts_val
                oor = present & (
                    ts_try.isNull() | (ts_val < lo) | (ts_val > hi)
                )
            else:
                scale_f = _UNIT_NANOS[unit or gran] / _UNIT_NANOS[gran]
                dur = (iv.cast("double") * F.lit(scale_f)).try_cast(
                    "bigint"
                )
                int_final = dur + F.lit(ev)
                sign_flip = ((dur >= 0) & (iv < 0)) | (
                    (dur < 0) & (iv > 0)
                )
                final_val = F.when(ts_try.isNotNull(), ts_val).otherwise(
                    int_final
                )
                int_oor = iv.isNotNull() & (
                    dur.isNull() | sign_flip
                    | (int_final < lo) | (int_final > hi)
                )
                str_oor = iv.isNull() & (
                    ts_try.isNull() | (ts_val < lo) | (ts_val > hi)
                )
                oor = present & (int_oor | str_oor)
            us_out = (
                final_val * F.lit(_UNIT_NANOS[gran] // 1000)
                if gran != "ns"
                else _exact_floordiv(final_val, 1000)
            )
            ts_out = F.timestamp_micros(us_out)
            if allow_timestamp_oor:
                expr = F.when(present & ~oor, ts_out)
            else:
                expr = F.when(
                    oor,
                    F.raise_error(
                        F.concat(
                            F.lit("timestamp value "), src,
                            F.lit(f" out of range for field {name}"),
                        )
                    ),
                ).otherwise(F.when(present, ts_out))
            cols.append(expr.alias(name))
        elif t == "boolean":
            # toBool string coercion (interfaces.go:1146-1171 via
            # BoolField.PilosafyVal: nil/'' → nil first): 1/t/true →
            # true, 0/f/false → false, case-folded + trimmed; anything
            # else is an INGEST ERROR, not a silent NULL
            v = F.lower(F.trim(src))
            bad = present & ~v.isin("1", "t", "true", "0", "f", "false")
            bad_preds.append(bad)
            cols.append(
                _strict(
                    F.when(src.isNull() | (v == ""), F.lit(None).cast(t))
                    .when(v.isin("1", "t", "true"), F.lit(True))
                    .when(v.isin("0", "f", "false"), F.lit(False)),
                    bad, src, "bool",
                ).alias(name)
            )
        elif t == "string":
            cols.append(src.cast(t).alias(name))
        else:
            casted = src.try_cast(t)
            bad = present & casted.isNull()
            bad_preds.append(bad)
            def _oor_wrap(expr, oor, allow):
                """OOR → NULL when the matching Allow*OutOfRange flag is
                set, a halting error otherwise (csv_test.go TestIntOpts
                / TestVariousOORValues / TestFailureConditions)."""
                if allow:
                    return F.when(~F.coalesce(oor, F.lit(False)), expr)
                return F.when(
                    oor,
                    F.raise_error(
                        F.concat(
                            F.lit("value "), src,
                            F.lit(f" out of range for field {name}"),
                        )
                    ),
                ).otherwise(expr)

            if kind == "decimal":
                # the reference stores scale-scaled int64s: a value
                # whose scaled form overflows is OUT OF RANGE
                # (interfaces.go decimal conversion; csv_test.go
                # price checker NULLs the 21-digit literal)
                from decimal import Decimal as _D

                scale_digits = int(t[t.index(",") + 1 : -1])
                limit = _D(2**63 - 1).scaleb(-scale_digits)
                oor = casted.isNotNull() & (
                    F.abs(casted) > F.lit(limit)
                )
                expr = F.when(
                    bad,
                    F.raise_error(
                        F.concat(
                            F.lit("couldn't convert "),
                            src,
                            F.lit(" to int64 for decimal field"),
                        )
                    ),
                ).otherwise(casted) if skip_bad_rows == 0 else casted
                cols.append(
                    _oor_wrap(expr, oor, allow_decimal_oor).alias(name)
                )
            elif kind == "int" and (
                fld.get("min") is not None or fld.get("max") is not None
            ):
                mn, mx = fld.get("min"), fld.get("max")
                oor = casted.isNotNull() & F.lit(False)
                if mn is not None:
                    oor = oor | (casted < F.lit(mn))
                if mx is not None:
                    oor = oor | (casted > F.lit(mx))
                oor = casted.isNotNull() & oor
                cols.append(
                    _oor_wrap(
                        _strict(casted, bad, src, kind), oor,
                        allow_int_oor,
                    ).alias(name)
                )
            else:
                cols.append(_strict(casted, bad, src, kind).alias(name))
    out = raw.select(*cols)
    if skip_bad_rows > 0 and bad_preds:
        from functools import reduce as _reduce

        any_bad = _reduce(lambda a, b: a | b, bad_preds)
        # head-of-file probe: the reference fails only when the FIRST
        # skip_bad_rows+1 records are all bad (errorCounter only grows
        # before anyRecordSuccessful, ingest.go:543-553)
        head = raw.select(any_bad.alias("__bad")).limit(
            skip_bad_rows + 1
        ).collect()  # bounded: ≤ skip_bad_rows+1 booleans
        if len(head) == skip_bad_rows + 1 and all(r["__bad"] for r in head):
            raise ValueError(
                "consecutive bad records exceeded limit, errorCounter: "
                f"{skip_bad_rows + 1}"
            )
        out = raw.where(~any_bad).select(*cols)
    return out


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: Optional[str] = None,
    num_partitions: int = 8,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    **options: str,
) -> DataFrame:
    """idk SQL consumer (idk/sql/, idk/postgres.go): parallel JDBC pull.
    Always pass partition bounds in production — a single-connection JDBC
    read is the classic ingest bottleneck."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def dbapi_read(
    spark: SparkSession, connect, sql: str, params=None, schema=None
) -> DataFrame:
    """Execute ``sql`` on a DBAPI2 connection factory and return the
    result as a Spark DataFrame — the COORDINATOR-side external query the
    reference's ExternalLookup actually performs (executor.go:4357-4710
    runs ONE statement against Postgres from the coordinator and feeds
    the rows back into the plan). ``connect`` is any zero-arg callable
    returning a DBAPI2-ish connection (psycopg2, duckdb, sqlite3…), so
    the path EXECUTES in this container (DuckDB/sqlite stand in for
    Postgres in tests) where the JDBC form can only be seam-tested.
    For cluster-scale pulls use :func:`read_jdbc` instead — this form is
    intentionally single-connection, exactly like the reference."""
    con = connect()
    try:
        cur = con.cursor() if hasattr(con, "cursor") else con
        cur.execute(sql, params or ())
        cols = [d[0] for d in cur.description]
        rows = [tuple(r) for r in cur.fetchall()]
    finally:
        con.close()
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    if not rows:
        raise ValueError(
            "dbapi_read: empty result needs an explicit schema "
            "(types cannot be inferred from zero rows)"
        )
    return spark.createDataFrame(rows, cols)


def external_lookup(
    bitmap_ids: DataFrame,
    spark: SparkSession,
    url: str,
    query_table: str,
    key_col: str,
    connect=None,
    **jdbc_options: str,
) -> DataFrame:
    """PQL ``ExternalLookup(child, query=...)`` (executor.go:4357-4710):
    ship the bitmap's record IDs to an external PostgreSQL and join. The
    reference interpolates ids as a ``$1`` array param; distributed
    equivalent: JDBC-read the remote table (partitioned) and semi-join on
    the ids — pushes work to executors instead of one coordinator.
    ``connect``: DBAPI2 factory alternative to JDBC (see
    :func:`dbapi_read`) — the remote table is pulled over one connection
    and semi-joined locally."""
    if connect is not None:
        remote = dbapi_read(spark, connect, f"SELECT * FROM {query_table}")
    else:
        remote = read_jdbc(spark, url, query_table, **jdbc_options)
    return remote.join(
        bitmap_ids.withColumnRenamed("_id", key_col), key_col, "left_semi"
    )


def external_lookup_query(
    bitmap_ids: DataFrame,
    spark: SparkSession,
    url: str,
    query: str,
    id_type: str = "bigint",
    max_param_ids: int = 100_000,
    reader=None,
    connect=None,
    schema=None,
    **jdbc_options: str,
) -> DataFrame:
    """PQL ``ExternalLookup`` with the reference's ARBITRARY-SQL form
    (executor.go:4357-4710): ``query`` is a SQL string with a ``$1``
    parameter the reference binds to the bitmap's id array
    (``... WHERE key = ANY($1)``). Here the ids inline as a typed ARRAY
    literal inside a ``dbtable`` subquery, so the restriction (and the
    rest of the query) evaluates REMOTELY — minimal transfer, the exact
    coordinator behavior of the reference. The id set is capped at
    ``max_param_ids`` (one statement should not carry an unbounded
    array); larger bitmaps → :func:`external_lookup` (partitioned JDBC
    read + executor-side semi-join), which scales with executors.

    ``reader`` is the test seam (no JDBC driver in this container): a
    callable receiving the constructed subquery; omit in production for
    the real JDBC read."""
    import re as _re

    # $1 is the ONLY parameter this form binds (executor.go binds one id
    # array); a boundary-aware match avoids rewriting the '$1' prefix of
    # '$10'/'$12', and any other $N parameter is rejected outright rather
    # than shipped unbound to the remote server.
    if not _re.search(r"\$1(?!\d)", query):
        raise ValueError("ExternalLookup query form requires a $1 parameter")
    others = sorted(
        set(_re.findall(r"\$(\d+)", query)) - {"1"}, key=int
    )
    if others:
        raise ValueError(
            "ExternalLookup query form binds only $1; found $"
            + ", $".join(others)
        )
    rows = bitmap_ids.limit(max_param_ids + 1).collect()
    if len(rows) > max_param_ids:
        raise ValueError(
            f"id set exceeds max_param_ids={max_param_ids}; use "
            "external_lookup (semi-join form) for large bitmaps"
        )
    if id_type == "text":
        vals = ", ".join("'" + str(r[0]).replace("'", "''") + "'" for r in rows)
    else:
        vals = ", ".join(str(int(r[0])) for r in rows)
    arr = f"ARRAY[{vals}]::{id_type}[]"
    bound = _re.sub(r"\$1(?!\d)", lambda _: arr, query)
    if connect is not None:
        # DBAPI2 execution: ONE statement on the external engine from
        # the coordinator — the reference's exact shape (it binds the id
        # array to $1 of a single Postgres statement). DuckDB/sqlite
        # stand in for Postgres in this container.
        return dbapi_read(spark, connect, bound, schema=schema)
    sub = f"({bound}) AS __fb_ext"
    if reader is not None:
        return reader(sub)
    return read_jdbc(spark, url, sub, **jdbc_options)


def external_lookup_write(
    rows: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    writer=None,
    **jdbc_options: str,
) -> None:
    """PQL ``ExternalLookup(child, query=..., write=true)``
    (executor.go:4383-4413): the reference ships the bitmap's ids/keys as
    a ``$1`` array param to an external PostgreSQL WRITE statement. The
    distributed equivalent: JDBC-write the bitmap's rows from executors —
    each partition opens its own connection, so write throughput scales
    with partitions instead of funneling through one coordinator.

    ``writer`` is the test seam (this container has no JDBC driver): pass
    a callable taking the DataFrame to capture/redirect the write; omit it
    in production for the real ``df.write.jdbc`` path."""
    if writer is not None:
        writer(rows)
        return
    w = (
        rows.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode(mode)
    )
    for k, v in jdbc_options.items():
        w = w.option(k, v)
    w.save()


def external_lookup_write_query(
    bitmap_ids: DataFrame,
    connect,
    query: str,
    id_type: str = "bigint",
    max_param_ids: int = 100_000,
) -> int:
    """``ExternalLookup(child, query=..., write=true)`` EXECUTED on a
    DBAPI2 connection (executor.go:4383-4413): the bitmap's ids bind to
    the statement's ``$1`` array parameter and the single write statement
    runs on the external engine from the coordinator — the reference's
    literal behavior. Returns the statement's rowcount (or -1 when the
    driver does not report one)."""
    import re as _re

    if not _re.search(r"\$1(?!\d)", query):
        raise ValueError("ExternalLookup query form requires a $1 parameter")
    rows = bitmap_ids.limit(max_param_ids + 1).collect()
    if len(rows) > max_param_ids:
        raise ValueError(
            f"id set exceeds max_param_ids={max_param_ids}"
        )
    if id_type == "text":
        vals = ", ".join("'" + str(r[0]).replace("'", "''") + "'" for r in rows)
    else:
        vals = ", ".join(str(int(r[0])) for r in rows)
    bound = _re.sub(
        r"\$1(?!\d)", lambda _: f"ARRAY[{vals}]::{id_type}[]", query
    )
    con = connect()
    try:
        cur = con.cursor() if hasattr(con, "cursor") else con
        cur.execute(bound)
        n = getattr(cur, "rowcount", -1)
        if hasattr(con, "commit"):
            con.commit()
        return n if n is not None else -1
    finally:
        con.close()


def export_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """``GET /export`` per-shard CSV (http_handler.go:498) → partitioned
    CSV write (one file per partition = one per shard)."""
    df.write.mode("overwrite").option("header", header).csv(path)
