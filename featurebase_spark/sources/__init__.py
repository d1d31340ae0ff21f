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
    spark: SparkSession, path: str, skip_bad_rows: int = 0
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
    """
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
        name, kind = _split_idk_header(c)
        t = IDK_HEADER_TYPES.get(kind, "string")
        if t is None:
            continue
        src = F.col(c)
        present = src.isNotNull() & (F.trim(src) != "")
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
            if kind == "decimal":
                # interfaces.go:679 wraps differently for decimals
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
                cols.append(expr.alias(name))
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
