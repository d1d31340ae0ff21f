"""DDL + catalog surface: CREATE/DROP/ALTER TABLE, CREATE VIEW, SHOW /
system tables — FeatureBase's statement surface (SURVEY §2.2) on the Spark
catalog.

The reference stores schema in etcd and serves ``SHOW``/system tables from
planner ops (``opsystemtable.go:1-673``, ``opfeaturebase{tables,columns,
databases}.go``). Here tables are temp views / catalog tables and the
``fb_*`` system tables are DataFrames derived from ``spark.catalog`` — the
same introspection contract (``fb_tables``, ``fb_columns``,
``fb_databases``, ``fb_views``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Row as SparkRow, SparkSession, functions as F

from featurebase_spark.schema import TableDef


class Catalog:
    """FeatureBase DDL façade over a SparkSession catalog.

    In-session: tables are temp views (fast, no FS writes). Pass
    ``path_prefix`` to also persist as parquet — the production shape where
    CREATE TABLE makes a (bucketed) parquet/Delta table.
    """

    def __init__(self, spark: SparkSession, path_prefix: Optional[str] = None):
        self.spark = spark
        self.path_prefix = path_prefix
        self._defs: dict[str, TableDef] = {}
        self._views: dict[str, str] = {}

    @property
    def _data_path(self) -> str:
        if self.path_prefix is None:
            import tempfile

            self.path_prefix = tempfile.mkdtemp(prefix="fb_catalog_")
        return self.path_prefix

    # -- CREATE/DROP/ALTER TABLE (compilecreatetable.go:28-77,
    #    compilealtertable.go:26-81)

    def create_table(self, td: TableDef, if_not_exists: bool = False) -> None:
        if td.name in self._defs:
            if if_not_exists:
                return
            raise ValueError(f"table {td.name} exists")  # [TABLE_OR_VIEW_ALREADY_EXISTS]
        empty = self.spark.createDataFrame([], td.spark_schema())
        empty.createOrReplaceTempView(td.name)
        self._defs[td.name] = td

    def drop_table(self, name: str, if_exists: bool = False) -> None:
        if name not in self._defs and not if_exists:
            raise ValueError(f"table {name} does not exist")
        self.spark.catalog.dropTempView(name)
        self._defs.pop(name, None)

    def alter_table_add_column(self, name: str, fdef) -> None:
        from featurebase_spark.schema import spark_type

        df = self.spark.table(name).withColumn(
            fdef.name, F.lit(None).cast(spark_type(fdef))
        )
        df.createOrReplaceTempView(name)
        self._defs[name].fields.append(fdef)

    def alter_table_drop_column(self, name: str, col: str) -> None:
        df = self.spark.table(name).drop(col)
        df.createOrReplaceTempView(name)
        self._defs[name].fields = [
            f for f in self._defs[name].fields if f.name != col
        ]

    # -- writes route through operators.writes

    def insert(
        self,
        name: str,
        rows: DataFrame,
        replace: bool = True,
        cols: Optional[list] = None,
    ) -> None:
        """INSERT (upsert-by-_id, opinsert.go:16-453). ``replace=False``
        mirrors plain INSERT which in the reference still overwrites by
        key — kept for API clarity. ``cols``: the column list the INSERT
        statement named — unlisted columns of an EXISTING ``_id`` keep
        their old values (opinsert.go imports only targetColumns)."""
        from featurebase_spark.operators.writes import materialize_view, merge_upsert

        merged = merge_upsert(self.spark.table(name), rows, "_id", update_cols=cols)
        # distributed parquet commit — no rows ever pass through the driver
        materialize_view(merged, name, self._data_path)

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Replace a table's contents (DELETE/TRUNCATE commit path) —
        same distributed generation swap as insert."""
        from featurebase_spark.operators.writes import materialize_view

        if name not in self._defs:
            raise ValueError(f"table {name} does not exist")
        materialize_view(df, name, self._data_path)

    def ddl_text(self, name: str) -> str:
        """SHOW CREATE TABLE reconstruction from the stored TableDef."""
        td = self._defs[name]
        cols = [f"_id {'string' if td.keys else 'id'}"]
        for f in td.fields:
            parts = [f.name, f.fb_type]
            if f.fb_type == "decimal":
                parts[1] = f"decimal({f.scale})"
            if f.min is not None:
                parts.append(f"min {f.min}")
            if f.max is not None:
                parts.append(f"max {f.max}")
            if f.time_unit:
                parts.append(f"timeunit '{f.time_unit}'")
            if f.time_quantum:
                parts.append(f"timequantum '{f.time_quantum}'")
                if f.ttl:
                    parts.append(f"ttl '{f.ttl}'")
            if f.cache_type:
                parts.append(f"cachetype {f.cache_type}")
            cols.append(" ".join(parts))
        return f"create table {name} ({', '.join(cols)})"

    # -- CREATE VIEW (compilecreateview.go:14-60 — stores SQL text,
    #    re-compiled on use; Spark temp views do exactly this)

    def create_view(self, name: str, sql_text: str, replace: bool = False) -> None:
        if name in self._views and not replace:
            raise ValueError(f"view {name} exists")
        self.spark.sql(sql_text).createOrReplaceTempView(name)
        self._views[name] = sql_text

    def drop_view(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self._views.pop(name, None)

    # -- SHOW / system tables (opsystemtable.go, opfeaturebasetables.go)

    def fb_tables(self) -> DataFrame:
        rows = [
            SparkRow(
                name=n,
                keys=td.keys,
                track_existence=td.track_existence,
                n_columns=len(td.fields) + 1,
            )
            for n, td in sorted(self._defs.items())
        ]
        if not rows:
            return self.spark.createDataFrame(
                [], "name STRING, keys BOOLEAN, track_existence BOOLEAN, n_columns INT"
            )
        return self.spark.createDataFrame(rows)

    def fb_columns(self, table: str) -> DataFrame:
        td = self._defs[table]
        rows = [SparkRow(table=table, name="_id", fb_type="id", keys=td.keys)]
        rows += [
            SparkRow(table=table, name=f.name, fb_type=f.fb_type, keys=f.keys)
            for f in td.fields
        ]
        return self.spark.createDataFrame(rows)

    def fb_databases(self) -> DataFrame:
        """SHOW DATABASES (opfeaturebasedatabases.go) — Spark catalogs/
        databases visible to this session."""
        rows = [
            SparkRow(name=db.name, catalog=db.catalog or "spark_catalog")
            for db in self.spark.catalog.listDatabases()
        ]
        return self.spark.createDataFrame(rows)

    def fb_views(self) -> DataFrame:
        if not self._views:
            return self.spark.createDataFrame([], "name STRING, statement STRING")
        return self.spark.createDataFrame(
            [SparkRow(name=n, statement=s) for n, s in sorted(self._views.items())]
        )

    def show_tables(self) -> list[str]:
        return sorted(self._defs)

    def show_columns(self, table: str) -> list[str]:
        return ["_id"] + [f.name for f in self._defs[table].fields]
