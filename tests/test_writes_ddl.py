"""Write-op semantics (PQL Set/Clear/ClearRow/Store/Delete, INSERT-upsert)
and the DDL/catalog façade — mirrored from reference behaviors in
executor.go:5895-6353 and sql3/test/defs (defs_insert, defs_delete)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurebase_spark.operators import writes as W
from featurebase_spark.operators.ddl import Catalog
from featurebase_spark.schema import FieldDef, TableDef


@pytest.fixture()
def tbl(spark):
    return spark.createDataFrame(
        [(1, "a", 10, ["x"]), (2, "b", 20, ["x", "y"]), (3, "a", 30, None)],
        "_id LONG, s STRING, n LONG, tags ARRAY<STRING>",
    )


def _by_id(df):
    return {r["_id"]: r for r in df.collect()}


def test_set_bit_mutex_last_write_wins(tbl):
    out = _by_id(W.set_bit(tbl, 1, "s", "z"))
    assert out[1]["s"] == "z" and out[2]["s"] == "b"


def test_set_bit_set_field_unions(tbl):
    out = _by_id(W.set_bit(tbl, 1, "tags", "new"))
    assert sorted(out[1]["tags"]) == ["new", "x"]
    # null array treated as empty set
    out = _by_id(W.set_bit(tbl, 3, "tags", "first"))
    assert out[3]["tags"] == ["first"]


def test_set_bit_creates_record(tbl):
    out = _by_id(W.set_bit(tbl, 99, "n", 5))
    assert out[99]["n"] == 5 and out[99]["s"] is None
    assert len(out) == 4


def test_clear_bit(tbl):
    out = _by_id(W.clear_bit(tbl, 2, "tags", "y"))
    assert out[2]["tags"] == ["x"]
    out = _by_id(W.clear_bit(tbl, 1, "s", "a"))
    assert out[1]["s"] is None
    # clearing a non-matching scalar value is a no-op
    out = _by_id(W.clear_bit(tbl, 2, "s", "nope"))
    assert out[2]["s"] == "b"


def test_clear_row_all_records(tbl):
    out = _by_id(W.clear_row(tbl, "s", "a"))
    assert out[1]["s"] is None and out[3]["s"] is None and out[2]["s"] == "b"


def test_store_row_overwrites_bitmap(spark, tbl):
    ids = spark.createDataFrame([(2,), (3,)], ["_id"])
    out = _by_id(W.store_row(tbl, ids, "s", "a"))
    # 2,3 gain 'a'; 1 (had 'a', not in bitmap) loses it
    assert out[1]["s"] is None and out[2]["s"] == "a" and out[3]["s"] == "a"


def test_delete_records(spark, tbl):
    ids = spark.createDataFrame([(1,), (3,)], ["_id"])
    out = W.delete_records(tbl, ids)
    assert sorted(r["_id"] for r in out.collect()) == [2]


def test_delete_where(tbl):
    out = W.delete_where(tbl, F.col("n") > 15)
    assert sorted(r["_id"] for r in out.collect()) == [1]


def test_merge_upsert(spark, tbl):
    updates = spark.createDataFrame(
        [(2, "B!", 200, None), (4, "d", 40, ["w"])], tbl.schema
    )
    out = _by_id(W.merge_upsert(tbl, updates))
    assert out[2]["n"] == 200 and out[4]["s"] == "d" and len(out) == 4


def test_bulk_upsert_last_write_wins(spark, tbl):
    updates = spark.createDataFrame(
        [(5, "v1", 1, None), (5, "v2", 2, None)], tbl.schema
    )
    out = _by_id(W.bulk_upsert_last_write_wins(tbl, updates, version_col="n"))
    assert out[5]["s"] == "v2"


def test_catalog_ddl_roundtrip(spark):
    cat = Catalog(spark)
    td = TableDef(
        "t_ddl",
        [
            FieldDef("name", "string"),
            FieldDef("age", "int"),
            FieldDef("tags", "stringset"),
            FieldDef("bal", "decimal", scale=2),
        ],
    )
    cat.create_table(td)
    assert cat.show_tables() == ["t_ddl"]
    assert cat.show_columns("t_ddl") == ["_id", "name", "age", "tags", "bal"]
    with pytest.raises(ValueError, match="exists"):
        cat.create_table(td)
    cat.create_table(td, if_not_exists=True)  # no-op

    rows = spark.createDataFrame(
        [(1, "ann", 30, ["x"], None), (2, "bob", 40, None, None)],
        spark.table("t_ddl").schema,
    )
    cat.insert("t_ddl", rows)
    assert spark.table("t_ddl").count() == 2
    # INSERT with existing _id upserts (opinsert.go upsert-by-_id)
    cat.insert(
        "t_ddl",
        spark.createDataFrame([(1, "ANN", 31, None, None)], spark.table("t_ddl").schema),
    )
    got = {r["_id"]: r["name"] for r in spark.table("t_ddl").collect()}
    assert got == {1: "ANN", 2: "bob"}

    cat.alter_table_add_column("t_ddl", FieldDef("extra", "int"))
    assert "extra" in spark.table("t_ddl").columns
    cat.alter_table_drop_column("t_ddl", "extra")
    assert "extra" not in spark.table("t_ddl").columns

    cat.create_view("v_ddl", "SELECT _id, upper(name) AS name FROM t_ddl")
    assert {r["name"] for r in spark.table("v_ddl").collect()} == {"ANN", "BOB"}

    sys_tables = cat.fb_tables().collect()
    assert sys_tables[0]["name"] == "t_ddl" and sys_tables[0]["n_columns"] == 5
    assert [r["name"] for r in cat.fb_columns("t_ddl").collect()][0] == "_id"
    assert cat.fb_views().first()["name"] == "v_ddl"
    cat.drop_view("v_ddl")
    cat.drop_table("t_ddl")
    assert cat.show_tables() == []
    with pytest.raises(ValueError, match="does not exist"):
        cat.drop_table("t_ddl")


def test_insert_never_collects_to_driver(spark, monkeypatch, tmp_path):
    """The INSERT commit path must be fully distributed (VERDICT r1 #1):
    a parquet generation swap, never DataFrame.collect through the driver."""
    import pyspark.sql

    cat = Catalog(spark, path_prefix=str(tmp_path))
    td = TableDef("t_nocollect", [FieldDef("v", "int")])
    cat.create_table(td)
    schema = spark.table("t_nocollect").schema

    def banned(self, *a, **k):
        raise AssertionError("collect() on the write path")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", banned)
    monkeypatch.setattr(pyspark.sql.DataFrame, "toLocalIterator", banned)
    cat.insert("t_nocollect", spark.createDataFrame([(1, 10), (2, 20)], schema))
    cat.insert("t_nocollect", spark.createDataFrame([(2, 99), (3, 30)], schema))
    monkeypatch.undo()
    got = {r["_id"]: r["v"] for r in spark.table("t_nocollect").collect()}
    assert got == {1: 10, 2: 99, 3: 30}
    cat.drop_table("t_nocollect")


def test_materialize_view_generations(spark, tmp_path):
    from featurebase_spark.operators.writes import (
        materialize_view,
        vacuum_generations,
    )
    import os

    df1 = spark.createDataFrame([(1,)], "a LONG")
    materialize_view(df1, "t_gen", str(tmp_path))
    df2 = spark.table("t_gen").withColumn("a", F.col("a") + 1)
    out = materialize_view(df2, "t_gen", str(tmp_path))
    assert [r["a"] for r in spark.table("t_gen").collect()] == [2]
    gens = os.listdir(tmp_path / "t_gen")
    assert len(gens) == 2
    keep = os.path.basename(os.path.dirname(out.inputFiles()[0]))
    vacuum_generations(str(tmp_path), "t_gen", keep)
    assert os.listdir(tmp_path / "t_gen") == [keep]
    assert [r["a"] for r in spark.table("t_gen").collect()] == [2]
    spark.catalog.dropTempView("t_gen")


def test_fb_databases(spark):
    from featurebase_spark.operators.ddl import Catalog

    dbs = Catalog(spark).fb_databases().collect()
    assert any(r["name"] == "default" for r in dbs)
    assert set(dbs[0].asDict()) == {"name", "catalog"}


def test_keyed_table_ddl_and_dialect(spark):
    """String-keyed table (index keys=true, index.go:36; defs_keyed.go):
    DDL create + upsert-by-string-key + dialect SELECT."""
    from featurebase_spark.operators.ddl import Catalog
    from featurebase_spark.schema import FieldDef, TableDef
    from featurebase_spark.sql import fb_sql

    cat = Catalog(spark)
    cat.drop_table("keyed_people", if_exists=True)
    cat.create_table(
        TableDef("keyed_people", [FieldDef("age", "int")], keys=True)
    )
    cat.insert(
        "keyed_people",
        spark.createDataFrame([("ann", 30), ("bob", 41)], "_id STRING, age LONG"),
    )
    cat.insert(  # upsert: 'ann' overwritten by key
        "keyed_people",
        spark.createDataFrame([("ann", 31)], "_id STRING, age LONG"),
    )
    rows = fb_sql(
        spark, "select top(5) _id, age from keyed_people order by _id"
    ).collect()
    assert [(r["_id"], r["age"]) for r in rows] == [("ann", 31), ("bob", 41)]
    assert cat.fb_columns("keyed_people").first()["keys"] is True


def test_cluster_introspection_system_tables(spark):
    """fb_exec_requests / fb_performance_counters (opsystemtable.go:1-673)
    mapped to Spark's public status tracker: exec requests mirror active
    jobs (idle session => empty with a stable schema); counters carry the
    scheduler gauges."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    reqs = cat.fb_exec_requests()
    # the 17-column wire shape (sql_complex_test.go:74-106)
    assert reqs.columns == [
        "nodeid", "request_id", "user", "start_time", "end_time",
        "status", "wait_type", "wait_time", "wait_resource", "cpu_time",
        "elapsed_time", "reads", "writes", "logical_reads", "row_count",
        "sql", "plan",
    ]
    assert reqs.count() >= 0  # idle driver: no active jobs
    # the 6-column wire shape (sql_complex_test.go:53-72)
    pc = cat.fb_performance_counters()
    assert pc.columns == [
        "nodeid", "namespace", "subsystem", "counter_name", "value",
        "counter_type",
    ]
    counters = {r["counter_name"]: r["value"] for r in pc.collect()}
    assert set(counters) == {
        "active_jobs", "active_stages", "default_parallelism", "uptime_ms"
    }
    assert counters["default_parallelism"] >= 1 and counters["uptime_ms"] > 0


def test_system_tables_selectable(spark):
    """System tables answer plain SELECTs through fb_sql (the reference
    registers them as ordinary planner tables, opsystemtable.go) — not
    only SHOW."""
    from featurebase_spark.operators.ddl import Catalog
    from featurebase_spark.schema import FieldDef, TableDef
    from featurebase_spark.sql import fb_sql

    cat = Catalog(spark)
    cat.create_table(TableDef("sys_sel_t", [FieldDef("a", "int")]))
    rows = fb_sql(
        spark,
        "select name, n_columns from fb_tables where name = 'sys_sel_t'",
        catalog=cat,
    ).collect()
    assert [(r["name"], r["n_columns"]) for r in rows] == [("sys_sel_t", 2)]
    n = fb_sql(
        spark,
        "select count(*) as n from fb_performance_counters "
        "where counter_name = 'uptime_ms'",
        catalog=cat,
    ).first()["n"]
    assert n == 1
    cat.drop_table("sys_sel_t")


def test_driver_side_xxhash64_replica_is_bit_exact(spark):
    """spark_bucket routes literal statement batches on the driver; its
    xxhash64 replica must match Spark's BIT-EXACTLY for long and string
    keys or routed writes would read the wrong buckets."""
    import random
    import string as _string

    from pyspark.sql import functions as F

    from featurebase_spark.operators.writes import (
        spark_bucket,
        xxhash64_bytes,
        xxhash64_long,
    )

    def signed(h):
        return ((h + 2**63) % 2**64) - 2**63

    rng = random.Random(7)
    longs = [0, 1, -1, 42, 2**62, -(2**62)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(100)
    ]
    got = spark.createDataFrame([(v,) for v in longs], "v long").select(
        "v", F.xxhash64("v").alias("h"), F.pmod(F.xxhash64("v"), F.lit(16)).alias("b")
    ).collect()
    for r in got:
        assert signed(xxhash64_long(r["v"])) == r["h"]
        assert spark_bucket(r["v"], 16) == r["b"]
    strs = ["", "a", "abcdefgh", "x" * 31, "y" * 32, "z" * 100,
            "héllo ✓ wörld"] + [
        "".join(rng.choices(_string.printable, k=rng.randint(0, 64)))
        for _ in range(100)
    ]
    got = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(16)).alias("b")
    ).collect()
    for r in got:
        assert signed(xxhash64_bytes(r["s"].encode("utf-8"))) == r["h"]
        assert spark_bucket(r["s"], 16) == r["b"]


def test_touched_buckets_driver_route_equals_plan_route(spark, tmp_path):
    """The driver-side bucket routing must touch EXACTLY the buckets the
    plan-side aggregation would — verified by running an upsert through
    a literal batch and asserting the rewritten buckets equal the
    Spark-computed bucket set of the same keys."""
    from pyspark.sql import functions as F

    from featurebase_spark.operators.writes import PartitionedUpsertTable

    t = PartitionedUpsertTable(spark, str(tmp_path / "bkt"), "_id", 16)
    base = spark.range(200).select(F.col("id").alias("_id"),
                                   (F.col("id") * 3).alias("v"))
    t.init(base)
    batch = spark.sql(
        "SELECT v0 AS _id, v1 AS v FROM (VALUES "
        "(CAST(3 AS bigint), CAST(999 AS bigint)), "
        "(CAST(77 AS bigint), CAST(111 AS bigint)), "
        "(CAST(3 AS bigint), CAST(1000 AS bigint))) AS __v(v0, v1)"
    )
    from featurebase_spark.operators.writes import _is_literal_plan
    assert _is_literal_plan(batch)
    touched = t.upsert(batch)
    want = sorted(
        r[0] for r in batch.select(
            F.pmod(F.xxhash64("_id"), F.lit(16)).alias("b")
        ).distinct().collect()
    )
    assert sorted(touched) == want
    rows = {r["_id"]: r["v"] for r in t.read().collect()}
    assert rows[77] == 111 and rows[3] in (999, 1000) and rows[5] == 15


def test_literal_upsert_null_key_not_dropped(spark, tmp_path):
    """A literal (statement-door) batch containing a NULL key: the
    distributed path stages that row into bucket pmod(xxhash64(NULL)=42,
    n), so the driver-computed touched set must include that bucket or
    the commit never repoints it — silent row drop."""
    from pyspark.sql import functions as F

    from featurebase_spark.operators.writes import (
        PartitionedUpsertTable,
        spark_bucket,
    )

    n = 16
    # driver replica agrees with the engine on the NULL bucket
    eng = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(None).cast("bigint")), F.lit(n)).alias("b")
    ).first()["b"]
    assert spark_bucket(None, n) == eng
    t = PartitionedUpsertTable(spark, str(tmp_path / "nk"), "_id", n)
    t.init(spark.createDataFrame([(1, "a")], "_id bigint, v string"))
    batch = spark.createDataFrame(
        [(None, "nullrow"), (2, "b")], "_id bigint, v string"
    )
    touched = t.upsert(batch)
    assert spark_bucket(None, n) in touched
    rows = {r["_id"]: r["v"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "b", None: "nullrow"}


def test_literal_frame_roundtrips_hostile_payloads(spark):
    """r7 ADVICE high #1: Spark's parser honors backslash escapes in
    string literals, so un-doubled backslashes silently corrupt spool
    payloads ('C:\\temp\\new' became 'C:<TAB>emp<LF>ew'); repr(nan/inf)
    are not valid SQL. literal_frame must round-trip all of them."""
    import math

    from featurebase_spark.operators.writes import literal_frame

    rows = [
        (1, "C:\\temp\\new", 1.5),
        (2, "line1\nline2\ttab", float("nan")),
        (3, "quote ' and \\' mix", float("inf")),
        (4, "regex \\d+ \\Q\\E", float("-inf")),
        (5, None, -2.5),
    ]
    df = literal_frame(spark, rows, "id long, s string, x double")
    got = {r["id"]: (r["s"], r["x"]) for r in df.collect()}
    for i, s, x in rows:
        gs, gx = got[i]
        assert gs == s, (gs, s)
        if math.isnan(x):
            assert math.isnan(gx)
        else:
            assert gx == x
    # Spark normalizes a -0.0 literal to 0.0 (SQL equality semantics);
    # the VALUES path must at least not error and must stay == 0.0
    z = literal_frame(spark, [(1, -0.0)], "id long, x double").first()["x"]
    assert z == 0.0


# ---------------------------------------------------------------------------
# TEXT (trigram) indexes — CREATE TEXT INDEX / like_search / staleness
# ---------------------------------------------------------------------------


def test_text_index_lifecycle(spark):
    from featurebase_spark.statements import execute_statement

    cat = Catalog(spark)
    td = TableDef(
        "t_txt", [FieldDef("body", "string"), FieldDef("n", "int")]
    )
    cat.create_table(td)
    rows = spark.createDataFrame(
        [
            (1, "the big vector table", 1),
            (2, "small batch merge", 2),
            (3, "vector big", 3),
            (4, None, 4),
        ],
        spark.table("t_txt").schema,
    )
    cat.insert("t_txt", rows)
    execute_statement(spark, "CREATE TEXT INDEX ON t_txt (body)", catalog=cat)
    got = sorted(
        r["_id"] for r in cat.like_search("t_txt", "body", "big vector").collect()
    )
    assert got == [1]
    # SHOW INDEXES reports the trigram kind
    kinds = {
        (r["field"], r["kind"]) for r in cat.fb_indexes("t_txt").collect()
    }
    assert ("body", "trigram") in kinds
    # a write marks the index stale; the next probe sees the new row
    more = spark.createDataFrame(
        [(5, "another big vector here", 5)], spark.table("t_txt").schema
    )
    cat.insert("t_txt", more)
    got = sorted(
        r["_id"] for r in cat.like_search("t_txt", "body", "big vector").collect()
    )
    assert got == [1, 5]
    # DROP INDEX removes it; probes error
    cat.drop_index("t_txt", ["body"])
    with pytest.raises(ValueError, match="no text index"):
        cat.like_search("t_txt", "body", "big vector")
    cat.drop_table("t_txt")


def test_text_index_errors(spark):
    cat = Catalog(spark)
    td = TableDef("t_txt2", [FieldDef("body", "string"), FieldDef("n", "int")])
    cat.create_table(td)
    with pytest.raises(ValueError, match="cannot carry a text index"):
        cat.create_text_index("t_txt2", "n")
    with pytest.raises(ValueError, match="column 'nope' not found"):
        cat.create_text_index("t_txt2", "nope")
    cat.create_text_index("t_txt2", "body")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_text_index("t_txt2", "body")
    cat.drop_table("t_txt2")
