"""Regression tests for the round-12 ADVICE items (fixed in round 13).

1. (medium) Trailing-token errors fire BEFORE the handler mutates state
   for INSERT/REPLACE/DELETE-truncate/COPY/ALTER DROP — the reference
   parses the whole statement first (parser.go:59-61), so
   'INSERT … VALUES (…) garbage' must not insert the row.
2. (low) interval_overlap_join skew='error' computes per-bucket density
   from BOTH sides: a bucket hot only on the right trips the sentinel.
3. (low) the NDJSON strict missing-key probe uses real JSON key
   semantics (json_object_keys), not a substring test — a nested or
   in-string occurrence of the key name no longer masks a missing
   top-level key, and an explicit JSON null still counts as present.
4. (low) Clear/ClearRow on time-quantum fields are null-safe: clearing
   value v leaves entries whose stored value is NULL untouched.
5. (low) is_keyed_field recognizes string-valued time-quantum fields
   (array<struct<value:string,…>>), so Rows(like=) on a keyed time
   field is not refused with the unkeyed-translation error.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from featurebase_spark.operators.ddl import Catalog
from featurebase_spark.sql import fb_sql
from featurebase_spark.statements import StatementError


@pytest.fixture()
def cat(spark):
    return Catalog(spark)


def _mk(spark, cat, ddl):
    fb_sql(spark, ddl, catalog=cat)


# ---- 1. parse-whole-statement-first for every mutating handler ----------


def test_insert_trailing_garbage_inserts_nothing(spark, cat):
    _mk(spark, cat, "create table t1adv (_id id, a int)")
    with pytest.raises(StatementError, match="expected semicolon or EOF"):
        fb_sql(spark, "insert into t1adv (_id, a) values (1, 2) garbage",
               catalog=cat)
    assert spark.table("t1adv").count() == 0


def test_replace_trailing_garbage_inserts_nothing(spark, cat):
    _mk(spark, cat, "create table t2adv (_id id, a int)")
    with pytest.raises(StatementError, match="expected semicolon or EOF"):
        fb_sql(spark, "replace into t2adv (_id, a) values (1, 2); nope",
               catalog=cat)
    assert spark.table("t2adv").count() == 0


def test_delete_truncate_trailing_garbage_keeps_rows(spark, cat):
    _mk(spark, cat, "create table t3adv (_id id, a int)")
    fb_sql(spark, "insert into t3adv (_id, a) values (1, 2)", catalog=cat)
    with pytest.raises(StatementError, match="expected semicolon or EOF"):
        fb_sql(spark, "delete from t3adv garbage", catalog=cat)
    assert spark.table("t3adv").count() == 1


def test_copy_trailing_garbage_creates_nothing(spark, cat):
    _mk(spark, cat, "create table t4adv (_id id, a int)")
    with pytest.raises(StatementError, match="expected semicolon or EOF"):
        fb_sql(spark, "copy t4adv to t4copy garbage", catalog=cat)
    assert "t4copy" not in cat._defs


def test_alter_drop_trailing_garbage_keeps_column(spark, cat):
    _mk(spark, cat, "create table t5adv (_id id, a int, b int)")
    with pytest.raises(StatementError, match="expected semicolon or EOF"):
        fb_sql(spark, "alter table t5adv drop column b garbage", catalog=cat)
    assert {f.name for f in cat._defs["t5adv"].fields} == {"a", "b"}


def test_drop_semicolon_then_garbage_keeps_table(spark, cat):
    # the post-';' variant of the same bug class
    _mk(spark, cat, "create table t6adv (_id id, a int)")
    with pytest.raises(StatementError, match="expected semicolon or EOF"):
        fb_sql(spark, "drop table t6adv; garbage", catalog=cat)
    assert "t6adv" in cat._defs


# ---- 2. two-sided skew sentinel -----------------------------------------


def test_interval_skew_error_right_only_hot_bucket(spark):
    from featurebase_spark.operators.intervals import interval_overlap_join

    left = spark.createDataFrame([(i, 0, 5) for i in range(3)],
                                 "id int, s long, e long")
    right = spark.createDataFrame([(i, 1, 4) for i in range(50)],
                                  "id int, s long, e long")
    with pytest.raises(ValueError, match="hot buckets exceed"):
        interval_overlap_join(
            left, right, "s", "e", bucket_width=100,
            skew="error", skew_threshold=10,
        ).count()


def test_interval_skew_error_still_passes_when_cool(spark):
    from featurebase_spark.operators.intervals import interval_overlap_join

    left = spark.createDataFrame([(i, 0, 5) for i in range(3)],
                                 "id int, s long, e long")
    right = spark.createDataFrame([(i, 1, 4) for i in range(3)],
                                  "id int, s long, e long")
    out = interval_overlap_join(
        left, right, "s", "e", bucket_width=100,
        skew="error", skew_threshold=10,
    )
    assert out.count() == 9


# ---- 3. NDJSON missing-key probe is JSON-aware --------------------------


def _bulk_ndjson(spark, cat, lines, table="tnd", map_loc="'$.v' INT"):
    fb_sql(spark, f"create table {table} (_id id, v int)", catalog=cat)
    tf = tempfile.NamedTemporaryFile(
        "w", suffix=".ndjson", delete=False)
    tf.write("\n".join(lines))
    tf.close()
    try:
        fb_sql(
            spark,
            f"bulk insert into {table} (_id, v) "
            f"map ('$.id' ID, {map_loc}) "
            f"from '{tf.name}' with format 'NDJSON' input 'FILE'",
            catalog=cat,
        )
    finally:
        os.unlink(tf.name)


def test_ndjson_nested_key_does_not_mask_missing(spark, cat):
    # "v" appears only nested — the top-level key is missing, so the
    # reference raises; the old substring probe passed silently
    with pytest.raises(StatementError, match="unknown key v applying path"):
        _bulk_ndjson(spark, cat,
                     ['{"id": 1, "outer": {"v": 7}}'], table="tnd1")


def test_ndjson_key_in_string_value_does_not_mask_missing(spark, cat):
    with pytest.raises(StatementError, match="unknown key v applying path"):
        _bulk_ndjson(spark, cat,
                     ['{"id": 1, "s": "has \\"v\\" inside"}'], table="tnd2")


def test_ndjson_explicit_null_counts_as_present(spark, cat):
    _bulk_ndjson(spark, cat,
                 ['{"id": 1, "v": null}', '{"id": 2, "v": 5}'],
                 table="tnd3")
    got = {r["_id"]: r["v"] for r in spark.table("tnd3").collect()}
    assert got == {1: None, 2: 5}


# ---- 4. null-safe quantum Clear -----------------------------------------


def _quantum_table(spark):
    return spark.createDataFrame(
        [(1, [(10, "2020-01-01 00:00:00"), (None, "2020-01-02 00:00:00")]),
         (2, [(10, "2020-01-01 00:00:00")])],
        "_id long, f array<struct<value: long, ts: string>>",
    ).select(
        "_id",
        F.transform(
            "f", lambda x: F.struct(
                x["value"].alias("value"),
                x["ts"].cast("timestamp").alias("ts"),
            )
        ).alias("f"),
    )


def test_clear_bit_quantum_keeps_null_entries(spark):
    from featurebase_spark.operators.writes import clear_bit

    t = clear_bit(_quantum_table(spark), 1, "f", 10)
    vals = {r["_id"]: [e["value"] for e in r["f"]] for r in t.collect()}
    assert vals[1] == [None]  # NULL entry survives the Clear of 10
    assert vals[2] == [10]    # other record untouched


def test_clear_row_quantum_keeps_null_entries(spark):
    from featurebase_spark.operators.writes import clear_row

    t = clear_row(_quantum_table(spark), "f", 10)
    vals = {r["_id"]: [e["value"] for e in r["f"]] for r in t.collect()}
    assert vals[1] == [None]
    assert vals[2] == []


# ---- 5. string-quantum fields are keyed ---------------------------------


def test_string_quantum_field_is_keyed(spark):
    from featurebase_spark.pql.calls import Index

    df = spark.createDataFrame(
        [(1, [("a", "2020-01-01 00:00:00")])],
        "_id long, fq array<struct<value: string, ts: string>>",
    )
    idx = Index(df)
    assert idx.is_keyed_field("fq")
    # int-valued quantum fields stay unkeyed
    df2 = spark.createDataFrame(
        [(1, [(7, "2020-01-01 00:00:00")])],
        "_id long, fq array<struct<value: long, ts: string>>",
    )
    assert not Index(df2).is_keyed_field("fq")
