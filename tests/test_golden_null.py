"""Golden mirrors of the reference null/bool/negative-range/timestamp
corpora: defs_null.go, defs_bool.go, defs_minmaxnegative.go,
defs_timestamp_literals.go — run through the SQL-text door end-to-end."""

from __future__ import annotations

import pytest

from featurebase_spark.operators.ddl import Catalog
from featurebase_spark.sql import fb_sql


@pytest.fixture()
def cat(spark):
    return Catalog(spark)


def test_null_all_types_matrix(spark, cat):
    """defs_null.go null_all_types: one row with every non-_id column NULL;
    IS NULL / IS NOT NULL per type."""
    fb_sql(
        spark,
        "create table null_all_types (_id id, i int min 0 max 1000, "
        "i1 int min 0 max 1000, b1 bool, d1 decimal(2), id1 id, ids1 idset, "
        "s1 string, ss1 stringset, t1 timestamp)",
        catalog=cat,
    )
    fb_sql(
        spark,
        "insert into null_all_types (_id, i, i1, b1, d1, id1, ids1, s1, ss1, t1) "
        "values (1, 1, null, null, null, null, null, null, null, null)",
        catalog=cat,
    )
    r = fb_sql(
        spark,
        "select _id is null as c0, i is null as c1, i1 is null as c2, "
        "b1 is null as c3, d1 is null as c4, id1 is null as c5, "
        "ids1 is null as c6, s1 is null as c7, ss1 is null as c8, "
        "t1 is null as c9 from null_all_types",
        catalog=cat,
    ).first()
    assert [r[f"c{i}"] for i in range(10)] == [
        False, False, True, True, True, True, True, True, True, True,
    ]
    cat.drop_table("null_all_types")


def test_null_filter_is_null(spark, cat):
    """defs_null.go null_filter_all_types: WHERE col IS [NOT] NULL filters."""
    fb_sql(
        spark,
        "create table null_filter_t (_id id, i1 int, s1 string)",
        catalog=cat,
    )
    fb_sql(
        spark,
        "insert into null_filter_t (_id, i1, s1) values "
        "(1, 10, null), (2, null, 'x'), (3, 30, 'y')",
        catalog=cat,
    )

    def ids(sql):
        return sorted(r["_id"] for r in fb_sql(spark, sql, catalog=cat).collect())

    assert ids("select _id from null_filter_t where _id is null") == []
    assert ids("select _id from null_filter_t where _id is not null") == [1, 2, 3]
    assert ids("select _id from null_filter_t where i1 is null") == [2]
    assert ids("select _id from null_filter_t where i1 is not null") == [1, 3]
    assert ids("select _id from null_filter_t where s1 is null") == [1]
    assert ids("select _id from null_filter_t where s1 is not null") == [2, 3]
    cat.drop_table("null_filter_t")


def test_bool_roundtrip_all_transitions(spark, cat):
    """defs_bool.go singleboolfield: insert true/false/null, then flip every
    value to a different state via upsert — the two-bitmap bool encoding's
    full transition matrix (field.go:367-380, fake rows executor.go:4754)."""
    fb_sql(spark, "create table singleboolfield (_id id, a_bool bool)", catalog=cat)
    fb_sql(
        spark,
        "insert into singleboolfield (_id, a_bool) values "
        "(1, true), (2, true), (3, false), (4, false), (5, null), (6, null)",
        catalog=cat,
    )
    got = {r["_id"]: r["a_bool"] for r in spark.table("singleboolfield").collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: None, 6: None}
    fb_sql(
        spark,
        "insert into singleboolfield (_id, a_bool) values "
        "(1, false), (2, null), (3, true), (4, null), (5, false), (6, true)",
        catalog=cat,
    )
    got = {r["_id"]: r["a_bool"] for r in spark.table("singleboolfield").collect()}
    assert got == {1: False, 2: None, 3: True, 4: None, 5: False, 6: True}
    cat.drop_table("singleboolfield")


def test_minmax_negative_ranges(spark, cat):
    """defs_minmaxnegative.go: int fields with negative min/max declared
    ranges accept in-range negatives and reject out-of-range ones."""
    fb_sql(
        spark,
        "create table minmaxnegatives (_id id, "
        "positive_int int min 10 max 100, negative_int int min -100 max -10)",
        catalog=cat,
    )
    fb_sql(
        spark,
        "insert into minmaxnegatives (_id, positive_int, negative_int) values "
        "(1, 11, -11), (2, 22, -22), (3, 33, -33)",
        catalog=cat,
    )
    rows = sorted(
        (r["_id"], r["positive_int"], r["negative_int"])
        for r in spark.table("minmaxnegatives").collect()
    )
    assert rows == [(1, 11, -11), (2, 22, -22), (3, 33, -33)]
    from featurebase_spark.statements import StatementError

    with pytest.raises(StatementError, match="value '-5' out of range"):
        fb_sql(
            spark,
            "insert into minmaxnegatives (_id, negative_int) values (4, -5)",
            catalog=cat,
        )
    with pytest.raises(StatementError, match="value '-101' out of range"):
        fb_sql(
            spark,
            "insert into minmaxnegatives (_id, negative_int) values (4, -101)",
            catalog=cat,
        )
    cat.drop_table("minmaxnegatives")


def test_timestamp_integer_literals(spark, cat):
    """defs_timestamp_literals.go: integer literals into a timestamp column
    are unix-epoch seconds (0 → 1970, -86400 → 1969-12-31); datetimepart
    'yy' reads the year back."""
    fb_sql(
        spark,
        "create table testtimestampliterals (_id id, a int, ts timestamp)",
        catalog=cat,
    )
    fb_sql(
        spark,
        "insert into testtimestampliterals (_id, a, ts) values "
        "(1, 40, current_timestamp), (3, 40, 0), (4, 40, -86400)",
        catalog=cat,
    )
    got = {
        r["_id"]: r["yy"]
        for r in fb_sql(
            spark,
            "select _id, datetimepart('yy', ts) as yy from testtimestampliterals "
            "where _id in (3, 4)",
            catalog=cat,
        ).collect()
    }
    assert got == {3: 1970, 4: 1969}
    assert (
        fb_sql(
            spark,
            "select count(*) as n from testtimestampliterals where ts is not null",
            catalog=cat,
        ).first()["n"]
        == 3
    )
    cat.drop_table("testtimestampliterals")
