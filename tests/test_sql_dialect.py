"""FeatureBase SQL dialect translator (featurebase_spark/sql.py).

Source-of-truth SQL shapes taken from the reference's golden test corpus
(/root/reference/sql3/test/defs/defs_top.go, defs_set_functions.go,
defs_string_functions.go, defs_date_functions.go, defs_cast.go).
"""

from __future__ import annotations

import pytest

from featurebase_spark.sql import fb_sql, translate


# --- pure translation ------------------------------------------------------


@pytest.mark.parametrize(
    "fb, spark_sql",
    [
        # TOP(n) → LIMIT (defs_top.go:23)
        (
            "select top(1) * from t where setcontains(s, 'x');",
            "select * from t where CASE WHEN (s) IS NULL OR ('x') IS NULL "
            "THEN CAST(NULL AS BOOLEAN) ELSE exists(s, x -> "
            "lower(CAST(x AS STRING)) = lower(CAST(('x') AS STRING))) END "
            "LIMIT 1",
        ),
        # TOP inside a subquery binds to that scope only
        (
            "select * from (select top(3) a from u) q limit 9",
            "select * from (select a from u LIMIT 3) q limit 9",
        ),
        # set literal (defs_set_functions.go:43); r11: case-folded
        # EqualFold membership + NULL propagation per the evaluator
        (
            "select setcontainsall(ev, ['POST']) from t",
            "select CASE WHEN (ev) IS NULL OR (array('POST')) IS NULL THEN "
            "CAST(NULL AS BOOLEAN) ELSE forall(array('POST'), y -> "
            "exists(ev, x -> lower(CAST(x AS STRING)) = "
            "lower(CAST(y AS STRING)))) END from t",
        ),
        (
            "select setcontainsany(ev, ['POST', 'GET']) from t",
            "select CASE WHEN (ev) IS NULL OR (array('POST', 'GET')) IS "
            "NULL THEN CAST(NULL AS BOOLEAN) ELSE "
            "exists(array('POST', 'GET'), y -> exists(ev, x -> "
            "lower(CAST(x AS STRING)) = lower(CAST(y AS STRING)))) END "
            "from t",
        ),
        # 0-based string positions (inbuiltfunctionsstring.go)
        (
            "select charindex('-', s) from t",
            "select (locate('-', s) - 1) from t",
        ),
        # CAST types; plain `AS id` alias untouched (astdatatype.go:10-26)
        (
            "select cast(x as id), cast(y as decimal(2)), z as id from t",
            "select CAST(x AS BIGINT), CAST(y AS DECIMAL(38, 2)), z as id from t",
        ),
        # date functions: part codes (inbuiltfunctionsdate.go)
        (
            "select datetimeadd('d', 3, ts) from t",
            "select timestampadd(DAY, 3, ts) from t",
        ),
        # pass-through: ordinary SQL is untouched
        (
            "select a || b, a % 2, case when a > 1 then 'x' else 'y' end from t",
            "select a || b, a % 2, case when a > 1 then 'x' else 'y' end from t",
        ),
    ],
)
def test_translate(fb, spark_sql):
    assert translate(fb) == spark_sql


def test_translate_substring_guarded():
    """SUBSTRING emits the 0->1-based shift inside the reference's
    range-guard CASE (r10 — EvaluateSubstring raises on out-of-range
    rather than clamping)."""
    out = translate("select substring(s, 0, 3) from t")
    # r11: byte-exact slicing (Go string slices are bytes)
    assert "decode(substring(encode(s, 'UTF-8'), (0) + 1, 3), 'UTF-8')" in out
    assert "octet_length(s)" in out
    assert "out of range" in out and out.startswith("select CASE WHEN")


def test_translate_rejects_bad_arity():
    with pytest.raises(ValueError, match="setcontains"):
        translate("select setcontains(a) from t")


def test_translate_rejects_bad_date_part():
    # NewErrCallParameterValueInvalid text (r10)
    with pytest.raises(
        ValueError, match="invalid value 'century' for parameter 'interval'"
    ):
        translate("select datetimepart('century', ts) from t")


# --- execution on Spark ----------------------------------------------------


def test_fb_sql_end_to_end(spark, tables):
    tables["orders"].createOrReplaceTempView("orders_v")
    df = fb_sql(
        spark,
        "select top(5) o_orderkey as _id, "
        "datetimepart('yy', o_orderdate) as yr, "
        "substring(o_orderpriority, 0, 1) as p0, "
        "charindex('-', o_orderpriority) as dash, "
        "str(o_orderkey) as sid "
        "from orders_v where prefix(o_orderpriority, 1) = '1' "
        "order by _id;",
    )
    rows = df.collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p0 == "1" and r.dash == 1 and r.sid == str(r._id).rjust(10)
        assert 1992 <= r.yr <= 1999


def test_fb_sql_set_functions(spark, tables):
    spark.sql(
        "select p_partkey as _id, split(p_type, ' ') as types, p_type "
        "from {p}", p=tables["part"]
    ).createOrReplaceTempView("part_types")
    df = fb_sql(
        spark,
        "select top(10) _id, setcontains(types, 'BRASS') as has_brass, "
        "setcontainsany(types, ['BRASS', 'STEEL']) as any_bs "
        "from part_types order by _id",
    )
    rows = df.collect()
    assert len(rows) == 10
    for r in rows:
        got = spark.sql(
            f"select p_type from {{p}} where p_partkey = {r._id}",
            p=tables["part"],
        ).first().p_type
        assert r.has_brass == ("BRASS" in got.split(" "))
        assert r.any_bs == bool({"BRASS", "STEEL"} & set(got.split(" ")))


def test_fb_sql_plan(spark, tables):
    from featurebase_spark.sql import fb_sql_plan

    tables["orders"].createOrReplaceTempView("orders_plan_v")
    # the filter must be a PUSHABLE predicate: since r10, prefix()
    # compiles to the reference's guarded first-n-chars picker (CASE +
    # raise_error), which correctly cannot reach the scan
    plan = fb_sql_plan(
        spark,
        "select top(5) o_orderkey, prefix(o_orderpriority, 1) as p1 "
        "from orders_plan_v where o_orderkey > 0",
    )
    assert "Scan parquet" in plan and "PushedFilters" in plan
    assert "TakeOrderedAndProject" in plan or "CollectLimit" in plan


def test_count_check_skips_string_literals(spark):
    """The COUNT-argument compile check runs on the token stream, so a
    COUNT(1)-shaped substring INSIDE a string literal must not raise
    (ADVICE r3) — while real COUNT(1)/COUNT(a,b) still do."""
    import pytest

    from featurebase_spark.sql import translate

    # literal containing COUNT(1): translates cleanly
    out = translate("SELECT 'COUNT(1)' AS s, COUNT(*) AS n FROM r")
    assert "'COUNT(1)'" in out
    with pytest.raises(ValueError, match="column reference expected"):
        translate("SELECT COUNT(1) FROM r")
    with pytest.raises(ValueError, match="formal parameters"):
        translate("SELECT COUNT(a, b) FROM r")


class TestTvfExtensions:
    """TVF front door (DECLARED EXTENSION — the reference's TVF
    scaffolding is disabled, optablevaluedfunction.go:45-47): the
    pipeline operators get FROM-clause spellings with reference-style
    compile errors for bad arity/arguments."""

    def test_fb_sessions_end_to_end(self, spark, tables):
        from featurebase_spark.sql import fb_sql

        tables["events"].limit(500).createOrReplaceTempView("tvf_events")
        out = fb_sql(
            spark,
            "SELECT user_id, session_id, n_events "
            "FROM fb_sessions(tvf_events, user_id, ts, 30) "
            "ORDER BY user_id, session_id",
        ).collect()
        assert len(out) > 0
        # session ids are 1-based and dense per user
        first = [r for r in out if r["user_id"] == out[0]["user_id"]]
        assert [r["session_id"] for r in first] == list(range(1, len(first) + 1))

    def test_fb_sessionize_row_level(self, spark, tables):
        from featurebase_spark.sql import fb_sql

        tables["events"].limit(200).createOrReplaceTempView("tvf_events")
        out = fb_sql(
            spark,
            "SELECT COUNT(*) AS n FROM fb_sessionize(tvf_events, user_id, ts, 30)",
        ).first()
        assert out["n"] == 200  # row-level: input rows preserved

    def test_fb_dedup_survivors_composes(self, spark, tables):
        from featurebase_spark.sql import fb_sql

        tables["documents"].createOrReplaceTempView("tvf_docs")
        n_docs = tables["documents"].count()
        out = fb_sql(
            spark,
            "SELECT COUNT(*) AS n FROM fb_dedup_survivors(tvf_docs, text, doc_id)",
        ).first()
        assert 0 < out["n"] <= n_docs

    def test_tvf_arity_errors(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["events"].limit(10).createOrReplaceTempView("tvf_events")
        with pytest.raises(ValueError, match=r"formal parameters \(4\).*\(3\)"):
            fb_sql(spark, "SELECT * FROM fb_sessions(tvf_events, user_id, ts)")
        with pytest.raises(ValueError, match=r"formal parameters \(3\).*\(4\)"):
            fb_sql(
                spark,
                "SELECT * FROM fb_dedup_survivors(tvf_events, a, b, c)",
            )
        with pytest.raises(ValueError, match="integer literal expected"):
            fb_sql(
                spark,
                "SELECT * FROM fb_sessions(tvf_events, user_id, ts, gap)",
            )
        with pytest.raises(ValueError, match="column 'nope' not found"):
            fb_sql(
                spark,
                "SELECT * FROM fb_sessions(tvf_events, nope, ts, 30)",
            )


    def test_fb_funnel_door(self, spark, tables):
        from featurebase_spark.sql import fb_sql

        tables["events"].createOrReplaceTempView("tvf_events")
        out = fb_sql(
            spark,
            "SELECT step, event_type, users FROM fb_funnel(tvf_events, "
            "user_id, event_type, ts, 'view,click,purchase', 0) "
            "ORDER BY step",
        ).collect()
        assert [r["step"] for r in out] == [1, 2, 3]
        users = [r["users"] for r in out]
        assert users == sorted(users, reverse=True)  # non-increasing

    def test_fb_funnel_bad_steps_literal(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["events"].limit(10).createOrReplaceTempView("tvf_events")
        with pytest.raises(ValueError, match="string literal expected"):
            fb_sql(
                spark,
                "SELECT * FROM fb_funnel(tvf_events, user_id, event_type, "
                "ts, steps, 0)",
            )
        with pytest.raises(ValueError, match="at least two event types"):
            fb_sql(
                spark,
                "SELECT * FROM fb_funnel(tvf_events, user_id, event_type, "
                "ts, 'view', 0)",
            )

    def test_fb_retention_door(self, spark, tables):
        from featurebase_spark.sql import fb_sql

        tables["events"].createOrReplaceTempView("tvf_events")
        out = fb_sql(
            spark,
            "SELECT cohort_week, week_offset, active_users "
            "FROM fb_retention(tvf_events, user_id, ts) "
            "ORDER BY cohort_week, week_offset",
        ).collect()
        assert len(out) > 0
        assert all(r["week_offset"] >= 0 for r in out)

    def test_fb_asof_join_door(self, spark, tables):
        from featurebase_spark.sql import fb_sql
        from pyspark.sql import functions as F

        ev = tables["events"]
        ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        ).createOrReplaceTempView("tvf_purchases")
        ev.where(F.col("event_type") == "click").groupBy(
            "user_id", "ts"
        ).agg(F.max("value").alias("v")).select(
            "user_id", F.col("ts").alias("rts"), "v"
        ).createOrReplaceTempView("tvf_clicks")
        out = fb_sql(
            spark,
            "SELECT COUNT(*) AS n, COUNT(v_asof) AS matched, "
            "COUNT(rts_asof) AS matched_ts "
            "FROM fb_asof_join(tvf_purchases, tvf_clicks, user_id, ts, rts)",
        ).first()
        # left-join row preservation + the right ts rides along
        n_left = ev.where(F.col("event_type") == "purchase").count()
        assert out["n"] == n_left
        assert 0 < out["matched"] <= out["n"]
        assert out["matched_ts"] == out["matched"]


def test_translate_hyphenated_table_in_from_list():
    """A hyphenated table name after a COMMA in a FROM list is table
    position (reference scanner lexes '-' as an identifier char), so it
    rewrites to the mangled view name — not a backticked column."""
    out = translate("select * from foo, my-tbl where foo.x = my-tbl.y")
    assert "fbh__my_tbl" in out.split("where")[0]
    # qualified column refs after WHERE mangle the hyphenated QUALIFIER
    # too (no struct fields in the dialect — dotted ident = table ref)
    assert "foo.x = fbh__my_tbl.y" in out
    # three-element list, hyphenated in the middle
    out = translate("select 1 from a, b-c, d")
    assert " fbh__b_c," in out
    # a comma OUTSIDE a FROM list is expression position: ORDER BY keeps
    # hyphenated identifiers as backticked COLUMN references
    out = translate("select 1 from t order by a-b, c-d")
    assert "`a-b`, `c-d`" in out
    # GROUP BY likewise
    out = translate("select count(*) from t group by a-b, c-d")
    assert "`a-b`, `c-d`" in out
    # JOIN ... ON then a comma resumes the FROM table list
    out = translate("select 1 from a join b on a.x = b.x, c-d")
    assert "fbh__c_d" in out
    # r6 ADVICE probe: a parenthesized subquery inside the FROM list must
    # NOT clear the outer list state (the rewriter recurses per paren
    # scope, so the inner SELECT/WHERE only touch the inner scope's flag)
    out = translate(
        "select t.x from (select a as x from foo where a > 1) t, my-tbl"
    )
    assert "fbh__my_tbl" in out
    out = translate(
        "select 1 from a, (select b from c where b > 1) x, my-tbl"
    )
    assert "fbh__my_tbl" in out
    out = translate(
        "select 1 from a join (select b from c where b>1) x on a.i=x.b, m-n"
    )
    assert "fbh__m_n" in out
    # and a scalar subquery BEFORE the FROM list must not pre-set it
    out = translate("select (select max(b) from c where b>0), z from m-n")
    assert "fbh__m_n" in out


def test_fb_sql_hyphenated_table_from_list(spark):
    """End-to-end: `FROM a, my-tbl` (comma join) resolves the hyphenated
    table through the mangled view and returns the cross-filtered rows."""
    from featurebase_spark.operators.ddl import Catalog

    cat = Catalog(spark)
    fb_sql(spark, "create table fromlist_a (_id id, k int)", catalog=cat)
    fb_sql(spark, "create table from-list-b (_id id, k int, v string)",
           catalog=cat)
    fb_sql(spark, "insert into fromlist_a values (1, 10), (2, 20)", catalog=cat)
    fb_sql(spark, "insert into from-list-b values (1, 10, 'x'), (2, 30, 'y')",
           catalog=cat)
    rows = fb_sql(
        spark,
        "select fromlist_a._id as ida, v from fromlist_a, from-list-b "
        "where fromlist_a.k = from-list-b.k",
        catalog=cat,
    ).collect()
    assert [(r["ida"], r["v"]) for r in rows] == [(1, "x")]
    cat.drop_table("fromlist_a")
    cat.drop_table("from-list-b")


class TestSamplingTvfs:
    """fb_hash_split / fb_hash_sample / fb_decontaminate through the SQL
    text door (the fb_sessionize TVF pattern)."""

    def test_hash_sample_door(self, spark, tables):
        from featurebase_spark.pipeline.sampling import hash_sample

        tables["documents"].createOrReplaceTempView("documents")
        got = {r["doc_id"] for r in fb_sql(
            spark,
            "SELECT doc_id FROM fb_hash_sample(documents, doc_id, 0.25, 7)",
        ).collect()}
        want = {r["doc_id"] for r in
                hash_sample(tables["documents"], "doc_id", 0.25, 7)
                .select("doc_id").collect()}
        assert got == want and len(got) > 0

    def test_decontaminate_door(self, spark, tables):
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the dog"),
             (2, "completely unrelated words in this one here")],
            "doc_id long, text string",
        )
        docs.createOrReplaceTempView("tvf_docs")
        spark.createDataFrame(
            [(9, "quick brown fox jumps over")], "doc_id long, text string"
        ).createOrReplaceTempView("tvf_bench")
        out = {r["doc_id"]: r["contaminated"] for r in fb_sql(
            spark,
            "SELECT doc_id, contaminated FROM "
            "fb_decontaminate(tvf_docs, tvf_bench, text, doc_id, 5)",
        ).collect()}
        assert out == {1: True, 2: False}

    def test_sampling_tvf_arity_and_literal_errors(self, spark, tables):
        tables["documents"].createOrReplaceTempView("documents")
        with pytest.raises(ValueError, match="formal parameters"):
            fb_sql(spark, "SELECT * FROM fb_hash_split(documents, doc_id)")
        with pytest.raises(ValueError, match="integer literal expected for seed"):
            fb_sql(spark,
                   "SELECT * FROM fb_hash_split(documents, doc_id, banana)")
        with pytest.raises(ValueError, match="numeric literal expected for rate"):
            fb_sql(spark,
                   "SELECT * FROM fb_hash_sample(documents, doc_id, x, 7)")
        with pytest.raises(ValueError, match="column 'nope' not found"):
            fb_sql(spark,
                   "SELECT * FROM fb_hash_split(documents, nope, 42)")


def test_translate_fuzz_never_crashes():
    """Robustness: the dialect rewriter over arbitrary token soup must
    raise ValueError (its compile-error surface) or return a string —
    never IndexError/KeyError/RecursionError."""
    import random

    frags = [
        "select", "from", "where", "top", "(", ")", ",", "'x'", '"y"',
        "[", "]", "cast", "as", "int", "my-tbl", "a.b", "count", "*",
        "datetimepart", "rangeq", "!", "1.5", "group", "by", "union",
        "values", "insert", " ", "\t", "--", "§",
    ]
    rng = random.Random(11)
    crashes = []
    for _ in range(2000):
        s = " ".join(rng.choice(frags) for _ in range(rng.randrange(1, 14)))
        try:
            translate(s)
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            crashes.append((s, type(e).__name__, str(e)[:80]))
    assert not crashes, crashes[:5]


def test_fb_topk_and_blocklist_tvfs(spark, tables):
    """r7 TVF doors compose with ordinary SQL and match the DataFrame
    operators exactly."""
    from featurebase_spark.pipeline.blocklist import blocklist_filter
    from featurebase_spark.pipeline.sampling import topk_per_group

    docs = tables["documents"]
    docs.createOrReplaceTempView("tvf_docs2")
    got = {(r["source"], r["doc_id"]) for r in fb_sql(
        spark,
        "SELECT source, doc_id FROM "
        "fb_topk_per_group(tvf_docs2, source, n_chars, 2)",
    ).collect()}
    want = {(r["source"], r["doc_id"]) for r in
            topk_per_group(docs, "source", "n_chars", 2).collect()}
    assert got == want and len(got) > 0
    bl = docs.where("doc_id % 5 = 0").select("doc_id")
    bl.createOrReplaceTempView("tvf_bl")
    got = {r["doc_id"] for r in fb_sql(
        spark,
        "SELECT doc_id FROM fb_blocklist_filter(tvf_docs2, tvf_bl, doc_id)",
    ).collect()}
    want = {r["doc_id"] for r in
            blocklist_filter(docs, bl, "doc_id").collect()}
    naive = {r["doc_id"] for r in docs.where("doc_id % 5 != 0")
             .select("doc_id").collect()}
    assert got == want == naive
    # arity error mirrors the reference phrasing
    with pytest.raises(ValueError, match="formal parameters"):
        fb_sql(spark, "SELECT * FROM fb_topk_per_group(tvf_docs2, source)")


class TestSearchTvfs:
    """fb_like_search / fb_transitions / fb_fuzzy_join / fb_hll doors:
    compile-error surface (the end-to-end results are oracle-gated via
    the *_text_door keys)."""

    def test_like_search_errors(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["documents"].limit(5).createOrReplaceTempView("tvf_docs")
        with pytest.raises(ValueError, match="string literal expected"):
            fb_sql(
                spark,
                "SELECT * FROM fb_like_search(tvf_docs, doc_id, text, lit)",
            )
        # wildcard patterns route through the full planLike surface
        out = fb_sql(
            spark,
            "SELECT doc_id FROM fb_like_search(tvf_docs, doc_id, text, "
            "'%the %')",
        ).count()
        want = tables["documents"].limit(5).where(
            "text LIKE '%the %'"
        ).count()
        assert out == want
        with pytest.raises(ValueError, match="column 'nope' not found"):
            fb_sql(
                spark,
                "SELECT * FROM fb_like_search(tvf_docs, nope, text, 'ab')",
            )

    def test_transitions_arity(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["events"].limit(5).createOrReplaceTempView("tvf_ev2")
        with pytest.raises(ValueError, match=r"formal parameters \(5\)"):
            fb_sql(
                spark,
                "SELECT * FROM fb_transitions(tvf_ev2, user_id, "
                "event_type, ts)",
            )

    def test_fuzzy_join_errors(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["customer"].limit(5).createOrReplaceTempView("tvf_cust")
        with pytest.raises(ValueError, match="positive integer literal"):
            fb_sql(
                spark,
                "SELECT * FROM fb_fuzzy_join(tvf_cust, c_custkey, "
                "c_name, 0)",
            )

    def test_hll_door_small(self, spark, tables):
        from featurebase_spark.sql import fb_sql

        tables["events"].limit(50).createOrReplaceTempView("tvf_ev3")
        row = fb_sql(
            spark,
            "SELECT * FROM fb_hll(tvf_ev3, user_id, 8)",
        ).collect()[0]
        assert row["m"] == 256
        assert row["used_registers"] + row["zero_registers"] == 256

    def test_keyword_search_door_errors(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["documents"].limit(5).createOrReplaceTempView("tvf_docs2")
        with pytest.raises(ValueError, match="at least one search term"):
            fb_sql(
                spark,
                "SELECT * FROM fb_keyword_search(tvf_docs2, doc_id, text, "
                "' , ', 5)",
            )
        with pytest.raises(ValueError, match="positive integer literal"):
            fb_sql(
                spark,
                "SELECT * FROM fb_keyword_search(tvf_docs2, doc_id, text, "
                "'a,b', 0)",
            )


class TestRound9Tvfs:
    """fb_cms / fb_pmi / fb_session_overlap / fb_winnow doors:
    compile-error surface (end-to-end results are oracle-gated via the
    *_text_door keys)."""

    def test_cms_door_errors_and_shape(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["events"].limit(50).createOrReplaceTempView("tvf_ev9")
        with pytest.raises(ValueError, match="positive integer literal"):
            fb_sql(spark, "SELECT * FROM fb_cms(tvf_ev9, user_id, 0, 64, 5)")
        with pytest.raises(ValueError, match="column 'nope' not found"):
            fb_sql(spark, "SELECT * FROM fb_cms(tvf_ev9, nope, 4, 64, 5)")
        rows = fb_sql(
            spark, "SELECT * FROM fb_cms(tvf_ev9, user_id, 4, 4096, 5)"
        ).collect()
        assert 0 < len(rows) <= 5
        # wide sketch on 50 rows: min-cell estimate == exact count
        assert all(r["cms_est"] >= r["true_cnt"] for r in rows)

    def test_pmi_door_arity(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["documents"].limit(5).createOrReplaceTempView("tvf_docs9")
        with pytest.raises(ValueError, match=r"formal parameters \(4\)"):
            fb_sql(spark, "SELECT * FROM fb_pmi(tvf_docs9, text, 5)")

    def test_session_overlap_door_errors(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["events"].limit(5).createOrReplaceTempView("tvf_ev10")
        with pytest.raises(ValueError, match="positive integer literal"):
            fb_sql(
                spark,
                "SELECT * FROM fb_session_overlap(tvf_ev10, user_id, ts, x)",
            )

    def test_winnow_door_errors(self, spark, tables):
        import pytest

        from featurebase_spark.sql import fb_sql

        tables["documents"].limit(5).createOrReplaceTempView("tvf_docs10")
        with pytest.raises(ValueError, match="positive integer literal"):
            fb_sql(
                spark,
                "SELECT * FROM fb_winnow(tvf_docs10, text, doc_id, 0)",
            )


def test_empty_parens_function_call_vs_where(spark):
    """Zero-arg window calls (ROW_NUMBER()) pass through the rewriter;
    the reference's `where ()` compile error is preserved
    (defs_sql1.go:434-437)."""
    import pytest

    from featurebase_spark.sql import fb_sql

    spark.createDataFrame(
        [(1, 5), (2, 3)], "_id LONG, v LONG"
    ).createOrReplaceTempView("winext_t")
    rows = fb_sql(
        spark,
        "select _id, ROW_NUMBER() OVER (ORDER BY v DESC, _id) as rk "
        "from winext_t order by _id",
    ).collect()
    assert [(r["_id"], r["rk"]) for r in rows] == [(1, 1), (2, 2)]
    with pytest.raises(ValueError, match="expected expression"):
        fb_sql(spark, "select _id from winext_t where ();")
    with pytest.raises(ValueError, match="expected expression"):
        fb_sql(spark, "select _id from winext_t where v > 1 and ();")
