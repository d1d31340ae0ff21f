"""SparkSession builder + test-data table loading.

Scale posture: these defaults are tuned so the same code runs on
``local[32]`` for tests and on a 1000-executor cluster unchanged —
AQE handles runtime re-planning (partition coalescing, skew joins),
shuffle partitions default high enough to not bottleneck, and Arrow
is enabled for the few Pandas-UDF paths (multimodal / minhash).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The driver-provided star schema + pipeline tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in joins at any SF
#: (queries wrap these in F.broadcast explicitly; kept here as the
#: canonical list for new query authors).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "featurebase-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime partition coalescing + skew-join handling replaces the
      reference's static shard fan-out (reference executor.go:6449 mapReduce).
    - Arrow on: Pandas-UDF paths (minhash, multimodal) use Arrow batches.
    - shuffle.partitions: env-tunable; on a real cluster set ~2-3x total cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in load_tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # DuckDB timestamps are UTC-naive; pin the session TZ so oracle
        # comparisons and date functions agree.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the parquet test tables and (optionally) register temp views.

    Views let the SQL surface (``spark.sql``) address the same tables the
    DataFrame/PQL surfaces use — mirroring the reference where SQL and PQL
    share one schema (reference sql3/planner/executionplanner.go:137).
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    cache_key = (id(spark), sf_dir, register_views)
    cached = _TABLE_CACHE.get(cache_key)
    if cached is not None:
        return dict(cached)

    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        # TIMESTAMP(NANOS) columns arrive as long (nanosAsLong); convert to
        # TimestampType truncated to micros — the same truncation DuckDB
        # applies, so oracle comparisons line up exactly.
        schema_path = path
        if os.path.isdir(path):
            # Spark-written parquet is a DIRECTORY of part files (the
            # synthetic scaling slices are); any part carries the schema
            parts = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            if parts:
                schema_path = os.path.join(path, parts[0])
        arrow_schema = pq.read_schema(schema_path)
        for fld in arrow_schema:
            if str(fld.type) == "timestamp[ns]":
                df = df.withColumn(
                    fld.name,
                    F.timestamp_micros(
                        F.floor(F.col(fld.name) / F.lit(1000)).cast("long")
                    ),
                )
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    _TABLE_CACHE[cache_key] = dict(out)
    return out


#: (session id, sf_dir, register_views) → loaded DataFrames. DataFrames are
#: lazy plans, so caching them skips repeated parquet-footer/pyarrow schema
#: work when many queries run in one session (bench, driver correctness run).
_TABLE_CACHE: dict[tuple, dict[str, DataFrame]] = {}
