"""Parquet sources for the driver's fixture tables (SURVEY §2.1 S6).

One parquet file per table under ``{sf_dir}/{name}.parquet``. All loads
are plain ``spark.read.parquet`` so Catalyst gets the native vectorized
reader, predicate pushdown, and column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects (PARQUET_TYPE_ILLEGAL) unless nanosAsLong is set. The
        # conf is runtime-settable, so set it here rather than relying on
        # the session factory — load_table must work in ANY SparkSession
        # (the correctness harness builds its own vanilla session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts surfaces as long (ns since epoch); truncate to µs exactly as
        # DuckDB does so the oracle sees identical values.
        from pyspark.sql import functions as F

        # integer division: ns values (~1.7e18) overflow double precision
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def scatter(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to engine parallelism. Two jobs in one:

    1. Small single-file inputs arrive as ONE partition; per-row
       expensive stages (UDFs, sketch expressions) would run on one
       core. At cluster scale the scan has many splits and this is a
       no-op cost-wise; on small files it is the difference between 1
       and ``defaultParallelism`` concurrent tasks.
    2. The exchange is an optimizer barrier: Catalyst's CollapseProject
       re-inlines aliased columns into downstream higher-order-function
       lambdas, re-evaluating the alias PER lambda reference (measured
       10×+ on minhash/bigram sketches). A projection computed *before*
       the shuffle is physically materialized, so downstream lambdas
       read an attribute instead of recomputing an expression.
    """
    spark = df.sparkSession
    return df.repartition(partitions or spark.sparkContext.defaultParallelism)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` — the
    co-located-join layout: two tables bucketed the same way join
    bucket-to-bucket with NO exchange on either side (asserted in
    tests/test_scale_ops.py). At 100 TB this converts every recurring
    join/agg on the key from a full shuffle into a local merge —
    bucketing is amortized once at write time."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def roundtrip(
    df: DataFrame,
    path: str,
    fmt: str,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Write ``df`` in ``fmt`` (csv/json/orc/parquet) and read it back
    with the SAME explicit schema — never inferSchema, which costs a
    full extra pass and can silently widen types. Text formats get a
    pinned timestampFormat so the value roundtrip is exact."""
    opts = {"timestampFormat": timestamp_format}
    if fmt == "csv":
        opts["header"] = "true"
    df.write.options(**opts).mode("overwrite").format(fmt).save(path)
    return (
        df.sparkSession.read.options(**opts).schema(df.schema).format(fmt).load(path)
    )
