"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]`` but every config here is chosen for the
1000-executor / 100 TB target and is equally valid there:

- AQE on (runtime coalescing, skew-join splitting, dynamic join selection).
- Arrow enabled for the (rare) Pandas-UDF paths.
- Broadcast threshold raised: TPC-H dims (region/nation/supplier/part at
  analytic scale-factors) should broadcast instead of shuffling the fact side.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F


def get_spark(
    app_name: str = "moisturizer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry points serve tests, bench, and a real cluster (where the
    driver would pass ``master=None`` and let spark-submit decide).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Rule of thumb: ~2-3x cores locally. On a real cluster this is
        # superseded by AQE coalescing from a higher initial value.
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Inject bloom-filter runtime filters on shuffle joins whose
        # creation side carries a selective filter: at the 100 TB target
        # the probe side skips shuffling rows that cannot join. The
        # default 10 GB application-side threshold keeps it dormant at
        # local test scale (plans stay stable); tests/test_plans.py pins
        # the activation behavior with the threshold lowered. Measured
        # local cost of the dormant rule: ~5% per query (within-session
        # alternating A/B, NOTES_r05.md) — accepted as the price of
        # shipping the scale-correct config unchanged.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``moisturizer_spark`` importable on executors.

    Pandas-UDF closures (ingest profiling/validation) reference this
    package; on a real cluster the driver's checkout is not on the
    executors' PYTHONPATH, so we ship the package as a zip via
    ``addPyFile`` — the standard deployment path for Python deps.
    Idempotent per session.
    """
    if getattr(spark, "_moisturizer_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"moisturizer_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for name in files:
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._moisturizer_shipped = True


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the harness parquet tables and register temp views.

    Returns ``{name: DataFrame}``. Registering views lets both the
    DataFrame API and ``spark.sql`` reference the same scans, with
    predicate pushdown / column pruning intact (views are logical only).
    """
    default_names = (
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
    # Older harness data generations stored events.ts as TIMESTAMP(NANOS),
    # which Spark's parquet reader rejects; read nanos as raw int64 and
    # truncate to microseconds — identical to DuckDB's TIMESTAMP_NS →
    # TIMESTAMP truncation, so the oracle agrees bit-for-bit. (Current
    # generations store tz-less µs timestamps, read natively as
    # TIMESTAMP_NTZ — the bigint branch below simply never triggers.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The caller may hand us a session without engine defaults (the driver
    # harness does); timestamps must collect as UTC wall-clock to match the
    # oracle's naive timestamps, whatever the host TZ is.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for name in names or default_names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            for field in df.schema.fields:
                if field.name == "ts" and field.dataType.simpleString() == "bigint":
                    df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
