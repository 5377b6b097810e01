"""SparkSession factory tuned for this engine.

Local mode is the sandbox stand-in for a multi-executor cluster: partition
counts, AQE, and Arrow settings are chosen so the same plans scale when
``master`` points at a real cluster.  The knobs mirror what the reference
hand-implements (50 ES shards -> shuffle partitions; best_compression ->
zstd parquet; bulk batching -> columnar writes).  Ref: search/search.py:53-57.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "oddb-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls local parallelism (``local[cpus]``); in a real deploy the
    master URL comes from spark-submit and this arg is ignored.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus

    # Python workers don't inherit the driver's sys.path; on a cluster the
    # package ships via ``spark-submit --py-files``.  Locally, export the repo
    # root on PYTHONPATH before the JVM forks workers so pandas UDFs resolve
    # `od_database_spark` regardless of the caller's cwd.
    # one Python worker per core is the parallelism unit — BLAS/OpenMP threads
    # inside numpy would oversubscribe (N workers × M BLAS threads) and
    # serialize the Arrow UDF stages on spin-waits
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("ODDB_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.maxPlanStringLength", "16384")
        # broadcast budget vs ESTIMATES: relation sizes are estimated from
        # zstd-parquet bytes (~6-20x smaller than in-memory), so the old
        # 64MB budget admitted multi-GB hashed relations (a 600k-row
        # shingle-set aggregate broadcast twice cost 4s+ per query at sf1.0
        # — measured r6).  8MB of estimated bytes keeps genuine dim tables
        # broadcasting while fat text/array relations take the shuffle
        # path; explicit F.broadcast hints (cutoffs, robots, probe keys)
        # bypass this and still fire.  Measured r6: sf1.0 suite 66.9s ->
        # 51.5s, sf0.1 plans unchanged.
        .config("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        # let a table bucketed on url_hash satisfy joins keyed on
        # (url_hash, url): subset co-partitioning keeps the bucketed side
        # shuffle-free (operators/seen_store.py); physical-plan-only knob
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(os.environ.get("ODDB_MASTER", f"local[{cpus}]"))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
