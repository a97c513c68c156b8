"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
config block is what we would ship to a real cluster via
``spark-submit --py-files`` (see scripts/run_pipeline.py) — only ``master``
and the memory knobs change.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime partition coalescing + skew-join splitting.
- shuffle.partitions is a *starting* value; AQE coalesces. On a real
  cluster this would be ~2-3x total cores.
- Arrow enabled for every pandas UDF boundary; maxRecordsPerBatch bounds
  the memory of the model-forward UDF batches (SURVEY §4 "pad-to-batch-max").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "split-ner-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    if driver_mem is None:
        driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    # shuffle/spill files on tmpfs: the box's virtual disk writes ~250MB/s
    # (measured), which serializes multi-GB shuffles and caps scaling at
    # ~8 threads; /dev/shm sustains ~850MB/s. Real clusters put
    # spark.local.dir on local NVMe for exactly this reason.
    # CAVEAT: tmpfs spill consumes RAM, and a shuffle larger than the shm
    # mount fails with no-space errors that won't reproduce elsewhere — so
    # the default only engages when /dev/shm has ≥8 GiB free; set
    # SPARK_GRAFT_LOCAL_DIR to override either way.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            shm_free = st.f_bavail * st.f_frsize
        except OSError:
            shm_free = 0
        if shm_free >= 8 * 1024**3:
            local_dir = "/dev/shm/spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # round-6 note: raising adaptive.coalescePartitions.initialPartitionNum
        # to 4x cores was tried and REVERTED — it reproducibly doubled the
        # cached-intermediate dedup queries (AQE coalesces the small
        # upstream aggregations differently, starving downstream probes)
        # while the 20M-page pipeline delta stayed inside hypervisor
        # noise. Shuffle width therefore stays at the configured
        # shuffle_partitions with AQE coalescing below it.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
