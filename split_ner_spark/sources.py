"""Source/sink layer: Iceberg when available, atomic parquet otherwise.

The target deployment (BASELINE.json north_star) stores the corpus and
every stage table in Iceberg: snapshot commits give resumability, WAP
(write-audit-publish) gives atomic stage publication, and partition
transforms (``days(warc_ts)``, bucketed url-hash) give pruning. This
container ships no Iceberg runtime jar (vendoring re-attempted
2026-08-17: pip has no iceberg-spark-runtime distribution and Maven
Central does not resolve — no network), so the layer probes for the
catalog and falls back to the atomic-parquet committer
(pipeline.StageCommitter) which reproduces the same semantics:

  Iceberg concept            parquet fallback (pipeline.py)
  -------------------        --------------------------------
  snapshot commit            write tmp dir + atomic os.rename
  snapshot id / manifest     _COMMIT.<stage>.json manifest
  manifest row counts        parquet footer counts (_lineage.jsonl)
  resume from snapshot       skip stages with a commit marker
  partition transform        .write.partitionBy(...)

Everything here is the standard public Iceberg-Spark API — no custom
catalog code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is usable in this session."""
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def configure_iceberg(builder, warehouse: str):
    """SparkSession.Builder config for a hadoop-catalog Iceberg warehouse
    (applied only when the runtime jar is present)."""
    return (
        builder.config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.kg", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.kg.type", "hadoop")
        .config("spark.sql.catalog.kg.warehouse", warehouse)
    )


def write_table(
    df: DataFrame,
    name: str,
    workdir: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Commit ``df`` as table ``name``: Iceberg append when available,
    else the atomic-parquet committer. Returns the committed table."""
    spark = df.sparkSession
    if iceberg_available(spark):  # pragma: no cover - no jar in container
        full = f"kg.db.{name}"
        writer = df.writeTo(full)
        if partition_cols:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
        writer.createOrReplace()
        return spark.read.table(full)
    from .pipeline import StageCommitter

    return StageCommitter(workdir).write(df, name, partition_cols)


def read_table(spark: SparkSession, name: str, workdir: str) -> DataFrame:
    if iceberg_available(spark):  # pragma: no cover
        return spark.read.table(f"kg.db.{name}")
    from .pipeline import StageCommitter

    return StageCommitter(workdir).read(spark, name)
