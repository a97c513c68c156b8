"""D1 — deterministic sampling / split operators.

Reference semantics (/root/reference/splitner/utils/general.py:210-310):
- ``make_shorter_dataset``: ratio sample with a fixed seed (:210-230);
- ``make_k_partition_dataset``: shuffle + chunk into k folds (:233-260);
- ``make_k_shot_dataset``: greedy per-tag k-shot cover — walk sentences,
  keep one if any of its tags still needs examples (:263-310).

The rebuild replaces RNG-state-dependent shuffles with **hash-bucket
determinism**: every decision is a pure function of the row key (md5), so
results are identical under any partitioning, any parallelism, retries,
and across engines (md5 is bit-identical in Spark and DuckDB → every
operator here has an exact SQL oracle twin). That is the only sampling
discipline that survives 10^12 rows: no RNG state, no driver pass, no
order dependence.

The k-shot operator is deliberately the *distributed reformulation*: the
reference's greedy walk is order-sequential (sentence i's acceptance
depends on all previous acceptances), which cannot scale; the rebuild
takes, per tag, the k lowest-hash examples (a deterministic "first k per
tag" under a fixed pseudo-random order) — the union is a small cover with
≥k examples per present tag, the same contract the greedy walk satisfies.

All Catalyst-native: window row_number / pmod(conv(md5)) — no UDFs, one
shuffle per operator (the partitionBy/groupBy on the stratum key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_order(key: Column) -> Column:
    """Deterministic pseudo-random sort key: md5 of the row key."""
    return F.md5(key.cast("string"))


def stratified_sample(
    df: DataFrame, strata_cols: list[str], key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample.

    Rank rows within each stratum by md5(key) and keep the first n — a
    reproducible stratified sample (reference's seeded ratio sample,
    general.py:210-230, generalized to per-stratum exact counts). One
    window shuffle on the strata key; at heavy skew the strata key is the
    partition key, so AQE's skew handling applies."""
    w = Window.partitionBy(*strata_cols).orderBy(_hash_order(F.col(key_col)))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def k_shot_cover(
    tagged: DataFrame, tag_col: str, key_col: str, k: int
) -> DataFrame:
    """Per-tag k-shot cover: for every tag, the k examples with the lowest
    md5(key) (deterministic pseudo-random order). Returns
    (tag, key, shot_rank). A key selected for several tags appears once
    per tag — the distinct union of keys is the cover set.

    Distributed reformulation of make_k_shot_dataset (general.py:263-310):
    the greedy sequential walk is replaced by per-tag top-k under a fixed
    hash order, which preserves the contract (≥k examples per present
    tag, deterministic) and runs as one window shuffle."""
    w = Window.partitionBy(tag_col).orderBy(
        _hash_order(F.col(key_col)), F.col(key_col)
    )
    return (
        tagged.select(tag_col, key_col)
        .distinct()
        .withColumn("shot_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("shot_rank") <= k)
    )


def k_partition_split(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Assign each row a deterministic fold in [0, k): hash-bucket version
    of shuffle+chunk (general.py:233-260). fold = first-8-hex-chars of
    md5(key) mod k — uniform, seedless, stable under retries."""
    fold = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(k),
    ).cast("int")
    return df.withColumn("fold", fold)
