"""DataFrame-native MinHash-LSH for similarity joins and near-dup blocking.

Used by (a) fuzzy entity linking — mention surfaces that miss the alias
dictionary (SURVEY §2 G2) — and (b) document near-duplicate detection.
The reference's analog is the mention-clustering prototype
(/root/reference/splitner/utils/mention_clustering.py), which builds a
dense pairwise distance matrix; that is O(n²) and driver-bound, so the
rebuild replaces it with banded MinHash, the standard scalable design.

Everything is Catalyst expressions (no UDFs, no pyspark.ml dependency):

1. shingle: char n-grams of '^'+s+'$' (array<string>, distinct);
2. signature: sig[i] = min over shingles of xxhash64(shingle, i) — the
   "k independent hash functions" are the seeded xxhash64 family; computed
   as an array fold per row, zero shuffle;
3. banding: split the signature into b bands of r = k/b rows, hash each
   band, explode → (id, band_idx, band_hash);
4. candidates: equi-join on (band_idx, band_hash) — this is the ONLY
   shuffle, and it is an equi-join AQE can handle (skewed bands split);
5. verify: exact Jaccard on the shingle arrays, filter ≥ threshold.

ANSI-mode safe: no raw arithmetic that can overflow (xxhash64 seeds do the
mixing), no out-of-range element_at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_shingles_col(col: F.Column, n: int = 3) -> F.Column:
    """Distinct char n-grams of '^'+s+'$' (boundary-marked, so 1-2 char
    strings still produce at least one shingle)."""
    s = F.concat(F.lit("^"), col, F.lit("$"))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
            lambda i: F.substring(s, i, n),
        )
    )


def minhash_signature_col(shingles_col: F.Column, num_hashes: int = 32) -> F.Column:
    """sig[i] = min_{s in shingles} xxhash64(s, i); array<bigint> length k."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles_col, lambda s: F.xxhash64(s, i))
        ),
    )


def _band_rows(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    num_hashes: int,
    bands: int,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band_idx, band_hash) rows, optionally carrying ``keep`` columns
    through the explode (e.g. the shingle array, so a downstream verify
    join is unnecessary when one side is broadcastable)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_col(F.col(shingles_col), num_hashes)
    banded = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.xxhash64(
            F.concat_ws(
                ":",
                F.transform(
                    F.slice(sig, j * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            ),
            j,
        ),
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.posexplode(banded).alias("band_idx", "band_hash"),
    )


def jaccard_col(a: F.Column, b: F.Column) -> F.Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


def lsh_similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    shingles_col: str = "shingles",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Approximate similarity join: pairs with Jaccard ≥ threshold whose
    signatures collide in ≥1 band. Returns (left_id, right_id, jaccard).

    left/right must carry ``shingles_col``; ids must be distinct within
    each side. Threshold-vs-banding: with k=32, b=8 (r=4) the collision
    probability at j=0.5 is 1-(1-0.5^4)^8 ≈ 0.4; at j=0.7 ≈ 0.9 — tune
    (num_hashes, bands) to the operating point, or raise bands for recall.
    """
    lb = _band_rows(left, left_id, shingles_col, num_hashes, bands)
    rb = _band_rows(right, right_id, shingles_col, num_hashes, bands)
    cand = (
        lb.join(rb, ["band_idx", "band_hash"])
        .select(left_id, right_id)
        .distinct()
    )
    lsh = left.select(F.col(left_id), F.col(shingles_col).alias("_lsh_l"))
    rsh = right.select(F.col(right_id), F.col(shingles_col).alias("_lsh_r"))
    return (
        cand.join(lsh, left_id)
        .join(rsh, right_id)
        .withColumn("jaccard", jaccard_col(F.col("_lsh_l"), F.col("_lsh_r")))
        .filter(F.col("jaccard") >= threshold)
        .select(left_id, right_id, "jaccard")
    )


def lsh_self_join(
    df: DataFrame,
    id_col: str,
    shingles_col: str = "shingles",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs within one table: (a, b, jaccard), a < b."""
    a = df.select(F.col(id_col).alias("a"), F.col(shingles_col))
    b = df.select(F.col(id_col).alias("b"), F.col(shingles_col))
    return lsh_similarity_join(
        a, b, "a", "b", shingles_col, num_hashes, bands, threshold
    ).filter(F.col("a") < F.col("b"))
