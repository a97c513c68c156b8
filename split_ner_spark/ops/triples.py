"""G1 — triple materialization with hot-subject salting.

From linked typed mentions, emit the (subj, pred, obj) relation:
- ``typed_as(entity, type)``
- ``mentioned_in(entity, url)``
- ``co_mentioned_with(a, b)`` for distinct entity pairs in one sentence
  (a < b, deduplicated)

Skew: the corpus plants Zipf-skewed entities (the hottest subject is in
~10% of pages — corpus.py), so a naive ``repartition(subj)`` would put a
tenth of the output through one task. The writer therefore detects heavy
hitters from a small deterministic sample and spreads ONLY those across
``n_salts`` salt buckets (salt = deterministic hash of the full triple):
cold keys keep locality, hot keys parallelize. AQE handles join-side skew;
this handles write/partition-side skew, which AQE does not (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# Degenerate-sentence cap for co-occurrence pair expansion. Shared single
# source of truth: the SQL oracle twins in queries.py interpolate THIS
# constant into their `rk <= N` window filters, so a cap change cannot
# silently break Spark/DuckDB equivalence (ADVICE r4).
MAX_COOCCUR_ENTITIES = 1024


def cooccurrence_pairs(
    linked: DataFrame,
    max_entities: int = MAX_COOCCUR_ENTITIES,
    observation: Observation | None = None,
) -> DataFrame:
    """Distinct canonical-id pairs co-mentioned in one sentence (a < b).

    ONE ``collect_set`` groupBy per sentence, pairs expanded inside the
    row with array functions — no self-join. The old formulation
    (distinct ⋈ distinct on (url, sent_id)) shuffled the mention frame
    three times (two distincts + the join); this shuffles it once, and
    the per-row pair expansion is bounded by sentence entity counts
    (≤ tens), so the plan is strictly better at any scale. Semantics
    identical: sets are deduplicated per sentence, pairs ordered a < b
    via the sorted array (earlier index < later index).

    ``max_entities`` bounds the degenerate case AQE cannot: skew-split
    applies to joins, not to a single aggregate KEY, so one pathological
    "sentence" (a period-less link farm / table dump page) with k
    distinct entities builds a k²/2-element array in ONE task — measured
    on this VM: k=5000 turns a 2.7s pass into 101.8s (PLANS.md round 4).
    Sentences beyond the cap contribute pairs only among their
    lexicographically-first ``max_entities`` canonical ids
    (deterministic; ≈ 524k pairs — the k≤1024 shape measures in normal
    task time). Real sentences have tens of entities; the cap exists
    only to keep a degenerate page from stalling a 100 TB job. The SQL
    oracle twins mirror the same cap (via ``MAX_COOCCUR_ENTITIES``).

    ``observation``: optionally pass a :class:`pyspark.sql.Observation`;
    it records ``n_capped_sentences`` (sentences whose distinct-entity
    count exceeded the cap — the silent coverage bound, now counted) and
    ``n_sentences`` alongside the first action, at zero extra job cost
    (CollectMetrics rides the existing aggregate; no second pass)."""
    sets = linked.groupBy("url", "sent_id").agg(
        F.array_sort(F.collect_set("canonical_id")).alias("_all")
    )
    sets = sets.select(
        "url",
        "sent_id",
        F.slice("_all", 1, max_entities).alias("_cs"),
        (F.size("_all") > max_entities).alias("_capped"),
    )
    if observation is not None:
        sets = sets.observe(
            observation,
            F.sum(F.col("_capped").cast("long")).alias("n_capped_sentences"),
            F.count(F.lit(1)).alias("n_sentences"),
        )
    sets = sets.filter(F.size("_cs") >= 2)
    pairs = F.flatten(
        F.transform(
            F.col("_cs"),
            lambda x, i: F.transform(
                F.slice(F.col("_cs"), i + 2, F.size("_cs")),
                lambda y: F.struct(x.alias("subj"), y.alias("obj")),
            ),
        )
    )
    return sets.select(F.explode(pairs).alias("p")).select(
        F.col("p.subj").alias("subj"),
        F.lit("co_mentioned_with").alias("pred"),
        F.col("p.obj").alias("obj"),
    )  # global dedup happens in make_triples' single union-level distinct


def make_triples(
    linked: DataFrame, observation: Observation | None = None
) -> DataFrame:
    """linked mentions(url, sent_id, ..., entity_type, canonical_id) →
    triples(subj, pred, obj). ``observation`` is threaded to
    :func:`cooccurrence_pairs` to count cap-exceeding sentences."""
    # The three predicates ride through the union-level distinct as a
    # 1-byte code instead of their string names (round 6, guide §2.3
    # "narrower types"): the distinct shuffles |mentions|*2 + |pairs|
    # rows, and the constant 8-17 char pred string was ~15% of every
    # shuffled row; the code is bijective with the name, so the distinct
    # set is unchanged, and the name is re-attached AFTER the aggregate
    # (measured ~30% off the make_triples wall at 8.3M mentions).
    typed = linked.filter(F.col("entity_type").isNotNull()).select(
        F.col("canonical_id").alias("subj"),
        F.lit(0).cast("tinyint").alias("_p"),
        F.col("entity_type").alias("obj"),
    )
    mentioned = linked.select(
        F.col("canonical_id").alias("subj"),
        F.lit(1).cast("tinyint").alias("_p"),
        F.col("url").alias("obj"),
    )
    cooccur = cooccurrence_pairs(linked, observation=observation).select(
        "subj", F.lit(2).cast("tinyint").alias("_p"), "obj"
    )
    # one distinct over the union instead of one per branch: the branches
    # are disjoint by pred, so semantics are identical, but it is a single
    # shuffle instead of three (the co-occurrence branch keeps its inner
    # per-sentence dedup to bound the self-join fan-out).
    pred_names = F.array(
        F.lit("typed_as"), F.lit("mentioned_in"), F.lit("co_mentioned_with")
    )
    return (
        typed.unionByName(mentioned)
        .unionByName(cooccur)
        .distinct()
        .select(
            "subj",
            F.element_at(pred_names, F.col("_p") + 1).alias("pred"),
            "obj",
        )
    )


def salted_by_subject(
    triples: DataFrame,
    n_partitions: int = 64,
    n_salts: int = 16,
    hot_fraction: float = 0.01,
    sample_fraction: float = 0.05,
    hot_subjects: list | None = None,
    seed: int = 42,
    detect_on: DataFrame | None = None,
    detect_col: str = "subj",
) -> DataFrame:
    """Repartition triples by (subj, salt) where salt spreads heavy
    subjects across ``n_salts`` buckets; cold subjects keep one bucket.

    Hot-set detection runs over a ``sample_fraction`` sample, not an
    exact full-data count agg: a subject holding > ``hot_fraction`` of
    all triples is (by definition) massively represented in any sample,
    so a 5% sample finds it with near-certainty while costing 1/20th of
    the shuffled bytes — this is the detection cost that used to be the
    largest single item of the pipeline's fixed (non-data-proportional)
    wall. The sampled per-subject counts are collected driver-side
    (bounded: at most ~1/hot_fraction subjects can exceed the threshold,
    capped harder below) and the salt decision becomes a broadcast-free
    ``isin`` literal — no join, no cached frame survives the call.

    ``hot_subjects``: pass an explicit list to skip detection entirely —
    a streaming caller reuses the prior epoch's hot set (hot subjects
    are stable across crawl epochs).

    ``detect_on``/``detect_col`` (round 6): run hot-key detection against
    a DIFFERENT (typically already-materialized) frame — the pipeline
    passes its cached ``linked`` mentions (col ``canonical_id``), whose
    per-key counts are a faithful proxy for per-subject triple counts
    (mentioned_in ∝ mentions, co-occurrence subjects are canonical ids).
    This lets the caller skip caching the triple set solely for the
    detection pass: the triples are then computed exactly once, inside
    the write job. Salting is a partitioning heuristic, so a proxy
    detection source changes no output values.

    Output VALUES are unchanged by any of this (salt is dropped);
    only the physical partitioning differs. Salt is a deterministic hash
    of the full triple, not a random()."""
    if hot_subjects is None:
        det_frame = triples if detect_on is None else detect_on
        det_col = "subj" if detect_on is None else detect_col
        # ≤ 1/hot_fraction subjects can each hold > hot_fraction of the
        # data; 4x headroom absorbs sample noise near the threshold
        cap = 4 * int(1.0 / hot_fraction) + 1

        def _detect(frac: float) -> tuple[int, list]:
            src = (
                det_frame.sample(fraction=frac, seed=seed)
                if frac < 1.0
                else det_frame
            )
            counts = (
                src.groupBy(det_col)
                .agg(F.count("*").alias("c"))
                .cache()  # eagerly released below — never escapes this call
            )
            try:
                total = counts.agg(F.sum("c")).collect()[0][0] or 0
                hot_rows = (
                    counts.filter(F.col("c") > hot_fraction * total)
                    .orderBy(F.desc("c"))
                    .limit(cap)
                    .collect()
                )
            finally:
                counts.unpersist()
            return total, [r[det_col] for r in hot_rows]

        total, hot_subjects = _detect(sample_fraction)
        # Small-input guard (ADVICE r4): a hot subject at hot_fraction of
        # the data is expected ~ total_rows*sample_fraction*hot_fraction
        # times in the sample; below ~1/(hot_fraction*sample_fraction)
        # rows that expectation drops under 1 and the sample can miss a
        # genuinely hot key (or be empty), silently disabling the salting
        # this function exists for on micro-batches / low-SF runs. The
        # threshold compares the SAMPLED total against the full-data
        # bound 1/(hot_fraction*sample_fraction) — deliberately ~20x more
        # conservative than the sampled-domain equivalent (ADVICE r5):
        # near the boundary the exact re-count costs one extra groupBy
        # over a few tens of thousands of rows, which is cheap insurance
        # against a missed hot key.
        if sample_fraction < 1.0 and total < 1.0 / (hot_fraction * sample_fraction):
            total, hot_subjects = _detect(1.0)
    if hot_subjects:
        salted = triples.withColumn(
            "salt",
            F.when(
                F.col("subj").isin(hot_subjects),
                F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
    else:
        salted = triples.withColumn("salt", F.lit(0))
    return salted.repartition(n_partitions, "subj", "salt").drop("salt")
