"""Differential-oracle fuzzing gate (round-4 verdict item 5): >=25 random
(data, family, parameter) settings must agree between the parameterized
Spark queries and their parameterized DuckDB twins on freshly generated
edge-case corpora. The seed is fixed for reproducibility; run
``python scripts/fuzz_oracle.py --n 100 --seed <s>`` for wider sweeps.

This gate has already paid for itself: it found (and the round-4 commits
fixed) empty-doc shingle semantics, empty-doc scheme-rewrite row drops,
unicode-capitalization divergence in the detect surrogate, and the
pipeline twin's missing punctuation re-tokenization.
"""

from __future__ import annotations

import pytest

from scripts.fuzz_oracle import FAMILIES, coverage_of, fuzz

N_SETTINGS = 25
SEED = 20260817


@pytest.mark.fuzz
@pytest.mark.slow
def test_fuzz_oracle_25_settings(spark, tmp_path):
    failures, settings = fuzz(spark, N_SETTINGS, SEED, tmp_root=str(tmp_path),
                              verbose=False)
    assert not failures, "\n".join(
        f"{label}: {err}  repro={s}" for label, s, err in failures
    )
    # the coverage report must account for every drawn setting and list
    # every family (0-draw families visible, not silently absent)
    cov = coverage_of(settings)
    assert sum(c["n"] for c in cov.values()) == N_SETTINGS
    assert set(cov) >= set(FAMILIES)
