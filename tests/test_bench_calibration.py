"""Pure-function tests for bench.py's noise-calibration layer (VERDICT
r4 #2): factor math, the cross-session reference's version guard, and
min-ever merging. No SparkSession needed."""

from __future__ import annotations

import json

import bench


def test_annotate_noise_factors_against_session_best():
    pts = [
        {"at": "start", "jvm_shuffle_s": 1.0, "numpy_st_s": 0.2},
        {"at": "end", "jvm_shuffle_s": 2.6, "numpy_st_s": 0.2},
    ]
    base = bench.annotate_noise(pts, None)
    assert base == {"jvm_shuffle_s": 1.0, "numpy_st_s": 0.2,
                    "cross_session": False}
    assert pts[0]["factor"] == 1.0
    # factor is the max over the two probe components
    assert pts[1]["factor"] == 2.6


def test_annotate_noise_uses_cross_session_reference():
    # every probe in this session is slow; session-relative factors would
    # self-normalize to 1.0 — the cross-session min must flag them
    pts = [
        {"at": "start", "jvm_shuffle_s": 3.0, "numpy_st_s": 0.6},
        {"at": "end", "jvm_shuffle_s": 3.1, "numpy_st_s": 0.61},
    ]
    ref = {"jvm_shuffle_s": 1.0, "numpy_st_s": 0.2, "n_sessions": 3}
    base = bench.annotate_noise(pts, ref)
    assert base["cross_session"] is True
    assert base["jvm_shuffle_s"] == 1.0
    assert pts[0]["factor"] == 3.0
    assert pts[1]["factor"] == 3.1


def test_cal_ref_version_guard_and_min_merge(tmp_path, monkeypatch):
    path = tmp_path / "BENCH_CALIBRATION_REF.json"
    monkeypatch.setattr(bench, "_CAL_REF_PATH", str(path))

    # stale entry from the retired probe definition must be rejected...
    path.write_text(json.dumps({"8": {"jvm_shuffle_s": 1.5,
                                      "numpy_matmul_s": 0.36,
                                      "n_sessions": 1}}))
    assert bench.load_cal_ref(8) is None
    assert bench.load_cal_ref(32) is None  # absent cpu count

    # ...but its jvm constant (identical probe work) survives the merge
    bench.update_cal_ref(8, best_jvm=2.0, best_np=0.25)
    ref = bench.load_cal_ref(8)
    assert ref == {"jvm_shuffle_s": 1.5, "numpy_st_s": 0.25, "n_sessions": 2}

    # min-ever: a later slower session cannot raise the constants
    bench.update_cal_ref(8, best_jvm=9.0, best_np=9.0)
    ref = bench.load_cal_ref(8)
    assert ref["jvm_shuffle_s"] == 1.5
    assert ref["numpy_st_s"] == 0.25
    assert ref["n_sessions"] == 3

    # corrupt file degrades to "no reference", never a crash
    path.write_text("{not json")
    assert bench.load_cal_ref(8) is None
