"""Pure-function tests for bench.py's noise-calibration layer (VERDICT
r4 #2): factor math, the cross-session reference's version guard, and
min-ever merging. No SparkSession needed."""

from __future__ import annotations

import json

import bench


def _pt(at, jvm, np_, py):
    return {"at": at, "jvm_shuffle_s": jvm, "numpy_st_s": np_, "py_udf_s": py}


def test_annotate_noise_factors_against_session_best():
    pts = [_pt("start", 1.0, 0.2, 2.0), _pt("end", 2.6, 0.2, 2.0)]
    base = bench.annotate_noise(pts, None)
    assert base == {"jvm_shuffle_s": 1.0, "numpy_st_s": 0.2, "py_udf_s": 2.0,
                    "cross_session": False}
    assert pts[0]["factor"] == 1.0
    # factor is the max over the probe components
    assert pts[1]["factor"] == 2.6


def test_annotate_noise_python_worker_component_flags_alone():
    # the round-5 failure mode: JVM and single-core probes quiet while
    # the python-worker path is degraded — the factor must still flag
    pts = [_pt("start", 1.0, 0.2, 2.0), _pt("end", 1.1, 0.21, 7.0)]
    bench.annotate_noise(pts, None)
    assert pts[1]["factor"] == 3.5


def test_annotate_noise_uses_cross_session_reference():
    # every probe in this session is slow; session-relative factors would
    # self-normalize to 1.0 — the cross-session min must flag them
    pts = [_pt("start", 3.0, 0.6, 6.0), _pt("end", 3.1, 0.61, 6.1)]
    ref = {"jvm_shuffle_s": 1.0, "numpy_st_s": 0.2, "py_udf_s": 2.0,
           "n_sessions": 3}
    base = bench.annotate_noise(pts, ref)
    assert base["cross_session"] is True
    assert base["jvm_shuffle_s"] == 1.0
    assert pts[0]["factor"] == 3.0
    assert pts[1]["factor"] == 3.1


def test_cal_ref_version_guard_and_min_merge(tmp_path, monkeypatch):
    path = tmp_path / "BENCH_CALIBRATION_REF.json"
    monkeypatch.setattr(bench, "_CAL_REF_PATH", str(path))

    # stale entries from older probe definitions (the retired BLAS
    # matmul, or pre-py_udf probes) must be rejected...
    path.write_text(json.dumps({
        "8": {"jvm_shuffle_s": 1.5, "numpy_matmul_s": 0.36, "n_sessions": 1},
        "16": {"jvm_shuffle_s": 1.2, "numpy_st_s": 0.2, "n_sessions": 2},
    }))
    assert bench.load_cal_ref(8) is None
    assert bench.load_cal_ref(16) is None
    assert bench.load_cal_ref(32) is None  # absent cpu count

    # ...but constants for identical probe work survive the merge
    bench.update_cal_ref(8, {"jvm_shuffle_s": 2.0, "numpy_st_s": 0.25,
                             "py_udf_s": 3.0})
    ref = bench.load_cal_ref(8)
    assert ref == {"jvm_shuffle_s": 1.5, "numpy_st_s": 0.25, "py_udf_s": 3.0,
                   "n_sessions": 2}

    # min-ever: a later slower session cannot raise the constants
    bench.update_cal_ref(8, {"jvm_shuffle_s": 9.0, "numpy_st_s": 9.0,
                             "py_udf_s": 9.0})
    ref = bench.load_cal_ref(8)
    assert ref["jvm_shuffle_s"] == 1.5
    assert ref["numpy_st_s"] == 0.25
    assert ref["py_udf_s"] == 3.0
    assert ref["n_sessions"] == 3

    # corrupt file degrades to "no reference", never a crash
    path.write_text("{not json")
    assert bench.load_cal_ref(8) is None
