"""bench.py calibration unit guards: factor derivation (min-of-probes,
clamping band) and the stale-session reset the double-fallback path
relies on. No Spark session needed — these are the pure pieces."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and bench)


def test_calib_factor_uses_min_probe():
    # a storm spanning most probes must not inflate the factor: only the
    # calmest observation counts
    f = bench._calib_factor([43.25, 0.6334, 1.8735, bench.CALIB_REF_SEC])
    assert f == 1.0


def test_calib_factor_clamps_to_band():
    lo, hi = bench.CALIB_FACTOR_BAND
    assert bench._calib_factor([1e9]) == hi
    assert bench._calib_factor([1e-9]) == lo


def test_calib_reference_is_committed_derivation():
    """CALIB_REF_SEC must match the committed derivation receipt — the
    units of every bench_best.json minimum depend on it; changing one
    without the other silently re-denominates the receipts."""
    import json

    receipt = json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "measurements", "calib_probe_r08.json")))
    assert abs(bench.CALIB_REF_SEC - receipt["calib_ref_sec"]) < 1e-9


def test_clear_stopped_session_state_noop_without_spark():
    # must never raise, with or without pyspark singletons populated;
    # the process-global singletons are SAVED AND RESTORED so this test
    # cannot clobber a live session-scoped Spark fixture elsewhere in
    # the suite
    from pyspark.sql import SparkSession

    saved_inst = getattr(SparkSession, "_instantiatedSession", None)
    saved_active = getattr(SparkSession, "_activeSession", None)
    try:
        bench._clear_stopped_session_state()

        # simulate a stale stopped session object (sc._jsc is None)
        class _FakeSC:
            _jsc = None

        class _FakeSess:
            _sc = _FakeSC()

        SparkSession._instantiatedSession = _FakeSess()
        bench._clear_stopped_session_state()
        assert SparkSession._instantiatedSession is None
    finally:
        SparkSession._instantiatedSession = saved_inst
        SparkSession._activeSession = saved_active
