"""Drift checks: numpy stat kernels vs known values; profile-accept /
drifted-reject end-to-end (FIXTURES.md §3)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sjot_spark.engine import ValidationEngine
from sjot_spark.fixtures import SEQUENCE_SPEC, drifted_sequences, make_sequences
from sjot_spark.plan import stats

DRIFT_SPEC = {
    **SEQUENCE_SPEC,
    "@table": {
        "key": "doc_id",
        "partition_by": "source",
        "drift": {
            "len_hist": {"kind": "length_histogram", "column": "tokens",
                          "bucket_width": 64, "group_by": "source",
                          "test": "chi2", "alpha": 0.001},
            "id_hist": {"kind": "value_histogram", "column": "tokens",
                         "bucket_width": 1024, "group_by": None,
                         "test": "chi2", "alpha": 0.001},
            "len_ks": {"kind": "length_histogram", "column": "tokens",
                        "bucket_width": 64, "group_by": None,
                        "test": "ks", "alpha": 0.001},
        },
    },
}


# ------------------------------------------------------ stat kernels

def test_chi2_sf_known_values():
    # classic critical values
    assert stats.chi2_sf(3.841, 1) == pytest.approx(0.05, abs=2e-3)
    assert stats.chi2_sf(11.070, 5) == pytest.approx(0.05, abs=2e-3)
    assert stats.chi2_sf(0.0, 5) == 1.0
    assert stats.chi2_sf(100.0, 5) < 1e-15
    # continuity across the series/contfrac switch (x = a+1)
    a = 3.0
    lo = stats.gammainc_q(a, a + 1 - 1e-9)
    hi = stats.gammainc_q(a, a + 1 + 1e-9)
    assert lo == pytest.approx(hi, rel=1e-6)


def test_chi2_test_identical_and_shifted():
    obs = np.array([100, 200, 300, 400])
    stat, p, dof = stats.chi2_test(obs, obs * 5)  # same shape, scaled
    assert stat == pytest.approx(0.0) and p == 1.0
    stat, p, _ = stats.chi2_test(obs, obs[::-1])
    assert p < 1e-10


def test_ks_known_values():
    # Kolmogorov tail: Q(1.358) ~= 0.05
    assert stats.ks_tail(1.358) == pytest.approx(0.05, abs=2e-3)
    assert stats.ks_tail(0.0) == 1.0
    d, p = stats.ks_2samp_from_hist([10, 20, 30], [10, 20, 30])
    assert d == 0.0 and p == 1.0
    d, p = stats.ks_2samp_from_hist([1000, 0, 0], [0, 0, 1000])
    assert d == pytest.approx(1.0) and p < 1e-10


# ------------------------------------------------------- end to end

@pytest.fixture(scope="module")
def engine():
    return ValidationEngine(DRIFT_SPEC)


def test_uncorrupted_regeneration_accepts(spark, engine):
    base = engine.profile(make_sequences(spark, 4000, violations=False))
    # a DIFFERENT sample from the same distribution (different seed)
    cur = make_sequences(spark, 4000, seed=777, violations=False)
    results = engine.drift(cur, base)
    assert results, "no drift results produced"
    bad = [r for r in results if r["verdict"] != "pass"]
    assert not bad, bad


def test_length_drift_rejected(spark, engine):
    base = engine.profile(make_sequences(spark, 4000, violations=False))
    cur = drifted_sequences(spark, 4000, seed=777, kind="length")
    results = engine.drift(cur, base)
    by_check = {}
    for r in results:
        by_check.setdefault(r["check_id"], []).append(r)
    # +50% web length shift: len_hist must fail for web, pass elsewhere
    webs = [r for r in by_check["len_hist"] if r["group"] == "web"]
    assert webs and all(r["verdict"] == "fail" for r in webs)
    others = [r for r in by_check["len_hist"]
              if r["group"] in ("books", "code") ]
    assert others and all(r["verdict"] == "pass" for r in others)
    # global KS on lengths must also trip (web is 55% of rows)
    assert all(r["verdict"] == "fail" for r in by_check["len_ks"])


def test_tokenid_drift_rejected(spark, engine):
    base = engine.profile(make_sequences(spark, 2000, violations=False))
    cur = drifted_sequences(spark, 2000, seed=777, kind="ids")
    results = engine.drift(cur, base)
    ids = [r for r in results if r["check_id"] == "id_hist"]
    assert ids and all(r["verdict"] == "fail" for r in ids)
    # and the id histogram must NOT trip on a clean resample
    clean = make_sequences(spark, 2000, seed=888, violations=False)
    ids2 = [r for r in engine.drift(clean, base) if r["check_id"] == "id_hist"]
    assert ids2 and all(r["verdict"] == "pass" for r in ids2)


def test_column_stats_profile(spark):
    from sjot_spark.fixtures import make_sequences
    from sjot_spark.plan.stats_profile import column_stats

    df = make_sequences(spark, 500, violations=False)
    prof = {(r.column, r.stat): r.value for r in column_stats(df).collect()}
    assert prof[("_table", "n_rows")] == 500.0
    assert prof[("doc_id", "n_nulls")] == 0.0
    # HLL estimate within 10% of exact
    assert abs(prof[("doc_id", "approx_distinct")] - 500) <= 50
    assert prof[("n_tok", "min")] >= 1.0
    assert prof[("tokens", "max_size")] <= 8192.0
    assert prof[("source", "max_len")] >= 3.0


def test_drift_profile_save_load_roundtrip(spark, engine, tmp_path):
    df = make_sequences(spark, 1000, violations=False)
    base = engine.profile(df)
    engine.save_profile(base, str(tmp_path / "profile"))
    loaded = engine.load_profile(spark, str(tmp_path / "profile"))
    assert set(loaded) == set(base)
    # loaded profile accepts a clean resample, exactly like the live one
    results = engine.drift(make_sequences(spark, 1000, seed=9,
                                          violations=False), loaded)
    assert results and all(r["verdict"] == "pass" for r in results)


def test_value_histogram_formulations_agree(spark):
    from sjot_spark.plan.drift import value_histogram, value_histogram_jvm

    df = make_sequences(spark, 1500, violations=False)
    a = {(r.group, r.bucket): r.cnt
         for r in value_histogram(df, "tokens", 1024, "source").collect()}
    b = {(r.group, r.bucket): r.cnt
         for r in value_histogram_jvm(df, "tokens", 1024, "source").collect()}
    assert a == b


def test_value_histogram_formulations_agree_out_of_domain(spark):
    """Negative and >max_value elements must clip into the same edge
    buckets on both paths (round-1 ADVICE: the JVM variant diverged)."""
    from sjot_spark.plan.drift import value_histogram, value_histogram_jvm

    rows = [
        ("d0", [-5, -1, 0, 1023, 1024], "s0"),
        ("d1", [2 ** 21, 2 ** 21 + 7, (1 << 20) - 1, 1 << 20], "s0"),
        ("d2", [512, -(2 ** 31), 2 ** 31 - 1], "s1"),
        ("d3", [None, 512, None], "s1"),   # null elements: never binned
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string")
    a = {(r.group, r.bucket): r.cnt
         for r in value_histogram(df, "tokens", 1024, "source").collect()}
    b = {(r.group, r.bucket): r.cnt
         for r in value_histogram_jvm(df, "tokens", 1024, "source").collect()}
    assert a == b
    n_buckets = (1 << 20) // 1024 + 1
    assert a[("s0", 0)] == 4          # -5, -1, 0, 1023 all clip/floor to 0
    assert a[("s1", 0)] == 3          # 512 x2 and INT_MIN (clipped);
    #                                   d3's nulls contribute NOTHING
    assert a[("s0", n_buckets - 1)] == 3   # the two 2^21s + 1<<20 clip up
    assert a[("s1", n_buckets - 1)] == 1   # INT_MAX clips up


def test_psi_metric_and_thresholds():
    import numpy as np

    from sjot_spark.plan.stats import psi_from_hist

    base = np.array([100, 200, 300, 400], dtype=float)
    assert psi_from_hist(base, base) == 0.0
    # mild shift stays under the 0.1 'stable' threshold
    mild = np.array([110, 190, 310, 390], dtype=float)
    assert 0 < psi_from_hist(mild, base) < 0.1
    # gross shift blows past the 0.25 'shifted' threshold
    gross = np.array([400, 300, 200, 100], dtype=float)
    assert psi_from_hist(gross, base) > 0.25
    # symmetric-ish divergence: order swap gives the same magnitude
    assert abs(psi_from_hist(gross, base) - psi_from_hist(base, gross)) < 1e-9


def test_drift_clause_psi_verdict(spark):
    from sjot_spark.engine import ValidationEngine

    spec = {
        "@root": "#T",
        "T": {"doc_id": "0..", "n": "0..200[]"},
        "@table": {
            "key": "doc_id",
            "drift": {
                "n_psi": {"kind": "value_histogram", "column": "n",
                           "bucket_width": 10, "group_by": None,
                           "test": "psi", "alpha": 0.25},
            },
        },
    }
    eng = ValidationEngine(spec)
    base_df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.array(F.col("id") % 40).alias("n"))
    # shifted current: mass moved into high buckets
    cur_df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.array(F.col("id") % 40 + 60).alias("n"))
    baselines = eng.profile(base_df)
    same = eng.drift(base_df, baselines)
    assert all(r["verdict"] == "pass" for r in same)
    shifted = eng.drift(cur_df, baselines)
    assert any(r["verdict"] == "fail" and r["test"] == "psi"
               for r in shifted)
    assert all(r["pvalue"] is None for r in shifted if r["test"] == "psi")
