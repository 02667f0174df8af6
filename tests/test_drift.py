"""PSI drift-detector contracts: zero for identical distributions, large
for a shifted one, and a scan-shaped plan (no windows, no big joins)."""

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import drift


def _uniform(spark, n=5000, shift=0.0):
    return spark.range(n).select(
        ((F.pmod(F.col("id") * 7919, 10000)) / 10000.0 + shift).alias("value")
    )


def test_psi_zero_on_identical(spark):
    a, b = _uniform(spark), _uniform(spark)
    assert abs(drift.psi(a, b)) < 1e-9


def test_psi_flags_shift(spark):
    a, b = _uniform(spark), _uniform(spark, shift=0.5)
    assert drift.psi(a, b) > 0.25, "half-range shift must cross the retrain line"


def test_psi_bins_complete_and_sane(spark):
    a, b = _uniform(spark), _uniform(spark, shift=0.1)
    rows = drift.psi_bins(a, b, n_bins=10).collect()
    assert [r.bin for r in rows] == list(range(10))
    assert abs(sum(r.p_ref for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r.n_ref + r.n_cur >= 0 and r.p_ref > 0 and r.p_cur > 0


def test_psi_plan_has_no_window(spark):
    a, b = _uniform(spark), _uniform(spark, shift=0.1)
    plan = drift.psi_bins(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window" not in plan, plan[:1200]
