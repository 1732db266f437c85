"""Normal Q-Q table (SURVEY §2 D3 — the probplot panel, engine-side).

Validates q_eval_qq_normal and functions/statfns.probit_sql against an
independent pure-Python Acklam implementation, published quantile
values, and a numpy least-squares fit of the emitted points.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.functions.statfns import probit_sql
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def _probit_ref(p: float) -> float:
    """Acklam's approximation, independently transcribed (float math in
    a different evaluation order than the SQL builder on purpose)."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    p_low = 0.02425
    if p < p_low:
        q_ = math.sqrt(-2.0 * math.log(p))
        return (((((c[0] * q_ + c[1]) * q_ + c[2]) * q_ + c[3]) * q_ + c[4]) * q_ + c[5]) / (
            (((d[0] * q_ + d[1]) * q_ + d[2]) * q_ + d[3]) * q_ + 1.0
        )
    if p > 1.0 - p_low:
        q_ = math.sqrt(-2.0 * math.log(1.0 - p))
        return -(((((c[0] * q_ + c[1]) * q_ + c[2]) * q_ + c[3]) * q_ + c[4]) * q_ + c[5]) / (
            (((d[0] * q_ + d[1]) * q_ + d[2]) * q_ + d[3]) * q_ + 1.0
        )
    q_ = p - 0.5
    r_ = q_ * q_
    return (
        (((((a[0] * r_ + a[1]) * r_ + a[2]) * r_ + a[3]) * r_ + a[4]) * r_ + a[5]) * q_
        / ((((((b[0] * r_ + b[1]) * r_ + b[2]) * r_ + b[3]) * r_ + b[4]) * r_) + 1.0)
    )


# Inverse standard normal CDF at textbook probabilities (Abramowitz &
# Stegun / any statistics table), to 6 decimals.
_KNOWN = {
    0.5: 0.0,
    0.841345: 1.0,  # Phi(1) = 0.841344746...
    0.975: 1.959964,
    0.995: 2.575829,
    0.999: 3.090232,
    0.001: -3.090232,
    0.025: -1.959964,
}


def test_probit_sql_matches_reference_and_tables(spark):
    ps = sorted(set([i / 1000.0 for i in range(1, 1000)] + list(_KNOWN)))
    df = spark.createDataFrame([(p,) for p in ps], "p double").withColumn(
        "x", F.expr(probit_sql("p"))
    )
    got = {r["p"]: r["x"] for r in df.collect()}
    for p in ps:
        assert got[p] == pytest.approx(_probit_ref(p), abs=1e-12), p
    for p, want in _KNOWN.items():
        # Acklam's relative error bound is 1.15e-9; the tables are 6dp
        assert got[p] == pytest.approx(want, abs=5e-6), p
    # strictly increasing in p
    xs = [got[p] for p in sorted(ps)]
    assert all(a < b for a, b in zip(xs, xs[1:]))


def test_qq_normal_points_and_fit(spark):
    out = QUERIES["q_eval_qq_normal"](spark, SF_SMOKE).orderBy("i").toPandas()
    n = len(out)
    assert n > 10
    # i is the full 1..n rank, sample_q is nondecreasing in i, and the
    # fit constants are identical on every row
    assert list(out["i"]) == list(range(1, n + 1))
    assert (np.diff(out["sample_q"].to_numpy()) >= 0).all()
    for c in ("slope", "intercept", "corr"):
        assert out[c].nunique() == 1
    # theoretical quantiles: Blom positions through the probit, and the
    # antisymmetry Phi^-1(p) = -Phi^-1(1-p) between mirrored ranks
    p = (out["i"].to_numpy() - 0.375) / (n + 0.25)
    want = np.array([round(_probit_ref(v), 6) for v in p])
    assert np.allclose(out["theo_q"].to_numpy(), want, atol=1e-9)
    assert np.allclose(
        out["theo_q"].to_numpy(), -out["theo_q"].to_numpy()[::-1], atol=2e-6
    )
    # slope/intercept match an independent numpy least-squares on the
    # emitted points (the decimal-exact moment accumulation vs
    # numpy's float64 normal equations: agreement to ~1e-5 is the
    # 6dp-rounded-input expectation)
    coef = np.polyfit(out["theo_q"].to_numpy(), out["sample_q"].to_numpy(), 1)
    assert out["slope"].iloc[0] == pytest.approx(coef[0], abs=1e-4)
    assert out["intercept"].iloc[0] == pytest.approx(coef[1], abs=1e-4)
    r = np.corrcoef(out["theo_q"].to_numpy(), out["sample_q"].to_numpy())[0, 1]
    assert out["corr"].iloc[0] == pytest.approx(r, abs=1e-4)
    assert -1.0 <= out["corr"].iloc[0] <= 1.0
