"""Statistical scalar expressions shared between the Spark queries and
the DuckDB oracle.

The cross-engine determinism rule (plans/_registry.py docstring): a
formula evaluated on both engines must be the SAME arithmetic DAG in
both, built from operations that are bit-deterministic for identical
double inputs (+ - * / sqrt CASE are IEEE-exact; ln/exp/pow are
libm-dependent and may differ by 1 ulp between the JVM and DuckDB).
These builders therefore emit one SQL STRING consumed by both sides —
`F.expr(...)` on the Spark side, string interpolation on the oracle
side — so the engines cannot diverge structurally, and callers are
expected to round the result before feeding it into any further
rounded-decimal arithmetic (see q_eval_qq_normal) so a tail-branch
1-ulp `ln` difference cannot straddle a downstream half boundary.
"""

from __future__ import annotations

# Acklam's rational approximation to the inverse normal CDF (Peter
# Acklam, 2003; relative error < 1.15e-9 over (0, 1)). The central
# branch (|p - 0.5| <= 0.47575) is a pure rational polynomial —
# bit-deterministic across engines. Only the two tail branches touch
# ln(), the single libm dependence of the whole expression.
_A = (
    -3.969683028665376e01,
    2.209460984245205e02,
    -2.759285104469687e02,
    1.383577518672690e02,
    -3.066479806614716e01,
    2.506628277459239e00,
)
_B = (
    -5.447609879822406e01,
    1.615858368580409e02,
    -1.556989798598866e02,
    6.680131188771972e01,
    -1.328068155288572e01,
)
_C = (
    -7.784894002430293e-03,
    -3.223964580411365e-01,
    -2.400758277161838e00,
    -2.549732539343734e00,
    4.374664141464968e00,
    2.938163982698783e00,
)
_D = (
    7.784695709041462e-03,
    3.224671290700398e-01,
    2.445134137142996e00,
    3.754408661907416e00,
)
_P_LOW = 0.02425


def _dbl(c: float) -> str:
    """Double-typed literal valid on both engines. DuckDB types a bare
    decimal literal as DECIMAL and a Horner chain of DECIMAL products
    overflows the 38-digit scale; the explicit cast keeps every
    intermediate in binary double on both sides (bit-identical
    literal-to-double parsing is guaranteed by IEEE 754 round-to-
    nearest on the full repr)."""
    return f"CAST({c!r} AS DOUBLE)"


def _horner(coeffs: tuple[float, ...], x: str) -> str:
    """Nested-multiplication polynomial text: identical evaluation
    order on both engines."""
    expr = _dbl(coeffs[0])
    for c in coeffs[1:]:
        expr = f"({expr})*({x})+{_dbl(c)}"
    return expr


def probit_sql(p: str) -> str:
    """SQL text for the inverse standard-normal CDF at probability
    expression ``p`` (Acklam). Valid Spark SQL and DuckDB SQL; ``p``
    must be a column/expression strictly inside (0, 1). ``p`` is
    referenced multiple times — pass a plain column name, not a
    subquery."""
    one = _dbl(1.0)
    q_tail_lo = f"sqrt({_dbl(-2.0)}*ln({p}))"
    q_tail_hi = f"sqrt({_dbl(-2.0)}*ln({one}-({p})))"
    lo = f"({_horner(_C, q_tail_lo)})/(({_horner(_D, q_tail_lo)})*({q_tail_lo})+{one})"
    hi = f"-(({_horner(_C, q_tail_hi)})/(({_horner(_D, q_tail_hi)})*({q_tail_hi})+{one}))"
    qc = f"(({p})-{_dbl(0.5)})"
    rc = f"({qc}*{qc})"
    central = f"(({_horner(_A, rc)})*{qc})/(({_horner(_B, rc)})*({rc})+{one})"
    return (
        f"CASE WHEN ({p}) < {_dbl(_P_LOW)} THEN {lo} "
        f"WHEN ({p}) > {_dbl(1.0 - _P_LOW)} THEN {hi} "
        f"ELSE {central} END"
    )
