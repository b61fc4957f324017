"""Piecewise-linear interpolation as native column expressions.

The reference's precision-bucket identity model (identity.py:50-162,
165-199) converts a raw classifier score into a calibrated probability by
hand-auditing precision per score bucket and then `np.interp`-ing each
score against the bucket centers. The interp itself was a driver-side numpy
call over collected rows; here it compiles to a CASE chain that runs inside
whole-stage codegen — and an identical SQL text for the DuckDB oracle, so
calibrated probabilities are bit-comparable across engines.

np.interp semantics: clamp below xs[0] to ys[0], above xs[-1] to ys[-1],
linear in between. xs must be strictly increasing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _check(xs: list[float], ys: list[float]) -> None:
    if len(xs) != len(ys) or len(xs) < 2:
        raise ValueError("xs and ys must be equal length >= 2")
    if any(x1 <= x0 for x0, x1 in zip(xs, xs[1:])):
        raise ValueError("xs must be strictly increasing")


def interp_expr(x: Column, xs: list[float], ys: list[float]) -> Column:
    """np.interp(x, xs, ys) as a Column expression (CASE chain)."""
    _check(xs, ys)
    out = F.when(x <= F.lit(xs[0]), F.lit(ys[0]))
    for i in range(len(xs) - 1):
        x0, x1, y0, y1 = xs[i], xs[i + 1], ys[i], ys[i + 1]
        slope = (y1 - y0) / (x1 - x0)
        out = out.when(x <= F.lit(x1), F.lit(y0) + (x - F.lit(x0)) * F.lit(slope))
    return out.otherwise(F.lit(ys[-1]))


def interp_sql(x_sql: str, xs: list[float], ys: list[float]) -> str:
    """The same CASE chain as ANSI SQL text. Literals are emitted with
    repr() (shortest round-trip double) and cast to DOUBLE explicitly —
    DuckDB parses bare decimal literals as DECIMAL, which would change the
    arithmetic — so (x - x0) * slope + y0 is bit-identical across engines."""
    _check(xs, ys)

    def d(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    parts = [f"WHEN ({x_sql}) <= {d(xs[0])} THEN {d(ys[0])}"]
    for i in range(len(xs) - 1):
        x0, x1, y0, y1 = xs[i], xs[i + 1], ys[i], ys[i + 1]
        slope = (y1 - y0) / (x1 - x0)
        parts.append(
            f"WHEN ({x_sql}) <= {d(x1)} THEN {d(y0)} + (({x_sql}) - {d(x0)}) * {d(slope)}"
        )
    return "CASE " + " ".join(parts) + f" ELSE {d(ys[-1])} END"
