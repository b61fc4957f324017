"""interp_expr / interp_sql vs np.interp (property-based)."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from esper_tv_spark.functions.interp import interp_expr, interp_sql

XS = [0.0, 0.25, 0.5, 0.75, 1.0]
YS = [0.97, 0.9, 0.8, 0.65, 0.5]


@given(
    st.lists(
        st.floats(min_value=-0.5, max_value=1.5, allow_nan=False, width=64),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=20, deadline=None)
def test_interp_sql_matches_numpy(xs_in):
    con = duckdb.connect()
    expr = interp_sql("x", XS, YS)
    vals = ", ".join(f"({v!r}::DOUBLE)" for v in xs_in)
    got = [r[0] for r in con.sql(f"SELECT {expr} FROM (VALUES {vals}) t(x)").fetchall()]
    want = np.interp(xs_in, XS, YS)
    assert got == pytest.approx(list(want), abs=1e-12)


def test_interp_expr_matches_numpy_and_sql(spark):
    xs_in = [-1.0, 0.0, 0.1, 0.25, 0.3, 0.5, 0.74, 0.75, 0.99, 1.0, 2.0]
    df = spark.createDataFrame([(v,) for v in xs_in], "x double")
    got = [r[0] for r in df.select(interp_expr(F.col("x"), XS, YS)).collect()]
    want = list(np.interp(xs_in, XS, YS))
    assert got == pytest.approx(want, abs=1e-15)
    # bit parity with the SQL emission (same doubles, same arithmetic)
    con = duckdb.connect()
    expr = interp_sql("x", XS, YS)
    vals = ", ".join(f"({v!r}::DOUBLE)" for v in xs_in)
    sql_got = [r[0] for r in con.sql(f"SELECT {expr} FROM (VALUES {vals}) t(x)").fetchall()]
    assert got == sql_got


def test_interp_validation():
    with pytest.raises(ValueError):
        interp_expr(F.lit(0.0), [0.0], [1.0])
    with pytest.raises(ValueError):
        interp_sql("x", [0.0, 0.0, 1.0], [1.0, 2.0, 3.0])
