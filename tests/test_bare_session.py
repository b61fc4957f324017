"""Contract queries must be self-contained on a BARE SparkSession.

Round-1 regression: the driver's harness builds its own SparkSession with
none of esper_tv_spark.session.get_spark's builder confs, so every query
touching events.parquet (TIMESTAMP NANOS) died at the scan.  _t/load_table
now call ensure_runtime_confs() before each read; these tests pin that.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as m

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reads_reassert_runtime_confs(spark):
    """Unset the legacy conf (simulating a bare session) — _t must restore it."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = m.queries()["q16_events_hourly"](spark, SF)
        assert len(df.collect()) > 0
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


@pytest.mark.slow
def test_contract_on_truly_bare_session():
    """Fresh JVM, vanilla builder (no repo confs), run an events query."""
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[2]").appName("bare").getOrCreate()
import __spark_entry__ as m
n = m.queries()["q16_events_hourly"](spark, {SF!r}).count()
assert n > 0, n
print("BARE_OK", n)
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert "BARE_OK" in out.stdout, out.stderr[-3000:]
