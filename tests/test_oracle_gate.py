"""The local oracle gate must see dtype artifacts the way the driver does.

Round-2 regression: DuckDB's ``SUM(CASE ...)`` produces HUGEINT, which pandas
renders as float64 — the driver's pandas-side value hash therefore differs
from Spark's int64 even when every value is numerically identical
(``events_attribution_range`` was the red row).  A ``fetchall()``-based local
gate coerced HUGEINT back to int and hid the bug.  These tests pin the
hardened behavior of tests/oracle_util.compare:

* an uncast HUGEINT oracle MUST fail the gate (int64 vs float64 visible),
* the ``CAST(... AS BIGINT)`` form MUST pass.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_util import compare

# HUGEINT without cast: pandas renders as float64 -> must hash-differ from
# Spark's int64 even though the value is numerically identical.
UNCAST_SQL = "SELECT 1 AS k, SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS n FROM v GROUP BY k"
CAST_SQL = (
    "SELECT 1 AS k, CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n "
    "FROM v GROUP BY k"
)


@pytest.fixture(scope="module")
def hugeint_con():
    con = duckdb.connect()
    con.execute("CREATE VIEW v AS SELECT * FROM (VALUES (1), (2), (-1)) t(x)")
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark_bigint(spark):
    return spark.sql(
        "SELECT 1 AS k, CAST(2 AS BIGINT) AS n"
    )


def test_hugeint_dtype_check(hugeint_con):
    # DuckDB really does surface SUM(CASE...) as a pandas float; if a future
    # duckdb version changes this, the gate tests below lose their premise.
    pdf = hugeint_con.execute(UNCAST_SQL).df()
    assert pdf["n"].dtype.kind == "f", pdf.dtypes


def test_uncast_hugeint_fails_gate(spark_bigint, hugeint_con):
    with pytest.raises(AssertionError):
        compare(spark_bigint, hugeint_con, UNCAST_SQL)


def test_cast_bigint_passes_gate(spark_bigint, hugeint_con):
    compare(spark_bigint, hugeint_con, CAST_SQL)
