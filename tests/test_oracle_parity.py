"""Mirror of the driver's correctness gate: every registered query must
match its DuckDB oracle exactly (sorted columns, sorted rows, bit-exact
values) at sf0.001; mark `slow` runs sf0.01 (what the driver uses)."""

import pytest

from svoe_spark.all_queries import QUERIES
from svoe_spark.testing import run_parity

pytestmark = pytest.mark.heavy  # multi-minute suite: deselected by the
# default `pytest tests/ -q` tier (pytest.ini); scripts/ptest.py shards and
# the round-close sweep run it



@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity_sf0001(spark, sf_small, name):
    ok, msg = run_parity(spark, name, sf_small)
    assert ok, msg


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity_sf001(spark, sf_mid, name):
    ok, msg = run_parity(spark, name, sf_mid)
    assert ok, msg
