"""Mini replica of the driver's correctness gate at sf0.001.

Every catalog query with an oracle must match DuckDB exactly (the driver
compares value hashes, so tolerance is 0).
"""

import pytest

from squirreldb_spark.parity import run_parity
from squirreldb_spark.queries import CATALOG

_NAMES = [n for n, qd in CATALOG.items() if qd.oracle is not None]


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    results = list(run_parity(spark, sf_dir, names=[name]))
    assert len(results) == 1
    qname, issues, n_rows = results[0]
    assert not issues, f"{qname}: {issues}"
    assert n_rows > 0, f"{qname}: empty result"
