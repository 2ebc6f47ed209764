"""Full-catalog oracle parity at the DRIVER's scale (sf0.01).

tests/test_oracle_parity.py runs per-entry at sf0.001 for fast
attribution; this sweep exists because value bugs can be scale-local:
the driver hashes at sf0.01, and rounding-boundary rows (e.g. the
smoothing family's .5-decimal landings) may simply not occur in the
smaller fixture — promql_double_exp_smoothing passed every sf0.001 run
while 11 sf0.01 rows hashed apart. One bulk pass, all entries, failures
reported together.
"""

from squirreldb_spark.parity import run_parity
from squirreldb_spark.queries import CATALOG
import pytest

# slow tier (VERDICT r15 #2): the driver itself hash-compares every declared query vs DuckDB at sf0.01
# each round; this 543 s in-suite replica runs in the full tier only
pytestmark = pytest.mark.slow


SF_DIR_DRIVER = "/root/testdata/sf0.01"


def test_full_catalog_matches_oracle_at_driver_scale(spark):
    names = [n for n, qd in CATALOG.items() if qd.oracle is not None]
    failures = []
    for name, issues, n_rows in run_parity(spark, SF_DIR_DRIVER, names=names):
        if issues:
            failures.append((name, issues))
        elif n_rows == 0:
            failures.append((name, ["empty result"]))
    assert not failures, failures
