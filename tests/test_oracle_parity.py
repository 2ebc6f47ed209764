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


def test_hubness_dynamic_plane_oracle_binding_regime(spark):
    """ADVICE r11: above 16384 vectors the Spark side self-tunes to 7
    planes; the oracle must follow from its own count(*) (the fixed-6
    convention would silently hash-mismatch here).  Exact value match
    on a 17k synthetic corpus."""
    import duckdb
    import pandas as pd

    from squirreldb_spark.pipeline import similarity as psim

    n = 17000
    vecs = [
        [float((i * 37 + d * 101) % 29 - 14) for d in range(8)]
        for i in range(n)
    ]
    emb = spark.createDataFrame(
        [(i, vecs[i]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    sp = psim.hubness(emb, k=2, dim=8).toPandas()

    con = duckdb.connect()
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": vecs})
    con.register("embeddings", pdf)
    du = con.execute(psim.sql_hubness(k=2, dim=8)).fetchdf()
    assert len(sp) == len(du) == 1
    for col in sp.columns:
        assert sp[col].iloc[0] == du[col].iloc[0], (
            col, sp[col].iloc[0], du[col].iloc[0])
