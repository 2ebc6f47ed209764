"""Mini replica of the driver's correctness gate at sf0.001.

Every catalog query with an oracle must match DuckDB exactly (the driver
compares value hashes, so tolerance is 0).
"""

import pytest

from squirreldb_spark.parity import run_parity
from squirreldb_spark.queries import CATALOG

_NAMES = [n for n, qd in CATALOG.items() if qd.oracle is not None]

#: slow tier (VERDICT r15 #2): DuckDB replays doc_pagerank's 8 power
#: iterations as unrolled CTEs — 152 s even at sf0.001.  The default
#: tier keeps test_pipeline's pagerank fixed-point equivalence test and
#: every other catalog entry's parity check; the full tier (and the
#: driver's own sf0.01 oracle gate) still replays this one.
_SLOW_PARITY = {"doc_pagerank"}


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
     for n in _NAMES],
)
def test_query_matches_oracle(spark, sf_dir, name):
    results = list(run_parity(spark, sf_dir, names=[name]))
    assert len(results) == 1
    qname, issues, n_rows = results[0]
    assert not issues, f"{qname}: {issues}"
    assert n_rows > 0, f"{qname}: empty result"


@pytest.mark.slow  # 67 s synthetic 17k-vector regime probe (full tier)
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


def test_at_subquery_oracle_alignment_non_midnight_anchor(spark, sf_dir):
    """r13 review: the pinned-subquery oracle must DERIVE the inner-grid
    anchor (floor(T_eff/step)*step), not assume T is step-aligned.
    Exact engine-vs-DuckDB match at an anchor 7h13m past midnight."""
    import duckdb

    from squirreldb_spark.queries import (
        AT_TS_MS, LOOKBACK_MS, STEP_MS, _PTS, _engine, _grid_sql, _round,
    )

    t_ms = AT_TS_MS + 7 * 3_600_000 + 13 * 60_000  # NOT a step multiple
    sp = _round(
        _engine(spark, sf_dir).query_range(
            f"count_over_time(purchase[14d:1d] @ {t_ms / 1000!r})"
        ),
        {"value": 6},
    ).toPandas()

    sql = f"""
WITH pts AS ({_PTS}),
{_grid_sql()},
igrid AS (SELECT unnest(generate_series(
            ({t_ms} // {STEP_MS}) * {STEP_MS} - 13 * {STEP_MS},
            ({t_ms} // {STEP_MS}) * {STEP_MS}, {STEP_MS})) AS istep),
inst AS (
  SELECT p.user_id, i.istep, arg_max(p.value, p.ts) AS value
  FROM pts p, igrid i
  WHERE p.ts > i.istep - {LOOKBACK_MS} AND p.ts <= i.istep
    AND p.event_type = 'purchase'
  GROUP BY 1, 2),
cnt AS (SELECT user_id, count(*)::DOUBLE AS value FROM inst GROUP BY 1)
SELECT c.user_id, g.step_ts, round(c.value, 6) AS value FROM cnt c, grid g
"""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    du = con.execute(sql).fetchdf()
    sk = sp.sort_values(["user_id", "step_ts"], ignore_index=True)
    dk = du.sort_values(["user_id", "step_ts"], ignore_index=True)
    assert len(sk) == len(dk) > 0
    assert (sk["user_id"].to_numpy() == dk["user_id"].to_numpy()).all()
    assert (sk["step_ts"].to_numpy() == dk["step_ts"].to_numpy()).all()
    assert (sk["value"].to_numpy() == dk["value"].to_numpy()).all()
