"""Python-replay pin for a_offpolicy_replay (VERDICT r10 item 7 — the
one round-10 closed-form estimator without an independent textbook
replay). Same insurance as tests/test_replay_r14.py: the differential
check is blind to both-engines-same-construction bugs (the Friedman
lesson), so this recomputes the Li et al. replay estimator from the
DEFINITION — sequential Python over the raw parquet rows, the policy
as a plain function event -> arm, matched-subset accounting by hand —
not the query's join/broadcast formulation.
"""

import duckdb

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
    QUERIES,
)
from tests.conftest import SF_DIR

KNUTH = 2654435761
M32 = 1 << 32


def test_offpolicy_replay_replay(spark):
    """Replay method, Li et al. 2011: V(pi) is estimated from exactly
    the logged events where pi(x_t) == a_t. Three policies: the
    logged baseline (matches everything), 'best_global' (constant arm
    = argmax of total logged reward), and 'hash5' (arm index =
    multiplicative hash of user_id mod k over the alphabetical arm
    list). Sequential accumulation in Python bigints; cent conversion
    replayed as the same HALF_UP money-grid round."""
    got = {
        r.policy: (r.n_matched, r.reward_cents)
        for r in QUERIES["a_offpolicy_replay"](spark, SF_DIR).collect()
    }

    rows = (
        duckdb.connect()
        .execute(
            "SELECT user_id, event_type, value FROM "
            f"read_parquet('{SF_DIR}/events.parquet')"
        )
        .fetchall()
    )
    # HALF_UP on the 2-decimal money grid, like Spark's round(v*100)
    cents = [(u, a, int(v * 100 + 0.5)) for u, a, v in rows]

    arms = sorted({a for _, a, _ in cents})
    k = len(arms)
    idx = {a: i for i, a in enumerate(arms)}

    totals: dict[str, int] = {}
    for _, a, c in cents:
        totals[a] = totals.get(a, 0) + c
    # argmax by (total DESC, arm ASC) — the query's tie-break
    best_arm = min(totals, key=lambda a: (-totals[a], a))

    def hash5_policy(user_id: int) -> str:
        return arms[((user_id % M32) * KNUTH % M32) % k]

    n_log = len(cents)
    r_log = sum(c for _, _, c in cents)
    n_best = sum(1 for _, a, _ in cents if a == best_arm)
    r_best = sum(c for _, a, c in cents if a == best_arm)
    n_hash = sum(1 for u, a, _ in cents if a == hash5_policy(u))
    r_hash = sum(c for u, a, c in cents if a == hash5_policy(u))

    assert got["logged"] == (n_log, r_log)
    assert got["best_global"] == (n_best, r_best)
    assert got["hash5"] == (n_hash, r_hash)
    # the matched subsets must be proper, non-degenerate restrictions
    assert 0 < n_best < n_log
    assert 0 < n_hash < n_log
