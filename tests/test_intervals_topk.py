"""interval_overlap_topk (VERDICT r06 item 5): per-cell pre-pruned
bounded overlap ranking must equal post-hoc capping of the full
enumeration, and the per-cell window must not add an exchange over the
quadratic candidate stream."""

from __future__ import annotations

import pyspark.sql.functions as F

from timedf_spark.operators.intervals import (
    interval_overlap_join,
    interval_overlap_topk,
)


def _sessions(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, session_id long, start_us long, end_us long"
    )


def _dense_case(spark):
    """Many sessions overlapping across cell boundaries: user u session s
    spans [u*7 + s*13, +len] microseconds scaled up to cross 1h cells."""
    H = 3_600_000_000
    rows = []
    for u in range(12):
        for s in range(6):
            start = u * (H // 3) + s * (H // 2)
            rows.append((u, s, start, start + H + u * (H // 5)))
    return _sessions(spark, rows)


def test_topk_equals_posthoc_cap_of_full_enumeration(spark):
    sess = _dense_case(spark)
    k = 3
    full = interval_overlap_join(
        sess, sess, pair_filter="a_user_id < b_user_id"
    ).collect()
    # post-hoc cap in plain python: rank by (overlap desc, b_user, b_sess)
    groups = {}
    for r in full:
        groups.setdefault((r["a_user_id"], r["a_session_id"]), []).append(r)
    want = set()
    for (ua, sa), rs in groups.items():
        rs.sort(key=lambda r: (-r["overlap_us"], r["b_user_id"], r["b_session_id"]))
        for rank, r in enumerate(rs[:k], start=1):
            want.add((ua, sa, r["b_user_id"], r["b_session_id"], r["overlap_us"], rank))
    got = {
        (
            r["a_user_id"], r["a_session_id"], r["b_user_id"],
            r["b_session_id"], r["overlap_us"], r["overlap_rank"],
        )
        for r in interval_overlap_topk(
            sess, sess, key_cols=["a_user_id", "a_session_id"], k=k,
            pair_filter="a_user_id < b_user_id",
            order_cols=["b_user_id", "b_session_id"],
        ).collect()
    }
    assert got == want
    # sanity: the cap actually bit (some group had > k partners)
    assert any(len(rs) > k for rs in groups.values())


def test_topk_cell_window_reuses_join_partitioning(spark):
    """The per-cell window's partition keys extend the join key (cell),
    so with a shuffled (non-broadcast) join Catalyst must satisfy the
    window's clustered distribution from the join's hash partitioning —
    only SORTS between the join and the first window, no new exchange
    carrying the candidate stream."""
    sess = _dense_case(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = interval_overlap_topk(
            sess, sess, key_cols=["a_user_id", "a_session_id"], k=3,
            pair_filter="a_user_id < b_user_id",
            order_cols=["b_user_id", "b_session_id"],
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # expected exchanges: 2 join inputs on cell + 1 for the global
    # (a_user_id, a_session_id) window over the PRUNED rows. The cell
    # window itself must contribute none.
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 3, f"unexpected exchange count {n_ex}:\n{plan[:2000]}"
    assert "cell" not in _exchange_keys_after_first_window(plan)


def _exchange_keys_after_first_window(plan: str) -> str:
    """Exchange expressions appearing ABOVE (before, in toString order)
    the first Window — i.e. downstream of it; the cell-window must not
    have its own cell-keyed exchange."""
    head = plan.split("Window", 1)[0]
    return head


def test_topk_handles_groups_smaller_than_k(spark):
    sess = _sessions(
        spark,
        [
            (1, 1, 0, 100),
            (2, 1, 50, 150),
            (3, 1, 500, 600),
        ],
    )
    rows = interval_overlap_topk(
        sess, sess, key_cols=["a_user_id", "a_session_id"], k=5,
        pair_filter="a_user_id < b_user_id",
        order_cols=["b_user_id", "b_session_id"],
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a_user_id"], r["b_user_id"], r["overlap_us"], r["overlap_rank"]) == (
        1, 2, 50, 1,
    )
