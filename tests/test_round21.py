"""Round-21: ordered deadline funnel — Python recomputation."""

from __future__ import annotations

from timedf_spark.queries.round21 import _DEADLINE_US, funnel_deadline
from timedf_spark.sources import load_table


def test_funnel_python_recomputation(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (int(r["ts"].timestamp() * 1_000_000), r["event_type"])
        )
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        t1 = min((us for us, t in evs if t == "click"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min(
            (us for us, t in evs if t == "view" and t1 < us <= t1 + _DEADLINE_US),
            default=None,
        )
        if t2 is None:
            continue
        n2 += 1
        t3 = min(
            (us for us, t in evs if t == "purchase" and t2 < us <= t2 + _DEADLINE_US),
            default=None,
        )
        if t3 is not None:
            n3 += 1
    got = {r["step"]: r["n_users"] for r in funnel_deadline(spark, sf_dir).collect()}
    assert got == {"step1_click": n1, "step2_view": n2, "step3_purchase": n3}
    assert n1 >= n2 >= n3  # funnel monotonicity
