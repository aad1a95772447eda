"""Event-funnel operators (``relational.funnel_progress`` /
``funnel_counts``): greedy first-touch walk replicated in pure Python
on the same events (Spark supplies nothing but the rows), drop-off
monotonicity, time-budget semantics, and the one-shuffle plan shape.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.relational import (
    funnel_counts,
    funnel_progress,
)
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE

STEPS = ["view", "click", "purchase"]


def _py_funnel(rows, steps, within_s=None):
    """Greedy first-touch replication: walk each user's (ts, type)
    events in (ts, type) order, advancing on the next wanted step."""
    by_user: dict[int, list[tuple[datetime, str]]] = {}
    for r in rows:
        if r.event_type in steps:
            by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        stage, first_t, last_t = 0, None, None
        for t, y in evs:
            if stage >= len(steps) or y != steps[stage]:
                continue
            if (
                within_s is not None
                and first_t is not None
                and (t - first_t).total_seconds() > within_s
            ):
                continue
            stage += 1
            first_t = first_t or t
            last_t = t
        out[u] = (stage, first_t, last_t)
    return out


def test_funnel_matches_python_replication(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    rows = ev.select("user_id", "ts", "event_type").collect()
    for within in (None, 6 * 3600):
        expect = _py_funnel(rows, STEPS, within)
        got = {
            r.user: (r.reached, r.first_ts, r.last_ts)
            for r in funnel_progress(
                ev, STEPS, within_seconds=within
            ).collect()
        }
        assert set(got) == set(expect)
        for u in expect:
            stage, ft, lt = expect[u]
            assert got[u][0] == stage, (within, u)
            assert got[u][1] == ft and got[u][2] == lt, (within, u)
        # tight budgets must create drop-off on this corpus for the
        # test to mean anything
        if within is not None:
            assert any(s < len(STEPS) for s, _, _ in expect.values())


def test_funnel_counts_monotone_and_match(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    within = 6 * 3600
    prog = _py_funnel(
        ev.select("user_id", "ts", "event_type").collect(), STEPS, within
    )
    got = {
        r.step: (r.event_type, r.n_users)
        for r in funnel_counts(ev, STEPS, within_seconds=within).collect()
    }
    for k in range(1, len(STEPS) + 1):
        expect_n = sum(1 for s, _, _ in prog.values() if s >= k)
        assert got[k] == (STEPS[k - 1], expect_n), k
    ns = [got[k][1] for k in sorted(got)]
    assert ns == sorted(ns, reverse=True)  # non-increasing drop-off


def test_funnel_budget_and_order_semantics(spark):
    """Constructed walk: out-of-order steps don't count, the budget is
    anchored at the FIRST step (first-touch — a later re-anchor that
    would complete is deliberately not taken), duplicate steps reuse
    the earliest match."""
    t0 = datetime(2024, 1, 1)

    def e(u, mins, y):
        return (u, t0 + timedelta(minutes=mins), y)

    rows = [
        # u1: click before view -> the early click doesn't count
        e(1, 0, "click"), e(1, 10, "view"), e(1, 20, "click"),
        e(1, 30, "purchase"),
        # u2: completes but only outside a 15-min budget
        e(2, 0, "view"), e(2, 60, "click"), e(2, 61, "purchase"),
        # u3: a second view at t=50 would complete within budget, but
        # first-touch anchors at t=0
        e(3, 0, "view"), e(3, 50, "view"), e(3, 55, "click"),
        e(3, 58, "purchase"),
        # u4: never starts
        e(4, 5, "click"), e(4, 6, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    free = {
        r.user: r.reached for r in funnel_progress(ev, STEPS).collect()
    }
    assert free == {1: 3, 2: 3, 3: 3, 4: 0}
    tight = {
        r.user: (r.reached, r.completed)
        for r in funnel_progress(
            ev, STEPS, within_seconds=25 * 60
        ).collect()
    }
    assert tight[1] == (3, True)
    assert tight[2] == (1, False)  # click/purchase fell out of budget
    assert tight[3] == (1, False)  # first-touch anchor, no re-anchor
    assert tight[4] == (0, False)
    d1 = {
        r.user: r.duration_s
        for r in funnel_progress(ev, STEPS).collect()
    }
    assert d1[1] == 20 * 60.0 and d1[4] is None


def test_funnel_single_shuffle_plan(spark):
    """The progress plan must hold ONE exchange (the user groupBy) —
    no per-step self-joins, no window function."""
    from big_data_hadoop_spark.plans.audit import formatted_plan

    import re

    ev = load_table(spark, SF_ORACLE, "events")
    plan = formatted_plan(funnel_progress(ev, STEPS))
    # formatted plans list each node once in the tree and once in the
    # detail section — count the numbered detail entries
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:1500]
    assert "Window" not in plan and "Join" not in plan


def test_funnel_rejects_empty_steps(spark):
    import pytest as _pytest

    ev = load_table(spark, SF_ORACLE, "events")
    with _pytest.raises(ValueError, match="non-empty"):
        funnel_progress(ev, [])


def test_q86_probe_matches_python(spark):
    from big_data_hadoop_spark.probes import QUERIES

    ev = load_table(spark, SF_ORACLE, "events")
    prog = _py_funnel(
        ev.select("user_id", "ts", "event_type").collect(),
        STEPS,
        6 * 3600,
    )
    got = {
        r.step: r.n_users
        for r in QUERIES["q86_event_funnel"](spark, SF_ORACLE).collect()
    }
    for k in range(1, len(STEPS) + 1):
        assert got[k] == sum(1 for s, _, _ in prog.values() if s >= k)


def test_funnel_valve_equality_on_normal_data(spark):
    """The max_events_per_user valve is a no-op for every user at or
    under the cap — valved and unvalved results identical on the real
    events table (whose per-user funnel-type counts are far below the
    cap)."""
    ev = load_table(spark, SF_ORACLE, "events")
    base = {
        r.user: (r.reached, r.first_ts, r.last_ts)
        for r in funnel_progress(ev, STEPS, within_seconds=6 * 3600).collect()
    }
    valved = {
        r.user: (r.reached, r.first_ts, r.last_ts)
        for r in funnel_progress(
            ev, STEPS, within_seconds=6 * 3600, max_events_per_user=10_000
        ).collect()
    }
    assert base == valved


def test_funnel_valve_bounds_hot_user(spark):
    """An adversarial bot user with funnel-type events past the cap is
    evaluated over their EARLIEST cap events only — exactly the python
    walk over the truncated list — while normal users are untouched."""
    t0 = datetime(2024, 1, 1)
    rows = []
    # bot: 500 'view' events, then the click/purchase arrive AFTER the
    # cap boundary — a cap of 100 must not see them
    for i in range(500):
        rows.append((99, t0 + timedelta(seconds=i), "view"))
    rows.append((99, t0 + timedelta(seconds=1000), "click"))
    rows.append((99, t0 + timedelta(seconds=1001), "purchase"))
    # normal user completes
    rows.append((1, t0, "view"))
    rows.append((1, t0 + timedelta(seconds=1), "click"))
    rows.append((1, t0 + timedelta(seconds=2), "purchase"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.user: r.reached
        for r in funnel_progress(
            ev, STEPS, max_events_per_user=100
        ).collect()
    }
    # python replication over each user's earliest-100 events
    class R:
        def __init__(self, u, t, y):
            self.user_id, self.ts, self.event_type = u, t, y

    capped = []
    by_user: dict[int, list] = {}
    for u, t, y in rows:
        by_user.setdefault(u, []).append((t, y))
    for u, evs in by_user.items():
        evs.sort()
        capped.extend(R(u, t, y) for t, y in evs[:100])
    expect = {u: s for u, (s, _, _) in _py_funnel(capped, STEPS).items()}
    assert got == expect
    assert got[99] == 1  # bot saw only views inside the cap
    assert got[1] == 3  # normal user untouched


def test_funnel_valve_plan_keeps_single_exchange(spark):
    """The valve's row_number window reuses the groupBy's hash
    partitioning — the plan stays at ONE Exchange (the round-6 pin),
    with the state-bounding Window added before the fold."""
    from big_data_hadoop_spark.plans.audit import formatted_plan

    import re

    ev = load_table(spark, SF_ORACLE, "events")
    plan = formatted_plan(
        funnel_progress(ev, STEPS, max_events_per_user=1000)
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:1500]
    assert "Join" not in plan


def test_funnel_valve_rejects_nonpositive(spark):
    import pytest as _pytest

    ev = load_table(spark, SF_ORACLE, "events")
    with _pytest.raises(ValueError, match="max_events_per_user"):
        funnel_progress(ev, STEPS, max_events_per_user=0)
