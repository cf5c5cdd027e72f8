"""Events plans vs the DuckDB oracle (incl. ASOF join)."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.plans import events
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_vs_oracle(spark, sf_dir, name):
    df = events.QUERIES[name](spark, sf_dir)
    compare(df, events.ORACLE[name], sf_dir, name)


def test_e09_dims_broadcast_no_fact_shuffle(spark, sf_dir):
    """Dim enrichment must broadcast both dims: the events fact side is
    never shuffled for the joins (only the final tiny agg exchanges)."""
    df = events.e09_stream_static_enrich(spark, sf_dir)
    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # final AQE plan only
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_cogroup_applyinpandas_matches_join(spark, sf_dir):
    """§2.9 surface completeness: cogrouped ``applyInPandas`` — per-key
    pandas alignment of TWO tables in one shuffle each (the API for
    custom two-sided per-key logic Spark's built-ins can't express).
    The pandas body here just counts both sides, so a pure-DataFrame
    outer-join aggregate is an exact oracle for it."""
    import pandas as pd

    from pyspark.sql import functions as F

    from aind_smartspim_data_transformation_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "value"
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_totalprice"
    )

    def count_both(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": [key[0]], "n_ev": [len(left)], "n_ord": [len(right)]}
        )

    got = {
        r["k"]: (r["n_ev"], r["n_ord"])
        for r in ev.groupBy("k")
        .cogroup(od.groupBy("k"))
        .applyInPandas(count_both, "k long, n_ev long, n_ord long")
        .collect()
    }
    ev_counts = ev.groupBy("k").agg(F.count("*").alias("n_ev"))
    od_counts = od.groupBy("k").agg(F.count("*").alias("n_ord"))
    expect = {
        r["k"]: (r["n_ev"] or 0, r["n_ord"] or 0)
        for r in ev_counts.join(od_counts, "k", "full_outer")
        .select("k", "n_ev", "n_ord")
        .collect()
    }
    assert got == expect


def test_recursive_sessions_equal_window_sessions(spark, sf_dir):
    """e14's recursive-CTE chains produce exactly e04's window-scan
    sessions (user, start, end, event count) — two formulations, one
    contract."""
    e04 = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in events.e04_sessionize(spark, sf_dir).collect()
    )
    e14 = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in events.e14_sessions_rcte(spark, sf_dir).collect()
    )
    assert e14 == e04


def test_pointer_jumping_sessions_equal_recursive(spark, sf_dir):
    """r14 (VERDICT r13 ask #4): the pointer-jumping (doubling)
    reformulation must be row-identical to the rCTE chain walk — same
    sessions, O(log longest-chain) shuffle rounds instead of one
    recursion level per chain step (the 100x-zipf hot-user wall; the
    rCTE also fails loudly past 100-event sessions on its level
    guard, which pointer jumping has no need of)."""
    rcte = sorted(
        map(tuple, events.e14_sessions_rcte(spark, sf_dir).collect())
    )
    ptr = sorted(
        map(tuple, events._e14_pointer_jumping(spark, sf_dir).collect())
    )
    assert ptr == rcte and len(ptr) > 0


def test_e14_two_result_frames_alive_concurrently(spark, sf_dir):
    """r16 (VERDICT r15 "what's wrong" #2): building a SECOND e14
    result while the first frame is still alive must not unpersist the
    first frame's checkpoint blocks (the r15 registry released the
    previous build's handles unconditionally → `Block rdd_N does not
    exist` on the older frame).  Handles are now keyed by the result
    frame and released only once it is garbage."""
    import gc

    a = events._e14_pointer_jumping(spark, sf_dir)
    a_rows = sorted(map(tuple, a.collect()))
    b = events._e14_pointer_jumping(spark, sf_dir)  # a alive here
    # the OLDER frame must still execute off its checkpoint blocks
    assert sorted(map(tuple, a.collect())) == a_rows
    assert sorted(map(tuple, b.collect())) == a_rows
    # once a result frame is garbage, the next release pass drops its
    # handle (no unbounded accumulation across a sweep)
    del a, b
    gc.collect()
    events._e14_release_dead_handles()
    assert events._E14_LIVE_HANDLES == []


def test_pointer_jumping_handles_long_chains_and_ties(spark, tmp_path):
    """Shapes the base fixture lacks: a session LONGER than the rCTE's
    100-level guard (300 same-gap events — the zipf-hot-user shape in
    miniature; the rCTE would fail loudly here, so e04 is the truth
    twin), same-timestamp events within one user (the rn tie-break on
    event_id), and single-event sessions."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: one 300-event session, 10 s apart (< 1800 s gap)
    for i in range(300):
        rows.append((eid, 1, t0 + dt.timedelta(seconds=10 * i)))
        eid += 1
    # user 2: two same-timestamp events then a gap then a single event
    rows.append((eid, 2, t0)); eid += 1
    rows.append((eid, 2, t0)); eid += 1
    rows.append((eid, 2, t0 + dt.timedelta(seconds=5000))); eid += 1
    spark.createDataFrame(
        [(e, u, ts, "click", 1.0, "{}") for e, u, ts in rows],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    e04 = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in events.e04_sessionize(spark, str(tmp_path)).collect()
    )
    ptr = sorted(
        map(
            tuple,
            events._e14_pointer_jumping(spark, str(tmp_path)).collect(),
        )
    )
    assert ptr == e04
    assert any(n == 300 for _, _, _, n in ptr)  # the long chain survived


def test_bucketed_rolling_equals_range_frame(spark, sf_dir):
    """e16's bounded-partition rolling (own-bucket cumulative +
    prev-bucket descending probe scan) is row-identical to e13's
    native sliding RANGE frame — two formulations, one contract; the
    bucketed form is the one whose window partitions stay one user-DAY
    under a hot key (SCALE.md §6o).  Since r15 the bucketed plan IS
    e13's registered plan; the native frame stays in-tree as the
    diagnostic twin this test pins against."""
    a = sorted(
        map(tuple, events.e13_rolling_24h_native(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, events.e16_rolling_24h_bucketed(spark, sf_dir).collect())
    )
    assert a == b and len(a) > 0


def test_bucketed_rolling_boundary_ties(spark, tmp_path):
    """Planted boundary fixture for e16's two delicate orderings: an
    event EXACTLY 24h before another (inclusive left boundary — must
    count) and duplicate timestamps (tie-inclusive cumulative — every
    tied row sees all its ties), both straddling a day-bucket edge."""
    import datetime as dt

    base = dt.datetime(2024, 3, 10, 0, 0, 30)  # 30 s into a UTC day
    day = dt.timedelta(hours=24)
    rows = [
        # u1: e2 at base+day, e1 exactly 24h earlier (prev bucket,
        # inclusive), e0 one µs before the frame (must NOT count)
        (1, 10, base - dt.timedelta(microseconds=1), 1.0),
        (2, 10, base, 2.0),
        (3, 10, base + day, 4.0),
        # u2: duplicate timestamps straddling nothing — tie inclusion
        (4, 20, base, 8.0),
        (5, 20, base, 16.0),
    ]
    spark.createDataFrame(
        [(e, u, t, v, "click", "{}") for (e, u, t, v) in rows],
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        (r["user_id"], r["ts"], r["n_24h"], r["sum_24h"])
        for r in events.e16_rolling_24h_bucketed(
            spark, str(tmp_path)
        ).collect()
    }
    expect = {
        (10, rows[0][2], 1, 1.0),
        (10, base, 2, 3.0),          # e0 + e1 (same bucket)
        (10, base + day, 2, 6.0),    # e1 (exactly 24h back) + e2, NOT e0
        (20, base, 2, 24.0),         # both ties see both rows
        (20, base, 2, 24.0),
    }
    assert got == expect
    # and the native frame agrees on the same fixture
    native = {
        (r["user_id"], r["ts"], r["n_24h"], r["sum_24h"])
        for r in events.e13_rolling_24h_native(spark, str(tmp_path)).collect()
    }
    assert native == got


def test_bucketed_rolling_pre_epoch_and_null_values(spark, tmp_path):
    """Pins the two ADVICE-r12 latent divergences in one fixture.

    (a) Pre-1970 timestamps: with truncating ``div``, bucket 0 spans
    TWO day-widths (−24h, +24h), so e16's own-bucket cumulative counts
    events up to 48h back — the exact floor-division bucket key keeps
    the "frame spans own bucket or previous" invariant over the full
    long domain.  (b) NULL values: a frame SUM is NULL only when the
    frame holds NO non-null values, so an all-NULL own-bucket prefix
    plus a non-NULL prev-bucket window must yield the prev-bucket sum,
    and an all-NULL frame must yield NULL."""
    import datetime as dt

    rows = [
        # u10 — pre-epoch day-bucket edge: e3's 24h frame contains e2
        # but NOT e1; under truncating div all three share bucket 0 and
        # the own-cumulative overcounts e3 as 3.
        (1, 10, dt.datetime(1969, 12, 31, 0, 0, 30), 1.0),
        (2, 10, dt.datetime(1969, 12, 31, 23, 0, 0), 2.0),
        (3, 10, dt.datetime(1970, 1, 1, 1, 0, 0), 4.0),
        # u20 — NULL own-bucket prefix, non-NULL prev-bucket window
        # (crosses a day edge so s_own is NULL while s_ge is not).
        (4, 20, dt.datetime(2024, 3, 9, 23, 0, 0), 8.0),
        (5, 20, dt.datetime(2024, 3, 10, 1, 0, 0), None),
        # u30 — all-NULL frame: sum_24h must be NULL, count still 1.
        (6, 30, dt.datetime(2024, 3, 10, 12, 0, 0), None),
    ]
    spark.createDataFrame(
        [(e, u, t, v, "click", "{}") for (e, u, t, v) in rows],
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        (r["user_id"], r["ts"], r["n_24h"], r["sum_24h"])
        for r in events.e16_rolling_24h_bucketed(
            spark, str(tmp_path)
        ).collect()
    }
    expect = {
        (10, rows[0][2], 1, 1.0),
        (10, rows[1][2], 2, 3.0),
        (10, rows[2][2], 2, 6.0),   # e2 + e3 only — e1 is 24.5h back
        (20, rows[3][2], 1, 8.0),
        (20, rows[4][2], 2, 8.0),   # NULL own prefix + prev-bucket 8.0
        (30, rows[5][2], 1, None),  # all-NULL frame stays NULL
    }
    assert got == expect
    # the native RANGE frame (bucket-free, null-ignoring) agrees
    native = {
        (r["user_id"], r["ts"], r["n_24h"], r["sum_24h"])
        for r in events.e13_rolling_24h_native(spark, str(tmp_path)).collect()
    }
    assert native == got
    # and the fused one-pass candidate agrees on the same edge fixture
    fused = {
        (r["user_id"], r["ts"], r["n_24h"], r["sum_24h"])
        for r in events._e16_fused_two_frame(spark, str(tmp_path)).collect()
    }
    assert fused == got


def test_e13_registered_plan_is_bucketed(spark, sf_dir):
    """r15 adoption pin (VERDICT r14 ask #1): the registered e13 must
    run the bucketed formulation — its physical plan carries NO
    sliding 24h RANGE frame (the native twin's O(n·frame) shape) and
    DOES carry the bucketed form's cumulative frames."""
    plan = (
        events.e13_rolling_24h(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "-86400000000" not in plan  # the native RANGE frame bound
    assert "unboundedpreceding" in plan.lower()  # cumulative frames


def test_fused_two_frame_equals_e16(spark, sf_dir):
    """The fused one-pass candidate (r12 ask #6) must be row-identical
    to e16 (and hence e13) — measured decision on which plan e16 uses
    lives in SCALE.md §6s; equivalence is the precondition either way."""
    a = sorted(
        map(tuple, events.e16_rolling_24h_bucketed(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, events._e16_fused_two_frame(spark, sf_dir).collect())
    )
    assert a == b and len(a) > 0


def test_interval_join_pre_epoch_buckets(spark, tmp_path):
    """e08's 30-min bucket key must pair a pre-epoch click with a
    post-epoch purchase 20 min later (the explode-two-buckets invariant
    relies on exact floor division around zero)."""
    import datetime as dt

    rows = [
        (1, 40, dt.datetime(1969, 12, 31, 23, 50, 0), 0.0, "click"),
        (2, 40, dt.datetime(1970, 1, 1, 0, 10, 0), 5.0, "purchase"),
    ]
    spark.createDataFrame(
        [(e, u, t, v, k, "{}") for (e, u, t, v, k) in rows],
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = events.e08_interval_join(spark, str(tmp_path)).collect()
    assert [(r["user_id"], r["n_pairs"], r["attributed_value"]) for r in out] == [
        (40, 1, 5.0)
    ]


def test_variant_props_equal_json_extract(spark, sf_dir):
    """x01 (VARIANT parse-once probe) matches e01 (per-path
    get_json_object) row for row — same contract, Spark-4-native type."""
    from aind_smartspim_data_transformation_spark.plans import extras

    a = sorted(map(tuple, events.e01_json_extract(spark, sf_dir).collect()))
    b = sorted(map(tuple, extras.x01_variant_props(spark, sf_dir).collect()))
    assert a == b


def test_recursive_sessions_duplicate_timestamps(spark, tmp_path):
    """Two events of one user at the SAME timestamp must not fork the
    recursive chain: the chain links on a per-user row number, so the
    tied events count once each in one session."""
    from datetime import datetime as dt

    import duckdb

    rows = [
        (1, dt(2024, 1, 1, 10, 0), 7, "click", 1.0, "{}"),
        (2, dt(2024, 1, 1, 10, 0), 7, "click", 1.0, "{}"),   # tied ts
        (3, dt(2024, 1, 1, 10, 10), 7, "click", 1.0, "{}"),
        (4, dt(2024, 1, 1, 12, 0), 7, "click", 1.0, "{}"),   # new session
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    got = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in events.e14_sessions_rcte(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (7, dt(2024, 1, 1, 10, 0), dt(2024, 1, 1, 10, 10), 3),
        (7, dt(2024, 1, 1, 12, 0), dt(2024, 1, 1, 12, 0), 1),
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    assert sorted(map(tuple, con.execute(events.ORACLE["e14_sessions_recursive"]).fetchall())) == sorted(got)


def test_recursive_sessions_guard_scoped_to_cloned_session(spark, sf_dir):
    """e14 sizes spark.sql.cteRecursionRowLimit to its input, but the
    loosened guard must live in e14's CLONED session only: the
    caller's session conf is untouched before AND after the collect,
    and no `_e14_events` temp view leaks into the caller's namespace
    (r8 judge finding: a plain conf.set persisted for the session and
    every later rCTE inherited the loosened guard)."""
    key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(key)
    df = events.e14_sessions_rcte(spark, sf_dir)
    assert spark.conf.get(key) == before  # unchanged at build time
    assert df.count() > 0  # executes under the scoped (loosened) guard
    assert spark.conf.get(key) == before  # unchanged after execution
    assert not any(
        t.name == "_e14_events" for t in spark.catalog.listTables()
    )


def test_recursive_sessions_clone_mirrors_parent_confs(spark, sf_dir):
    """ADVICE r9: a newSession() clone's SQLConf initializes from the
    SparkContext, not the parent's runtime conf — a harness override
    (ANSI sweep, session timezone) must still reach e14's execution.
    Also pins the conf-keyed clone CACHE (one SessionState per
    (parent, conf combination), reused while the confs are stable,
    NEVER mutated in place — a conf flip after an e14 call must not
    retroactively change what a still-lazy earlier DataFrame executes
    under) and the monotone recursion guard."""
    from aind_smartspim_data_transformation_spark.plans.events import (
        _E14_SCOPED,
        _e14_scoped_session,
    )

    before = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        df = events.e14_sessions_rcte(spark, sf_dir)
        _, scoped = _E14_SCOPED[spark]
        assert scoped.conf.get("spark.sql.ansi.enabled") == "true"
        assert df.count() > 0  # executes under the mirrored ANSI conf
        # cache: a second call under UNCHANGED confs reuses the clone
        assert _e14_scoped_session(spark) is scoped
        # monotone guard: a smaller later input never re-tightens the
        # limit a still-lazy earlier DataFrame will execute under
        lim = int(scoped.conf.get("spark.sql.cteRecursionRowLimit"))
        scoped.conf.set("spark.sql.cteRecursionRowLimit", str(lim + 7))
        events.e14_sessions_rcte(spark, sf_dir)
        assert (
            int(scoped.conf.get("spark.sql.cteRecursionRowLimit"))
            == lim + 7
        )
        # a conf CHANGE yields a FRESH clone; the old clone's conf is
        # untouched for whoever still holds its DataFrames
        spark.conf.set("spark.sql.ansi.enabled", "false")
        fresh = _e14_scoped_session(spark)
        assert fresh is not scoped
        assert fresh.conf.get("spark.sql.ansi.enabled") == "false"
        assert scoped.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", before)


def test_e10_gap_fill_planted_gaps_and_leading_nulls(spark, tmp_path):
    """e10 (VERDICT r10 ask #7): the sf corpora are dense enough that
    the sf-level rows rarely exercise the two edge behaviors the locf
    contract exists for — multi-day gaps carrying the LAST observation
    forward, and a user whose first event postdates the global d0
    (leading grid days have NOTHING to carry: filled_value NULL, not
    0).  Plant both, plus a %10-excluded user who must not widen the
    bounds, and hold the result to the DuckDB oracle."""
    from datetime import date, datetime as dt

    import duckdb

    rows = [
        # user 0: events on day 1 and day 5 — days 2-4 are a gap
        (1, dt(2024, 1, 1, 10, 0), 0, "click", 1.5, "{}"),
        (2, dt(2024, 1, 5, 9, 30), 0, "click", 2.5, "{}"),
        # user 10: first event on day 3 — days 1-2 are a LEADING gap
        (3, dt(2024, 1, 3, 8, 0), 10, "view", 7.0, "{}"),
        # user 3: fails user_id % 10 == 0 — excluded, even though its
        # event (day 7) would otherwise stretch d1
        (4, dt(2024, 1, 7, 8, 0), 3, "view", 9.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = events.e10_gap_fill(spark, str(tmp_path)).collect()
    # bounds come from the FILTERED set: 5 grid days × 2 users
    assert len(got) == 10
    by_key = {(r["user_id"], r["day"]): r for r in got}
    assert set(by_key) == {
        (u, date(2024, 1, d)) for u in (0, 10) for d in range(1, 6)
    }
    # user 0: gap days carry 1.5 forward; day 5 switches to 2.5
    for d in (2, 3, 4):
        r = by_key[(0, date(2024, 1, d))]
        assert r["n_events"] == 0 and r["filled_value"] == 1.5
    assert by_key[(0, date(2024, 1, 5))]["filled_value"] == 2.5
    # user 10: leading days have nothing to carry — NULL, never 0.0
    for d in (1, 2):
        r = by_key[(10, date(2024, 1, d))]
        assert r["n_events"] == 0 and r["filled_value"] is None
    for d in (3, 4, 5):
        assert by_key[(10, date(2024, 1, d))]["filled_value"] == 7.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    oracle = con.execute(events.ORACLE["e10_gap_fill"]).fetchall()
    assert sorted(
        (r["user_id"], r["day"], r["n_events"], r["filled_value"])
        for r in got
    ) == sorted(map(tuple, oracle))
