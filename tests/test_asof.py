"""Unit tests for the union-window as-of join (operators/asof.py).

Regression coverage for the inner-join NULL-payload bug: the match
filter must act on the carried struct ``_m`` itself, not on any single
payload column — a right row whose first payload column is legitimately
NULL is still a match.  The pre-fix code filtered on
``_m.<first payload col> IS NOT NULL`` and silently dropped such rows.
"""

from __future__ import annotations

from pyspark.sql import Row

from aind_smartspim_data_transformation_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lts=10, lval="L1"),
            Row(k="a", lts=25, lval="L2"),
            Row(k="b", lts=5, lval="L3"),  # no earlier right row → unmatched
            Row(k="b", lts=40, lval="L4"),
        ]
    )
    right = spark.createDataFrame(
        [
            # first payload column (p1) NULL on the a/8 row on purpose
            Row(k="a", rts=8, p1=None, p2=100),
            Row(k="a", rts=20, p1="r2", p2=200),
            Row(k="b", rts=30, p1=None, p2=300),
        ],
        schema="k string, rts long, p1 string, p2 long",
    )
    return left, right


def test_asof_left_basic(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["p1", "p2"],
    )
    rows = {(r["k"], r["lts"]): (r["p1"], r["p2"]) for r in out.collect()}
    assert rows[("a", 10)] == (None, 100)  # nearest earlier: rts=8
    assert rows[("a", 25)] == ("r2", 200)  # nearest earlier: rts=20
    assert rows[("b", 5)] == (None, None)  # unmatched, payload nulls
    assert rows[("b", 40)] == (None, 300)  # nearest earlier: rts=30


def test_asof_inner_keeps_null_first_payload_column(spark):
    """The regression: matched rows whose FIRST payload column is NULL
    must survive an inner as-of join."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["p1", "p2"], how="inner",
    )
    rows = {(r["k"], r["lts"]): (r["p1"], r["p2"]) for r in out.collect()}
    # (a,10) matches the rts=8 row with p1=NULL — the bug dropped it.
    assert ("a", 10) in rows and rows[("a", 10)] == (None, 100)
    # (b,40) matches rts=30, also p1=NULL.
    assert ("b", 40) in rows and rows[("b", 40)] == (None, 300)
    # (b,5) has no earlier right row → correctly dropped by inner.
    assert ("b", 5) not in rows
    assert len(rows) == 3


def test_asof_right_tie_matches_one_row(spark):
    """Two right rows at the same ts <= lts: exactly one match is
    produced (which of the tied rows wins is unspecified, as in DuckDB's
    ASOF JOIN — the greatest-ts set has no further ordering)."""
    left = spark.createDataFrame([Row(k="a", lts=10, lval="L")])
    right = spark.createDataFrame(
        [Row(k="a", rts=10, p=1), Row(k="a", rts=10, p=2)]
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["p"], how="inner",
    )
    got = [r["p"] for r in out.collect()]
    assert len(got) == 1 and got[0] in (1, 2)
