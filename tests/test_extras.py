"""Late-registered (plans/extras.py) queries vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.plans import extras
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(extras.QUERIES))
def test_extras_vs_oracle(spark, sf_dir, name):
    df = extras.QUERIES[name](spark, sf_dir)
    compare(df, extras.ORACLE[name], sf_dir, name)


def test_hll_registers_merge_by_max(spark):
    """The HLL mergeability claim, directly: registers built from two
    disjoint halves of the corpus, merged by per-bucket max, must equal
    the whole-corpus registers (the property shard-parallel and
    streaming HLL rely on)."""
    from pyspark.sql import functions as F

    from aind_smartspim_data_transformation_spark.operators.dedup import (
        _shingle_rows_raw,
    )
    from aind_smartspim_data_transformation_spark.operators.sketch import (
        hll_registers,
    )
    from tests.conftest import SF_SMOKE

    sh = _shingle_rows_raw(spark, SF_SMOKE).select(
        F.col("sh").alias("token"), "doc_id"
    )

    def regs(df):
        # the PRODUCTION register pipeline — the property test must
        # exercise the real hash/bucket/rho formulas
        return {r["bucket"]: r["r"] for r in hll_registers(df).collect()}

    whole = regs(sh)
    a = regs(sh.filter("doc_id % 2 = 0"))
    b = regs(sh.filter("doc_id % 2 = 1"))
    merged: dict = {}
    for part in (a, b):
        for k, v in part.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_x07_gap_week_yields_no_drift_row(spark, tmp_path):
    """Calendar semantics (round-5 advisor fix): the previous week is
    week - 7 days by self-join.  With weeks W1, W2, W4 observed (W3
    empty), only W2 gets a drift row — W4 must NOT silently compare
    against W2."""
    import datetime as dt

    def wk(n, h=0):  # Monday of week n, hour h
        return dt.datetime(2024, 1, 1, h) + dt.timedelta(weeks=n)

    rows = []
    eid = 0
    for week, mix in [(0, {"a": 3, "b": 1}), (1, {"a": 1, "b": 3}),
                      (3, {"a": 2, "b": 2})]:
        for t, cnt in mix.items():
            for i in range(cnt):
                rows.append((eid, 1, t, wk(week, h=i + 1), 1.0, "{}"))
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["week"]: r["tvd_ppm"]
        for r in extras.x07_weekly_drift(spark, str(tmp_path)).collect()
    }
    # only W2 (2024-01-08) has a true previous calendar week
    assert list(got) == [dt.date(2024, 1, 8)]
    # mix flips 750k/250k -> 250k/750k: TVD = 500000 ppm
    assert got[dt.date(2024, 1, 8)] == 500_000


def test_n12_planted_intra_vs_cross_duplicates(spark, tmp_path):
    """Known-answer fixture: oracle agreement cannot catch a semantic
    bug shared by both engines, so plant exact duplicates with known
    locality.  src_a: 4 docs, 2 sharing a text only within src_a
    (intra).  src_b: 3 docs, 1 text shared WITH src_c (cross).  src_c:
    2 docs, 1 cross with src_b.  src_d: 1 unique doc."""
    rows = [
        (1, "aaa", "en", "src_a", 3),
        (2, "aaa", "en", "src_a", 3),   # intra dup of 1
        (3, "bbb", "en", "src_a", 3),
        (4, "ccc", "en", "src_a", 3),
        (5, "xxx", "en", "src_b", 3),   # cross dup with src_c
        (6, "yyy", "en", "src_b", 3),
        (7, "zzz", "en", "src_b", 3),
        (8, "xxx", "en", "src_c", 3),   # cross dup with src_b
        (9, "www", "en", "src_c", 3),
        (10, "vvv", "en", "src_d", 3),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: (
            r["n_docs"], r["intra_dup_docs"], r["cross_dup_docs"],
            r["intra_ppm"], r["cross_ppm"],
        )
        for r in extras.n12_source_dup_profile(spark, str(tmp_path)).collect()
    }
    assert got == {
        "src_a": (4, 2, 0, 500_000, 0),
        "src_b": (3, 0, 1, 0, 333_333),
        "src_c": (2, 0, 1, 0, 500_000),
        "src_d": (1, 0, 0, 0, 0),
    }


def test_n09_planted_shared_shingles(spark, tmp_path):
    """Known-answer fixture for the contamination matrix: two sources
    share exactly one 8-token shingle window's worth of text; a third
    shares nothing.  9-token docs → 2 windows each; the shared 8-gram
    is windows[0] of both sharers."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (1, shared + " tailA", "en", "s1", 9),
        (2, shared + " tailB", "en", "s2", 9),
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9", "en", "s3", 9),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = extras.n09_cross_source_contamination(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # each doc has 2 windows → vocab 2 per source; 1 shared of min(2,2)
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert r["overlap_ppm"] == 500_000


def test_n13_planted_chain_merge(spark, tmp_path):
    """A planted A~B~C chain where A and C share nothing directly:
    the cluster audit must report 3 members, 2 direct pairs of the 3
    possible — coverage 666666 ppm — exposing the transitive merge."""
    # A and C are B with DIFFERENT 4-token edits (head vs tail):
    # J(A,B) = J(B,C) = 0.871 ≥ 0.8 threshold, J(A,C) = 0.758 < 0.8 —
    # so the verify pass keeps exactly the chain edges and the star
    # clustering transitively merges all three.
    b_toks = [f"t{i}" for i in range(60)]
    a_toks = ["x0", "x1", "x2", "x3"] + b_toks[4:]
    c_toks = b_toks[:56] + ["y0", "y1", "y2", "y3"]
    mk = " ".join
    rows = [
        (1, mk(a_toks), "en", "s", 100),
        (2, mk(b_toks), "en", "s", 100),
        (3, mk(c_toks), "en", "s", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        d03_dedup_minhash_lsh,
    )

    pairs = {
        (r["doc1"], r["doc2"])
        for r in d03_dedup_minhash_lsh(spark, str(tmp_path)).collect()
    }
    if pairs != {(1, 2), (2, 3)}:
        import pytest as _pytest

        _pytest.skip(f"LSH drew {pairs}; chain fixture needs (1,2),(2,3)")
    out = extras.n13_cluster_merge_qa(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["component"], r["n_members"], r["n_direct_pairs"]) == (1, 3, 2)
    assert r["coverage_ppm"] == 666_666


def test_n16_week_index_parity_pre_epoch(spark):
    """n16's week index must agree with the oracle even for pre-epoch
    timestamps.  DuckDB's integer // TRUNCATES toward zero (-3 // 7 =
    0, -8 // 7 = -1 — measured, not floor), and Spark's cast('long')
    on the float quotient truncates identically — this pins BOTH
    engines' behavior so a future 'fix' to floor semantics on either
    side fails loudly (a review suggested floor() here; it would have
    silently diverged)."""
    import datetime

    import duckdb
    from pyspark.sql import functions as F

    rows = [
        (1, datetime.datetime(2023, 12, 29, 12)),   # datediff -3 → week 0
        (2, datetime.datetime(2023, 12, 25)),       # -7 → -1
        (3, datetime.datetime(2023, 12, 24, 23)),   # -8 → -1
        (4, datetime.datetime(2024, 1, 1)),         # 0 → 0
        (5, datetime.datetime(2024, 1, 8)),         # 7 → 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp").select(
        "user_id",
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long") / 7)
        .cast("long")
        .alias("week"),
    )
    got = {r["user_id"]: r["week"] for r in df.collect()}
    con = duckdb.connect()
    want = {
        u: con.execute(
            "SELECT (CAST(? AS DATE) - DATE '2024-01-01') // 7", [ts]
        ).fetchone()[0]
        for u, ts in rows
    }
    assert got == want == {1: 0, 2: -1, 3: -1, 4: 0, 5: 1}


def test_x05_bloom_planted_cross_split_member(spark, tmp_path):
    """x05 (VERDICT r10 ask #7): at the sf levels the train/test split
    shares essentially no shingles, so n_true_members is a constant 0
    and the membership machinery (per-shingle ALL-positions-hit, the
    no-false-negative guarantee, the FP subtraction) is never
    exercised.  Plant a shingle that spans the split: doc_ids 4/6 hash
    into the train bucket (md5 first hex < 'c'), 3/5 into test
    (>= 'e'), 0 into neither; doc 3 shares the 3-token run
    'alpha beta gamma' with train doc 4 — exactly one true member,
    which Bloom must hit (no false negatives, structurally)."""
    import duckdb

    from aind_smartspim_data_transformation_spark.operators import sketch

    rows = [
        (4, "alpha beta gamma delta", "en", "s", 22),       # train
        (6, "koalas eat leaves daily", "en", "s", 23),      # train
        (3, "zeta alpha beta gamma", "en", "s", 21),        # test: member
        (5, "completely different words here", "en", "s", 32),  # test
        (0, "alpha beta gamma delta", "en", "s", 22),       # neither split
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    [got] = sketch.x05_bloom_crosscorpus(spark, str(tmp_path)).collect()
    assert got["n_train_keys"] == 4   # 2 shingles per 4-token train doc
    assert got["n_test_keys"] == 4
    assert got["n_true_members"] == 1
    # Bloom never misses a true member; with ≤16 set bits of 65536 a
    # false positive needs all 4 lanes covered (p ~ 4e-15) — so the
    # hit count is exactly the member count here.
    assert got["n_bloom_hits"] == 1
    assert got["n_false_pos"] == 0 and got["fp_ppm"] == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    [oracle] = con.execute(sketch.ORACLE["x05_bloom_crosscorpus"]).fetchall()
    assert tuple(got) == oracle
