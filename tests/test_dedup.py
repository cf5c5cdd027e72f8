"""Dedup operators vs the DuckDB oracle + sanity on planted near-dups."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import dedup
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_vs_oracle(spark, sf_dir, name):
    df = dedup.QUERIES[name](spark, sf_dir)
    compare(df, dedup.ORACLE[name], sf_dir, name)


def test_components_cover_pairs(spark, sf_dir):
    """d08: both endpoints of every near-dup pair resolve into one
    component, every component has ≥2 docs, and the component id is its
    own minimum member."""
    pairs = dedup.d03_dedup_minhash_lsh(spark, sf_dir).collect()
    comps = dedup.d08_dup_components(spark, sf_dir).collect()
    assert all(r["n_docs"] >= 2 for r in comps)
    assert all(r["component"] < r["max_doc"] for r in comps)
    n_nodes = len({d for r in pairs for d in (r["doc1"], r["doc2"])})
    assert sum(r["n_docs"] for r in comps) == n_nodes


def test_near_dups_found(spark, sf_dir):
    """The synthetic corpus has planted near-dup pairs (jaccard ≈ 0.99)."""
    rows = dedup.d03_dedup_minhash_lsh(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["jaccard"] >= dedup.JACCARD_THRESHOLD for r in rows)


def test_star_components_equal_label_propagation(spark, sf_dir):
    """d09 (large-star/small-star, O(log n) rounds) and d08 (label
    propagation, O(diameter) rounds) must produce identical clusters."""
    a = [tuple(r) for r in dedup.d08_dup_components(spark, sf_dir).collect()]
    b = [tuple(r) for r in dedup.d09_dup_components_star(spark, sf_dir).collect()]
    assert a == b


def test_star_components_path_graph(spark):
    """A 6-node path (worst case for label propagation's diameter bound)
    collapses to one component labeled by its minimum."""
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (40, 50), (50, 60), (70, 80)],
        "doc1 long, doc2 long",
    )
    got = {
        (r["node"], r["label"])
        for r in connected_components_star(pairs).collect()
    }
    assert got == {
        (10, 10), (20, 10), (30, 10), (40, 10), (50, 10), (60, 10),
        (70, 70), (80, 70),
    }


def test_minhash_degenerate_bucket_cap(spark, tmp_path):
    """A corpus of identical docs lands in one giant band bucket; the
    MAX_BAND_BUCKET cap drops it before pair expansion (boilerplate is
    not near-duplication), in Spark and the oracle identically."""
    import duckdb

    n = dedup.MAX_BAND_BUCKET + 36
    text = "alpha beta gamma delta epsilon zeta eta theta"
    spark.createDataFrame(
        [(i, text, "en", "src0", len(text)) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = dedup.d03_dedup_minhash_lsh(spark, str(tmp_path)).collect()
    assert got == []  # capped: no quadratic blowup, no pairs
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    assert con.execute(dedup.ORACLE["d03_dedup_minhash_lsh"]).fetchall() == []


def test_substring_coverage_planted_span(spark, tmp_path):
    """d10: a 12-token verbatim run shared by two docs yields ONE merged
    span of exactly 12 tokens in each (five overlapping 8-token windows
    collapse into one island); a doc sharing nothing is absent."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"  # 12 tokens
    docs = [
        (0, "pre1 pre2 " + shared + " tailA1 tailA2 tailA3"),
        (1, shared + " tailB1 tailB2 tailB3 tailB4 tailB5"),
        (2, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in dedup.d10_substring_coverage(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {0, 1}
    for d in (0, 1):
        assert rows[d]["n_spans"] == 1
        assert rows[d]["dup_tokens"] == 12
        assert rows[d]["n_dup_windows"] == 5  # positions 0..4 within the run
    assert rows[0]["n_tokens"] == 17 and rows[1]["n_tokens"] == 17
    assert rows[0]["dup_ppm"] == 12 * 1_000_000 // 17
