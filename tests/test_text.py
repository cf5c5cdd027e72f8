"""Text-analysis operators vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import text
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_vs_oracle(spark, sf_dir, name):
    df = text.QUERIES[name](spark, sf_dir)
    compare(df, text.ORACLE[name], sf_dir, name)


def test_char_entropy_known_values(spark, tmp_path):
    """t11 on closed-form cases: uniform-1 char → 0 nats, uniform-2 →
    ln 2, uniform-4 → ln 4."""
    docs = [(0, "aaaa"), (1, "abab"), (2, "abcd")]
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in text.t11_char_entropy(spark, str(tmp_path)).collect()}
    assert rows[0]["entropy_nats"] == 0.0
    assert rows[1]["entropy_nats"] == 0.6931  # round(ln 2, 4)
    assert rows[2]["entropy_nats"] == 1.3863  # round(ln 4, 4)
    assert rows[2]["n_distinct_chars"] == 4


def test_char_entropy_empty_doc_emits_no_row(spark, tmp_path):
    """An empty document must vanish from t11 in BOTH engines: Spark's
    sequence(1, 0) is the descending [1, 0] (not empty), which without
    the length guard fabricates char rows the oracle never sees."""
    import duckdb

    docs = [(0, ""), (1, "ab")]
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = sorted(map(tuple, text.t11_char_entropy(spark, str(tmp_path)).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(con.execute(text.ORACLE["t11_char_entropy"]).fetchall())
    assert got == want
    assert [r[0] for r in got] == [1]  # only the non-empty doc survives
