"""Training-corpus prep operators (split / pack / chunk) vs DuckDB;
UDTF chunker vs the native expression."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import corpus
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(corpus.QUERIES))
def test_corpus_vs_oracle(spark, sf_dir, name):
    df = corpus.QUERIES[name](spark, sf_dir)
    compare(df, corpus.ORACLE[name], sf_dir, name)


def test_split_is_deterministic_and_total(spark, sf_dir):
    """Every doc lands in exactly one split, and rerunning reassigns
    identically (content-stable hash, not rand)."""
    from pyspark.sql import functions as F

    a = corpus.c01_train_split(spark, sf_dir).collect()
    b = corpus.c01_train_split(spark, sf_dir).collect()
    assert a == b
    n_docs = sum(r["n_docs"] for r in a)
    total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert n_docs == total
    splits = {r["split"] for r in a}
    assert splits == {"train", "val", "test"}
    # hash split should put the bulk in train (12/16 expected)
    train = sum(r["n_docs"] for r in a if r["split"] == "train")
    assert 0.6 < train / total < 0.9
    del F


def test_pack_respects_token_budget_startwise(spark, sf_dir):
    """A doc's bin is where its first token lands: tokens-before-doc
    within its (lang, seq) never exceeds SEQ_LEN."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
    ).withColumn("before", F.sum("n_tok").over(w) - F.col("n_tok"))
    packed = toks.withColumn("seq_id", F.floor(F.col("before") / corpus.SEQ_LEN))
    bad = packed.filter(
        (F.col("before") - F.col("seq_id") * corpus.SEQ_LEN) >= corpus.SEQ_LEN
    )
    assert bad.count() == 0


def test_chunk_udtf_matches_native(spark, sf_dir):
    """The Spark 4 Python UDTF chunker is row-identical to the native
    sequence/slice expression path."""
    native = sorted(map(tuple, corpus.c03_chunk_windows(spark, sf_dir).collect()))
    via_udtf = sorted(map(tuple, corpus.chunk_windows_udtf(spark, sf_dir).collect()))
    assert native == via_udtf


def test_chunker_properties_hypothesis():
    """Property-test the chunking kernel over random token streams (the
    UDTF eval is pure Python; tests above assert it row-identical to
    the native Spark expression, so these properties transfer)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aind_smartspim_data_transformation_spark.operators.corpus import (
        CHUNK_STRIDE,
        CHUNK_TOKS,
    )

    token = st.text(alphabet="abcxyz", min_size=1, max_size=4)

    @given(st.lists(token, min_size=1, max_size=300))
    @settings(max_examples=200, deadline=None)
    def check(toks):
        text = " ".join(toks)
        chunks = [
            toks[s : s + CHUNK_TOKS] for s in range(0, len(toks), CHUNK_STRIDE)
        ]
        # count: exactly ceil(n / stride)
        n = len(toks)
        assert len(chunks) == -(-n // CHUNK_STRIDE)
        # sizes: full CHUNK_TOKS except possibly trailing chunks
        assert all(len(c) <= CHUNK_TOKS for c in chunks)
        assert all(
            len(chunks[i]) == CHUNK_TOKS
            for i in range(len(chunks))
            if i * CHUNK_STRIDE + CHUNK_TOKS <= n
        )
        # coverage: every token index appears in ≥1 chunk
        covered = {
            s + j for s in range(0, n, CHUNK_STRIDE)
            for j in range(min(CHUNK_TOKS, n - s))
        }
        assert covered == set(range(n))
        # consecutive chunks overlap by exactly CHUNK_TOKS-CHUNK_STRIDE
        for i in range(len(chunks) - 1):
            if (i + 1) * CHUNK_STRIDE + CHUNK_TOKS <= n + (CHUNK_TOKS - CHUNK_STRIDE):
                a_end = i * CHUNK_STRIDE + len(chunks[i])
                b_start = (i + 1) * CHUNK_STRIDE
                assert a_end - b_start in range(0, CHUNK_TOKS - CHUNK_STRIDE + 1)
        # reconstruction: stride-prefixes of chunks concatenate to text
        prefix = [t for i, c in enumerate(chunks) for t in c[:CHUNK_STRIDE]]
        assert " ".join(prefix) == text

    check()


def test_c08_handles_short_docs(spark, tmp_path):
    """Docs with fewer than CONTAM_N tokens produce zero shingles
    instead of crashing: Spark's sequence(1, 0) is the DESCENDING
    [1, 0], and slice(w, 0, n) raises — regression for the guard in
    c08_contamination."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # (doc_id, text, source) — ids divisible by EVAL_MOD are eval
        (0, "alpha beta gamma delta", "src0"),   # eval
        (50, "x", "src0"),                       # eval, 1 token
        (1, "alpha beta gamma delta", "src0"),   # train, contaminated
        (2, "x y", "src1"),                      # train, 2 tokens (crash case)
        (3, "z", "src1"),                        # train, 1 token
        (4, "alpha beta gamma", "src1"),         # train, contaminated
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {r["source"]: r for r in corpus.c08_contamination(spark, str(tmp_path)).collect()}
    assert out["src0"]["n_train"] == 1 and out["src0"]["n_contaminated"] == 1
    assert out["src1"]["n_train"] == 3 and out["src1"]["n_contaminated"] == 1
    # matches the DuckDB oracle on the same tiny table (oracle's
    # generate_series(1, 0) is empty — semantics now agree)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    o_rows = con.execute(corpus.ORACLE["c08_contamination"]).fetchall()
    s_rows = sorted(
        tuple(r)
        for r in corpus.c08_contamination(spark, str(tmp_path)).collect()
    )
    assert s_rows == sorted(map(tuple, o_rows))


def test_chunks_cover_and_overlap(spark, sf_dir):
    """Chunk starts tile every doc: stride apart, full CHUNK_TOKS except
    the tail, and token coverage is complete."""
    from pyspark.sql import functions as F

    df = corpus.c03_chunk_windows(spark, sf_dir)
    per_doc = df.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"), F.max("n_tok").alias("max_tok")
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    )
    joined = per_doc.join(docs, "doc_id")
    # expected chunk count = ceil(n_tok / stride)
    bad = joined.filter(
        F.col("n_chunks")
        != F.ceil(F.col("n_tok") / F.lit(corpus.CHUNK_STRIDE))
    )
    assert bad.count() == 0
    assert df.filter(F.col("n_tok") > corpus.CHUNK_TOKS).count() == 0


def test_pii_redaction_planted(spark, tmp_path):
    """c10: emails/IPs/phones are replaced with typed placeholders, the
    counts are right, and the DuckDB oracle agrees on a corpus that
    actually CONTAINS PII (the synthetic corpus has none)."""
    import duckdb

    from pyspark.sql import functions as F

    docs = [
        (0, "contact bob.smith+x@example.co.uk for details", "src0"),
        (1, "server at 192.168.1.254 then call 555-867-5309 now", "src0"),
        (2, "plain text with no pii at all", "src1"),
        (3, "two mails a@b.io c@d.org and ip 10.0.0.1", "src1"),
    ]
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    red = {
        r["doc_id"]: r["red"]
        for r in spark.createDataFrame(
            [(i, t) for i, t, _ in docs], "doc_id long, text string"
        )
        .select("doc_id", corpus.redact_pii(F.col("text")).alias("red"))
        .collect()
    }
    assert red[0] == "contact <EMAIL> for details"
    assert red[1] == "server at <IP> then call <PHONE> now"
    assert red[2] == "plain text with no pii at all"
    assert red[3] == "two mails <EMAIL> <EMAIL> and ip <IP>"

    got = sorted(
        map(tuple, corpus.c10_pii_redaction(spark, str(tmp_path)).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(con.execute(corpus.ORACLE["c10_pii_redaction"]).fetchall())
    assert got == want
    by_src = {r[0]: r for r in got}
    # (source, n_docs, n_emails, n_ips, n_phones, chars_removed)
    assert by_src["src0"][1:5] == (2, 1, 1, 1)
    assert by_src["src1"][1:5] == (2, 2, 1, 0)


def test_c11_ht_unbiased(spark, sf_dir):
    """c11's Horvitz-Thompson weights estimate the corpus total.

    Two checks, per the round-4 advisor finding (the tau branch never
    fired because tau was compared 2^32 off-unit):

    1. Monte-Carlo over the EXACT integer formula (priority =
       (w<<24) div u, u uniform on [1, 2^32]; ht = max(w, 256*tau)):
       the mean of sum(ht_weight) over many independent u draws must
       sit within a few percent of the true sum(n_chars) — this is the
       unbiasedness property the docstring promises, and it fails by
       ~3 orders of magnitude under the pre-fix formula.
    2. The actual md5-seeded Spark sample's estimate lands within the
       k=20 sampling-noise band of the truth (single realization, so
       the band is loose: DLT relative std ~ 1/sqrt(k-1)).
    """
    import numpy as np
    from pyspark.sql import functions as F

    w = np.array(
        [
            r["n_chars"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("n_chars")
            .collect()
        ],
        dtype=np.int64,
    )
    true_total = int(w.sum())
    k = corpus.SAMPLE_K
    rng = np.random.default_rng(7)
    estimates = []
    for _ in range(400):
        u = rng.integers(1, 2**32 + 1, size=w.size, dtype=np.int64)
        pri = (w << 24) // u
        order = np.argsort(-pri, kind="stable")
        tau = pri[order[k]]
        top = order[:k][pri[order[:k]] > tau]
        estimates.append(int(np.maximum(w[top], 256 * tau).sum()))
    mean = float(np.mean(estimates))
    assert abs(mean / true_total - 1.0) < 0.05, (mean, true_total)

    got = corpus.c11_priority_sample(spark, sf_dir)
    est = got.agg(F.sum("ht_weight")).collect()[0][0]
    assert 0.3 < est / true_total < 3.0, (est, true_total)
