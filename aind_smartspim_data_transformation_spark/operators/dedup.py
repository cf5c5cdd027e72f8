"""Deduplication operators over the ``documents`` table.

[driver-ext] LLM-data-pipeline dedup family (SURVEY.md §2.11):

- d01 exact (content-digest groupBy),
- d02 n-gram Jaccard (shingle inverted-index join, stop-gram capped),
- d03 MinHash + LSH (shingle → minhash → band bucket → verify),
- d04 SimHash signatures (token-hash bit voting),
- d05 embedding-cosine (hyperplane-LSH bucketed),
- d06 materialized deduplicated corpus (keepers minus near-dup losers),
- d07 SimHash hamming pairs (pigeonhole bands, bit_count verify),
- d15 LSH saturation audit (what d03's bucket cap dropped),
- d16 saturated-bucket recall recovery (K-representative pairing).

Everything is pure DataFrame algebra — no Python in the hot path.  The
hash family is ``md5(i || '|' || shingle)``: identical strings hash
identically in Spark and DuckDB, so even the MinHash/LSH pipeline has
an exact SQL oracle twin (the oracle replays the same algorithm, not a
brute-force approximation).

Scale posture (100 TB of documents):
- Exact dedup: one shuffle on a 256-bit digest — the digest groupBy is
  the canonical web-scale dedup (map-side partial agg applies).
- Inverted-index Jaccard: shuffle on shingle; hot shingles (stop-grams)
  are the skew risk — at scale drop shingles whose doc-frequency
  exceeds a cap before the self-join (AQE skew-join splits the rest).
- MinHash/LSH: the scale path — candidate generation touches only
  (n_docs × n_bands) rows instead of all pairs; band self-join
  shuffles on the band key.
- SimHash: one explode + one groupBy; 16-bit key join for candidates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aind_smartspim_data_transformation_spark.tables import (
    load_table,
    spread_unsplittable_scan,
)

N_MINHASH = 16
N_BANDS = 8  # r = 2 rows per band
JACCARD_THRESHOLD = 0.8
# Degenerate-bucket cap: a band bucket larger than this is boilerplate
# (identical/empty text), not near-duplication — drop it before the
# quadratic in-bucket pair expansion.  Bounds LSH worst-case pair count.
MAX_BAND_BUCKET = 64
MAX_SHINGLE_DF = 100  # stop-gram cap for the inverted-index join (d02)


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan, round-robin spread when the file cannot split
    (r15, guide §2.5): the tokenize→md5 pipelines above this scan are
    the dominant per-task cost of the dedup family, and the one-file
    testdata layout would serialize them onto a single task."""
    return spread_unsplittable_scan(load_table(spark, sf_dir, "documents"))

# 3-word shingles.  toks[i] is 0-based in Spark SQL.  Dedup happens
# relationally AFTER explode: array_distinct() is O(n²) per array and
# measured 5-10× slower than a hash distinct at ~1k tokens/doc.
_SHINGLES = (
    "transform(sequence(0, size(toks) - 3), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
)


def _shingle_rows_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) — 3-word shingles WITH duplicates (no pre-shuffle
    beyond the conditional unsplittable-scan spread)."""
    docs = _docs_spread(spark, sf_dir)
    return (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLES)).alias("sh"))
    )


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) — distinct 3-word shingles per document."""
    return _shingle_rows_raw(spark, sf_dir).distinct()


# ---------------------------------------------------------------------------
# D1 — exact dedup via content digest.
# ---------------------------------------------------------------------------
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(F.sha2(F.col("text"), 256).alias("digest")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id")
    )
    return groups.agg(
        F.count("*").alias("n_distinct_texts"),
        F.sum("n_copies").alias("n_docs"),
        F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies") - 1).otherwise(0)).alias(
            "n_redundant"
        ),
    )


D01_SQL = """
WITH groups AS (
  SELECT sha256(text) AS digest, count(*) AS n_copies, min(doc_id) AS keeper_doc_id
  FROM documents GROUP BY sha256(text)
)
SELECT count(*) AS n_distinct_texts,
       CAST(sum(n_copies) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_redundant
FROM groups
"""


# ---------------------------------------------------------------------------
# D2 — n-gram Jaccard near-dup via shingle inverted index.
# ---------------------------------------------------------------------------
def d02_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_rows(spark, sf_dir)
    # Stop-gram guard (SCALE.md §4): a shingle present in > MAX_SHINGLE_DF
    # docs is boilerplate, not evidence of duplication — and it is exactly
    # the key that blows up the inverted-index self-join (a DF-10⁶ shingle
    # alone contributes 10¹² pairs).  Dropped BEFORE the join, identically
    # in the oracle, so jaccard is computed over discriminative shingles.
    hot = (
        sh.groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("sh")
    )
    sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2"))
    jac = F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (
        common.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc1", "doc2", "common", "jaccard")
        .orderBy("doc1", "doc2")
    )


D02_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM toks
), kept AS (
  SELECT * FROM sh WHERE sh NOT IN (
    SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) > 100)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2, common,
       round(common / (sa.n_sh + sb.n_sh - common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc1
JOIN sizes sb ON sb.doc_id = doc2
WHERE round(common / (sa.n_sh + sb.n_sh - common), 4) >= {JACCARD_THRESHOLD}
ORDER BY doc1, doc2
"""


# ---------------------------------------------------------------------------
# D3 — MinHash + LSH near-dup.
# minhash_i(doc) = min over shingles of md5(i || '|' || shingle);
# band_j = (minhash_2j, minhash_2j+1); candidates share any band;
# candidates verified with true Jaccard.  The oracle replays the SAME
# algorithm (same hash family) — deterministic on both engines.
# ---------------------------------------------------------------------------
def minhash_band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, bkey) LSH band rows for any (doc_id, text)
    DataFrame — the signature pipeline shared by batch d03 and the
    streaming incremental detector (streaming/docs_stream.py); the two
    paths MUST bucket identically or stream-vs-batch parity breaks.

    16 minhashes from only 4 md5 evaluations: each 128-bit digest is
    split into 4 independent 32-bit (8-hex) lanes — 4× less hashing
    than 16 per-function md5 calls, the dominant cost at scale.  Raw
    (multiset) shingles: min() is duplicate-insensitive, so no
    distinct before the partial agg.
    """
    sh = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLES)).alias("sh"))
    )
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(F.md5(F.concat(F.lit(f"{i // 4}|"), F.col("sh"))), 8 * (i % 4) + 1, 8)
            ).alias(f"h{i}")
            for i in range(N_MINHASH)
        ]
    )
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        F.concat(F.col(f"h{2 * j}"), F.col(f"h{2 * j + 1}")).alias("bkey"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.bkey")


def minhash_band_rows_narrow(docs: DataFrame) -> DataFrame:
    """Per-ROW variant of :func:`minhash_band_rows`: the minima come
    from ``array_min`` over the in-row shingle array instead of an
    explode + groupBy — zero aggregation, zero shuffle.

    Same hash family, same minima, identical (doc_id, band_id, bkey)
    rows (asserted in tests/test_docs_stream.py).  This is the variant
    a STREAMING pipeline needs: a streaming groupBy(doc_id) is a
    stateful aggregation (unsupported in append mode without a
    watermark, and pointless state — each doc arrives whole), while a
    narrow map composes freely with the downstream stateful bucket
    operator.  Batch keeps the agg form (partial-agg bundles shingle
    hashing across the scan); per-doc work is identical either way.
    """
    shs = "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
    out = docs.withColumn("toks", F.split("text", " ")).filter(
        F.size("toks") >= 3
    )
    lanes = [
        F.expr(
            f"transform({shs}, sh -> md5(concat('{k}|', sh)))"
        ).alias(f"lane{k}")
        for k in range(N_MINHASH // 4)
    ]
    out = out.select("doc_id", *lanes)
    hs = [
        F.array_min(
            F.expr(f"transform(lane{i // 4}, d -> substring(d, {8 * (i % 4) + 1}, 8))")
        ).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    sigs = out.select("doc_id", *hs)
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        F.concat(F.col(f"h{2 * j}"), F.col(f"h{2 * j + 1}")).alias("bkey"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.bkey")


# In-bucket i<j pair expansion over the sorted member array.  The
# capped variant limits the OUTER loop to the first K_SAT_REPS members
# (the K smallest doc_ids): work and output are K·n per bucket — linear
# in bucket size — and because every member pairs with the minimum-id
# representative, a saturated family stays one connected component
# under d08/d09 (connectivity recall is total; only member–member
# edges beyond the reps are sacrificed).
_PAIRS_IN_BUCKET = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc1, y AS doc2))))"
)
K_SAT_REPS = 8  # representatives per saturated bucket (d16)
_PAIRS_CAPPED = (
    f"flatten(transform(slice(ids, 1, {K_SAT_REPS}), (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc1, y AS doc2))))"
)


def _verify_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    cand: DataFrame,
    broadcast_pairs: bool = True,
) -> DataFrame:
    """d03's verify phase: exact jaccard over candidate pairs, keeping
    only pairs ≥ JACCARD_THRESHOLD.  (d16 used to share this; since
    r13 it verifies through `_verify_jaccard_pairs_digest_collapsed`,
    which is equivalence-tested against this one — d03 keeps the
    simpler form because its unsaturated candidate set is
    replica-light by construction.)

    Verification touches only candidate docs: broadcast-semi-filter the
    *documents* table down BEFORE tokenize/shingle/explode — the verify
    pass never re-scans non-candidate text (candidates ≪ corpus, so
    the per-doc distinct is near-free here).  ``broadcast_pairs``
    controls whether the pair table itself is broadcast into the two
    set joins: right for d03 (unsaturated candidates are small by
    construction), wrong for d16 on a boilerplate-heavy corpus where
    recovered pairs can reach K·n per family — d16 passes False and
    takes shuffle joins."""
    cand_docs = (
        cand.select(F.col("doc1").alias("doc_id"))
        .union(cand.select(F.col("doc2")))
        .distinct()
    )
    docs_cand = _docs_spread(spark, sf_dir).join(
        F.broadcast(cand_docs), "doc_id"
    )
    # one shingle-SET per candidate doc (collect_set dedups in the agg);
    # each pair's jaccard is then a narrow array_intersect expression —
    # no shingle-level equi-join, no per-pair groupBy, no size joins.
    sets = (
        docs_cand.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLES)).alias("sh"))
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("shs"))
    )
    s1 = sets.select(F.col("doc_id").alias("doc1"), F.col("shs").alias("shs1"))
    s2 = sets.select(F.col("doc_id").alias("doc2"), F.col("shs").alias("shs2"))
    common = F.size(F.array_intersect("shs1", "shs2"))
    jac = common / (F.size("shs1") + F.size("shs2") - common)
    pairs = F.broadcast(cand) if broadcast_pairs else cand
    return (
        pairs.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc1", "doc2", "jaccard")
        .orderBy("doc1", "doc2")
    )


def _verify_jaccard_pairs_digest_collapsed(
    spark: SparkSession, sf_dir: str, cand: DataFrame
) -> DataFrame:
    """d16's verify phase with d06's digest collapse composed in
    (VERDICT r12 ask #1): byte-identical texts are jaccard 1.0 by
    definition, so candidate pairs whose sha-256 digests agree are
    emitted DIRECTLY and never reach the shingle join — on a
    boilerplate-replicated corpus (exactly where d16's saturated
    buckets appear) that is most of the recovered-pair volume.  The
    remaining cross-digest pairs are verified at DIGEST granularity:
    shingle sets are built once per distinct eligible digest (one
    representative doc each, any rep works — jaccard is a function of
    text alone), jaccard is computed once per distinct UNORDERED
    digest pair — (least, greatest)-canonicalized before the distinct,
    so neither orientation of a pair verifies twice (ADVICE r13) —
    and the verdict joins back to the doc-level pairs.
    Verify volume drops from O(pairs) shingle-set replications to
    O(distinct digest pairs); the emitted result set is IDENTICAL to
    `_verify_jaccard_pairs` (asserted in tests/test_dedup.py).

    Eligibility mirrors the shared verify exactly: a doc with fewer
    than 3 tokens has no shingle set and never appears in output —
    same-digest pairs carry the same text on both sides, so one
    eligibility bit decides the pair; cross-digest ineligible digests
    simply have no rep-set row and drop out of the joins.

    Joins stay shuffle-side (never broadcast): recovered pairs reach
    K·n per saturated family and the digest/rep tables are
    candidate-sized — same posture as d16's pre-collapse verify.
    """
    cand_docs = (
        cand.select(F.col("doc1").alias("doc_id"))
        .union(cand.select(F.col("doc2")))
        .distinct()
    )
    docs_cand = _docs_spread(spark, sf_dir).join(
        F.broadcast(cand_docs), "doc_id"
    )
    dmap = docs_cand.select(
        "doc_id",
        F.sha2("text", 256).alias("dg"),
        (F.size(F.split("text", " ")) >= 3).alias("eligible"),
    ).persist()  # consumed 3× (pair sides + rep election); released by
    # the harness's clearCache() between queries — SCALE.md §6q.
    p = cand.join(
        dmap.select(
            F.col("doc_id").alias("doc1"),
            F.col("dg").alias("dg1"),
            F.col("eligible").alias("el1"),
        ),
        "doc1",
    ).join(
        dmap.select(F.col("doc_id").alias("doc2"), F.col("dg").alias("dg2")),
        "doc2",
    )
    same = p.filter((F.col("dg1") == F.col("dg2")) & F.col("el1")).select(
        "doc1", "doc2", F.lit(1.0).alias("jaccard")
    )
    # Canonicalize the digest pair BEFORE the distinct (ADVICE r13):
    # doc1<doc2 does not order the digests, so the same unordered
    # digest pair can reach dver in both orientations and be verified
    # twice — correct (jaccard is symmetric) but up to 2× the distinct-
    # digest-pair work the O(distinct digest pairs) claim implies.
    # least/greatest keys the verify and the join-back identically.
    cross = p.filter(F.col("dg1") != F.col("dg2")).select(
        "doc1",
        "doc2",
        F.least("dg1", "dg2").alias("dga"),
        F.greatest("dg1", "dg2").alias("dgb"),
    )
    # one rep doc per eligible digest; shingle sets keyed by digest
    reps = dmap.filter("eligible").groupBy("dg").agg(
        F.min("doc_id").alias("doc_id")
    )
    rep_sets = (
        docs_cand.join(reps, "doc_id")
        .withColumn("toks", F.split("text", " "))
        .select("dg", F.explode(F.expr(_SHINGLES)).alias("sh"))
        .groupBy("dg")
        .agg(F.collect_set("sh").alias("shs"))
    )
    s1 = rep_sets.select(F.col("dg").alias("dga"), F.col("shs").alias("shs1"))
    s2 = rep_sets.select(F.col("dg").alias("dgb"), F.col("shs").alias("shs2"))
    common = F.size(F.array_intersect("shs1", "shs2"))
    jac = common / (F.size("shs1") + F.size("shs2") - common)
    dver = (
        cross.select("dga", "dgb")
        .distinct()
        .join(s1, "dga")
        .join(s2, "dgb")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("dga", "dgb", "jaccard")
    )
    verified = cross.join(dver, ["dga", "dgb"]).select(
        "doc1", "doc2", "jaccard"
    )
    return same.unionByName(verified).orderBy("doc1", "doc2")


def _full_signatures(docs_cand: DataFrame) -> DataFrame:
    """(doc_id, sig): the FULL 16-minhash signature per eligible doc,
    concatenated into one 128-hex-char key.  Same hash family and
    lane-split as `minhash_band_rows` (4 md5 evaluations → 16 lanes),
    so two docs share `sig` iff they agree on every minhash — the
    co-bucket-in-all-8-bands condition, a far stronger agreement than
    any single band key.  Ineligible docs (<3 tokens) have no row."""
    sh = (
        docs_cand.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLES)).alias("sh"))
    )
    mins = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"{i // 4}|"), F.col("sh"))),
                8 * (i % 4) + 1,
                8,
            )
        ).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.concat(*[F.col(f"h{i}") for i in range(N_MINHASH)]).alias(
                "sig"
            ),
        )
    )


def _verify_jaccard_pairs_signature_collapsed(
    spark: SparkSession, sf_dir: str, cand: DataFrame
) -> DataFrame:
    """d16's verify with the collapse key raised from content digest to
    full minhash SIGNATURE (VERDICT r13 ask #3, flag path
    `collapse="signature"` — DEFAULT OFF, see `d16_lsh_recovered_pairs`).

    Where the digest collapse only merges byte-identical replicas, this
    merges near-identical boilerplate too: one-token-differing variants
    of a long template usually agree on all 16 minhashes (the varied
    token touches 3 of ~n shingles, so each minhash survives with prob
    ≈ (n-3)/n and the full signature with prob ≈ ((n-3)/n)^16), so a
    million-variant template family collapses to O(distinct signatures)
    shingle sets instead of one per distinct digest.

    APPROXIMATE BY DESIGN — this changes emitted values, which is why
    the registered d16 contract stays on the digest path:
    - same-signature pairs are emitted as jaccard 1.0 without shingle
      verification (their true jaccard is typically 0.97–1.0 but can
      sit below threshold — minhash agreement is evidence, not proof:
      a below-threshold pair at true jaccard j slips through at the
      textbook rate j^16, MEASURED at 2.68% worst case for j = 0.798
      and falling to 2e-5 by j = 0.51, length-independent —
      tools/d16_sig_false_rate.py, artifact
      tools/d16_sig_false_rate_r14.json);
    - cross-signature pairs carry their signature-REPRESENTATIVES'
      jaccard, not their own (within-family variance folds onto the
      rep pair's value).
    On a corpus whose near-dup families are exact replicas the output
    is identical to the digest path (asserted in tests/test_dedup.py).

    Join posture mirrors the digest path exactly: shuffle-side joins
    (recovered pairs reach K·n per family), canonicalized (least,
    greatest) signature pairs before the distinct, eligibility via the
    inner join to `sig` rows (<3-token docs have no signature and no
    output, same as the digest path's eligibility bit)."""
    cand_docs = (
        cand.select(F.col("doc1").alias("doc_id"))
        .union(cand.select(F.col("doc2")))
        .distinct()
    )
    docs_cand = _docs_spread(spark, sf_dir).join(
        F.broadcast(cand_docs), "doc_id"
    )
    sigs = _full_signatures(docs_cand).persist()  # consumed 3× (pair
    # sides + rep election); released by the harness's clearCache()
    # between queries — SCALE.md §6q.
    p = cand.join(
        sigs.select(F.col("doc_id").alias("doc1"), F.col("sig").alias("sg1")),
        "doc1",
    ).join(
        sigs.select(F.col("doc_id").alias("doc2"), F.col("sig").alias("sg2")),
        "doc2",
    )
    same = p.filter(F.col("sg1") == F.col("sg2")).select(
        "doc1", "doc2", F.lit(1.0).alias("jaccard")
    )
    cross = p.filter(F.col("sg1") != F.col("sg2")).select(
        "doc1",
        "doc2",
        F.least("sg1", "sg2").alias("sga"),
        F.greatest("sg1", "sg2").alias("sgb"),
    )
    reps = sigs.groupBy("sig").agg(F.min("doc_id").alias("doc_id"))
    rep_sets = (
        docs_cand.join(reps, "doc_id")
        .withColumn("toks", F.split("text", " "))
        .select("sig", F.explode(F.expr(_SHINGLES)).alias("sh"))
        .groupBy("sig")
        .agg(F.collect_set("sh").alias("shs"))
    )
    s1 = rep_sets.select(F.col("sig").alias("sga"), F.col("shs").alias("shs1"))
    s2 = rep_sets.select(F.col("sig").alias("sgb"), F.col("shs").alias("shs2"))
    common = F.size(F.array_intersect("shs1", "shs2"))
    jac = common / (F.size("shs1") + F.size("shs2") - common)
    dver = (
        cross.select("sga", "sgb")
        .distinct()
        .join(s1, "sga")
        .join(s2, "sgb")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("sga", "sgb", "jaccard")
    )
    verified = cross.join(dver, ["sga", "sgb"]).select(
        "doc1", "doc2", "jaccard"
    )
    return same.unionByName(verified).orderBy("doc1", "doc2")


def d03_dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, observation=None
) -> DataFrame:
    # The signature pipeline (minhash_band_rows) is consumed exactly
    # once — the verify pass below re-shingles only candidate docs —
    # so nothing here needs caching.
    bands = minhash_band_rows(_docs_spread(spark, sf_dir))
    # Candidate pairs by grouping each band bucket and expanding i<j
    # combinations in-bucket — ONE pass over the signature pipeline and
    # one shuffle on the band key, where a bands⋈bands self-join would
    # compute the minhash aggregation twice (once per side) and shuffle
    # both.  Bucket membership lists are tiny by construction (a bucket
    # = docs agreeing on 64 bits of minhash); the MAX_BAND_BUCKET cap
    # drops degenerate buckets (empty/boilerplate text all hashing
    # identically) BEFORE the quadratic pair expansion, bounding the
    # worst case at |buckets|·K² instead of a runaway bucket's n² —
    # identical clause in the oracle, no-op on non-degenerate corpora
    # (max observed bucket here is 13).  Recall the cap sacrifices is
    # observable via d15 and recoverable via d16.
    grouped = bands.groupBy("band_id", "bkey").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    if observation is not None:
        # Zero-extra-scan form of d15 (VERDICT r11 "what's wrong" #3):
        # the saturation counters ride d03's OWN bucket aggregate via an
        # Observation — metrics materialize on the same execution that
        # computes the pairs, before the size filter prunes saturated
        # buckets.  Values are definitionally d15's (asserted equal in
        # tests/test_dedup.py); pass a pyspark Observation and read
        # observation.get after an action on the returned plan.
        # CAVEAT: if the query's final result is EMPTY, AQE's
        # empty-relation propagation can elide this observed aggregate
        # from the executed plan and the metrics row comes back empty —
        # the registry d15 query is the unconditional form.
        sz = F.size("ids")
        sat = sz > MAX_BAND_BUCKET
        grouped = grouped.observe(
            observation,
            F.coalesce(F.sum(F.when(sat, F.lit(1)).otherwise(F.lit(0))), F.lit(0))
            .cast("bigint")
            .alias("n_saturated_buckets"),
            F.coalesce(F.sum(F.when(sat, sz).otherwise(F.lit(0))), F.lit(0))
            .cast("bigint")
            .alias("n_band_rows_dropped"),
            F.coalesce(F.max(sz), F.lit(0)).cast("bigint").alias("max_bucket_rows"),
        )
    # r9 ABAB (VERDICT r8 ask #6): pinning this exchange to
    # parallelism/4 fat reducers LOST all 4 interleaved pairs at sf0.1
    # (11.8–12.7 s vs 11.5–11.8 s query wall; NOTES_r09) — AQE's
    # post-shuffle coalesce already right-sizes the tiny exchange, and
    # the explicit repartition only forfeits map-side planning.  The
    # ~1 s scheduling slack d03 carries at sf0.1 stays attributed to
    # stage scheduling, not reducer count; plan unchanged.
    cand = (
        grouped.filter((F.size("ids") > 1) & (F.size("ids") <= MAX_BAND_BUCKET))
        .select(F.explode(F.expr(_PAIRS_IN_BUCKET)).alias("p"))
        .select("p.doc1", "p.doc2")
        .distinct()
        # consumed twice (pair join + cand_docs); released by the
        # harness's clearCache() between queries — see the cache-
        # hygiene policy in SCALE.md §6q and registry.all_queries().
        .persist()
    )
    return _verify_jaccard_pairs(spark, sf_dir, cand, broadcast_pairs=True)


def d16_lsh_recovered_pairs(
    spark: SparkSession, sf_dir: str, collapse: str = "digest"
) -> DataFrame:
    """d03 with bounded recall inside saturated buckets (VERDICT r11
    "what's missing" #1 / ask #2): where d03 DROPS a band bucket larger
    than MAX_BAND_BUCKET (losing every LSH pair of a >64-way near-dup
    family — boilerplate-heavy crawl data hits this constantly), d16
    pairs the K_SAT_REPS smallest doc_ids in the bucket with every
    later member instead.  Work and output stay K·n per saturated
    bucket (linear in bucket size, vs the n² the cap exists to
    prevent), and because the minimum-id member is always a
    representative, every family member acquires a verified edge to it
    — the family reconstitutes as ONE component under d08/d09, so
    corpus-level dedup recall is fully recovered; only redundant
    member–member edges are sacrificed.  Unsaturated buckets expand
    exactly as d03 (d16 ⊇ d03 row-for-row); verify is the exact
    jaccard with d06's digest collapse composed in (r13, VERDICT r12
    ask #1): byte-identical pairs short-circuit to 1.0 and cross-text
    pairs verify once per distinct digest pair — see
    `_verify_jaccard_pairs_digest_collapsed`.  On a corpus with no
    saturated buckets d16 ≡ d03 — the
    planted >64-way-family fixture (tests/test_dedup.py) pins the
    recovery: d03 returns zero pairs, d16 returns the rep-pair set,
    oracle-matched."""
    cand = _d16_candidates(spark, sf_dir)
    # Recovered pairs can reach K·n per boilerplate family — too big to
    # force-broadcast; the digest-collapsed verify joins shuffle.
    # collapse="signature" (r14, VERDICT r13 ask #3) raises the
    # collapse key to the full 16-minhash signature — near-identical
    # boilerplate merges too, but emitted jaccard values become
    # approximate (see `_verify_jaccard_pairs_signature_collapsed`),
    # so the registered contract stays on the exact digest default.
    if collapse == "signature":
        return _verify_jaccard_pairs_signature_collapsed(
            spark, sf_dir, cand
        )
    return _verify_jaccard_pairs_digest_collapsed(spark, sf_dir, cand)


def _d16_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d16's candidate-pair set (d03's expansion + the K·n capped
    branch for saturated buckets).  Split out so the verify-volume
    instrumentation (tools/d16_verify_volume.py) measures EXACTLY the
    candidate stream d16 verifies."""
    bands = minhash_band_rows(_docs_spread(spark, sf_dir))
    pair_branch = (
        f"CASE WHEN size(ids) <= {MAX_BAND_BUCKET} THEN {_PAIRS_IN_BUCKET} "
        f"ELSE {_PAIRS_CAPPED} END"
    )
    return (
        bands.groupBy("band_id", "bkey")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(F.expr(pair_branch)).alias("p"))
        .select("p.doc1", "p.doc2")
        .distinct()
        # consumed twice (pair join + cand_docs); released by the
        # harness's clearCache() — SCALE.md §6q.
        .persist()
    )


def d15_lsh_saturation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability twin for d03's MAX_BAND_BUCKET clause (VERDICT r10
    "what's wrong" #2): d03 silently drops band buckets larger than the
    cap — correct against runaway boilerplate, but it also means a
    >64-way NEAR-dup family loses its LSH recall with no trace.  This
    audit surfaces what the cap dropped: the count of saturated
    buckets, the band-row volume inside them, and the largest bucket
    seen — all from the same bucket-size aggregate d03 already
    computes, so the figures are definitionally the ones d03 acted on.
    One row always (zeros on a healthy corpus)."""
    bands = minhash_band_rows(_docs_spread(spark, sf_dir))
    sizes = bands.groupBy("band_id", "bkey").agg(F.count("*").alias("n"))
    sat = F.col("n") > MAX_BAND_BUCKET
    return sizes.agg(
        F.coalesce(
            F.sum(F.when(sat, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).cast("bigint").alias("n_saturated_buckets"),
        F.coalesce(
            F.sum(F.when(sat, F.col("n")).otherwise(F.lit(0))), F.lit(0)
        ).cast("bigint").alias("n_band_rows_dropped"),
        F.coalesce(F.max("n"), F.lit(0)).cast("bigint").alias(
            "max_bucket_rows"
        ),
    )


_MINHASH_COLS = ",\n         ".join(
    f"min(substring(md5('{i // 4}|' || sh), {8 * (i % 4) + 1}, 8)) AS h{i}"
    for i in range(N_MINHASH)
)
_BAND_STRUCTS = ", ".join(
    f"{{'band_id': {j}, 'bkey': h{2 * j} || h{2 * j + 1}}}" for j in range(N_BANDS)
)

# Shared CTE prefix (tokenize → shingle → minhash sigs → band rows →
# bucket sizes): D03_SQL consumes it for the pair listing, D15_SQL for
# the saturation audit — one definition so the two oracles can never
# drift apart on the signature pipeline.
_BANDS_CTE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM toks
), sigs AS (
  SELECT doc_id,
         {_MINHASH_COLS}
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, unnest([{_BAND_STRUCTS}], recursive := true)
  FROM sigs
), bsz AS (
  SELECT band_id, bkey, count(*) AS n FROM bands GROUP BY band_id, bkey
)"""

D15_SQL = f"""
{_BANDS_CTE}
SELECT CAST(coalesce(sum(CASE WHEN n > {MAX_BAND_BUCKET} THEN 1 END), 0) AS BIGINT) AS n_saturated_buckets,
       CAST(coalesce(sum(CASE WHEN n > {MAX_BAND_BUCKET} THEN n END), 0) AS BIGINT) AS n_band_rows_dropped,
       CAST(coalesce(max(n), 0) AS BIGINT) AS max_bucket_rows
FROM bsz
"""

# Shared verify tail (expects a `cand(doc1, doc2)` CTE in scope):
# exact jaccard over the distinct-shingle rows, identical for D03/D16
# so the two oracles can never drift apart on verification semantics.
_VERIFY_SQL_TAIL = f""", sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT c.doc1, c.doc2, count(*) AS common
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc1
  JOIN sh s2 ON s2.doc_id = c.doc2 AND s2.sh = s1.sh
  GROUP BY c.doc1, c.doc2
)
SELECT doc1, doc2, round(common / (sa.n_sh + sb.n_sh - common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc1
JOIN sizes sb ON sb.doc_id = doc2
WHERE round(common / (sa.n_sh + sb.n_sh - common), 4) >= {JACCARD_THRESHOLD}
ORDER BY doc1, doc2
"""

D03_SQL = f"""
{_BANDS_CTE}, cand AS (
  SELECT DISTINCT ba.doc_id AS doc1, bb.doc_id AS doc2
  FROM bands ba JOIN bands bb
    ON ba.band_id = bb.band_id AND ba.bkey = bb.bkey AND ba.doc_id < bb.doc_id
  JOIN bsz ON bsz.band_id = ba.band_id AND bsz.bkey = ba.bkey
  WHERE bsz.n <= {MAX_BAND_BUCKET}
){_VERIFY_SQL_TAIL}"""

# d16: same unsaturated branch as D03, plus the K-representative
# recovery branch over saturated buckets — reps are the K smallest
# doc_ids per bucket (row_number over doc_id asc), each paired with
# every strictly-larger member, exactly the Spark `_PAIRS_CAPPED`
# expansion.  UNION dedups a pair that is unsaturated in one band and
# recovered in another.
D16_SQL = f"""
{_BANDS_CTE}, cand AS (
  SELECT DISTINCT ba.doc_id AS doc1, bb.doc_id AS doc2
  FROM bands ba JOIN bands bb
    ON ba.band_id = bb.band_id AND ba.bkey = bb.bkey AND ba.doc_id < bb.doc_id
  JOIN bsz ON bsz.band_id = ba.band_id AND bsz.bkey = ba.bkey
  WHERE bsz.n <= {MAX_BAND_BUCKET}
  UNION
  SELECT DISTINCT r.doc_id AS doc1, m.doc_id AS doc2
  FROM (
    SELECT b.band_id, b.bkey, b.doc_id,
           row_number() OVER (PARTITION BY b.band_id, b.bkey
                              ORDER BY b.doc_id) AS rn
    FROM bands b
    JOIN bsz ON bsz.band_id = b.band_id AND bsz.bkey = b.bkey
    WHERE bsz.n > {MAX_BAND_BUCKET}
  ) r
  JOIN bands m
    ON m.band_id = r.band_id AND m.bkey = r.bkey AND m.doc_id > r.doc_id
  WHERE r.rn <= {K_SAT_REPS}
){_VERIFY_SQL_TAIL}"""


# ---------------------------------------------------------------------------
# D4 — SimHash: 16-bit signature by token-hash bit voting; docs sharing
# a signature are near-dup candidates.  Token hash = first 8 hex chars
# of md5 as an integer — identical in Spark and DuckDB.
# ---------------------------------------------------------------------------
def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — 16-bit token-vote signatures (d04/d07)."""
    docs = _docs_spread(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn("th", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"shiftright(th, {j}) & 1 = 1"), 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(16)
        ]
    )
    simhash = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return votes.select("doc_id", simhash.alias("simhash"))


def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # group_size via groupBy + join (map-side combine + AQE-splittable
    # probe), not an analytic window: a corpus of near-identical docs
    # collapses to ONE simhash, and `count OVER (PARTITION BY simhash)`
    # would funnel every such row through a single window partition.
    # The counts table is bounded by the signature space (≤ 2¹⁶ rows
    # for 16-bit simhash) → always broadcastable: the doc-level table
    # is never shuffled at all.
    sigs = _simhash_sigs(spark, sf_dir)
    sizes = sigs.groupBy(F.col("simhash").alias("g_simhash")).agg(
        F.count("*").alias("group_size")
    )
    return (
        sigs.join(F.broadcast(sizes), sigs["simhash"] == F.col("g_simhash"))
        .select("doc_id", "simhash", "group_size")
        .orderBy("doc_id")
    )


_SIMHASH_VOTES = ",\n         ".join(
    f"sum(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(16)
)
_SIMHASH_SUM = " + ".join(
    f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16)
)

D04_SQL = f"""
WITH tok AS (
  SELECT doc_id, ('0x' || substring(md5(unnest(string_split(text, ' '))), 1, 8))::BIGINT AS th
  FROM documents
), votes AS (
  SELECT doc_id,
         {_SIMHASH_VOTES}
  FROM tok GROUP BY doc_id
), sigs AS (
  SELECT doc_id, {_SIMHASH_SUM} AS simhash FROM votes
)
SELECT doc_id, simhash, count(*) OVER (PARTITION BY simhash) AS group_size
FROM sigs ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# D5 — embedding-cosine near-dup: pairs of vectors in the same
# random-hyperplane LSH bucket with exact cosine ≥ threshold.  The LSH
# bucket (8 deterministic hyperplanes, shared with operators/similarity)
# is the scale path: candidate generation is one groupBy on the bucket
# key — never an all-pairs crossJoin of the corpus — and the exact
# cosine re-check runs only within buckets.  The oracle replays the
# identical hyperplane formula, so this too is hash-verifiable.
# ---------------------------------------------------------------------------
EMB_DUP_THRESHOLD = 0.9


def d05_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators import similarity as S

    e = load_table(spark, sf_dir, "embeddings")
    # per-row bucket expression: no explode, no shuffle (similarity.py).
    # r15 measured: a scan spread here is a WASH (the folds are cheap);
    # the cost is the post-shuffle pair loop below, fixed by the
    # explicit AQE-exempt join repartition (see `cross`).
    wb = e.withColumn("bucket", S._bucket_expr())
    # FAT-GROUP GUARD (r10, same class as n07's fat-cell collapse):
    # group EXACT-duplicate vectors before the pair loop, run the
    # interpreted cosine (zip_with/aggregate are CodegenFallback — the
    # dominant cost) once per DISTINCT vector pair, then re-expand to
    # id-level pairs.  The listing contract is preserved exactly: a
    # cross-group id pair inherits its groups' cosine (float dot/mul
    # are commutative bitwise, so operand order never matters), and
    # intra-group pairs get the selfcos of the shared vector through
    # the identical expression tree (finite nonzero → rounds to 1.0;
    # a zero-norm vector → NULL via the divisor guard below, dropped
    # by the threshold filter on both engines; a NaN-COMPONENT vector
    # → NaN cosine, which both Spark and DuckDB order GREATER than any
    # number, so round(NaN,6) ≥ threshold is TRUE on both — such a
    # vector would EMIT pairs, identically in query and oracle, so
    # parity holds either way; NaN embeddings are out-of-domain for
    # the synthetic corpus).  A verbatim-replicated corpus (the 100×
    # sweep regime) thus pays base-corpus cosine work plus
    # output-sized expansion, not multiplicity² interpreted loops.
    # Group width = exact-copy multiplicity of ONE vector (not a
    # bucket of distinct docs — the d07 OOM class), so the collected
    # ids array is small by construction; norms are per-VECTOR (r9:
    # per-pair norm evaluation did 3× the array work of dot alone).
    groups = (
        wb.groupBy("bucket", "embedding")
        .agg(
            F.array_sort(F.collect_list("vec_id")).alias("ids"),
            F.min("vec_id").alias("rep"),
        )
        .withColumn("nrm", F.sqrt(S._norm_sq("embedding")))
    )
    # r15 (n07's pair-loop lesson applied here, measured 2.4×: 2.52 s
    # → 1.05 s at sf0.1, 3/3 interleaved reps): the pair loop is
    # quadratic interpreted-cosine WORK over tiny INPUT bytes, the
    # shape AQE coalesces onto ~1 task.  Explicit repartition is
    # AQE-exempt and satisfies the join's clustering, so the loop runs
    # as parallel tasks at any corpus size; pair set unchanged.
    n_parts = 4 * spark.sparkContext.defaultParallelism
    a = groups.select(
        "bucket", F.col("rep").alias("rep_a"),
        F.col("embedding").alias("va"), F.col("ids").alias("ids_a"),
        F.col("nrm").alias("na"),
    ).repartition(n_parts, "bucket")
    b = groups.select(
        F.col("bucket").alias("bucket_b"), F.col("rep").alias("rep_b"),
        F.col("embedding").alias("vb"), F.col("ids").alias("ids_b"),
        F.col("nrm").alias("nb"),
    ).repartition(n_parts, "bucket_b")
    # NULL-divisor guard: a zero-norm (or NaN-norm) vector makes the
    # denominator 0, which under Spark-4 ANSI mode THROWS on double
    # division while DuckDB yields NULL — guarding the divisor to NULL
    # reproduces the oracle exactly (NULL cosine fails the threshold,
    # the degenerate pair is dropped) and is bit-identical for every
    # nonzero denominator.
    den = F.col("na") * F.col("nb")
    cos = S._dot("va", "vb") / F.when(den != F.lit(0.0), den)
    cross = (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("rep_a") < F.col("rep_b")),
        )
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= EMB_DUP_THRESHOLD)
        # two streamed explodes (never an in-row pair array — d07's
        # OOM lesson): work here is exactly output size
        .select("bucket", "cosine", F.explode("ids_a").alias("x"), "ids_b")
        .select("bucket", "cosine", "x", F.explode("ids_b").alias("y"))
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "bucket",
            "cosine",
        )
    )
    selfden = F.col("nrm") * F.col("nrm")
    selfcos = S._dot("embedding", "embedding") / F.when(
        selfden != F.lit(0.0), selfden
    )
    intra = (
        groups.withColumn("cosine", F.round(selfcos, 6))
        .filter(
            (F.size("ids") > 1) & (F.col("cosine") >= EMB_DUP_THRESHOLD)
        )
        .select("bucket", "cosine", F.explode("ids").alias("id_a"), "ids")
        .select("bucket", "cosine", "id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "bucket", "cosine")
    )
    return cross.unionByName(intra).orderBy("id_a", "id_b")


def _d05_sql() -> str:
    from aind_smartspim_data_transformation_spark.operators.similarity import (
        _BUCKET_SUM,
        _VOTE_COLS,
    )

    return f"""
WITH exploded AS (
  SELECT vec_id, d, CAST(embedding[d] AS DOUBLE) AS val
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(d)
), votes AS (
  SELECT vec_id,
         {_VOTE_COLS}
  FROM exploded GROUP BY vec_id
), sigs AS (
  SELECT vec_id, {_BUCKET_SUM} AS bucket FROM votes
), wb AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, s.bucket
  FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
      >= {EMB_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# D7 — SimHash near-dup PAIRS via pigeonhole banding in hamming space.
# Split the 16-bit signature into 3 bands (6/5/5 bits): any pair within
# hamming distance 2 differs in ≤ 2 bands, so it agrees exactly on ≥ 1
# band — candidates come from 3 groupBy passes over the signatures
# (no all-pairs), then one bit_count(xor) ≤ 2 verification.  Same
# pigeonhole trick web-scale simhash dedup uses on 64-bit sigs with
# d+1 bands.  bit_count/xor exist in both engines → exact oracle.
# ---------------------------------------------------------------------------
HAMMING_MAX = 2
_BANDS_16 = ((0, 0x3F), (6, 0x1F), (11, 0x1F))  # (shift, mask): 6/5/5 bits


def _sig_pairs(dsigs: DataFrame) -> DataFrame:
    """(simhash, sig2, hamming) over DISTINCT signatures, simhash <
    sig2, hamming ≤ HAMMING_MAX — the constant-size subplan shared by
    d07 (full listing) and d14 (bounded top-k); its DuckDB twin is the
    sig-level portion of `_hamming_pairs_cte`.  Candidates come from
    the pigeonhole bands (sound AND complete for hamming ≤ 2: 2 bit
    errors corrupt ≤ 2 of the 3 bands), both sides ≤ 3·65536 band
    rows (3 band rows per distinct sig), so the distinct here is
    sig-pair-sized, never doc-sized.  Output bound: each sig has ≤137
    sigs within hamming 2 in a 16-bit space, so ≤ 65536·137/2 ≈ 4.5M
    rows in the (unreachable) fully-saturated worst case — see the
    broadcast-site note in `_hamming_pairs`."""
    dband = dsigs.select(
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        F.expr(f"shiftright(simhash, {sh}) & {mask}").alias(
                            "bval"
                        ),
                    )
                    for j, (sh, mask) in enumerate(_BANDS_16)
                ]
            )
        ).alias("b"),
    ).select("simhash", "b.band_id", "b.bval")
    return (
        dband.join(
            dband.select(
                F.col("simhash").alias("sig2"),
                F.col("band_id").alias("band_id2"),
                F.col("bval").alias("bval2"),
            ),
            (F.col("band_id") == F.col("band_id2"))
            & (F.col("bval") == F.col("bval2"))
            & (F.col("simhash") < F.col("sig2")),
        )
        .select("simhash", "sig2")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(simhash ^ sig2)"))
        .filter(F.col("hamming") <= HAMMING_MAX)
    )


def _hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered verified pair set (doc1 < doc2, hamming ≤ 2) — d07's
    full diagnostic listing.

    r10 formulation (the d14 trick applied to the unbounded contract):
    the signature space is 16 bits, so hamming is decided ONCE per
    DISTINCT-sig pair on ≤65536-row sides — the r9 plan enumerated
    doc-level candidates through a bucketed band self-join and then
    paid a 200M-row DISTINCT plus two sig re-joins at a 10× sweep.
    Here the only doc-sided work is the final expansion join, whose
    row count IS the output (each unordered doc pair is produced
    exactly once: cross-group pairs from the sig1 < sig2 direction,
    intra-group pairs from the doc1 < doc2 guard on the self edge —
    no distinct anywhere).  The expansion is salted exactly like the
    r9 pair loop (probe side doc1 % B, build side replicated ×B, both
    under EXPLICIT AQE-exempt repartition): a verbatim-replica corpus
    collapses every replica group onto ONE sig, and without the salt
    the whole |group|² expansion of a fat sig would land on one task.
    """
    sigs = _simhash_sigs(spark, sf_dir)
    dsigs = sigs.select("simhash").distinct()
    sp = _sig_pairs(dsigs)
    # self edge per sig: intra-group pairs (exact-duplicate docs,
    # hamming 0); single-member groups emit nothing under doc1 < doc2
    allp = sp.unionByName(
        dsigs.select(
            "simhash",
            F.col("simhash").alias("sig2"),
            F.lit(0).cast(
                sp.schema["hamming"].dataType.simpleString()
            ).alias("hamming"),
        )
    )
    # output-sized expansion join, salted against fat-sig skew
    B = 8
    n_parts = 4 * spark.sparkContext.defaultParallelism
    # Broadcast sizing: allp is sig-pair-sized — worst case a
    # hamming-saturated 16-bit space gives ~65536·137/2 ≈ 4.5M rows
    # (~100 MB broadcast), above the 10 MB auto threshold but still
    # driver/executor-safe on any real config; a REAL corpus occupies
    # a small fraction of the sig space (sf0.1: ~2k distinct sigs →
    # ~10⁴ pairs).  If signatures ever widen past 16 bits, drop the
    # hint and let the shuffled join plan itself.
    # r16 (VERDICT r15 ask #3): the salt key is wrapped in coalesce so
    # it is NON-NULLABLE.  A bare `doc1 % B` made the bk==bk2 join
    # infer `isnotnull(doc_id % 8)`, which pushed down to THIS
    # consumer's documents scan only — a canonical-plan mismatch that
    # blocked AQE's runtime stage-cache reuse of the whole
    # scan→explode→md5→vote-aggregate signature subtree against the
    # query's other four consumers (measured: executed plan had 2
    # documents scans / 3 ReusedExchange; with coalesce the isnotnull
    # folds away and ALL consumers share ONE scan+sig computation).
    # Semantics unchanged: doc_id is the non-null PK, and coalesce is
    # the identity on non-null input.
    m1 = (
        sigs.select(F.col("doc_id").alias("doc1"), "simhash")
        .join(F.broadcast(allp), "simhash")
        .select(
            "doc1",
            "sig2",
            "hamming",
            F.coalesce(F.col("doc1") % B, F.lit(0)).alias("bk"),
        )
        .repartition(n_parts, "sig2", "bk")
    )
    m2 = (
        sigs.select(
            F.col("simhash").alias("sig2b"), F.col("doc_id").alias("doc2")
        )
        .crossJoin(
            F.broadcast(spark.range(B).select(F.col("id").alias("bk2")))
        )
        .repartition(n_parts, "sig2b", "bk2")
    )
    return (
        m1.join(
            m2,
            (F.col("sig2") == F.col("sig2b"))
            & (F.col("bk") == F.col("bk2"))
            # intra pairs once; cross pairs are already unique via the
            # sig1 < sig2 direction
            & ((F.col("hamming") > 0) | (F.col("doc1") < F.col("doc2"))),
        )
        .select(
            F.least("doc1", "doc2").alias("doc1"),
            F.greatest("doc1", "doc2").alias("doc2"),
            "hamming",
        )
    )


def d07_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Contract caveat (r9 verdict "What's wrong" #2): this MATERIALIZES
    # every ≤2-hamming pair — 203.7M rows at a 10× sweep, ~20G at 100×.
    # The plan streams (bucketed self-join, no pair array ever built),
    # so it EXECUTES at scale, but a 100× consumer should use d14's
    # bounded per-doc top-k instead; d07 stays as the diagnostic
    # full listing.
    return _hamming_pairs(spark, sf_dir).orderBy("doc1", "doc2")


def _hamming_pairs_cte() -> str:
    """Shared DuckDB CTE chain ending in ``pairs(doc1, doc2, hamming)``
    — the oracle twin of `_hamming_pairs` (used by d07 and d14)."""
    band_rows = ", ".join(
        f"({j}, (simhash >> {sh}) & {mask})" for j, (sh, mask) in enumerate(_BANDS_16)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, ('0x' || substring(md5(unnest(string_split(text, ' '))), 1, 8))::BIGINT AS th
  FROM documents
), votes AS (
  SELECT doc_id,
         {_SIMHASH_VOTES}
  FROM tok GROUP BY doc_id
), sigs AS (
  SELECT doc_id, {_SIMHASH_SUM} AS simhash FROM votes
), bands AS (
  SELECT doc_id, b.band_id, b.bval
  FROM sigs, LATERAL (SELECT * FROM (VALUES {band_rows}) AS v(band_id, bval)) b
), cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bval = b.bval AND a.doc_id < b.doc_id
), pairs AS (
  SELECT c.doc1, c.doc2, bit_count(xor(s1.simhash, s2.simhash)) AS hamming
  FROM cand c
  JOIN sigs s1 ON s1.doc_id = c.doc1
  JOIN sigs s2 ON s2.doc_id = c.doc2
  WHERE bit_count(xor(s1.simhash, s2.simhash)) <= {HAMMING_MAX}
)"""


def _d07_sql() -> str:
    return f"""
{_hamming_pairs_cte()}
SELECT doc1, doc2, hamming FROM pairs
ORDER BY doc1, doc2
"""


# ---------------------------------------------------------------------------
# D14 — bounded per-doc neighbor report: top-k nearest ≤2-hamming
# neighbors (rank by hamming, then neighbor id).  d07's contract
# materializes EVERY pair — ~20G rows at 100× — but the consumer of a
# near-dup report at that scale wants "who are this doc's closest
# near-dups", which is ≤ k rows per doc no matter how duplicate-dense
# the corpus is.
#
# The r10 rewrite makes the INTERMEDIATE bounded too (the first d14
# ran d07's pair join and bounded only the output — a 100× sweep
# still paid the ~20G-pair enumeration).  Key fact: the signature
# space is 16 bits, so there are ≤65536 DISTINCT simhash groups and
# ≤137 groups within hamming ≤2 of any group (Σ C(16,0..2)).
# Pipeline:
#   1. rank members within each sig group (one window; WindowGroupLimit
#      retains k+1 rows per group before any sort) — only a group's
#      k+1 SMALLEST ids can appear in ANY doc's top-k, because a
#      non-smallest member is dominated, at equal hamming, by k
#      smaller ids from its own group;
#   2. hamming once per DISTINCT-sig pair over the pigeonhole bands
#      (≤65536 rows per side — a constant-size subplan, broadcast);
#   3. symmetrize + a (sig, sig, 0) self edge for multi-member groups,
#      then expand each doc against its neighbor groups' k+1-smallest
#      arrays: ≤ 137·(k+1) candidate rows per doc — LINEAR in corpus;
#   4. one row_number window partitioned by doc_id.
# Work: two doc-sided shuffles (sig window, doc_id window) + a
# constant sig-pair subplan.  No quadratic term anywhere — a verbatim
# ×100 replication costs ×100, not ×10⁴.
# ---------------------------------------------------------------------------
NEIGHBOR_TOPK = 3


def d14_hamming_neighbor_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    k = NEIGHBOR_TOPK
    sigs = _simhash_sigs(spark, sf_dir)
    # 1. per-group k+1 smallest ids: the rank window's rank<=k+1
    # FILTER (not a conditional inside the aggregate — that would
    # force a full-group count pass and forfeit the prune) plans as
    # WindowGroupLimit, so a fat signature group (the 100×
    # replication regime: ~n/|sigs| members) is pruned to k+1 rows
    # before the aggregate.  No member count is kept: "group has >=2
    # members" is exactly size(top_ids) >= 2 since k+1 >= 2.
    wsig = W.partitionBy("simhash").orderBy("doc_id")
    ranked = sigs.withColumn("rn", F.row_number().over(wsig)).filter(
        F.col("rn") <= k + 1
    )
    groups = ranked.groupBy("simhash").agg(
        F.array_sort(F.collect_list("doc_id")).alias("top_ids")
    )
    # 2. hamming per DISTINCT-sig pair (shared _sig_pairs subplan —
    # `groups` is distinct-by-construction on simhash)
    sp = _sig_pairs(groups.select("simhash"))
    # 3. symmetrize; add the intra-group (sig, sig, 0) edge for groups
    # with >=2 members
    sym = (
        sp.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("simhash"),
                        F.col("sig2").alias("nbr_sig"),
                        F.col("hamming"),
                    ),
                    F.struct(
                        F.col("sig2").alias("simhash"),
                        F.col("simhash").alias("nbr_sig"),
                        F.col("hamming"),
                    ),
                )
            ).alias("p")
        )
        .select("p.*")
        .unionByName(
            groups.filter(F.size("top_ids") >= 2).select(
                "simhash",
                F.col("simhash").alias("nbr_sig"),
                F.lit(0).cast("int").alias("hamming"),
            )
        )
    )
    # 4. expand docs against neighbor groups' bounded id arrays — both
    # joined sides are sig-keyed constants, so they BROADCAST and the
    # doc table flows through unshuffled into the per-doc window
    cand = (
        sigs.join(F.broadcast(sym), "simhash")
        .join(
            F.broadcast(
                groups.select(
                    F.col("simhash").alias("nbr_sig"), "top_ids"
                )
            ),
            "nbr_sig",
        )
        .select(
            "doc_id", "hamming", F.explode("top_ids").alias("nbr_id")
        )
        # r16 (VERDICT r15 ask #3): null-safe inequality, NOT `!=` — a
        # plain != made the planner infer `isnotnull(doc_id)` and push
        # it to THIS consumer's documents scan only, spoiling the
        # canonical match that lets AQE's stage cache share the
        # signature subtree with the ranked/groups chain (measured: 2
        # documents scans → 1 after this change).  doc_id is the
        # non-null PK, so <=> and != decide identically on every row.
        .filter(~F.col("nbr_id").eqNullSafe(F.col("doc_id")))
    )
    w = W.partitionBy("doc_id").orderBy("hamming", "nbr_id")
    return (
        cand.withColumn("nbr_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("nbr_rank") <= k)
        .select("doc_id", "nbr_rank", "nbr_id", "hamming")
        .orderBy("doc_id", "nbr_rank")
    )


def _d14_sql() -> str:
    return f"""
{_hamming_pairs_cte()}, sym AS (
  SELECT doc1 AS doc_id, doc2 AS nbr_id, hamming FROM pairs
  UNION ALL
  SELECT doc2 AS doc_id, doc1 AS nbr_id, hamming FROM pairs
)
SELECT doc_id,
       CAST(row_number() OVER w AS BIGINT) AS nbr_rank,
       nbr_id, hamming
FROM sym
WINDOW w AS (PARTITION BY doc_id ORDER BY hamming, nbr_id)
QUALIFY row_number() OVER w <= {NEIGHBOR_TOPK}
ORDER BY doc_id, nbr_rank
"""


# ---------------------------------------------------------------------------
# D6 — materialized deduplicated corpus: keep the lowest doc_id per
# exact-content group AND drop near-dup losers found by MinHash/LSH
# (doc2 of every verified pair — doc1 < doc2, so min-id wins there
# too).  This is the operator a training pipeline actually *runs*:
# the filtered corpus, not a report about it.  One digest groupBy +
# one broadcast anti-join against the (tiny) loser set.
# ---------------------------------------------------------------------------
def d06_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exact_keepers = docs.groupBy(F.sha2("text", 256).alias("digest")).agg(
        F.min("doc_id").alias("doc_id")
    )
    near_losers = d03_dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc2").alias("doc_id")
    ).distinct()
    return (
        docs.join(exact_keepers.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(near_losers), "doc_id", "left_anti")
        .select("doc_id", "lang", F.length("text").alias("n_chars"))
        .orderBy("doc_id")
    )


def _d06_sql() -> str:
    # reuse D03's pipeline as the loser-set subquery
    d03_body = D03_SQL.strip().rstrip()
    return f"""
WITH d03 AS (
{d03_body}
), exact_keepers AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
), near_losers AS (
  SELECT DISTINCT doc2 AS doc_id FROM d03
)
SELECT doc_id, lang, length(text) AS n_chars
FROM documents
WHERE doc_id IN (SELECT doc_id FROM exact_keepers)
  AND doc_id NOT IN (SELECT doc_id FROM near_losers)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# D8 — duplicate clusters: connected components over the d03 near-dup
# pair graph, by iterative min-label propagation.  A pairwise dedup
# leaves A~B, B~C as separate pairs; the *cluster* {A,B,C} with one
# keeper is what a real pipeline materializes.  This is the engine's
# iterative-algorithm surface: a driver loop over DataFrame joins with
# ``localCheckpoint`` per round (cuts lineage, materializes state —
# Spark's equivalent of Pregel supersteps).
#
# Scale posture: plain label propagation converges in O(component
# diameter) rounds — fine for dedup graphs (components are tiny, near-
# cliques by construction).  For web-graph-diameter inputs you'd switch
# to the large-star/small-star algorithm (Kiveris et al.) which
# converges in O(log n) rounds; same join-per-round skeleton.  Each
# round shuffles |E| rows on the node key.
# ---------------------------------------------------------------------------
def d08_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 (guide §2.4/§1.2): persist the d03 output — the undirected
    # union below references it twice, and without the persist each
    # branch re-executes d03's verify pipeline during the edges
    # materialization.  Released by the harness's clearCache().
    pairs = (
        d03_dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2").persist()
    )
    edges = pairs.union(
        pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
    ).persist()
    # r15: LAZY local checkpoints (eager=False) — the plan is truncated
    # to a LogicalRDD immediately (same lineage-cut as the eager form),
    # but materialization folds into the round's convergence count, so
    # each round is ONE job instead of two (checkpoint job + count
    # job).  Measured: the per-round job round-trip was the dominant
    # build cost at bench scale (d08 build 6.7–7.2 s for tiny data).
    labels = (
        edges.select(F.col("doc1").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    while True:
        nb_min = (
            edges.join(labels, edges["doc2"] == labels["node"])
            .groupBy("doc1")
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(nb_min, labels["node"] == nb_min["doc1"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nb_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return (
        labels.groupBy(F.col("label").alias("component"))
        .agg(F.count("*").alias("n_docs"), F.max("node").alias("max_doc"))
        .orderBy("component")
    )


D08_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc1, doc2 FROM ({D03_SQL}) _d03
), und AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION ALL
  SELECT doc2, doc1 FROM pairs
), reach(src, dst) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
), comp AS (
  SELECT src AS node, min(dst) AS component FROM reach GROUP BY src
)
SELECT component, count(*) AS n_docs, max(node) AS max_doc
FROM comp GROUP BY component ORDER BY component
"""


# ---------------------------------------------------------------------------
# D9 — duplicate clusters via LARGE-STAR / SMALL-STAR (Kiveris et al.,
# "Connected Components in MapReduce and Beyond"): the O(log n)-round
# algorithm d08's docstring names as the web-scale upgrade, implemented
# for real.  Same output contract as d08 (component = min doc_id,
# size, max member), so the SAME recursive-CTE oracle verifies both —
# and a test asserts d08 ≡ d09 row-for-row.
#
# Round = large-star (hook every node's larger neighbors to its local
# minimum) then small-star (collapse each node's smaller neighborhood
# onto its minimum).  Both are ONE groupBy(min) + ONE join each —
# |E|-row shuffles, no neighbor-list materialization — and the edge set
# provably converges to component-minimum stars in O(log n) rounds
# regardless of component diameter (label propagation, d08, needs
# O(diameter) rounds — the difference between 20 and 10⁶ iterations on
# a path-shaped graph).  ``localCheckpoint`` per round cuts lineage.
# The fixpoint test is ONE symmetric-difference job per round: both
# edge sets are distinct, so a signed union (+1/-1) grouped by edge
# with a nonzero sum pinpoints any change — one shuffle, one action
# (was two exceptAll probes = two jobs; a petabyte graph would go
# further and keep a changed-edges accumulator inside the round).
# ---------------------------------------------------------------------------
def _large_star(bidir: DataFrame) -> DataFrame:
    """Edges (u,v) in BOTH directions → undirected (a,b), a > b."""
    m = bidir.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        bidir.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("a"),
            F.least(F.col("u"), F.col("mv")).alias("b"),
        )
        .distinct()
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    """Undirected (a,b) with a > b → next round's (a,b), a > b."""
    m = pairs.groupBy("a").agg(F.min("b").alias("mv"))
    hang = (
        pairs.join(m, "a")
        .filter(F.col("b") != F.col("mv"))
        .select(F.col("b").alias("a"), F.col("mv").alias("b"))
    )
    selfe = m.select(F.col("a"), F.col("mv").alias("b"))
    return hang.union(selfe).distinct()


def connected_components_star(pairs: DataFrame) -> DataFrame:
    """(doc1, doc2) edge list → (node, label) with label = component min."""
    # r15 (guide §1.2): LAZY local checkpoints — the lineage cut is
    # identical (the frame's plan becomes a LogicalRDD immediately) but
    # materialization folds into the round's convergence count below,
    # so each round is ONE job instead of two.  The initial checkpoint
    # materializes inside round 1's job the same way.
    p = (
        pairs.select(
            F.greatest("doc1", "doc2").alias("a"),
            F.least("doc1", "doc2").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    while True:
        bidir = p.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            p.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        p_new = _small_star(_large_star(bidir)).localCheckpoint(eager=False)
        # one-job convergence check: signed-union symmetric difference
        # (both sides are distinct edge sets, so sum(±1) != 0 ⇔ the
        # edge is in exactly one of them)
        changed = (
            p.select("a", "b", F.lit(1).alias("s"))
            .unionAll(p_new.select("a", "b", F.lit(-1).alias("s")))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("s"))
            .filter(F.col("s") != 0)
            .limit(1)
            .count()
        )
        p = p_new
        if changed == 0:
            break
    labels = p.groupBy(F.col("a").alias("node")).agg(F.min("b").alias("label"))
    roots = (
        p.select(F.col("b").alias("node"))
        .distinct()
        .join(labels, "node", "left_anti")
        .withColumn("label", F.col("node"))
    )
    return labels.union(roots)


def d09_dup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = d03_dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    comp = connected_components_star(pairs)
    return (
        comp.groupBy(F.col("label").alias("component"))
        .agg(F.count("*").alias("n_docs"), F.max("node").alias("max_doc"))
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# D10 — duplicated-substring coverage (exact-substring dedup shape):
# how much of each document sits inside a verbatim span that also
# appears elsewhere in the corpus?  This is the span-level metric the
# suffix-array substring dedupers compute (flag/remove any ≥k-token
# run shared between documents) — distinct from d02's *pairwise*
# 3-shingle Jaccard: here the unit is the token position, and the
# answer is per-document duplicated-span coverage after merging
# overlapping hits.
#
# Plan: explode every 8-token window (stride 1 — stride >1 cannot
# guarantee window alignment between two occurrences of the same
# span), md5 it, count occurrences per hash with a groupBy (map-side
# combine, so a boilerplate 8-gram repeated 10⁶× collapses locally
# before the exchange — an analytic `count OVER (PARTITION BY h)`
# would instead pile every occurrence into one window partition with
# no combine), keep hashes occurring ≥2×, join them back to the
# window table (shuffle join on h; the skewed probe side is exactly
# what AQE's skew-join split handles), then merge overlapping
# [start, start+7] intervals per doc with the classic running-max
# island sweep (shuffle by doc_id).  The window rows are ~n_tokens,
# the same magnitude d02 already carries.  No pair blowup anywhere.
# ---------------------------------------------------------------------------
D10_WINDOW = 8  # tokens per fingerprinted span


def d10_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = D10_WINDOW
    # r15 (guide §2.5): spread the unsplittable scan under the 8-token
    # window explode+md5 — the same heavy scan-side compute class as
    # the shingle pipelines, and BOTH wins references (dup-hash groupBy
    # + the flagged semi-join) re-run it.  Measured interleaved at
    # sf0.1: 2.15 → 0.98 s min-over-min, 3/3 pairs
    # (OPTIMIZATION_r15.md §18).
    docs = _docs_spread(spark, sf_dir)
    wins = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= w)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {w}), "
                    f"i -> struct(i AS s, md5(concat_ws(' ', slice(toks, i + 1, {w}))) AS h))"
                )
            ).alias("win"),
        )
        .select("doc_id", "n_tokens", F.col("win.s").alias("s"), F.col("win.h").alias("h"))
    )
    dup_hashes = (
        wins.groupBy("h")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("h")
    )
    flagged = wins.join(dup_hashes, "h", "left_semi")
    per_doc = W.partitionBy("doc_id").orderBy("s")
    islands = (
        flagged.withColumn("e", F.col("s") + F.lit(w - 1))
        .withColumn(
            "prev_max_e",
            F.max("e").over(per_doc.rowsBetween(W.unboundedPreceding, -1)),
        )
        .withColumn(
            "is_start",
            F.when(
                F.col("s") > F.coalesce(F.col("prev_max_e"), F.lit(-1)), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("is_start").over(per_doc.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "n_tokens", "island")
        .agg((F.max("e") - F.min("s") + 1).alias("span_tokens"),
             F.count("*").alias("n_windows"))
    )
    return (
        islands.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("dup_tokens"),
            F.sum("n_windows").cast("long").alias("n_dup_windows"),
        )
        .withColumn(
            "dup_ppm",
            F.floor(F.col("dup_tokens") * 1000000 / F.col("n_tokens")).cast("long"),
        )
        .orderBy(F.desc("dup_ppm"), F.asc("doc_id"))
        .limit(50)
    )


D10_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens,
         unnest(generate_series(1, len(string_split(text, ' ')) - {D10_WINDOW} + 1)) AS i
  FROM documents
  WHERE len(string_split(text, ' ')) >= {D10_WINDOW}
), wins AS (
  SELECT doc_id, n_tokens, i - 1 AS s,
         md5(array_to_string(toks[i:i + {D10_WINDOW} - 1], ' ')) AS h
  FROM toks
), flagged AS (
  SELECT * FROM (
    SELECT doc_id, n_tokens, s, count(*) OVER (PARTITION BY h) AS n_occ
    FROM wins
  ) WHERE n_occ >= 2
), marked AS (
  SELECT doc_id, n_tokens, s, s + {D10_WINDOW} - 1 AS e,
         CASE WHEN s > coalesce(max(s + {D10_WINDOW} - 1) OVER (
                  PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS is_start
  FROM flagged
), islands AS (
  SELECT doc_id, n_tokens,
         sum(is_start) OVER (PARTITION BY doc_id ORDER BY s
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island,
         s, e
  FROM marked
), spans AS (
  SELECT doc_id, n_tokens, island,
         max(e) - min(s) + 1 AS span_tokens, count(*) AS n_windows
  FROM islands GROUP BY doc_id, n_tokens, island
)
SELECT doc_id, n_tokens,
       count(*) AS n_spans,
       CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
       CAST(sum(n_windows) AS BIGINT) AS n_dup_windows,
       CAST(sum(span_tokens) * 1000000 // n_tokens AS BIGINT) AS dup_ppm
FROM spans
GROUP BY doc_id, n_tokens
ORDER BY dup_ppm DESC, doc_id ASC
LIMIT 50
"""


# ---------------------------------------------------------------------------
# D11 — split-leakage audit: near-duplicate clusters that straddle the
# train/val/test split.  Deduping and splitting are usually separate
# pipeline stages, and a near-dup pair with one member in train and
# one in test silently contaminates evaluation even after exact dedup.
# Composes the MinHash/LSH pair graph (d03), the O(log n) star
# clustering (d09), and c01's content-stable hash split: any cluster
# whose members land in ≥2 splits is a leak, reported with its split
# mix so the fix (move the whole cluster to one split) is mechanical.
#
# Scale: clustering is the d09 path (|E|-row shuffles); the split
# label is a narrow expression on doc_id; the audit join keys on
# doc_id and the rollup is component-sized.  Nothing here grows faster
# than the dup-pair graph itself.
# ---------------------------------------------------------------------------
def d11_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = d03_dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    comp = connected_components_star(pairs)
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
    labeled = comp.join(
        docs.select("doc_id", split.alias("split")),
        comp["node"] == F.col("doc_id"),
    )
    return (
        labeled.groupBy(F.col("label").alias("component"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("split").cast("long").alias("n_splits"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
        )
        .filter(F.col("n_splits") >= 2)
        .orderBy("component")
    )


D11_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc1, doc2 FROM ({D03_SQL}) _d03
), und AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION ALL
  SELECT doc2, doc1 FROM pairs
), reach(src, dst) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
), comp AS (
  SELECT src AS node, min(dst) AS component FROM reach GROUP BY src
), labeled AS (
  SELECT comp.component,
         CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1) < 'c' THEN 'train'
              WHEN substring(md5(doc_id::VARCHAR), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split
  FROM comp JOIN documents ON comp.node = documents.doc_id
)
SELECT component,
       count(*) AS n_docs,
       count(DISTINCT split) AS n_splits,
       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
FROM labeled
GROUP BY component
HAVING count(DISTINCT split) >= 2
ORDER BY component
"""


# ---------------------------------------------------------------------------
# D12 — duplicate-graph centrality: 3 rounds of PageRank over the d03
# near-dup pair graph.  Dedup keeps ONE doc per cluster; *which* one
# matters — the highest-centrality member is the best keeper (most
# similar to the rest of its cluster, least likely an outlier
# paraphrase).  This is the engine's fixed-iteration graph surface
# (beyond d08/d09's run-to-convergence components): rank flows along
# edges, damping 0.85, uniform start.
#
# All-INTEGER arithmetic so the oracle replays it exactly: ranks live
# in micro-units (start 1,000,000), each hop is the exact integer
# division rank div degree, and the damped update is
# 150000 + (850 · Σ contribs) div 1000 — no floats anywhere, so Spark
# and DuckDB agree bit-for-bit after any number of rounds.
#
# Scale posture: per round = one join of edges⋈ranks on the source key
# + one groupBy on the destination (partial_sum map-side) — |E|-row
# shuffles, same skeleton as d08; edges⋈degree is precomputed once and
# persisted; localCheckpoint per round cuts lineage.  Rounds are FIXED
# (3), so the job graph is static — no convergence probes.
# ---------------------------------------------------------------------------
PR_ROUNDS = 3
PR_BASE = 1_000_000  # initial rank, micro-units
PR_HOLD = 150_000  # (1 - d) · PR_BASE with d = 0.85


def d12_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 (guide §2.4): persist the d03 output — the undirected union
    # references it twice; without the persist each branch re-executes
    # d03's verify pipeline.  Released by the harness's clearCache().
    pairs = (
        d03_dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2").persist()
    )
    # localCheckpoint the edge list: the expensive d03 pipeline runs
    # exactly ONCE — deg, the loop's edges⋈degree, and the final
    # degree join all derive from the materialized edges, not from a
    # fresh MinHash/verify recomputation.  r15: LAZY checkpoints
    # (eager=False) — the lineage cut is identical, but with FIXED
    # rounds and no convergence probe nothing needs to execute at
    # build time; the whole 3-round chain materializes inside the
    # query's single terminal action (each checkpointed RDD computes
    # once and its blocks are stored), instead of one driver-blocking
    # job per round.
    edges = pairs.union(
        pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
    ).localCheckpoint(eager=False)
    deg = edges.groupBy(F.col("doc1").alias("dnode")).agg(
        F.count("*").alias("degree")
    )
    # persist (not unpersist-after-build): the loop references this
    # 3× and the final plan references deg; blocks are released by the
    # harness's clearCache() like every other intra-query persist.
    edges_deg = edges.join(deg, edges["doc1"] == deg["dnode"]).select(
        F.col("doc1").alias("src"), F.col("doc2").alias("dst"), "degree"
    ).persist()
    ranks = deg.select(
        F.col("dnode").alias("node"), F.lit(PR_BASE).cast("long").alias("rank")
    ).localCheckpoint(eager=False)
    for _ in range(PR_ROUNDS):
        ranks = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select("dst", F.expr("rank div degree").alias("contrib"))
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(PR_HOLD)
                    + F.expr("(850 * sum(contrib)) div 1000")
                ).cast("long").alias("rank")
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.join(deg, ranks["node"] == deg["dnode"])
        .select(F.col("node").alias("doc_id"), "degree", F.col("rank").alias("rank_micro"))
        .orderBy(F.desc("rank_micro"), F.asc("doc_id"))
        .limit(20)
    )


def _d12_sql() -> str:
    hops = []
    prev = "r0"
    for i in range(1, PR_ROUNDS + 1):
        hops.append(
            f"r{i} AS (\n"
            f"  SELECT u.b AS node,\n"
            # CAST per hop: DuckDB widens integer sum() to HUGEINT and
            # the widening compounds across hops; the driver hash
            # treats HUGEINT differently from BIGINT (r5 red row).
            f"         CAST({PR_HOLD} + (850 * sum(p.rank // d.degree)) // 1000"
            f" AS BIGINT) AS rank\n"
            f"  FROM und u JOIN {prev} p ON u.a = p.node\n"
            f"  JOIN deg d ON u.a = d.node\n"
            f"  GROUP BY u.b\n)"
        )
        prev = f"r{i}"
    hop_sql = ", ".join(hops)
    return f"""
WITH pairs AS (
  SELECT doc1, doc2 FROM ({D03_SQL}) _d03
), und AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION ALL
  SELECT doc2, doc1 FROM pairs
), deg AS (
  SELECT a AS node, count(*) AS degree FROM und GROUP BY a
), r0 AS (
  SELECT node, {PR_BASE} AS rank FROM deg
), {hop_sql}
SELECT {prev}.node AS doc_id, deg.degree, {prev}.rank AS rank_micro
FROM {prev} JOIN deg ON {prev}.node = deg.node
ORDER BY rank_micro DESC, doc_id ASC
LIMIT 20
"""


D12_SQL = _d12_sql()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "d01_dedup_exact": d01_dedup_exact,
    "d02_dedup_ngram_jaccard": d02_dedup_ngram_jaccard,
    "d03_dedup_minhash_lsh": d03_dedup_minhash_lsh,
    "d04_simhash": d04_simhash,
    "d05_dedup_embedding_cosine": d05_dedup_embedding_cosine,
    "d06_dedup_corpus": d06_dedup_corpus,
    "d07_simhash_hamming_pairs": d07_simhash_hamming_pairs,
    "d08_dup_components": d08_dup_components,
    "d09_dup_components_star": d09_dup_components_star,
    "d10_substring_coverage": d10_substring_coverage,
    "d11_split_leakage": d11_split_leakage,
    "d12_dup_pagerank": d12_dup_pagerank,
    "d14_hamming_neighbor_topk": d14_hamming_neighbor_topk,
    "d15_lsh_saturation_audit": d15_lsh_saturation_audit,
    "d16_lsh_recovered_pairs": d16_lsh_recovered_pairs,
}

ORACLE: dict[str, str] = {
    "d01_dedup_exact": D01_SQL,
    "d02_dedup_ngram_jaccard": D02_SQL,
    "d03_dedup_minhash_lsh": D03_SQL,
    "d04_simhash": D04_SQL,
    "d05_dedup_embedding_cosine": _d05_sql(),
    "d06_dedup_corpus": _d06_sql(),
    "d07_simhash_hamming_pairs": _d07_sql(),
    "d08_dup_components": D08_SQL,
    # identical output contract — the same recursive-CTE oracle verifies
    # the O(log n) star algorithm and the label-propagation baseline
    "d09_dup_components_star": D08_SQL,
    "d10_substring_coverage": D10_SQL,
    "d11_split_leakage": D11_SQL,
    "d12_dup_pagerank": D12_SQL,
    "d14_hamming_neighbor_topk": _d14_sql(),
    "d15_lsh_saturation_audit": D15_SQL,
    "d16_lsh_recovered_pairs": D16_SQL,
}
