"""Text-analysis operators over the ``documents`` table.

[driver-ext] SURVEY.md §2.11: token counting, quality scoring,
language-ID heuristic, document fingerprinting.  All pure column
expressions (JVM-side); nothing leaves codegen.

Scale posture: every query is scan → narrow per-row expressions →
(optional) one aggregation.  At 100 TB these are the cheapest possible
shapes — no shuffle except the final groupBy, and the per-row work is
whole-stage-codegen string ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aind_smartspim_data_transformation_spark.tables import (
    load_table,
    spread_unsplittable_scan,
)


def _idiv(num, den):
    """Integer floor division of two non-negative long Columns —
    bit-identical to DuckDB ``//``.  floor(num/den) is exact here: with
    num < 2^30 and den < 2^15 both are exact doubles, and a non-integer
    quotient differs from any integer by ≥ 1/den ≫ one ulp, so IEEE
    division can never round across an integer."""
    return F.floor(num / den).cast("long")


STOPWORDS = ("the", "a", "of", "and", "to")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15: conditional round-robin spread of the unsplittable one-file
    # scan (guide §2.5) — the tokenize/regex projections of the text
    # family otherwise run as a single task; no-op on splittable input.
    return spread_unsplittable_scan(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# T1 — token counting: whitespace tokens + a BPE-ish subword estimate.
# The "BPE-ish" count approximates subword tokens as ceil(chars/4) per
# word (the common ~4-chars-per-token rule of thumb).
# ---------------------------------------------------------------------------
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            F.expr(
                "aggregate(transform(split(text, ' '), x -> length(x)), 0, (s, x) -> s + x)"
            ).alias("sum_token_chars"),
            F.expr(
                "aggregate(transform(split(text, ' '), x -> CAST(ceil(length(x) / 4.0) AS INT)), 0, (s, x) -> s + x)"
            ).alias("n_bpe_est"),
        )
        .orderBy("doc_id")
    )


T01_SQL = """
SELECT doc_id, lang,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       list_sum(list_transform(string_split(text, ' '), x -> length(x)))::INT AS sum_token_chars,
       list_sum(list_transform(string_split(text, ' '), x -> CAST(ceil(length(x) / 4.0) AS INT)))::INT AS n_bpe_est
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# T2 — quality scoring: length, punctuation density, stopword ratio,
# lexical diversity → one combined score.
# ---------------------------------------------------------------------------
def quality_ppm_expr():
    """Composite quality score of the ``text`` column, in INTEGER
    arithmetic (parts per million, floor division) — a float formula
    (0.4·a + 0.3·b + …) can land exactly on a round-half boundary that
    Spark (HALF_UP on the shortest decimal repr) and DuckDB
    (binary-double compare) resolve differently; observed for score
    0.5106875 at sf0.1.  Integer `div` is bit-identical on both
    engines.  Shared by t02 and the c05 curation filter.
    """
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    n_len = F.length("text")
    return (
        F.lit(4000) * F.least(n_tokens, F.lit(100)).cast("long")
        + _idiv(F.lit(300000) * n_distinct.cast("long"), n_tokens.cast("long"))
        + _idiv(F.lit(200000) * n_stop.cast("long"), n_tokens.cast("long"))
        + F.lit(100000)
        - _idiv(F.lit(100000) * n_punct.cast("long"), n_len.cast("long"))
    )


QUALITY_PPM_SQL = """4000 * least(n_tokens, 100)
            + (300000 * len(list_distinct(toks))) // n_tokens
            + (200000 * n_stop) // n_tokens
            + 100000
            - (100000 * n_punct) // length(text)"""


def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    diversity = F.size(F.array_distinct(toks)) / n_tokens
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / F.length("text")
    quality_ppm = quality_ppm_expr()
    return (
        d.select(
            "doc_id",
            F.col("n_chars").alias("n_chars"),
            n_tokens.alias("n_tokens"),
            F.round(stop_ratio, 6).alias("stop_ratio"),
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.round(diversity, 6).alias("diversity"),
            quality_ppm.alias("quality_ppm"),
        )
        .orderBy("doc_id")
    )


_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

QUALITY_BASE_SQL = f"""
  SELECT doc_id, n_chars, lang, text,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_LIST}))) AS n_stop,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
  FROM documents
"""

T02_SQL = f"""
WITH base AS ({QUALITY_BASE_SQL})
SELECT doc_id, n_chars, n_tokens,
       round(n_stop / n_tokens, 6) AS stop_ratio,
       round(n_punct / length(text), 6) AS punct_ratio,
       round(len(list_distinct(toks)) / n_tokens, 6) AS diversity,
       CAST({QUALITY_PPM_SQL} AS BIGINT) AS quality_ppm
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# T3 — corpus statistics per language label.
# ---------------------------------------------------------------------------
def t03_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


T03_SQL = """
SELECT lang, count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# T4 — language-ID heuristic: marker-token occurrence voting.
# (The synthetic corpus shares one vocabulary, so this demonstrates the
# operator shape — occurrence counting + argmax — not a real model.)
# ---------------------------------------------------------------------------
_MARKERS = {"en": "the", "es": "data", "de": "row", "fr": "key"}


def t04_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    def _count_marker(marker: str):
        # single-arg lambda: a two-arg lambda would be treated by Spark
        # as the (value, index) form of F.filter.
        return F.size(F.filter(toks, lambda x: x == F.lit(marker)))

    scores = {lang: _count_marker(marker) for lang, marker in _MARKERS.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"]),
            "en",
        )
        .when((scores["es"] >= scores["de"]) & (scores["es"] >= scores["fr"]), "es")
        .when(scores["de"] >= scores["fr"], "de")
        .otherwise("fr")
    )
    return (
        d.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            *[scores[lang].alias(f"score_{lang}") for lang in _MARKERS],
            pred.alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


_SCORE_COLS = ",\n       ".join(
    f"len(list_filter(string_split(text, ' '), x -> x = '{m}')) AS score_{lang}"
    for lang, m in _MARKERS.items()
)

T04_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
       {_SCORE_COLS}
  FROM documents
)
SELECT doc_id, labeled_lang, score_en, score_es, score_de, score_fr,
       CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
            WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
            WHEN score_de >= score_fr THEN 'de'
            ELSE 'fr' END AS predicted_lang
FROM scored ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# T5 — document fingerprint: digest of the sorted distinct token set
# (word-order-insensitive near-dup key).
# ---------------------------------------------------------------------------
def t05_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # group_size via groupBy + join, not `count OVER (PARTITION BY
    # fingerprint)`: the analytic window has no map-side combine, so a
    # boilerplate fingerprint shared by 10⁶ docs piles 10⁶ rows into
    # one window partition; the groupBy partial-aggregates locally and
    # the join's skewed probe side is AQE-skew-splittable (same
    # reasoning as d10's occurrence count).
    d = _docs(spark, sf_dir)
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    fps = d.select("doc_id", fp.alias("fingerprint"))
    sizes = fps.groupBy("fingerprint").agg(F.count("*").alias("group_size"))
    return fps.join(sizes, "fingerprint").select(
        "doc_id", "fingerprint", "group_size"
    ).orderBy("doc_id")


T05_SQL = """
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint, count(*) OVER (PARTITION BY fingerprint) AS group_size
FROM fp ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# T6 — corpus-wide top-k bigrams: the n-gram frequency table every
# corpus-analysis pipeline starts from.  explode → hash agg (map-side
# combine absorbs the heavy duplication) → top-k, with a full
# (count, bigram) tie-break so the LIMIT is deterministic.
# ---------------------------------------------------------------------------
TOP_BIGRAMS = 20


def t06_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bigrams = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> concat_ws(' ', toks[i], toks[i+1]))"
                )
            ).alias("bigram")
        )
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(TOP_BIGRAMS)
    )


T06_SQL = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents WHERE len(string_split(text, ' ')) >= 2
), bigrams AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks
)
SELECT bigram, count(*) AS n
FROM bigrams GROUP BY bigram
ORDER BY n DESC, bigram ASC LIMIT {TOP_BIGRAMS}
"""


# ---------------------------------------------------------------------------
# T7 — TF-IDF-style distinctive terms: top-3 terms per document by
# tf × inverse-document-frequency.  The idf factor is the LOG-FREE
# integer form (10^9 div df): ln() is not bit-identical between JVM
# and libm (~2% of inputs differ by 1 ulp — measured), so a log-damped
# weight could flip ranks between engine and oracle; integer division
# is exact on both and preserves the df ordering (df is the only
# ranking signal idf contributes for fixed N).
#
# Scale posture: tf is a (doc_id, term) hash agg with map-side
# combine; df is a term-level agg over the DISTINCT (doc, term) pairs
# the tf table already materializes (no second scan of text).  The
# tf⋈df join shuffles on term — at corpus scale you'd broadcast the
# top-vocabulary slice and let the long tail shuffle (vocab ≪ corpus).
# The per-doc top-3 is a window over doc_id — the partition key the tf
# table already carries.
# ---------------------------------------------------------------------------
TFIDF_TOP = 3
IDF_SCALE = 1_000_000_000


def t07_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    weighted = tf.join(df_, "term").withColumn(
        "weight", F.col("tf") * F.floor(F.lit(IDF_SCALE) / F.col("df")).cast("long")
    )
    w = W.partitionBy("doc_id").orderBy(
        F.desc("weight"), F.asc("term")
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            "tf",
            "df",
            "weight",
        )
        .orderBy("doc_id", "rank")
    )


T07_SQL = f"""
WITH tf AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tfc AS (
  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(*) AS df FROM tfc GROUP BY term
), weighted AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * ({IDF_SCALE} // d.df) AS weight
  FROM tfc t JOIN dfc d USING (term)
), ranked AS (
  SELECT doc_id, term, tf, df, weight,
         row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, term ASC) AS rank
  FROM weighted
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, CAST(weight AS BIGINT) AS weight
FROM ranked WHERE rank <= {TFIDF_TOP} ORDER BY doc_id, rank
"""


# ---------------------------------------------------------------------------
# T8 — repetition quality signals (Gopher-rule shape): duplicate-token
# fraction and most-frequent-bigram fraction per document.  Highly
# repetitive documents (boilerplate, spam, generation loops) score high
# on both and get filtered before training.
#
# All ratios are integer ppm with floor division (cross-engine exact —
# see quality_ppm_expr).  The top-bigram count needs a per-(doc,bigram)
# hash agg then a per-doc max: explode → two-level groupBy.  Map-side
# combine absorbs the duplication, and both aggs partition by doc_id —
# AQE coalesces the single shuffle's output.  Every doc has ≥10 tokens
# in the synthetic corpus, but the left join + coalesce keeps the
# operator total for degenerate 1-token docs anyway.
# ---------------------------------------------------------------------------
def t08_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    bigrams = (
        d.withColumn("toks", toks)
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> concat_ws(' ', toks[i], toks[i+1]))"
                )
            ).alias("bigram"),
        )
    )
    top_bigram = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"))
    )
    return (
        base.join(top_bigram, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            _idiv(
                (F.col("n_tokens") - F.col("n_distinct")) * F.lit(1_000_000),
                F.col("n_tokens"),
            ).alias("dup_token_ppm"),
            F.coalesce("top_bigram_n", F.lit(0)).cast("long").alias("top_bigram_n"),
            F.when(
                F.col("n_tokens") >= 2,
                _idiv(
                    F.coalesce("top_bigram_n", F.lit(0)) * F.lit(1_000_000),
                    F.col("n_tokens") - 1,
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("top_bigram_ppm"),
        )
        .orderBy("doc_id")
    )


T08_SQL = """
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         string_split(text, ' ') AS t
  FROM documents
), bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM base WHERE n_tokens >= 2
), top AS (
  SELECT doc_id, max(n) AS top_bigram_n
  FROM (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY doc_id, bigram)
  GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(((b.n_tokens - b.n_distinct) * 1000000) // b.n_tokens AS BIGINT) AS dup_token_ppm,
       CAST(coalesce(t.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(CASE WHEN b.n_tokens >= 2
                 THEN (coalesce(t.top_bigram_n, 0) * 1000000) // (b.n_tokens - 1)
                 ELSE 0 END AS BIGINT) AS top_bigram_ppm
FROM base b LEFT JOIN top t USING (doc_id)
ORDER BY b.doc_id
"""


# ---------------------------------------------------------------------------
# T9 — Flesch-style readability in centi-points, all-integer:
#   flesch ≈ 206.84 - 1.015·(words/sentences) - 84.6·(syllables/word)
#   centi  = 20684 - (203·W) // (2·S) - (8460·Y) // W
# Sentences = terminal-punctuation runs (min 1); syllables = vowel
# groups (the standard cheap approximation).  Floor division keeps the
# score bit-identical across engines (see quality_ppm_expr); the
# classic float formula would hit round-half boundaries.
# All narrow per-row regex/array expressions — zero shuffle.
# ---------------------------------------------------------------------------
def t09_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    ).cast("long")
    n_syll = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiou]+")).cast("long")
    centi = (
        F.lit(20684)
        - _idiv(F.lit(203) * n_words, F.lit(2) * n_sent)
        - _idiv(F.lit(8460) * n_syll, n_words)
    )
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syll.alias("n_syllables"),
            centi.cast("long").alias("flesch_centi"),
        )
        .orderBy("doc_id")
    )


T09_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(20684 - (203 * n_words) // (2 * n_sentences)
                  - (8460 * n_syllables) // n_words AS BIGINT) AS flesch_centi
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# T10 — vocabulary building with Zipf coverage: global word frequencies,
# rank, and cumulative corpus coverage (the pass that sizes a tokenizer
# vocab: "how many types cover 95% of tokens?").
#
# Scale posture: the explode+groupBy collapses the corpus to vocab-sized
# data in ONE shuffle with map-side combine; rank + cumulative coverage
# then ride distributed_order_stats (r7 — literal range buckets +
# per-bucket windows), so no partition-less window exists even over the
# vocab aggregate, and the corpus total comes from the SAME per-bucket
# partials (a literal — no sum() OVER () single-partition exchange).
# Never rank the raw token stream.
# ---------------------------------------------------------------------------
VOCAB_TOP = 20


def t10_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_order_stats,
    )

    d = _docs(spark, sf_dir)
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    ).persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    ranked, totals = distributed_order_stats(
        counts,
        "n",
        tie_cols=("word",),
        value_col="n",
        rank_col="rnk",
        cum_col="cum",
        ascending=False,
    )
    return (
        ranked.filter(F.col("rnk") <= VOCAB_TOP)
        .select(
            "rnk",
            "word",
            "n",
            F.expr(f"cum * 1000000 div {int(totals['sum'])}").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("rnk")
    )


T10_SQL = f"""
WITH wds AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), c AS (
  SELECT word, count(*) AS n FROM wds GROUP BY word
), r AS (
  SELECT word, n,
         row_number() OVER (ORDER BY n DESC, word ASC) AS rnk,
         sum(n) OVER (ORDER BY n DESC, word ASC ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER () AS total
  FROM c
)
SELECT rnk, word, n,
       CAST((cum * 1000000) // total AS BIGINT) AS coverage_ppm
FROM r WHERE rnk <= {VOCAB_TOP} ORDER BY rnk
"""


# ---------------------------------------------------------------------------
# T11 — character-level Shannon entropy: the standard cheap detector
# for gibberish / binary-contaminated / machine-generated text in a
# corpus quality gate (natural language sits in a narrow entropy band;
# base64 blobs and repeated boilerplate fall far outside it).
#
# H = ln(n) − (1/n)·Σ c·ln(c) over per-character counts c — computed
# from an explode → (doc, char) hash-agg (map-side combine; the
# shuffle carries ≤ |alphabet| rows per doc, not the text).  Rounded
# to 4 dp in BOTH engines: the JVM's and libm's ln may differ in the
# last ulp, and the rounding collapses that far below the comparison
# precision.
# ---------------------------------------------------------------------------
def t11_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # length >= 1 guard: Spark's sequence(1, 0) yields the DESCENDING
    # [1, 0] (not empty!), which would fabricate two empty-string char
    # rows for an empty document while the oracle's generate_series(1,0)
    # emits none — the same short-input trap c08 guards against.
    chars = d.filter(F.length("text") >= 1).select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.explode(F.expr("transform(sequence(1, length(text)), i -> substr(text, i, 1))")).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "n_chars", "ch").agg(
        F.count("*").cast("double").alias("c")
    )
    return (
        counts.groupBy("doc_id", "n_chars")
        .agg(
            F.count("*").cast("long").alias("n_distinct_chars"),
            F.round(
                F.log(F.col("n_chars").cast("double"))
                - F.sum(F.col("c") * F.log("c")) / F.col("n_chars"),
                4,
            ).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )


T11_SQL = """
WITH chars AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         substr(text, CAST(i AS INTEGER), 1) AS ch
  FROM documents, unnest(generate_series(1, length(text))) AS g(i)
  WHERE length(text) >= 1
), counts AS (
  SELECT doc_id, n_chars, ch, CAST(count(*) AS DOUBLE) AS c
  FROM chars GROUP BY doc_id, n_chars, ch
)
SELECT doc_id, n_chars,
       count(*) AS n_distinct_chars,
       round(ln(CAST(n_chars AS DOUBLE)) - sum(c * ln(c)) / n_chars, 4)
         AS entropy_nats
FROM counts GROUP BY doc_id, n_chars ORDER BY doc_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t01_token_stats": t01_token_stats,
    "t02_quality_score": t02_quality_score,
    "t03_lang_stats": t03_lang_stats,
    "t04_lang_id": t04_lang_id,
    "t05_fingerprint": t05_fingerprint,
    "t06_top_bigrams": t06_top_bigrams,
    "t07_tfidf_top_terms": t07_tfidf_top_terms,
    "t08_repetition_stats": t08_repetition_stats,
    "t09_readability": t09_readability,
    "t10_vocab_zipf": t10_vocab_zipf,
    "t11_char_entropy": t11_char_entropy,
}

ORACLE: dict[str, str] = {
    "t01_token_stats": T01_SQL,
    "t02_quality_score": T02_SQL,
    "t03_lang_stats": T03_SQL,
    "t04_lang_id": T04_SQL,
    "t05_fingerprint": T05_SQL,
    "t06_top_bigrams": T06_SQL,
    "t07_tfidf_top_terms": T07_SQL,
    "t08_repetition_stats": T08_SQL,
    "t09_readability": T09_SQL,
    "t10_vocab_zipf": T10_SQL,
    "t11_char_entropy": T11_SQL,
}
