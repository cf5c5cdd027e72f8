"""Late-registered queries (appended LAST in the registry).

The driver's correctness harness samples roughly the first ~50
registry entries per round; the registry rotation (registry.py) pins
specific never-yet-sampled queries inside that window.  Queries added
after the rotation was planned register here so they cannot shift
those indices — they are verified by tools/strict_verify.py and the
parametrized pytest instead, until a future rotation leads with them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aind_smartspim_data_transformation_spark.plans.relational import (
    Q38_SQL,
    Q39_SQL,
    Q40_SQL,
    Q41_SQL,
    Q42_SQL,
    Q43_SQL,
    Q44_SQL,
    Q45_SQL,
    Q46_SQL,
    Q47_SQL,
    q38_promo_share,
    q39_returned_items,
    q40_topk_per_group,
    q41_min_cost_supplier,
    q42_product_profit,
    q43_supplier_part_counts,
    q44_surge_suppliers,
    q45_dormant_customers,
    q46_shipmode_priority,
    q47_nation_reconciliation,
)
from aind_smartspim_data_transformation_spark.operators.corpus import (
    C12_SQL,
    C13_SQL,
    c12_stratified_exact_k,
    c13_mixture_rebalance,
)
from aind_smartspim_data_transformation_spark.operators import layout as _layout
from aind_smartspim_data_transformation_spark.operators import sketch as _sketch
from aind_smartspim_data_transformation_spark.tables import (
    load_table,
    spread_unsplittable_scan,
)


# ---------------------------------------------------------------------------
# X1 — semi-structured props via Spark 4's VARIANT type: parse once,
# probe typed.  e01 runs the same analysis with get_json_object (a
# string re-parse per path per row); `parse_json` builds the
# binary-encoded VARIANT once and `variant_get` is a typed probe into
# it — the right shape when many fields are read per row at 100 TB.
# Same output contract as e01, asserted row-identical in
# tests/test_events.py, and the oracle is e01's SQL.
# ---------------------------------------------------------------------------
def x01_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, True)).alias("n_k_gt50"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


X01_SQL = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50 THEN 1 END) AS n_k_gt50,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# X7 — distribution drift monitor: week-over-week TOTAL VARIATION
# DISTANCE of the event-type distribution, in integer ppm.  e12 tracks
# per-type count deltas; this is the distribution-level scalar a data-
# quality gate alerts on (TVD = ½·Σ|p_w − p_{w−1}| — 0 for identical
# mixes, 1e6 ppm for disjoint).  A pipeline feeding a trainer runs
# exactly this against every new ingest slice.
#
# Plan: ONE fact aggregation (week, type) with map-side combine; the
# dense week×type grid (zero-filling types absent in a week — without
# it a vanished type silently drops out of the sum) is generated from
# two tiny distinct sets, never shuffled at fact scale; shares are
# integer ppm (cnt·1e6 div total) so the oracle replays the metric
# bit-for-bit.
#
# CALENDAR semantics (round-5 fix, advisor finding): the previous week
# is week − 7 DAYS by self-join, not lag over observed weeks — if an
# entire week has zero events, the week after it gets NO drift row
# (explicit gap) instead of silently comparing against the last
# observed week.
# ---------------------------------------------------------------------------
def x07_weekly_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.tables import load_events

    ev = load_events(spark, sf_dir)
    counts = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    weeks = counts.select("week").distinct()
    types = counts.select("event_type").distinct()
    grid = weeks.crossJoin(F.broadcast(types))
    dense = grid.join(counts, ["week", "event_type"], "left").fillna(
        0, subset=["n"]
    )
    from pyspark.sql.window import Window as W

    totals = W.partitionBy("week")
    p = F.expr("n * 1000000 div greatest(week_total, 1)")
    shares = dense.withColumn("week_total", F.sum("n").over(totals)).withColumn(
        "p_ppm", p
    )
    prev = shares.select(
        F.date_add("week", 7).alias("week"),
        "event_type",
        F.col("p_ppm").alias("prev_p"),
    )
    drift = shares.join(prev, ["week", "event_type"])
    return (
        drift.groupBy("week")
        .agg(
            F.expr("sum(abs(p_ppm - prev_p)) div 2").alias("tvd_ppm"),
            F.count("*").alias("n_types"),
        )
        .orderBy("week")
    )


X07_SQL = """
WITH counts AS (
  SELECT date_trunc('week', ts)::DATE AS week, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT w.week, t.event_type
  FROM (SELECT DISTINCT week FROM counts) w
  CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
), dense AS (
  SELECT g.week, g.event_type, coalesce(c.n, 0) AS n
  FROM grid g LEFT JOIN counts c USING (week, event_type)
), shares AS (
  SELECT week, event_type,
         n * 1000000 // greatest(sum(n) OVER (PARTITION BY week), 1) AS p_ppm
  FROM dense
), drift AS (
  SELECT s.week, s.event_type, s.p_ppm, p.p_ppm AS prev_p
  FROM shares s
  JOIN shares p
    ON s.week = p.week + 7 AND s.event_type = p.event_type
)
SELECT week,
       -- CAST: DuckDB widens integer sum() to HUGEINT (int128); the
       -- driver's hash materializes HUGEINT differently from BIGINT
       -- even when values are int64-small (r5 red row).  All values
       -- are ppm-scale, far inside int64.
       CAST(sum(abs(p_ppm - prev_p)) // 2 AS BIGINT) AS tvd_ppm,
       count(*) AS n_types
FROM drift
GROUP BY week ORDER BY week
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # implemented in plans/relational.py; registered here (post-rotation
    # additions must not shift the leading modules' indices)
    "q38_promo_share": q38_promo_share,
    "q39_returned_items": q39_returned_items,
    "q40_topk_per_group": q40_topk_per_group,
    "q41_min_cost_supplier": q41_min_cost_supplier,
    "q42_product_profit": q42_product_profit,
    "q43_supplier_part_counts": q43_supplier_part_counts,
    "q44_surge_suppliers": q44_surge_suppliers,
    "q45_dormant_customers": q45_dormant_customers,
    "q46_shipmode_priority": q46_shipmode_priority,
    "q47_nation_reconciliation": q47_nation_reconciliation,
    "x01_variant_props": x01_variant_props,
    "c12_stratified_exact_k": c12_stratified_exact_k,
    "c13_mixture_rebalance": c13_mixture_rebalance,
    "x07_weekly_drift": x07_weekly_drift,
    **_sketch.QUERIES,
    **_layout.QUERIES,
}

ORACLE: dict[str, str] = {
    "q38_promo_share": Q38_SQL,
    "q39_returned_items": Q39_SQL,
    "q40_topk_per_group": Q40_SQL,
    "q41_min_cost_supplier": Q41_SQL,
    "q42_product_profit": Q42_SQL,
    "q43_supplier_part_counts": Q43_SQL,
    "q44_surge_suppliers": Q44_SQL,
    "q45_dormant_customers": Q45_SQL,
    "q46_shipmode_priority": Q46_SQL,
    "q47_nation_reconciliation": Q47_SQL,
    "x01_variant_props": X01_SQL,
    "c12_stratified_exact_k": C12_SQL,
    "c13_mixture_rebalance": C13_SQL,
    "x07_weekly_drift": X07_SQL,
    **_sketch.ORACLE,
    **_layout.ORACLE,
}


# ---------------------------------------------------------------------------
# X8 — referential-integrity audit: orphan-FK counts for the three
# fact→dim edges a pipeline joins on, in one query.  A broken upstream
# export (partial dim load, truncated fact) surfaces here as a nonzero
# orphan count BEFORE a training-data join silently drops the rows.
#
# Plan per edge: distinct FK keys (map-side partial distinct) →
# LEFT ANTI against the parent's key column → count.  Anti joins are
# key-shuffled and AQE-skew-splittable; the parent side is a 1-column
# projection.  The three audits are independent subtrees unioned at
# 1 row each — at 100 TB they run as three parallel jobs in one action.
# ---------------------------------------------------------------------------
def x08_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    edges = [
        ("lineitem.l_orderkey->orders", li.select("l_orderkey"), o.select("o_orderkey"), "l_orderkey", "o_orderkey"),
        ("orders.o_custkey->customer", o.select("o_custkey"), c.select("c_custkey"), "o_custkey", "c_custkey"),
        ("events.user_id->customer", load_table(spark, sf_dir, "events").select("user_id"), c.select("c_custkey"), "user_id", "c_custkey"),
    ]
    out = None
    for name, child, parent, ck, pk in edges:
        # ONE pass per edge: the distinct-key subtree feeds a single
        # LEFT OUTER join, and both counts come from the same
        # aggregation (count + count-of-unmatched) — a separate
        # anti-join branch would scan and key-shuffle the fact TWICE.
        # NULL child FKs are excluded (advisor r5): a NULL key never
        # equi-matches, so it would inflate n_orphans with rows that
        # are not dangling references — orphan_ppm measures TRUE
        # violations only.
        keys = child.filter(F.col(ck).isNotNull()).distinct()
        row = (
            keys.join(parent, keys[ck] == parent[pk], "left")
            .agg(
                F.count("*").alias("n_keys"),
                F.count(F.when(parent[pk].isNull(), True)).alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("edge"),
                "n_keys",
                "n_orphans",
                F.expr("n_orphans * 1000000 div greatest(n_keys, 1)").alias(
                    "orphan_ppm"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("edge")


X08_SQL = """
WITH e1 AS (
  SELECT 'lineitem.l_orderkey->orders' AS edge,
         count(*) AS n_keys,
         count(*) FILTER (WHERE o_orderkey IS NULL) AS n_orphans
  FROM (SELECT DISTINCT l_orderkey FROM lineitem
        WHERE l_orderkey IS NOT NULL) k
  LEFT JOIN orders ON k.l_orderkey = o_orderkey
), e2 AS (
  SELECT 'orders.o_custkey->customer',
         count(*),
         count(*) FILTER (WHERE c_custkey IS NULL)
  FROM (SELECT DISTINCT o_custkey FROM orders
        WHERE o_custkey IS NOT NULL) k
  LEFT JOIN customer ON k.o_custkey = c_custkey
), e3 AS (
  SELECT 'events.user_id->customer',
         count(*),
         count(*) FILTER (WHERE c_custkey IS NULL)
  FROM (SELECT DISTINCT user_id FROM events
        WHERE user_id IS NOT NULL) k
  LEFT JOIN customer ON k.user_id = c_custkey
), u AS (
  SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
)
SELECT edge, n_keys, n_orphans,
       n_orphans * 1000000 // greatest(n_keys, 1) AS orphan_ppm
FROM u ORDER BY edge
"""

QUERIES["x08_fk_orphans"] = x08_fk_orphans
ORACLE["x08_fk_orphans"] = X08_SQL


# ---------------------------------------------------------------------------
# T12 — mean corpus-frequency rank: an integer-exact quality proxy for
# "how surprising is this document's vocabulary" WITHOUT cross-engine
# float logs (a unigram LM's mean -log p orders docs the same way the
# mean frequency RANK does, and rank is exact).  Pipeline use: docs
# whose tokens are mostly deep-tail vocabulary are OCR noise /
# boilerplate-free gibberish; head-only docs are templates.
#
# Plan: ONE token explode → vocab aggregation (token-keyed shuffle,
# map-side combine, AQE-skew-splittable) → rank by (count desc, token
# asc) via distributed_order_stats (r7 — bucket-parallel, no global
# row_number window single-reducing the vocab) — then one token-keyed
# join back and a per-doc mean in integer milli.
# ---------------------------------------------------------------------------
def t12_mean_token_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    # r15: persist — distributed_order_stats scans its input three
    # times (quantile bounds + offset partials + the ranked pass; its
    # docstring says "persist upstream"), and this explode+groupBy over
    # every token is exactly the expensive input that contract is
    # about.  Every sibling caller (t10, n05/n06/n14/n15/n19, n18)
    # already persists; t12 was the one that recomputed.  Released by
    # the harness's clearCache() — SCALE.md §6q.
    vocab = toks.groupBy("tok").agg(F.count("*").alias("n")).persist()
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_order_stats,
    )

    # rank over the VOCAB via distributed_order_stats (r7): the rank
    # pass is bucket-parallel at any vocab size — the old global
    # row_number window single-reduced the vocab aggregate.
    ranked, _ = distributed_order_stats(
        vocab, "n", tie_cols=("tok",), rank_col="rank", ascending=False
    )
    return (
        toks.join(ranked.select("tok", "rank"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.expr("sum(rank) * 1000 div count(*)").alias("mean_rank_milli"),
            F.max("rank").alias("rarest_rank"),
        )
        .orderBy("doc_id")
    )


T12_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), toks_f AS (
  SELECT doc_id, tok FROM toks WHERE tok != ''
), vocab AS (
  SELECT tok, count(*) AS n FROM toks_f GROUP BY tok
), ranked AS (
  SELECT tok, row_number() OVER (ORDER BY n DESC, tok ASC) AS rank FROM vocab
)
SELECT doc_id, count(*) AS n_tok,
       -- CAST: sum() widens to HUGEINT in DuckDB (driver-hash-unsafe)
       CAST(sum(rank) * 1000 // count(*) AS BIGINT) AS mean_rank_milli,
       max(rank) AS rarest_rank
FROM toks_f JOIN ranked USING (tok)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# E15 — event-type transition matrix (first-order user journey): per
# (from_type, to_type) consecutive-pair counts and row-normalized
# probability in integer ppm.  The standard input to funnel mining,
# anomaly detection ("error→purchase should be ~0"), and Markov
# session simulators.
#
# Plan: ONE per-user lag window (user_id-keyed shuffle — the same
# partitioning e04 sessionization uses, reusable across both) → tiny
# (from, to) aggregation with map-side combine → per-from totals via a
# second aggregation of the |types|² table, broadcast back.
# ---------------------------------------------------------------------------
def e15_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.tables import load_events
    from pyspark.sql.window import Window as W

    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("n * 1000000 div row_total").alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


E15_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
), counted AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       -- CAST: the window sum() is HUGEINT in DuckDB, so the integer
       -- division inherits int128 (driver-hash-unsafe)
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS p_ppm
FROM counted ORDER BY from_type, to_type
"""

QUERIES["t12_mean_token_rank"] = t12_mean_token_rank
ORACLE["t12_mean_token_rank"] = T12_SQL
QUERIES["e15_transition_matrix"] = e15_transition_matrix
ORACLE["e15_transition_matrix"] = E15_SQL


# ---------------------------------------------------------------------------
# D13 — dedup keeping the BEST copy: near-dup clusters (d03 pairs →
# d09's O(log n) star clustering) resolved by QUALITY (t02's integer
# score) instead of by arbitrary min-id — the curation decision a real
# pipeline makes: among N near-duplicates, keep the highest-quality
# text, drop the rest, and account for the quality mass removed.
#
# Plan: candidate pairs and clustering are the d03/d09 machinery
# (banded, capped, |E|-row shuffles); scoring touches ONLY clustered
# docs (cluster membership ≪ corpus); the keeper choice is one
# `max_by` aggregate per cluster — deterministic tiebreak on (quality,
# -doc_id), no window needed.
# ---------------------------------------------------------------------------
def d13_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        connected_components_star,
        d03_dedup_minhash_lsh,
    )
    from aind_smartspim_data_transformation_spark.operators.text import (
        quality_ppm_expr,
    )

    pairs = d03_dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    comp = connected_components_star(pairs)
    docs = load_table(spark, sf_dir, "documents")
    # Membership filter BEFORE scoring: a post-join filter would still
    # evaluate the (tokenize-heavy) quality projection corpus-wide.
    # NO forced broadcast — members scales with the corpus dup rate
    # (a boilerplate-heavy crawl can cluster half its docs), so AQE
    # picks broadcast while it fits and semi-SMJ beyond.
    members = comp.select(F.col("node").alias("doc_id"))
    scored = docs.join(members, "doc_id", "left_semi").select(
        "doc_id", quality_ppm_expr().alias("q")
    )
    m = comp.join(scored, comp["node"] == scored["doc_id"]).select(
        "label", "doc_id", "q"
    )
    return (
        m.groupBy(F.col("label").alias("component"))
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("max_by(doc_id, struct(q, -doc_id))").alias("keeper_doc"),
            F.max("q").alias("keeper_q_ppm"),
            (F.sum("q") - F.max("q")).alias("q_ppm_dropped"),
        )
        .orderBy("component")
    )


def _d13_sql() -> str:
    from aind_smartspim_data_transformation_spark.operators.dedup import D03_SQL
    from aind_smartspim_data_transformation_spark.operators.text import (
        QUALITY_BASE_SQL,
        QUALITY_PPM_SQL,
    )

    return f"""
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
), base AS ({QUALITY_BASE_SQL}
), scored AS (
  SELECT doc_id,
         {QUALITY_PPM_SQL} AS q
  FROM base
), k AS (
  SELECT comp.component, s.doc_id, s.q,
         row_number() OVER (PARTITION BY comp.component
                            ORDER BY s.q DESC, s.doc_id ASC) AS rn
  FROM comp JOIN scored s ON comp.node = s.doc_id
)
SELECT component,
       count(*) AS n_docs,
       max(CASE WHEN rn = 1 THEN doc_id END) AS keeper_doc,
       max(CASE WHEN rn = 1 THEN q END) AS keeper_q_ppm,
       CAST(sum(q) - max(CASE WHEN rn = 1 THEN q END) AS BIGINT)
         AS q_ppm_dropped
FROM k GROUP BY component ORDER BY component
"""


QUERIES["d13_keep_best_quality"] = d13_keep_best_quality
ORACLE["d13_keep_best_quality"] = _d13_sql()


# ---------------------------------------------------------------------------
# C14 — the COMPLETE curation pipeline as ONE dataflow, the capstone
# composition a training-data team actually ships: near-dup clusters
# keep their best-quality copy (d13), unclustered docs pass through,
# survivors face the c05 quality gate, and the kept corpus is
# hash-split (c01) — output is the final corpus manifest per
# (split, lang) with doc/token accounting at every pipeline stage.
#
# Plan: the expensive stages are the d03/d09 machinery (banded,
# capped) and ONE quality scan of the corpus; keepers + unclustered
# are a semi/anti pair on the same tiny membership table; everything
# downstream aggregates |splits|×|langs| rows.  The whole pipeline is
# one lazy plan — no intermediate materialization, Catalyst sees (and
# prunes) end to end.
# ---------------------------------------------------------------------------
def c14_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.corpus import (
        MIN_TOKENS,
        QUALITY_KEEP_PPM,
    )
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        connected_components_star,
        d03_dedup_minhash_lsh,
    )
    from aind_smartspim_data_transformation_spark.operators.text import (
        quality_ppm_expr,
    )

    pairs = d03_dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2")
    comp = connected_components_star(pairs)
    docs = load_table(spark, sf_dir, "documents")
    members = comp.select(F.col("node").alias("doc_id"))

    scored_members = docs.join(members, "doc_id", "left_semi").select(
        "doc_id", quality_ppm_expr().alias("q")
    )
    keepers = (
        comp.join(scored_members, comp["node"] == scored_members["doc_id"])
        .groupBy("label")
        .agg(F.expr("max_by(doc_id, struct(q, -doc_id))").alias("doc_id"))
        .select("doc_id")
    )
    surviving = docs.join(members, "doc_id", "left_anti").select("doc_id").unionByName(
        keepers
    )
    n_tokens = F.size(F.split("text", " "))
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
    kept = (
        docs.join(surviving, "doc_id", "left_semi")
        .filter(
            (quality_ppm_expr() >= QUALITY_KEEP_PPM) & (n_tokens >= MIN_TOKENS)
        )
        .select(split.alias("split"), "lang", n_tokens.alias("n_tok"))
    )
    return (
        kept.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("split", "lang")
    )


def _c14_sql() -> str:
    from aind_smartspim_data_transformation_spark.operators.corpus import (
        MIN_TOKENS,
        QUALITY_KEEP_PPM,
    )
    from aind_smartspim_data_transformation_spark.operators.dedup import D03_SQL
    from aind_smartspim_data_transformation_spark.operators.text import (
        QUALITY_BASE_SQL,
        QUALITY_PPM_SQL,
    )

    return f"""
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
), base AS ({QUALITY_BASE_SQL}
), scored AS (
  SELECT doc_id,
         {QUALITY_PPM_SQL} AS q
  FROM base
), keepers AS (
  SELECT doc_id FROM (
    SELECT s.doc_id,
           row_number() OVER (PARTITION BY comp.component
                              ORDER BY s.q DESC, s.doc_id ASC) AS rn
    FROM comp JOIN scored s ON comp.node = s.doc_id
  ) WHERE rn = 1
), surviving AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT node FROM comp)
  UNION ALL
  SELECT doc_id FROM keepers
), kept AS (
  SELECT CASE WHEN substring(md5(b.doc_id::VARCHAR), 1, 1) < 'c' THEN 'train'
              WHEN substring(md5(b.doc_id::VARCHAR), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split,
         b.lang, b.n_tokens AS n_tok
  FROM base b JOIN surviving USING (doc_id)
  WHERE ({QUALITY_PPM_SQL.replace("text", "b.text")}) >= {QUALITY_KEEP_PPM}
    AND b.n_tokens >= {MIN_TOKENS}
)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM kept GROUP BY split, lang ORDER BY split, lang
"""


QUERIES["c14_curation_pipeline"] = c14_curation_pipeline
ORACLE["c14_curation_pipeline"] = _c14_sql()


# ---------------------------------------------------------------------------
# X9 — profile drift between the FIRST and SECOND half of the event
# timeline: per event_type, row counts, distinct users, and
# integer-micro value means for each half plus the count delta in ppm.
# x07 watches the type MIX week over week; this is the coarser
# before/after diff a pipeline runs when re-ingesting a source ("same
# data, or did the schema/semantics drift?").
#
# Determinism: the split boundary is the micro-second midpoint of
# (min ts, max ts) — integer div of unix micros, identical in both
# engines; value means are exact int64 sums of truncated micro units
# divided once.  Plan: one min/max scan (broadcast single row), then
# ONE aggregation of the fact with map-side combine; distinct users
# via two exact countDistincts per type (Expand ×2 over the tiny
# per-type groups).
# ---------------------------------------------------------------------------
def x09_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.tables import load_events

    ev = load_events(spark, sf_dir)
    bounds = ev.agg(
        F.expr(
            "(unix_micros(min(ts)) + unix_micros(max(ts))) div 2"
        ).alias("mid_us")
    )
    halves = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "h2", (F.expr("unix_micros(ts)") >= F.col("mid_us")).cast("int")
    )
    # explicit floor: a bare double→bigint CAST truncates in Spark but
    # ROUNDS in DuckDB — floor() is the same function in both engines
    # (values are non-negative, so floor == truncation)
    vmicro = F.expr("CAST(floor(value * 1000000) AS BIGINT)")
    agg = halves.groupBy("event_type").agg(
        F.count(F.when(F.col("h2") == 0, True)).alias("n_first"),
        F.count(F.when(F.col("h2") == 1, True)).alias("n_second"),
        F.countDistinct(F.when(F.col("h2") == 0, F.col("user_id"))).alias(
            "users_first"
        ),
        F.countDistinct(F.when(F.col("h2") == 1, F.col("user_id"))).alias(
            "users_second"
        ),
        F.sum(F.when(F.col("h2") == 0, vmicro).otherwise(F.lit(0))).alias("s1"),
        F.sum(F.when(F.col("h2") == 1, vmicro).otherwise(F.lit(0))).alias("s2"),
    )
    return agg.select(
        "event_type",
        "n_first",
        "n_second",
        F.expr(
            "(n_second - n_first) * 1000000 div greatest(n_first, 1)"
        ).alias("count_delta_ppm"),
        "users_first",
        "users_second",
        F.expr("s1 div greatest(n_first, 1)").alias("mean_micro_first"),
        F.expr("s2 div greatest(n_second, 1)").alias("mean_micro_second"),
    ).orderBy("event_type")


X09_SQL = """
WITH bounds AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us FROM events
), halves AS (
  SELECT event_type, user_id,
         CAST(floor(value * 1000000) AS BIGINT) AS vmicro,
         CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END AS h2
  FROM events CROSS JOIN bounds
), agg AS (
  SELECT event_type,
         count(CASE WHEN h2 = 0 THEN 1 END) AS n_first,
         count(CASE WHEN h2 = 1 THEN 1 END) AS n_second,
         count(DISTINCT CASE WHEN h2 = 0 THEN user_id END) AS users_first,
         count(DISTINCT CASE WHEN h2 = 1 THEN user_id END) AS users_second,
         sum(CASE WHEN h2 = 0 THEN vmicro ELSE 0 END) AS s1,
         sum(CASE WHEN h2 = 1 THEN vmicro ELSE 0 END) AS s2
  FROM halves GROUP BY event_type
)
SELECT event_type, n_first, n_second,
       (n_second - n_first) * 1000000 // greatest(n_first, 1)
         AS count_delta_ppm,
       users_first, users_second,
       -- CAST: s1/s2 are DuckDB HUGEINT sums (driver-hash-unsafe)
       CAST(s1 // greatest(n_first, 1) AS BIGINT) AS mean_micro_first,
       CAST(s2 // greatest(n_second, 1) AS BIGINT) AS mean_micro_second
FROM agg ORDER BY event_type
"""

QUERIES["x09_profile_drift"] = x09_profile_drift
ORACLE["x09_profile_drift"] = X09_SQL


# ---------------------------------------------------------------------------
# N1 (round 6) — MinHash estimator calibration QA: for every VERIFIED
# d03 near-dup pair, the lane-agreement Jaccard estimate (agreeing
# minhash lanes / 16, the statistic LSH banding is built on) next to
# the exact shingle-set Jaccard, both in integer ppm.  This is the
# audit a pipeline team runs before trusting a (bands, rows) setting:
# a mis-calibrated estimator silently changes the dedup threshold.
#
# Plan: d03's verified pairs; signatures and shingle sets computed for
# PAIR DOCS ONLY (broadcast semi-filter before the tokenize-heavy
# explode — pair docs ≪ corpus); agreement is a narrow 16-way equality
# sum, exact Jaccard a narrow array_intersect — no shingle-level join.
# ---------------------------------------------------------------------------
def n01_minhash_estimator_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        N_MINHASH,
        _SHINGLES,
        d03_dedup_minhash_lsh,
    )

    # r15 (guide §2.4): persist the d03 output — this plan references it
    # THREE times (both pair_docs union branches + the final pair join),
    # and without the persist each reference re-executes d03's whole
    # verify pipeline (measured: n01 exec 6.3–8.2 s, ~3× d03's own
    # wall; the lazy plan carried 50 parquet scans).  Tiny (|pairs|
    # rows); released by the harness's clearCache() — SCALE.md §6q.
    pairs = (
        d03_dedup_minhash_lsh(spark, sf_dir).select("doc1", "doc2").persist()
    )
    pair_docs = (
        pairs.select(F.col("doc1").alias("doc_id"))
        .union(pairs.select(F.col("doc2")))
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents").join(
        F.broadcast(pair_docs), "doc_id"
    )
    sh = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLES)).alias("sh"))
    )
    side = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i // 4}|"), F.col("sh"))),
                    8 * (i % 4) + 1,
                    8,
                )
            ).alias(f"h{i}")
            for i in range(N_MINHASH)
        ],
        F.collect_set("sh").alias("shs"),
    )
    s1 = side.select(
        F.col("doc_id").alias("doc1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_MINHASH)],
        F.col("shs").alias("shs1"),
    )
    s2 = side.select(
        F.col("doc_id").alias("doc2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_MINHASH)],
        F.col("shs").alias("shs2"),
    )
    agree = None
    for i in range(N_MINHASH):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("long")
        agree = t if agree is None else agree + t
    common = F.size(F.array_intersect("shs1", "shs2")).cast("long")
    union = (
        F.size("shs1").cast("long") + F.size("shs2").cast("long") - common
    )
    return (
        pairs.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            agree.alias("agree_lanes"),
            common.alias("n_common"),
            union.alias("n_union"),
        )
        .select(
            "doc1",
            "doc2",
            "agree_lanes",
            F.expr(f"agree_lanes * 1000000 div {N_MINHASH}").alias("est_ppm"),
            F.expr("n_common * 1000000 div n_union").alias("exact_ppm"),
        )
        .withColumn("err_ppm", F.expr("abs(est_ppm - exact_ppm)"))
        .orderBy("doc1", "doc2")
    )


def _n01_sql() -> str:
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        D03_SQL,
        N_MINHASH,
        _MINHASH_COLS,
    )

    agree = " + ".join(
        f"CAST(sa.h{i} = sb.h{i} AS BIGINT)" for i in range(N_MINHASH)
    )
    return f"""
WITH pairs AS (
  SELECT doc1, doc2 FROM ({D03_SQL}) _d03
), pd AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc1 AS doc_id FROM pairs UNION ALL SELECT doc2 FROM pairs
  )
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
    AND doc_id IN (SELECT doc_id FROM pd)
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM toks
), sigs AS (
  SELECT doc_id,
         {_MINHASH_COLS}
  FROM sh GROUP BY doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT p.doc1, p.doc2, count(*) AS n_common
  FROM pairs p
  JOIN sh x ON x.doc_id = p.doc1
  JOIN sh y ON y.doc_id = p.doc2 AND y.sh = x.sh
  GROUP BY p.doc1, p.doc2
)
SELECT p.doc1, p.doc2,
       CAST({agree} AS BIGINT) AS agree_lanes,
       CAST(({agree}) * 1000000 // {N_MINHASH} AS BIGINT) AS est_ppm,
       CAST(c.n_common * 1000000 // (za.n_sh + zb.n_sh - c.n_common)
            AS BIGINT) AS exact_ppm,
       CAST(abs(({agree}) * 1000000 // {N_MINHASH}
            - c.n_common * 1000000 // (za.n_sh + zb.n_sh - c.n_common))
            AS BIGINT) AS err_ppm
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.doc1
JOIN sigs sb ON sb.doc_id = p.doc2
JOIN common c ON c.doc1 = p.doc1 AND c.doc2 = p.doc2
JOIN sizes za ON za.doc_id = p.doc1
JOIN sizes zb ON zb.doc_id = p.doc2
ORDER BY p.doc1, p.doc2
"""


QUERIES["n01_minhash_estimator_qa"] = n01_minhash_estimator_qa
ORACLE["n01_minhash_estimator_qa"] = _n01_sql()


# ---------------------------------------------------------------------------
# N2 (round 6) — pairwise source similarity: total variation distance
# between every two sources' token distributions, integer ppm.  The
# "which sources are interchangeable / which add diversity" matrix a
# mixture designer reads before setting c13's temperatures, and the
# redundancy screen before paying to ingest a new crawl.
#
# TVD over the token UNION without a dense |vocab|×|pairs| grid:
#   Σ_union |p1−p2| = Σ_shared |p1−p2| − Σ_shared p1 − Σ_shared p2
#                     + T1 + T2
# where T_s = Σ p_ppm over ALL of source s's tokens — so the only join
# is token-keyed on the SHARED vocabulary (map-side-combined counts,
# ≤|sources|² rows per token), plus a broadcast of the |sources|-row
# totals.  At web scale, cap to the top-V tokens per source first
# (the tail contributes ≤ vocab-floor-loss ppm to TVD).
# ---------------------------------------------------------------------------
def n02_source_pair_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("source", "tok").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("source").agg(F.sum("n").alias("tot"))
    p = cnt.join(F.broadcast(tot), "source").select(
        "source", "tok", F.expr("n * 1000000 div tot").alias("p_ppm")
    )
    t_ppm = p.groupBy("source").agg(F.sum("p_ppm").alias("t_ppm"))
    a = p.select(
        F.col("source").alias("s1"), "tok", F.col("p_ppm").alias("p1")
    )
    b = p.select(
        F.col("source").alias("s2"), "tok", F.col("p_ppm").alias("p2")
    )
    shared = (
        a.join(b, "tok")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum(F.expr("abs(p1 - p2)")).alias("sum_abs"),
            F.sum("p1").alias("sum_p1"),
            F.sum("p2").alias("sum_p2"),
            F.count("*").alias("n_shared"),
        )
    )
    ta = t_ppm.select(F.col("source").alias("s1"), F.col("t_ppm").alias("t1"))
    tb = t_ppm.select(F.col("source").alias("s2"), F.col("t_ppm").alias("t2"))
    return (
        shared.join(F.broadcast(ta), "s1")
        .join(F.broadcast(tb), "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            F.expr("(sum_abs - sum_p1 - sum_p2 + t1 + t2) div 2").alias(
                "tvd_ppm"
            ),
        )
        .orderBy("s1", "s2")
    )


N02_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), tok_f AS (
  SELECT source, tok FROM tok WHERE tok != ''
), cnt AS (
  SELECT source, tok, count(*) AS n FROM tok_f GROUP BY source, tok
), tot AS (
  SELECT source, sum(n) AS tot FROM cnt GROUP BY source
), p AS (
  SELECT c.source, c.tok,
         CAST(c.n * 1000000 // t.tot AS BIGINT) AS p_ppm
  FROM cnt c JOIN tot t USING (source)
), t_ppm AS (
  SELECT source, CAST(sum(p_ppm) AS BIGINT) AS t_ppm FROM p GROUP BY source
), shared AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(sum(abs(a.p_ppm - b.p_ppm)) AS BIGINT) AS sum_abs,
         CAST(sum(a.p_ppm) AS BIGINT) AS sum_p1,
         CAST(sum(b.p_ppm) AS BIGINT) AS sum_p2,
         count(*) AS n_shared
  FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s1, s2, n_shared,
       CAST((sum_abs - sum_p1 - sum_p2 + ta.t_ppm + tb.t_ppm) // 2
            AS BIGINT) AS tvd_ppm
FROM shared
JOIN t_ppm ta ON ta.source = s1
JOIN t_ppm tb ON tb.source = s2
ORDER BY s1, s2
"""

QUERIES["n02_source_pair_tvd"] = n02_source_pair_tvd
ORACLE["n02_source_pair_tvd"] = N02_SQL


# ---------------------------------------------------------------------------
# N3 (round 6) — corpus balance audit: the Gini coefficient of the
# doc-count distribution across sources, integer ppm (0 = perfectly
# balanced, →1e6 as one source dominates).  The single-scalar health
# figure next to c13's per-source detail: a mixture whose Gini creeps
# up is concentrating, whatever the per-source boosts say.
#
# Gini = Σ_i Σ_j |n_i − n_j| / (2·S·Σn) — computed on the
# |sources|-row aggregate, so the pairwise cross product is S² rows of
# a broadcast-sized table; the corpus itself contributes ONE map-side-
# combined count aggregation.
# ---------------------------------------------------------------------------
def n03_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").alias("n"))
    a = per.select(F.col("n").alias("na"))
    b = per.select(F.col("n").alias("nb"))
    sum_abs = a.crossJoin(b).agg(
        F.sum(F.expr("abs(na - nb)")).alias("sum_abs")
    )
    tots = per.agg(
        F.count("*").alias("n_sources"), F.sum("n").alias("total_docs")
    )
    return sum_abs.crossJoin(F.broadcast(tots)).select(
        "n_sources",
        "total_docs",
        F.expr("sum_abs * 1000000 div (2 * n_sources * total_docs)").alias(
            "gini_ppm"
        ),
    )


N03_SQL = """
WITH per AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
), pairwise AS (
  SELECT CAST(sum(abs(a.n - b.n)) AS BIGINT) AS sum_abs
  FROM per a CROSS JOIN per b
), tots AS (
  SELECT count(*) AS n_sources, CAST(sum(n) AS BIGINT) AS total_docs
  FROM per
)
SELECT n_sources, total_docs,
       CAST(sum_abs * 1000000 // (2 * n_sources * total_docs) AS BIGINT)
         AS gini_ppm
FROM pairwise CROSS JOIN tots
"""

QUERIES["n03_source_gini"] = n03_source_gini
ORACLE["n03_source_gini"] = N03_SQL


# ---------------------------------------------------------------------------
# N4 (round 6) — event burstiness: the Fano factor (variance/mean) of
# DAILY event counts per type, integer milli, over the dense day grid
# (zero days included — a bursty type IS one with quiet days; dropping
# them would bias every type toward Poisson).  ~1000 milli ≈ Poisson
# arrivals; ≫1000 = bursty (bot storms, batch replays); ≪1000 =
# over-regular (heartbeats).  The temporal-health twin of x09's
# before/after drift.
#
# Plan: one (type, day) fact aggregation with map-side combine; the
# dense grid is sequence(min_day, max_day) × distinct types — tiny,
# broadcast; moments are exact int64 (Σn, Σn²).  At 100 TB per-type
# daily totals can overflow the n·Σn² term past int64 — shard the
# moments by month and merge, or move the final arithmetic to decimal;
# at test SFs the values are ≤~1e12, exact in both engines.
# ---------------------------------------------------------------------------
def n04_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.tables import load_events

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.expr("sequence(d0, d1)")).alias("d"))
    types = daily.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "d"], "left")
        .fillna(0, subset=["n"])
    )
    return (
        dense.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("n").alias("total"),
            F.sum(F.expr("n * n")).alias("s2"),
        )
        .select(
            "event_type",
            "n_days",
            "total",
            F.expr(
                "(n_days * s2 - total * total) * 1000"
                " div (n_days * greatest(total, 1))"
            ).alias("fano_milli"),
        )
        .orderBy("event_type")
    )


N04_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), bounds AS (
  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
), days AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM daily
), dense AS (
  SELECT t.event_type, dy.d, coalesce(daily.n, 0) AS n
  FROM days dy CROSS JOIN types t
  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = dy.d
), agg AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(n) AS BIGINT) AS total,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM dense GROUP BY event_type
)
SELECT event_type, n_days, total,
       CAST((n_days * s2 - total * total) * 1000
            // (n_days * greatest(total, 1)) AS BIGINT) AS fano_milli
FROM agg ORDER BY event_type
"""

QUERIES["n04_event_burstiness"] = n04_event_burstiness
ORACLE["n04_event_burstiness"] = N04_SQL


# ---------------------------------------------------------------------------
# N5 (round 6) — sequence-packing audit: the standard LLM pre-training
# prep concatenates a source's documents in a deterministic order and
# cuts the token stream every CAP tokens into fixed-length training
# sequences ("concat-and-chunk").  This audits that packing per source
# WITHOUT materializing the packed stream: per doc, the running token
# offset places it in its first/last shard; per source we report shard
# count, fill, docs-per-shard, and the fraction of docs straddling a
# shard boundary (high straddle → more mid-document truncations seen
# by the model).  Token counts are t01's whitespace tokens (parity
# with DuckDB's string_split established there).
#
# Plan (round 7): the per-source cumsum RIDES the two-pass distributed
# prefix sum — operators/scale_utils.py::distributed_cumsum with
# partition_cols=("source",): global literal doc_id range buckets,
# per-(source, bucket) token subtotals, per-source offsets from a
# window over that ≤#buckets-row AGGREGATE (partitioned by source —
# never the driver, never one task), then a window partitioned by
# (source, bucket).  A source whose stream outgrows one task no longer
# serializes through a single per-source window — the r6 scale caveat
# is retired; the form is row-identical (doc_id is a total order per
# source), so the window oracle is unchanged.  docs is persisted (the
# construction scans it twice beyond the quantile pass).  All outputs
# integer (ppm/milli), CAST to BIGINT for the driver hash.
# ---------------------------------------------------------------------------
_N05_CAP = 2048  # tokens per packed training sequence


def n05_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_cumsum,
    )

    cap = _N05_CAP
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("tok"),
    ).persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    placed = distributed_cumsum(
        docs, "doc_id", "tok", out_col="cum", partition_cols=("source",)
    ).select(
        "source",
        "tok",
        "cum",
    ).select(
        "source",
        "tok",
        F.expr(f"(cum - tok) div {cap}").alias("shard_first"),
        F.expr(f"(cum - 1) div {cap}").alias("shard_last"),
    )
    out = (
        placed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("total_tokens"),
            F.sum(
                F.expr("CASE WHEN shard_last > shard_first THEN 1 ELSE 0 END")
            ).alias("n_straddle"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr(f"(total_tokens + {cap} - 1) div {cap}").alias("n_shards"),
            F.expr(
                f"n_docs * 1000 div ((total_tokens + {cap} - 1) div {cap})"
            ).alias("docs_per_shard_milli"),
            F.expr(
                f"total_tokens * 1000000 div "
                f"(((total_tokens + {cap} - 1) div {cap}) * {cap})"
            ).alias("fill_ppm"),
            F.expr("n_straddle * 1000000 div n_docs").alias("straddle_ppm"),
        )
        .orderBy("source")
    )
    # Cache lifetime: `docs` stays persisted so the RETURNED plan keeps
    # its InMemoryRelation — the final consumer must not recompute the
    # shared subtree (r8 regression: in-plan unpersist inflated this
    # query to 4 wide exchanges).  Sweep harnesses release caches
    # between queries via spark.catalog.clearCache().
    return out


N05_SQL = f"""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS tok
  FROM documents
), placed AS (
  SELECT source, tok,
         sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
), shards AS (
  SELECT source, tok,
         (cum - tok) // {_N05_CAP} AS shard_first,
         (cum - 1) // {_N05_CAP} AS shard_last
  FROM placed
), agg AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN shard_last > shard_first THEN 1 ELSE 0 END)
              AS BIGINT) AS n_straddle
  FROM shards GROUP BY source
)
SELECT source, n_docs, total_tokens,
       CAST((total_tokens + {_N05_CAP} - 1) // {_N05_CAP} AS BIGINT)
         AS n_shards,
       CAST(n_docs * 1000
            // ((total_tokens + {_N05_CAP} - 1) // {_N05_CAP}) AS BIGINT)
         AS docs_per_shard_milli,
       CAST(total_tokens * 1000000
            // (((total_tokens + {_N05_CAP} - 1) // {_N05_CAP})
                * {_N05_CAP}) AS BIGINT) AS fill_ppm,
       CAST(n_straddle * 1000000 // n_docs AS BIGINT) AS straddle_ppm
FROM agg ORDER BY source
"""

QUERIES["n05_sequence_packing"] = n05_sequence_packing
ORACLE["n05_sequence_packing"] = N05_SQL


# ---------------------------------------------------------------------------
# N6 (round 6) — curriculum quality deciles: bucket the corpus into 10
# equal-count tiers by a deterministic lexical-quality proxy (type-
# token ratio, milli — distinct whitespace tokens per token) and report
# each tier's volume so a data-mixing curriculum (quality-ascending
# schedules, tier-weighted sampling) can be priced before writing any
# shards.  Total order is (ttr_milli, doc_id) — the doc_id tie-break
# makes ntile assignment unique, so both engines agree row-for-row.
#
# Plan (round 7): one narrow projection, then the EXACT distributed
# ntile — operators/scale_utils.py::distributed_ntile: literal
# approx-quantile range buckets (ties never split), per-bucket counts
# to the driver (#buckets rows, not data), within-bucket row_number
# windows PARTITIONED by bucket, pure tile arithmetic on the global
# position.  NO partition-less window exists anywhere in the plan
# (test_plan_fingerprints asserts no Exchange SinglePartition) — the
# single-reducer global sort VERDICT r6 flagged is gone, and the form
# is still row-identical to ntile(10), so the oracle is unchanged.
# scored is persisted: the construction scans it three times
# (quantile / count / tile passes).  All outputs integer, CAST BIGINT.
# ---------------------------------------------------------------------------
def n06_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_ntile,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("tok"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000"
            " div size(split(text, ' '))"
        ).alias("ttr_milli"),
    ).persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    tiered = distributed_ntile(
        scored, "ttr_milli", 10, tie_cols=("doc_id",), out_col="tier"
    )
    out = (
        tiered.groupBy("tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("ttr_milli").alias("ttr_lo"),
            F.max("ttr_milli").alias("ttr_hi"),
            F.sum("tok").alias("total_tokens"),
            F.expr("sum(n_chars) * 1000 div count(*)").alias(
                "mean_chars_milli"
            ),
        )
        .orderBy("tier")
    )
    # Cache lifetime: kept persisted so the returned plan retains its
    # InMemoryRelation (see n05); harness-level clearCache() handles
    # sweep hygiene.
    return out


N06_SQL = """
WITH scored AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS tok,
         len(list_distinct(string_split(text, ' '))) * 1000
           // len(string_split(text, ' ')) AS ttr_milli
  FROM documents
), tiered AS (
  SELECT n_chars, tok, ttr_milli,
         ntile(10) OVER (ORDER BY ttr_milli, doc_id) AS tier
  FROM scored
)
SELECT tier, count(*) AS n_docs,
       CAST(min(ttr_milli) AS BIGINT) AS ttr_lo,
       CAST(max(ttr_milli) AS BIGINT) AS ttr_hi,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) * 1000 // count(*) AS BIGINT) AS mean_chars_milli
FROM tiered GROUP BY tier ORDER BY tier
"""

QUERIES["n06_quality_deciles"] = n06_quality_deciles
ORACLE["n06_quality_deciles"] = N06_SQL


# ---------------------------------------------------------------------------
# N7 (round 6) — SemDeDup-style semantic dedup (Abbas et al. 2023,
# arXiv:2303.09540): k-means-cluster the embedding space, then compare
# pairs ONLY within a cluster and drop every vector that has a
# lower-id neighbor at cosine ≥ EPS (greedy keep-lowest-id — the
# deterministic stand-in for the paper's keep-one-representative).
# Reports per-cluster volume, drops, and kept_ppm — the dedup budget a
# curation run prices before committing.
#
# Plan: Lloyd training is s09's shared helper (integer-exact, literal
# centroids → assignment is a narrow broadcast map, corpus scanned
# once per iteration, K×d-row update shuffles); the pair stage
# shuffles on `cell`, so work is Σ|cell|² — the SemDeDup contract is
# that K scales with corpus size (the paper uses 11k clusters for
# 100M docs) keeping clusters bounded; a degenerate giant cluster is
# the K-too-small smell, and the per-cell counts this query emits are
# exactly the monitor for it.  Cosine is float (round 6dp) only
# inside the threshold compare — every OUTPUT column is BIGINT.
# ---------------------------------------------------------------------------
SEM_K = 16
SEM_ITERS = 2
SEM_EPS = 0.9


def n07_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators import (
        similarity as S,
    )

    from aind_smartspim_data_transformation_spark.tables import (
        spread_unsplittable_scan,
    )

    # r15: conditional scan spread (guide §2.5) — the quantize
    # transforms and every Lloyd assignment pass run scan-side and
    # would otherwise serialize on the one-file scan's single task.
    e = spread_unsplittable_scan(
        load_table(spark, sf_dir, "embeddings")
    ).select(
        "vec_id",
        F.expr(
            f"transform(embedding, v -> "
            f"CAST(floor(CAST(v AS DOUBLE) * {S.KM_SCALE}) AS BIGINT))"
        ).alias("x"),
        F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("v"),
    )
    assigned, _ = S.lloyd_train(e, SEM_K, SEM_ITERS)
    # FAT-CELL GUARD (r10): collapse EXACT-duplicate vectors per cell
    # before the pair loop.  The Σ n_c² pair work is then quadratic in
    # DISTINCT vectors per cell, not rows — the regime that made n07
    # the 10× sweep's 271 s wall (a verbatim-replicated corpus folds
    # k-means cells into few fat ones whose members are mostly exact
    # copies) collapses back to base-corpus cost.  Provably
    # answer-preserving under SemDeDup's drop-to-lowest-id rule:
    #   member b of dup-group g is dropped iff
    #     (selfcos(g) ≥ eps AND b ≠ min(g))          — intra-group —
    #     OR ∃ g' ≠ g same cell: cos(g,g') ≥ eps AND min(g') < b.
    #   cos() depends only on the vectors, so cross-group drops reduce
    #   to the representative pair loop with min(g') < min(g) (any
    #   non-rep b > min(g) with a qualifying g' is already intra-
    #   dropped: selfcos of a finite nonzero vector rounds to 1, and a
    #   zero-norm vector's cos is NULL-guarded (ANSI: see the divisor
    #   guards below) so it neither drops nor gets dropped, which the
    #   selfcos gate reproduces exactly).
    groups = assigned.groupBy("cell", "v").agg(
        F.min("vec_id").alias("rep_id"), F.count("*").alias("cnt")
    )
    # The per-cell pair expansion is quadratic WORK over tiny INPUT
    # rows, the shape AQE mis-plans: it coalesces the cell shuffle by
    # bytes into ~1 partition and the whole Σ n_c² interpreted-cosine
    # loop serializes onto one task (observed: a 10× sweep pinned one
    # core for 40+ min).  Bucket the a-side (rep_id % B), replicate the
    # b-side ×B, and pre-shuffle BOTH sides by (cell, bucket) with an
    # EXPLICIT partition count — explicit repartition is exempt from
    # AQE coalescing and satisfies the join's clustering, so the pair
    # loop runs as K×B parallel tasks at any corpus size.  Pair set
    # (and therefore results) unchanged.
    B = 8
    n_parts = 4 * spark.sparkContext.defaultParallelism
    # per-VECTOR norms, not per-pair (see d05): the pair loop then
    # runs one interpreted array reduction per pair instead of three
    a = groups.select(
        "cell",
        F.col("rep_id").alias("id_a"),
        F.col("v").alias("va"),
        (F.col("rep_id") % B).alias("bk"),
        F.sqrt(S._norm_sq("v")).alias("na"),
    ).repartition(n_parts, "cell", "bk")
    b = (
        groups.select(
            F.col("cell").alias("cell_b"),
            F.col("rep_id").alias("id_b"),
            F.col("v").alias("vb"),
            F.sqrt(S._norm_sq("v")).alias("nb"),
        )
        .crossJoin(
            F.broadcast(
                spark.range(B).select(F.col("id").alias("bk_b"))
            )
        )
        .repartition(n_parts, "cell_b", "bk_b")
    )
    # NULL-divisor guard (see d05): a zero-norm vector's 0 denominator
    # THROWS under Spark-4 ANSI double division; DuckDB yields NULL.
    # NULL cosine fails the eps gate, so the degenerate vector neither
    # drops nor gets dropped — on both engines.  (Distinct case: a
    # NaN-COMPONENT vector yields a NaN cosine, which both engines
    # order GREATER than any number — it would PASS the gate, on both
    # identically, so parity still holds; out-of-domain here.)
    _den = F.col("na") * F.col("nb")
    cos = S._dot("va", "vb") / F.when(_den != F.lit(0.0), _den)
    rep_drops = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("bk") == F.col("bk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(F.round(cos, 6) >= SEM_EPS)
        .select("cell", F.col("id_b").alias("rep_id"))
        .distinct()
        .groupBy("cell")
        .agg(F.count("*").alias("n_rep"))
    )
    # intra-group drops: SAME float expression shape as the pair-loop
    # cosine (zip_with dot / sqrt·sqrt) so the gate is bit-identical to
    # what the uncollapsed loop would have computed for an intra pair.
    # n_vectors and n_intra come from ONE conditional aggregation over
    # `groups` (a selfcos FILTER would be pushed below the (cell,v)
    # aggregate into the scan, forking the subtree and defeating
    # exchange reuse — observed: two full corpus (cell,v) shuffles).
    _selfden = F.sqrt(S._norm_sq("v")) * F.sqrt(S._norm_sq("v"))
    selfcos = S._dot("v", "v") / F.when(_selfden != F.lit(0.0), _selfden)
    cellstats = groups.groupBy("cell").agg(
        F.sum("cnt").alias("n_vectors"),
        F.sum(
            F.when(
                F.round(selfcos, 6) >= SEM_EPS, F.col("cnt") - F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_intra"),
    )
    return (
        cellstats.join(rep_drops, "cell", "left")
        .fillna(0, subset=["n_rep"])
        .select(
            "cell",
            "n_vectors",
            (F.col("n_intra") + F.col("n_rep")).alias("n_dropped"),
            F.expr(
                "(n_vectors - (n_intra + n_rep)) * 1000000 div n_vectors"
            ).alias("kept_ppm"),
        )
        .orderBy("cell")
    )


def _n07_sql() -> str:
    from aind_smartspim_data_transformation_spark.operators.similarity import (
        KM_SCALE,
        _km_sql_assign,
        _km_sql_update,
    )

    cos = (
        "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        v -> CAST(floor(v * {KM_SCALE}) AS BIGINT)) AS x
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, x AS c FROM q WHERE vec_id BETWEEN 1 AND {SEM_K}
), a1 AS ({_km_sql_assign("q", "c0")}
), c1 AS ({_km_sql_update("a1")}
), a2 AS ({_km_sql_assign("q", "c1")}
), av AS (
  SELECT a2.vec_id, a2.cell, e.embedding::DOUBLE[] AS v
  FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id
), dropped AS (
  SELECT cell, count(*) AS n_dropped FROM (
    SELECT DISTINCT a.cell, b.vec_id
    FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE round({cos}, 6) >= {SEM_EPS}
  ) GROUP BY cell
)
SELECT s.cell, s.n_vectors, coalesce(d.n_dropped, 0) AS n_dropped,
       CAST((s.n_vectors - coalesce(d.n_dropped, 0)) * 1000000
            // s.n_vectors AS BIGINT) AS kept_ppm
FROM (SELECT cell, count(*) AS n_vectors FROM a2 GROUP BY cell) s
LEFT JOIN dropped d ON s.cell = d.cell
ORDER BY s.cell
"""


QUERIES["n07_semantic_dedup"] = n07_semantic_dedup
ORACLE["n07_semantic_dedup"] = _n07_sql()


# ---------------------------------------------------------------------------
# N8 (round 6) — per-window HLL distinct users: x04's HyperLogLog
# register pipeline GROUPED by the 1-hour tumbling window, reporting
# estimate vs exact and error ppm per window.  This is the batch twin
# of the streaming `windowed_hll_distinct` stateful operator
# (streaming/events_stream.py): the stream maintains the registers
# incrementally per open window and emits ONCE when the watermark
# closes it — tests/test_streaming.py asserts stream estimates equal
# these, window for window, because both sides share the md5-lane
# hash/bucket/rho formulas (integer-exact in Spark, DuckDB, AND
# hashlib).
#
# Plan: one (window, bucket) aggregation with map-side combine —
# ≤ windows × 256 rows through the exchange regardless of event
# count — plus the exact countDistinct for QA (drop it at 100 TB:
# the estimate IS the product; the exact column exists so the oracle
# can price the sketch's error).
# ---------------------------------------------------------------------------
def n08_windowed_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.sketch import (
        HLL_ALPHA_MILLI,
        HLL_M,
        _H32,
    )
    from aind_smartspim_data_transformation_spark.tables import load_events

    ev = load_events(spark, sf_dir).select(
        F.date_trunc("hour", "ts").alias("w_start"),
        F.col("user_id").cast("string").alias("token"),
    )
    h = F.expr(_H32)
    regs = (
        ev.select(
            "w_start",
            (h % HLL_M).alias("bucket"),
            F.expr(f"{_H32} div {HLL_M}").alias("v"),
        )
        .withColumn(
            "rho",
            F.when(F.col("v") == 0, F.lit(25)).otherwise(
                F.lit(25) - F.length(F.bin("v"))
            ),
        )
        .groupBy("w_start", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    num = HLL_ALPHA_MILLI * HLL_M * HLL_M * (1 << 32)
    sums = regs.groupBy("w_start").agg(
        (
            F.expr("sum(shiftleft(CAST(1 AS BIGINT), 32 - r))")
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1 << 32)
        ).alias("s"),
        F.count("*").alias("n_regs"),
    )
    exact = ev.groupBy("w_start").agg(
        F.countDistinct("token").alias("n_exact")
    )
    return (
        sums.join(exact, "w_start")
        .select(
            "w_start",
            "n_regs",
            "n_exact",
            F.expr(f"{num} div (1000 * s)").alias("est"),
            F.expr(
                f"abs({num} div (1000 * s) - n_exact) * 1000000"
                " div greatest(n_exact, 1)"
            ).alias("err_ppm"),
        )
        .orderBy("w_start")
    )


def _n08_sql() -> str:
    from aind_smartspim_data_transformation_spark.operators.sketch import (
        HLL_ALPHA_MILLI,
        HLL_M,
    )

    h = "('0x' || substring(md5(user_id::VARCHAR), 1, 8))::BIGINT"
    num = HLL_ALPHA_MILLI * HLL_M * HLL_M * (1 << 32)
    return f"""
WITH ev AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
         {h} % {HLL_M} AS bucket, {h} // {HLL_M} AS v, user_id
  FROM events
), regs AS (
  SELECT w_start, bucket,
         max(CASE WHEN v = 0 THEN 25 ELSE 25 - length(bin(v)) END) AS r
  FROM ev GROUP BY w_start, bucket
), sums AS (
  SELECT w_start,
         sum((1::BIGINT << (32 - r)))::BIGINT
           + ({HLL_M} - count(*)) * (1::BIGINT << 32) AS s,
         count(*) AS n_regs
  FROM regs GROUP BY w_start
), exact AS (
  SELECT w_start, count(DISTINCT user_id) AS n_exact FROM ev GROUP BY w_start
)
SELECT s.w_start, s.n_regs, e.n_exact,
       {num} // (1000 * s.s) AS est,
       abs({num} // (1000 * s.s) - e.n_exact) * 1000000
         // greatest(e.n_exact, 1) AS err_ppm
FROM sums s JOIN exact e USING (w_start)
ORDER BY s.w_start
"""


QUERIES["n08_windowed_hll_users"] = n08_windowed_hll_users
ORACLE["n08_windowed_hll_users"] = _n08_sql()


# ---------------------------------------------------------------------------
# N9 (round 6) — cross-source contamination matrix: for every source
# pair, how many DISTINCT 8-token shingles they share, normalized by
# the smaller source's shingle vocabulary (integer ppm).  c08 audits
# train-vs-eval contamination against a tiny broadcast panel; this is
# the source×source generalization that tells a corpus curator which
# ingest feeds are copies of each other BEFORE mixing weights are
# chosen (the d10/d03 fingerprint machinery, aimed at provenance).
#
# Scale shape: the explode collapses to DISTINCT (source, h) before
# any join, so each shingle contributes at most |sources| rows; the
# boilerplate filter (shingles present in > N9_MAX_SRCS sources are
# ubiquitous header/footer text, not contamination signal) bounds the
# self-join fan-out at C(N9_MAX_SRCS, 2) pairs per shingle — the
# quadratic term is capped by a constant, not by the corpus.  Both
# aggregations are map-side-combining groupBys; the pair matrix is
# |sources|²-bounded, tiny at any SF.
# ---------------------------------------------------------------------------
N9_WINDOW = 8
N9_MAX_SRCS = 16


def n09_cross_source_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # r15 (guide §2.5): spread the unsplittable scan under the window
    # explode+md5 (same class as c08/d10; measured 3/3 interleaved
    # pairs, 2.14 → 1.88 s min — the h-shuffle above dominates more
    # here, so the win is smaller).  The round-robin exchange sits
    # BELOW the distinct exchange, so the ReusedExchange sharing the
    # shingle subtree across the three consumers (plan-pinned) is
    # unchanged.
    docs = spread_unsplittable_scan(load_table(spark, sf_dir, "documents"))
    w = N9_WINDOW
    shingles = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= w)
        .select(
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {w}), "
                    f"i -> md5(concat_ws(' ', slice(toks, i + 1, {w}))))"
                )
            ).alias("h"),
        )
        .distinct()
    )
    # Boilerplate filter as a WINDOW count over h, not groupBy + semi
    # join: one h-shuffle feeds the filter AND h-partitions the output,
    # so the pair self-join below needs no further exchange and the
    # explode-heavy shingle subtree is computed once (ReusedExchange,
    # asserted in tests/test_plan_fingerprints.py) instead of per
    # consumer.
    from pyspark.sql.window import Window as W

    sh = (
        shingles.withColumn("n_src", F.count("*").over(W.partitionBy("h")))
        .filter(F.col("n_src") <= N9_MAX_SRCS)
        .select("source", "h")
    )
    per_src = sh.groupBy("source").agg(F.count("*").alias("n"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        pairs.join(
            per_src.select(
                F.col("source").alias("source_a"), F.col("n").alias("n_a")
            ),
            "source_a",
        )
        .join(
            per_src.select(
                F.col("source").alias("source_b"), F.col("n").alias("n_b")
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("n_shared * 1000000 div least(n_a, n_b)").alias(
                "overlap_ppm"
            ),
        )
        .orderBy(F.desc("overlap_ppm"), "source_a", "source_b")
    )


N09_SQL = f"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS toks,
         unnest(generate_series(1, len(string_split(text, ' ')) - {N9_WINDOW} + 1)) AS i
  FROM documents
  WHERE len(string_split(text, ' ')) >= {N9_WINDOW}
), sh0 AS (
  SELECT DISTINCT source,
         md5(array_to_string(toks[i:i + {N9_WINDOW} - 1], ' ')) AS h
  FROM toks
), kept AS (
  SELECT h FROM sh0 GROUP BY h HAVING count(*) <= {N9_MAX_SRCS}
), sh AS (
  SELECT sh0.source, sh0.h FROM sh0 JOIN kept USING (h)
), per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM sh a JOIN sh b USING (h)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.n_shared, pa.n AS n_a, pb.n AS n_b,
       p.n_shared * 1000000 // least(pa.n, pb.n) AS overlap_ppm
FROM pairs p
JOIN per_src pa ON pa.source = p.source_a
JOIN per_src pb ON pb.source = p.source_b
ORDER BY overlap_ppm DESC, p.source_a, p.source_b
"""


QUERIES["n09_cross_source_contamination"] = n09_cross_source_contamination
ORACLE["n09_cross_source_contamination"] = N09_SQL


# ---------------------------------------------------------------------------
# N10 (round 6) — per-label embedding dispersion: trace of the
# population covariance and squared centroid norm per label, in
# (milli-unit)² integers.  The embedding-space health audit behind
# n07/s09's cluster choices: a label whose dispersion collapses is
# mode-collapsed (embedder bug / duplicate flood); a centroid drifting
# from the origin flags normalization skew.  Components are quantized
# to integer milli-units FIRST (floor(v·1000 + 0.5), the s06/s09
# half-up idiom — identical IEEE double ops in both engines), so every
# cross-row sum is an order-independent int64 sum and the oracle is
# exact: n·Σq² − (Σq)² = n²·σ², summed over dims, all integers.
#
# Scale shape: posexplode → ONE (label, dim) groupBy with map-side
# combine (dims × labels rows through the exchange), then a
# labels-sized reduction.  No joins, no second pass over the vectors.
# Assumes fixed-length embeddings (the table's contract): with ragged
# arrays the max(n)² denominator would mix per-dim counts — validate
# len(embedding) upstream if ingesting heterogeneous vectors.
# int64 envelope: |q| ≤ ~10⁴ ⇒ (Σq)² overflows at n ≳ 10⁹ rows per
# (label, dim); at that scale shard the moments by a hash lane and
# combine, or move the final squares to DECIMAL (documented, as n04).
# ---------------------------------------------------------------------------
def n10_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, v -> "
                "CAST(floor(CAST(v AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))"
            )
        ).alias("dim", "q"),
    )
    per_dim = comp.groupBy("label", "dim").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.expr("q * q")).alias("s2"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.sum(F.expr("n * s2 - s * s")).alias("disp_num"),
            F.sum(F.expr("s * s")).alias("cent_num"),
        )
        .select(
            "label",
            "n_vecs",
            F.expr("disp_num div (n_vecs * n_vecs)").alias("disp_milli2"),
            F.expr("cent_num div (n_vecs * n_vecs)").alias(
                "centroid_norm2_milli2"
            ),
        )
        .orderBy("label")
    )


N10_SQL = """
WITH base AS (
  SELECT label, embedding::DOUBLE[] AS e,
         unnest(generate_series(1, len(embedding))) AS dim
  FROM embeddings
), comp AS (
  SELECT label, dim,
         CAST(floor(e[dim] * 1000.0 + 0.5) AS BIGINT) AS q
  FROM base
), per_dim AS (
  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(q * q) AS BIGINT) AS s2
  FROM comp GROUP BY label, dim
)
SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
       CAST(sum(n * s2 - s * s) AS BIGINT)
         // (CAST(max(n) AS BIGINT) * CAST(max(n) AS BIGINT)) AS disp_milli2,
       CAST(sum(s * s) AS BIGINT)
         // (CAST(max(n) AS BIGINT) * CAST(max(n) AS BIGINT))
         AS centroid_norm2_milli2
FROM per_dim GROUP BY label ORDER BY label
"""


QUERIES["n10_embedding_dispersion"] = n10_embedding_dispersion
ORACLE["n10_embedding_dispersion"] = N10_SQL


# ---------------------------------------------------------------------------
# N11 (round 6) — split-balance audit: does c01's content-stable hash
# split actually stratify?  For every (lang, split) cell, the lang's
# observed split share vs the GLOBAL split share, in integer ppm, and
# the absolute deviation.  A hash split is unbiased in expectation but
# a finite corpus can draw a skewed cell (or a doc_id scheme can
# correlate with language) — this is the audit that catches it before
# a val set silently under-represents a language.  Shares are computed
# in ppm FIRST (obs·10⁶ div n_lang), so no n_lang×n_split product ever
# forms — int64-safe at any corpus size.
#
# Plan: one (lang, split) groupBy over a narrow projection; lang
# totals, split totals, and the grand total derive from those ≤
# |langs|×3 rows — broadcast-joined, nothing fact-sized moves twice.
# ---------------------------------------------------------------------------
def n11_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(h < "c", "train").when(h < "e", "val").otherwise("test")
    cells = (
        docs.select(split.alias("split"), "lang")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )
    lang_tot = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    split_tot = cells.groupBy("split").agg(F.sum("n_docs").alias("n_split"))
    grand = cells.agg(F.sum("n_docs").alias("n_total"))
    return (
        cells.join(F.broadcast(lang_tot), "lang")
        .join(F.broadcast(split_tot), "split")
        .crossJoin(F.broadcast(grand))
        .select(
            "lang",
            "split",
            "n_docs",
            F.expr("n_docs * 1000000 div n_lang").alias("obs_share_ppm"),
            F.expr("n_split * 1000000 div n_total").alias("exp_share_ppm"),
            F.expr(
                "abs(n_docs * 1000000 div n_lang "
                "- n_split * 1000000 div n_total)"
            ).alias("abs_dev_ppm"),
        )
        .orderBy("lang", "split")
    )


N11_SQL = """
WITH cells AS (
  SELECT lang,
         CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1) < 'c' THEN 'train'
              WHEN substring(md5(doc_id::VARCHAR), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
), lt AS (
  SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_lang FROM cells GROUP BY lang
), st AS (
  SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_split FROM cells GROUP BY split
), g AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM cells
)
SELECT c.lang, c.split, c.n_docs,
       c.n_docs * 1000000 // lt.n_lang AS obs_share_ppm,
       st.n_split * 1000000 // g.n_total AS exp_share_ppm,
       abs(c.n_docs * 1000000 // lt.n_lang
           - st.n_split * 1000000 // g.n_total) AS abs_dev_ppm
FROM cells c JOIN lt USING (lang) JOIN st USING (split) CROSS JOIN g
ORDER BY c.lang, c.split
"""


QUERIES["n11_split_balance"] = n11_split_balance
ORACLE["n11_split_balance"] = N11_SQL


# ---------------------------------------------------------------------------
# N12 (round 6) — intra- vs cross-source duplicate classification: for
# each source, how many of its docs sit in an exact-duplicate text
# group confined to that source (intra) vs one spanning sources
# (cross), integer ppm of the source's docs.  The operational question
# behind dedup ORDERING: a corpus whose duplication is mostly intra
# can dedup per-source shards independently (cheap, embarrassingly
# parallel); heavy cross-source duplication forces the global pass
# (d01/d06) before mixing.  Complements n09 (near-dup shingle overlap)
# with the exact-dup slice.
#
# Plan: the corpus is scanned and hashed ONCE — the (source, h)
# groupBy sizes each source's stake, and the group classifier derives
# FROM that aggregate (g_docs = Σ s_docs, g_srcs = row count per h —
# stakes is already distinct on (source, h)), so both sides of the
# h-keyed join are ≤ |groups| rows and the full text never shuffles,
# only its 32-char digest.
# ---------------------------------------------------------------------------
def n12_source_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("h")
    )
    stakes = docs.groupBy("source", "h").agg(F.count("*").alias("s_docs"))
    groups = stakes.groupBy("h").agg(
        F.sum("s_docs").alias("g_docs"),
        F.count("*").alias("g_srcs"),
    )
    cls = stakes.join(groups, "h").select(
        "source",
        "s_docs",
        F.when(F.col("g_docs") <= 1, F.lit("unique"))
        .when(F.col("g_srcs") > 1, F.lit("cross"))
        .otherwise(F.lit("intra"))
        .alias("kind"),
    )
    return (
        cls.groupBy("source")
        .agg(
            F.sum("s_docs").alias("n_docs"),
            F.sum(F.when(F.col("kind") == "intra", F.col("s_docs")).otherwise(0)).alias(
                "intra_dup_docs"
            ),
            F.sum(F.when(F.col("kind") == "cross", F.col("s_docs")).otherwise(0)).alias(
                "cross_dup_docs"
            ),
        )
        .select(
            "source",
            "n_docs",
            "intra_dup_docs",
            "cross_dup_docs",
            F.expr("intra_dup_docs * 1000000 div n_docs").alias("intra_ppm"),
            F.expr("cross_dup_docs * 1000000 div n_docs").alias("cross_ppm"),
        )
        .orderBy("source")
    )


N12_SQL = """
WITH d AS (
  SELECT source, md5(text) AS h FROM documents
), groups AS (
  SELECT h, CAST(count(*) AS BIGINT) AS g_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS g_srcs
  FROM d GROUP BY h
), stakes AS (
  SELECT source, h, CAST(count(*) AS BIGINT) AS s_docs
  FROM d GROUP BY source, h
), cls AS (
  SELECT s.source, s.s_docs,
         CASE WHEN g.g_docs <= 1 THEN 'unique'
              WHEN g.g_srcs > 1 THEN 'cross'
              ELSE 'intra' END AS kind
  FROM stakes s JOIN groups g USING (h)
)
SELECT source,
       CAST(sum(s_docs) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN kind = 'intra' THEN s_docs ELSE 0 END) AS BIGINT)
         AS intra_dup_docs,
       CAST(sum(CASE WHEN kind = 'cross' THEN s_docs ELSE 0 END) AS BIGINT)
         AS cross_dup_docs,
       CAST(sum(CASE WHEN kind = 'intra' THEN s_docs ELSE 0 END) AS BIGINT)
         * 1000000 // CAST(sum(s_docs) AS BIGINT) AS intra_ppm,
       CAST(sum(CASE WHEN kind = 'cross' THEN s_docs ELSE 0 END) AS BIGINT)
         * 1000000 // CAST(sum(s_docs) AS BIGINT) AS cross_ppm
FROM cls GROUP BY source ORDER BY source
"""


QUERIES["n12_source_dup_profile"] = n12_source_dup_profile
ORACLE["n12_source_dup_profile"] = N12_SQL


# ---------------------------------------------------------------------------
# N13 (round 6) — cluster chain-merge QA: transitive closure (d09) can
# merge docs with NO direct similarity evidence (A~B, B~C ⇒ {A,B,C}
# even if A and C share nothing — the classic over-merge failure of
# connected-components dedup).  Per cluster: member count, how many of
# the C(n,2) member pairs have DIRECT verified evidence (coverage
# ppm), and the min/mean verified Jaccard (basis points) of the
# evidence that exists.  Low coverage + low min = a chained cluster a
# keep-one-per-cluster policy (d06/d13) would over-delete from.
#
# Plan: d03's verified pairs (computed once) feed BOTH the star
# clustering and the evidence join; per-cluster aggregates are
# |clusters|-sized.  Jaccard enters integer space as
# floor(j·10⁴ + 0.5) basis points — both engines start from the same
# round(·, 4) double, so the integer is engine-stable.
# ---------------------------------------------------------------------------
def n13_cluster_merge_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        connected_components_star,
        d03_dedup_minhash_lsh,
    )

    # r15 (guide §2.4): persist — consumed twice (components input +
    # the evid pair join); without it each reference re-executes d03's
    # verify pipeline.  Released by the harness's clearCache().
    pairs = d03_dedup_minhash_lsh(spark, sf_dir).select(
        "doc1",
        "doc2",
        F.expr("CAST(floor(jaccard * 10000 + 0.5) AS BIGINT)").alias("bps"),
    ).persist()
    comp = connected_components_star(pairs.select("doc1", "doc2"))
    sizes = comp.groupBy(F.col("label").alias("component")).agg(
        F.count("*").alias("n_members")
    )
    evid = (
        pairs.join(
            comp.select(
                F.col("node").alias("doc1"), F.col("label").alias("component")
            ),
            "doc1",
        )
        .groupBy("component")
        .agg(
            F.count("*").alias("n_direct_pairs"),
            F.min("bps").alias("min_jaccard_bps"),
            F.sum("bps").alias("_s"),
        )
    )
    return (
        sizes.join(evid, "component")
        .select(
            "component",
            "n_members",
            "n_direct_pairs",
            F.expr(
                "n_direct_pairs * 1000000 div "
                "(n_members * (n_members - 1) div 2)"
            ).alias("coverage_ppm"),
            "min_jaccard_bps",
            F.expr("_s div n_direct_pairs").alias("mean_jaccard_bps"),
        )
        .orderBy("component")
    )


def _n13_sql() -> str:
    from aind_smartspim_data_transformation_spark.operators.dedup import (
        D03_SQL,
    )

    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc1, doc2,
         CAST(floor(jaccard * 10000 + 0.5) AS BIGINT) AS bps
  FROM ({D03_SQL}) _d03
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
), sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_members
  FROM comp GROUP BY component
), evid AS (
  SELECT c.component, CAST(count(*) AS BIGINT) AS n_direct_pairs,
         min(p.bps) AS min_jaccard_bps,
         CAST(sum(p.bps) AS BIGINT) AS s
  FROM pairs p JOIN comp c ON c.node = p.doc1
  GROUP BY c.component
)
SELECT s.component, s.n_members, e.n_direct_pairs,
       e.n_direct_pairs * 1000000
         // (s.n_members * (s.n_members - 1) // 2) AS coverage_ppm,
       e.min_jaccard_bps,
       e.s // e.n_direct_pairs AS mean_jaccard_bps
FROM sizes s JOIN evid e USING (component)
ORDER BY s.component
"""


QUERIES["n13_cluster_merge_qa"] = n13_cluster_merge_qa
ORACLE["n13_cluster_merge_qa"] = _n13_sql()


# ===========================================================================
# Round 7 — curriculum/coverage/retention audits, riding the round's
# distributed window replacements (scale_utils.distributed_ntile /
# distributed_cumsum with desc+ties) so the new machinery carries
# oracle-backed correctness rows of its own.  All integer-exact.
# ===========================================================================


# ---------------------------------------------------------------------------
# N14 — token-volume deciles: tier the corpus by document LENGTH
# (whitespace tokens — a heavy-tie key, unlike n06's ttr_milli) and
# price each tier's share of the total token budget, ppm.  The
# schedule question behind sequence packing: are long documents a
# negligible tail or half the corpus volume?
#
# Plan: one narrow projection → distributed_ntile (EXACT, no
# partition-less window; ties on tok are broken by doc_id in both
# engines) → per-tier aggregate; the grand total attaches as a
# broadcast 1-row aggregate (BNLJ-allowed scalar pattern, n11's
# idiom).  share_ppm is integer division AFTER the multiply.
# ---------------------------------------------------------------------------
def n14_token_volume_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_ntile,
    )

    scored = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("tok"),
    ).persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    tiered = distributed_ntile(
        scored, "tok", 10, tie_cols=("doc_id",), out_col="tier"
    )
    per_tier = tiered.groupBy("tier").agg(
        F.count("*").alias("n_docs"),
        F.min("tok").alias("tok_lo"),
        F.max("tok").alias("tok_hi"),
        F.sum("tok").alias("tier_tokens"),
    )
    total = scored.agg(F.sum("tok").alias("total_tokens"))
    out = (
        per_tier.crossJoin(F.broadcast(total))
        .select(
            "tier",
            "n_docs",
            "tok_lo",
            "tok_hi",
            "tier_tokens",
            F.expr("tier_tokens * 1000000 div total_tokens").alias(
                "share_ppm"
            ),
        )
        .orderBy("tier")
    )
    # Cache lifetime: kept persisted so the returned plan retains its
    # InMemoryRelation (see n05); harness-level clearCache() handles
    # sweep hygiene.
    return out


N14_SQL = """
WITH scored AS (
  SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents
), tiered AS (
  SELECT tok, ntile(10) OVER (ORDER BY tok, doc_id) AS tier FROM scored
), per_tier AS (
  SELECT tier, count(*) AS n_docs,
         CAST(min(tok) AS BIGINT) AS tok_lo,
         CAST(max(tok) AS BIGINT) AS tok_hi,
         CAST(sum(tok) AS BIGINT) AS tier_tokens
  FROM tiered GROUP BY tier
)
SELECT tier, n_docs, tok_lo, tok_hi, tier_tokens,
       CAST(tier_tokens * 1000000
            // (SELECT sum(tok) FROM scored) AS BIGINT) AS share_ppm
FROM per_tier ORDER BY tier
"""

QUERIES["n14_token_volume_deciles"] = n14_token_volume_deciles
ORACLE["n14_token_volume_deciles"] = N14_SQL


# ---------------------------------------------------------------------------
# N15 — per-language vocabulary coverage curve: how many of the most
# frequent tokens cover 50% / 90% / 99% of a language's token stream?
# The tokenizer-budget audit (vocab size per language before a BPE
# spend) — k50/k90/k99 = the minimal head size reaching each share.
#
# Plan: one (lang, tok) count aggregate (map-side combined; the only
# pass over text), then the running coverage rides
# distributed_cumsum(partition_cols=("lang",), ascending=False,
# tie_cols=("tok",)) — counts cumulate from the most frequent token
# down with NO per-language single-task window and NO driver collect;
# k_p is then a pure count of rows with cum < threshold (no rank
# needed: min rank with cum ≥ T == 1 + #rows with cum < T, exact
# integer comparisons 2·cum vs total etc.).  The final per-lang
# aggregate is |vocab|-row input, |lang|-row output.
# ---------------------------------------------------------------------------
def n15_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_cumsum,
    )

    vocab = (
        load_table(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("cnt"))
        .persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    )
    cum = distributed_cumsum(
        vocab, "cnt", "cnt", out_col="cum",
        partition_cols=("lang",), ascending=False, tie_cols=("tok",),
    )
    totals = vocab.groupBy("lang").agg(
        F.count("*").alias("vocab_n"), F.sum("cnt").alias("total_tok")
    )
    out = (
        cum.join(F.broadcast(totals), "lang")
        .groupBy("lang")
        .agg(
            F.first("vocab_n").alias("vocab_n"),
            F.first("total_tok").alias("total_tok"),
            (1 + F.sum((F.col("cum") * 2 < F.col("total_tok")).cast("long")))
            .alias("k50"),
            (1 + F.sum((F.col("cum") * 10 < F.col("total_tok") * 9).cast("long")))
            .alias("k90"),
            (1 + F.sum((F.col("cum") * 100 < F.col("total_tok") * 99).cast("long")))
            .alias("k99"),
        )
        .orderBy("lang")
    )
    # Cache lifetime: kept persisted so the returned plan retains its
    # InMemoryRelation (see n05); harness-level clearCache() handles
    # sweep hygiene.
    return out


N15_SQL = """
WITH vocab AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
), counts AS (
  SELECT lang, tok, count(*) AS cnt FROM vocab GROUP BY lang, tok
), cum AS (
  SELECT lang, cnt,
         sum(cnt) OVER (PARTITION BY lang ORDER BY cnt DESC, tok
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS total_tok,
         count(*) OVER (PARTITION BY lang) AS vocab_n
  FROM counts
)
SELECT lang,
       CAST(any_value(vocab_n) AS BIGINT) AS vocab_n,
       CAST(any_value(total_tok) AS BIGINT) AS total_tok,
       CAST(1 + sum(CASE WHEN cum * 2 < total_tok THEN 1 ELSE 0 END)
            AS BIGINT) AS k50,
       CAST(1 + sum(CASE WHEN cum * 10 < total_tok * 9 THEN 1 ELSE 0 END)
            AS BIGINT) AS k90,
       CAST(1 + sum(CASE WHEN cum * 100 < total_tok * 99 THEN 1 ELSE 0 END)
            AS BIGINT) AS k99
FROM cum GROUP BY lang ORDER BY lang
"""

QUERIES["n15_vocab_coverage"] = n15_vocab_coverage
ORACLE["n15_vocab_coverage"] = N15_SQL


# ---------------------------------------------------------------------------
# N16 — weekly retention cohorts: users grouped by first-activity week
# (integer week index from the corpus epoch — identical arithmetic in
# both engines, no date_trunc semantics to align); for each (cohort,
# week offset ≥ 1) the fraction of the cohort still active, ppm.  The
# engagement decay matrix behind any usage-weighted sampling decision.
#
# Plan: distinct (user, week) activity aggregate; per-user min = the
# cohort (map-side combined agg, no window); one user_id-keyed join
# back; (cohort, offset) aggregate + broadcast cohort sizes.  Every
# shuffle is keyed; nothing global.
# ---------------------------------------------------------------------------
def n16_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    weeks = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            # TRUNCATING division, deliberately: DuckDB's integer //
            # truncates toward zero (-3 // 7 = 0, verified in
            # tests/test_extras.py::test_n16_week_index_parity_pre_epoch),
            # and cast("long") on the float quotient truncates the same
            # way — so pre-epoch days agree in both engines.  floor()
            # here would DIVERGE (-3 days: floor → week -1, // → 0).
            (F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long") / 7)
            .cast("long")
            .alias("week"),
        )
        .distinct()
    ).persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    sizes = cohorts.groupBy("cohort").agg(F.count("*").alias("cohort_n"))
    active = (
        weeks.join(cohorts, "user_id")
        .filter(F.col("week") > F.col("cohort"))
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("week_offset"))
        .agg(F.count("*").alias("active_n"))
    )
    out = (
        active.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            "active_n",
            "cohort_n",
            F.expr("active_n * 1000000 div cohort_n").alias("retained_ppm"),
        )
        .orderBy("cohort", "week_offset")
    )
    # Cache lifetime: `weeks` feeds three consumers; it stays persisted
    # so the returned plan keeps the shared InMemoryRelation.  Sweep
    # harnesses release caches between queries via clearCache().
    return out


N16_SQL = """
WITH weeks AS (
  SELECT DISTINCT user_id,
         (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS week
  FROM events
), cohorts AS (
  SELECT user_id, min(week) AS cohort FROM weeks GROUP BY user_id
), sizes AS (
  SELECT cohort, count(*) AS cohort_n FROM cohorts GROUP BY cohort
), active AS (
  SELECT c.cohort, w.week - c.cohort AS week_offset, count(*) AS active_n
  FROM weeks w JOIN cohorts c USING (user_id)
  WHERE w.week > c.cohort
  GROUP BY c.cohort, w.week - c.cohort
)
SELECT cohort, week_offset, active_n, cohort_n,
       CAST(active_n * 1000000 // cohort_n AS BIGINT) AS retained_ppm
FROM active JOIN sizes USING (cohort)
ORDER BY cohort, week_offset
"""

QUERIES["n16_retention_cohorts"] = n16_retention_cohorts
ORACLE["n16_retention_cohorts"] = N16_SQL


# ---------------------------------------------------------------------------
# N17 — per-type heavy hitters: the top-3 users by event count within
# each event type (count DESC, user_id ASC — deterministic), with each
# hitter's share of the type's events, ppm.  The skew audit run before
# any per-user salting/capping decision.
#
# Plan: (type, user) count aggregate, rank via a window PARTITIONED by
# type (Catalyst plans the rank≤k filter as WindowGroupLimit: each
# partition retains only its top rows before the full sort), broadcast
# per-type totals.  No global window, no unbounded state.
# ---------------------------------------------------------------------------
def n17_event_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("user_id").asc()
    )
    top = per_user.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 3
    )
    totals = per_user.groupBy("event_type").agg(
        F.sum("n").alias("type_total")
    )
    return (
        top.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "rnk",
            "user_id",
            "n",
            F.expr("n * 1000000 div type_total").alias("share_ppm"),
        )
        .orderBy("event_type", "rnk")
    )


N17_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, user_id, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id ASC) AS rnk
  FROM per_user
), totals AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS type_total
  FROM per_user GROUP BY event_type
)
SELECT event_type, rnk, user_id, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // type_total AS BIGINT) AS share_ppm
FROM ranked JOIN totals USING (event_type)
WHERE rnk <= 3
ORDER BY event_type, rnk
"""

QUERIES["n17_event_heavy_hitters"] = n17_event_heavy_hitters
ORACLE["n17_event_heavy_hitters"] = N17_SQL


# ---------------------------------------------------------------------------
# N18 — length↔quality rank correlation (Spearman with deterministic
# row_number ranks): does the TTR quality proxy just re-measure
# document length?  If |rho| is high, a curriculum built on ttr tiers
# is secretly a length curriculum and the mixing decision changes.
#
# rho_ppm = 1e6 − 6e6·Σd² div (n(n²−1)), d = rank_len − rank_ttr, with
# BOTH ranks as deterministic row_numbers (doc_id tie-break) — the
# standard tie-averaged Spearman needs fractional ranks; the
# row_number variant is exact, engine-stable, and monotone-equivalent
# for audit thresholds.  Both rank passes ride
# distributed_order_stats (no partition-less window); the final 1-row
# aggregate is a bounded scalar.  Integer div truncates identically in
# both engines (Spark `div`, DuckDB `//` — see
# test_n16_week_index_parity_pre_epoch; all operands non-negative here
# so the direction is moot anyway).
#
# Overflow envelope (the r7 weak item, fixed r8): 6e6·Σd² blows past
# int64 at n ≈ 16.5k docs, so every Σd² term is computed in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and only the FINAL bounded
# columns are cast back to BIGINT (|rho_ppm| ≤ 2e6 always; n_docs is a
# count).  Σd² ≤ n(n²−1)/3, so 6e6·Σd² < 10³⁸ holds to n ≈ 3.7×10¹⁰
# documents — comfortably past a 100 TB corpus.  sum_d2 itself is NOT
# emitted: as an output column it would re-impose an int64 ceiling at
# ~3×10⁶ docs for a number the audit decision never reads.
# tests/test_scale_utils.py::test_n18_spearman_50k_probe pins the 50k
# envelope in both engines (anti-correlated worst case included).
# ---------------------------------------------------------------------------
def n18_length_quality_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_order_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("tok"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000"
            " div size(split(text, ' '))"
        ).alias("ttr_milli"),
    ).persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    r1, totals = distributed_order_stats(
        scored, "tok", tie_cols=("doc_id",), rank_col="rank_len"
    )
    # r15: persist the FIRST rank pass — the second
    # distributed_order_stats call scans its input three times
    # (quantile bounds + offset partials + final), and without this
    # each scan re-runs r1's whole bucket-join-window pipeline.
    # Released by the harness's clearCache() — SCALE.md §6q.
    r1 = r1.persist()
    r2, _ = distributed_order_stats(
        r1, "ttr_milli", tie_cols=("doc_id",), rank_col="rank_ttr"
    )
    # n(n²−1) = 0 for a 0/1-doc corpus — rho is undefined there; clamp
    # the denominator so the degenerate case yields 1e6 (Σd² = 0)
    # instead of a division error, identically in both engines.  n is a
    # Python int (arbitrary precision), so the denominator literal is
    # exact at any corpus size; it enters the plan as DECIMAL(38,0).
    n = int(totals["count"])
    denom = max(n * (n * n - 1), 1)
    out = r2.select(
        (F.col("rank_len") - F.col("rank_ttr")).alias("d")
    ).agg(
        F.lit(n).cast("long").alias("n_docs"),
        F.expr(
            "1000000 - (CAST(6000000 AS DECIMAL(38,0))"
            " * sum(CAST(d AS DECIMAL(20,0)) * d))"
            f" div CAST('{denom}' AS DECIMAL(38,0))"
        ).alias("rho_ppm"),
    )
    return out


N18_SQL = """
WITH scored AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS tok,
         len(list_distinct(string_split(text, ' '))) * 1000
           // len(string_split(text, ' ')) AS ttr_milli
  FROM documents
), r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY tok, doc_id) AS rank_len,
         row_number() OVER (ORDER BY ttr_milli, doc_id) AS rank_ttr
  FROM scored
), agg AS (
  SELECT count(*) AS n_docs,
         sum(CAST(rank_len - rank_ttr AS HUGEINT)
             * (rank_len - rank_ttr)) AS sum_d2
  FROM r
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(1000000 - (CAST(6000000 AS HUGEINT) * sum_d2)
            // greatest(CAST(n_docs AS HUGEINT) * n_docs * n_docs
                        - n_docs, 1)
            AS BIGINT) AS rho_ppm
FROM agg
"""

QUERIES["n18_length_quality_spearman"] = n18_length_quality_spearman
ORACLE["n18_length_quality_spearman"] = N18_SQL


# ---------------------------------------------------------------------------
# N19 — curriculum tier × source mix: within each n06-style quality
# tier, each source's token share (ppm of the tier).  The schedule
# audit behind tiered training: if tier 10 is 90% one source, a
# "quality-ascending" curriculum is secretly a source curriculum.
#
# Plan: the n06 distributed_ntile tiering feeds ONE (tier, source)
# aggregate; tier totals attach via a window PARTITIONED by tier over
# the ≤ tiers×sources aggregate.  No partition-less window anywhere.
# ---------------------------------------------------------------------------
def n19_tier_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aind_smartspim_data_transformation_spark.operators.scale_utils import (
        distributed_ntile,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("tok"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000"
            " div size(split(text, ' '))"
        ).alias("ttr_milli"),
    ).persist()  # query-path cache: harness clearCache() releases — SCALE.md §6q
    tiered = distributed_ntile(
        scored, "ttr_milli", 10, tie_cols=("doc_id",), out_col="tier"
    )
    cells = tiered.groupBy("tier", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("cell_tokens"),
    )
    out = (
        cells.select(
            "tier",
            "source",
            "n_docs",
            "cell_tokens",
            F.expr(
                "cell_tokens * 1000000 div "
                "(sum(cell_tokens) OVER (PARTITION BY tier))"
            ).alias("share_ppm"),
        )
        .orderBy("tier", "source")
    )
    # Cache lifetime: kept persisted so the returned plan retains its
    # InMemoryRelation (see n05); harness-level clearCache() handles
    # sweep hygiene.
    return out


N19_SQL = """
WITH scored AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS tok,
         len(list_distinct(string_split(text, ' '))) * 1000
           // len(string_split(text, ' ')) AS ttr_milli
  FROM documents
), tiered AS (
  SELECT source, tok,
         ntile(10) OVER (ORDER BY ttr_milli, doc_id) AS tier
  FROM scored
), cells AS (
  SELECT tier, source, count(*) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS cell_tokens
  FROM tiered GROUP BY tier, source
)
SELECT tier, source, n_docs, cell_tokens,
       CAST(cell_tokens * 1000000
            // sum(cell_tokens) OVER (PARTITION BY tier) AS BIGINT)
         AS share_ppm
FROM cells ORDER BY tier, source
"""

QUERIES["n19_tier_source_mix"] = n19_tier_source_mix
ORACLE["n19_tier_source_mix"] = N19_SQL
