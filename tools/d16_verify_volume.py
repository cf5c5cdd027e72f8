#!/usr/bin/env python
"""Measure d16's verify-phase volume cut from the digest collapse.

VERDICT r12 ask #1 "done" criterion: a measured verify-volume cut on
the 100x corpus.  This builds the same replicated corpus as
tools/overflow_sweep.py (optionally zipf-skewed), re-derives d16's
EXACT candidate stream via the shared `_d16_candidates` helper, and
counts — deterministically, no wall-clock involved — what each verify
formulation pushes through the shingle join:

- pre-collapse (shared `_verify_jaccard_pairs`): every eligible
  candidate DOC is re-shingled and its set replicated into every PAIR
  it appears in → shingle rows = sum(ntoks-2) over candidate docs;
  set-join rows = 2 x candidate pairs;
- digest-collapsed: only one REP doc per distinct eligible digest is
  shingled, same-digest pairs never reach the join, and cross-digest
  pairs join once per distinct (dg1, dg2) → shingle rows =
  sum(ntoks-2) over reps; set-join rows = 2 x distinct digest pairs.

Also times the full d16 end-to-end (color only — counts are the
adjudicable metric; walls on this host swing with neighbor load).

    python tools/d16_verify_volume.py [--factor 100] [--skew zipf]

Boilerplate-variant mode (VERDICT r13 ask #3 — the signature-collapse
decision probe):

    python tools/d16_verify_volume.py --boilerplate 200000 \
        [--tpl-tokens 200] [--reps 2] [--out path.json]

builds a corpus that is ONE template family with every doc a distinct
digest (token at the template midpoint replaced per-variant) — the
exact shape the digest collapse cannot help with — and ABAB-measures
d16's wall under collapse="digest" vs collapse="signature", plus the
deterministic volume counts (distinct digests vs distinct full
signatures, per-mode shingle and set-join rows).  The JSON it prints
is ALSO written to --out (default tools/d16_sigcollapse_probe.json) —
the probe persists its own evidence (VERDICT r13 ask #1 lesson).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from aind_smartspim_data_transformation_spark.operators import dedup  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)
from aind_smartspim_data_transformation_spark.tables import load_table  # noqa: E402
from tools.overflow_sweep import build_scale_dir  # noqa: E402


def build_boilerplate_dir(
    spark, out_dir: str, n_variants: int, tpl_tokens: int
) -> None:
    """One template family, every doc a distinct digest: variant i is
    the template with the midpoint token replaced by ``var<i>``.  All
    variants share (tpl_tokens - 3) of their (tpl_tokens - 2) shingles,
    so most agree on every minhash and land in one saturated LSH family
    — the corpus the digest collapse cannot compress (no two texts are
    byte-identical) and the signature collapse exists for."""
    mid = tpl_tokens // 2
    text = (
        f"concat_ws(' ', transform(sequence(0, {tpl_tokens - 1}), "
        f"j -> CASE WHEN j = {mid} THEN concat('var', CAST(id AS STRING)) "
        "ELSE concat('w', CAST(j AS STRING)) END))"
    )
    (
        spark.range(n_variants)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(text).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("boilerplate").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )


def boilerplate_probe(args) -> dict:
    spark = build_local_session(
        app_name="d16-sigcollapse-probe", driver_memory="32g"
    )
    tmp = tempfile.mkdtemp(prefix="d16_sig_")
    build_boilerplate_dir(spark, tmp, args.boilerplate, args.tpl_tokens)

    cand = dedup._d16_candidates(spark, tmp)
    n_pairs = cand.count()
    cand_docs = (
        cand.select(F.col("doc1").alias("doc_id"))
        .union(cand.select(F.col("doc2")))
        .distinct()
    )
    docs_cand = load_table(spark, tmp, "documents").join(
        F.broadcast(cand_docs), "doc_id"
    )
    n_cand_docs = docs_cand.count()
    # every text is distinct by construction → distinct digests = docs;
    # distinct signatures is the quantity the flag path collapses to
    sigs = dedup._full_signatures(docs_cand).persist()
    n_sigs = sigs.select("sig").distinct().count()
    sp = cand.join(
        sigs.select(F.col("doc_id").alias("doc1"), F.col("sig").alias("sg1")),
        "doc1",
    ).join(
        sigs.select(F.col("doc_id").alias("doc2"), F.col("sig").alias("sg2")),
        "doc2",
    )
    n_same_sig = sp.filter(F.col("sg1") == F.col("sg2")).count()
    n_cross_sig_pairs = (
        sp.filter(F.col("sg1") != F.col("sg2"))
        .select(F.least("sg1", "sg2"), F.greatest("sg1", "sg2"))
        .distinct()
        .count()
    )
    sigs.unpersist()

    # ABAB wall measurement: digest, signature, digest, signature …
    walls: dict[str, list[float]] = {"digest": [], "signature": []}
    rows_out: dict[str, int] = {}
    for _ in range(args.reps):
        for mode in ("digest", "signature"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = dedup.d16_lsh_recovered_pairs(
                spark, tmp, collapse=mode
            ).count()
            walls[mode].append(round(time.perf_counter() - t0, 1))
            rows_out[mode] = n
    spark.catalog.clearCache()

    sh_per_doc = args.tpl_tokens - 2
    return {
        "probe": "d16_signature_collapse",
        "n_variants": args.boilerplate,
        "tpl_tokens": args.tpl_tokens,
        "n_candidate_pairs": n_pairs,
        "n_candidate_docs": n_cand_docs,
        "n_distinct_digests": n_cand_docs,
        "n_distinct_signatures": n_sigs,
        "sig_collapse_x": round(n_cand_docs / max(n_sigs, 1), 1),
        "n_same_signature_pairs": n_same_sig,
        "n_distinct_cross_signature_pairs": n_cross_sig_pairs,
        "shingle_rows_digest": n_cand_docs * sh_per_doc,
        "shingle_rows_signature": n_sigs * sh_per_doc,
        "set_join_rows_digest": 2 * n_pairs,
        "set_join_rows_signature": 2 * n_cross_sig_pairs,
        "d16_rows_out": rows_out,
        "wall_sec": walls,
        "wall_min_digest": min(walls["digest"]),
        "wall_min_signature": min(walls["signature"]),
        "speedup_x": round(
            min(walls["digest"]) / max(min(walls["signature"]), 1e-9), 2
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument(
        "--base", default=os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--skew", choices=["zipf"], default=None)
    ap.add_argument("--skew-frac", type=float, default=0.5)
    ap.add_argument("--boilerplate", type=int, default=None)
    ap.add_argument("--tpl-tokens", type=int, default=200)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.boilerplate:
        out = boilerplate_probe(args)
        line = json.dumps(out)
        print(line)
        path = Path(args.out or (Path(__file__).parent / "d16_sigcollapse_probe.json"))
        path.write_text(line + "\n")
        print(f"artifact written: {path}", file=sys.stderr)
        return 0

    spark = build_local_session(
        app_name="d16-verify-volume", driver_memory="32g"
    )
    tmp = tempfile.mkdtemp(prefix="d16_volume_")
    build_scale_dir(
        spark, args.base, tmp, args.factor, skew=args.skew,
        skew_frac=args.skew_frac,
    )

    cand = dedup._d16_candidates(spark, tmp)
    n_pairs = cand.count()
    cand_docs = (
        cand.select(F.col("doc1").alias("doc_id"))
        .union(cand.select(F.col("doc2")))
        .distinct()
    )
    dmap = (
        load_table(spark, tmp, "documents")
        .join(F.broadcast(cand_docs), "doc_id")
        .select(
            "doc_id",
            F.sha2("text", 256).alias("dg"),
            F.size(F.split("text", " ")).alias("ntoks"),
        )
        .persist()
    )
    doc_stats = dmap.agg(
        F.count("*").alias("n_cand_docs"),
        F.sum(F.when(F.col("ntoks") >= 3, F.col("ntoks") - 2)).alias(
            "shingle_rows_pre"
        ),
    ).collect()[0]
    rep_stats = (
        dmap.filter("ntoks >= 3")
        .groupBy("dg")
        .agg(F.min("doc_id").alias("doc_id"), F.first("ntoks").alias("ntoks"))
        .agg(
            F.count("*").alias("n_distinct_digests"),
            F.sum(F.col("ntoks") - 2).alias("shingle_rows_post"),
        )
        .collect()[0]
    )
    p = cand.join(
        dmap.select(F.col("doc_id").alias("doc1"), F.col("dg").alias("dg1")),
        "doc1",
    ).join(
        dmap.select(F.col("doc_id").alias("doc2"), F.col("dg").alias("dg2")),
        "doc2",
    )
    pair_stats = p.agg(
        F.sum(F.when(F.col("dg1") == F.col("dg2"), 1).otherwise(0)).alias(
            "n_same_digest_pairs"
        ),
        F.sum(F.when(F.col("dg1") != F.col("dg2"), 1).otherwise(0)).alias(
            "n_cross_digest_pairs"
        ),
    ).collect()[0]
    n_digest_pairs = (
        p.filter(F.col("dg1") != F.col("dg2"))
        .select("dg1", "dg2")
        .distinct()
        .count()
    )

    t0 = time.perf_counter()
    n_out = dedup.d16_lsh_recovered_pairs(spark, tmp).count()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()

    out = {
        "factor": args.factor,
        "skew": args.skew,
        "n_candidate_pairs": n_pairs,
        "n_candidate_docs": doc_stats["n_cand_docs"],
        "n_distinct_eligible_digests": rep_stats["n_distinct_digests"],
        "n_same_digest_pairs": pair_stats["n_same_digest_pairs"],
        "n_cross_digest_pairs": pair_stats["n_cross_digest_pairs"],
        "n_distinct_cross_digest_pairs": n_digest_pairs,
        "shingle_rows_pre_collapse": doc_stats["shingle_rows_pre"],
        "shingle_rows_post_collapse": rep_stats["shingle_rows_post"],
        "set_join_rows_pre": 2 * n_pairs,
        "set_join_rows_post": 2 * n_digest_pairs,
        "shingle_cut_x": round(
            doc_stats["shingle_rows_pre"]
            / max(rep_stats["shingle_rows_post"], 1),
            1,
        ),
        "set_join_cut_x": round(n_pairs / max(n_digest_pairs, 1), 1),
        "d16_rows_out": n_out,
        "d16_wall_sec": round(wall, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
