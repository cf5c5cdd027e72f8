#!/usr/bin/env python
"""Measure the signature collapse's false-1.0 rate (NOTES_r14
"next flaw" #1).

d16's flag path (`collapse="signature"`) emits jaccard 1.0 for any
candidate pair whose FULL 16-minhash signatures agree, without shingle
verification.  For a pair with true jaccard j, the standard minhash
property gives P(one minhash agrees) = j, so P(all 16 agree) = j^16 —
negligible for dissimilar pairs (0.5^16 ≈ 1.5e-5) but ~2.3% at
j = 0.79, JUST BELOW the 0.8 emission threshold.  Those are the pairs
the flag can wrongly emit.  This probe measures the collision rate
empirically against the j^16 prediction.

Construction: per (jaccard level, doc length) cell, n_pairs pairs of
docs where B keeps the first t tokens of A and finishes with fresh
tokens — shared shingles t-2 of m = L-2 each side, so
j = (t-2)/(2m-t+2) exactly, with t solved for the target.  All tokens
are pair-unique (no cross-pair shingle collisions).  Signatures via
the SAME `_full_signatures` helper the flag path uses.

    python tools/d16_sig_false_rate.py [--pairs 50000] [--out path]

Prints one JSON line and self-persists it (r14 evidence convention).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from aind_smartspim_data_transformation_spark.operators import dedup  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)

TARGET_J = [0.5, 0.6, 0.7, 0.75, 0.79]
LENGTHS = [30, 100]


def _doc_expr(tag: str, length: int, prefix_t: int) -> str:
    """SQL expr building a doc of `length` tokens: the first prefix_t
    tokens are the pair's shared 'a' tokens, the rest are tagged."""
    return (
        "concat_ws(' ', transform(sequence(0, {n}), j -> CASE WHEN "
        "j < {t} THEN concat('p', lvl, 'x', CAST(id AS STRING), 'a', "
        "CAST(j AS STRING)) ELSE concat('p', lvl, 'x', "
        "CAST(id AS STRING), '{tag}', CAST(j AS STRING)) END))"
    ).format(n=length - 1, t=prefix_t, tag=tag)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=50000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = build_local_session(
        app_name="d16-sig-false-rate", driver_memory="32g"
    )
    cells = []
    for length in LENGTHS:
        m = length - 2
        for j in TARGET_J:
            # t = (2jm + 2j + 2)/(1+j); shared shingles = t-2
            t = round((2 * j * m + 2 * j + 2) / (1 + j))
            t = max(3, min(length - 3, t))
            # every cell must sit STRICTLY below the emission threshold
            # (the probe measures the wrong-emission rate; a cell at or
            # above threshold would measure a correct emission) — step
            # down if token granularity rounded the jaccard past it
            while t > 3 and (t - 2) / (2 * m - t + 2) >= dedup.JACCARD_THRESHOLD:
                t -= 1
            actual_j = (t - 2) / (2 * m - t + 2)
            base = spark.range(args.pairs).select(
                "id", F.lit(f"L{length}j{j}").alias("lvl")
            )
            a = base.select(
                "id", "lvl",
                F.expr(_doc_expr("a", length, length)).alias("text"),
            )
            b = base.select(
                "id", "lvl",
                F.expr(_doc_expr("b", length, t)).alias("text"),
            )
            sa = dedup._full_signatures(
                a.select(F.col("id").alias("doc_id"), "text")
            ).select(F.col("doc_id").alias("id"), F.col("sig").alias("sig_a"))
            sb = dedup._full_signatures(
                b.select(F.col("id").alias("doc_id"), "text")
            ).select(F.col("doc_id").alias("id"), F.col("sig").alias("sig_b"))
            n_collide = (
                sa.join(sb, "id")
                .filter(F.col("sig_a") == F.col("sig_b"))
                .count()
            )
            rate = n_collide / args.pairs
            cells.append(
                {
                    "length_tokens": length,
                    "target_j": j,
                    "actual_j": round(actual_j, 4),
                    "predicted_rate_j16": round(actual_j**16, 6),
                    "n_pairs": args.pairs,
                    "n_sig_collisions": n_collide,
                    "measured_rate": round(rate, 6),
                }
            )
            print(json.dumps(cells[-1]), flush=True)

    out = {
        "probe": "d16_signature_false_positive_rate",
        "threshold": dedup.JACCARD_THRESHOLD,
        "cells": cells,
        "worst_measured_rate_below_threshold": max(
            c["measured_rate"] for c in cells
        ),
    }
    line = json.dumps(out)
    print(line)
    path = Path(
        args.out or (Path(__file__).parent / "d16_sig_false_rate.json")
    )
    path.write_text(line + "\n")
    print(f"artifact written: {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
