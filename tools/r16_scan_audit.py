#!/usr/bin/env python
"""r16 registry-wide runtime scan audit.

For each named query (default: the expensive multi-consumer families),
collect at SF_DIR and report from the FINAL executed adaptive plan:
per-table FileScan counts, ReusedExchange count, and each scan's
DataFilters — the tell for a spoiled canonical match (one consumer's
inferred isnotnull pushed to its scan only, as d07/d14 had).

    SF_DIR=/root/testdata/sf0.01 python tools/r16_scan_audit.py [names...]
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)

DEFAULT = [
    "d02_dedup_ngram_jaccard",
    "d03_dedup_minhash_lsh",
    "d06_dedup_corpus",
    "d08_dup_components",
    "d09_dup_components_star",
    "d10_substring_coverage",
    "d11_split_leakage",
    "d12_dup_pagerank",
    "d15_lsh_saturation_audit",
    "d16_lsh_recovered_pairs",
    "n01_minhash_estimator_qa",
    "n07_semantic_dedup",
    "n09_cross_source_contamination",
    "n13_cluster_merge_qa",
    "c08_contamination",
    "x04_hll_distinct",
    "t07_tfidf_top_terms",
    "t12_mean_token_rank",
    "n18_length_quality_spearman",
    "n02_source_pair_tvd",
    "s09_kmeans_train",
]


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or DEFAULT
    spark = build_local_session(app_name="r16-scan-audit", driver_memory="32g")
    queries = registry.all_queries()
    report = {}
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            df.collect()
            final = (
                df._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0]
            )
        except Exception as exc:
            print(f"== {name}: ERROR {exc}")
            continue
        scans = re.findall(
            r"FileScan parquet \[[^\]]*\] Batched: \w+, DataFilters: (\[[^\]]*\]).*?"
            r"file:[^ ,\]]*/(\w+)\.parquet",
            final,
        )
        per_table = Counter(t for _, t in scans)
        reused = final.count("ReusedExchange")
        print(f"== {name}: scans={dict(per_table)} reused={reused} "
              f"rdd={final.count('Scan ExistingRDD')}")
        multi = {t for t, c in per_table.items() if c > 1}
        for filt, t in scans:
            if t in multi:
                print(f"    {t}: DataFilters {filt[:140]}")
        report[name] = {
            "scans": dict(per_table),
            "reused": reused,
            "filters": [{"table": t, "filters": f} for f, t in scans],
        }
        sys.stdout.flush()
        spark.catalog.clearCache()
    out = REPO / "tools" / "r16_scan_audit.json"
    out.write_text(json.dumps({"sf_dir": sf_dir, "report": report}, indent=1) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
