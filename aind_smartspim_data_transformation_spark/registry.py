"""Central query registry: merges every module's QUERIES/ORACLE dicts.

``__spark_entry__.py`` re-exports these for the driver's correctness
harness.  Every operator claimed done in SURVEY.md §2 has an entry here;
ops without a SQL-expressible oracle appear in QUERIES only (driver
records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aind_smartspim_data_transformation_spark.plans import relational


# ROTATION (round 7): the driver's correctness harness samples the
# first ~50 registry entries per round.  STANDING INVARIANT (registry
# growth hygiene): every query registered in round N lands in round
# N+1's leading list BEFORE anything else is added, so no query ever
# waits more than one round for an external CORRECTNESS row — the
# leading list is (a) all keys with no driver row yet, oldest first,
# then (b) this round's brand-new keys; r-green families trail.
#
# Round-12 rotation (VERDICT r11 ask #3): queries whose
# implementations changed in r11 with no r11 driver row, plus this
# round's changes.  s09/n07 call `lloyd_train`, whose signature grew
# the mapInPandas assign-mode branch in r11 (equality-tested, but the
# rotation invariant says re-sample).  d03 was refactored this round
# (shared `_verify_jaccard_pairs` helper + the Observation hook; plan
# value-identical, re-sample anyway); i05 had its chunk-dim literals
# hoisted to I05_CZ/I05_CY constants this round (ADVICE r11).
# i01–i04 stay put: the r11 imaging_queries.py diff was i05-only
# (verified from `git diff b65107c..2ece7b6`).  d16 is brand-new
# (invariant (b)): bounded recall recovery for saturated LSH buckets.
# e08's equi-key grew the 30-min bucket (zipf-sweep finding, SCALE.md
# §6o) and e16 is the new bounded-partition rolling twin — both lead.
# Round-13 rotation (VERDICT r12 ask #3): queries whose plans changed
# in r13.  d16's verify phase is now digest-collapsed (ask #1 — same
# result set, new plan); e16 gained the exact floor-division bucket
# key AND the null-exact sum recomposition (ADVICE r12); e08 gained
# the floor-division bucket key.  No new registry keys this round
# (the verdict's standing "do not add except where named" rule).
# Round-14 rotation (VERDICT r13 ask #5): queries whose plans changed
# in r14.  d16's cross-digest verify now canonicalizes the digest
# pair before the distinct (ADVICE r13 — halves worst-case rep-set
# join volume, same result set); e16 dropped the dead n_ge coalesce
# (ADVICE r13 — provably-non-null frame sum, plan simplification);
# e14's registered plan IS the pointer-jumping formulation now
# (VERDICT r13 ask #4, measured adoption — the rCTE twin stays
# in-tree as e14_sessions_rcte; SCALE.md §6t).  No new registry keys.
# Round-15 rotation (optimization round; VERDICT r14 ask #4): every
# query whose plan changed in r15 leads.  The r15 changes are
# (a) the conditional unsplittable-scan spread
# (tables.spread_unsplittable_scan) under the dedup-family documents
# scans, text._docs and the s09/n07 embeddings scans — which reaches
# every query built on d03's pipeline (d06, d08, d09, d11, d12, d13,
# c14, n01, n13) and the whole t-family + x04's shingle stream;
# (b) d05's explicit AQE-exempt pair-loop repartition; (c) e13's
# registered plan is the bucketed formulation since r15 (VERDICT r14
# ask #1 — the e14 precedent; the native RANGE frame stays as the
# diagnostic twin e13_rolling_24h_native); (d) e14's pointer-jumping
# loop changes from r15 optimization work (converged-row filtering /
# release mechanics).  No new registry keys.
# Round-16 rotation (optimization round 2; VERDICT r15 ask #7): every
# query whose plan or operator internals r16 touched leads.  (a) s10/
# s11's PQ encode+ADC moved from literal codebook/LUT expression trees
# to the vectorized numpy mapInPandas (VERDICT r15 ask #1; expression
# twins stay in-tree, identity pinned by test); (b) d07's salt key and
# d14's self-pair filter were de-spoiled (coalesce / null-safe <=>) so
# AQE's runtime stage cache shares ONE signature subtree across all
# consumers (ask #3 — executed plans now 1 documents scan, was 2; d04
# rotated too as a _simhash_sigs consumer, belt-and-braces); (c)
# e14's checkpoint-handle registry is keyed by the result frame (ask
# #8 — release mechanics only, plan unchanged, rotated on the n18
# lesson: every touched query gets driver verification).  No new
# registry keys.
_LEADING_R16 = [
    "s10_pq_adc",
    "s11_ivf_pq_search",
    "d04_simhash",
    "d07_simhash_hamming_pairs",
    "d14_hamming_neighbor_topk",
    "e14_sessions_recursive",
]

# Kept so NOTES/VERDICT history stays greppable; no longer drive the
# window.
_LEADING_R15 = [
    "e13_rolling_24h",
    "e14_sessions_recursive",
    "d02_dedup_ngram_jaccard",
    "d03_dedup_minhash_lsh",
    "d04_simhash",
    "d05_dedup_embedding_cosine",
    "d06_dedup_corpus",
    "d07_simhash_hamming_pairs",
    "d08_dup_components",
    "d09_dup_components_star",
    "d11_split_leakage",
    "d12_dup_pagerank",
    "d13_keep_best_quality",
    "d14_hamming_neighbor_topk",
    "d15_lsh_saturation_audit",
    "d16_lsh_recovered_pairs",
    "n01_minhash_estimator_qa",
    "n07_semantic_dedup",
    "n13_cluster_merge_qa",
    "c14_curation_pipeline",
    "s09_kmeans_train",
    "q23_percentiles",
    "c08_contamination",
    "d10_substring_coverage",
    "n09_cross_source_contamination",
    "x04_hll_distinct",
    "t01_token_stats",
    "t02_quality_score",
    "t03_lang_stats",
    "t04_lang_id",
    "t05_fingerprint",
    "t06_top_bigrams",
    "t07_tfidf_top_terms",
    "t08_repetition_stats",
    "t09_readability",
    "t10_vocab_zipf",
    "t11_char_entropy",
    "t12_mean_token_rank",
]

# Kept so NOTES/VERDICT history stays greppable; no longer drive the
# window.
_LEADING_R14 = [
    "e14_sessions_recursive",
    "d16_lsh_recovered_pairs",
    "e16_rolling_24h_bucketed",
]

# Kept so NOTES/VERDICT history stays greppable; no longer drive the
# window.
_LEADING_R13 = [
    "d16_lsh_recovered_pairs",
    "e16_rolling_24h_bucketed",
    "e08_interval_join",
]
_LEADING_R12 = [
    "d16_lsh_recovered_pairs",
    "e08_interval_join",
    "e16_rolling_24h_bucketed",
    "d03_dedup_minhash_lsh",
    "s09_kmeans_train",
    "n07_semantic_dedup",
    "i05_resume_bookkeeping",
]

# Kept so NOTES/VERDICT history stays greppable; no longer drive the
# window.
_LEADING_R11 = [
    "i05_resume_bookkeeping",
    "e14_sessions_recursive",
    "d15_lsh_saturation_audit",
]
_LEADING_R10 = [
    "d07_simhash_hamming_pairs",
    "n07_semantic_dedup",
    "d05_dedup_embedding_cosine",
    "d14_hamming_neighbor_topk",
]


def _rotate(d: dict) -> dict:
    # A typo or renamed leading key would silently trail outside the
    # sample window; tests/test_settings.py::test_rotation_keys_resolve
    # fails loudly on that (an assert HERE would conflict with the
    # defensive-import design above — one broken module must degrade
    # the registry, not destroy it, when the driver imports this file).
    lead = {k: d[k] for k in _LEADING_R16 if k in d}
    lead.update((k, v) for k, v in d.items() if k not in lead)
    return lead


def _modules():
    # Imported lazily/defensively so one broken module never takes down
    # the whole registry (the driver imports this file every round).
    import importlib

    # One ordered list drives the whole registry; `relational` is the
    # statically-imported sentinel (it must never be silently skipped).
    order = [
        "aind_smartspim_data_transformation_spark.plans.events",
        relational,
        "aind_smartspim_data_transformation_spark.operators.similarity",
        "aind_smartspim_data_transformation_spark.operators.text",
        "aind_smartspim_data_transformation_spark.operators.corpus",
        "aind_smartspim_data_transformation_spark.operators.multimodal",
        "aind_smartspim_data_transformation_spark.plans.imaging_queries",
        "aind_smartspim_data_transformation_spark.operators.dedup",
        # Module order no longer defines the sample window (the explicit
        # _LEADING_R12 rotation above does); extras still merges last so
        # its re-registrations of relational helpers win by key.
        "aind_smartspim_data_transformation_spark.plans.extras",
    ]
    mods = []
    for entry in order:
        if not isinstance(entry, str):
            mods.append(entry)
            continue
        try:
            mods.append(importlib.import_module(entry))
        except ImportError:
            pass
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Merged (rotated) name → callable registry.

    CALLER CONTRACT — cache hygiene: several queries (n05, n06, n14,
    n15, n16, n18, n19) intentionally return plans containing a shared
    ``persist()`` subtree (an InMemoryRelation) so their final consumer
    computes the expensive shared input once.  The registry does NOT
    release those caches — a harness that sweeps many queries must call
    ``spark.catalog.clearCache()`` between queries (as bench.py,
    tools/strict_verify.py, tools/overflow_sweep.py and
    tools/dump_plans.py do), or it will accumulate ~7 live
    InMemoryRelations per pass.  An in-plan ``unpersist()`` is NOT an
    alternative: releasing at build time evicts the InMemoryRelation
    from the returned plan and the consumer recomputes the shared
    subtree (measured r8→r9: n05 2→4, n15 2→6 wide exchanges).  Full
    site census + session-lifetime policy: SCALE.md §6q.
    """
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(getattr(m, "QUERIES", {}))
    return _rotate(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return _rotate(out)
