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


def _modules():
    # Imported lazily/defensively so one broken module never takes down
    # the whole registry (the driver imports this file every round).
    mods = [relational]
    for name in (
        "aind_smartspim_data_transformation_spark.plans.events",
        "aind_smartspim_data_transformation_spark.operators.dedup",
        "aind_smartspim_data_transformation_spark.operators.similarity",
        "aind_smartspim_data_transformation_spark.operators.text",
        "aind_smartspim_data_transformation_spark.operators.corpus",
        "aind_smartspim_data_transformation_spark.operators.multimodal",
        "aind_smartspim_data_transformation_spark.plans.imaging_queries",
    ):
        try:
            import importlib

            mods.append(importlib.import_module(name))
        except ImportError:
            pass
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(getattr(m, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return out
