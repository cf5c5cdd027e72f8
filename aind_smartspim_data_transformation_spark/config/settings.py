"""Imaging job settings with the reference's 3-way precedence.

SURVEY.md §3.1: settings materialize from (1) a JSON string argument,
else (2) a JSON config file, else (3) environment variables prefixed
``TRANSFORMATION_JOB_`` — same contract as the reference's pydantic
model (`models.py:23-79`), same defaults (chunk 128³, factor [2,2,2],
4 levels).

Divergences, by design:
- ``compressor_name`` allows ``zlib``/``none``/``blosc`` — blosc (the
  reference default) is import-tried in the sink, so it works on any
  cluster with python-blosc and fails fast with a clear error here.
- ``num_of_partitions``/``partition_to_process`` are HONORED for
  compatibility: the reference round-robins stacks across N independent
  job instances (`smartspim_job.py:30-41`) because it has no cluster
  scheduler.  One Spark app replaces all N instances (the default,
  num_of_partitions=1), but callers who still launch N instances get
  the same deterministic split (imaging/job.py::partition_stacks) and
  partition-0-only derivatives upload.
"""

from __future__ import annotations

import json
import os
from enum import Enum
from pathlib import Path
from typing import Any, Literal, Optional

from pydantic import BaseModel, Field, model_validator

ENV_PREFIX = "TRANSFORMATION_JOB_"


class CompressorName(str, Enum):
    ZLIB = "zlib"
    NONE = "none"
    BLOSC = "blosc"  # import-tried in the sink; needs python-blosc


class ImagingJobSettings(BaseModel):
    """Validated job settings (fixed, declared schema)."""

    input_source: Path
    output_directory: Path
    s3_location: Optional[str] = None
    num_of_partitions: int = 1
    partition_to_process: int = 0
    compressor_name: CompressorName = CompressorName.ZLIB
    compressor_kwargs: dict[str, Any] = Field(default_factory=lambda: {"level": 1})
    chunk_size: list[int] = Field(default_factory=lambda: [128, 128, 128])
    scale_factor: list[int] = Field(default_factory=lambda: [2, 2, 2])
    downsample_levels: int = 4
    # "auto": FUSED zero-shuffle ingest (decode→chunk→pyramid→write in
    # one Python task per z-slab/y-band; imaging/fused.py) when the
    # probed per-task buffer fits memory, DataSource scan when it
    # doesn't, UDF path when the DataSource API is unavailable;
    # "fused"/"datasource"/"udf" force one path.
    ingest: Literal["auto", "fused", "datasource", "udf"] = "auto"
    # "quarantine": a corrupt slice becomes a zero-filled plane at its
    # z position plus a dead-letter triage row instead of failing the
    # job (fused + udf paths; the DataSource scan has no dead-letter
    # channel, so "auto" routes around it and forcing
    # ingest="datasource" with quarantine is refused).
    on_error: Literal["fail", "quarantine"] = "fail"

    @model_validator(mode="after")
    def _check_on_error_ingest(self) -> "ImagingJobSettings":
        if self.on_error == "quarantine" and self.ingest == "datasource":
            raise ValueError(
                "on_error='quarantine' is not available on the "
                "DataSource scan (no dead-letter channel) — use "
                "ingest='auto', 'fused', or 'udf'"
            )
        return self

    @model_validator(mode="after")
    def _check_partitioning(self) -> "ImagingJobSettings":
        # The N-instance contract (reference `smartspim_job.py:30-41`)
        # only makes sense for 0 <= partition_to_process < N; out of
        # range would otherwise surface as a bare IndexError deep in
        # run_imaging_job, or silently process ALL stacks while
        # skipping the derivatives upload.
        if self.num_of_partitions < 1:
            raise ValueError(
                f"num_of_partitions must be >= 1, got {self.num_of_partitions}"
            )
        if not 0 <= self.partition_to_process < self.num_of_partitions:
            raise ValueError(
                "partition_to_process must be in "
                f"[0, num_of_partitions={self.num_of_partitions}), "
                f"got {self.partition_to_process}"
            )
        return self

    @classmethod
    def from_json_str(cls, payload: str) -> "ImagingJobSettings":
        return cls.model_validate_json(payload)

    @classmethod
    def from_config_file(cls, path: str | Path) -> "ImagingJobSettings":
        with open(path) as f:
            return cls.model_validate(json.load(f))

    @classmethod
    def from_env(cls, environ: Optional[dict[str, str]] = None) -> "ImagingJobSettings":
        env = environ if environ is not None else os.environ
        fields = {}
        for key, raw in env.items():
            if not key.startswith(ENV_PREFIX):
                continue
            name = key[len(ENV_PREFIX) :].lower()
            if name not in cls.model_fields:
                continue
            try:
                fields[name] = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                fields[name] = raw
        return cls.model_validate(fields)

    @classmethod
    def resolve(
        cls,
        json_arg: Optional[str] = None,
        config_file: Optional[str] = None,
        environ: Optional[dict[str, str]] = None,
    ) -> "ImagingJobSettings":
        """JSON arg > config file > env vars (reference precedence)."""
        if json_arg:
            return cls.from_json_str(json_arg)
        if config_file:
            return cls.from_config_file(config_file)
        return cls.from_env(environ)
