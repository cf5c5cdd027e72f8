"""Config plane: 3-way precedence (JSON arg / config file / env vars)."""

from __future__ import annotations

import json

import pytest

from aind_smartspim_data_transformation_spark.config.settings import (
    CompressorName,
    ImagingJobSettings,
)


def test_defaults():
    s = ImagingJobSettings(input_source="/in", output_directory="/out")
    assert s.chunk_size == [128, 128, 128]
    assert s.scale_factor == [2, 2, 2]
    assert s.downsample_levels == 4
    assert s.compressor_name == CompressorName.ZLIB
    assert s.s3_location is None


def test_json_arg_precedence(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"input_source": "/file", "output_directory": "/o"}))
    s = ImagingJobSettings.resolve(
        json_arg=json.dumps({"input_source": "/arg", "output_directory": "/o"}),
        config_file=str(cfg),
    )
    assert str(s.input_source) == "/arg"


def test_config_file(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(
        json.dumps(
            {
                "input_source": "/file",
                "output_directory": "/o",
                "num_of_partitions": 4,
                "partition_to_process": 0,
            }
        )
    )
    s = ImagingJobSettings.resolve(config_file=str(cfg))
    assert str(s.input_source) == "/file"
    assert s.num_of_partitions == 4


def test_env_vars():
    env = {
        "TRANSFORMATION_JOB_INPUT_SOURCE": "/env",
        "TRANSFORMATION_JOB_OUTPUT_DIRECTORY": "/o",
        "TRANSFORMATION_JOB_DOWNSAMPLE_LEVELS": "2",
        "TRANSFORMATION_JOB_CHUNK_SIZE": "[64, 64, 64]",
        "UNRELATED": "ignored",
    }
    s = ImagingJobSettings.resolve(environ=env)
    assert str(s.input_source) == "/env"
    assert s.downsample_levels == 2
    assert s.chunk_size == [64, 64, 64]


def test_invalid_settings_rejected():
    with pytest.raises(Exception):
        ImagingJobSettings(input_source="/in")  # missing output_directory


def test_partition_bounds_validated():
    """0 <= partition_to_process < num_of_partitions is enforced at
    settings construction, not as an IndexError deep in the job."""
    for n, p in [(1, 1), (4, 4), (4, -1), (0, 0), (-2, 0)]:
        with pytest.raises(ValueError, match="partition|num_of_partitions"):
            ImagingJobSettings(
                input_source="/in",
                output_directory="/out",
                num_of_partitions=n,
                partition_to_process=p,
            )
    # in-range values still accepted
    s = ImagingJobSettings(
        input_source="/in",
        output_directory="/out",
        num_of_partitions=4,
        partition_to_process=3,
    )
    assert s.partition_to_process == 3


def test_oracle_result_types_are_driver_hash_safe():
    """Sweep EVERY registered oracle and assert no result column binds
    to a driver-hash-unsafe DuckDB type (HUGEINT/UHUGEINT/DECIMAL).

    DuckDB widens integer ``sum()`` to HUGEINT (int128); arrow has no
    int128, so the driver's hash pipeline materializes it differently
    from BIGINT even when every value fits int64 — the ONLY two red
    CORRECTNESS rows in five rounds (x07, d12 in r5) were exactly this,
    with rows+schema matching and values integer-exact.  Binding via
    ``con.sql(...).types`` plans without executing, so the full
    130-oracle sweep is cheap."""
    import duckdb

    from aind_smartspim_data_transformation_spark import registry
    from aind_smartspim_data_transformation_spark.tables import TABLE_NAMES
    from tools.strict_verify import unsafe_oracle_types

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = {}
    for name, sql in registry.all_oracles().items():
        offenders = unsafe_oracle_types(con, sql)
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "driver-hash-unsafe oracle result types (cast to BIGINT "
        f"at the SELECT): {bad}"
    )


def test_rotation_keys_resolve():
    """Every _LEADING_R16 rotation key must exist in the merged registry
    (a typo or renamed key would otherwise silently trail outside the
    driver's ~50-entry sample window, defeating the rotation's whole
    purpose), and the rotated dicts must lead with exactly those keys."""
    from aind_smartspim_data_transformation_spark import registry

    q = registry.all_queries()
    o = registry.all_oracles()
    missing = [k for k in registry._LEADING_R16 if k not in q]
    assert not missing, f"rotation keys missing from registry: {missing}"
    n = len(registry._LEADING_R16)
    assert list(q)[:n] == registry._LEADING_R16
    # every leading entry is oracle-backed (the window exists to earn
    # green CORRECTNESS rows, not rows-only checks)
    assert [k for k in registry._LEADING_R16 if k not in o] == []
