"""Incremental imaging ingest — Structured Streaming over arriving slices.

The reference processes a finished acquisition in one batch job, re-listing
the whole tree every run (`smartspim_job.py:43-63`, `run_job` 217-234).
Acquisitions are written slice-by-slice over hours, so the streaming twin
treats the stack tree as an unbounded source instead: Spark's file stream
source checkpoints the set of processed files, so each arriving slice is
listed and decoded exactly once across any number of micro-batches, and
the accumulated slice table converges to exactly what the batch path
(`sources/stack_reader.py`) produces on the finished tree.

Two deliberate semantic choices:

- **slice_key, not z, is the streamed identity.** The batch path assigns
  dense z by filename rank over *all* files of a stack
  (`decode_slices`, `io/readers.py:145` sorted-glob semantics) — a window
  an incremental batch cannot evaluate (it only sees new files).  The
  stream therefore carries the numeric filename stem (`slice_key`,
  batch-independent and content-stable); dense z is assigned at
  chunk-assembly time by rank over the *accumulated* table, where it is
  a plain batch window again.  Once all slices have arrived the two
  paths are row-identical (asserted in tests/test_stack_stream.py).
- **foreachBatch + parquet append.** Chunk assembly needs a groupBy
  (`applyInPandas`) across micro-batches, which is not a streaming
  operator — so the stream's job is decode-and-land only, and assembly
  stays a batch DataFrame op over the landed table.  The file-source
  checkpoint makes input-side processing exactly-once; the append sink
  is at-least-once on foreachBatch retry (dedup key: (stack, slice_key)
  at assembly time would absorb replays; at scale, land to an
  idempotent table format keyed on batch_id instead).

Scale posture: decode is the same Arrow-batched narrow map as batch
ingest — no shuffle anywhere in the stream; the only state is the
file-source's processed-file log.  1000 executors drain a burst of
arriving slices at list-throughput, and `maxFilesPerTrigger` is the
backpressure knob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aind_smartspim_data_transformation_spark.sources.stack_reader import (
    decode_image_gray,
)
from aind_smartspim_data_transformation_spark.sources.stack_reader import (
    slices_to_chunks,
)

# binaryFile's fixed schema — streaming sources cannot infer it.
BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

STREAM_SLICE_SCHEMA = (
    "channel string, stack string, slice_key long, height int, width int, "
    "dtype string, data binary"
)


def stream_stack_files(
    spark: SparkSession, root: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of ``scan_stack_files``: same path-derived columns,
    plus the batch-independent ``slice_key`` (numeric filename stem)."""
    from aind_smartspim_data_transformation_spark.session import imaging_session

    reader = (
        imaging_session(spark)  # megabyte-row Arrow batches, own SQLConf
        .readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.{png,tif,tiff}")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(root)
    channel = F.regexp_extract("path", r"SmartSPIM/([^/]+)/", 1)
    stack = F.regexp_extract("path", r"/([^/]+)/[^/]+\.[A-Za-z]+$", 1)
    slice_key = F.regexp_extract("path", r"/(\d+)\.[A-Za-z]+$", 1).cast("long")
    return (
        df.filter(channel != "")
        .select(
            channel.alias("channel"),
            stack.alias("stack"),
            slice_key.alias("slice_key"),
            "content",
        )
    )


def decode_stream_slices(files: DataFrame) -> DataFrame:
    """Decode (same PNG/TIFF dispatch as the batch path) keyed by slice_key."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = decode_image_gray(bytes(r.content))
                out.append(
                    (
                        r.channel,
                        r.stack,
                        int(r.slice_key),
                        arr.shape[0],
                        arr.shape[1],
                        str(arr.dtype),
                        arr.tobytes(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "channel",
                    "stack",
                    "slice_key",
                    "height",
                    "width",
                    "dtype",
                    "data",
                ],
            )

    return files.mapInPandas(_decode, schema=STREAM_SLICE_SCHEMA)


def run_incremental_ingest(
    spark: SparkSession,
    root: str,
    out_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Drain everything new under ``root`` into the landed slice table.

    ``availableNow`` processes the backlog and stops — re-running with
    the same checkpoint picks up only files that arrived since (the
    incremental re-run the reference lacks: its job re-reads the world).
    """
    files = stream_stack_files(spark, root)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        decode_stream_slices(batch_df).write.mode("append").parquet(out_dir)

    q = (
        files.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"incremental ingest did not drain within {timeout_sec}s "
                f"— the checkpoint resumes where it stopped"
            )
    finally:
        q.stop()


def accumulated_slices_to_chunks(
    spark: SparkSession, slice_dir: str, chunk_z: int = 64
) -> DataFrame:
    """Assemble the landed slice table into the standard chunk table.

    Dense z = rank of slice_key within (channel, stack) — the batch
    path's sorted-glob z, evaluated where it is well-defined (over the
    full accumulated table).  Landed duplicates (foreachBatch replays)
    would be absorbed here by a dropDuplicates on (stack, slice_key)
    before ranking; the file-source checkpoint makes them impossible in
    this local flow.
    """
    return _densify_and_chunk(spark.read.parquet(slice_dir), chunk_z)


def _densify_and_chunk(sl: DataFrame, chunk_z: int) -> DataFrame:
    """The ONE home of the dense-z contract: dedup on (channel, stack,
    slice_key), z = rank of slice_key within the stack, then the
    standard chunk assembly.  Shared by the full-table and slab paths
    so their z assignment can never desynchronize."""
    w = W.partitionBy("channel", "stack").orderBy("slice_key")
    dense = (
        sl.dropDuplicates(["channel", "stack", "slice_key"])
        .withColumn("z", (F.row_number().over(w) - 1).cast("int"))
        .drop("slice_key")
    )
    return slices_to_chunks(dense, chunk_z)


def landed_slab_chunks(
    spark: SparkSession,
    slice_dir: str,
    after_key: int,
    chunk_z: int = 64,
) -> DataFrame:
    """Chunk table (slab-local z starting at 0) for slices landed with
    ``slice_key > after_key`` — the input
    ``imaging.zarr_sink.append_ome_zarr_z`` expects for incremental
    store growth.

    Correct under the acquisition contract the reference's writer also
    assumes (`io/readers.py:145` sorted-glob): slices are written in
    ascending z per stack, so everything after the last appended key IS
    the next contiguous slab.  The caller tracks ``after_key`` (the max
    key of the previous append — durable alongside the stream
    checkpoint); append validation in the sink refuses geometry that
    would truncate a boundary window, so an out-of-contract arrival
    fails loudly rather than corrupting the store.
    """
    return _densify_and_chunk(
        spark.read.parquet(slice_dir).filter(F.col("slice_key") > after_key),
        chunk_z,
    )


def run_streaming_store_ingest(
    spark: SparkSession,
    root: str,
    store_root: str,
    checkpoint_dir: str,
    chunk_zyx: list[int] | None = None,
    scale_factor_zyx: list[int] | None = None,
    n_levels: int = 1,
    voxel_size_zyx: list[float] | None = None,
    timeout_sec: int = 120,
    extra_options: dict | None = None,
) -> None:
    """Stream arriving slices STRAIGHT into a multiscale OME-Zarr store
    through the DataSource streaming commit protocol — no landed
    parquet, no driver glue:

        decoded slices → repartition(channel, stack)
                       → writeStream.format("smartspim")

    Each ``availableNow`` run drains the new waves; every microbatch
    becomes one fenced z-slab append per stack
    (``SmartspimStreamWriter`` → ``append_slab_transaction``), so a
    mid-stream kill leaves either no trace (staging only), a detectable
    fence (rolled forward on restart), or a committed epoch (replay is
    a marker-guarded no-op).  Semantics and constraints are the
    writer's (slices ascend per stack; uniform wave depth except the
    last).
    """
    import json

    from aind_smartspim_data_transformation_spark.sources.smartspim_datasource import (
        ensure_registered,
    )

    slices = decode_stream_slices(
        stream_stack_files(spark, root)
    ).repartition("channel", "stack")
    # streaming format resolution is SPLIT across sessions (observed,
    # pyspark 4.1): .start() resolves from the ACTIVE session while the
    # microbatch execution resolves from the DataFrame's own (imaging
    # child) session — register in BOTH.  No fallback exists for a
    # streaming sink, so a registration failure propagates.
    ensure_registered(spark)
    ensure_registered(slices.sparkSession)
    writer = (
        slices.writeStream.format("smartspim")
        .option("checkpointLocation", checkpoint_dir)
        .option("chunk", json.dumps(chunk_zyx or [128, 128, 128]))
        .option("scale_factor", json.dumps(scale_factor_zyx or [2, 2, 2]))
        .option("n_levels", str(n_levels))
        .option("voxel_size", json.dumps(voxel_size_zyx or [1.0, 1.0, 1.0]))
    )
    for k, v in (extra_options or {}).items():
        writer = writer.option(k, v)
    q = writer.trigger(availableNow=True).start(store_root)
    try:
        done = q.awaitTermination(timeout_sec)
        if not done:
            # an incomplete drain must not return as success: the fence
            # keeps the store consistent, but the caller believes every
            # arrived wave landed.  Stop the query (finally) and say so.
            raise TimeoutError(
                f"streaming store ingest did not drain within "
                f"{timeout_sec}s — the checkpoint will resume where it "
                f"stopped on the next run"
            )
    finally:
        q.stop()
