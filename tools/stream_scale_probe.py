#!/usr/bin/env python
"""Streaming scale point (VERDICT r11 ask #8, SCALE.md §6p).

The streaming twins are correctness-tested (stream ≡ batch) but were
never SWEPT: this drives the custom stateful sessionizer
(`finalized_sessions`, applyInPandasWithState + EventTimeTimeout) over
a 10× events corpus (1M rows) as a rate-limited multi-microbatch
stream and records what a 24/7 operator would watch:

- arrival order is realistic: the corpus is split into $N_FILES
  time-range files appended in order (each append = one commit, so the
  file source triggers them in sequence; maxFilesPerTrigger=1);
- a deliberate LATE straggler file (negative user_ids, early
  timestamps, appended last) exercises the watermark drop path — the
  drops must be COUNTED, not silent;
- a far-future sentinel advances the watermark so every open session
  finalizes before the bounded stream drains (the test-suite pattern);
- per-batch state rows / state memory / drop counts come from the
  query's own progress events (`watermark_drop_metrics` + raw
  stateOperators), and the finalized session count is cross-checked
  against batch e04 on the same corpus (stragglers/sentinel excluded).

Prints ONE JSON line.  Run:  python tools/stream_scale_probe.py
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)
from aind_smartspim_data_transformation_spark.streaming import (  # noqa: E402
    events_stream as es,
)

FACTOR = int(os.environ.get("STREAM_SCALE_FACTOR", "10"))
N_FILES = int(os.environ.get("STREAM_SCALE_FILES", "16"))
BASE = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
SENTINEL_USER = 999_999_999


def main() -> int:
    spark = build_local_session(
        app_name="stream-scale-probe", driver_memory="32g"
    )
    tmp = Path(tempfile.mkdtemp(prefix="stream_scale_"))
    src = tmp / "src"
    src.mkdir()
    try:
        rep = spark.range(FACTOR).withColumnRenamed("id", "rep")
        ev = (
            spark.read.parquet(f"{BASE}/events.parquet")
            .crossJoin(rep)
            .select(
                (F.col("user_id") * FACTOR + F.col("rep")).alias("user_id"),
                F.expr(
                    "CAST(ts AS TIMESTAMP) + make_interval(0,0,0,0,0,0,rep)"
                ).alias("ts"),
                "value",
            )
        )
        n_events = ev.count()
        lo, hi = ev.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).collect()[0]
        step = (hi - lo) // N_FILES + 1
        # time-range files appended IN ORDER (separate commits → the
        # file source triggers them in sequence)
        for i in range(N_FILES):
            ev.filter(
                (F.unix_micros("ts") >= lo + i * step)
                & (F.unix_micros("ts") < lo + (i + 1) * step)
            ).coalesce(1).write.mode("append").parquet(str(src))
        # late stragglers: 1,000 synthetic early events arriving after
        # everything — beyond any sane watermark, must be DROPPED and
        # counted; negative user_ids so the batch cross-check can
        # exclude them
        spark.range(1000).select(
            (-F.col("id") - 1).alias("user_id"),
            F.expr(
                f"timestamp_micros({lo}) + make_interval(0,0,0,0,0,0,id % 3600)"
            ).alias("ts"),
            F.lit(1.0).alias("value"),
        ).coalesce(1).write.mode("append").parquet(str(src))
        # far-future sentinel advances the watermark past every deadline
        spark.createDataFrame(
            [(SENTINEL_USER, datetime.datetime(2035, 1, 1), 0.0)],
            "user_id long, ts timestamp, value double",
        ).coalesce(1).write.mode("append").parquet(str(src))

        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "120 seconds")
        )
        t0 = time.perf_counter()
        q = (
            es.finalized_sessions(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("scale_sessions")
            .start()
        )
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        metrics = es.watermark_drop_metrics(q)
        state_mem = 0
        max_state_rows = 0
        per_batch_rows = []
        for p in q.recentProgress:
            ops = (p or {}).get("stateOperators") or []
            if ops:
                rows = sum(int(op.get("numRowsTotal", 0) or 0) for op in ops)
                per_batch_rows.append(rows)
                max_state_rows = max(max_state_rows, rows)
                state_mem = max(
                    state_mem,
                    sum(int(op.get("memoryUsedBytes", 0) or 0) for op in ops),
                )
        q.stop()
        got = spark.sql(
            f"SELECT * FROM scale_sessions WHERE user_id != {SENTINEL_USER}"
            " AND user_id >= 0"
        )
        n_sessions = got.count()

        # batch truth on the same corpus (stragglers/sentinel excluded)
        from aind_smartspim_data_transformation_spark.plans.events import (
            e04_sessionize,
        )

        batch_dir = tmp / "batch"
        batch_dir.mkdir()
        ev.withColumn("event_id", F.monotonically_increasing_id()).withColumn(
            "event_type", F.lit("click")
        ).withColumn("props", F.lit("{}")).write.parquet(
            str(batch_dir / "events.parquet")
        )
        n_batch = e04_sessionize(spark, str(batch_dir)).count()

        print(
            json.dumps(
                {
                    "metric": "stream_sessions_wall_sec",
                    "value": round(wall, 1),
                    "unit": "sec",
                    "factor": FACTOR,
                    "n_events": n_events,
                    "microbatches": metrics["batches"],
                    "n_sessions_stream": n_sessions,
                    "n_sessions_batch_e04": n_batch,
                    "rows_dropped_by_watermark": metrics[
                        "rows_dropped_by_watermark"
                    ],
                    "max_state_rows": max_state_rows,
                    "max_state_memory_mb": round(state_mem / 1e6, 1),
                    "state_rows_per_batch": per_batch_rows,
                    "events_per_sec": round(n_events / wall),
                }
            )
        )
        return 0 if n_sessions == n_batch else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    # main() returns 1 on stream/batch parity failure — propagate it
    # (ADVICE r12: a bare main() call always exited 0, so automation
    # read a parity failure as success).
    sys.exit(main())
