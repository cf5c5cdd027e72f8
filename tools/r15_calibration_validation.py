#!/usr/bin/env python
"""Validate the r15 parallel host calibration (VERDICT r14 ask #2).

Measures the serial and all-cores calibration loops plus loadavg in
two conditions: (a) the host as-is (run this on an idle window), and
(b) against a deliberate synthetic load of N busy processes (default
16) spinning sha256.  The r14 data showed the SERIAL figure cannot
separate these conditions (0.101/0.105 loaded vs 0.1012/0.1008 idle
while Spark walls differed 1.19x); the PARALLEL figure must.

    python tools/r15_calibration_validation.py \
        [--load-procs 16] [--out tools/r15_calibration_validation.json]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import _host_calibration, _host_calibration_parallel  # noqa: E402


def _burn(stop_ts: float) -> None:
    import hashlib

    buf = b"\xa5" * (1 << 20)
    while time.time() < stop_ts:
        hashlib.sha256(buf).digest()


def measure(label: str) -> dict:
    rec = {
        "label": label,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "serial_sec": _host_calibration(),
        "parallel_sec": _host_calibration_parallel(),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-procs", type=int, default=16)
    ap.add_argument("--load-secs", type=int, default=60)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    idle = measure("as_is")

    stop_ts = time.time() + args.load_secs
    procs = [
        mp.Process(target=_burn, args=(stop_ts,), daemon=True)
        for _ in range(args.load_procs)
    ]
    for p in procs:
        p.start()
    time.sleep(3)  # let the load establish
    loaded = measure(f"synthetic_{args.load_procs}core_load")
    for p in procs:
        p.terminate()
        p.join()

    summary = {
        "probe": "r15_calibration_validation",
        "load_procs": args.load_procs,
        "idle": idle,
        "loaded": loaded,
        "serial_ratio": round(loaded["serial_sec"] / idle["serial_sec"], 3),
        "parallel_ratio": round(
            loaded["parallel_sec"] / idle["parallel_sec"], 3
        ),
        "separates": (
            loaded["parallel_sec"] / idle["parallel_sec"]
            > 1.5 * loaded["serial_sec"] / idle["serial_sec"]
        ),
    }
    print(json.dumps(summary))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
