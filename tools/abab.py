#!/usr/bin/env python
"""ABAB perf adjudication harness.

Wall-clock on this host swings 3-5× with neighbor load (BASELINE.md),
so comparing a fresh number against one recorded earlier is
meaningless.  This tool interleaves runs of the SAME command in the
current repo (NEW) and in a worktree pinned to an older commit (OLD),
in fresh subprocesses, and reports per-pair plus min-of-N — the honest
statistic under load noise.

    python tools/abab.py <old-commit> -- <command ...>
    python tools/abab.py 2e9e627 --reps 4 -- python tools/bench_imaging.py

The command runs with cwd set to each tree and that tree prepended to
PYTHONPATH; it should print timing to stdout (the tool measures
wall-clock around the subprocess regardless).  The worktree is created
under /tmp and removed afterwards.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_once(tree: Path, cmd: list[str], timeout: int) -> float:
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tree}:{env.get('PYTHONPATH', '')}"
    t0 = time.perf_counter()
    subprocess.run(
        cmd, cwd=tree, env=env, timeout=timeout,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, check=True,
    )
    return time.perf_counter() - t0


def main() -> int:
    argv = sys.argv[1:]
    if "--" not in argv:
        print("usage: abab.py <commit> [--reps N] [--timeout S] -- <command ...>")
        return 2
    split = argv.index("--")
    cmd = argv[split + 1 :]
    ap = argparse.ArgumentParser()
    ap.add_argument("old_commit")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args(argv[:split])
    if not cmd:
        ap.error("no command given after --")

    wt = Path(tempfile.mkdtemp(prefix="abab_")) / "old"
    subprocess.run(
        ["git", "worktree", "add", str(wt), args.old_commit],
        cwd=REPO, check=True, capture_output=True,
    )
    news, olds = [], []
    try:
        for rep in range(args.reps):
            news.append(_run_once(REPO, cmd, args.timeout))
            olds.append(_run_once(wt, cmd, args.timeout))
            print(
                f"pair {rep}: NEW {news[-1]:.2f}s | OLD {olds[-1]:.2f}s",
                flush=True,
            )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=REPO, capture_output=True,
        )
    wins = sum(n < o for n, o in zip(news, olds))
    print(
        f"min-of-{args.reps}: NEW {min(news):.2f}s vs OLD {min(olds):.2f}s "
        f"({min(olds) / min(news):.2f}x); NEW wins {wins}/{args.reps} pairs"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
