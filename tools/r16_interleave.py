#!/usr/bin/env python
"""Interleaved OLD/NEW per-query A/B: alternate fresh-JVM subprocesses
of tools/r16_time_queries.py between the current tree (NEW) and a git
worktree at an older commit (OLD), and report per-query min-over-mins.

    python tools/r16_interleave.py <old-commit> [--pairs 3] [--reps 3] \
        [--sf /root/testdata/sf0.1] -- <query ...>

Wall-clock swings 3-5x with neighbor load on this host (BASELINE.md);
only the interleaved min-of-N comparison is meaningful.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(tree: Path, names: list[str], sf: str, reps: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(tree)
    env["SF_DIR"] = sf
    env["REPS"] = str(reps)
    p = subprocess.run(
        [sys.executable, str(REPO / "tools/r16_time_queries.py"), *names],
        cwd=tree, env=env, capture_output=True, text=True, timeout=1800,
    )
    if p.returncode != 0:
        print(p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"run failed in {tree}")
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]


def main() -> int:
    argv = sys.argv[1:]
    split = argv.index("--")
    names = argv[split + 1 :]
    ap = argparse.ArgumentParser()
    ap.add_argument("old_commit")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args(argv[:split])

    wt = Path(tempfile.mkdtemp(prefix="r16ab_")) / "old"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), args.old_commit],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        olds: dict[str, list] = {n: [] for n in names}
        news: dict[str, list] = {n: [] for n in names}
        pair_log = []
        for i in range(args.pairs):
            for label, tree, acc in (("old", wt, olds), ("new", REPO, news)):
                res = _run(tree, names, args.sf, args.reps)
                for n in names:
                    acc[n].append(res[n]["min"])
                print(f"# pair {i} {label}: "
                      + " ".join(f"{n}={res[n]['min']:.3f}" for n in names),
                      file=sys.stderr)
                pair_log.append({"pair": i, "tree": label,
                                 **{n: res[n] for n in names}})
        summary = {
            n: {
                "old_min": min(olds[n]), "new_min": min(news[n]),
                "speedup": round(min(olds[n]) / min(news[n]), 3),
                "old_runs": olds[n], "new_runs": news[n],
            }
            for n in names
        }
        print(json.dumps({"old_commit": args.old_commit, "sf": args.sf,
                          "summary": summary, "pairs": pair_log}, indent=1))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", str(wt)],
                       cwd=REPO, capture_output=True)
    return 0


if __name__ == "__main__":
    main()
