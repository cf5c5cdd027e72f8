#!/usr/bin/env python
"""One-command round-closing gate: the reproducible "ALL STRICT-OK"
sweep NOTES_r{N} cites.

Runs, in order, failing fast on the first non-zero exit:

  1. full pytest (tests/)
  2. tools/strict_verify.py over the FULL registry at sf0.01
  3. the same at sf0.1 (float/rounding boundaries are data-dependent)
  4. a driver-contract smoke: __spark_entry__.entry() returns rows and
     queries()/oracle_sql() keys line up

Usage:  python tools/round_close.py [--skip-pytest]
Exit 0 = every gate green; the summary line is what NOTES quotes.

The gate is anchored to a COMMIT (VERDICT r9 "what's wrong" #1: a
NOTES block claimed "no source change after the gate" while a later
commit had touched query source).  The tool refuses to run on a dirty
tree, prints the exact HEAD hash in the summary line, and NOTES_r{N}
must quote that hash; any commit after it that touches *.py outside
tools/ re-triggers the gate.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str], env: dict | None = None) -> None:
    import os

    t0 = time.time()
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    rc = subprocess.call(cmd, cwd=REPO, env=full_env)
    print(f"== {label}: rc={rc} ({time.time() - t0:.0f}s)", flush=True)
    if rc != 0:
        print(f"ROUND-CLOSE FAILED at {label}", flush=True)
        sys.exit(rc)


def main() -> None:
    skip_pytest = "--skip-pytest" in sys.argv
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    if dirty:
        print(
            "ROUND-CLOSE REFUSED: working tree is dirty — the gate "
            "anchors to a commit, so commit (or stash) first:\n" + dirty,
            flush=True,
        )
        sys.exit(2)
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    print(f"== gate tree: HEAD={head}", flush=True)
    if not skip_pytest:
        run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    run("strict sf0.01", [sys.executable, "tools/strict_verify.py"])
    run(
        "strict sf0.1",
        [sys.executable, "tools/strict_verify.py"],
        env={"SF_DIR": "/root/testdata/sf0.1"},
    )
    run(
        "driver contract",
        [
            sys.executable,
            "-c",
            (
                "import sys, importlib.util; sys.path.insert(0, '.');"
                "spec = importlib.util.spec_from_file_location("
                "'__spark_entry__', '__spark_entry__.py');"
                "m = importlib.util.module_from_spec(spec);"
                "spec.loader.exec_module(m);"
                "from aind_smartspim_data_transformation_spark.session import "
                "build_local_session;"
                "spark = build_local_session(cpus=8);"
                "rows = m.entry(spark).collect(); assert rows, 'entry empty';"
                "q = m.queries(); o = m.oracle_sql();"
                "missing = set(o) - set(q);"
                "assert not missing, f'oracles without queries: {missing}';"
                "print(f'entry rows={len(rows)} queries={len(q)} "
                "oracles={len(o)}')"
            ),
        ],
    )
    now_head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    if now_head != head:
        print(
            f"ROUND-CLOSE FAILED: HEAD moved during the gate "
            f"({head} -> {now_head}) — rerun on the final tree",
            flush=True,
        )
        sys.exit(3)
    # the tree must ALSO still be clean: uncommitted edits made while
    # the gate ran mean later steps executed against a tree that is
    # not commit {head} — exactly the spoof the anchor exists to stop
    now_dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    if now_dirty:
        print(
            "ROUND-CLOSE FAILED: tree became dirty during the gate — "
            "later steps did not run against the anchored commit:\n"
            + now_dirty,
            flush=True,
        )
        sys.exit(3)
    print(f"ROUND-CLOSE: ALL GREEN at {head}", flush=True)


if __name__ == "__main__":
    main()
