"""Fail if the committed HEAD artifacts (CORRECTNESS_HEAD.json,
BENCH_HEAD.json) predate the newest source change.

Round-4 verdict: both artifacts were last regenerated before the round's
final two source commits, so the committed files claimed a state they no
longer evidenced. This check compares GIT COMMIT times (mtimes don't
survive checkout): the last commit touching each artifact must be no
older than the last commit touching any source the artifacts summarize.
Run it last in the round (or from CI) — exit 1 names the stale files.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = ["photon_spark", "bench.py", "__spark_entry__.py", "tools"]
ARTIFACTS = ["CORRECTNESS_HEAD.json", "BENCH_HEAD.json"]


def _last_commit_time(paths: list[str]) -> int:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--"] + paths,
        cwd=REPO, capture_output=True, text=True, check=True).stdout.strip()
    return int(out) if out else 0


def main() -> int:
    src_t = _last_commit_time(SOURCES)
    stale = []
    for a in ARTIFACTS:
        t = _last_commit_time([a])
        if t < src_t:
            stale.append((a, t, src_t))
    # uncommitted source changes also invalidate committed artifacts
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--"] + SOURCES,
        cwd=REPO, capture_output=True, text=True, check=True).stdout.strip()
    for a, t, s in stale:
        print(f"STALE {a}: artifact commit {t} < source commit {s} — "
              f"regenerate and commit it after the last source change")
    if dirty:
        print("DIRTY sources (uncommitted changes invalidate committed "
              "artifacts):\n" + dirty)
    if stale or dirty:
        return 1
    print(f"fresh: {', '.join(ARTIFACTS)} at/after last source commit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
