"""Fail if the committed HEAD artifacts (CORRECTNESS_HEAD.json,
BENCH_HEAD.json) predate the newest source change.

Round-4 verdict: both artifacts were last regenerated before the round's
final two source commits, so the committed files claimed a state they no
longer evidenced. Two independent checks (both must pass):

1. GIT COMMIT times (mtimes don't survive checkout): the last commit
   touching each artifact must be no older than the last commit touching
   any source the artifacts summarize. This alone is fooled by
   committing a stale artifact TOGETHER with the source edit it predates
   (same commit → same timestamp), hence:
2. CONTENT digest: ``--stamp`` (run immediately after regenerating the
   artifacts, before any further source edit) records the md5 of every
   source file plus each artifact's md5 in ARTIFACTS_DIGEST.json; verify
   mode recomputes both and fails on any mismatch — an artifact
   generated before a source edit cannot carry the post-edit digest,
   regardless of how the commits were batched.

Run ``--stamp`` right after regenerating artifacts, then commit all
three files together; run with no args to verify. Exit 1 names the
stale files.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = ["photon_spark", "bench.py", "__spark_entry__.py", "tools"]
ARTIFACTS = ["CORRECTNESS_HEAD.json", "BENCH_HEAD.json"]
DIGEST_FILE = "ARTIFACTS_DIGEST.json"


def _source_digest() -> str:
    h = hashlib.md5()
    for root in SOURCES:
        path = os.path.join(REPO, root)
        files = []
        if os.path.isdir(path):
            for dirpath, _dirs, names in os.walk(path):
                if "__pycache__" in dirpath:
                    continue
                files += [os.path.join(dirpath, n) for n in names
                          if n.endswith(".py")]
        elif os.path.exists(path):
            files = [path]
        for f in sorted(files):
            h.update(os.path.relpath(f, REPO).encode())
            with open(f, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


def _file_md5(path: str) -> str | None:
    full = os.path.join(REPO, path)
    if not os.path.exists(full):
        return None
    with open(full, "rb") as fh:
        return hashlib.md5(fh.read()).hexdigest()


def stamp() -> int:
    """Record the digests. REFUSES a partial stamp: every artifact must
    exist (the round-8 failure was a final commit that re-stamped BENCH
    but not CORRECTNESS — a stamp that silently recorded a missing or
    stale artifact would bless exactly that). Regenerate BOTH artifacts
    from the current tree, then stamp, then commit all three together
    and make no further source edits."""
    missing = [a for a in ARTIFACTS if _file_md5(a) is None]
    if missing:
        print(f"REFUSED: cannot stamp with missing artifacts: {missing} "
              "— regenerate them first")
        return 1
    payload = {
        "source_digest": _source_digest(),
        "artifacts": {a: _file_md5(a) for a in ARTIFACTS},
    }
    with open(os.path.join(REPO, DIGEST_FILE), "w") as fh:
        json.dump(payload, fh, indent=2, sort_keys=True)
    print(f"stamped {DIGEST_FILE}: source {payload['source_digest'][:12]}")
    for a, md5 in payload["artifacts"].items():
        print(f"  {a}: {md5[:12]}")
    print("NOTE: any further source edit re-invalidates this stamp — "
          "re-run the generators and --stamp again before the final "
          "commit")
    return 0


def _verify_digest() -> list[str]:
    path = os.path.join(REPO, DIGEST_FILE)
    if not os.path.exists(path):
        return [f"{DIGEST_FILE} missing — run --stamp after regenerating "
                f"artifacts"]
    with open(path) as fh:
        want = json.load(fh)
    errs = []
    got_src = _source_digest()
    if want.get("source_digest") != got_src:
        errs.append("source tree changed since artifacts were stamped — "
                    "regenerate CORRECTNESS_HEAD/BENCH_HEAD and re-stamp")
    for a, md5 in want.get("artifacts", {}).items():
        if _file_md5(a) != md5:
            errs.append(f"{a} differs from its stamped digest")
    return errs


def _last_commit_time(paths: list[str]) -> int:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--"] + paths,
        cwd=REPO, capture_output=True, text=True, check=True).stdout.strip()
    return int(out) if out else 0


def main() -> int:
    if "--stamp" in sys.argv[1:]:
        return stamp()
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
    digest_errs = _verify_digest()
    if not digest_errs and not dirty:
        # The digest proof is authoritative: sources unchanged since the
        # stamp and artifacts match their stamped hashes. Commit-time
        # ordering can false-positive here (a regenerated artifact whose
        # content is byte-identical never enters a new commit).
        print(f"fresh: {', '.join(ARTIFACTS)} match stamped digests for "
              f"the current source tree")
        return 0
    for a, t, s in stale:
        print(f"STALE {a}: artifact commit {t} < source commit {s} — "
              f"regenerate and commit it after the last source change")
    if dirty:
        print("DIRTY sources (uncommitted changes invalidate committed "
              "artifacts):\n" + dirty)
    for e in digest_errs:
        print(f"DIGEST {e}")
    if stale or dirty or digest_errs:
        return 1
    print(f"fresh: {', '.join(ARTIFACTS)} at/after last source commit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
