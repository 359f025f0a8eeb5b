"""Round-end sweep gate (VERDICT r8 #3): refuse to close a round
unless docs/COVERAGE.md records a full clean oracle sweep at the
CURRENT code — the r8 hole was a post-sweep commit that changed the
oracle surface with only a commit-message claim of re-verification.

check_oracle.py stamps its summary line with the commit it ran
against (``SWEEP <sf_dir>: N/N ok, 0 FAIL @ <sha>``); the builder
copies those lines into docs/COVERAGE.md.  This gate accepts a
stamped sweep iff the stamp IS ``git rev-parse --short HEAD`` or is
an ancestor whose diff to HEAD touches only docs/markdown/round
artifacts (the sweep-recording commit itself cannot invalidate the
sweep it records; any code or test change can, and fails the gate).
A ``+dirty`` stamp never passes.  Run as the literal last check of a
round:

    python tools/sweep_gate.py            # expects sf0.01 + sf0.1

Exit 0 = both sweeps recorded at current code and clean; 1 otherwise.
"""

from __future__ import annotations

import re
import subprocess
import sys

REPO = "/root/repo"
REQUIRED_SFS = ("sf0.01", "sf0.1")
# paths a post-sweep commit may touch without invalidating the sweep
_DOC_ONLY = re.compile(
    r"^(docs/|.*\.md$|BENCH_r\d+\.json$|CORRECTNESS_r\d+\.json$"
    r"|COPYCHECK\.json$|LEAKCHECK\.json$)"
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _docs_only_since(stamp: str) -> bool:
    try:
        _git("merge-base", "--is-ancestor", stamp, "HEAD")
        changed = _git("diff", "--name-only", f"{stamp}..HEAD").splitlines()
    except subprocess.CalledProcessError:
        return False  # not an ancestor of HEAD (or unknown sha)
    return all(_DOC_ONLY.match(p) for p in changed if p)


def main() -> int:
    head = _git("rev-parse", "--short", "HEAD")
    if _git("status", "--porcelain"):
        print(
            "sweep_gate: working tree is dirty — commit (or stash)"
            " before gating the round.",
            file=sys.stderr,
        )
        return 1
    text = open(f"{REPO}/docs/COVERAGE.md").read()
    # every stamped sweep line in the log, e.g.
    #   SWEEP /root/testdata/sf0.01: 148/148 ok, 0 FAIL @ abc1234
    lines = re.findall(
        r"SWEEP\s+(\S*?(sf[0-9.]+))[:\s].*?(\d+)/(\d+) ok,\s*(\d+) FAIL"
        r"\s*@\s*`?([0-9a-f]{7,40}(?:\+dirty)?)`?",
        text,
    )
    ok: dict[str, tuple] = {}
    for _path, sf, good, total, fails, stamp in lines:
        if fails != "0" or good != total or stamp.endswith("+dirty"):
            continue
        if stamp == head or _docs_only_since(stamp):
            ok[sf.rstrip(".")] = (good, total, stamp)
    missing = [sf for sf in REQUIRED_SFS if sf not in ok]
    if missing:
        recorded = sorted({(sf, st) for _p, sf, *_r, st in lines})
        print(
            f"sweep_gate: HEAD is {head} but docs/COVERAGE.md has no"
            f" clean sweep for {missing} stamped at HEAD or at a"
            f" docs-only ancestor; stamped sweeps found: {recorded}",
            file=sys.stderr,
        )
        print(
            "sweep_gate: re-run `python tools/check_oracle.py"
            " /root/testdata/<sf>` at HEAD, paste its SWEEP line into"
            " docs/COVERAGE.md, commit, and re-gate BEFORE closing the"
            " round.",
            file=sys.stderr,
        )
        return 1
    for sf in REQUIRED_SFS:
        good, total, stamp = ok[sf]
        print(f"sweep_gate: {sf} {good}/{total} ok @ {stamp} (HEAD {head})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
