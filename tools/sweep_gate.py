"""Round-end sweep gate (VERDICT r8 #3): refuse to close a round
unless docs/COVERAGE.md records a full clean oracle sweep at the
CURRENT code — the r8 hole was a post-sweep commit that changed the
oracle surface with only a commit-message claim of re-verification.

check_oracle.py stamps its summary line with the commit it ran
against (``SWEEP <sf_dir>: N/N ok, 0 FAIL @ <sha>``) and marks
targeted runs ``SWEEP (subset) ...``.  This gate accepts a stamped
sweep iff it is UNMARKED, covers the full oracle surface
(total >= len(_registry())), and the stamp IS ``git rev-parse
--short HEAD`` or an ancestor whose diff to HEAD touches only
docs/markdown/round artifacts (the sweep-recording commit itself
cannot invalidate the sweep it records; any code or test change
can, and fails the gate).  A ``+dirty`` stamp never passes, and a
recorded FAILING full sweep at the shipped code blocks the round
even when an older clean line also qualifies.  Run as the literal
last check of a round:

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


def _expected_total() -> int | None:
    """Size of the full oracle surface, so a subset run (or a stale
    sweep of a smaller surface) can never satisfy the gate.  Returns
    None when the entry module won't import — the gate FAILS rather
    than falling back to a hardcoded size that goes stale every round
    (ADVICE r9: a stale fallback would let an old sweep of a smaller
    surface satisfy the gate from an env without PySpark)."""
    try:
        sys.path.insert(0, REPO)
        import __spark_entry__ as entrymod

        return len(entrymod._registry())
    except Exception:
        return None


def _blocking_dirt(porcelain_lines: list[str]) -> list[str]:
    """Which ``git status --porcelain`` lines dirty the gate.  The
    driver's own post-round flush leaves UNTRACKED round artifacts
    (BENCH_r*/CORRECTNESS_r*/COPYCHECK/LEAKCHECK) — files the
    ``_DOC_ONLY`` rule already deems unable to invalidate a sweep —
    so those are exempt; ANY tracked modification and any other
    untracked file (a stray ``.py`` especially) still block."""
    out = []
    for line in porcelain_lines:
        line = line.strip()  # _git() strips the first line's XY pad
        if not line:
            continue
        if line.startswith("?? ") and _DOC_ONLY.match(line[3:].strip()):
            continue
        out.append(line)
    return out


def main() -> int:
    head = _git("rev-parse", "--short", "HEAD")
    dirt = _blocking_dirt(_git("status", "--porcelain").splitlines())
    if dirt:
        print(
            "sweep_gate: working tree is dirty — commit (or stash)"
            f" before gating the round: {dirt}",
            file=sys.stderr,
        )
        return 1
    expected = _expected_total()
    if expected is None:
        print(
            "sweep_gate: cannot import __spark_entry__ to size the"
            " oracle surface — run the gate from an environment with"
            " PySpark (a hardcoded fallback would accept stale sweeps"
            " of a smaller surface).",
            file=sys.stderr,
        )
        return 1
    text = open(f"{REPO}/docs/COVERAGE.md").read()
    # every stamped sweep line in the log, e.g.
    #   SWEEP /root/testdata/sf0.01: 148/148 ok, 0 FAIL @ abc1234
    lines = re.findall(
        r"SWEEP\s+(\(subset\)\s+)?(\S*?(sf[0-9.]+))[:\s].*?"
        r"(\d+)/(\d+) ok,\s*(\d+) FAIL"
        r"\s*@\s*`?([0-9a-f]{7,40}(?:\+dirty)?)`?",
        text,
    )
    ok: dict[str, tuple] = {}
    bad: dict[str, str] = {}
    for subset, _path, sf, good, total, fails, stamp in lines:
        sf = sf.rstrip(".")
        at_code = not stamp.endswith("+dirty") and (
            stamp == head or _docs_only_since(stamp)
        )
        if not at_code or subset:
            continue
        if fails != "0" or good != total:
            # a FAILING full sweep recorded at the shipped code blocks
            # the round even when an older clean line also qualifies
            bad[sf] = f"{good}/{total} ok, {fails} FAIL @ {stamp}"
        elif int(total) >= expected:
            ok[sf] = (good, total, stamp)
    for sf, line in sorted(bad.items()):
        print(
            f"sweep_gate: {sf} has a FAILING sweep recorded at the"
            f" current code ({line}) — fix and re-sweep.",
            file=sys.stderr,
        )
    if bad:
        return 1
    missing = [sf for sf in REQUIRED_SFS if sf not in ok]
    if missing:
        recorded = sorted({(sf, st) for _m, _p, sf, *_r, st in lines})
        print(
            f"sweep_gate: HEAD is {head} but docs/COVERAGE.md has no"
            f" clean full-surface (>= {expected}) sweep for {missing}"
            f" stamped at HEAD or a docs-only ancestor; stamped sweeps"
            f" found: {recorded}",
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
