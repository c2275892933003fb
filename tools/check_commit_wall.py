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

Usage: python tools/check_commit_wall.py [commit-ish]
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

_WALL_RE = re.compile(r"wall[^0-9\n]{0,12}(\d+(?:\.\d+)?)\s*s", re.I)
_ARTIFACT_RE = re.compile(r"(SWEEP_SF1_r\d+|BENCH_SF1_r\d+|BENCH_r\d+)\.json$")


def artifact_walls(path: str, ref: str) -> list[float]:
    """Wall numbers recorded in the artifact AS COMMITTED at ref."""
    blob = subprocess.run(
        ["git", "show", f"{ref}:{path}"], capture_output=True, text=True
    )
    if blob.returncode:
        return []
    d = json.loads(blob.stdout)
    walls: list[float] = []
    for k in ("wall_seconds", "value"):
        if isinstance(d.get(k), (int, float)):
            walls.append(float(d[k]))
    for r in d.get("runs", []) or []:
        if isinstance(r, (int, float)):
            walls.append(float(r))
    return walls


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    msg = subprocess.run(
        ["git", "log", "-1", "--format=%B", ref],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    quoted = [float(m.group(1)) for m in _WALL_RE.finditer(msg)]
    if not quoted:
        print(f"{ref}: no wall time quoted in the message — ok")
        return 0
    touched = subprocess.run(
        ["git", "show", "--name-only", "--format=", ref],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    walls: list[float] = []
    for p in touched:
        if _ARTIFACT_RE.search(p):
            walls.extend(artifact_walls(p, ref))
    bad = [
        q
        for q in quoted
        if not any(abs(q - w) <= 0.02 * max(w, 1.0) for w in walls)
    ]
    if bad:
        print(
            f"FAIL {ref}: message quotes wall(s) {bad} but the committed "
            f"artifacts record {sorted(set(round(w, 2) for w in walls))} — "
            "the message must describe the run it ships",
            file=sys.stderr,
        )
        return 1
    print(f"{ref}: {len(quoted)} quoted wall(s) match committed artifacts — ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
