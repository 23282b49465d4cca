#!/usr/bin/env python
"""Emit next round's rotation lists for queries/__init__.py.

Reads every CORRECTNESS_r*.json against the current registry and prints
ready-to-paste Python:

  - `_RECHECK_FIRST`-style list of any non-green driver rows (errs /
    mismatches / rows-only) — these must re-enter the window first;
  - the never-driver-checked names in registration order (the window
    candidates — split them into the next-round front and the
    round-after head by hand, pinning high-impact families);
  - the `_DRIVER_GREEN` set literal (cumulative green union), wrapped to
    the repo's line width.

The rotation itself stays hand-curated (ordering encodes judgement about
which unproven families matter most) — this tool removes the mechanical
transcription that cost round 3 its window (VERDICT r03: the round-4
rotation TODO was left unbuilt, so a driver run would have re-checked 50
already-green rows).

Usage: python tools/build_rotation.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def _wrap_set_literal(names: list[str], indent: str = "    ", width: int = 78) -> str:
    lines: list[str] = []
    line = indent
    for n in names:
        tok = f'"{n}", '
        if len(line) + len(tok) > width and line.strip():
            lines.append(line.rstrip())
            line = indent
        line += tok
    if line.strip():
        lines.append(line.rstrip())
    return "\n".join(lines)


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, root)
    from chainhouse_spark.queries import QUERIES  # noqa: E402

    # Carry-over obligation: queries whose OUTPUT changed in a prior round
    # but fell outside that round's ~50-row driver window. They hold STALE
    # green rows and must lead the next rotation before anything else.
    try:
        from chainhouse_spark.queries import _STALE_CARRYOVER  # noqa: E402
        if _STALE_CARRYOVER:
            print("# !! CARRY-OVER: these output-changed queries hold stale")
            print("# !! green rows — they MUST lead the next rotation's front")
            print("# !! (see the _STALE_CARRYOVER comment in queries/__init__.py):")
            for n in _STALE_CARRYOVER:
                print(f"# !!   {n}")
            print()
    except ImportError:
        pass

    status: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name, rec in json.load(open(path)).items():
            if rec.get("err"):
                st = "err"
            elif rec.get("hash_match"):
                st = "green"
            elif rec.get("rows_match"):
                st = "rows-only"
            else:
                st = "mismatch"
            status[name] = (rnd, st)

    order = list(QUERIES)
    green = sorted(n for n in order if status.get(n, (0, ""))[1] == "green")
    recheck = [n for n in order if n in status and status[n][1] != "green"]
    never = [n for n in order if n not in status]

    print(f"# registered={len(order)} green={len(green)} "
          f"recheck={len(recheck)} never-checked={len(never)}\n")
    if recheck:
        print("# non-green driver rows — pin FIRST in the next window:")
        print("_RECHECK_FIRST = [")
        for n in recheck:
            rnd, st = status[n]
            print(f'    "{n}",  # r{rnd:02d}: {st}')
        print("]\n")
    if never:
        print("# never driver-checked, registration order — split into the")
        print("# next-round front (~50) and the round-after head:")
        print("_NEVER_CHECKED = [")
        for n in never:
            print(f'    "{n}",')
        print("]\n")
    print("# cumulative green union:")
    print("_DRIVER_GREEN = {")
    print(_wrap_set_literal(green))
    print("}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
