#!/usr/bin/env python
"""Cross-round driver-coverage tracker.

The round driver verifies ~50 queries per round (registration order) into
CORRECTNESS_r{N}.json. This tool unions every round's results against the
current registry and prints:

  - per-query status: green (hash match), weak (rows-only era), err, or
    never-driver-checked (with the round it was last checked in),
  - the registration-order position of each never-checked query (what to
    front-load next round — see the rotation note in queries/__init__.py).

Usage: python tools/correctness_coverage.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, root)
    from chainhouse_spark.queries import QUERIES  # noqa: E402

    status: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name, rec in json.load(open(path)).items():
            if rec.get("err"):
                st = f"err:{rec['err']}"
            elif rec.get("hash_match"):
                st = "green"
            elif rec.get("rows_match"):
                st = "rows-only"
            else:
                st = "MISMATCH"
            status[name] = (rnd, st)

    order = list(QUERIES)
    never = [n for n in order if n not in status]
    green = [n for n in order if status.get(n, (0, ""))[1] == "green"]
    bad = {n: s for n, s in status.items() if s[1] not in ("green",)}

    print(f"registered: {len(order)}  driver-green: {len(green)}  "
          f"never-checked: {len(never)}  non-green: {len(bad)}")
    if bad:
        print("\nnon-green driver rows:")
        for n, (rnd, st) in sorted(bad.items()):
            print(f"  r{rnd:02d} {st:12s} {n}")
    if never:
        print("\nnever driver-checked (registration position -> name):")
        for n in never:
            print(f"  #{order.index(n) + 1:3d} {n}")
        print("\nfront-load these in queries/__init__.py next round.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
