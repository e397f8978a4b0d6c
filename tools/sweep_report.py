#!/usr/bin/env python
"""Summarize driver_sim sweep results across scale factors.

Reads the /tmp/driver_sim_<sf>.json files that tools/driver_sim.py
writes (one row per registry query: green/red + wall_sec) and prints a
markdown summary for COVERAGE.md: green counts per SF, any reds, and
the queries whose wall time scales super-linearly between sf0.01 and
sf0.1 (rows grow 10×; anything growing >~20× in time deserves a
SCALE.md justification — sub-linear growth is expected because most of
the 0.01 time is fixed job-launch overhead).

Usage: python tools/sweep_report.py [sf001_json] [sf01_json]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    p001 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/driver_sim_sf0.01.json"
    p01 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/driver_sim_sf0.1.json"
    with open(p001) as f:
        r001 = json.load(f)
    with open(p01) as f:
        r01 = json.load(f)

    def ok(row: dict) -> bool:
        return bool(
            row.get("hash_match", row.get("rows_only", False))
        ) and not row.get("err")

    for tag, rep in (("sf0.01", r001), ("sf0.1", r01)):
        greens = sum(1 for r in rep.values() if ok(r))
        print(f"{tag}: {greens}/{len(rep)} green")
        for name, row in rep.items():
            if not ok(row):
                print(f"  RED {name}: {json.dumps(row)[:200]}")

    print("\nslowest at sf0.1:")
    slow = sorted(
        r01.items(), key=lambda kv: -kv[1].get("wall_sec", 0)
    )[:12]
    for name, row in slow:
        t001 = r001.get(name, {}).get("wall_sec", 0)
        t01 = row.get("wall_sec", 0)
        ratio = t01 / t001 if t001 else float("inf")
        print(f"  {name}: {t01:.2f}s (sf0.01 {t001:.2f}s, x{ratio:.1f})")

    print("\nsuper-linear (wall x>20 between sf0.01 and sf0.1):")
    n = 0
    for name, row in r01.items():
        t001 = r001.get(name, {}).get("wall_sec")
        t01 = row.get("wall_sec")
        if t001 and t01 and t01 > 20 * t001 and t01 > 2.0:
            print(f"  {name}: {t001:.2f}s -> {t01:.2f}s (x{t01 / t001:.1f})")
            n += 1
    if not n:
        print("  none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
