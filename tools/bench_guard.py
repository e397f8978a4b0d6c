"""Compare a fresh bench.py run against a recorded BENCH_r{N}.json and
flag per-query regressions beyond a threshold — run before snapshotting
a round so a plan change that silently de-optimized a headline query
(lost broadcast, new shuffle, dropped pushdown) is caught while the
diff is still small.

Usage: python tools/bench_guard.py [baseline_json] [threshold]
         baseline_json defaults to BENCH_r03.json (the newest recorded
         round — the regression floor), threshold to 1.5×.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    baseline_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "BENCH_r03.json"
    )
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    with open(baseline_path) as f:
        rec = json.load(f)
    base = rec.get("parsed", rec).get("queries", {})

    out = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py")],
        capture_output=True, text=True, timeout=1200,
    )
    if out.returncode != 0:
        print(f"bench.py exited {out.returncode}", file=sys.stderr)
        print(out.stderr, file=sys.stderr)
        return 2
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')
    ]
    if not lines:
        print("bench.py printed no metric line", file=sys.stderr)
        print(out.stderr, file=sys.stderr)
        return 2
    cur = json.loads(lines[-1])["queries"]

    flags = []
    for q, t0 in sorted(base.items()):
        t1 = cur.get(q)
        if t1 is None:
            flags.append(f"MISSING  {q} (was {t0:.4f}s)")
        elif t1 > t0 * threshold and t1 - t0 > 0.05:
            flags.append(f"SLOWER   {q}: {t0:.4f}s -> {t1:.4f}s")
    for q in sorted(set(cur) - set(base)):
        print(f"new      {q}: {cur[q]:.4f}s")
    for fl in flags:
        print(fl)
    print(f"\n{len(flags)} flagged vs {os.path.basename(baseline_path)}"
          f" (threshold {threshold}x)")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
