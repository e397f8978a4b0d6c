"""Chunked full-registry value-verification sweep at derived sf1.

VERDICT r4 ask #7 (full-registry sf1 evidence) + VERDICT r6 ask #4
(crash isolation): running hundreds of queries in one ``driver_sim``
process risks losing everything to one pathological query — in r6 a
single OOM red-cascaded 57 rows (``sweeps/r6sf1_seg3_77q.json``).  This
wrapper instead:

- **auto-routes** the heavy dedup/graph names (exactly the keys of
  ``tools/heavy_oracle.GROUND_TRUTH`` — no operator memory involved) to
  ``tools/heavy_oracle.py``, whose pure-Python fixture oracle computes
  ground truth in seconds where a DuckDB SQL replay is slow;
- runs every other name in fixed-size ``driver_sim`` subprocess chunks
  under a wall timeout;
- **isolates crashes to one row**: when a chunk subprocess dies
  (non-zero exit without a complete artifact, signal kill, timeout),
  its names are re-run ONE PER SUBPROCESS, so a JVM blow-up costs
  exactly the query that caused it — every innocent name gets its own
  fresh JVM and a fair verdict;
- rolls every per-chunk artifact up into a single
  ``sweeps/{label}_{tag}_rollup_{n}q.json`` with a per-name verdict
  (green / red / crashed / timeout), the one file that answers
  "did the full registry verify at this scale?".

Self-test for the isolation path (the r6 failure shape, reproduced):

    DRIVER_SIM_CRASH_AFTER=<name> python tools/sf1_sweep.py <sf_dir>

makes ``driver_sim`` hard-exit (os._exit 137, an OOM-kill look-alike)
right after finishing <name>; the sweep must report <name> crashed and
every other name green — one red row, no cascade.

Usage: python tools/sf1_sweep.py [sf_dir] [chunk_timeout_sec] [name ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multisql_spark.queries import load_all

HERE = os.path.dirname(os.path.abspath(__file__))
SWEEPS = os.path.join(os.path.dirname(HERE), "sweeps")
CHUNK = 25


def _heavy_names() -> set[str]:
    """The fixture-oracle names, read from heavy_oracle itself so the
    routing can never drift from what that tool actually covers."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "heavy_oracle", os.path.join(HERE, "heavy_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.GROUND_TRUTH)


def _artifact_path(label: str, tag: str, names: list[str], heavy: bool) -> str:
    seg = hashlib.sha256("\n".join(sorted(names)).encode()).hexdigest()[:8]
    mid = "heavyfix_" if heavy else ""
    return os.path.join(SWEEPS, f"{label}_{tag}_{mid}{len(names)}q_{seg}.json")


def _run(names: list[str], sf_dir: str, timeout: int, env: dict,
         heavy: bool = False) -> tuple[str, str | None]:
    """Run one subprocess over ``names``; returns (status, artifact).
    status: 'ok' (artifact complete — red rows inside are real verdicts),
    'timeout', or 'crashed' (died without a complete artifact)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    art = _artifact_path(env.get("SWEEP_LABEL", "adhoc"), tag, names, heavy)
    if os.path.exists(art):
        os.unlink(art)  # never trust a stale artifact for this name-set
    tool = "heavy_oracle.py" if heavy else "driver_sim.py"
    try:
        subprocess.run(
            [sys.executable, os.path.join(HERE, tool), sf_dir, *names],
            timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return "timeout", None
    if not os.path.exists(art):
        return "crashed", None
    try:
        with open(art) as f:
            done = json.load(f).get("queries", {})
    except Exception:
        return "crashed", None
    if set(names) - set(done):
        return "crashed", art  # partial artifact: process died mid-chunk
    return "ok", art


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_derived"
    chunk_timeout = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    only = set(sys.argv[3:])
    heavy_set = _heavy_names()
    names = [n for n in load_all() if not only or n in only]
    light = [n for n in names if n not in heavy_set]
    heavy = [n for n in names if n in heavy_set]
    jobs: list[tuple[list[str], bool]] = [
        (light[i : i + CHUNK], False) for i in range(0, len(light), CHUNK)
    ]
    if heavy:
        # one job for all fixture-oracle names: the corpus model build
        # dominates heavy_oracle's cost and is shared across them; on
        # any crash the fallback below still isolates one-per-process
        jobs.append((heavy, True))

    env = dict(os.environ)
    env.setdefault("SWEEP_LABEL", "sf1sweep")
    tag = os.path.basename(sf_dir.rstrip("/"))
    verdict: dict[str, dict] = {}

    def absorb(art: str | None, wanted: list[str]) -> None:
        if art is None:
            return
        with open(art) as f:
            rows = json.load(f).get("queries", {})
        for n in wanted:
            if n in rows:
                verdict[n] = rows[n]

    for i, (chunk, is_heavy) in enumerate(jobs):
        print(f"=== job {i + 1}/{len(jobs)} ({len(chunk)} queries, "
              f"{'fixture-oracle' if is_heavy else 'driver_sim'}) "
              f"{chunk[0]}..{chunk[-1]}", flush=True)
        status, art = _run(chunk, sf_dir, chunk_timeout, env, is_heavy)
        if status == "ok":
            absorb(art, chunk)
            continue
        absorb(art, chunk)  # partial artifact: keep finished verdicts
        pending = [n for n in chunk if n not in verdict]
        print(f"chunk {status}; isolating {len(pending)} names "
              f"one-per-subprocess", flush=True)
        for n in pending:
            s2, a2 = _run([n], sf_dir, chunk_timeout, env, is_heavy)
            if s2 == "ok":
                absorb(a2, [n])
            else:
                verdict[n] = {"err": f"subprocess {s2}", "isolated": True}
                print(f"    {s2.upper()} {n}", flush=True)

    def _green(row: dict) -> bool:
        return bool(
            row.get("hash_match", row.get("rows_only", False))
        ) and not row.get("err")

    greens = [n for n in names if _green(verdict.get(n, {}))]
    reds = [n for n in names if not _green(verdict.get(n, {}))]
    print(f"\n=== sweep done: {len(greens)}/{len(names)} green ===")
    if reds:
        print("red:", reds)
    os.makedirs(SWEEPS, exist_ok=True)
    out = os.path.join(
        SWEEPS, f"{env['SWEEP_LABEL']}_{tag}_rollup_{len(names)}q.json"
    )
    with open(out, "w") as f:
        json.dump(
            {
                "label": env["SWEEP_LABEL"],
                "sf": tag,
                "n_queries": len(names),
                "n_green": len(greens),
                "red": reds,
                "queries": verdict,
            },
            f, indent=1, default=str,
        )
    print(f"rollup artifact: {out}")
    return 1 if reds else 0


if __name__ == "__main__":
    sys.exit(main())
