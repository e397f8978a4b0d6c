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

import glob
import hashlib
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multisql_spark.queries import load_all

HERE = os.path.dirname(os.path.abspath(__file__))
SWEEPS = os.path.join(os.path.dirname(HERE), "sweeps")
CHUNK = 25


def _scale_mult(tag: object) -> float | None:
    m = re.match(r"sf([0-9]+(?:\.[0-9]+)?)", str(tag or ""))
    return float(m.group(1)) if m else None


def _prior_stats(target_mult: float) -> dict[str, tuple[float, int, float]]:
    """Per name, (scale_mult, spark_rows, wall_sec) from the LARGEST
    already-swept scale below the target — the r9 feasibility method
    (rank candidates by prior-scale output size and wall), now read by
    the sweep itself instead of relying on operator discipline
    (VERDICT r9 ask #8)."""
    best: dict[str, tuple[float, int, float]] = {}
    for f in glob.glob(os.path.join(SWEEPS, "*.json")):
        try:
            with open(f) as fh:
                d = json.load(fh)
        except Exception:
            continue
        mult = _scale_mult(d.get("sf", ""))
        if mult is None or mult >= target_mult:
            continue
        for n, row in (d.get("queries") or {}).items():
            if not isinstance(row, dict) or "spark_rows" not in row:
                continue
            rows = row.get("spark_rows")
            if rows is None:
                continue
            if n not in best or mult > best[n][0]:
                best[n] = (mult, int(rows), float(row.get("wall_sec") or 0))
    return best


def _prescreen(
    names: list[str],
    target_mult: float,
    pandas_cap: int,
    wall_cap: float,
) -> tuple[list[str], list[str], dict[str, str]]:
    """Split ``names`` into (pandas-path, bigcompare-path, skipped) by
    linear projection from the largest prior-scale artifact.  Linear is
    a LOWER bound for super-linear ops (windows, pair scans), so a
    projected breach is a real breach."""
    stats = _prior_stats(target_mult)
    run, big, skipped = [], [], {}
    for n in names:
        st = stats.get(n)
        if st is None:
            run.append(n)
            continue
        pm, prows, pwall = st
        ratio = target_mult / pm
        proj_rows = prows * ratio
        proj_wall = pwall * ratio
        if proj_rows > pandas_cap:
            if proj_wall > 4 * wall_cap:
                skipped[n] = (
                    f"prescreen: projected ~{proj_rows / 1e6:.0f}M output "
                    f"rows AND ~{proj_wall:.0f}s wall (prior {prows} rows "
                    f"/ {pwall:.0f}s at {pm}x) — infeasible even via "
                    f"bigcompare"
                )
            else:
                big.append(n)
        elif proj_wall > wall_cap:
            skipped[n] = (
                f"prescreen: projected ~{proj_wall:.0f}s wall > cap "
                f"{wall_cap:.0f}s (prior {pwall:.0f}s at {pm}x)"
            )
        else:
            run.append(n)
    return run, big, skipped


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
         heavy: bool = False, bigcompare: bool = False) -> tuple[str, str | None]:
    """Run one subprocess over ``names``; returns (status, artifact).
    status: 'ok' (artifact complete — red rows inside are real verdicts),
    'timeout', or 'crashed' (died without a complete artifact)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    art = _artifact_path(env.get("SWEEP_LABEL", "adhoc"), tag, names, heavy)
    if os.path.exists(art):
        os.unlink(art)  # never trust a stale artifact for this name-set
    tool = "heavy_oracle.py" if heavy else "driver_sim.py"
    if bigcompare:
        env = dict(env)
        env["DRIVER_SIM_BIG"] = ",".join(names)
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

    skipped: dict[str, str] = {}
    bigs: list[str] = []
    if os.environ.get("SWEEP_PRESCREEN") == "1":
        tmult = _scale_mult(os.path.basename(sf_dir.rstrip("/")))
        if tmult is not None:
            pandas_cap = int(
                os.environ.get("SWEEP_PANDAS_CAP", 20_000_000)
            )
            wall_cap = float(
                os.environ.get("SWEEP_WALL_CAP", chunk_timeout)
            )
            kept, bigs, skipped = _prescreen(
                names, tmult, pandas_cap, wall_cap
            )
            # fixture-oracle names can't bigcompare (no SQL oracle to
            # replay in DuckDB) — a projected-huge heavy output is a skip
            for n in [b for b in bigs if b in heavy_set]:
                bigs.remove(n)
                skipped[n] = (
                    "prescreen: projected output exceeds the pandas cap "
                    "and the fixture oracle has no bigcompare path"
                )
            names = [n for n in names if n not in skipped]
            for n, why in skipped.items():
                print(f"SKIP {n}: {why}", flush=True)
        else:
            kept = names
    else:
        kept = names
    light = [n for n in kept if n not in heavy_set and n not in bigs]
    heavy = [n for n in kept if n in heavy_set and n not in bigs]
    # (chunk, is_heavy, is_big): big-output names run ONE per subprocess
    # through driver_sim's exceptall_parquet compare — nothing row-scale
    # crosses the driver, DuckDB spills the set-op under the oracle caps
    jobs: list[tuple[list[str], bool, bool]] = [
        (light[i : i + CHUNK], False, False)
        for i in range(0, len(light), CHUNK)
    ]
    jobs.extend(([b], False, True) for b in bigs)
    if heavy:
        # one job for all fixture-oracle names: the corpus model build
        # dominates heavy_oracle's cost and is shared across them; on
        # any crash the fallback below still isolates one-per-process
        jobs.append((heavy, True, False))

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

    for i, (chunk, is_heavy, is_big) in enumerate(jobs):
        kind = (
            "fixture-oracle" if is_heavy
            else "bigcompare" if is_big
            else "driver_sim"
        )
        print(f"=== job {i + 1}/{len(jobs)} ({len(chunk)} queries, "
              f"{kind}) {chunk[0]}..{chunk[-1]}", flush=True)
        status, art = _run(chunk, sf_dir, chunk_timeout, env, is_heavy,
                           is_big)
        if status == "ok":
            absorb(art, chunk)
            continue
        absorb(art, chunk)  # partial artifact: keep finished verdicts
        pending = [n for n in chunk if n not in verdict]
        print(f"chunk {status}; isolating {len(pending)} names "
              f"one-per-subprocess", flush=True)
        for n in pending:
            s2, a2 = _run([n], sf_dir, chunk_timeout, env, is_heavy,
                          is_big)
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
    print(f"\n=== sweep done: {len(greens)}/{len(names)} green, "
          f"{len(skipped)} prescreen-skipped ===")
    if reds:
        print("red:", reds)
    for n, why in skipped.items():
        verdict[n] = {"skipped": why}
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
                "skipped": skipped,
                "queries": verdict,
            },
            f, indent=1, default=str,
        )
    print(f"rollup artifact: {out}")
    return 1 if reds else 0


if __name__ == "__main__":
    sys.exit(main())
