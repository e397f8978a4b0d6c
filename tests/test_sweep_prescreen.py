"""Feasibility prescreen (VERDICT r9 ask #8): sf1_sweep projects each
name's output rows and wall from the largest prior-scale artifact and
routes over-cap outputs to the bigcompare path, recording hopeless names
as skipped-with-reason rows instead of silent absentees."""

from __future__ import annotations

import importlib.util
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "sf1_sweep", os.path.join(HERE, "tools", "sf1_sweep.py")
)
sw = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sw)


def test_scale_mult_parses_sweep_tags():
    assert sw._scale_mult("sf0.01") == 0.01
    assert sw._scale_mult("sf10_derived") == 10.0
    assert sw._scale_mult("sf1000_derived") == 1000.0
    # bench artifacts carry a bare float "sf" — ignored, never crashes
    assert sw._scale_mult(0.1) is None
    assert sw._scale_mult("bogus") is None
    assert sw._scale_mult(None) is None


def test_prescreen_classification(monkeypatch):
    stats = {
        "tiny": (100.0, 5_000, 12.0),          # -> run
        "bigout": (100.0, 9_000_000, 120.0),   # 90M rows -> bigcompare
        "hopeless": (100.0, 30_000_000, 1_300.0),  # rows AND wall -> skip
        "slow": (100.0, 1_000, 700.0),         # 7000s wall -> skip
    }
    monkeypatch.setattr(sw, "_prior_stats", lambda mult: stats)
    run, big, skipped = sw._prescreen(
        ["tiny", "bigout", "hopeless", "slow", "nostats"],
        1000.0,
        pandas_cap=20_000_000,
        wall_cap=1800.0,
    )
    assert run == ["tiny", "nostats"]  # no prior stats -> attempt
    assert big == ["bigout"]
    assert set(skipped) == {"hopeless", "slow"}
    assert "bigcompare" in skipped["hopeless"]
    assert "wall" in skipped["slow"]
