"""The driver-window rotation is self-maintaining: once a round's
CORRECTNESS file lands in the repo root, that round's window names stop
fronting automatically and never-checked names take their slots — a
stale ``_DRIVER_WINDOW`` can never waste certification capacity."""

from __future__ import annotations

from multisql_spark import queries as qmod


def test_current_window_fronts():
    # the expected front is state-dependent: the window minus names that
    # already hold a green official row, then never-checked names — so
    # landing a CORRECTNESS file can never redden this test
    specs = qmod.load_all()
    checked = qmod._officially_checked()
    expected = [n for n in qmod._DRIVER_WINDOW if n not in checked]
    head = list(specs)[:len(expected)]
    assert head == expected
    # past the window, only never-checked names until those run out
    tail = list(specs)[len(expected):]
    never = [n for n in tail if n not in checked]
    assert tail[:len(never)] == never
    # and the window itself holds only oracle-bearing queries
    assert all(specs[n].oracle for n in qmod._DRIVER_WINDOW)


def test_certified_window_names_yield_their_slots(monkeypatch):
    base = qmod._officially_checked()
    simulated = frozenset(base | set(qmod._DRIVER_WINDOW))
    monkeypatch.setattr(qmod, "_officially_checked", lambda: simulated)
    specs = qmod.load_all()
    never = [n for n in specs if n not in simulated]
    head = list(specs)[:len(never)]
    assert not (set(head) & set(qmod._DRIVER_WINDOW))
    assert all(n not in simulated for n in head)
    # nothing is lost: the full registry is still returned
    assert set(specs) == set(qmod.REGISTRY)


def test_on_disk_correctness_files_are_unioned(tmp_path):
    # the pinned per-round sets are a subset of what the disk scan finds
    checked = qmod._officially_checked()
    assert qmod._ROUND1_CHECKED <= checked
    assert qmod._ROUND2_CHECKED <= checked
    assert qmod._ROUND3_CHECKED <= checked
