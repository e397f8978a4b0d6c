"""The driver-window rotation is self-maintaining and list-free: once a
round's CORRECTNESS file lands in the repo root, its green names stop
fronting automatically and never-checked names take their slots — there
is no literal window list left to go stale."""

from __future__ import annotations

from multisql_spark import queries as qmod


def test_never_certified_names_front():
    # the registry prefix is exactly the never-certified names in
    # registration order — landing a CORRECTNESS file can never redden
    # this test, it just shrinks the prefix
    specs = qmod.load_all()
    checked = qmod._officially_checked()
    never = [n for n in qmod.REGISTRY if n not in checked]
    head = list(specs)[: len(never)]
    assert head == never
    # immediately after: the oldest-certified re-confirmation tail
    tail = list(specs)[len(never) : len(never) + len(qmod._RECONFIRM_TAIL)]
    assert tail == [n for n in qmod._RECONFIRM_TAIL if n not in set(never)]
    # every fronted name must carry an oracle unless it is a streaming
    # sink (rows-only by design) — the front exists to win hash rows
    no_oracle = [
        n for n in head
        if specs[n].oracle is None and not n.startswith("stream_")
    ]
    assert not no_oracle, f"fronted queries without oracle: {no_oracle}"


def test_certified_names_yield_their_slots(monkeypatch):
    # simulate the driver certifying everything currently fronted: the
    # next load_all() must front only the re-confirmation tail (nothing
    # never-checked remains), and nothing is lost
    base = qmod._officially_checked()
    specs_now = qmod.load_all()
    never_now = [n for n in specs_now if n not in base]
    simulated = frozenset(base | set(never_now))
    monkeypatch.setattr(qmod, "_officially_checked", lambda: simulated)
    specs = qmod.load_all()
    head = list(specs)[: len(qmod._RECONFIRM_TAIL)]
    assert head == list(qmod._RECONFIRM_TAIL)
    assert set(specs) == set(qmod.REGISTRY)


def test_reconfirm_tail_well_formed():
    specs = qmod.load_all()
    assert len(set(qmod._RECONFIRM_TAIL)) == len(qmod._RECONFIRM_TAIL)
    missing = [n for n in qmod._RECONFIRM_TAIL if n not in specs]
    assert not missing, f"reconfirm names not in registry: {missing}"
    # the tail is drawn from round-1 vintage (oldest certifications)
    assert set(qmod._RECONFIRM_TAIL) <= qmod._ROUND1_CHECKED
    assert all(specs[n].oracle for n in qmod._RECONFIRM_TAIL)


def test_on_disk_correctness_files_are_unioned(tmp_path):
    # the pinned per-round sets are a subset of what the disk scan finds
    checked = qmod._officially_checked()
    assert qmod._ROUND1_CHECKED <= checked
    assert qmod._ROUND2_CHECKED <= checked
    assert qmod._ROUND3_CHECKED <= checked
