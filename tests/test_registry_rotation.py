"""The driver-window rotation is self-maintaining and list-free: once a
round's CORRECTNESS file lands in the repo root, its green names stop
fronting automatically (and their certification vintage refreshes);
never-checked and semantics-changed (``_RECERTIFY``) names take the
front; spare slots backfill with the STALEST certified names — there is
no literal window list left to go stale."""

from __future__ import annotations

from multisql_spark import queries as qmod


def test_uncertified_and_recertify_names_front():
    # the registry prefix is exactly the names without a current-tree
    # green row, in registration order — landing a CORRECTNESS file can
    # never redden this test, it just shrinks the prefix
    specs = qmod.load_all()
    checked = qmod._officially_checked()
    never = [n for n in qmod.REGISTRY if n not in checked]
    head = list(specs)[: len(never)]
    assert head == never
    # every fronted name must carry an oracle unless it is a streaming
    # sink (rows-only by design) — the front exists to win hash rows
    no_oracle = [
        n for n in head
        if specs[n].oracle is None and not n.startswith("stream_")
    ]
    assert not no_oracle, f"fronted queries without oracle: {no_oracle}"


def test_backfill_is_vintage_ordered():
    # after the front, certified names appear stalest-vintage-first with
    # registration order breaking ties
    specs = qmod.load_all()
    checked = qmod._officially_checked()
    vintage = qmod._certification_vintage()
    never = [n for n in qmod.REGISTRY if n not in checked]
    reg_pos = {n: i for i, n in enumerate(qmod.REGISTRY)}
    backfill = list(specs)[len(never) :]
    keys = [(vintage.get(n, 0), reg_pos[n]) for n in backfill]
    assert keys == sorted(keys)
    assert set(specs) == set(qmod.REGISTRY)


def test_recertify_names_front_until_fresh_row_lands(monkeypatch):
    # a _RECERTIFY name with only a pre-r7 green row fronts; simulate a
    # fresh green row at its recertify round and it must retire to backfill
    name = next(iter(qmod._RECERTIFY))
    assert name in qmod.REGISTRY
    base = qmod._certification_vintage()
    if base.get(name, 0) < qmod._RECERTIFY[name]:
        assert name not in qmod._officially_checked()
        never = [
            n for n in qmod.REGISTRY if n not in qmod._officially_checked()
        ]
        assert name in never
    simulated = dict(base)
    simulated[name] = qmod._RECERTIFY[name]
    monkeypatch.setattr(qmod, "_certification_vintage", lambda: simulated)
    assert name in qmod._officially_checked()


def test_certified_names_yield_their_slots(monkeypatch):
    # simulate the driver certifying everything currently fronted: the
    # next load_all() fronts nothing and the backfill covers the whole
    # registry, stalest first
    base = qmod._officially_checked()
    specs_now = qmod.load_all()
    never_now = [n for n in specs_now if n not in base]
    simulated = frozenset(base | set(never_now))
    monkeypatch.setattr(qmod, "_officially_checked", lambda: simulated)
    specs = qmod.load_all()
    assert set(specs) == set(qmod.REGISTRY)
    vintage = qmod._certification_vintage()
    reg_pos = {n: i for i, n in enumerate(qmod.REGISTRY)}
    keys = [(vintage.get(n, 0), reg_pos[n]) for n in specs]
    assert keys == sorted(keys)


def test_on_disk_correctness_files_are_unioned(tmp_path):
    # the pinned per-round sets are a subset of what the disk scan finds
    # (modulo names intentionally re-fronted by _RECERTIFY)
    checked = qmod._officially_checked()
    for names in (
        qmod._ROUND1_CHECKED, qmod._ROUND2_CHECKED, qmod._ROUND3_CHECKED
    ):
        assert names - checked <= set(qmod._RECERTIFY)
    vintage = qmod._certification_vintage()
    assert all(v >= 1 for v in vintage.values())
