"""Model-based DML parity: hypothesis drives a random sequence of
INSERT / UPDATE / DELETE / TRUNCATE statements against BOTH the engine
and a plain-Python row-list model; after every mutation the full table
contents must match the model exactly.

This is the stateful counterpart of the expression/join property suites:
single-statement corpus tests can't catch interactions (e.g. UPDATE
after TRUNCATE resets, DELETE with a predicate over a column an earlier
UPDATE rewrote, AUTO_INCREMENT continuing across deletes), which is
where a statement router with per-table managed state would break."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    rule,
)

from multisql_spark.session import MultiSQLSession

_GLUE = None


@pytest.fixture(scope="module")
def glue(spark):
    global _GLUE
    _GLUE = MultiSQLSession(spark)
    return _GLUE


class DmlMachine(RuleBasedStateMachine):
    @initialize()
    def setup(self):
        self.glue = _GLUE
        self.glue.execute("DROP TABLE IF EXISTS dmlprop")
        self.glue.execute(
            "CREATE TABLE dmlprop"
            " (id INTEGER AUTO_INCREMENT, v INTEGER NULL, s TEXT NULL)"
        )
        self.model: list[tuple[int, int | None, str | None]] = []
        self.next_id = 1

    @rule(
        v=st.one_of(st.none(), st.integers(-50, 50)),
        s=st.one_of(st.none(), st.sampled_from(["a", "b", "xyz", ""])),
    )
    def insert(self, v, s):
        lit_v = "NULL" if v is None else str(v)
        lit_s = "NULL" if s is None else f"'{s}'"
        self.glue.execute(
            f"INSERT INTO dmlprop (v, s) VALUES ({lit_v}, {lit_s})"
        )
        self.model.append((self.next_id, v, s))
        self.next_id += 1

    @rule(threshold=st.integers(-40, 40), delta=st.integers(-5, 5))
    def update_where(self, threshold, delta):
        self.glue.execute(
            f"UPDATE dmlprop SET v = v + {delta}"
            f" WHERE v > {threshold}"
        )
        self.model = [
            (i, v + delta if (v is not None and v > threshold) else v, s)
            for i, v, s in self.model
        ]

    @rule(s=st.sampled_from(["a", "b", "xyz"]))
    def update_text(self, s):
        self.glue.execute(
            f"UPDATE dmlprop SET s = '{s.upper()}' WHERE s = '{s}'"
        )
        self.model = [
            (i, v, s.upper() if ms == s else ms) for i, v, ms in self.model
        ]

    @rule(threshold=st.integers(-40, 40))
    def delete_where(self, threshold):
        self.glue.execute(f"DELETE FROM dmlprop WHERE v < {threshold}")
        self.model = [
            (i, v, s)
            for i, v, s in self.model
            if not (v is not None and v < threshold)
        ]

    @rule()
    def truncate(self):
        self.glue.execute("TRUNCATE TABLE dmlprop")
        self.model = []
        self.next_id = 1  # reference resets the counter on TRUNCATE

    @invariant()
    def contents_match(self):
        got = sorted(
            tuple(r) for r in self.glue.execute(
                "SELECT id, v, s FROM dmlprop"
            ).rows
        )
        assert got == sorted(self.model)


DmlMachine.TestCase.settings = settings(
    max_examples=12,
    stateful_step_count=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def test_dml_state_machine(glue):
    DmlMachine.TestCase().runTest()
