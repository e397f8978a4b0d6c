"""Model-based parity for declared-``ANY`` columns: hypothesis drives a
random sequence of mixed-kind INSERT / UPDATE / DELETE statements
against BOTH the engine (VARIANT-backed Any column) and a plain-Python
model holding each value WITH its kind; after every mutation the table
contents — values AND their per-row Python types — must match.

Type identity is the whole point of ``ValueType::Any``
(``src/data/value/mod.rs:240``): ``1``, ``1.0`` and ``TRUE`` are equal
under Python ``==``, so the invariant compares ``(type, repr)`` pairs,
which would catch any silent coercion (the exact failure VARIANT exists
to prevent — e.g. Spark's VALUES type unification folding kinds to
string)."""

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


# quarters are exact in binary, so literal text == stored double
any_values = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-50, 50),
    st.integers(-20, 20).map(lambda k: k / 4.0),
    st.sampled_from(["a", "xyz", "it's", ""]),
)


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _key(v):
    return (type(v).__name__, repr(v))


class AnyColumnMachine(RuleBasedStateMachine):
    @initialize()
    def setup(self):
        self.glue = _GLUE
        self.glue.execute("DROP TABLE IF EXISTS anyprop")
        self.glue.execute(
            "CREATE TABLE anyprop (id INTEGER, x ANY NULL)"
        )
        self.model: dict[int, object] = {}
        self.next_id = 1

    @rule(vals=st.lists(any_values, min_size=1, max_size=3))
    def insert(self, vals):
        tuples = ", ".join(
            f"({self.next_id + i}, {_lit(v)})" for i, v in enumerate(vals)
        )
        self.glue.execute(f"INSERT INTO anyprop (id, x) VALUES {tuples}")
        for i, v in enumerate(vals):
            self.model[self.next_id + i] = v
        self.next_id += len(vals)

    @rule(v=any_values, data=st.data())
    def update_one(self, v, data):
        if not self.model:
            return
        target = data.draw(st.sampled_from(sorted(self.model)))
        self.glue.execute(
            f"UPDATE anyprop SET x = {_lit(v)} WHERE id = {target}"
        )
        self.model[target] = v

    @rule(data=st.data())
    def delete_one(self, data):
        if not self.model:
            return
        target = data.draw(st.sampled_from(sorted(self.model)))
        self.glue.execute(f"DELETE FROM anyprop WHERE id = {target}")
        del self.model[target]

    @invariant()
    def contents_and_kinds_match(self):
        got = {
            r[0]: r[1]
            for r in self.glue.execute("SELECT id, x FROM anyprop").rows
        }
        assert {k: _key(v) for k, v in got.items()} == {
            k: _key(v) for k, v in self.model.items()
        }


AnyColumnMachine.TestCase.settings = settings(
    max_examples=10,
    stateful_step_count=7,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def test_any_column_state_machine(glue):
    AnyColumnMachine.TestCase().runTest()
