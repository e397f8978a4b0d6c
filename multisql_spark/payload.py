"""Typed statement results — the reference's ``Payload`` enum
(``src/executor/execute.rs:37-52``) re-expressed as a Python dataclass.

Variants: Success, Create, Insert(n), Select{labels, rows}, Delete(n),
Update(n), DropTable, AlterTable, TruncateTable (+ our extensions:
CreateView, CreateIndex, CreateDatabase, SetVariable, Explain).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


def _native(v):
    """Collapse Spark VARIANT cells to native Python values.

    VARIANT backs the reference's ``Value::Any`` dynamic typing (mixed-
    branch IIF — see dialect._xform_iif): each row carries its own type,
    so ``IIF(1=1, 'String', 1)`` surfaces the Python str ``'String'``
    and ``IIF(0=1, 'String', 1)`` the int ``1``, exactly the reference's
    per-row result."""
    try:
        from pyspark.sql.types import VariantVal
    except ImportError:  # older Spark: no VARIANT, nothing to collapse
        return v
    if isinstance(v, VariantVal):
        return v.toPython()
    return v


@dataclass
class Payload:
    kind: str  # Select | Insert | Update | Delete | Create | ...
    labels: list[str] = field(default_factory=list)
    rows: list[tuple] = field(default_factory=list)
    count: int = 0  # affected-row count for DML
    dataframe: Any = None  # lazily-evaluated DataFrame for Select

    # -- constructors ------------------------------------------------------
    @classmethod
    def select(cls, df) -> "Payload":
        collected = df.collect()
        return cls(
            kind="Select",
            labels=list(df.columns),
            rows=[tuple(_native(v) for v in r) for r in collected],
            count=len(collected),
            dataframe=df,
        )

    @classmethod
    def affected(cls, kind: str, n: int) -> "Payload":
        return cls(kind=kind, count=n)

    @classmethod
    def success(cls, kind: str = "Success") -> "Payload":
        return cls(kind=kind)

    # -- converters (reference src/glue/select.rs:14-82) -------------------
    def as_json(self) -> str:
        return json.dumps(
            [dict(zip(self.labels, row)) for row in self.rows],
            default=str,
        )

    def as_string(self) -> list[list[str]]:
        """[labels] + rows with every cell cast to its string form
        (reference select_as_string, src/glue/select.rs:37-56)."""

        def cell(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        return [list(self.labels)] + [
            [cell(v) for v in row] for row in self.rows
        ]

    def as_csv(self) -> str:
        import csv
        import io

        buf = io.StringIO()
        # \n rows like the reference's select_as_csv (src/glue/select.rs)
        writer = csv.writer(buf, lineterminator="\n")
        writer.writerow(self.labels)
        writer.writerows(self.rows)
        return buf.getvalue()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.kind == "Select":
            return f"Payload.Select({self.labels}, {len(self.rows)} rows)"
        return f"Payload.{self.kind}({self.count})"
