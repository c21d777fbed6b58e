"""ContextualFilter — the reference's per-field predicate builder.

The reference composes SQLAlchemy predicates from a list of
``(field, operator, value)`` triples ANDed or ORed together (public
path ``bpaotu/otu/query.py``, ``ContextualFilter`` — operators ``=``,
``!=``, ``<``, ``>``, ``between``, ``in``, string ``contains``,
``isnull``).

Here one :class:`Pred` spec emits BOTH the Spark ``Column`` predicate
and the equivalent ANSI-SQL text, so the engine plan and the DuckDB
oracle are generated from a single source of truth and cannot drift.

Scale: these predicates are plain Catalyst expressions, so every
supported operator (including ``contains`` via ``LIKE``) is pushed into
the parquet scan where the format supports it — the filter runs before
any shuffle at any data size.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Literal

import pyspark.sql.functions as F
from pyspark.sql import Column

Op = Literal["eq", "ne", "lt", "gt", "between", "in", "contains", "isnull", "notnull"]

_OPS = {"eq", "ne", "lt", "gt", "between", "in", "contains", "isnull", "notnull"}


@dataclass(frozen=True)
class Pred:
    """One contextual predicate: (field, operator, value)."""

    field: str
    op: Op
    value: Any = None

    def __post_init__(self) -> None:
        if self.op not in _OPS:
            raise ValueError(f"unsupported operator {self.op!r}; known: {sorted(_OPS)}")
        if self.op == "between" and (
            not isinstance(self.value, (tuple, list)) or len(self.value) != 2
        ):
            raise ValueError("between needs a (lo, hi) pair")
        if self.op == "in" and not isinstance(self.value, (tuple, list)):
            raise ValueError("in needs a list of values")

    # -- Spark side ---------------------------------------------------------

    def column(self) -> Column:
        c = F.col(self.field)
        if self.op == "eq":
            return c == F.lit(self.value)
        if self.op == "ne":
            return c != F.lit(self.value)
        if self.op == "lt":
            return c < F.lit(self.value)
        if self.op == "gt":
            return c > F.lit(self.value)
        if self.op == "between":
            lo, hi = self.value
            return c.between(F.lit(lo), F.lit(hi))
        if self.op == "in":
            return c.isin(list(self.value))
        if self.op == "contains":
            return c.contains(str(self.value))
        if self.op == "isnull":
            return c.isNull()
        return c.isNotNull()

    # -- SQL side -----------------------------------------------------------

    def sql(self) -> str:
        f = self.field
        if self.op == "eq":
            return f"{f} = {_sql_lit(self.value)}"
        if self.op == "ne":
            return f"{f} != {_sql_lit(self.value)}"
        if self.op == "lt":
            return f"{f} < {_sql_lit(self.value)}"
        if self.op == "gt":
            return f"{f} > {_sql_lit(self.value)}"
        if self.op == "between":
            lo, hi = self.value
            return f"{f} BETWEEN {_sql_lit(lo)} AND {_sql_lit(hi)}"
        if self.op == "in":
            return f"{f} IN ({', '.join(_sql_lit(v) for v in self.value)})"
        if self.op == "contains":
            # LIKE wildcards in the needle are literal for contains();
            # ESCAPE must be declared explicitly — backslash is NOT the
            # default escape char in ANSI SQL (found by hypothesis).
            esc = (
                str(self.value)
                .replace("\\", "\\\\")
                .replace("%", r"\%")
                .replace("_", r"\_")
                .replace("'", "''")
            )
            return f"{f} LIKE '%{esc}%' ESCAPE '\\'"
        if self.op == "isnull":
            return f"{f} IS NULL"
        return f"{f} IS NOT NULL"


def _sql_lit(v: Any) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # Numeric literals parse as DECIMAL in ANSI engines — even inside
        # CAST(x AS DOUBLE) — and the DECIMAL hop rounds (hypothesis found
        # -99.99999999999999 collapsing to -100.0). Casting the STRING
        # form goes straight to double and round-trips repr() exactly.
        return f"CAST('{v!r}' AS DOUBLE)"
    return str(v)


@dataclass(frozen=True)
class ContextualFilter:
    """AND/OR combination of :class:`Pred` (reference ContextualFilter)."""

    preds: tuple[Pred, ...]
    mode: Literal["and", "or"] = "and"

    @staticmethod
    def of(preds: Iterable[Pred], mode: str = "and") -> "ContextualFilter":
        return ContextualFilter(tuple(preds), mode)  # type: ignore[arg-type]

    def column(self) -> Column:
        cols = [p.column() for p in self.preds]
        if not cols:
            return F.lit(True)
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if self.mode == "and" else (out | c)
        return out

    def sql(self) -> str:
        if not self.preds:
            return "TRUE"
        joiner = " AND " if self.mode == "and" else " OR "
        return joiner.join(f"({p.sql()})" for p in self.preds)
