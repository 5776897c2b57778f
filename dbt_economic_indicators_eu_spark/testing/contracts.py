"""Model contract enforcement — OP-TEST-CONTRACT.

Reference: ``contract={'enforced': true}`` on every mart
(dim_country.sql:5, fct_economic_indicators.sql:7,
rpt_annual_economic_summary.sql:5; declared columns
``_marts__models.yml:13-18`` etc.). dbt fails the build at compile time
when the model's output schema deviates from the declared contract —
here we compare the *analyzed* Catalyst schema before any write, which
is the same guarantee (no job is launched for a schema check).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql.types import StructType


class ContractViolation(Exception):
    pass


class ContractProblem(NamedTuple):
    """One structured violation — programmatic consumers (e.g. the
    contract_check query's coherence cross-check) key on ``name``/
    ``kind`` instead of parsing the human-readable message."""

    name: str  # column name
    kind: str  # 'missing' | 'type' | 'nullability' | 'unexpected' | 'duplicate'
    detail: str  # human-readable message

    def __str__(self) -> str:  # keeps "; ".join(problems) readable
        return self.detail


def diff_contract_structured(
    actual: StructType, declared: StructType
) -> list[ContractProblem]:
    """Structured list of violations (empty = conforming).

    Checks: missing / unexpected columns, type mismatches (exact
    simpleString equality — contracts are exact in dbt), and declared
    not-null columns that are nullable in the plan.
    """
    problems: list[ContractProblem] = []
    # a plan CAN legally carry the same output name twice (e.g. the
    # same column selected from both sides of a join); the dict below
    # would silently keep only the last — surface it as a violation
    # here, where the model name is known, instead of the opaque
    # duplicate-column error the parquet writer raises later
    seen: set[str] = set()
    for f in actual.fields:
        if f.name in seen:
            problems.append(
                ContractProblem(
                    f.name, "duplicate", f"duplicate output column {f.name!r}"
                )
            )
        seen.add(f.name)
    actual_by_name = {f.name: f for f in actual.fields}
    declared_by_name = {f.name: f for f in declared.fields}
    for name, decl in declared_by_name.items():
        act = actual_by_name.get(name)
        if act is None:
            problems.append(
                ContractProblem(name, "missing", f"missing column {name!r}")
            )
            continue
        if act.dataType.simpleString() != decl.dataType.simpleString():
            problems.append(
                ContractProblem(
                    name,
                    "type",
                    f"column {name!r}: type {act.dataType.simpleString()} != declared "
                    f"{decl.dataType.simpleString()}",
                )
            )
        if not decl.nullable and act.nullable:
            problems.append(
                ContractProblem(
                    name,
                    "nullability",
                    f"column {name!r}: nullable but declared not null",
                )
            )
    for name in actual_by_name:
        if name not in declared_by_name:
            problems.append(
                ContractProblem(name, "unexpected", f"unexpected column {name!r}")
            )
    return problems


def diff_contract(actual: StructType, declared: StructType) -> list[str]:
    """Human-readable view of ``diff_contract_structured``."""
    return [p.detail for p in diff_contract_structured(actual, declared)]


def enforce_contract(actual: StructType, declared: StructType, model_name: str = "?") -> None:
    problems = diff_contract(actual, declared)
    if problems:
        raise ContractViolation(f"model {model_name!r}: " + "; ".join(problems))
