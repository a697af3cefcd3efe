"""Parse ``df.explain("formatted")`` output for plan assertions.

String-level parsing is deliberate: Spark exposes no stable Python API for
physical-plan details, and the formatted explain text IS the public,
version-stable surface (PushedFilters / ReadSchema / Exchange / BroadcastHashJoin
markers are documented behavior).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):  # public API: explain() prints to stdout
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-scan PushedFilters entries, flattened."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scans actually read (projection pruning)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            if ":" in field:
                cols.append(field.split(":")[0].strip())
    return cols


def _operator_ids(plan: str, op_pattern: str) -> set[str]:
    # formatted explain repeats operators in tree + details; operator ids
    # "(NN)" are unique, so count those instead of raw name occurrences
    return set(re.findall(op_pattern + r"[^(\n]*\((\d+)\)", plan))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (BroadcastExchange excluded)."""
    plan = formatted_plan(df)
    return len(_operator_ids(plan, r"(?<!Broadcast)\bExchange"))


def broadcast_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(_operator_ids(plan, r"Broadcast(?:Hash|NestedLoop)Join"))
