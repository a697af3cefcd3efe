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


def scan_count(df: DataFrame) -> int:
    """Number of parquet scan operators in the static plan. Persisted
    subtrees count their build scan once (InMemoryTableScan consumers add
    none), so this is also the per-execution file-read count once caches
    are warm."""
    plan = formatted_plan(df)
    return len(_operator_ids(plan, r"Scan parquet"))


def bnlj_count(df: DataFrame) -> int:
    """BroadcastNestedLoopJoin operators — the O(n·m) fallback. Anything
    beyond a documented 1-row crossJoin (scalar totals, query vectors) or
    an intentional theta join is a plan regression."""
    plan = formatted_plan(df)
    return len(_operator_ids(plan, r"BroadcastNestedLoopJoin"))


def _first_spec_arg(text: str, start: int) -> str:
    """First TOP-LEVEL argument of the call opening at ``start`` (index just
    past its '('): scan to the first comma at paren depth 0, so a leading
    ``specifiedwindowframe(a, b, c)`` is returned whole, commas and all."""
    depth = 0
    for i in range(start, len(text)):
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                return text[start:i]
            depth -= 1
        elif c == "," and depth == 0:
            return text[start:i]
    return text[start:]


def unpartitioned_window_count(df: DataFrame) -> int:
    """Window operators with an EMPTY partition spec — the shape that moves
    every row to one task (WindowExec's own WARN). Detected from the
    formatted explain's per-operator detail blocks: inside
    ``windowspecdefinition(...)`` a partitioned spec leads with its
    partition columns, while an unpartitioned spec leads with either an
    ordering expression (``... ASC/DESC NULLS ...``) or — when there is no
    ORDER BY at all, e.g. a global unordered aggregate window — directly
    with ``specifiedwindowframe(...)``. Every spec in the block is
    inspected (one Window operator can evaluate several specs); the
    operator counts once if ANY of its specs is unpartitioned."""
    plan = formatted_plan(df)
    count = 0
    for block in plan.split("\n\n"):
        lines = block.strip().splitlines()
        if not lines or not re.match(r"\(\d+\) Window", lines[0].strip()):
            continue
        for m in re.finditer(r"windowspecdefinition\(", block):
            first_arg = _first_spec_arg(block, m.end()).strip()
            if re.search(r" (?:ASC|DESC)\b", first_arg) or first_arg.startswith(
                "specifiedwindowframe("
            ):
                count += 1
                break
    return count


def single_partition_exchange_count(df: DataFrame) -> int:
    """Exchanges that funnel data through ONE partition. A scalar aggregate
    legitimately ships one row per upstream partition; anything larger
    (global sort without limit, unpartitioned window) is the classic
    scale-killer this counter exists to catch."""
    plan = formatted_plan(df)
    return plan.count("Arguments: SinglePartition")
