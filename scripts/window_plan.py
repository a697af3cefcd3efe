#!/usr/bin/env python
"""Compute the next driver-window rotation from the artifacts of record.

The correctness driver records exactly the first 50 ``queries()`` keys, so
each round the window must rotate to (a) queries with NO driver row yet
(late additions + carried overflow — they take priority), then (b) the
returners with the OLDEST rows of record. The r13→r14 lesson: a plan
drafted by hand before the round's last additions land goes stale; this
script derives the list from CORRECTNESS_r*.json + the live catalog, so
re-running it IS the arithmetic check.

Usage:
    PYTHONPATH=/root/repo python scripts/window_plan.py [--rewindow q ...]

Prints: never-witnessed queries (must lead the window), the oldest-first
returner list that fills the remaining slots, and the first-displaced
overflow. The current round's window members are assumed to earn rows
this round (the driver runs the first 50 keys).

--rewindow: names whose code/oracle changes this round. The ledger rule
(WINDOWS.md) says they re-window with priority, displacing returners
from the BACK of the selected list; passing them here applies that
displacement mechanically and prints the final ready-to-paste
_DRIVER_WINDOW tuple, so the arithmetic is never done by hand (the
r15 displacement of doc_quality/gopher_quality was the first manual
application; this flag automates the next one).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from savio_training_dask_2019_spark import queries as cat  # noqa: E402

WINDOW = 50


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows: dict[str, int] = {}
    order: dict[str, tuple[int, int]] = {}
    newest_round = 0
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        newest_round = max(newest_round, rnd)
        for i, k in enumerate(json.load(open(p))):
            if k not in rows or rnd > rows[k]:
                rows[k] = rnd
                order[k] = (rnd, i)

    allq = list(cat.QUERIES)
    # the CURRENT window earns rows when the driver closes this round
    this_round = newest_round + 1
    for i, q in enumerate(allq[:WINDOW]):
        rows[q] = this_round
        order[q] = (this_round, i)

    never = [q for q in allq if q not in rows]
    returners = sorted(
        (q for q in allq if q in rows and rows[q] < this_round),
        key=lambda q: order[q],
    )
    n_lead = 1 + len(never)  # flagship + never-witnessed
    n_fill = WINDOW - n_lead
    print(f"rounds seen: <= r{newest_round}; current window earns r{this_round} rows")
    if n_fill < 0:
        # never-witnessed alone overflow the window: the fitting prefix
        # (landing order) leads the next window, the rest carry over.
        # Landing order is only the DEFAULT carry choice — the ledger rule
        # (WINDOWS.md) lets the builder pick carries by judgment, e.g. by
        # strongest standalone pytest differentials (the r14 decision).
        fits, overflow = never[:WINDOW - 1], never[WINDOW - 1:]
        print(f"never-witnessed (lead the next window, after the flagship): {fits}")
        print(
            f"OVERFLOW: {len(never)} never-witnessed do not fit one window; "
            f"carry to the round after (default = landing order; a judgment "
            f"call may swap members — record it in WINDOWS.md): {overflow}"
        )
        print("returners filling the remaining 0 slots (oldest rows first):")
        print("first displaced if code changes re-window: [] "
              "(window is all never-witnessed; displacement hits the "
              "overflow carries instead)")
        return 0
    print(f"never-witnessed (lead the next window, after the flagship): {never}")
    fill = list(returners[:n_fill])

    rewindow: list[str] = []
    argv = sys.argv[1:]
    if "--rewindow" in argv:
        rewindow = argv[argv.index("--rewindow") + 1 :]
    unknown = [q for q in rewindow if q not in cat.QUERIES]
    if unknown:
        print(f"ERROR: --rewindow names not in the catalog: {unknown}")
        return 1
    displaced: list[str] = []
    for q in rewindow:
        if q == allq[0] or q in never or q in fill:
            continue  # flagship / never-witnessed / already selected
        if rows.get(q) == this_round:
            print(f"note: {q} is in the CURRENT window — it earns its row "
                  f"this round, no slot needed next round")
            continue
        # the ledger displacement rule: drop the last non-rewindowed member
        for j in range(len(fill) - 1, -1, -1):
            if fill[j] not in rewindow:
                displaced.append(fill.pop(j))
                break
        else:
            print(f"ERROR: no displaceable slot left for {q}")
            return 1
        fill.append(q)

    print(f"returners filling the remaining {len(fill)} slots (oldest rows "
          f"first{'; re-windows appended' if rewindow else ''}):")
    for q in fill:
        print(f"  r{rows[q]:02d} {q}")
    if displaced:
        print(f"displaced to the NEXT round's returner front by --rewindow: "
              f"{displaced}")
    nxt = [f"r{rows[q]}:{q}"
           for q in returners if q not in fill][: 5 + len(displaced)]
    print(f"next returners waiting beyond the window: {nxt}")

    final = [allq[0], *never, *fill]
    assert len(final) == len(set(final)) and len(final) <= WINDOW
    print("\nfinal _DRIVER_WINDOW tuple (paste into queries/__init__.py):")
    print("_DRIVER_WINDOW: tuple[str, ...] = (")
    for q in final:
        print(f'    "{q}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
