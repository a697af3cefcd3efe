#!/usr/bin/env python
"""Pool complete `python bench.py` suite JSONs into per-row medians.

The freeze protocol (BASELINE.md, Normative targets) re-derives every
frozen median as the per-row median across N complete quiet-host suite
invocations. This script is the arithmetic: it refuses non-quiet inputs
(load_at_start must be at or under bench.py's own gate line,
``_settle_threshold()`` — 0.25·cpu_count/32 by default — unless a higher
``--max-load`` is given explicitly), requires every row to appear in
EVERY suite (a truncated suite must never silently skew a frozen
median), prints per-row runs / median / 2x target, and flags rows whose
new median moves more than 25% from an optional prior-median JSON so a
re-freeze can't silently absorb a real regression.

History note: the r16 pool (scripts/frozen_medians_r16.json) was taken
under the protocol's then-current <1.0 refusal line — three of its four
suites started at loads 0.75-0.92, a deliberate pooling-across-start-
states decision documented in BASELINE.md's r16 Numbers block. Since
r17 (ADVICE r16 #1) the refusal tracks the deep-settle gate itself, so
any FUTURE pool is quiet-by-construction unless --max-load says
otherwise on the record.

Usage:
    PYTHONPATH=/root/repo python scripts/pool_medians.py run1.json run2.json ... \
        [--prior prior_medians.json] [--max-load X]

Output: a markdown-ready table plus a {"row": median_ms} JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _settle_threshold  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    max_load = _settle_threshold()
    if "--allow-load" in argv:
        print("--allow-load was removed (ADVICE r16 #1): pass an explicit "
              "--max-load X so the override is on the record", file=sys.stderr)
        return 1
    if "--max-load" in argv:
        i = argv.index("--max-load")
        try:
            max_load = float(argv[i + 1])
        except (IndexError, ValueError):
            # ADVICE r17 #1: a trailing or non-numeric --max-load must be a
            # one-line usage error, not a traceback (bench.py's env parsing
            # was hardened the same way in r17).
            got = argv[i + 1] if i + 1 < len(argv) else "<missing>"
            print(f"usage: --max-load X (numeric); got {got!r}", file=sys.stderr)
            return 1
        del argv[i : i + 2]
    prior: dict[str, float] = {}
    if "--prior" in argv:
        i = argv.index("--prior")
        prior = json.load(open(argv[i + 1]))
        del argv[i : i + 2]
    if len(argv) < 2:
        print("need at least 2 suite JSONs", file=sys.stderr)
        return 1

    suites = []
    for p in argv:
        d = json.load(open(p))
        load = d.get("load_at_start")
        if load is None:
            # ADVICE r17 #2: a missing load_at_start is NEVER poolable — no
            # --max-load value can attest a start state that was not
            # recorded. Say so instead of pointing at an override that
            # cannot apply.
            print(f"REFUSING {p}: no load_at_start recorded — a suite "
                  f"without a start-state reading is never poolable "
                  f"(re-run it under the current bench.py)", file=sys.stderr)
            return 1
        if load > max_load:
            print(f"REFUSING {p}: load_at_start={load} is not quiet "
                  f"(<= {max_load:.4g} required — bench.py's gate line; "
                  f"--max-load to override explicitly)", file=sys.stderr)
            return 1
        suites.append((p, d["queries"]))

    rows = sorted(set().union(*(s for _, s in suites)))
    # ADVICE r16 #3: the docstring requires COMPLETE suites — a row
    # missing from any input would be pooled over fewer runs silently.
    incomplete = {
        q: [p for p, s in suites if q not in s]
        for q in rows
        if any(q not in s for _, s in suites)
    }
    if incomplete:
        for q, missing in sorted(incomplete.items()):
            print(f"INCOMPLETE row {q!r}: absent from {missing}", file=sys.stderr)
        print("refusing to pool incomplete suites", file=sys.stderr)
        return 1

    medians = {}
    print("| row | runs (ms) | median | target (2x) | vs prior |")
    print("| --- | --- | --- | --- | --- |")
    for q in rows:
        runs = [round(s[q] * 1000) for _, s in suites]
        med = round(statistics.median(runs))
        medians[q] = med
        drift = ""
        if q in prior:
            ratio = med / prior[q]
            drift = f"{ratio:.2f}x"
            if ratio > 1.25 or ratio < 0.75:
                drift += " **CHECK**"
        print(f"| {q} | {'/'.join(map(str, runs))} | **{med} ms** | "
              f"<= {2 * med:,} ms | {drift} |")
    print()
    print(json.dumps(medians))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
