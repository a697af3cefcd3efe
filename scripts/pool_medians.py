#!/usr/bin/env python
"""Pool complete `python bench.py` suite JSONs into per-row medians.

The freeze protocol (BASELINE.md, Normative targets) re-derives every
frozen median as the per-row median across N complete quiet-host suite
invocations. This script is the arithmetic: it refuses non-quiet inputs
(load_at_start must be under the gate line unless --allow-load), prints
per-row runs / median / 2x target, and flags rows whose new median moves
more than 25% from an optional prior-median JSON so a re-freeze can't
silently absorb a real regression.

Usage:
    python scripts/pool_medians.py run1.json run2.json ... \
        [--prior prior_medians.json] [--allow-load]

Output: a markdown-ready table plus a {"row": median_ms} JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    argv = sys.argv[1:]
    allow_load = "--allow-load" in argv
    if allow_load:
        argv.remove("--allow-load")
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
        if not allow_load and (load is None or load >= 1.0):
            print(f"REFUSING {p}: load_at_start={load} is not quiet "
                  f"(<1.0 required; --allow-load to override)", file=sys.stderr)
            return 1
        suites.append(d["queries"])

    rows = sorted(set().union(*suites))
    medians = {}
    print("| row | runs (ms) | median | target (2x) | vs prior |")
    print("| --- | --- | --- | --- | --- |")
    for q in rows:
        runs = [round(s[q] * 1000) for s in suites if q in s]
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
