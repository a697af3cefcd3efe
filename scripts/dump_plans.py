#!/usr/bin/env python
"""Regenerate PLANS.md: the formatted physical plan of every headline query
at sf0.1, with the scale-relevant properties called out (pushdown, pruning,
join strategy, shuffle count). Evidence artifact for SCALING.md's claims.

    PYTHONPATH=. python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from savio_training_dask_2019_spark import plans, queries as catalog  # noqa: E402
from savio_training_dask_2019_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-plans")
    out = [
        "# PLANS — physical plans of the headline queries (regenerate: "
        "`PYTHONPATH=. python scripts/dump_plans.py`)",
        "",
        f"Captured at `{sf_dir}`, config = `session.get_spark()` defaults. "
        "Per query: shuffle Exchange count (broadcasts excluded), broadcast "
        "join count, then the formatted plan.",
        "",
    ]
    for bench_name, qname in HEADLINE.items():
        df = catalog.QUERIES[qname](spark, sf_dir)
        plan = plans.formatted_plan(df)
        tree = plan.split("\n\n")[0]  # operator tree; details section omitted
        out += [
            f"## {bench_name} (`{qname}`)",
            "",
            f"- shuffles: **{plans.shuffle_count(df)}**, broadcast joins: "
            f"**{plans.broadcast_join_count(df)}**, pushed filters: "
            f"`{plans.pushed_filters(df) or '—'}`",
            "",
            "```",
            tree.strip(),
            "```",
            "",
        ]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
