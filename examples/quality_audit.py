#!/usr/bin/env python
"""Data-quality audit — the pre-flight a warehouse runs before trusting
a new data drop, composed from the catalog's quality tier:

    PYTHONPATH=. python examples/quality_audit.py [sf_dir]

    null_profile    - per-column null rates + exact distinct counts
                      (schema-drift / ingest-contract check)
    ref_integrity   - orphan counts for the schema's four FK edges
    skew_profile    - per-candidate-key hot-key share / entropy (the
                      shuffle pre-flight for joins and groupBys)
    degree_histogram- trade-graph shape + the max-degree hot-row bound
    chi2_abtest     - per-segment arm imbalance (a lopsided χ² on an
                      ingest split is a routing bug, not an experiment)
    outlier_mad     - robust per-group anomaly counts on event values

Each stage is one catalog query — everything here is oracle-checked in
the driver gate; this example only arranges them into the one-look
report a data engineer actually reads.
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from savio_training_dask_2019_spark.queries import QUERIES
    from savio_training_dask_2019_spark.session import get_spark

    spark = get_spark(app_name="quality-audit")

    print(f"=== data-quality audit: {sf_dir} ===")

    print("\n-- column profile (events) --")
    for r in sorted(
        QUERIES["null_profile"](spark, sf_dir).collect(), key=lambda r: r["col"]
    ):
        print(
            f"  {r['col']:<12} nulls {r['n_null']:>6} ({r['null_rate']:.2%})"
            f"  distinct {r['n_distinct']}"
        )

    print("\n-- referential integrity --")
    bad = 0
    for r in sorted(
        QUERIES["ref_integrity"](spark, sf_dir).collect(),
        key=lambda r: r["relation"],
    ):
        flag = "OK " if r["n_orphans"] == 0 else "BAD"
        bad += r["n_orphans"]
        print(f"  [{flag}] {r['relation']:<22} orphans {r['n_orphans']}")

    print("\n-- shuffle-skew pre-flight --")
    for r in QUERIES["skew_profile"](spark, sf_dir).collect():
        print(
            f"  {r['keyset']:<22} hot-key share {r['hot_share']}"
            f"  entropy {r['entropy_bits']} bits over {r['n_keys']} keys"
        )

    print("\n-- trade-graph shape --")
    for r in sorted(
        QUERIES["degree_histogram"](spark, sf_dir).collect(),
        key=lambda r: r["deg_bucket"],
    ):
        print(
            f"  2^{r['deg_bucket'] - 1:<2} <= deg  n_nodes {r['n_nodes']:>6}"
            f"  max_deg {r['max_deg']}"
        )

    print("\n-- arm balance (chi-squared per segment) --")
    for r in sorted(
        QUERIES["chi2_abtest"](spark, sf_dir).collect(),
        key=lambda r: r["event_type"],
    ):
        mark = "SHIFTED" if r["significant"] else "ok"
        print(f"  {r['event_type']:<10} chi2 {r['chi2']}  [{mark}]")

    print("\n-- robust outliers (median/MAD) --")
    for r in sorted(
        QUERIES["outlier_mad"](spark, sf_dir).collect(),
        key=lambda r: r["event_type"],
    ):
        print(f"  {r['event_type']:<10} outliers {r['n_outliers']}/{r['n']}")

    print(f"\nquality audit complete ({'clean' if bad == 0 else 'ORPHANS FOUND'})")


if __name__ == "__main__":
    main(*sys.argv[1:])
