"""Grid-partitioned spatial self-join — "all pairs within radius r" over
2-D points, the spatial member of the blocked-join family (banded_range_join
blocks 1-D intervals; cell_knn_join blocks cosine space; this blocks the
plane). The naive form is the O(n²) distance join; gridding at cell width
``r`` guarantees every qualifying pair shares a (cell, neighbor-cell) edge,
so candidates collapse to a plain equi-join on the cell key — the classic
fixed-grid spatial join (Patel & DeWitt, SIGMOD 1996 "Partition Based
Spatial-Merge Join", simplified to points).

Replication factor is EXACTLY 9 (the 3×3 neighborhood) on one side only;
the other side stays in its own cell, and each qualifying pair is produced
exactly once: the right point q lands in the left point p's cell via one
unique replica (p.cell ∈ N(q.cell) has a single witness), and the
``id_a < id_b`` filter keeps one orientation. Integer coordinates make the
exact predicate BIGINT arithmetic — dist² = dx² + dy² ≤ r² with no floats
anywhere, so the result is engine-exact and the oracle can run the
DEFINITIONAL quadratic form.

Scale: one shuffle on the cell key (9× replication of ids+coords only —
no payload columns ride the exchange); hot cells are plain equi-join hot
keys — AQE skew-split applies. Cell width = r is the selectivity knob:
wider cells cut replication overlap but admit more false candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_pairs(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    radius: int,
) -> DataFrame:
    """All pairs ``(id_a < id_b, dist2)`` with squared L2 distance
    ``dist2 <= radius²``, over INTEGER coordinates (the exactness
    contract — quantize floats upstream, the kmeans pattern). NULL
    coordinates are dropped (incomparable)."""
    r = int(radius)
    if r <= 0:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    pts = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    cx = F.floor(F.col("x") / F.lit(r)).cast("bigint")
    cy = F.floor(F.col("y") / F.lit(r)).cast("bigint")
    left = pts.select("id", "x", "y", cx.alias("cx"), cy.alias("cy"))
    # replicate the right side onto its 3x3 neighborhood; a point's replica
    # set covers every cell whose residents could sit within r of it
    off = F.sequence(F.lit(-1), F.lit(1))
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.explode(off).alias("ox"),
        cx.alias("cxb"),
        cy.alias("cyb"),
    ).select(
        "id_b",
        "xb",
        "yb",
        (F.col("cxb") + F.col("ox")).alias("cx"),
        F.explode(off).alias("oy"),
        "cyb",
    ).select(
        "id_b", "xb", "yb", "cx", (F.col("cyb") + F.col("oy")).alias("cy")
    )
    dx = F.col("x") - F.col("xb")
    dy = F.col("y") - F.col("yb")
    dist2 = (dx * dx + dy * dy).cast("bigint")
    return (
        left.join(right, ["cx", "cy"])
        .where(F.col("id") < F.col("id_b"))
        .where(dist2 <= F.lit(r * r).cast("bigint"))
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            dist2.alias("dist2"),
        )
    )
