"""Shared DuckDB CTE builder for deterministic Lloyd k-means — the
oracle twin of ``operators/clustering.kmeans_centroids`` (r8 review
finding #6: the IVF and PQ oracles each carried a near-verbatim copy
of this chain; one parameterized builder now serves both, mirroring
how ``kmeans_centroids`` itself is group-aware on the Spark side).

The chain replays, per round: sequential-fold L2 assignment with ties
to the lowest centroid id, then DECIMAL(25,6)-summed order-independent
means per (group, cid, dim) — every arithmetic step bit-portable, so
the trained centroids hash-match Spark's exactly.
"""

from __future__ import annotations

L2_AB = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) "
    "* (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))), (acc, x) -> acc + x)"
)


def lloyd_ctes(
    rounds: int,
    *,
    prefix: str,
    init_cte: str,
    vec_expr: str,
    val_expr: str,
    dims_expr: str,
    grouped: bool = False,
    source: str = "embeddings",
) -> str:
    """CTE chain ``{prefix}c0 -> {prefix}c{rounds}`` over the
    ``embeddings`` table.

    - ``init_cte``: full SQL for the init centroids ``{prefix}c0``,
      with columns ([s,] cid, centroid).
    - ``vec_expr``: the (sub)vector of embeddings row ``e`` to compare
      against centroid row ``c`` (may reference ``c.s`` in grouped
      mode).
    - ``val_expr``: the dim-``u.i`` element of the (sub)vector of row
      ``e`` under assignment alias ``a`` (may reference ``a.s``), cast
      to DOUBLE.
    - ``dims_expr``: SQL for the (sub)vector length.
    - ``grouped``: carry a subspace column ``s`` through assignment
      and means (the PQ per-subspace mode).
    - ``source``: the training relation (default the full embeddings
      table; a filtered subquery trains on a base subset — the
      incremental-maintenance oracle's train-on-base mode).
    """
    g = "s, " if grouped else ""
    ga = "a.s, " if grouped else ""
    gc = "c.s, " if grouped else ""
    out = [init_cte]
    for r in range(1, rounds + 1):
        out.append(
            f"""
    {prefix}d{r} AS (SELECT e.vec_id, {gc}c.cid,
                     {L2_AB.format(a=vec_expr, b='c.centroid')} AS d
              FROM {source} e CROSS JOIN {prefix}c{r - 1} c),
    {prefix}a{r} AS (SELECT vec_id, {g}cid FROM (
                SELECT vec_id, {g}cid,
                       row_number() OVER (PARTITION BY vec_id{', s' if grouped else ''}
                                          ORDER BY d ASC, cid ASC) AS rn
                FROM {prefix}d{r}) WHERE rn = 1),
    {prefix}l{r} AS (SELECT {ga}a.cid, CAST(u.i - 1 AS INT) AS dim,
                     {val_expr} AS val
              FROM {source} e JOIN {prefix}a{r} a ON a.vec_id = e.vec_id,
                   LATERAL unnest(generate_series(1, {dims_expr})) AS u(i)),
    {prefix}m{r} AS (SELECT {g}cid, dim,
                     CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE)
                         / COUNT(val) AS avg
              FROM {prefix}l{r} GROUP BY {g}cid, dim),
    {prefix}c{r} AS (SELECT {g}cid, list(avg ORDER BY dim) AS centroid
              FROM {prefix}m{r} GROUP BY {g}cid)"""
        )
    return ",".join(out)
