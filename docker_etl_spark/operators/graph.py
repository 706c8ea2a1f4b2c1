"""Iterative graph analytics over DataFrame edge lists.

The engine's connected-components operators (operators/dedupe.py,
two-phase large/small-star) cover equivalence-class graphs; this
module adds value-propagation iteration — PageRank — the canonical
shuffle-per-round link analysis. Like the CC kernels it never
materializes adjacency arrays: every round is a narrow (node, value)
join + hash aggregate, so hot nodes cost a wide groupBy key, never an
executor-memory buffer.

Exactness: ranks are scaled BIGINTs and every step is integer
arithmetic (``div`` floor division, the remainder conventions
documented on the operator), so an independent SQL engine replays the
iteration bit-for-bit — the same cross-engine discipline as the
jackknife/histogram kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_exact(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    directed: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer arithmetic — over
    the UNDIRECTED expansion of the edge list by default, or the
    directed graph as given with ``directed=True`` (the textbook
    link-graph semantics).

    Semantics (all floor divisions, every quantity a nonnegative
    BIGINT):

    - nodes = distinct endpoints of the self-loop-free, deduplicated
      edge set (symmetrized first when undirected); n = |nodes|;
      r_0(v) = scale div n for every node.
    - contribution u→v per round: r(u) div outdeg(u) — the division
      remainder is retained by nobody (dropped), a deterministic
      convention both engines share. Undirected graphs have no
      dangling nodes by construction (symmetrization gives every
      endpoint an out-edge).
    - DANGLING-MASS convention (directed only): a node with no
      out-edges contributes its whole rank to a global pool D; every
      node receives ``D div n`` of it that round (the standard
      uniform redistribution, floored; the ``D mod n`` remainder is
      dropped like every other floor remainder).
    - r_{k+1}(v) = ((100-damping_pct) * (scale div n)) div 100
      + (damping_pct * (sum_contribs(v) + dangling_share)) div 100,
      where dangling_share = D div n when directed else 0.

    Total mass therefore decays slightly each round (floor remainders
    are dropped, not redistributed); rankings are unaffected and the
    recipe replays exactly in any engine with integer division.

    Scale shape: per round ONE equi-join of the (u, rank) frame onto
    the edge list plus ONE hash aggregate on the destination — narrow
    (node, long) rows through both shuffles, partial aggregation
    map-side; the directed mode adds one 1-row aggregate over the
    (static, checkpointed) dangling-node set, broadcast back. The
    edge list and per-node degree frame are computed once and
    checkpointed; each round's rank frame is eagerly checkpointed to
    truncate lineage (the x41 CC discipline), so plan depth stays
    constant in ``iterations``. At 100 TB the edge list partitions on
    u and every round reuses that partitioning.

    Returns (node, rank_scaled).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1 (got {iterations})")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100] (got {damping_pct})")
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if not directed:
        e = e.union(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
    e = e.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select("u").union(e.select(F.col("v").alias("u"))).distinct()
        if directed
        else e.select("u").distinct()
    )
    deg = e.groupBy("u").agg(F.count("*").cast("bigint").alias("outdeg"))
    n_df = nodes.agg(F.count("*").cast("bigint").alias("n"))
    base = (
        nodes.crossJoin(F.broadcast(n_df))
        .select(
            "u",
            "n",
            F.expr(f"cast({scale} div n as bigint)").alias("__r0"),
        )
        .localCheckpoint(eager=True)
    )
    dang = None
    if directed:
        # static set: nodes with no out-edge (sinks); its per-round
        # rank total is the dangling pool D
        dang = nodes.join(deg, "u", "left_anti").localCheckpoint(eager=True)
    r = base.select("u", F.col("__r0").alias("r"))
    teleport = F.expr(
        f"cast(({100 - damping_pct} * __r0) div 100 as bigint)"
    )
    for _ in range(iterations):
        contribs = (
            e.join(r, "u")
            .join(deg, "u")
            .select(F.col("v").alias("u"), F.expr("r div outdeg").alias("c"))
        )
        s = contribs.groupBy("u").agg(F.sum("c").cast("bigint").alias("s"))
        nxt = base.join(s, "u", "left")
        if directed:
            d_df = (
                r.join(dang, "u", "left_semi")
                .agg(
                    F.coalesce(F.sum("r"), F.lit(0))
                    .cast("bigint")
                    .alias("__dmass")
                )
            )
            nxt = nxt.crossJoin(F.broadcast(d_df))
            gain = F.expr(
                f"cast(({damping_pct} * (coalesce(s, cast(0 as bigint))"
                " + (__dmass div n))) div 100 as bigint)"
            )
        else:
            gain = F.expr(
                f"cast(({damping_pct} * coalesce(s, cast(0 as bigint)))"
                " div 100 as bigint)"
            )
        r = nxt.select("u", (teleport + gain).alias("r")).localCheckpoint(
            eager=True
        )
    return r.select(F.col("u").alias("node"), F.col("r").alias("rank_scaled"))
