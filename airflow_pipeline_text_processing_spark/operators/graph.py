"""Graph analytics over event logs: transition-graph extraction and
fixed-iteration PageRank in exact integer fixed point.

The 100 TB shape: the heavy step is EDGE EXTRACTION -- a per-user lag
window over the full event log (shuffle on user_id, never global) that
aggregates trillions of events into a transition graph whose node set is
small (event types, pages, states).  The iterative part then runs on the
small graph: k joins of a node-sized rank relation against an edge
relation.  This aggregate-big/iterate-small split is how web-scale
PageRank actually deploys on Spark.

Exactness: edge probabilities are quantized once to parts-per-million
(``(w * 10^6) div out_w``) and ranks carried at SCALE = 10^12, so every
iteration is BIGINT multiply/divide -- bit-identical across engines and
partition orders, with documented headroom (rank_fp * p_fp <= 10^18 <
2^63 regardless of corpus size, because p_fp is bounded by 10^6).
Dangling nodes (no out-edges) emit no flow -- the standard simplified
formulation; total mass is then < 1, which is fine for ranking.

The duplicate-cluster connected-components operator lives in dedup.py
(large-star/small-star); this module covers weighted-digraph analytics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SCALE = 10**12
P_SCALE = 10**6
DAMP_NUM, DAMP_DEN = 85, 100


def transition_edges(
    ev: DataFrame,
    key_col: str = "user_id",
    node_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key consecutive-transition counts: ``src, dst, w``.  One lag
    window per key (total order via ``(ts, tiebreak)``) and one
    map-side-combined groupBy -- the log-to-graph aggregation."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        ev.withColumn("src", F.lag(node_col).over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col(node_col).alias("dst"))
        .agg(F.count("*").alias("w"))
    )


def pagerank_fixed(
    nodes: DataFrame, edges: DataFrame, iterations: int = 3
) -> DataFrame:
    """``iterations`` power steps of damped PageRank over ``nodes(node)``
    and ``edges(src, dst, w)``; returns ``node, rank_fp`` (SCALE units).

    Each step: per-edge flow ``(rank_fp * p_fp) div 10^6`` with
    ``p_fp = (w * 10^6) div out_w`` precomputed once, summed into each
    destination, then ``rank' = teleport + (85 * inflow) div 100`` where
    ``teleport = ((SCALE * 15) div 100) div n``.  All BIGINT; the edge
    relation and the rank relation are both graph-sized (small), so each
    iteration is a broadcast-scale join regardless of corpus size.
    """
    out_tot = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    edges_p = edges.join(out_tot, "src").select(
        "src",
        "dst",
        F.expr(f"(w * {P_SCALE}) div out_w").alias("p_fp"),
    )
    n_df = nodes.agg(F.count("*").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"{SCALE} div n_nodes").alias("rank_fp")
    )
    for _ in range(iterations):
        inflow = (
            edges_p.join(ranks, edges_p.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank_fp * p_fp) div {P_SCALE}").alias("flow"),
            )
            .groupBy("node")
            .agg(F.sum("flow").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.expr(
                    f"(({SCALE} * 15) div 100) div n_nodes"
                    f" + ({DAMP_NUM} * coalesce(inflow, 0)) div {DAMP_DEN}"
                ).alias("rank_fp"),
            )
        )
    return ranks.orderBy("node")
