"""Reusable graph algorithms as DataFrame joins (GraphX-equivalent dataflows).

- ``min_label_propagation``: the connected-components kernel — per round
  one shuffle join (edges ⋈ labels) + partial-aggregated MIN.  Shared by
  entity connected components and near-duplicate clustering.
- ``triangle_count``: ordered 3-way self-join; the ``a < b < c`` edge
  orientation means every triangle is counted exactly once and the join
  tree never materializes a direction-duplicated pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_propagation(
    nodes: DataFrame, edges: DataFrame, rounds: int, checkpoint: bool = False
) -> DataFrame:
    """nodes(id) + undirected edges(a,b) → (id, comp) after fixed rounds.

    ``comp`` is the MIN node id reachable within ``rounds`` hops — with
    rounds ≥ graph diameter this is exact connected components.  Fixed
    round counts keep declared queries deterministic/oracle-checkable;
    production loops to fixpoint (converged when no label changes) with
    per-round checkpoint to cut lineage.
    """
    labels = nodes.select("id", F.col("id").alias("comp"))
    for _ in range(rounds):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("b"), F.col("comp").alias("nbr_comp")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnRenamed("a", "id")
        )
        labels = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least("comp", F.coalesce("min_nbr", "comp")).alias("comp"),
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels


def components_to_convergence(
    nodes: DataFrame | None, edges: DataFrame, max_rounds: int = 50,
    active_only: bool = False,
) -> tuple[DataFrame, int]:
    """Exact connected components: min-label propagation to the fixpoint.

    The production shape the fixed-round declared query (`entity_components_k4`)
    documents: per round, one shuffle join + partial-aggregated MIN, then a
    driver-side convergence check (count of changed labels — a single small
    aggregate over the label frame).  Labels are LAZILY
    ``localCheckpoint``-ed every round and materialized by the convergence
    count itself, so each round is exactly ONE job (the r17 fusion: the
    former eager-checkpoint-then-count shape paid two jobs per round for
    the same work — guide §1.2, job-count overhead dominates label-graph
    sized rounds) while plan depth and lineage still stay constant no
    matter how many rounds the diameter demands.

    r18 (guide §2: shuffle fewer bytes): the loop runs on the ACTIVE
    subgraph only — nodes with at least one incident edge.  An isolated
    node's label can never change (min-label updates flow only across
    edges), so looping it through every round's three shuffles is pure
    waste that scales with |nodes|, not |endpoints|; at 100 TB a nightly
    contracted batch touches a tiny fraction of the standing label table.
    With ``active_only=False`` (default) isolated nodes are unioned back
    as identity labels — the returned frame is row-identical to the r17
    form.  ``active_only=True`` omits them, so a caller that left-joins
    the result onto its standing table (coalescing missing comps to the
    node id) never shuffles a corpus-sized identity mapping at all.
    ``nodes=None`` makes the edge-endpoint set itself the node universe
    (implies active-only output) — callers whose endpoints are known to
    lie inside their node set skip shipping a node frame entirely.

    Returns (labels(id, comp), rounds_run).  Raises if ``max_rounds`` is hit
    before convergence — rounds needed equal the largest component's
    min-label eccentricity, far below 50 for any real corpus graph.
    """
    # The edge frame is consumed once per round plus once for the
    # endpoint set — for contracted batch graphs it is itself a join
    # subtree against the standing labels, so without a lineage cut that
    # subtree re-executes every round (measured: the whole local delta of
    # the endpoint restriction).  Lazy checkpoint: materialized by the
    # first round's convergence count, reused after (guide §2.4).
    edges = edges.localCheckpoint(eager=False)
    endpoints = (
        edges.select(F.col("a").alias("id"))
        .union(edges.select(F.col("b").alias("id")))
        .distinct()
    )
    active = endpoints if nodes is None else nodes.join(endpoints, "id", "semi")
    labels = active.select("id", F.col("id").alias("comp")).localCheckpoint(
        eager=False
    )
    for rnd in range(1, max_rounds + 1):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("b"), F.col("comp").alias("nbr_comp")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnRenamed("a", "id")
        )
        nxt = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least("comp", F.coalesce("min_nbr", "comp")).alias("comp"),
            (F.coalesce("min_nbr", "comp") < F.col("comp")).alias("changed"),
        )
        # lazy checkpoint + count = ONE job that both materializes the
        # round's labels (lineage cut) and returns the convergence signal
        nxt = nxt.localCheckpoint(eager=False)
        n_changed = nxt.filter("changed").count()
        labels = nxt.drop("changed")
        if n_changed == 0:
            if not active_only and nodes is not None:
                labels = labels.unionByName(
                    nodes.join(endpoints, "id", "anti").select(
                        "id", F.col("id").alias("comp")
                    )
                )
            return labels, rnd
    raise RuntimeError(f"components did not converge within {max_rounds} rounds")


def undirect(edges: DataFrame) -> DataFrame:
    """directed edges(a,b) → symmetric closure, self-loops dropped."""
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return sym.filter(F.col("a") != F.col("b")).distinct()


def triangle_count(edges: DataFrame) -> DataFrame:
    """undirected edges(a,b) → 1-row (n_triangles).

    Edges are canonicalized to ``a < b`` so each triangle (a<b<c) is
    produced by exactly one join path: (a,b) ⋈ (b,c) ⋈ (a,c).
    """
    e = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    return (
        e.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def label_propagation_communities(
    nodes: DataFrame, edges: DataFrame, rounds: int
) -> DataFrame:
    """nodes(id) + undirected self-loop-free edges(a,b) → (id, comm) after
    ``rounds`` SYNCHRONOUS label-propagation steps (Raghavan et al. 2007,
    the community primitive GraphRAG-style pipelines summarize over).

    Each round every node adopts the most frequent label among its
    neighbors' CURRENT labels (ties to the lowest label; isolated nodes
    keep their own) — unlike min-label CC this converges to density-based
    communities, not connectivity classes.  Fixed synchronous rounds keep
    it deterministic and oracle-checkable — deliberately NOT to-fixpoint:
    synchronous LPA can 2-cycle forever on bipartite structures (every
    node adopting the other side's label each round), so a production
    convergence loop needs asynchronous/semi-synchronous coloring or
    damping (Raghavan §4); the fixed-round form sidesteps nontermination
    and is what the declared query pins.

    Scale shape: per round one map-side-combined groupBy((node, label))
    count, one max-per-node aggregation, one tie-breaking min — all plain
    aggregations (window-free), each shuffle keyed on node id.

    Lineage: ``labels`` is referenced TWICE per round (the neighbor-count
    join and the final coalesce join) and ``cnt`` twice (max + pick), so
    an unbounded loop doubles the physical plan per round — measured 278
    Exchange nodes in the rounds=3 declared query's plan (r17,
    plans/r17/entity_lpa_communities_k3_before.txt).  A LAZY
    ``localCheckpoint`` per round truncates the plan to one round's
    operators while deferring materialization to the first consuming job
    (guide §2.4/§5: duplicated subtrees re-execute; cut them, but don't
    pay a dedicated job per round for it).
    """
    labels = nodes.select("id", F.col("id").alias("comm")).localCheckpoint(
        eager=False
    )
    for _ in range(rounds):
        cnt = (
            edges.join(
                labels.select(F.col("id").alias("b"), F.col("comm").alias("lab")),
                "b",
            )
            .groupBy(F.col("a").alias("id"), "lab")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        mx = cnt.groupBy("id").agg(F.max("n").alias("mx"))
        pick = (
            cnt.join(mx, "id")
            .filter(F.col("n") == F.col("mx"))
            .groupBy("id")
            .agg(F.min("lab").alias("new_lab"))
        )
        labels = (
            labels.join(pick, "id", "left")
            .select("id", F.coalesce("new_lab", "comm").alias("comm"))
            .localCheckpoint(eager=False)
        )
    return labels
