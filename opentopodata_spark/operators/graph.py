"""Distributed PageRank over a host/link graph (integer micro-units).

A training-data pipeline ranks crawl hosts by link authority to weight
sampling (domain_stats gives volume; PageRank gives endorsement — the
two together drive the mixture sampler in operators/sampling.py). The
reference has no graph operators (its scope is elevation queries); the
algorithm is the public Brin/Page formulation (the classic power
iteration with uniform dangling-mass redistribution).

Why integer micro-units instead of floating-point ranks
-------------------------------------------------------
Float PageRank sums contributions in whatever order the shuffle
delivers them, so two runs (or Spark vs an oracle) differ in the last
ulps and any rounded comparison can straddle a boundary. This
implementation pins an exact integer contract — the same trick as
operators/dsir.py's log-ratio micro-units:

* total rank mass starts as ``unit`` (default 10^12) split evenly:
  ``base = unit // n`` per node;
* a node's contribution along each out-edge is ``rank // outdeg``
  (BIGINT floor division — exact, and integer sums are
  order-independent);
* dangling nodes (outdeg 0) donate ``dangling_total // n`` to every
  node;
* the damped update is ``rank' = ((100 - d) * base) // 100
  + (d * (contrib + dangling_share)) // 100`` with ``d`` an integer
  percentage (default 85).

Every quantity is a nonnegative BIGINT (mass <= unit = 10^12, times
d <= 100 stays far under 2^63), every reduction is an integer sum, so
the result is bit-identical across partition layouts, Spark vs DuckDB
vs the pure-Python twin in tests. Floor division leaks a few units of
mass per iteration (the remainder of each split) — that's part of the
pinned contract, not an error; callers wanting probabilities divide by
``unit`` themselves.

Scale shape (the 100 TB story)
------------------------------
The edge list is the big side (a web-scale host graph: ~10^8 nodes,
~10^10 edges); ranks are one row per node. Edges are deduped,
hash-partitioned by ``src`` ONCE and persisted — they never move
again. Each iteration ships only the rank table: one shuffle to join
ranks onto edges by src (AQE can broadcast it while it fits; at 10^8
nodes it becomes a co-partitioned shuffle join on the edge layout,
which Spark reuses because the persisted edge partitioning is stable),
and one ``groupBy(dst)`` with map-side partial sums for the
contribution reduce. The dangling total is a single-row aggregate
collected to the driver (bounded: one scalar per iteration). Each
round ends in ``localCheckpoint`` to truncate lineage — same
discipline (and same measured rationale) as
operators/dedup.py::connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNIT = 10**12


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iterations: int = 4,
    damping_pct: int = 85,
    unit: int = UNIT,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node BIGINT, rank_units BIGINT) after ``iterations`` damped
    power-iteration rounds of the integer contract above.

    ``edges``: directed (src, dst) pairs; duplicates and self-loops are
    dropped (outdeg counts DISTINCT out-neighbours). ``nodes``
    optionally fixes the node universe (one column, any name); when
    omitted it is the distinct endpoints of ``edges``. Nodes present in
    ``nodes`` but in no edge are dangling sources and rank sinks like
    any other node.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")

    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .repartition("u")  # the stable layout every iteration reuses
        .persist()
    )

    if nodes is not None:
        node_df = nodes.select(F.col(nodes.columns[0]).cast("long").alias("node"))
        node_df = node_df.distinct()
    else:
        node_df = (
            e.select(F.col("u").alias("node"))
            .union(e.select(F.col("v").alias("node")))
            .distinct()
        )
    node_df = node_df.persist()
    n = node_df.count()
    if n == 0:
        e.unpersist()
        node_df.unpersist()
        spark = edges.sparkSession
        return spark.createDataFrame([], "node bigint, rank_units bigint")

    base = unit // n
    hold = (100 - damping_pct) * base // 100

    # outdeg joined onto the node universe once; reused every iteration.
    deg = (
        node_df.join(
            e.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg")),
            node_df.node == F.col("u"),
            "left",
        )
        .select("node", F.coalesce(F.col("outdeg"), F.lit(0)).alias("outdeg"))
        .persist()
    )

    ranks = node_df.select("node", F.lit(base).cast("long").alias("rank_units"))
    try:
        for _ in range(iterations):
            ranked = deg.join(ranks, "node")
            # bounded driver scalar: ONE row per iteration
            dangling = (
                ranked.where(F.col("outdeg") == 0)
                .agg(F.coalesce(F.sum("rank_units"), F.lit(0)).alias("s"))
                .collect()[0]["s"]
            )
            share = int(dangling) // n
            contrib = (
                e.join(
                    ranked.where(F.col("outdeg") > 0).select(
                        F.col("node").alias("u"),
                        F.expr("rank_units DIV outdeg").alias("give"),
                    ),
                    "u",
                )
                .groupBy(F.col("v").alias("node"))
                .agg(F.sum("give").alias("c"))
            )
            ranks = node_df.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit(hold)
                    + F.expr(
                        f"{damping_pct} * (coalesce(c, 0L) + {share}L) DIV 100"
                    )
                ).cast("long").alias("rank_units"),
            )
            ranks = ranks.localCheckpoint()
    finally:
        e.unpersist()
        deg.unpersist()
        node_df.unpersist()
    return ranks


def pagerank_local(
    edges: list[tuple[int, int]],
    nodes: set[int] | None = None,
    iterations: int = 4,
    damping_pct: int = 85,
    unit: int = UNIT,
) -> dict[int, int]:
    """Pure-Python twin of :func:`pagerank` — same integer contract,
    dict-based. The tests' independent implementation; also the honest
    spec of the arithmetic."""
    es = {(int(u), int(v)) for u, v in edges if int(u) != int(v)}
    ns = set(nodes) if nodes is not None else {x for uv in es for x in uv}
    n = len(ns)
    if n == 0:
        return {}
    outdeg: dict[int, int] = {x: 0 for x in ns}
    for u, _ in es:
        outdeg[u] += 1
    base = unit // n
    hold = (100 - damping_pct) * base // 100
    rank = {x: base for x in ns}
    for _ in range(iterations):
        dangling = sum(r for x, r in rank.items() if outdeg[x] == 0)
        share = dangling // n
        contrib = {x: 0 for x in ns}
        for u, v in es:
            contrib[v] += rank[u] // outdeg[u]
        rank = {
            x: hold + damping_pct * (contrib[x] + share) // 100 for x in ns
        }
    return rank
