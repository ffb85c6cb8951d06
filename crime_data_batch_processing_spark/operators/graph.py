"""Graph analytics over the near-duplicate graph: triangle counting
with degree orientation.

The reference has no graph notion at all; the engine already
materializes one graph — the near-dup pair set (`near_dup_pairs`:
banded MinHash candidates, exact-Jaccard verified) that clustering
consumes — and this module adds the classic structure metric over it. Triangles measure how
"clumpy" duplication is: transitive copy families (templates, mirror
sites) triangle-close heavily, while chains of incremental edits
don't — a signal curation pipelines use to pick between keep-first
dedup and full cluster collapse.

Scale pattern (Suri & Vassilvitskii's MapReduce triangle counting):
orient every edge from the lower-(degree, id) endpoint to the higher
one. Every triangle is then counted exactly once, and — decisive at
scale — the wedge join fans out from each node's OUT-degree, which
orientation bounds by O(sqrt(m)) even for power-law hubs: a node with
a million neighbors contributes a million ordered wedges, not a
trillion unordered ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.operators.llm_dedup import (
    _SQL_PAIR_BASE,
    JACCARD_THRESHOLD,
    near_dup_pairs,
)
from crime_data_batch_processing_spark.registry import query

#: Shared oracle prelude: exact-Jaccard directed pairs (`dpairs`) and
#: the symmetric undirected edge set (`und`) every graph oracle builds
#: on. ONE definition — a change to edge semantics (threshold, self-
#: loop filtering) lands in every oracle and its Spark twin together.
_SQL_UND_BASE = f"""raw_pairs AS (
        {_SQL_PAIR_BASE}
    ), dpairs AS (
        SELECT doc_a AS u, doc_b AS v FROM raw_pairs
        WHERE jaccard >= {JACCARD_THRESHOLD} AND doc_a <> doc_b
    ), und AS (
        SELECT u, v FROM dpairs UNION SELECT v, u FROM dpairs
    )"""


def _und_edges(spark, sf_dir, *, checkpoint_pairs=False):
    """Directed near-dup pairs and the undirected edge set — the Spark
    twin of `_SQL_UND_BASE`, shared by every graph operator.

    `und` is always checkpointed: each consumer fans multiple branches
    off it, and without truncation every branch re-runs the whole
    shingle shuffle. `checkpoint_pairs` additionally materializes the
    directed pairs for consumers (triangles) that branch off BOTH
    frames.

    Pair base: `near_dup_pairs` (banded MinHash + exact verify) — the
    oracles' exact pair algebra matches under the guarded full-recall
    property; candidate generation stays collision-bounded instead of
    inheriting the ground-truth twin's sum(df^2) shared-shingle mass
    (measured ~n^2 on the vocabulary-saturated soak tiers).
    """
    pairs = (
        near_dup_pairs(spark, sf_dir)
        .where(F.col("doc_a") != F.col("doc_b"))
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    if checkpoint_pairs:
        pairs = pairs.localCheckpoint(eager=True)
    # symmetrize via ONE explode over a 2-struct array, not a
    # self-union (the r14 knn_rank_directed lesson, guide §1/§2):
    # `pairs` is the whole banded-candidate + exact-verify chain, and
    # unionByName(select swapped) plans and RUNS that chain twice —
    # the persisted band/shingle frames are cached, but the self-join,
    # distinct and Jaccard verify re-execute per union branch. The
    # explode emits both directed rows from each verified pair in the
    # same task; rows and the downstream distinct are identical.
    und = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(
                        F.col("v").alias("u"), F.col("u").alias("v")
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return pairs, und


@query(
    "graph_triangles",
    oracle=f"""
    WITH {_SQL_UND_BASE}, deg AS (
        SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u
    ), oriented AS (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.u < e.v)
                    THEN e.u ELSE e.v END AS s,
               CASE WHEN da.d < db.d OR (da.d = db.d AND e.u < e.v)
                    THEN e.v ELSE e.u END AS t
        FROM dpairs e JOIN deg da ON da.node = e.u
               JOIN deg db ON db.node = e.v
    ), wedges AS (
        SELECT a.s AS x, a.t AS y, b.t AS z
        FROM oriented a JOIN oriented b ON a.s = b.s AND a.t < b.t
    )
    SELECT w.x AS apex, COUNT(*) AS n_triangles
    FROM wedges w
    JOIN und c ON c.u = w.y AND c.v = w.z
    GROUP BY w.x
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-apex triangle counts over the near-dup graph.

    Pipeline: exact near-dup pairs → undirected degree count →
    degree-ordered orientation → wedge self-join on the source →
    closing-edge semi-check. The orientation makes the wedge join's
    fan-out O(out-degree²) with out-degree ≤ O(sqrt(m)), the standard
    bound that keeps triangle counting feasible on power-law graphs
    at scale. Every triangle is reported once, keyed by its
    lowest-(degree, id) corner ("apex").
    """
    # materialized once: the exact-Jaccard pair pipeline is the
    # expensive stage, and the graph below consumes it from four
    # branches (degrees, orientation, wedges via a self-join, closing
    # edges) — without truncation each branch re-runs the whole
    # shingle shuffle (same rationale as connected_components_star)
    pairs, und = _und_edges(spark, sf_dir, checkpoint_pairs=True)
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    e = (
        pairs.join(
            deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
        )
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("o")
        )
        .select("o.s", "o.t")
    )
    wedges = (
        e.alias("a")
        .join(e.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.t") < F.col("b.t")))
        .select(
            F.col("a.s").alias("x"),
            F.col("a.t").alias("y"),
            F.col("b.t").alias("z"),
        )
    )
    # closing check against the UNDIRECTED set: one equi-join on both
    # endpoints (an OR over the two orientations would force a nested
    # loop; und holds both directions, so equality suffices)
    closing = und.select(F.col("u").alias("y"), F.col("v").alias("z"))
    closed = wedges.join(closing, ["y", "z"])
    return closed.groupBy(F.col("x").alias("apex")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


#: PageRank: fixed power-iteration count and 0.85 damping, all in
#: ×10^12 scaled int64 — floor-div contributions and integer damping
#: ((17·x) div 20) make every iteration a pure integer function of the
#: graph, so ranks are bit-identical across engines, partitionings,
#: and runs (float PageRank is accumulation-order chaos).
PR_SCALE = 10**12
PR_ITERS = 3


def _sql_pagerank() -> str:
    base = 3 * PR_SCALE // 20  # (1-d)·SCALE with d = 17/20
    its = []
    prev = "rank0"
    for i in range(1, PR_ITERS + 1):
        its.append(f"""
    it{i} AS (
        SELECT e.v AS node,
               {base} + (17 * CAST(SUM(p.r // dg.d) AS BIGINT)) // 20 AS r
        FROM und e
        JOIN {prev} p ON p.node = e.u
        JOIN deg dg ON dg.node = e.u
        GROUP BY e.v
    )""")
        prev = f"it{i}"
    return f"""
    WITH {_SQL_UND_BASE}, deg AS (
        SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u
    ), rank0 AS (
        SELECT node, {PR_SCALE}::BIGINT AS r FROM deg
    ), {', '.join(its)}
    SELECT p.node AS doc_id, dg.d AS degree, p.r AS rank_scaled,
           CAST(p.r AS DOUBLE) / {float(PR_SCALE)} AS rank
    FROM {prev} p JOIN deg dg ON dg.node = p.node
    """


@query("graph_pagerank", oracle=_sql_pagerank())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup graph — which documents sit at the
    center of duplication families (canonical-pick signal: collapse a
    cluster onto its highest-centrality member rather than its lowest
    doc_id).

    Fixed PR_ITERS power sweeps, each ONE join + ONE hash aggregate
    keyed on the destination node (the textbook MapReduce PageRank —
    contributions fan out map-side, partial-sum before the shuffle);
    `localCheckpoint` truncates lineage per sweep so the plan stays
    O(1) deep. The und graph is symmetric, so every node has in-edges
    and no dangling-mass redistribution is needed. All arithmetic is
    scaled-int64 (see PR_SCALE note) — floor division on positive
    values, where Spark's `div` and DuckDB's `//` agree — making the
    full 3-sweep fixpoint value-replayable by the oracle.
    """
    _, und = _und_edges(spark, sf_dir)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # (node, d) is referenced every sweep; tiny (one row per graph
    # node), so checkpoint once instead of re-aggregating per sweep
    deg = deg.localCheckpoint(eager=True)
    src = und.join(deg.withColumnRenamed("node", "u"), "u")
    base = 3 * PR_SCALE // 20
    ranks = deg.select("node", F.lit(PR_SCALE).alias("r"))
    for _ in range(PR_ITERS):
        contrib = src.join(
            ranks.withColumnRenamed("node", "u"), "u"
        ).select("v", F.expr("r div d").alias("c"))
        ranks = (
            contrib.groupBy(F.col("v").alias("node"))
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(base) + F.expr("(17 * s) div 20")).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.join(deg, "node").select(
        F.col("node").alias("doc_id"),
        F.col("d").alias("degree"),
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / float(PR_SCALE)).alias("rank"),
    )


#: Multi-source BFS: hop-distance from the even-doc_id seed set,
#: bounded sweeps. Integer distances + MIN folds make every frontier a
#: pure integer function of the graph — bit-identical across engines,
#: partitionings, and runs.
BFS_HOPS = 3
BFS_SEED_MOD = 2


def _sql_bfs() -> str:
    its = []
    prev = "r0"
    for i in range(1, BFS_HOPS + 1):
        its.append(f"""
    r{i} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.v AS node, r.dist + 1 AS dist
            FROM und e JOIN {prev} r ON r.node = e.u
        ) f GROUP BY node
    )""")
        prev = f"r{i}"
    return f"""
    WITH {_SQL_UND_BASE}, r0 AS (
        SELECT DISTINCT u AS node, 0 AS dist FROM und
        WHERE u % {BFS_SEED_MOD} = 0
    ), {', '.join(its)}
    SELECT node AS doc_id, CAST(dist AS BIGINT) AS dist FROM {prev}
    """


@query("graph_bfs", oracle=_sql_bfs())
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the near-dup graph: minimum hop distance
    from the seed set (even doc_ids) within BFS_HOPS sweeps — the
    bounded-iteration traversal primitive (label propagation, contagion
    radius, "how far does this duplication family reach from the
    curated seed corpus").

    Scale pattern (same family as `graph_pagerank` and the large-star
    clustering): each sweep is ONE join (frontier × edges) + ONE
    MIN-fold hash aggregate keyed on the reached node — contributions
    partial-aggregate map-side before the shuffle, and the frontier
    never exceeds the reachable node set (monotone saturation; no
    exponential path blowup because the MIN fold collapses per node
    every sweep). `localCheckpoint` truncates lineage per sweep so the
    plan stays O(1) deep instead of growing a 2^hops join tree.
    Distances are small integers with MIN folds — no floats anywhere,
    so the full fixpoint is bit-replayable by the oracle's unrolled
    CTE chain.

    Reference parity: the reference has no graph notion
    (/root/reference/spark_process_script.py answers one flat COUNT);
    this extends the engine's near-dup graph family named by
    SURVEY.md §2.3.
    """
    _, und = _und_edges(spark, sf_dir)
    frontier = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .filter(F.col("node") % BFS_SEED_MOD == 0)
        .withColumn("dist", F.lit(0))
    )
    for _ in range(BFS_HOPS):
        hop = und.join(
            frontier.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        frontier = (
            frontier.unionByName(hop)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return frontier.select(
        F.col("node").alias("doc_id"), F.col("dist").cast("long").alias("dist")
    )


#: Label propagation: fixed synchronous sweeps (the k-means/BFS
#: bounded-iteration discipline — at 100 TB you run R sweeps, not to
#: convergence; sync + total-order tie-break also sidesteps async
#: LPA's run-order nondeterminism, which would be un-oracle-able).
LPA_ROUNDS = 3


def _sql_lpa_round(i: int) -> str:
    return f"""l{i} AS (
        SELECT node, label FROM (
            SELECT e.u AS node, l.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.u
                       ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM und e JOIN l{i - 1} l ON l.node = e.v
            GROUP BY e.u, l.label
        ) WHERE rn = 1
    )"""


def _sql_lpa() -> str:
    rounds = ", ".join(_sql_lpa_round(i) for i in range(1, LPA_ROUNDS + 1))
    return f"""
    WITH {_SQL_UND_BASE}, l0 AS (
        SELECT DISTINCT u AS node, u AS label FROM und
    ), {rounds},
    sized AS (
        SELECT label AS community, COUNT(*) AS community_size
        FROM l{LPA_ROUNDS} GROUP BY label
    )
    SELECT l.node AS doc_id, l.label AS community,
           CAST(s.community_size AS BIGINT) AS community_size
    FROM l{LPA_ROUNDS} l JOIN sized s ON s.community = l.label
    """


@query("graph_label_propagation", oracle=_sql_lpa())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup graph by synchronous
    label propagation (Raghavan et al.): LPA_ROUNDS sweeps where each
    node adopts the most frequent label among its neighbors (ties →
    smallest label), starting from self-labels.

    Communities are a DIFFERENT lens than `dedup_clusters`' connected
    components: components answer "what is transitively linked at
    all" (the dedup collapse unit), LPA splits a component along its
    dense cores — template families inside a loosely-bridged blob —
    the signal a curation pass uses to collapse per-family instead of
    per-component when bridges are spurious.

    Determinism (the oracle-ability problem with classic LPA): async
    update order is run-dependent, so this is the SYNCHRONOUS variant
    with a (count DESC, label ASC) total-order vote and a FIXED sweep
    count — every round is a pure function of the edge set, replayed
    row-for-row by the unrolled-CTE oracle (the `graph_bfs`
    discipline; bipartite oscillation is bounded by the fixed R, not
    hidden by convergence luck).

    Scale shape per sweep: one edges⋈labels hash join (labels shuffle
    on node id — never the corpus) + one (node, label) aggregate +
    one per-node WindowGroupLimit argmax; `localCheckpoint` truncates
    lineage between sweeps so the plan stays O(1) deep. Pair base:
    `near_dup_pairs` (banded, guarded recall), as all graph_* keys.
    """
    _, und = _und_edges(spark, sf_dir)
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        votes = (
            und.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("label"))
            .localCheckpoint(eager=True)
        )
    sized = labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return (
        labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("community")
        )
        .join(F.broadcast(sized), "community")
        .select("doc_id", "community", "community_size")
    )
