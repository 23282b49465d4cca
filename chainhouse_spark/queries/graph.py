"""Graph analytics over a derived co-purchase graph.

Nodes are parts; an undirected edge (a, b), a < b, exists when both parts
appear in the same order. Edge derivation, degree distribution, and triangle
counting are all plain relational algebra — exactly how ClickHouse users do
graph-shaped rollups over the reference's event tables — so they get full
DuckDB oracles. PageRank is genuinely iterative (driver-side loop over
DataFrame steps), which SQL can't express without recursion over floats;
its oracled surface is the invariant summary (node count + mass
conservation + positivity) per the twin pattern in queries/sketches.py.

Scale notes:
- Edges: the self-join is per-order (co-partitioned on l_orderkey); output
  is sum-of-squares of order sizes, bounded because order size is bounded.
- Triangles: wedge-join on the shared endpoint then closure probe against
  the edge set. Production systems orient edges by degree (lo-degree ->
  hi-degree) to bound wedge fan-out under skew; id-orientation here keeps
  the oracle identical and the testdata degree distribution is flat.
- PageRank: each iteration is one shuffle (contributions grouped by dst);
  ranks localCheckpoint'ed every few iterations so the lineage/plan stays
  constant-size instead of growing per iteration.

Connected components (the other standard graph op) already powers
semantic/minhash dedup clustering: `operators/components.py`, oracle-checked
via a recursive-CTE fixpoint in `llm_pipeline.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

_EDGE_CTE = """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


def _order_part_pairs(li: DataFrame) -> DataFrame:
    """One row per (order, part pair a<b) — the in-row form of the op
    self-join the oracle CTE states declaratively. Each order's distinct
    parts are collect_set'ed into one sorted array (a single aggregate
    with map-side partial sets — collect_set dedups, so no separate
    DISTINCT pass) and the a<b pairs are generated IN-ROW by slicing the
    sorted array, the same idiom audience_overlap_matrix uses. Replaces
    distinct → self-join (3 exchanges + an SMJ at plan time: one for the
    distinct, one per join side) with ONE exchange and no join (guide
    §2.4 "remove shuffles outright"); per-row fanout is bounded because
    order size is bounded. Result multiset identical: an order with part
    set S emits exactly {(a,b): a,b ∈ S, a<b}, once each."""
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (a, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "b -> struct(a AS src, b AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return _order_part_pairs(li).distinct()


@register(
    "graph_degree_distribution",
    oracle=_EDGE_CTE
    + """
    , deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT src AS node FROM e
            UNION ALL
            SELECT dst AS node FROM e
        ) GROUP BY node
    )
    SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph (each undirected edge
    contributes one degree to both endpoints)."""
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


@register(
    "graph_triangle_count",
    oracle=_EDGE_CTE
    + """
    SELECT
        (SELECT COUNT(*) FROM e) AS n_edges,
        (SELECT COUNT(*) FROM (
            SELECT 1 FROM e e1
            JOIN e e2 ON e1.dst = e2.src
            JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        )) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count: wedges (a<b<c via id-ordered edges) closed against
    the edge set. Two hash joins; every triangle is counted exactly once
    because edges are oriented low-id -> high-id.

    Lazy localCheckpoint, not .cache(): a CacheManager entry with no
    paired unpersist outlives the query in a resident session (round-13;
    the checkpoint blocks are freed when the RDD is GC'd), with the same
    materialize-once semantics for the three-way self-join."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=False)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
    tri = wedges.join(
        e3,
        (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
    )
    return e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "graph_pagerank",
    oracle=_EDGE_CTE
    + """
    , nodes AS (SELECT src AS n FROM e UNION SELECT dst AS n FROM e)
    SELECT COUNT(*) AS n_nodes,
           TRUE AS mass_conserved,
           TRUE AS all_positive
    FROM nodes
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 iterations) on the co-purchase graph.
    Each iteration: contributions = rank/degree sent along both edge
    directions, grouped by destination — one shuffle per iteration,
    partitioned on the node key throughout.

    The rank vector is an iterative float fixpoint (engine-specific to the
    last ulp, not SQL-expressible), so the oracled surface is the
    invariant: node count (cross-checked against the edge relation) + mass
    conservation (ranks sum to 1 within 1e-6 — the damping identity holds
    exactly because every node here has degree >= 1) + positivity. The
    full top-k rank output stays available via this module's loop body and
    is exercised in the bench."""
    e = _edges(spark, sf_dir)
    # Undirected: materialize both directions once. Lazy localCheckpoints
    # (not .cache(): no CacheManager entry to leak in a resident session);
    # the deg.count() below materializes both in one job.
    edges = (
        e.select("src", "dst")
        .unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    n_nodes = deg.count()
    ranks = deg.select("src", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(5):
        contribs = (
            edges.join(ranks, "src")
            .join(deg, "src")
            .select(F.col("dst").alias("src"), (F.col("rank") / F.col("degree")).alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = deg.select("src").join(contribs, "src", "left").select(
            "src",
            (
                F.lit(0.15 / n_nodes)
                + F.lit(0.85) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank"),
        )
        if i % 2 == 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.abs(F.sum("rank") - F.lit(1.0)) < F.lit(1e-6)).alias("mass_conserved"),
        (F.min("rank") > F.lit(0.0)).alias("all_positive"),
    )


@register(
    "graph_bfs_hops",
    # the recursive fixpoint needs the RECURSIVE keyword in DuckDB
    oracle=_EDGE_CTE.replace("WITH op", "WITH RECURSIVE op") + """,
    und AS (
        SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ),
    s AS (SELECT MIN(src) AS s FROM e),
    r AS (
        SELECT s AS node, 0 AS hops FROM s
        UNION
        SELECT und.dst AS node, r.hops + 1 AS hops
        FROM r JOIN und ON und.src = r.node
        WHERE r.hops < 3
    )
    SELECT CAST(hops AS INT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM (SELECT node, MIN(hops) AS hops FROM r GROUP BY node)
    GROUP BY hops ORDER BY hops
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS from the minimum-id node: how many parts sit 0/1/2/3
    co-purchase hops away. Iterative frontier expansion — each level is
    ONE join of the current frontier against the (undirected) edge list
    plus an anti-join against the visited set, so level cost tracks
    frontier x avg-degree, never nodes^2. The DuckDB oracle is the exact
    recursive-CTE fixpoint (UNION-dedup on (node, hops), MIN per node),
    making this one of the few ITERATIVE operators with a full value
    oracle rather than an invariant twin.

    At 100 TB the visited set and frontier are (node, hop) pairs —
    broadcastable for the hub-and-spoke graphs BFS is used on; for
    adversarial giant frontiers the joins degrade gracefully to shuffle
    joins on node id."""
    edges = _edges(spark, sf_dir)
    und = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    source = edges.agg(F.min("src")).first()[0]

    visited = spark.createDataFrame([(int(source), 0)], "node long, hops int")
    frontier = visited
    for depth in range(1, 4):
        nxt = (
            frontier.join(und, frontier.node == und.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return (
        visited.groupBy("hops")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("hops")
    )


@register(
    "graph_link_prediction",
    oracle=_EDGE_CTE
    + """,
    und AS (
        SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY src),
    cand AS (
        SELECT w1.src AS a, w2.dst AS b,
               CAST(COUNT(DISTINCT w1.dst) AS BIGINT) AS common_neighbors
        FROM und w1 JOIN und w2 ON w1.dst = w2.src
        WHERE w1.src < w2.dst
        GROUP BY w1.src, w2.dst
    ),
    nonedge AS (
        SELECT cand.* FROM cand
        ANTI JOIN e ON cand.a = e.src AND cand.b = e.dst
    ),
    scored AS (
        SELECT a, b, common_neighbors,
               (ROUND((CAST(common_neighbors AS DOUBLE)
                   / (da.d + db.d - common_neighbors)) * 1e9) / 1e9 + 0.0) AS jaccard
        FROM nonedge
        JOIN deg da ON da.node = a
        JOIN deg db ON db.node = b
    )
    SELECT a, b, common_neighbors, jaccard
    FROM scored
    ORDER BY common_neighbors DESC, jaccard DESC, a, b
    LIMIT 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: for node pairs at distance
    2 that are NOT already edges, the common-neighbor count and the Jaccard
    coefficient of their neighborhoods |N(a)∩N(b)| / |N(a)∪N(b)| — the
    classic recommender primitives. Wedge endpoints enumerate the candidate
    set (an equi-join on the shared middle, the triangle machinery reused),
    existing edges drop via an ANTI join, and the degree table (which grows
    linearly with |nodes|) joins back equi-keyed with the broadcast-vs-
    shuffle choice left to AQE — never force-broadcast.
    Jaccard is a single division of exact integers. Top-20 is an ordered
    limit, never a global sort. Lazy localCheckpoint on the shared edge
    table (not .cache() — no unpaired CacheManager entry, round-13)."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=False)
    und = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    w1, w2 = und.alias("w1"), und.alias("w2")
    cand = (
        w1.join(w2, F.col("w1.dst") == F.col("w2.src"))
        .filter(F.col("w1.src") < F.col("w2.dst"))
        .groupBy(F.col("w1.src").alias("a"), F.col("w2.dst").alias("b"))
        .agg(F.countDistinct(F.col("w1.dst")).cast("bigint").alias("common_neighbors"))
    )
    nonedge = cand.join(
        e,
        (cand["a"] == e["src"]) & (cand["b"] == e["dst"]),
        "left_anti",
    )
    # Degree tables grow linearly with |nodes| — never force-broadcast them;
    # the joins stay equi-joins and AQE picks broadcast vs shuffle from the
    # measured size at runtime (SCALE.md "marginal-table joins").
    da, db = deg.alias("da"), deg.alias("db")
    scored = (
        nonedge.join(da, F.col("a") == F.col("da.node"))
        .join(db, F.col("b") == F.col("db.node"))
        .select(
            "a",
            "b",
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("da.d") + F.col("db.d") - F.col("common_neighbors")),
                9,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("common_neighbors"), F.desc("jaccard"), F.asc("a"), F.asc("b")
    ).limit(20)


_LP_ROUND_SQL = """
    r{k} AS (
        SELECT n.node,
               CASE WHEN n.seed_lbl IS NOT NULL THEN n.seed_lbl
                    ELSE m.new_lbl END AS lbl,
               n.seed_lbl
        FROM nodes n
        LEFT JOIN (
            SELECT node, lbl AS new_lbl FROM (
                SELECT d.node, p.lbl,
                       ROW_NUMBER() OVER (
                           PARTITION BY d.node
                           ORDER BY COUNT(*) DESC, p.lbl ASC
                       ) AS rk
                FROM bi d JOIN r{km1} p ON d.nbr = p.node
                WHERE p.lbl IS NOT NULL
                GROUP BY d.node, p.lbl
            ) WHERE rk = 1
        ) m ON m.node = n.node
    )"""


@register(
    "graph_label_propagation",
    oracle=_EDGE_CTE
    + """,
    bi AS (
        SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst AS node, src AS nbr FROM e
    ),
    nodes AS (
        SELECT DISTINCT node,
               CASE WHEN node % 10 < 3 THEN CAST((node // 10) % 5 AS INT) END
                 AS seed_lbl
        FROM bi
    ),
    r0 AS (SELECT node, seed_lbl AS lbl, seed_lbl FROM nodes),"""
    + _LP_ROUND_SQL.format(k=1, km1=0)
    + ","
    + _LP_ROUND_SQL.format(k=2, km1=1)
    + ","
    + _LP_ROUND_SQL.format(k=3, km1=2)
    + """
    SELECT lbl AS label,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) FILTER (WHERE seed_lbl IS NOT NULL) AS BIGINT)
             AS n_seeded
    FROM r3 GROUP BY lbl
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002 /
    Raghavan et al. 2007 LPA) over the co-purchase graph: 30% of nodes
    carry a seed label ((node DIV 10) % 5 — deterministic, 5 classes), three synchronous
    rounds spread labels to the rest; unlabeled nodes adopt the MODAL
    label of their labeled neighbors, ties broken by smallest label so
    every round is engine-reproducible (classic LPA tie-breaks randomly).
    Seeds are immutable. The weakly-supervised corpus-labeling pattern:
    a few labeled domains propagate topic labels through the link graph.

    Scale: each round is one neighbor equi-join + one (node, label) count
    aggregate + a window PARTITIONED by node — no global state, rounds =
    label radius (3 here), exactly the iterated-join shape PageRank uses.
    Output is the label histogram after round 3."""
    edges = _edges(spark, sf_dir)
    bi = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).unionAll(edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr")))
    nodes = bi.select("node").distinct().select(
        "node",
        F.when(
            F.col("node") % 10 < 3, F.expr("CAST((node DIV 10) % 5 AS INT)")
        ).alias("seed_lbl"),
    )
    from pyspark.sql import Window

    lbl = nodes.select("node", F.col("seed_lbl").alias("lbl"), "seed_lbl")
    for _ in range(3):
        votes = (
            bi.join(
                lbl.select(F.col("node").alias("nbr"), F.col("lbl").alias("p_lbl")),
                "nbr",
            )
            .filter(F.col("p_lbl").isNotNull())
            .groupBy("node", "p_lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("p_lbl"))
        modal = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", F.col("p_lbl").alias("new_lbl"))
        )
        lbl = nodes.join(modal, "node", "left").select(
            "node",
            F.coalesce(F.col("seed_lbl"), F.col("new_lbl")).alias("lbl"),
            "seed_lbl",
        )
    return lbl.groupBy(F.col("lbl").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.when(F.col("seed_lbl").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_seeded"),
    )


_KCORE_ROUND_SQL = """
    keep{k} AS MATERIALIZED (
        SELECT node FROM (
            SELECT node, COUNT(*) AS deg
            FROM bi
            WHERE node IN (SELECT node FROM keep{km1})
              AND nbr IN (SELECT node FROM keep{km1})
            GROUP BY node
        ) WHERE deg >= 3
    )"""


@register(
    "graph_kcore_peel",
    oracle=_EDGE_CTE
    + """,
    bi AS MATERIALIZED (
        SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst AS node, src AS nbr FROM e
    ),
    keep0 AS MATERIALIZED (SELECT DISTINCT node FROM bi),"""
    + _KCORE_ROUND_SQL.format(k=1, km1=0)
    + ","
    + _KCORE_ROUND_SQL.format(k=2, km1=1)
    + ","
    + _KCORE_ROUND_SQL.format(k=3, km1=2)
    + """
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM keep0) AS n_nodes_start,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM keep3) AS n_nodes_kept,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM e
         WHERE src IN (SELECT node FROM keep3)
           AND dst IN (SELECT node FROM keep3)) AS n_edges_kept,
        (SELECT CAST(COALESCE(MIN(deg), 0) AS BIGINT) FROM (
            SELECT COUNT(*) AS deg FROM bi
            WHERE node IN (SELECT node FROM keep3)
              AND nbr IN (SELECT node FROM keep3)
            GROUP BY node)) AS min_degree_kept
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core peeling (Seidman 1983; Batagelj-Zaversnik is the sequential
    exact algorithm — distributed systems run exactly this synchronous
    peel): three rounds of 'drop every node whose degree within the
    surviving subgraph is < 3'. Three rounds bound the work (a fixpoint
    loop converges in O(peel depth) rounds on real graphs); the summary
    reports survivors, surviving edges, and the min degree among them —
    min_degree_kept >= 3 iff the peel already converged. The community-
    density prefilter dedup pipelines use before expensive pairwise
    stages.

    Scale: one full-degree aggregate up front, then each round only
    touches the CHANGED part of the graph — the removed set and its
    incident edges (the incremental form; see the in-body comment for the
    equivalence argument). All equi-joins on node ids, no global state.
    The edge list and each round's degree table are localCheckpoint'ed:
    every reference otherwise duplicates its whole upstream tree in the
    final plan (keep_3 appears 2^3 times, each copy containing the
    order-part pair derivation — measured 79 s at sf0.1 vs ~1 s
    checkpointed when this query joined the bench set in round 7)."""
    edges = _edges(spark, sf_dir)
    bi = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionAll(
            edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
        .localCheckpoint(eager=False)
    )
    # INCREMENTAL peel (round-12 optimization, guide §1.2 step 1): the
    # synchronous round "recompute every survivor's degree within the
    # surviving subgraph" does not need the two whole-bi semi-joins the
    # first form paid per round — degrees only CHANGE at neighbors of the
    # nodes removed that round, and the removed sets are disjoint, so
    #   deg_k(n) = deg_{k-1}(n) − |nbrs(n) ∩ removed_{k-1}|
    # for every n surviving into round k. Each round therefore joins bi
    # against the (small, shrinking) removed set instead of semi-joining
    # the whole edge list twice: AQE sees the removed side's size at
    # runtime and picks broadcast locally (no forced broadcast — removed
    # grows with the graph, the marginal-joins rule), and the only
    # bi-sized work per round is one skinny (node, nbr) exchange at
    # worst. Round results are provably identical to the recompute form:
    # keep_k = {n ∈ keep_{k-1}: deg_{k-1}(n) ≥ 3} either way.
    d = (
        bi.groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    n_start = d.count()
    for _ in range(3):
        removed = (
            d.filter(F.col("deg") < 3).select("node").localCheckpoint(eager=False)
        )
        if removed.count() == 0:
            # Exact fixpoint: a round that removes nothing leaves every
            # degree unchanged, so further rounds are identity — the
            # Batagelj peel's natural termination.
            break
        delta = (
            bi.join(removed.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("dd"))
        )
        d = (
            d.filter(F.col("deg") >= 3)
            .join(delta, "node", "left_outer")
            .select(
                "node",
                (F.col("deg") - F.coalesce("dd", F.lit(0))).alias("deg"),
            )
            .localCheckpoint(eager=False)
        )
    # Final stats come straight off the degree table — d already holds
    # every survivor's degree WITHIN the surviving subgraph, so the
    # kept-edge count is sum(deg)/2 and no semi-join recompute is needed.
    # min_degree matches the recompute form's GROUP BY semantics: a
    # survivor with zero surviving edges produced no degree row there, so
    # zeros are excluded from the minimum (all-zero -> NULL -> 0).
    deg_stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes_kept"),
        F.coalesce((F.sum("deg") / 2).cast("bigint"), F.lit(0)).alias(
            "n_edges_kept"
        ),
        F.coalesce(
            F.min(F.when(F.col("deg") >= 1, F.col("deg"))), F.lit(0)
        )
        .cast("bigint")
        .alias("min_degree_kept"),
    )
    return deg_stats.select(
        F.lit(n_start).cast("bigint").alias("n_nodes_start"),
        "n_nodes_kept",
        "n_edges_kept",
        "min_degree_kept",
    )


@register(
    "graph_assortativity",
    oracle=_EDGE_CTE
    + """,
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e
        ) GROUP BY node
    ),
    pairs AS (
        -- each undirected edge contributes both orientations, the standard
        -- symmetrization for the Newman assortativity formula
        SELECT da.d AS x, db.d AS y
        FROM e JOIN deg da ON e.src = da.node JOIN deg db ON e.dst = db.node
        UNION ALL
        SELECT db.d AS x, da.d AS y
        FROM e JOIN deg da ON e.src = da.node JOIN deg db ON e.dst = db.node
    ),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM pairs
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           (ROUND(((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
             ) * 1e9) / 1e9 + 0.0) AS degree_assortativity
    FROM m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all edges — positive means hubs link to hubs
    (social-graph shape), negative means hub-and-spoke (web/biology
    shape); the one-number structural fingerprint next to the degree
    histogram. Exact integer power sums over both edge orientations (the
    standard symmetrization), one shared float formula on the 6-number
    row. Scale: two degree equi-joins onto the edge list + a scalar
    gather — no windows, no iteration."""
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ed = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dy")), "dst")
        .select("dx", "dy")
    )
    pairs = ed.select(F.col("dx").alias("x"), F.col("dy").alias("y")).unionAll(
        ed.select(F.col("dy").alias("x"), F.col("dx").alias("y"))
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    return m.selectExpr(
        "CAST(n / 2 AS BIGINT) AS n_edges",
        "(ROUND(((n * sxy - sx * sy)"
        " / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))"
        ") * 1e9) / 1e9 + 0.0) AS degree_assortativity",
    )


@register(
    "graph_local_clustering",
    oracle=_EDGE_CTE
    + """,
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1
        JOIN e e2 ON e1.dst = e2.src
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    tri_per_node AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b AS node FROM tri
            UNION ALL SELECT c AS node FROM tri
        ) GROUP BY node
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e
        ) GROUP BY node
    ),
    coeff AS (
        SELECT deg.node,
               CASE WHEN deg.d < 2 THEN 0.0
                    ELSE ROUND(2.0 * COALESCE(t, 0) / (deg.d * (deg.d - 1)), 9)
               END AS cc
        FROM deg LEFT JOIN tri_per_node ON deg.node = tri_per_node.node
    )
    SELECT
        CASE WHEN cc = 0 THEN 'zero' WHEN cc < 0.25 THEN 'low'
             WHEN cc < 0.5 THEN 'mid' WHEN cc < 1 THEN 'high'
             ELSE 'clique' END AS cc_band,
        CAST(COUNT(*) AS BIGINT) AS n_nodes,
        ROUND(AVG(cc), 9) AS mean_cc
    FROM coeff GROUP BY 1
    """,
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient distribution (Watts-Strogatz 1998):
    per node, closed triangles / possible wedges 2T/(d(d-1)), banded into
    a five-bucket histogram — the small-world diagnostic that separates
    community-dense co-purchase neighborhoods from hub-and-spoke ones.
    Triangles enumerate once via the id-ordered two-join (the
    graph_triangle_count shape: each triangle exactly once), then explode
    to their three corners — node-keyed aggregates after that. Every cc
    is a ratio of exact integers rounded once; AVG over per-band
    quantized values is the one double (identical operand multisets in
    both engines, and bands are disjoint so the sums are small). The
    triangle join is the scale cost: edges oriented low->high bound each
    join key's fanout by the max out-degree. Lazy localCheckpoint on the
    shared edge table (not .cache() — no unpaired CacheManager entry,
    round-13)."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=False)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tri_nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    coeff = deg.join(tri_nodes, "node", "left").select(
        F.when(F.col("d") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                2.0
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                9,
            )
        )
        .alias("cc")
    )
    return (
        coeff.select(
            F.when(F.col("cc") == 0, "zero")
            .when(F.col("cc") < 0.25, "low")
            .when(F.col("cc") < 0.5, "mid")
            .when(F.col("cc") < 1, "high")
            .otherwise("clique")
            .alias("cc_band"),
            "cc",
        )
        .groupBy("cc_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.round(F.avg("cc"), 9).alias("mean_cc"),
        )
    )


@register(
    "basket_pair_lift",
    oracle=_EDGE_CTE
    + """,
    pair_counts AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    part_counts AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part FROM op
        GROUP BY l_partkey
    ),
    n_orders AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM op
    )
    SELECT pa, pb, n_both,
           ROUND(CAST(n_both AS DOUBLE) / n, 9) AS support,
           ROUND(CAST(n_both AS DOUBLE) * n
                 / (ca.n_part * CAST(cb.n_part AS DOUBLE)), 9) AS lift
    FROM pair_counts
    JOIN part_counts ca ON ca.l_partkey = pa
    JOIN part_counts cb ON cb.l_partkey = pb
    CROSS JOIN n_orders
    WHERE n_both >= 2
    ORDER BY CAST(n_both AS DOUBLE) * n
             / (ca.n_part * CAST(cb.n_part AS DOUBLE)) DESC, pa, pb
    LIMIT 20
    """,
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased parts: support
    and lift for part pairs seen in >= 2 orders, top-20 by lift — the
    recommendation-seed query retail runs nightly (lift >> 1: the pair
    co-occurs far above independence). Reuses the co-purchase join keyed
    on l_orderkey (per-order pair fanout is bounded by order size); part
    marginals broadcast back; every measure is a ratio of exact integers
    rounded once. Top-20 via ordered limit, never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    pair_counts = _order_part_pairs(li).groupBy(
        F.col("src").alias("pa"), F.col("dst").alias("pb")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    part_counts = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_part")
    )
    n_orders = op.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n")
    )
    ca = part_counts.select(
        F.col("l_partkey").alias("pa"), F.col("n_part").alias("na")
    )
    cb = part_counts.select(
        F.col("l_partkey").alias("pb"), F.col("n_part").alias("nb")
    )
    lift = (
        F.col("n_both").cast("double")
        * F.col("n")
        / (F.col("na") * F.col("nb").cast("double"))
    )
    # Per-part marginal tables grow linearly with |parts| — no forced
    # broadcast; AQE decides from runtime size (SCALE.md "marginal-table
    # joins"). The 1-row n_orders scalar stays an explicit broadcast.
    return (
        pair_counts.filter(F.col("n_both") >= 2)
        .join(ca, "pa")
        .join(cb, "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n"), 9).alias(
                "support"
            ),
            F.round(lift, 9).alias("lift"),
            lift.alias("__lift_raw"),
        )
        .orderBy(F.desc("__lift_raw"), F.asc("pa"), F.asc("pb"))
        .limit(20)
        .drop("__lift_raw")
    )



@register(
    "graph_modularity",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT src AS node FROM e UNION ALL SELECT dst FROM e),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY node),
    nl AS (
        SELECT deg.node, deg.d, p.p_brand AS cluster
        FROM deg JOIN part p ON deg.node = p.p_partkey
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    dc AS (
        SELECT cluster, CAST(SUM(d) AS BIGINT) AS dc FROM nl GROUP BY cluster
    ),
    ec AS (
        SELECT s.cluster, CAST(COUNT(*) AS BIGINT) AS ec
        FROM e JOIN nl s ON e.src = s.node JOIN nl t ON e.dst = t.node
        WHERE s.cluster = t.cluster
        GROUP BY s.cluster
    ),
    comb AS (
        SELECT dc.cluster, dc.dc, COALESCE(ec.ec, 0) AS ec FROM dc
        LEFT JOIN ec ON dc.cluster = ec.cluster
    ),
    agg AS (
        SELECT CAST((SELECT COUNT(*) FROM nl) AS BIGINT) AS n_nodes,
               (SELECT m FROM m) AS n_edges,
               CAST(COUNT(*) AS BIGINT) AS n_communities,
               CAST(SUM(4 * (SELECT m FROM m) * ec - dc * dc) AS BIGINT)
                 AS q_num
        FROM comb
    )
    SELECT n_nodes, n_edges, n_communities,
           (ROUND((CAST(q_num AS DOUBLE)
              / (4.0 * n_edges * n_edges)) * 1e9) / 1e9 + 0.0) AS modularity
    FROM agg
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the BRAND partition measured on the co-purchase
    graph — the partition-quality score that answers "do co-purchases
    concentrate within brands, or is brand irrelevant to what ships
    together?" (Q > 0: intra-brand edges exceed the degree-preserving
    random expectation). Communities are the part's brand — a
    deterministic label, so BOTH engines evaluate the identical partition
    (an iterative community detector would be engine-specific; the
    repo's connected-components/LPA queries cover that machinery, and any
    label column can be swapped in). Q = sum_c (e_c/m - (deg_c/2m)^2) is
    evaluated as ONE exact-integer numerator sum_c (4*m*e_c - deg_c^2)
    over 4m^2 — a single float division at emission, nothing else to
    round. Scale: membership and degree joins are node-keyed equi-joins
    (AQE-decided, never force-broadcast — the membership table grows with
    |nodes|); the intra-edge check ships two longs per edge through one
    shuffle; the final sum is |communities| rows. (Round-12 measured
    NO-GO on carrying the brand label through the pair generation to
    drop these joins: the brand-widened distinct exchange cost more than
    the two AQE-broadcast membership joins it removed — 3.74 -> 4.29 s
    same-host; see OPTIMIZATION_r12.md "left alone".)"""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    e = (
        _order_part_pairs(li)  # in-row pair generation — see the helper
        .distinct()
        # e and nl feed 3+ consumers each; checkpoint so the co-purchase
        # pair derivation runs ONCE instead of once per branch (was 24
        # parquet scans re-derived from lineitem at plan time). The edge
        # table is the one intermediate that GROWS with data (~117M rows
        # at the sf10 smoke): DISK_ONLY, because the default deserialized
        # MEMORY_AND_DISK blocks OOMed the shared 8 GB heap at sf10 while
        # 32 concurrent tasks were also holding join state — at cluster
        # scale you spill a reused edge list to local disk, not the
        # storage pool.
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    sym = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    nl = deg.join(
        part.select(
            F.col("p_partkey").alias("node"), F.col("p_brand").alias("cluster")
        ),
        "node",
    ).localCheckpoint(eager=False)
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    dc = nl.groupBy("cluster").agg(F.sum("d").cast("bigint").alias("dc"))
    ec = (
        e.join(
            nl.select(F.col("node").alias("src"), F.col("cluster").alias("cl_s")),
            "src",
        )
        .join(
            nl.select(F.col("node").alias("dst"), F.col("cluster").alias("cl_t")),
            "dst",
        )
        .filter(F.col("cl_s") == F.col("cl_t"))
        .groupBy(F.col("cl_s").alias("cluster"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ec"))
    )
    comb = dc.join(ec, "cluster", "left_outer").select(
        "cluster", "dc", F.coalesce("ec", F.lit(0)).cast("bigint").alias("ec")
    )
    n_nodes = nl.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    agg = comb.crossJoin(m).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.sum(4 * F.col("m") * F.col("ec") - F.col("dc") * F.col("dc"))
        .cast("bigint")
        .alias("q_num"),
        F.min("m").cast("bigint").alias("n_edges"),
    )
    return n_nodes.crossJoin(agg).selectExpr(
        "n_nodes",
        "n_edges",
        "n_communities",
        "(ROUND((CAST(q_num AS DOUBLE) / (4.0 * n_edges * n_edges)) * 1e9)"
        " / 1e9 + 0.0) AS modularity",
    )
