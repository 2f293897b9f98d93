"""Iterative graph analytics as distributed DataFrame loops.

Two iterative operators live in the engine: min-label propagation
(operators/dedup.py:x2_dedup_clusters — connected components over the
near-dup graph) and the PageRank here. Both follow the same scale recipe:
each iteration is one join + one aggregation on the edge key (the shape
GraphX/GraphFrames lower to), with ``localCheckpoint`` cutting the growing
lineage so plan size stays constant over iterations. The reference has no
graph surface at all; this is part of the §2.12 extension set. PageRank
carries a full unrolled-CTE oracle (r4); label propagation stays rows-only
(its oracle equivalent is the recursive-CTE closure on x2_dedup_clusters;
DuckDB recursive CTEs cannot aggregate in the recursive term, so PageRank's
per-iteration SUM forces the unroll, with AS MATERIALIZED on every CTE —
inlining would re-expand each iteration's three references exponentially) —
SURVEY.md §5 layer 2 additionally pins values against a local
power-iteration reference in tests/test_kernels.py.
"""

from __future__ import annotations

from textwrap import dedent

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import QuerySpec, make_registrar

SPECS: list[QuerySpec] = []
query = make_registrar(SPECS)

N_ITER = 10
DAMPING = 0.85


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer->supplier edges weighted by distinct orders that
    connect them (lineitem joined through orders). Node ids are disjoint:
    customers keep their key, suppliers are offset into their own range."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000)).alias("dst"),
        )
        .distinct()
    )


def _pagerank_oracle() -> str:
    """Unrolled power iteration as CTEs (the MMR/BPE technique: a fixed
    iteration count turns an iterative algorithm into straight-line SQL).
    Float discipline: every constant is forced DOUBLE (bare 0.85 is
    DECIMAL in DuckDB) and the rank-update expression tree matches the
    Spark side's left-associative shape exactly, so the only cross-engine
    divergence is float-summation order inside the two SUMs — ~1e-17
    absolute after 10 iterations, invisible at the round-9 output."""
    d = "CAST(0.85 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    zero = "CAST(0 AS DOUBLE)"
    iters = []
    for k in range(1, N_ITER + 1):
        iters.append(
            f""",
        c{k} AS MATERIALIZED (
            SELECT e.dst AS node, SUM(r.rank / r.deg) AS in_sum
            FROM edges e JOIN r{k - 1} r ON e.src = r.node AND r.deg > 0
            GROUP BY e.dst
        ),
        d{k} AS MATERIALIZED (
            SELECT COALESCE(SUM(rank), {zero}) AS dm FROM r{k - 1} WHERE deg = 0
        ),
        r{k} AS MATERIALIZED (
            SELECT nd.node, nd.deg,
                   ({one} - {d}) / nn.n
                   + {d} / nn.n * d{k}.dm
                   + {d} * COALESCE(c{k}.in_sum, {zero}) AS rank
            FROM nd LEFT JOIN c{k} ON nd.node = c{k}.node
            CROSS JOIN d{k} CROSS JOIN nn
        )"""
        )
    return f"""
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nd AS MATERIALIZED (
            SELECT n.node, COALESCE(d.deg, 0) AS deg
            FROM nodes n LEFT JOIN (
                SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
            ) d ON n.node = d.src
        ),
        nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nd),
        r0 AS MATERIALIZED (SELECT node, deg, {one} / nn.n AS rank FROM nd CROSS JOIN nn){"".join(iters)}
        SELECT node, ROUND(rank, 9) AS rank FROM r{N_ITER}
        """


@query("x10_pagerank", oracle=_pagerank_oracle(), tags=("X5", "graph", "iterative"))
def x10_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 iterations, damping 0.85) over the customer->supplier
    purchase graph — the canonical iterative-algorithm shape: per
    iteration, contributions = ranks / out-degree shipped along edges (one
    equi join), new ranks = damped sum per destination (one aggregation).

    Scale notes: out-degree is joined onto the node table ONCE before the
    loop and carried on the ranks table, so each iteration is exactly two
    shuffle stages — contributions keyed on dst, the rank rebuild keyed on
    node — the shape GraphX lowers to. Dangling mass (nodes with
    ``deg == 0``, i.e. every supplier here) is a one-row aggregate over the
    ranks table that is BROADCAST back via a bounded cross join: no
    ``collect()`` and no driver action anywhere inside the loop, so all 10
    iterations submit as one lazy job graph instead of 10 driver
    round-trips (the r2 version paid an extra full-ranks anti-join action
    per iteration). ``localCheckpoint`` per iteration keeps the plan from
    growing linearly with iteration count. Fully oracle-checked since r4
    (unrolled power-iteration CTEs — see ``_pagerank_oracle``); values
    also pinned vs a numpy power iteration in tests/test_kernels.py; loop
    shape plan-guarded in tests/test_plans.py.
    """
    edges = purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # degree joined once, carried through the loop — no per-iteration
    # degree join and the deg==0 predicate gives dangling mass for free
    nodes_deg = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .localCheckpoint(eager=False)
    )

    ranks = nodes_deg.select("node", "deg", F.lit(1.0 / n).alias("rank"))
    for _ in range(N_ITER):
        ranks = pagerank_step(ranks, edges, nodes_deg, n).localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def pagerank_step(ranks: DataFrame, edges: DataFrame, nodes_deg: DataFrame, n: int) -> DataFrame:
    """One PageRank iteration as a pure DataFrame transform (no actions).

    contributions: rank/deg shipped along edges, summed per destination.
    dangling mass: one-row aggregate over deg==0 ranks, broadcast into the
    rank rebuild — a bounded (1-row) cross join, not a driver collect.
    """
    contribs = (
        edges.join(ranks.where(F.col("deg") > 0), edges.src == ranks.node)
        .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        .groupBy("node")
        .agg(F.sum("c").alias("in_sum"))
    )
    dangling = ranks.where(F.col("deg") == 0).agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
    )
    return (
        nodes_deg.join(contribs, "node", "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            "node",
            "deg",
            (
                F.lit((1.0 - DAMPING) / n)
                + F.lit(DAMPING / n) * F.col("dm")
                + F.lit(DAMPING) * F.coalesce(F.col("in_sum"), F.lit(0.0))
            ).alias("rank"),
        )
    )


@query(
    "x10_triangle_count",
    oracle="""
        WITH su AS (
            SELECT DISTINCT o.o_orderkey AS ok, l.l_suppkey AS s
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        e AS (
            SELECT a.s AS u, b.s AS v
            FROM su a JOIN su b ON a.ok = b.ok AND a.s < b.s
            GROUP BY 1, 2 HAVING COUNT(*) >= 5
        )
        SELECT (SELECT COUNT(*) FROM e) AS n_edges,
               CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """,
    tags=("X5", "graph", "triangle"),
)
def x10_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the supplier co-occurrence graph (two suppliers
    are adjacent iff they share at least 5 orders — the market-basket
    projection with a support threshold; per-order fan-out is quadratic
    only in the per-order supplier count, a small constant at every SF,
    and the threshold keeps the projected graph sparse where few
    suppliers serve many orders). The count itself uses the node-iterator++
    orientation: every edge points from its lower-(degree, id) endpoint to
    the higher one, wedges enumerate pairs of out-edges per apex, and a
    hash join against the oriented edge set closes them. Orienting by
    DEGREE (not id) bounds per-apex out-degree by O(sqrt(|E|)) even on
    power-law graphs, so the wedge table — the only super-linear
    intermediate — stays near-linear; the id-ordered oracle SQL counts the
    same triangles (orientation changes the enumeration order, never the
    set). Three hash shuffles total: edges, wedges, closure."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    su = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = su.alias("a"), su.alias("b")
    und = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 5)
        .select("u", "v")
        .localCheckpoint(eager=False)  # consumed by degree, orientation, count
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    keyed = und.join(du, "u").join(dv, "v")
    fwd = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    oriented = keyed.select(
        F.when(fwd | tie, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd | tie, F.struct("dv", "v")).otherwise(F.struct(
            F.col("du").alias("dv"), F.col("u").alias("v"))).alias("dst"),
    ).localCheckpoint(eager=False)  # consumed by wedges + closure
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = w1.join(
        w2, (F.col("w1.src") == F.col("w2.src")) & (F.col("w1.dst") < F.col("w2.dst"))
    ).select(
        F.col("w1.dst.v").alias("src"), F.col("w2.dst.v").alias("close_v")
    )
    closed = wedges.join(
        oriented.select("src", F.col("dst.v").alias("close_v")), ["src", "close_v"]
    )
    # Edge count folded in as a broadcast one-row aggregate (same
    # discipline as PageRank's dangling mass) — no driver-side action,
    # the whole query is a single job.
    edge_count = und.agg(F.count(F.lit(1)).alias("n_edges"))
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    return tri.crossJoin(F.broadcast(edge_count)).select("n_edges", "n_triangles")


# --- k-core + link prediction over the thinned purchase graph ------------
#
# Both lanes share one bipartite projection: distinct (customer, supplier)
# edges restricted to high-quantity lineitems (l_quantity >= 45) — the
# thinning keeps per-node degrees in the single digits so peeling and
# wedge enumeration have real dynamics at test SF (the full purchase graph
# is near-complete: k=4 keeps 99.9% of nodes; see the round-1 saturation
# gotcha on co-occurrence projections).

KCORE_K = 4  # minimum within-core degree
KCORE_ROUNDS = 6  # unrolled peel rounds; fixpoint measured at 2 on this
# corpus at every SF — peeling is IDEMPOTENT once converged, so extra
# unrolled rounds are no-ops and the fixed unroll stays correct if the
# cascade ever deepens (pytest pins query == peel-to-fixpoint brute force)
AA_TOP = 40  # emitted link predictions
AA_MICRO = 1_000_000  # Adamic-Adar contribution fixed-point scale


def quantity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct high-quantity (customer, supplier) purchase edges — the
    shared bipartite projection of the k-core and Adamic-Adar lanes.
    Supplier ids offset into their own range (purchase_edges discipline)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.select("l_orderkey", "l_suppkey")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + F.lit(1_000_000)).alias("sup"),
        )
        .distinct()
    )

def undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized (a, b) edge list of the thinned purchase graph — the
    ONE undirected projection every X10 iterative lane (k-core, BFS,
    walks, HyperBall, community LPA, walk pairs) runs on; a change to the
    thinning or symmetrization lands in all of them at once."""
    de = quantity_edges(spark, sf_dir)
    return (
        de.select(F.col("cust").alias("a"), F.col("sup").alias("b"))
        .union(de.select(F.col("sup"), F.col("cust")))
        .distinct()
    )


def _kcore_oracle() -> str:
    rounds = []
    for r in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f""",
        a{r} AS MATERIALIZED (
            SELECT u.a AS node FROM und u
            JOIN a{r - 1} x ON u.a = x.node
            JOIN a{r - 1} y ON u.b = y.node
            GROUP BY u.a HAVING COUNT(*) >= {KCORE_K})"""
        )
    return dedent(
        f"""
        WITH de AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS sup
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45),
        und AS MATERIALIZED (
            SELECT cust AS a, sup AS b FROM de UNION SELECT sup, cust FROM de),
        a0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM und){"".join(rounds)}
        SELECT u.a AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
        FROM und u
        JOIN a{KCORE_ROUNDS} x ON u.a = x.node
        JOIN a{KCORE_ROUNDS} y ON u.b = y.node
        GROUP BY u.a
        """
    )


@query("x10_kcore", oracle=_kcore_oracle(), tags=("X10", "graph", "iterative"))
def x10_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k={KCORE_K}) by iterative peeling: repeatedly
    drop nodes whose degree among SURVIVING nodes is < k; what remains is
    the maximal subgraph where everyone keeps >= k neighbors — the
    classic density filter for fraud rings, community seeds, and graph
    sparsification (SURVEY X10 family; the unrolled-iteration discipline
    of x10_pagerank / m9_gd_training_loop).

    Per round: two semi-equi-joins of the edge list against the alive
    set (both endpoints must survive) and one map-side-combinable degree
    count — keyed shuffles only, no driver actions; lineage flattened per
    round with localCheckpoint like PageRank.  Fixpoint is round 2 on
    this corpus (measured at sf0.001/0.01/0.1); peeling is idempotent at
    the fixpoint, so the fixed {KCORE_ROUNDS}-round unroll (mirrored
    exactly by the oracle's CTE chain) is insensitive to the cascade
    depth until it exceeds the unroll — the pytest brute force peels to
    TRUE fixpoint and pins equality, so a deeper cascade would fail
    loudly, not silently.  Output: surviving nodes with their
    within-core degree (>= k by construction — the test asserts the
    invariant)."""
    und = (
        undirected_edges(spark, sf_dir)
        .localCheckpoint(eager=False)  # consumed every round + final degree
    )
    alive = und.select(F.col("a").alias("node")).distinct()
    for _ in range(KCORE_ROUNDS):
        alive = (
            und.join(alive.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= KCORE_K)
            .select(F.col("a").alias("node"))
            .localCheckpoint(eager=False)
        )
    return (
        und.join(alive.withColumnRenamed("node", "a"), "a", "left_semi")
        .join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .select(F.col("a").alias("node"), "core_deg")
    )


BFS_SEED_MOD = 97  # seeds = suppliers whose suppkey % 97 == 0 (~1% of nodes)
BFS_ROUNDS = 8  # unrolled frontier waves; measured eccentricity from the
# seed set is 3/3/5 at sf0.001/0.01/0.1 (small-world: one customer hop
# fans to most of the graph), so the fixed unroll has >= 3 idle rounds of
# slack — and the pytest brute force runs BFS to TRUE exhaustion, so a
# deeper graph fails loudly instead of silently truncating levels.


def _bfs_oracle() -> str:
    rounds = []
    for k in range(1, BFS_ROUNDS + 1):
        rounds.append(
            f""",
        f{k} AS MATERIALIZED (
            SELECT n.node FROM (
                SELECT DISTINCT u.b AS node
                FROM und u JOIN f{k - 1} f ON u.a = f.node) n
            LEFT JOIN v{k - 1} v ON n.node = v.node
            WHERE v.node IS NULL),
        v{k} AS MATERIALIZED (
            SELECT node, lvl FROM v{k - 1}
            UNION ALL SELECT node, CAST({k} AS INTEGER) FROM f{k})"""
        )
    return dedent(
        f"""
        WITH de AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS sup
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45),
        und AS MATERIALIZED (
            SELECT cust AS a, sup AS b FROM de UNION SELECT sup, cust FROM de),
        f0 AS MATERIALIZED (
            SELECT DISTINCT a AS node FROM und
            WHERE a >= 1000000 AND (a - 1000000) % {BFS_SEED_MOD} = 0),
        v0 AS MATERIALIZED (
            SELECT node, CAST(0 AS INTEGER) AS lvl FROM f0){"".join(rounds)}
        SELECT node, lvl FROM v{BFS_ROUNDS}
        """
    )


@query("x10_bfs_levels", oracle=_bfs_oracle(), tags=("X10", "graph", "iterative"))
def x10_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (shortest hop distance) over the thinned bipartite
    purchase graph: level 0 is a deterministic ~1% supplier seed set
    (suppkey % {BFS_SEED_MOD} == 0), each wave labels the still-unvisited
    neighbors of the current frontier — the reachability / blast-radius /
    influence-propagation primitive of the X10 family, and the third
    iteration archetype beside PageRank (value diffusion) and k-core
    (monotone peeling): monotone SET GROWTH with a shrinking working set.

    Per wave: one semi-join of the edge list against the frontier
    (neighbors), one distinct, one anti-join against the visited set —
    keyed shuffles only, no driver actions inside the loop; lineage cut
    per wave with localCheckpoint (the shared recipe of every unrolled
    lane here).  The unroll is {BFS_ROUNDS} waves vs a measured seed-set
    eccentricity of 5 at the widest test SF; waves past exhaustion are
    no-ops on an empty frontier (idempotent, the k-core argument), and
    the pytest brute force runs python BFS to true exhaustion so a
    deeper-than-unroll graph FAILS the equality pin rather than silently
    dropping the tail levels.

    At 100 TB: frontier waves shrink after the small-world explosion
    (measured 11 -> 762 -> 966 -> 13891 -> 23 -> 17 -> 0 at sf0.1), so
    the dominant cost is the one fat middle wave — exactly one edge-list
    semi-join at full width; the visited anti-join is a plain equi-join
    on node (hash-shuffled, never broadcast — visited grows to |V|), and
    AQE collapses the empty tail waves to no-op stages.  Output:
    (node, lvl) for every
    reached node — this corpus is fully connected from the seeds at all
    SFs, and the test asserts reach == the brute force's reach either
    way."""
    und = (
        undirected_edges(spark, sf_dir)
        .localCheckpoint(eager=False)  # consumed by every wave
    )
    seeds = (
        und.select(F.col("a").alias("node"))
        .where(
            (F.col("a") >= 1_000_000)
            & ((F.col("a") - 1_000_000) % BFS_SEED_MOD == 0)
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = seeds.select("node", F.lit(0).cast("int").alias("lvl"))
    frontier = seeds
    for k in range(1, BFS_ROUNDS + 1):
        nbr = (
            und.join(frontier.withColumnRenamed("node", "a"), "a", "left_semi")
            .select(F.col("b").alias("node"))
            .distinct()
        )
        frontier = nbr.join(visited, "node", "left_anti").localCheckpoint(
            eager=False
        )
        visited = visited.union(
            frontier.select("node", F.lit(k).cast("int").alias("lvl"))
        ).localCheckpoint(eager=False)
    return visited


WALK_LEN = 4  # steps per walk (emitted positions 0..4)
WALK_W = 2  # walks per start node


def _h60_sql(expr: str, engine: str) -> str:
    """The repo-wide engine-neutral 60-bit hash: md5 hex prefix as BIGINT
    (Spark CONV vs DuckDB '0x' cast — identical VALUE both sides)."""
    if engine == "duckdb":
        return f"CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT)"
    return f"CAST(CONV(SUBSTR(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _walk_key_sql(w: str, k: int, node: str) -> str:
    """The (start, walk, step, node) key string both engines md5 — STRING
    is the cast spelling BOTH parse (Spark rejects bare VARCHAR; DuckDB
    aliases STRING to VARCHAR)."""
    return (
        f"CONCAT_WS(':', CAST(start AS STRING), CAST({w} AS STRING), "
        f"'{k}', CAST({node} AS STRING))"
    )


def _walk_hash_sql(w: str, k: int, node: str, engine: str) -> str:
    """60-bit md5 of the walk key — the deterministic stand-in for the
    walk's RNG draw at step k; identical VALUE from both spellings (the
    repo-wide engine-neutral hash trick: hex-prefix cast in DuckDB, CONV
    in Spark)."""
    return _h60_sql(_walk_key_sql(w, k, node), engine)


def _walks_cte_chain() -> str:
    """The shared walk-corpus CTE chain (graph -> rank-indexed adjacency
    -> unrolled hash-draw steps -> `walks` emit union) — the common prefix
    of the x10_random_walks and x10_walk_pairs oracles."""
    steps = []
    for k in range(1, WALK_LEN + 1):
        h = _walk_hash_sql("w", k, "node", "duckdb")
        steps.append(
            f""",
        s{k} AS MATERIALIZED (
            SELECT s.start, s.w, adj.b AS node
            FROM s{k - 1} s JOIN adj
              ON adj.a = s.node AND adj.rnk = ({h}) % adj.deg)"""
        )
    emits = " UNION ALL ".join(
        f"SELECT start, w, CAST({k} AS INTEGER) AS step, node FROM s{k}"
        for k in range(WALK_LEN + 1)
    )
    return f"""WITH de AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS sup
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45),
        und AS MATERIALIZED (
            SELECT cust AS a, sup AS b FROM de UNION SELECT sup, cust FROM de),
        adj AS MATERIALIZED (
            SELECT a, b,
                   ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) - 1 AS rnk,
                   COUNT(*) OVER (PARTITION BY a) AS deg
            FROM und),
        starts AS (SELECT DISTINCT a AS node FROM und),
        s0 AS MATERIALIZED (
            SELECT node AS start, w, node
            FROM starts CROSS JOIN (VALUES {", ".join(f"({w})" for w in range(WALK_W))}) AS walks(w)){"".join(steps)},
        walks AS MATERIALIZED ({emits})"""


def _random_walks_oracle() -> str:
    return dedent(
        f"""
        {_walks_cte_chain()}
        SELECT start, w, step, node FROM walks
        """
    )


@query(
    "x10_random_walks",
    oracle=_random_walks_oracle(),
    tags=("X10", "graph", "walks"),
)
def x10_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-walk corpus over the thinned purchase graph —
    the DeepWalk / node2vec DATA-PREP primitive: {WALK_W} walks of
    {WALK_LEN} steps from every node, emitted as (start, walk, step,
    node) rows ready to feed a skip-gram trainer.  The "randomness" is a
    60-bit md5 of (start, walk, step, current-node) reduced mod degree —
    the same derandomization the engine uses everywhere a sampler needs a
    hash gate (x9_dsir_resample's Gumbel keys, s10_hash_stratified):
    reproducible across engines, runs, and partitionings, which is what a
    training pipeline actually wants from walk generation.

    Scale shape: the adjacency list is indexed ONCE — rank = row_number
    over (src, ordered by dst), degree windowed in the same pass — then
    every step is ONE equi-join of the walk frontier against it on
    (node, rank): no per-node neighbor arrays collected anywhere, no
    driver loop, and the frontier stays exactly |V| x {WALK_W} rows at
    every depth, so cost is linear in walks x steps.  The adjacency
    window partitions by the edge source — the one skew-sensitive spot;
    at 100 TB a hub cap or alias-table bucketing bounds the per-key
    window, but measured max degree here is 20.  Walk extension joins
    hash-partition on the CURRENT node, the same key the next step needs.

    A node's walk always has {WALK_LEN} + 1 positions (every node in und
    has degree >= 1 by construction, so a step never dead-ends); the
    pytest brute force replays the identical hash draws in python and
    pins every emitted row."""
    und = undirected_edges(spark, sf_dir)
    win = Window.partitionBy("a").orderBy("b")
    adj = und.select(
        "a",
        "b",
        (F.row_number().over(win) - 1).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("a")).alias("deg"),
    ).localCheckpoint(eager=False)  # consumed by every step join
    cur = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .crossJoin(
            F.broadcast(
                und.sparkSession.range(WALK_W).select(
                    F.col("id").cast("int").alias("w")
                )
            )
        )
        .select(F.col("node").alias("start"), "w", "node")
        .localCheckpoint(eager=False)
    )
    out = cur.select(
        "start", "w", F.lit(0).cast("int").alias("step"), "node"
    )
    for k in range(1, WALK_LEN + 1):
        draw = F.expr(_walk_hash_sql("w", k, "node", "spark")) % F.col("deg")
        cur = (
            cur.join(adj, (adj.a == cur.node) & (adj.rnk == draw))
            .select("start", "w", F.col("b").alias("node"))
            .localCheckpoint(eager=False)  # consumed by emit + next step
        )
        out = out.unionByName(
            cur.select("start", "w", F.lit(k).cast("int").alias("step"), "node")
        )
    return out


HYPERBALL_ROUNDS = 6  # ball radii 0..6; register fixpoint measured at 4/?/5
# across test SFs, so the last rounds are saturated no-ops (the MAX merge
# is idempotent — the k-core argument); the pytest replica simulates the
# identical register algebra, so saturation is pinned too
HB_M = 16  # registers per node (4 bucket bits); error 1.04/sqrt(16) = 26%
# per node, far less on the SUMMED neighborhood function (independent-ish
# per-node errors cancel; measured ~1% at sf0.001)
HB_WBITS = 56  # 60-bit md5 hash minus the 4 bucket bits
HB_TWOP = 1 << (HB_WBITS + 1)  # 2^57: the empty-register term (r_j = 0)
HB_ALPHA = 0.673  # HLL alpha for m = 16


def _hb_sden_sql(pfx: str = "") -> str:
    """Row-level harmonic denominator over 16 register columns — exact
    BIGINT (max 16 * 2^57 = 2^61); an empty register (r_j = 0) contributes
    2^57 through the same term, so no absent-register special case."""
    return " + ".join(
        f"(CAST(1 AS BIGINT) << ({HB_WBITS + 1} - {pfx}r{j}))" for j in range(HB_M)
    )


_HB_EST_SQL = (
    f"CAST({HB_ALPHA} AS DOUBLE) * CAST({HB_M * HB_M} AS DOUBLE) "
    f"* CAST({HB_TWOP} AS DOUBLE) / CAST(sden AS DOUBLE)"
)


def _hyperball_oracle() -> str:
    cols = ", ".join(f"r{j}" for j in range(HB_M))
    init_cols = ", ".join(
        f"CASE WHEN h % {HB_M} = {j} THEN "
        f"(CASE WHEN h // {HB_M} = 0 THEN {HB_WBITS + 1} "
        f"ELSE {HB_WBITS + 1} - LENGTH(BIN(h // {HB_M})) END) "
        f"ELSE 0 END AS r{j}"
        for j in range(HB_M)
    )
    rounds = []
    for k in range(1, HYPERBALL_ROUNDS + 1):
        maxes = ", ".join(f"MAX(r{j}) AS r{j}" for j in range(HB_M))
        rounds.append(
            f""",
        g{k} AS MATERIALIZED (
            SELECT node, {maxes} FROM (
                SELECT node, {cols} FROM g{k - 1}
                UNION ALL
                SELECT u.a AS node, {cols}
                FROM und u JOIN g{k - 1} p ON u.b = p.node
            ) GROUP BY node)"""
        )
    rr = " + ".join(f"(CASE WHEN r{j} > 0 THEN 1 ELSE 0 END)" for j in range(HB_M))
    rs = " + ".join(f"r{j}" for j in range(HB_M))
    stats = []
    for k in range(HYPERBALL_ROUNDS + 1):
        stats.append(
            f"""
        SELECT CAST({k} AS INTEGER) AS radius,
               CAST(SUM(CAST(FLOOR(({_HB_EST_SQL})
                                   * CAST(1000000 AS DOUBLE)) AS BIGINT))
                    AS BIGINT) AS nf_micro,
               CAST(SUM(rr) AS BIGINT) AS reg_rows,
               CAST(SUM(rs) AS BIGINT) AS reg_sum
        FROM (SELECT ({_hb_sden_sql()}) AS sden, ({rr}) AS rr, ({rs}) AS rs
              FROM g{k})"""
        )
    return dedent(
        f"""
        WITH de AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS sup
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45),
        und AS MATERIALIZED (
            SELECT cust AS a, sup AS b FROM de UNION SELECT sup, cust FROM de),
        g0 AS MATERIALIZED (
            SELECT node, {init_cols} FROM (
                SELECT DISTINCT a AS node,
                       CAST('0x' || SUBSTR(MD5(CAST(a AS VARCHAR)), 1, 15)
                            AS BIGINT) AS h
                FROM und)){"".join(rounds)}
        {" UNION ALL ".join(stats)}
        """
    )


@query(
    "x10_hyperball",
    oracle=_hyperball_oracle(),
    tags=("X10", "graph", "sketch", "iterative"),
)
def x10_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall / HyperANF (Boldi & Vigna, WWW'11 — public algorithm):
    the neighborhood function of the thinned purchase graph — for every
    radius r, an estimate of the total number of (node, node-within-r)
    pairs — computed by seeding every node with an explicit-HLL register
    set containing its own hash and element-wise MAX-merging neighbor
    registers along edges once per radius.  THE graph x sketch fusion for
    100 TB: exact balls are quadratic to materialize, but the sketch of a
    union is the MAX of the sketches, so each radius costs one edge join
    plus one aggregation — the merge-don't-rescan property
    x5_hll_explicit's ALL row demonstrates, iterated over a graph.

    Register layout is the at-scale one: all {HB_M} registers PACKED INTO
    ONE ROW per node (16 int columns), so a radius ships |E| rows (not
    |E| x m register rows) and the merge is 16 map-side-combinable MAXes;
    per-radius stats are then pure row-level expressions — the harmonic
    denominator is an exact BIGINT sum of 16 shift terms (empty register
    r_j = 0 contributes 2^57 through the same term: no special case), and
    ONE global aggregation per radius finishes the job.  Same engine-
    neutral integer discipline as x5_hll_explicit (60-bit md5, bucket =
    low 4 bits, rank via LENGTH(BIN(w))), same determinism recipe as
    x4_bm25: the single float step (alpha * m^2 * 2^57 / sden, one fixed
    IEEE tree) is FLOORED TO MICRO-UNITS PER NODE before the global sum,
    so float accumulation order never reaches the hash.

    Honesty: balls below ~2.5m = 40 nodes sit under the raw-estimate
    regime (radius 0 is always size 1), so small radii carry the
    documented raw-regime bias — the per-query contract is DETERMINISM
    (sketch-twin pattern); accuracy is pinned in pytest at the top radius
    against the EXACT neighborhood function from python BFS (measured ~1%
    off at sf0.001 — summed per-node errors largely cancel), and the
    nonzero-register count (reg_rows) rides along so a consumer can apply
    linear counting where it wants small-ball accuracy.

    Unroll is {HYPERBALL_ROUNDS} radii vs a measured register fixpoint of
    radius <= 5 at every test SF; saturated radii repeat the converged
    row (idempotent MAX) and the pytest replica — which simulates the
    identical register algebra round by round — pins them too."""
    und = (
        undirected_edges(spark, sf_dir)
        .localCheckpoint(eager=False)  # consumed by every radius round
    )
    h = F.conv(
        F.substring(F.md5(F.col("node").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, 4)
    rho = F.when(w == 0, F.lit(HB_WBITS + 1)).otherwise(
        F.lit(HB_WBITS + 1) - F.length(F.bin(w))
    )
    regs = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select(
            "node",
            *[
                F.when(h % HB_M == j, rho).otherwise(F.lit(0)).alias(f"r{j}")
                for j in range(HB_M)
            ],
        )
        .localCheckpoint(eager=False)
    )

    def radius_stats(r: DataFrame, k: int) -> DataFrame:
        sden = F.expr(_hb_sden_sql())
        est = (
            F.lit(HB_ALPHA)
            * F.lit(float(HB_M * HB_M))
            * F.lit(float(HB_TWOP))
            / sden.cast("double")
        )
        rr = sum(
            (F.col(f"r{j}") > 0).cast("int") for j in range(1, HB_M)
        ) + (F.col("r0") > 0).cast("int")
        rs = sum(F.col(f"r{j}") for j in range(1, HB_M)) + F.col("r0")
        return r.agg(
            F.sum(F.floor(est * F.lit(1000000.0))).alias("nf_micro"),
            F.sum(rr).cast("long").alias("reg_rows"),
            F.sum(rs).cast("long").alias("reg_sum"),
        ).select(
            F.lit(k).cast("int").alias("radius"),
            "nf_micro",
            "reg_rows",
            "reg_sum",
        )

    out = radius_stats(regs, 0)
    cols = [f"r{j}" for j in range(HB_M)]
    for k in range(1, HYPERBALL_ROUNDS + 1):
        shipped = und.join(regs, und.b == regs.node).select(
            F.col("a").alias("node"), *cols
        )
        regs = (
            regs.unionByName(shipped)
            .groupBy("node")
            .agg(*[F.max(c).alias(c) for c in cols])
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(radius_stats(regs, k))
    return out


def _adamic_adar_oracle() -> str:
    return dedent(
        f"""
        WITH de AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS sup
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45),
        deg AS MATERIALIZED (
            SELECT cust, CAST(COUNT(*) AS BIGINT) AS d FROM de GROUP BY cust),
        wedge AS (
            SELECT a.sup AS sup_a, b.sup AS sup_b, g.d
            FROM de a JOIN de b ON a.cust = b.cust AND a.sup < b.sup
            JOIN deg g ON g.cust = a.cust),
        scored AS (
            SELECT sup_a, sup_b,
                   CAST(SUM(CAST(FLOOR(CAST({AA_MICRO} AS DOUBLE)
                                       / LN(CAST(d AS DOUBLE))) AS BIGINT))
                        AS BIGINT) AS aa_micro,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM wedge GROUP BY sup_a, sup_b)
        SELECT sup_a, sup_b, aa_micro, n_common
        FROM scored ORDER BY aa_micro DESC, sup_a, sup_b LIMIT {AA_TOP}
        """
    )


@query(
    "x10_adamic_adar",
    oracle=_adamic_adar_oracle(),
    tags=("X10", "graph", "link-prediction"),
)
def x10_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the bipartite purchase graph:
    score candidate supplier pairs by sum(1/ln(deg(z))) over their common
    customers z — common neighbors, down-weighted when the neighbor is a
    promiscuous hub.  The top-{AA_TOP} scored pairs are the predicted
    links (recommendation / entity-resolution primitive, X10 family).

    Determinism: each customer's contribution is floored to integer
    micro-units BEFORE the per-pair sum (the x4_bm25 recipe) — LN over
    identical doubles is bit-identical cross-engine, and the sum is then
    exact BIGINT in any accumulation order.  deg(z) >= 2 for every
    wedge-generating customer, so LN never sees 1 (guard-free by
    construction).  Ties at the cutoff are impossible to mis-order: the
    sort key (score, sup_a, sup_b) is total.

    Scale shape: candidate pairs come ONLY from wedge enumeration — a
    self-equi-join of the edge list on the customer key (never supplier x
    supplier), so work is sum_z deg(z)^2, linear in customers at fixed
    degree (measured 943 -> 17.5k -> 189k wedges across 3 decades of SF,
    max degree 8 -> 20).  At 100 TB the 1/ln down-weighting pairs with a
    hub cap (skip deg(z) > ~10^3 customers: their per-pair contribution
    is < 0.15 the median's and they alone would dominate wedge count) —
    not applied here because the measured degree ceiling is 20.  The
    global top-k lowers to TakeOrderedAndProject (orderBy().limit(), the
    DSIR lesson — never an unpartitioned row_number window)."""
    de = quantity_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )  # consumed 3x: both wedge sides + degree
    deg = de.groupBy("cust").agg(F.count(F.lit(1)).alias("d"))
    a, b = de.alias("a"), de.alias("b")
    wedge = a.join(
        b, (F.col("a.cust") == F.col("b.cust")) & (F.col("a.sup") < F.col("b.sup"))
    ).select(
        F.col("a.cust").alias("cust"),
        F.col("a.sup").alias("sup_a"),
        F.col("b.sup").alias("sup_b"),
    )
    contrib = F.floor(
        F.lit(AA_MICRO).cast("double") / F.log(F.col("d").cast("double"))
    ).cast("long")
    return (
        wedge.join(deg, "cust")
        .groupBy("sup_a", "sup_b")
        .agg(
            F.sum(contrib).alias("aa_micro"),
            F.count(F.lit(1)).alias("n_common"),
        )
        .orderBy(F.desc("aa_micro"), "sup_a", "sup_b")
        .limit(AA_TOP)
    )


# --- X10: deterministic community detection (seeded label propagation) -----

COMM_SEED_MOD = 41  # seeds = nodes whose 60-bit md5 % 41 == 0 (~2.4%)
COMM_ROUNDS = 8  # unrolled min-propagation rounds; true fixpoint measured
# at 4/3/3 at sf0.001/0.01/0.1 (the pytest runs python propagation to TRUE
# fixpoint and asserts it lands within the unroll, the kcore/bfs loud-fail
# discipline), so the fixed unroll carries >= 4 idle rounds of slack.
COMM_SHIFT = 1 << 40  # packed state = dist * 2^40 + seed id (ids < 2^40)
COMM_UNREACHED = 1 << 20  # sentinel distance for nodes with no seed in
# their component: init packs (2^20, own id), propagated candidates are
# always >= (2^20 + 1, ...), so an unreached node deterministically keeps
# itself as a singleton community. 2^20 * 2^40 = 2^60 < 2^63: no overflow.


def _comm_seed_pred_sql(engine: str) -> str:
    return f"{_h60_sql('CAST(node AS STRING)', engine)} % {COMM_SEED_MOD} = 0"


def _community_cte_chain() -> str:
    """The shared seeded-propagation CTE chain (graph -> packed init ->
    unrolled MIN rounds) — the common prefix of the x10_community_lpa and
    x10_modularity oracles; ends at s{COMM_ROUNDS}."""
    sent_base = COMM_UNREACHED * COMM_SHIFT
    rounds = []
    for k in range(1, COMM_ROUNDS + 1):
        rounds.append(
            f""",
        s{k} AS MATERIALIZED (
            SELECT node, MIN(p) AS p FROM (
                SELECT node, p FROM s{k - 1}
                UNION ALL
                SELECT u.b AS node, s.p + {COMM_SHIFT} AS p
                FROM und u JOIN s{k - 1} s ON u.a = s.node
                WHERE s.p < {sent_base}
            ) GROUP BY node)"""
        )
    return f"""WITH de AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS sup
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45),
        und AS MATERIALIZED (
            SELECT cust AS a, sup AS b FROM de UNION SELECT sup, cust FROM de),
        s0 AS MATERIALIZED (
            SELECT node,
                   CASE WHEN {_comm_seed_pred_sql("duckdb")}
                        THEN node ELSE {sent_base} + node END AS p
            FROM (SELECT DISTINCT a AS node FROM und)){"".join(rounds)}"""


def _community_oracle() -> str:
    return dedent(
        f"""
        {_community_cte_chain()}
        SELECT node, community,
               CASE WHEN rawd >= {COMM_UNREACHED}
                    THEN CAST(-1 AS INTEGER) ELSE CAST(rawd AS INTEGER)
               END AS dist,
               CAST(COUNT(*) OVER (PARTITION BY community) AS BIGINT)
                   AS comm_size
        FROM (SELECT node, p % {COMM_SHIFT} AS community,
                     p // {COMM_SHIFT} AS rawd
              FROM s{COMM_ROUNDS})
        """
    )


@query(
    "x10_community_lpa",
    oracle=_community_oracle(),
    tags=("X10", "graph", "iterative", "community"),
)
def x10_community_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic community detection over the thinned purchase graph
    by SEEDED min-label propagation (BFS-Voronoi partitioning — the
    closing member of the X10 iteration-archetype family beside PageRank
    / k-core / BFS / HyperBall): ~2.4% of nodes are hash-picked seeds
    (60-bit md5 % {COMM_SEED_MOD} == 0), and every node adopts the
    lexicographically smallest (hop distance, seed id) it can reach,
    packed into ONE BIGINT (dist * 2^40 + seed) so the whole per-round
    merge is a single map-side-combinable MIN — the same monotone-merge
    trick as HyperBall's MAX registers, which is what makes a TRUE
    fixpoint exist for the pytest python replay to pin (classic
    mode-based LPA oscillates on bipartite graphs and has no such pin).

    Per round: one equi-join of the edge list against the labeled state
    (candidates = neighbor state + 2^40) and one MIN per node — keyed
    shuffles only, zero driver actions; lineage cut per round. Nodes in
    seedless components keep a sentinel state (2^20, own id) that no
    propagated candidate (always >= 2^20 + 1 hops) can beat, so they
    deterministically emit as singleton communities with dist = -1 —
    no special-casing in the loop. Fixpoint measured at round 4/3/3
    across test SFs vs the {COMM_ROUNDS}-round unroll; idle rounds are
    no-ops under the idempotent MIN (the k-core argument). The oracle
    mirrors the unroll as MATERIALIZED CTEs over the identical packed
    integers — no float anywhere.

    At 100 TB: each round ships |E| candidate rows through one hash
    exchange on the destination key (the LPA/GraphX lower bound); a
    delta-frontier variant (ship only improved states, the BFS shape)
    bounds late-round traffic, and hash-seeding density (1/{COMM_SEED_MOD})
    controls region granularity without any global coordination. Output:
    (node, community, dist, comm_size) — the partition map plus the size
    histogram input in one pass."""
    sent_base = F.lit(COMM_UNREACHED * COMM_SHIFT).cast("long")
    und = (
        undirected_edges(spark, sf_dir)
        .localCheckpoint(eager=False)  # consumed by every round
    )
    state = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select(
            "node",
            F.when(
                F.expr(_comm_seed_pred_sql("spark")), F.col("node")
            )
            .otherwise(sent_base + F.col("node"))
            .cast("long")
            .alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(COMM_ROUNDS):
        cand = (
            und.join(
                state.where(F.col("p") < sent_base).withColumnRenamed(
                    "node", "a"
                ),
                "a",
            )
            .select(
                F.col("b").alias("node"),
                (F.col("p") + F.lit(COMM_SHIFT)).alias("p"),
            )
        )
        state = (
            state.unionByName(cand)
            .groupBy("node")
            .agg(F.min("p").alias("p"))
            .localCheckpoint(eager=False)
        )
    unpacked = state.select(
        "node",
        (F.col("p") % F.lit(COMM_SHIFT)).alias("community"),
        # integer DIV, not float /: p reaches 2^60, past double's exact range
        F.expr(f"p DIV {COMM_SHIFT}").alias("rawd"),
    )
    return unpacked.select(
        "node",
        "community",
        F.when(F.col("rawd") >= COMM_UNREACHED, F.lit(-1))
        .otherwise(F.col("rawd"))
        .cast("int")
        .alias("dist"),
        F.count(F.lit(1))
        .over(Window.partitionBy("community"))
        .cast("long")
        .alias("comm_size"),
    )


# --- X10: skip-gram training pairs from the walk corpus ---------------------

WP_WIN = 2  # skip-gram window: contexts within +-2 positions of the center
WP_NEG = 2  # hash-derandomized negative samples per positive pair
WP_SCALE = 1000  # integer weight = floor(1000 * deg^0.75 + 0.5)
WP_DEG_CAP = 4096  # POWER(deg, 0.75) differs cross-engine only at the ulp
# level (measured: 426/4096 degree values differ between Java Math.pow and
# DuckDB's C pow), which flips floor(1000*x + 0.5) only within ~1e-12 of a
# half-integer boundary; the closest boundary over deg 1..4096 is 3.5e-4
# away (pytest asserts this exhaustively), so weights are deterministic on
# the guarded domain. A degree past the cap raises rather than silently
# risking a boundary (the PARA_ID_STRIDE discipline); measured max degree
# is 20 at sf0.1.
WP_BAND = 1 << 16  # draw/interval band width for the banded containment join


def _wp_weight_sql(engine: str) -> str:
    """Integer unigram^0.75 weight of a node given its degree column."""
    w = f"CAST(FLOOR({WP_SCALE} * POWER(CAST(deg AS DOUBLE), 0.75) + 0.5) AS BIGINT)"
    if engine == "duckdb":
        return w  # oracle runs on the same guarded domain the builder checks
    return (
        f"CASE WHEN deg > {WP_DEG_CAP} THEN CAST(RAISE_ERROR(CONCAT("
        f"'degree exceeds WP_DEG_CAP ({WP_DEG_CAP}); extend the pow "
        f"boundary guard: node=', CAST(node AS STRING))) AS BIGINT) "
        f"ELSE {w} END"
    )


def _wp_draw_key_sql(r: str) -> str:
    return (
        f"CONCAT_WS(':', CAST(start AS STRING), CAST(walk AS STRING), "
        f"CAST(ci AS STRING), CAST(cj AS STRING), CAST({r} AS STRING))"
    )


def _walk_pairs_oracle() -> str:
    h = _h60_sql(_wp_draw_key_sql("r"), "duckdb")
    return dedent(
        f"""
        {_walks_cte_chain()},
        dg AS MATERIALIZED (
            SELECT a AS node, COUNT(*) AS deg FROM und GROUP BY a),
        wt AS MATERIALIZED (
            SELECT node, {_wp_weight_sql("duckdb")} AS wgt FROM dg),
        cum AS MATERIALIZED (
            SELECT node, wgt,
                   SUM(wgt) OVER (ORDER BY node
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS hi
            FROM wt),
        iv AS MATERIALIZED (
            SELECT node, CAST(hi - wgt AS BIGINT) AS lo,
                   CAST(hi AS BIGINT) AS hi FROM cum),
        tot AS (SELECT CAST(MAX(hi) AS BIGINT) AS t FROM iv),
        ivb AS MATERIALIZED (
            SELECT node, lo, hi,
                   UNNEST(RANGE(lo // {WP_BAND}, (hi - 1) // {WP_BAND} + 1))
                       AS band
            FROM iv),
        pos AS MATERIALIZED (
            SELECT a.start, a.w AS walk, a.step AS ci, b.step AS cj,
                   a.node AS center, b.node AS context
            FROM walks a JOIN walks b
              ON a.start = b.start AND a.w = b.w
             AND ABS(a.step - b.step) BETWEEN 1 AND {WP_WIN}),
        draws AS MATERIALIZED (
            SELECT p.center, ({h}) % tot.t AS d
            FROM pos p
            CROSS JOIN tot
            CROSS JOIN (VALUES {", ".join(f"({r})" for r in range(WP_NEG))}) AS negs(r)),
        neg AS MATERIALIZED (
            SELECT draws.center, ivb.node AS other
            FROM draws JOIN ivb
              ON ivb.band = draws.d // {WP_BAND}
             AND draws.d >= ivb.lo AND draws.d < ivb.hi)
        SELECT center, context AS other, CAST(1 AS INTEGER) AS label FROM pos
        UNION ALL
        SELECT center, other, CAST(0 AS INTEGER) AS label FROM neg
        """
    )


@query(
    "x10_walk_pairs",
    oracle=_walk_pairs_oracle(),
    tags=("X10", "graph", "walks", "training-prep"),
)
def x10_walk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram training pairs from the random-walk corpus — the step
    that turns x10_random_walks into the node2vec/DeepWalk data-prep
    product end to end: positives are all (center, context) co-occurrences
    within a +-{WP_WIN}-position window of each walk, and every positive
    draws {WP_NEG} hash-derandomized negative samples from the
    degree^0.75 unigram table (the word2vec noise distribution).

    Determinism: negative draws are 60-bit md5 of (start, walk, center
    position, context position, slot) reduced mod the total integer
    weight; weights are floor({WP_SCALE} * deg^0.75 + 0.5) — POWER differs
    cross-engine by ulps, but the pytest proves exhaustively that no
    degree <= {WP_DEG_CAP} lands within 1e-4 of a floor boundary (a
    RAISE_ERROR guard trips on degrees past the proven domain; measured
    max is 20). Accidental draws that hit the pair's own center/context
    are kept as-is (no rejection resampling — count-stable, and the noise
    distribution is what matters to the trainer).

    Scale shape: positives come from a self-equi-join of the corpus on
    the walk key ((start, walk): <= {WALK_LEN} + 1 rows per key — bounded
    groups, never cross-walk); negatives resolve through a BANDED interval
    containment join (draw band = d DIV 2^16 equi-joins interval bands
    expanded via sequence — the x5_interval_join_banded recipe), never a
    broadcast nested loop over the node table. The weight-table cumsum is
    the one single-task window — it is |V|-sized (dim-table class); at
    100 TB it becomes the standard two-phase partial-sum + offset scan.
    Output: raw (center, other, label) rows, the trainer's input."""
    # no extra checkpoint: the corpus is a union of the walk builder's
    # per-step checkpointed RDDs, so both self-join sides re-read those
    # cached RDDs — re-materializing the union would only add a job
    walks = x10_random_walks(spark, sf_dir)
    und = undirected_edges(spark, sf_dir)
    dg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    wt = dg.select("node", F.expr(_wp_weight_sql("spark")).alias("wgt"))
    cum = wt.select(
        "node",
        "wgt",
        F.sum("wgt")
        .over(
            Window.orderBy("node").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("hi"),
    )
    iv = cum.select(
        "node",
        (F.col("hi") - F.col("wgt")).cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
    ).localCheckpoint(eager=False)  # consumed by bands + total
    tot = iv.agg(F.max("hi").cast("long").alias("t"))
    ivb = iv.select(
        "node",
        "lo",
        "hi",
        F.explode(
            F.expr(f"sequence(lo DIV {WP_BAND}, (hi - 1) DIV {WP_BAND})")
        ).alias("band"),
    )
    a, b = walks.alias("a"), walks.alias("b")
    pos = a.join(
        b,
        (F.col("a.start") == F.col("b.start"))
        & (F.col("a.w") == F.col("b.w"))
        & F.abs(F.col("a.step") - F.col("b.step")).between(1, WP_WIN),
    ).select(
        F.col("a.start").alias("start"),
        F.col("a.w").alias("walk"),
        F.col("a.step").alias("ci"),
        F.col("b.step").alias("cj"),
        F.col("a.node").alias("center"),
        F.col("b.node").alias("context"),
    ).localCheckpoint(eager=False)  # consumed by emit + negative draws
    # r14 OPTIMIZATION: the negative-slot fan-out is a row-local
    # explode(sequence(0, WP_NEG-1)) instead of a broadcast cross join
    # (same rows, no BroadcastNestedLoopJoin breaking codegen), and the
    # 1-row weight total — bounded by construction — is collected once
    # and attached as a literal (removes the second BNLJ + its broadcast
    # sub-job; the agg job itself was already paid by the broadcast).
    # d = hash % t is the identical expression over the identical long.
    t_total = tot.collect()[0]["t"]
    draws = pos.select(
        "center",
        F.explode(F.sequence(F.lit(0), F.lit(WP_NEG - 1))).alias("r"),
        "start",
        "walk",
        "ci",
        "cj",
    ).select(
        "center",
        (F.expr(_h60_sql(_wp_draw_key_sql("r"), "spark")) % F.lit(t_total))
        .alias("d"),
    )
    neg = draws.join(
        ivb,
        (ivb.band == F.expr(f"d DIV {WP_BAND}"))
        & (F.col("d") >= F.col("lo"))
        & (F.col("d") < F.col("hi")),
    ).select("center", F.col("node").alias("other"))
    return pos.select(
        "center",
        F.col("context").alias("other"),
        F.lit(1).cast("int").alias("label"),
    ).unionByName(
        neg.select("center", "other", F.lit(0).cast("int").alias("label"))
    )


def _modularity_oracle() -> str:
    m2d = "CAST(m2 AS DOUBLE)"
    q = (
        f"CAST(e2 AS DOUBLE) / {m2d} - (CAST(d_sum AS DOUBLE) / {m2d}) "
        f"* (CAST(d_sum AS DOUBLE) / {m2d})"
    )
    return dedent(
        f"""
        {_community_cte_chain()},
        labels AS MATERIALIZED (
            SELECT node, p % {COMM_SHIFT} AS community FROM s{COMM_ROUNDS}),
        lab_e AS MATERIALIZED (
            SELECT u.a AS a, la.community AS ca, lb.community AS cb
            FROM und u
            JOIN labels la ON u.a = la.node
            JOIN labels lb ON u.b = lb.node),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM lab_e),
        sizes AS MATERIALIZED (
            SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM labels GROUP BY community),
        stats AS MATERIALIZED (
            SELECT ca AS community,
                   CAST(COUNT(*) AS BIGINT) AS d_sum,
                   CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
                       AS e2
            FROM lab_e GROUP BY ca)
        SELECT s.community, z.n_nodes, e2, d_sum,
               {q} AS q_contrib,
               CAST(FLOOR(1000000 * ({q})) AS BIGINT) AS q_micro
        FROM stats s JOIN sizes z ON s.community = z.community CROSS JOIN m
        """
    )


@query(
    "x10_modularity",
    oracle=_modularity_oracle(),
    tags=("X10", "graph", "community", "evaluation"),
)
def x10_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the seeded-LPA partition — the standard
    community-quality metric, closing the detect -> evaluate pair the way
    m8_rank_metrics evaluates the quality model: per community c,
    Q_c = e_c/m - (d_c/2m)^2 over the undirected purchase graph (computed
    in the doubled convention: und is symmetric, so COUNT(*) = 2m, the
    intra count = 2*e_c, and the formula divides through consistently).

    Determinism: e2, d_sum, m2 are exact BIGINTs from ONE map-side-
    combinable aggregation over the label-joined edge list (intra flag
    and degree sum share the GROUP BY; no COUNT DISTINCT — community
    sizes come from the |V|-sized label table, a separate cheap
    aggregate, review r8); q_contrib is
    one fixed IEEE tree (two divides, one multiply, one subtract) over
    those integers — bit-identical cross-engine — and q_micro floors that
    identical double, so even the floor is safe without a boundary
    argument. Community-wise contributions are NOT summed into the hash
    (float accumulation order); the exact global Q lives in SUM(q_micro),
    which the pytest checks against python.

    Scale shape: two hash joins attach labels to the edge list (keyed on
    the node ids — the same keys every graph lane shuffles on), then one
    map-side-combinable aggregation on the community key; m2 is a 1-row
    aggregate broadcast back via bounded cross join. Label skew = the
    largest community's edge share, inherited from the detection lane —
    at 100 TB the mitigation is the LPA seeding density itself
    (1/{COMM_SEED_MOD} controls region granularity)."""
    labels = (
        x10_community_lpa(spark, sf_dir)
        .select("node", "community")
        .localCheckpoint(eager=False)  # consumed by both endpoint joins + sizes
    )
    und = undirected_edges(spark, sf_dir)
    la = labels.withColumnRenamed("node", "a").withColumnRenamed(
        "community", "ca"
    )
    lb = labels.withColumnRenamed("node", "b").withColumnRenamed(
        "community", "cb"
    )
    lab_e = (
        und.join(la, "a")
        .join(lb, "b")
        .select("a", "ca", "cb")
        .localCheckpoint(eager=False)  # consumed by m2 + stats
    )
    m2df = lab_e.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    sizes = labels.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    stats = lab_e.groupBy(F.col("ca").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("d_sum"),
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0))
        .cast("long")
        .alias("e2"),
    ).join(sizes, "community")
    m2d = F.col("m2").cast("double")
    q = (
        F.col("e2").cast("double") / m2d
        - (F.col("d_sum").cast("double") / m2d)
        * (F.col("d_sum").cast("double") / m2d)
    )
    return stats.crossJoin(F.broadcast(m2df)).select(
        "community",
        "n_nodes",
        "e2",
        "d_sum",
        q.alias("q_contrib"),
        F.floor(F.lit(1_000_000) * q).cast("long").alias("q_micro"),
    )
