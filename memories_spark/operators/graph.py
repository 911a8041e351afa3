"""Graph expansion: personalized PageRank + bounded label propagation.

Reference semantics (reference memory_engine.py:1541-1642): truncated
Personalized PageRank over the memory-link graph — seeds are the RRF
candidates max-normalized, alpha=0.85, exactly 3 iterations, dangling
mass redistributed to the personalization vector. Adjacency is the
``related_to`` edge set made bidirectional with dangling targets
dropped (memory_engine.py:1490-1508).

Spark shape: a fixed-iteration driver loop of (join edges → groupBy
sum). Each iteration is one shuffle on node id; the edge DataFrame is
cached across iterations. At cluster scale you'd checkpoint every few
iterations to truncate lineage — with exactly 3 iterations lineage
stays shallow. All mass arithmetic is in fixed-point BIGINT (scale
12) so the result is bit-identical regardless of partitioning or
engine (see functions/hashing.py).

Clustering (reference find_similar_clusters union-find,
memory_engine.py:2274-2342) is re-expressed as *bounded* min-label
propagation: k rounds of "adopt the smallest neighbor label". With k
>= graph diameter this is exact connected components; bounded k keeps
it deterministic and oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.85
ITERATIONS = 3
SCALE = 12
_UNIT = float(10**SCALE)


def bidirectional(edges: DataFrame, src: str = "from_id", dst: str = "to_id") -> DataFrame:
    """Undirected adjacency: union of both directions, deduped."""
    fwd = edges.select(F.col(src).alias("from_id"), F.col(dst).alias("to_id"))
    rev = edges.select(F.col(dst).alias("from_id"), F.col(src).alias("to_id"))
    return fwd.union(rev).distinct()


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = ALPHA,
    iterations: int = ITERATIONS,
    s_total: int | None = None,
) -> DataFrame:
    """Fixed-point PPR. ``seeds`` is (id, sw_fp: BIGINT seed weight).

    Returns (id, ppr_fp: BIGINT) — divide by 1e12 for the score.
    The personalization p(v) = sw_fp(v) / sum(sw_fp) as a double;
    each iteration term is rounded back to fixed-point before the
    exact integer sum, so engines/partitionings agree bit-for-bit.

    ``s_total`` (the seed-mass sum) may be passed in when the caller
    already computed it — the serving path folds it into its single
    sizing job — otherwise ONE aggregate job fetches it here. Empty
    or all-zero seeds return an empty rank vector without running a
    single iteration (no mass to spread — and no driver crash on a
    NULL sum)."""
    spark = seeds.sparkSession
    materialized = False
    if s_total is None:
        # Materialize the seed list FIRST (it is tiny but its plan may
        # be a deep retrieval pipeline), then take the mass sum from
        # the materialized rows. Summing before materializing ran the
        # whole seed pipeline twice — once for the `.first()` and again
        # for the `p` projection below.
        seeds = seeds.localCheckpoint(eager=True)
        materialized = True
        s_total = seeds.agg(F.sum("sw_fp")).first()[0]
    if not s_total:
        return spark.createDataFrame([], "id long, r_fp long")
    adj = bidirectional(edges).cache()
    deg = adj.groupBy("from_id").agg(F.count("*").alias("deg")).cache()
    # `p` must be a materialized leaf: the loop below re-embeds it in
    # every iteration's union — without truncating lineage the logical
    # plan grows multiplicatively and can OOM the *driver* just
    # printing it. When the seed list was checkpointed above, a plain
    # projection over it is already such a leaf — no second job.
    p = seeds.select(
        F.col("id"), (F.col("sw_fp").cast("double") / F.lit(float(s_total))).alias("p")
    )
    if not materialized:
        p = p.localCheckpoint(eager=True)

    # r0 = p, in fixed point
    r = p.select("id", F.round(F.col("p") * _UNIT).cast("long").alias("r_fp"))

    base = p.select("id", F.round(F.lit(1.0 - alpha) * F.col("p") * _UNIT).cast("long").alias("term"))

    for _ in range(iterations):
        # Truncate lineage each iteration (the rank vector feeds back
        # into the next iteration's union — a cache alone keeps the
        # full logical plan, which compounds per iteration) but do it
        # LAZILY: the marked RDD is computed once inside the single
        # final job (both its consumers — contrib and the dangling
        # aggregate — read the persisted partitions), so the loop no
        # longer pays one sequential eager job per iteration. On a
        # real cluster this is a reliable checkpoint instead.
        with_deg = (
            r.alias("r")
            .join(deg.alias("d"), F.col("r.id") == F.col("d.from_id"), "left")
            .select(
                F.col("r.id").alias("id"),
                F.col("r.r_fp").alias("r_fp"),
                F.coalesce(F.col("d.deg"), F.lit(0)).alias("deg"),
            )
            .localCheckpoint(eager=False)
        )
        # The rank vector is tiny (seeds + expanding frontier) next to
        # the edge table: broadcast it into the edge join — no shuffle
        # of the adjacency at any iteration.
        contrib = (
            adj.alias("a")
            .join(
                F.broadcast(with_deg.filter(F.col("deg") > 0)).alias("wd"),
                F.col("wd.id") == F.col("a.from_id"),
            )
            .select(
                F.col("a.to_id").alias("id"),
                F.round(
                    F.lit(alpha)
                    * (F.col("wd.r_fp").cast("double") / _UNIT)
                    / F.col("wd.deg")
                    * _UNIT
                )
                .cast("long")
                .alias("term"),
            )
        )
        # Dangling mass stays IN the plan as a 1-row broadcast scalar
        # (no .first() driver round-trip per iteration — that was one
        # extra Spark job each): with_deg is checkpointed above, so
        # referencing it twice (contrib + this aggregate) re-reads the
        # materialized rows, not the lineage.
        dang = with_deg.filter(F.col("deg") == 0).agg(
            F.coalesce(F.sum("r_fp"), F.lit(0)).cast("long").alias("dang_fp")
        )
        dangling = p.crossJoin(F.broadcast(dang)).select(
            "id",
            F.round(
                F.lit(alpha)
                * (F.col("dang_fp").cast("double") / _UNIT)
                * F.col("p")
                * _UNIT
            )
            .cast("long")
            .alias("term"),
        )
        r = (
            base.unionByName(contrib)
            .unionByName(dangling)
            .groupBy("id")
            .agg(F.sum("term").alias("r_fp"))
        )
    # Materialize the final rank vector (tiny: seeds + 3-hop frontier)
    # and release the adjacency/degree caches — callers reference the
    # result several times (merge, scalars, graph-only branch) and a
    # long-lived session would otherwise accumulate cached edge tables
    # across searches. Iteration checkpoints are freed by the context
    # cleaner once their DataFrames go out of scope here.
    out = r.localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    return out


def ppr_sql(
    edges_cte: str,
    seeds_cte: str,
    alpha: float = ALPHA,
    iterations: int = ITERATIONS,
) -> str:
    """DuckDB oracle mirroring :func:`personalized_pagerank`.

    ``edges_cte`` must yield (from_id, to_id) directed;
    ``seeds_cte`` must yield (id, sw_fp BIGINT). Returns CTE chain
    ending in ``ppr(id, r_fp)``.
    """
    unit = f"1e{SCALE}"
    it_ctes = []
    prev = "r0"
    for i in range(1, iterations + 1):
        it_ctes.append(
            f"""d{i} AS (
  SELECT CAST(coalesce(sum(r.r_fp), 0) AS BIGINT) AS m FROM {prev} r
  LEFT JOIN deg ON deg.from_id = r.id WHERE deg.deg IS NULL
),
r{i} AS (
  SELECT id, CAST(sum(term) AS BIGINT) AS r_fp FROM (
    SELECT id, CAST(round({1.0 - alpha} * p * {unit}) AS BIGINT) AS term FROM p
    UNION ALL
    SELECT adj.to_id AS id,
           CAST(round({alpha} * (CAST(r.r_fp AS DOUBLE) / {unit}) / deg.deg * {unit}) AS BIGINT) AS term
    FROM {prev} r JOIN deg ON deg.from_id = r.id JOIN adj ON adj.from_id = r.id
    UNION ALL
    SELECT p.id, CAST(round({alpha} * (CAST((SELECT m FROM d{i}) AS DOUBLE) / {unit}) * p.p * {unit}) AS BIGINT) AS term
    FROM p
  ) GROUP BY id
)"""
        )
        prev = f"r{i}"
    its = ",\n".join(it_ctes)
    return f"""
WITH edges AS ({edges_cte}),
adj AS (
  SELECT DISTINCT from_id, to_id FROM (
    SELECT from_id, to_id FROM edges UNION ALL SELECT to_id AS from_id, from_id AS to_id FROM edges
  )
),
deg AS (SELECT from_id, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY from_id),
seeds AS ({seeds_cte}),
p AS (
  SELECT id, CAST(sw_fp AS DOUBLE) / CAST((SELECT sum(sw_fp) FROM seeds) AS DOUBLE) AS p
  FROM seeds
),
r0 AS (SELECT id, CAST(round(p * {unit}) AS BIGINT) AS r_fp FROM p),
{its},
ppr AS (SELECT id, r_fp FROM {prev})
"""


def min_label_propagation(
    edges: DataFrame, nodes: DataFrame, rounds: int, id_col: str = "id"
) -> DataFrame:
    """Bounded connected-components: k rounds of min-label adoption.

    Exact CC when k >= component diameter; always deterministic.
    Returns (id, label) where label = min reachable-in-k-hops id.
    """
    adj = bidirectional(edges).cache()
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    for i in range(rounds):
        if i > 0:
            # labels appears twice per round (self-join via neighbor
            # min), so the logical plan doubles each round; truncate
            # lineage to keep plan size linear in `rounds`.
            labels = labels.localCheckpoint(eager=True)
        neighbor_min = (
            labels.alias("l")
            .join(adj.alias("a"), F.col("l.id") == F.col("a.from_id"))
            .groupBy(F.col("a.to_id").alias("id"))
            .agg(F.min(F.col("l.label")).alias("nmin"))
        )
        labels = (
            labels.alias("lb")
            .join(neighbor_min.alias("nm"), F.col("lb.id") == F.col("nm.id"), "left")
            .select(
                F.col("lb.id").alias("id"),
                F.least(
                    F.col("lb.label"), F.coalesce(F.col("nm.nmin"), F.col("lb.label"))
                ).alias("label"),
            )
        )
    out = labels.localCheckpoint(eager=True)
    adj.unpersist()
    return out


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_rounds: int = 25, id_col: str = "id"
) -> DataFrame:
    """Exact connected components in O(log n) rounds: min-label
    propagation with a path-halving shortcut each round.

    Bounded label propagation (:func:`min_label_propagation`) needs
    rounds >= component diameter — on a million-node chain that is a
    million shuffles. Adding the pointer-doubling step
    ``label(v) <- label(label(v))`` after each propagation halves
    label-tree depth per round (the same trick as the alternating
    big-star/small-star MapReduce CC algorithm), so convergence is
    logarithmic in the longest path. Rounds run until a fixpoint
    (checked with a cheap count action); result is
    ``(id, component)`` with component = min id of the component —
    deterministic for any graph, any partitioning.
    """
    adj = bidirectional(edges).cache()
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    for _ in range(max_rounds):
        labels = labels.localCheckpoint(eager=True)
        neighbor_min = (
            labels.alias("l")
            .join(adj.alias("a"), F.col("l.id") == F.col("a.from_id"))
            .groupBy(F.col("a.to_id").alias("id"))
            .agg(F.min(F.col("l.label")).alias("nmin"))
        )
        propagated = (
            labels.alias("lb")
            .join(neighbor_min.alias("nm"), F.col("lb.id") == F.col("nm.id"), "left")
            .select(
                F.col("lb.id").alias("id"),
                F.least(
                    F.col("lb.label"), F.coalesce(F.col("nm.nmin"), F.col("lb.label"))
                ).alias("label"),
            )
        )
        # path halving: follow the label's own label one hop
        shortcut = (
            propagated.alias("p")
            .join(
                propagated.select(
                    F.col("id").alias("pid"), F.col("label").alias("plabel")
                ).alias("pp"),
                F.col("p.label") == F.col("pp.pid"),
                "left",
            )
            .select(
                F.col("p.id").alias("id"),
                F.coalesce(F.col("pp.plabel"), F.col("p.label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            shortcut.alias("s")
            .join(labels.alias("o"), F.col("s.id") == F.col("o.id"))
            .filter(F.col("s.label") != F.col("o.label"))
            .count()
        )
        labels = shortcut
        if changed == 0:
            break
    adj.unpersist()
    return labels.select("id", F.col("label").alias("component"))


def bfs_distances(
    edges: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed, bounded
    by ``max_hops``. ``seeds`` is (id); returns (id, dist).

    The classic Pregel frontier loop as DataFrames: each round joins
    the current distance vector to the adjacency and keeps the min.
    Unreached nodes are absent (no infinity sentinel to shuffle).
    Rounds are fixed, so the oracle mirrors them as chained CTEs —
    no recursive CTE, whose path enumeration blows up on cyclic
    graphs (bidirectional edges always cycle).
    """
    adj = bidirectional(edges).cache()
    dist = seeds.select(F.col("id"), F.lit(0).cast("long").alias("dist"))
    for i in range(max_hops):
        if i > 0:
            dist = dist.localCheckpoint(eager=True)
        stepped = (
            dist.alias("d")
            .join(adj.alias("a"), F.col("d.id") == F.col("a.from_id"))
            .select(F.col("a.to_id").alias("id"), (F.col("d.dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(stepped).groupBy("id").agg(F.min("dist").alias("dist"))
        )
    out = dist.localCheckpoint(eager=True)
    adj.unpersist()
    return out


def bfs_sql(edges_cte: str, seeds_cte: str, max_hops: int) -> str:
    """DuckDB oracle for :func:`bfs_distances`; ends in
    ``bfs(id, dist)``."""
    ctes = []
    prev = "b0"
    for i in range(1, max_hops + 1):
        ctes.append(
            f"""b{i} AS MATERIALIZED (
  SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT id, dist FROM {prev}
    UNION ALL
    SELECT adj.to_id AS id, d.dist + 1 AS dist
    FROM {prev} d JOIN adj ON adj.from_id = d.id
  ) GROUP BY id
)"""
        )
        prev = f"b{i}"
    its = ",\n".join(ctes)
    return f"""
WITH edges AS MATERIALIZED ({edges_cte}),
adj AS MATERIALIZED (
  SELECT DISTINCT from_id, to_id FROM (
    SELECT from_id, to_id FROM edges UNION ALL SELECT to_id AS from_id, from_id AS to_id FROM edges
  )
),
b0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM ({seeds_cte})),
{its},
bfs AS (SELECT id, dist FROM {prev})
"""


def label_propagation_sql(edges_cte: str, nodes_cte: str, rounds: int) -> str:
    """DuckDB oracle for :func:`min_label_propagation`; ends in
    ``labels(id, label)``."""
    ctes = []
    prev = "l0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT l.id, least(l.label, coalesce(min(n.label), l.label)) AS label
  FROM {prev} l
  LEFT JOIN adj ON adj.to_id = l.id
  LEFT JOIN {prev} n ON n.id = adj.from_id
  GROUP BY l.id, l.label
)"""
        )
        prev = f"l{i}"
    its = ",\n".join(ctes)
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references the previous one twice — without it the (often
    # expensive) edges CTE is re-evaluated ~2^rounds times.
    return f"""
WITH edges AS MATERIALIZED ({edges_cte}),
adj AS MATERIALIZED (
  SELECT DISTINCT from_id, to_id FROM (
    SELECT from_id, to_id FROM edges UNION ALL SELECT to_id AS from_id, from_id AS to_id FROM edges
  )
),
nodes AS ({nodes_cte}),
l0 AS (SELECT id, id AS label FROM nodes),
{its},
labels AS MATERIALIZED (SELECT id, label FROM {prev})
"""
