"""Graph operators for dedup pipelines: connected components over
near-duplicate pair graphs.

The dedup endgame: LSH + Jaccard verification produces PAIRS of
near-duplicate documents, but keeping one representative per GROUP
needs the transitive closure — connected components of the pair graph,
with the canonical label (min doc id) per component.

Spark-first design: iterative neighbor-min label propagation expressed
entirely as joins + groupBy aggregations — each round is one shuffle on
the edge key and one on the node key, both narrow integer columns. The
driver loop only checks a converged flag (a 1-row aggregate), never
collects data.

Scale notes (100 TB / billions of nodes):
- Rounds needed = graph diameter. Near-dup clusters are almost-cliques
  (every member pairs with most others via shared LSH bands), so real
  corpora converge in 2-4 rounds. For adversarial long-chain graphs,
  the alternating large-star/small-star algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) bounds
  rounds by O(log^2 n); the per-round plan here is the same
  join+groupBy shape, so swapping the step function is local.
- Each round ends in a reliable ``checkpoint()``: the round's labels
  materialize once to the checkpoint dir and the logical plan resets
  to a leaf. Without this the plan DOUBLES per round (labels feeds
  both the neighbor-min join and the self side), and by round ~8 even
  stringifying the plan OOMs the driver — persist/cache does not help
  because caching substitutes at physical planning but leaves the
  logical tree to grow exponentially. Checkpointing is the standard
  pattern for iterative graph algorithms on Spark (GraphFrames'
  connected components checkpoints on an interval for the same
  reason), and on a real cluster it doubles as fault tolerance: a
  lost executor re-reads the round file instead of recomputing the
  whole iteration history. Checkpoint files are deleted by the
  ContextCleaner once unreferenced (session.py enables
  ``spark.cleaner.referenceTracking.cleanCheckpoints``); nothing is
  registered in the cache manager, so sessions hold no stray cached
  relations or persistent RDDs afterwards.
- Labels are per-node state: |V| rows of two longs — billions of nodes
  fit comfortably across executors; nothing ever gathers on one node.
"""

from __future__ import annotations

import tempfile

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegralType, NumericType


def _ensure_checkpoint_dir(spark) -> None:
    """Respect a caller-configured checkpoint dir; default to a session
    tempdir otherwise (production points this at shared storage)."""
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark-graph-ckpt-"))


# Below this many PAIR rows the component computation runs as a
# driver-side union-find instead of the iterative label-propagation
# loop: each distributed round costs a join + checkpoint + converged
# probe (~1s of fixed job overhead at any data size), so a typical
# per-batch near-dup graph (tens to thousands of edges) pays several
# seconds of scheduling for milliseconds of actual work. 200k edge
# rows collect to a few MB — the same bounded-driver-metadata class as
# the k x dim centroid collect in similarity.py. Set to 0 to force the
# distributed loop.
SMALL_GRAPH_PAIRS = 200_000


def _union_find_components(rows, src: str, dst: str) -> list[tuple]:
    """Min-root union-find over collected pair rows: the root of every
    tree is kept as the minimum member, so find(x) is exactly the
    'min reachable id' label the distributed loop converges to."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        u, v = r[src], r[dst]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return [(x, find(x)) for x in parent]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    small_graph_pairs: int = SMALL_GRAPH_PAIRS,
) -> DataFrame:
    """Connected components of the undirected graph given as pair rows.

    Returns (doc_id, component) for every node appearing in ``pairs``,
    where component = min node id reachable from doc_id. Deterministic:
    the output depends only on the edge set. The result reads from the
    final round's checkpoint — no persist to release.

    Pair sets at or under ``small_graph_pairs`` take a driver-side
    union-find fast path (one count + one bounded collect instead of
    diameter-many join/checkpoint rounds — identical output, see
    ``SMALL_GRAPH_PAIRS``); larger graphs run the distributed loop.
    The probe itself costs a MEMORY_AND_DISK persist + count() of the
    full pair set before the loop starts — for a KNOWN-large graph
    (100 TB corpora, billions of candidate pairs) pass
    ``small_graph_pairs=0`` to skip the probe entirely and go straight
    to the distributed loop with no extra materialization.

    Neighbor-min label propagation: every node starts labeled with
    itself; each round every node takes the min of its own label and
    its neighbors' labels. Converges in diameter(G) rounds; raises if
    ``max_iter`` rounds were not enough (deterministic failure beats a
    silently-wrong partition). Each round is checkpointed — see the
    module docstring for why plain caching cannot work here.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if small_graph_pairs:
        # persist ONCE: the count probe materializes the (possibly
        # expensive) upstream plan, and whichever path runs next —
        # the driver collect or the symmetric edge build — reuses the
        # cached rows instead of recomputing it
        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        n_pairs = e.count()
        if n_pairs <= small_graph_pairs:
            try:
                from pyspark.sql import types as T

                labels = _union_find_components(e.collect(), "u", "v")
                utype = e.schema["u"].dataType
                schema = T.StructType(
                    [
                        T.StructField("doc_id", utype),
                        T.StructField("component", utype),
                    ]
                )
                return pairs.sparkSession.createDataFrame(labels, schema)
            finally:
                e.unpersist()
    _ensure_checkpoint_dir(pairs.sparkSession)
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = edges.select("u").distinct().withColumn("lbl", F.col("u"))

    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(F.col("u").alias("v"), F.col("lbl").alias("v_lbl")), "v"
                )
                .groupBy("u")
                .agg(F.min("v_lbl").alias("nbr_lbl"))
            )
            stepped = labels.join(nbr_min, "u", "left").select(
                "u",
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("lbl"),
                (F.coalesce(F.col("nbr_lbl"), F.col("lbl")) < F.col("lbl")).alias("_chg"),
            )
            # materialize the round once, reset lineage to a leaf.
            # persist BEFORE checkpointing: a reliable checkpoint
            # otherwise recomputes the frame from lineage a second
            # time when the checkpoint job writes (the documented
            # RDD-checkpoint double-compute), which here means paying
            # the round's join+agg twice per iteration
            pre = stepped.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                stepped = pre.checkpoint(eager=True)
            finally:
                pre.unpersist()
            changed = stepped.agg(F.max("_chg")).first()[0]
            labels = stepped.drop("_chg")
            if not changed:
                return labels.select(
                    F.col("u").alias("doc_id"), F.col("lbl").alias("component")
                )
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the graph has a longer diameter than expected — raise max_iter "
            "or switch to the large-star/small-star step (see module doc)"
        )
    finally:
        edges.unpersist()
        e.unpersist()  # no-op when the small-graph probe didn't persist


def component_summary(components: DataFrame) -> DataFrame:
    """(component, n_members, keeper_id) per cluster — the dedup
    decision table: keep ``keeper_id``, drop the other members."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("keeper_id"),
    )


def component_keepers(
    components: DataFrame,
    attrs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware keeper selection per near-dup component: among the
    members of each component, the keeper is the doc MAXIMIZING
    ``score_col`` (ties -> min ``id_col``), instead of the blind
    min-id label ``component_summary`` keeps. Production near-dup
    passes keep the best representative — longest doc, highest quality
    score, most recent crawl — not whichever got the smallest id.

    ``components`` is (id_col, component) as produced by
    ``connected_components``; ``attrs`` must provide ``score_col`` for
    every component member (inner-joined on ``id_col`` — a member
    missing from ``attrs`` silently leaves the scoring, so pass the
    same frame the pairs were mined from). Returns one row per member:
    (id_col, component, keeper_id, is_keeper).

    Scale shape: one map-side-combinable aggregate on the component key
    plus one join back on the same key — no window, so a pathological
    giant cluster (boilerplate crossing every LSH band) still
    partial-aggregates across tasks instead of buffering in one; AQE
    splits the join-back if the cluster is big enough to matter. The
    tie-break rides inside one struct comparison: min((score IS NULL,
    -score, id)) is the max-score member with the smallest id among
    equals. Negating the SCORE (validated numeric — it is a
    quality/length metric by contract) instead of the id keeps the id
    column untouched, so string doc ids (URLs, UUIDs — common in crawl
    corpora) order correctly instead of silently casting to null under
    unary minus. The leading IS-NULL flag exists because struct
    comparison sorts a NULL field FIRST ascending: without it a
    NULL-score member would win every min() and be elected keeper over
    every genuinely-scored member — the exact inversion of the
    operator's contract. NULL scores (and NaN doubles, which sort
    GREATEST so -NaN... is still NaN and loses the min) therefore only
    become keeper when the whole component is unscored, where the id
    tie-break decides.
    """
    score_type = attrs.schema[score_col].dataType
    if not isinstance(score_type, NumericType):
        raise TypeError(
            f"component_keepers: score_col {score_col!r} must be numeric "
            f"(got {score_type.simpleString()}). Cast rank-able non-numeric "
            "scores (e.g. timestamps) to a numeric column first."
        )
    scored = components.join(attrs.select(id_col, score_col), id_col)
    # Unary minus on an integral type's MIN_VALUE overflows — wraps
    # silently (wrong keeper) without ANSI mode, fails the job with it.
    # Widen integrals to DECIMAL(20,0) first (holds -Long.MIN_VALUE
    # exactly, unlike a double cast which rounds past 2^53 and could
    # invent spurious score ties); fractional/decimal negation is
    # symmetric and needs no widening.
    score_expr = F.col(score_col)
    if isinstance(score_type, IntegralType):
        score_expr = score_expr.cast("decimal(20,0)")
    best = (
        scored.groupBy("component")
        .agg(
            F.min(
                F.struct(
                    F.col(score_col).isNull().alias("unscored"),
                    (-score_expr).alias("neg_s"),
                    F.col(id_col).alias("kid"),
                )
            ).alias("b")
        )
        .select("component", F.col("b.kid").alias("keeper_id"))
    )
    return scored.join(best, "component").select(
        id_col,
        "component",
        "keeper_id",
        (F.col(id_col) == F.col("keeper_id")).alias("is_keeper"),
    )
