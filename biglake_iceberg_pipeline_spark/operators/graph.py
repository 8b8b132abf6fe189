"""Distributed connected components (min-label propagation).

The missing last step of near-dup dedup at scale: MinHash/LSH or
Jaccard candidate PAIRS must become CLUSTERS (transitive closure) so
each group keeps one canonical document. Pair lists alone under-delete:
A~B and B~C must put A,B,C in one cluster even though A~C was never a
candidate pair.

Spark has no graph operator (GraphFrames isn't in the env and would be
overkill); this is the classic iterative-join formulation:

    label(v) := min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each iteration is one join + one groupBy —
two shuffles on the node id — and the iteration count is the graph
diameter, which for dedup clusters is tiny (near-dup groups are
cliques or short chains; diameter 2-4). ``localCheckpoint`` truncates
the lineage each round so the plan doesn't grow exponentially — the
standard guard for iterative DataFrame algorithms.

At 100 TB: |edges| ≪ |docs| after LSH banding, labels frame is one
long per node; a billion-node run is ~diameter × (join+agg) on a
bigint key — shuffle-bound and balanced (no hot key: labels are ids).

DENSE graphs (r10): near-dup clusters are CLIQUES, and a corpus with
large duplicate groups can carry O(members²) verified pairs — at sf1
the 0.6-threshold cluster graph holds 22.5M edges over 50k docs, and
min-label iterations that re-join the full edge set each round paid
that quadratic size every iteration (36 s of the 94 s query).
``connected_components`` therefore runs TWO star-contraction rounds
first (the large-star/small-star operations of Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond" — both provably
component-preserving): each round points every neighborhood at its
minimum, collapsing a clique to a star in one pass, so the edge set
the min-label loop then iterates is O(nodes), not O(pairs). Sparse
chain graphs pass through the contraction unchanged-in-size and
converge in the loop exactly as before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.session import pin

#: frontier size below which the min-label loop batches two
#: propagation steps per scheduled job (see the loop comment)
_FRONTIER_DOUBLE_MAX = 1024


def _star_contract(sym: DataFrame, large: bool) -> DataFrame:
    """One large-star (``large=True``) or small-star round over a
    SYMMETRIC edge frame (a, b): every neighbor of ``a`` on the
    round's side (strictly larger for large-star; smaller-or-equal
    for small-star) is re-pointed at m(a) = min(a, N(a)) — the
    Kiveris et al. operations, each of which preserves the graph's
    connected components exactly while collapsing dense
    neighborhoods to stars. Returns the new symmetric, deduped,
    self-loop-free edge frame."""
    m = sym.groupBy("a").agg(
        F.least(F.first("a"), F.min("b")).alias("m")
    )
    j = sym.join(m, "a")
    side = F.col("b") > F.col("a") if large else F.col("b") <= F.col("a")
    out = j.where(side).select(
        F.col("b").alias("u"), F.col("m").alias("v")
    )
    if not large:
        # small-star also keeps (a, m) itself so a node whose
        # neighbors are all larger stays attached to its
        # neighborhood's minimum
        out = out.union(
            j.select(F.col("a").alias("u"), F.col("m").alias("v"))
        )
    out = out.where(F.col("u") != F.col("v"))
    return (
        out.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .union(out.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) for every node appearing in ``edges``,
    where component is the smallest node id in its connected group.
    Edges are treated as undirected; self-loops and duplicates are
    harmless. Raises if not converged within ``max_iter`` (diameter
    bound exceeded — for dedup graphs this means something is wrong
    with the candidate generation, not the clustering)."""
    # materialize the pair list ONCE (the candidate pipeline that
    # produced it is the expensive part — unpinned lineage would
    # re-run it on every pass; measured 2× on the sf0.1
    # dedup_clusters query), in ONE direction: symmetrizing is a
    # shuffle-free union over the materialized rows. Deliberately NO
    # distinct here — duplicate/mirrored edges are harmless to every
    # min-aggregation below, and a distinct over the raw pair set is
    # a full O(pairs) shuffle that dominated the closure at sf1
    # (the 22.5M-edge dense-clique graph: 61 s of which the pair
    # pipeline itself was ~40 s; the contraction rounds take 5 s).
    # EAGER on purpose: base pins the (expensive) candidate pipeline
    # in its own job before the union's two branches consume it — a
    # lazy checkpoint here would let both branches race to compute
    # the pair lineage concurrently inside the first consuming job.
    # The cheap one-level checkpoints below are lazy instead.
    base = pin(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col(src) != F.col(dst))
    )
    sym = base.union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # component membership of the ORIGINAL node set must survive the
    # contraction: star rounds re-point nodes but never drop them
    # (every node keeps an edge toward its neighborhood minimum), and
    # both operations preserve components exactly (Kiveris et al.).
    # Two rounds collapse the dense-clique case — O(pairs) edges —
    # to an O(nodes) star forest before the converging loop below.
    sym = pin(_star_contract(sym, large=True), eager=False)
    sym = pin(_star_contract(sym, large=False), eager=False)
    # Initialize each node's label to its NEIGHBORHOOD minimum
    # min(v, N(v)) instead of its own id: this is exactly what the
    # first min-label iteration would compute from label=id (nbr_min
    # over initial labels IS min of neighbor ids), folded into the
    # node-set aggregation that had to run anyway — one fewer
    # O(edges) join+agg pass at any graph size, with the identical
    # fixpoint and identical post-iteration states (measured: the
    # sf0.1 dedup graph converges in 3 loop passes instead of 4,
    # byte-identical labels).
    labels = pin(
        sym.groupBy("a")
        .agg(F.least(F.first("a"), F.min("b")).alias("component"))
        .select(F.col("a").alias("id"), "component"),
        eager=False,
    )
    def _propagate(lbl: DataFrame) -> DataFrame:
        nbr_min = (
            sym.join(lbl, sym.a == lbl.id)
            .groupBy(sym.b.alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        return lbl.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                "component", F.coalesce("nbr_component", "component")
            ).alias("component"),
            (
                F.coalesce("nbr_component", "component")
                < F.col("component")
            ).alias("__changed"),
        )

    prev_changed: int | None = None
    for _ in range(max_iter):
        # ADAPTIVE double-stepping (r14): once the previous pass's
        # frontier is tiny (< _FRONTIER_DOUBLE_MAX changed labels),
        # run TWO propagation steps per scheduled job — the
        # convergence tail is scheduler-bound (each pass costs a
        # driver round-trip plus one broadcast-exchange job per tiny
        # join; a 202-edge closure ran 41 jobs), and labels are
        # monotone non-increasing so "changed across the double
        # step" ≡ final < initial and propagating past the fixpoint
        # is a no-op — the fixpoint is IDENTICAL (hash-equal across
        # single/double/adaptive on both bench graphs). While the
        # frontier is LARGE the loop stays single-step: each
        # propagation is an O(edges) join whatever the frontier, so
        # unconditional doubling risks one redundant full-edge pass
        # at 100 TB to save one barrier — measured a wash at 42k
        # edges and a loss waiting to happen at 22.5M (sf1).
        # Adaptive measured: 42k-edge closure 34 → 29-30 jobs and
        # best wall-clock of the three policies; 202-edge closure
        # 41 → 39 jobs (the pure-double win there is within noise of
        # this form).
        double = (
            prev_changed is not None
            and prev_changed < _FRONTIER_DOUBLE_MAX
        )
        updated = _propagate(
            _propagate(labels).drop("__changed")
            if double
            else labels
        )
        # lazy: the convergence count below is the first action, so
        # the checkpoint materializes INSIDE that job (one scheduler
        # round-trip per pass instead of two)
        updated = pin(updated, eager=False)
        n_changed = updated.where(F.col("__changed")).count()
        prev_changed = n_changed
        labels = updated.drop("__changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_cluster_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster every document: near-dup groups get their minimum
    doc id as cluster_id (the canonical survivor); documents with no
    near-dup pair are their own singleton cluster. Output
    (id_col, cluster_id, is_canonical) — the keep/drop decision a
    training-data pipeline applies after LSH."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp.id, "left")
        .select(
            docs[id_col],
            F.coalesce("component", docs[id_col]).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )


def keep_best_in_cluster(
    df: DataFrame,
    id_col: str,
    cluster_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup
    cluster keep the HIGHEST-scoring member (ties → lowest id)
    instead of the lowest id — real dedup pipelines keep the best
    version of a duplicated document (cleanest extraction, least
    boilerplate), not an arbitrary one. Replaces/sets
    ``is_canonical``; deterministic given a deterministic score.

    One additional hash shuffle on the cluster column; cluster sizes
    are small by construction (they are near-dup groups), so the
    per-cluster window sort is trivial at any corpus size."""
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    out = df.drop("is_canonical")
    return out.withColumn(
        "is_canonical", F.row_number().over(w) == 1
    )
