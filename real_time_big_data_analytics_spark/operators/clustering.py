"""Near-duplicate cluster formation — iterative connected components
(SURVEY.md §2.9 L2 completion; north-star dedup family).

Pairwise near-dup detection (n-gram Jaccard, MinHash, SimHash) yields
edges; deduplication needs the transitive closure: each document
assigned to its duplicate-cluster representative (min doc_id in the
component), so one representative per cluster survives.

This is the engine's iterative-algorithm shape: min-label propagation
over the pair graph — each round a join + min-aggregate, state carried
between rounds via ``localCheckpoint`` (truncates lineage so plan
depth stays O(1) per round). Rounds needed = graph diameter, which for
near-dup cliques is tiny (2-3). At 100 TB the same loop runs with the
edges table partitioned by node — this is exactly large-scale
connected components (GraphX/GraphFrames use the same iteration).

The DuckDB oracle computes the closure with a recursive CTE — an
exact cross-paradigm check of an iterative distributed algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import round2
from ..sources.tables import load_table
from .text import ngram_jaccard_pairs

MAX_ITER = 20

# Below this many (directed) edges the component graph is metadata-scale
# and the transitive closure finishes with a driver-side union-find in
# one pass — the same two-phase strategy GraphFrames' connectedComponents
# uses (iterate distributed until the graph shrinks, solve the remainder
# locally). 1M edges ≈ 16 MB of longs on the driver, a bounded collect.
# Above the threshold the distributed min-label loop runs instead, so
# the 100 TB path (billions of candidate pairs) never collects.
LOCAL_CC_MAX_EDGES = 1 << 20


def _local_union_find(rows) -> list[tuple[int, int]]:
    """Union-find over collected (src, dst) edges; returns
    (node, min-node-of-component) pairs sorted by node."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    label: dict[int, int] = {}
    for node in parent:
        root = find(node)
        label[root] = min(label.get(root, node), node)
    return sorted((node, label[find(node)]) for node in parent)


def min_label_components(
    pairs: DataFrame, local_max_edges: int = LOCAL_CC_MAX_EDGES
) -> DataFrame:
    """Connected components over an (a_id, b_id) edge list via
    iterative min-label propagation: returns (node, label) where
    label is the component's minimum node id.

    Shared by every dedup family that ends in transitive closure
    (n-gram Jaccard, embedding-cosine semantic dedup). Two-phase
    adaptive execution: the edge list is materialized once
    (``localCheckpoint``), and if it is metadata-scale
    (≤ ``local_max_edges``) the closure is solved with a single
    driver-side union-find — one collect bounded by the threshold,
    zero iterative Spark jobs. Otherwise each distributed round is
    one join + min-aggregate with ``localCheckpoint`` lineage
    truncation; rounds = graph diameter (2-3 for dup cliques).
    """
    # Checkpoint the FORWARD edges first so the (possibly expensive)
    # pair-generation subplan materializes exactly once; the reversed
    # direction is derived from the checkpointed rows, not recomputed.
    fwd = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).localCheckpoint()

    n_edges = fwd.count()
    if n_edges <= local_max_edges:
        spark = pairs.sparkSession
        solved = _local_union_find(fwd.collect())
        return spark.createDataFrame(solved, schema="node bigint, label bigint")

    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(MAX_ITER):
        neigh_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # The convergence flag rides the SAME checkpointed round result,
        # so the changed-count is a filter over the materialized rows —
        # a separate old-vs-new join per round would double the loop's
        # shuffle count for pure bookkeeping.
        lbl = F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label")))
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.src, "left")
            .select(
                "node",
                lbl.alias("new_label"),
                (lbl != F.col("label")).alias("changed"),
            )
            .withColumnRenamed("new_label", "label")
            .localCheckpoint()
        )
        changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break

    return labels


def near_dup_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8
) -> DataFrame:
    """(doc_id, cluster_rep) for every document in a near-dup pair;
    cluster_rep is the component's minimum doc_id."""
    pairs = ngram_jaccard_pairs(spark, sf_dir, threshold=threshold)
    labels = min_label_components(pairs)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep"))


def semantic_dedup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """SemDeDup-style semantic deduplication over the embedding table:
    label-blocked cosine pairs above ``threshold`` → connected
    components → keep the minimum ``vec_id`` per semantic cluster.

    Output is every vector that belongs to some semantic-dup cluster
    with its cluster representative and a keep/drop verdict — the
    embedding-space twin of ``near_dup_clusters``. The pair stage is
    the blocked self-join of ``embedding_cosine_pairs`` (cells bound
    the candidate set at any scale); the closure reuses the same
    min-label iteration, so cost scales with dup-pair count, not
    corpus size.
    """
    from .similarity import embedding_cosine_pairs

    pairs = embedding_cosine_pairs(spark, sf_dir, threshold=threshold)
    labels = min_label_components(pairs)
    return labels.select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("cluster_rep"),
        (F.col("node") == F.col("label")).alias("keep"),
    )


def dedup_corpus(spark: SparkSession, sf_dir: str, threshold: float = 0.8) -> DataFrame:
    """The end-to-end dedup deliverable: the cleaned corpus.

    Survivors = exact-dedup winners (lowest doc_id per identical text)
    minus near-duplicate cluster members that are not their cluster's
    representative. This is the document set an LLM training pipeline
    would actually keep; both stages compose as DataFrame ops (anti
    join on the small non-representative set).
    """
    from .text import exact_dedup

    exact = exact_dedup(spark, sf_dir)
    clusters = near_dup_clusters(spark, sf_dir, threshold=threshold)
    non_reps = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select("doc_id")
    return exact.join(non_reps, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


def training_pipeline(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = 10,
    size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """The end-to-end training-data deliverable: cleaned corpus
    (exact + near-dup dedup) → minimum-length quality gate →
    deterministic stratified language sampling → sliding-window
    chunking → per-language shard statistics.

    Two execution phases: the dedup survivor set runs EAGERLY at
    call time (``near_dup_clusters`` iterates with per-round
    ``localCheckpoint``/``count`` jobs — an iterative algorithm
    cannot be one lazy plan), and everything downstream composes
    into a single Catalyst-optimized plan — the length and sampling
    gates fuse into the corpus scan, the survivor set semi-joins in,
    and only the tiny per-language aggregate shuffles at the end.
    This is the corpus-to-shards path an LLM data pipeline runs
    nightly; at 100 TB each stage scales exactly as documented on
    its operator.
    """
    from .text import md5_bucket, sample_rate_expr

    survivors = dedup_corpus(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.join(survivors, "doc_id", "left_semi")
    ws = kept.select("doc_id", "lang", F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= min_tokens
    )
    sampled = ws.filter(md5_bucket() < sample_rate_expr())
    starts = F.expr(f"sequence(0, size(ws) - 1, {stride})")
    chunked = sampled.select(
        "doc_id", "lang", F.explode(starts).alias("st"), "ws"
    ).select(
        "doc_id",
        "lang",
        F.size(F.expr(f"slice(ws, st + 1, {size})")).cast("bigint").alias("n_tokens"),
    )
    return chunked.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str, threshold: float = 0.8) -> DataFrame:
    """Dedup with the PRODUCTION survivor policy: within each near-dup
    cluster keep the highest-VALUE member — here the longest document
    (n_chars, doc_id tie-break) — instead of `dedup_corpus`'s min-id
    representative. Real pipelines keep the best copy (longest /
    highest quality / canonical source), not an arbitrary one; the
    choice changes which bytes survive, so it is its own operator.

    Same execution slots as `dedup_corpus`: the closure is the shared
    connected-components pass, the policy is one ranked window over
    cluster members (cluster-keyed shuffle of (cluster, n_chars, id)
    triples only), and the survivor set anti-joins the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    clusters = near_dup_clusters(spark, sf_dir, threshold=threshold)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rk", F.row_number().over(w))
    )
    losers = ranked.filter(F.col("rk") > 1).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


PACK_BIN_TOKENS = 2048


def training_mix_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 v2 — the domain-TARGETED corpus build, composing this
    round's mixers end-to-end: near+exact dedup survivors → DSIR
    importance gate (keep documents whose unigram log-likelihood
    ratio toward the target slice is >= 0, i.e. at least as
    target-like as the corpus average) → greedy sequence packing into
    PACK_BIN_TOKENS-token bins per language → per-language mix
    report (docs, bins, fill efficiency, token share). v1
    (``training_pipeline``) builds a BALANCED corpus via stratified
    rates; v2 builds a TARGETED one via learned importance weights —
    the two mixing strategies a data team actually chooses between.

    Execution phases mirror v1: the dedup survivor set runs eagerly
    (iterative closure), then everything downstream — the DSIR score
    join, the >= 0 gate, the per-lang packing cumsum, the final
    aggregate — composes into one lazy plan. The DSIR gate compares
    the 1e-6-rounded score, so the cut is engine-exact.
    """
    from .text import dsir_doc_scores

    survivors = dedup_corpus(spark, sf_dir).select("doc_id")
    scores = dsir_doc_scores(spark, sf_dir)
    kept = scores.join(survivors, "doc_id", "left_semi").filter(
        F.col("lr_doc") >= 0
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sized = kept.join(docs, "doc_id")
    w_off = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = sized.withColumn(
        "bin_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w_off), F.lit(0))
            / F.lit(float(PACK_BIN_TOKENS))
        ).cast("bigint"),
    )
    g = packed.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("bin_id").cast("bigint").alias("n_bins"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.avg("lr_doc").alias("avg_lr_raw"),
    )
    w_all = Window.partitionBy()
    return g.select(
        "lang",
        "n_docs",
        "n_bins",
        "total_tokens",
        round2("avg_lr_raw", 6).alias("avg_lr"),
        round2(
            F.col("total_tokens")
            / (F.col("n_bins") * F.lit(float(PACK_BIN_TOKENS))),
            6,
        ).alias("bin_fill"),
        round2(
            F.col("total_tokens") / F.sum("total_tokens").over(w_all), 6
        ).alias("token_share"),
    )
