"""Approximate near-duplicate detection: MinHash+LSH and SimHash
(SURVEY.md §2.9 L2; north-star dedup family).

Exact n-gram Jaccard (operators/text.py) is the correctness baseline;
these are the scale paths:

- MinHash+LSH (spark.ml): shingles → HashingTF sparse vectors →
  MinHashLSH ``approxSimilarityJoin``. Candidate pairs come only from
  band-bucket collisions, so the join never materializes the O(n²)
  pair space. This is the standard 100 TB web-dedup design.
- SimHash: 64-bit signature per doc from xxhash64 word hashes,
  banded into 4×16-bit keys for bucketed candidate generation;
  near-dups have small Hamming distance. Entirely native
  expressions — the per-bit majority vote is 64 codegen'd
  aggregates, no UDF.

Both are approximate → rows-only harness checks + recall-vs-exact
pytest (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round2
from ..sources.tables import load_table
from .text import _with_shingle_array

SEED = 42
N_BITS = 60
N_BANDS = 4
BAND_WIDTH = N_BITS // N_BANDS


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    jaccard_distance_threshold: float = 0.3,
    num_hash_tables: int = 8,
) -> DataFrame:
    """L2 — MinHash LSH approximate near-dup pairs (a_id < b_id).

    ``approxSimilarityJoin`` emits only bucket-colliding candidates and
    computes the exact Jaccard distance on those, so output pairs are
    exact-distance-filtered with approximate recall.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    # Per-doc shingle sets built row-side (array_distinct) — no
    # explode→regroup shuffle; the doc never leaves its partition
    # until the LSH bucket join.
    sh = _with_shingle_array(docs, 3).select("doc_id", F.col("sh_arr").alias("sh"))
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18)
    # No non-empty filter needed: _with_shingle_array guards
    # size(ws) >= n, so every sh array has >= 1 element (MinHashLSH
    # requires non-empty vectors). An explicit size(sh) > 0 here gets
    # pushed below the spread() exchange as a scan filter that
    # re-evaluates the whole shingle transform on the single
    # pre-shuffle partition — one core pays the corpus's CPU twice.
    #
    # cache(): approxSimilarityJoin internally posexplodes the hash
    # arrays, and the inferred non-empty predicate (size over the
    # minhash-of-TF UDF chain) otherwise sinks into the parquet scan
    # with the same single-core cost — an InMemoryRelation is a
    # pushdown barrier, and Spark's cache manager dedupes by
    # canonical plan, so repeated calls share one small cached entry
    # (corpus features; both join sides and both LSH passes reuse it).
    feats = tf.transform(sh).cache()
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", seed=SEED, numHashTables=num_hash_tables
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, jaccard_distance_threshold, distCol="jaccard_distance"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            round2(1 - F.col("jaccard_distance"), 4).alias("jaccard"),
        )
    )


def _simhash_bits(docs: DataFrame) -> DataFrame:
    """60 sign-aggregated bits per doc from tf-weighted word hashes →
    (doc_id, sig) with sig a 60-char '0'/'1' string.

    The word hash is the low 60 bits of md5 (15 hex chars) rather than
    xxhash64: identical hash quality for simhash purposes, and DuckDB
    computes the SAME bits, which makes both signature and pair
    queries exactly oracle-checkable — a bit-for-bit cross-engine
    check of the banded LSH. (xxhash64 is the drop-in swap if raw
    hashing throughput ever matters more than oracle coverage.)"""
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    # Hash the VOCAB, not the token stream: md5 is the expensive step,
    # and the distinct-word table is sub-linear in corpus size (Heaps'
    # law), so hashing once per vocab entry and broadcast-joining onto
    # the stream replaces a per-occurrence cryptographic hash with a
    # JVM hash-join probe. Identical h values — the oracle (which
    # hashes per occurrence) is unaffected.
    h = F.conv(F.substring(F.md5("word"), 1, 15), 16, 10).cast("bigint")
    vocab_h = tokens.select("word").distinct().withColumn("h", h)
    hashed = tokens.join(F.broadcast(vocab_h), "word").select("doc_id", "h")
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(N_BITS)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    sig = F.concat_ws(
        "", *[F.when(F.col(f"b{j}") > 0, "1").otherwise("0") for j in range(N_BITS)]
    )
    return agg.select("doc_id", sig.alias("sig"))


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — SimHash document fingerprints (60-bit signature string)."""
    docs = load_table(spark, sf_dir, "documents")
    return _simhash_bits(docs)


def simhash_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 8, max_df: int | None = None
) -> DataFrame:
    """L2 — SimHash near-dup pairs via banded bucketing.

    Candidates must collide on at least one of 4 15-bit bands (the
    pigeonhole guarantee: hamming ≤ 3 ⇒ some band is identical;
    wider hamming trades recall, standard SimHash practice). The
    band equi-join is the only shuffle and is bucket-bounded.

    ``max_df`` (default ``text.DEFAULT_MAX_DF``) drops bands shared by
    more docs than the cap before the self-join — same hot-key guard
    as ``ngram_jaccard_pairs``: a degenerate band (e.g. all-zeros from
    near-empty docs) would otherwise fan out quadratically. The band
    df is a map-side-combined count whose tiny hot set broadcasts
    into an anti-join (see ``ngram_jaccard_pairs`` for why not a
    window count).
    """
    from .text import DEFAULT_MAX_DF

    if max_df is None:
        max_df = DEFAULT_MAX_DF
    sigs = _simhash_bits(load_table(spark, sf_dir, "documents")).cache()
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{i}:"), F.substring("sig", i * BAND_WIDTH + 1, BAND_WIDTH)
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band"),
    )
    hot = (
        banded.groupBy("band")
        .agg(F.count("*").alias("band_df"))
        .filter(F.col("band_df") > max_df)
        .select("band")
    )
    banded = banded.join(F.broadcast(hot), "band", "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split("sig_a", ""), F.split("sig_b", ""), lambda x, y: x != y
            ),
            lambda v: v,
        )
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def minhash_lsh_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — bound-assertion form of the MinHash-LSH pair join (the
    m1/m3 checked pattern, round-3 verdict ask #5): the SQL-exact
    parts — the capped exact n-gram pair COUNTS at J >= 0.9 and
    J >= 0.8 — are emitted verbatim for the hash gate, and the
    LSH-dependent parts collapse to asserted invariants the oracle
    emits as ``true``:

    - ``recall_hi_ok``: every exact pair at J >= 0.9 is surfaced by
      the seeded 8-table candidate join (a true pair escapes all 8
      independent minhash tables with prob (1-j)^8 <= 1e-8, so
      EQUALITY is asserted, not a soft bound);
    - ``recall_mid_ok``: >= 90% of exact pairs at J >= 0.8 are
      surfaced (miss prob <= 0.2^8 per pair; 0.9 leaves margin for
      the HashingTF-bucket approximation);
    - ``pairs_sane_ok``: every emitted pair is ordered (a_id < b_id)
      with distance-derived jaccard in [threshold − rounding, 1].

    The raw candidate set stays available as
    :func:`minhash_lsh_pairs` (exercised by the recall pytest); this
    wrapper is what registers, so the LSH join is hash-gated instead
    of rows-only. All four probe aggregates are 1-row broadcasts over
    the bounded pair/exact sets — scalar-broadcast pattern, no
    driver collect.
    """
    from .text import ngram_jaccard_pairs

    cand = minhash_lsh_pairs(spark, sf_dir).cache()
    cand_ids = cand.select("a_id", "b_id")
    hi = ngram_jaccard_pairs(spark, sf_dir, threshold=0.9).select("a_id", "b_id")
    mid = ngram_jaccard_pairs(spark, sf_dir, threshold=0.8).select("a_id", "b_id")
    n_hi = hi.agg(F.count("*").cast("bigint").alias("n_exact_hi"))
    hi_found = hi.join(cand_ids, ["a_id", "b_id"], "left_semi").agg(
        F.count("*").alias("n_hi_found")
    )
    n_mid = mid.agg(F.count("*").cast("bigint").alias("n_exact_mid"))
    mid_found = mid.join(cand_ids, ["a_id", "b_id"], "left_semi").agg(
        F.count("*").alias("n_mid_found")
    )
    sane = cand.agg(
        F.coalesce(
            F.min(
                (F.col("a_id") < F.col("b_id"))
                & (F.col("jaccard") >= 0.6999)  # 0.7 − 4-dp rounding slack
                & (F.col("jaccard") <= 1.0)
            ),
            F.lit(True),
        ).alias("sane")
    )
    return (
        n_hi.crossJoin(F.broadcast(hi_found))
        .crossJoin(F.broadcast(n_mid))
        .crossJoin(F.broadcast(mid_found))
        .crossJoin(F.broadcast(sane))
        .select(
            "n_exact_hi",
            "n_exact_mid",
            (F.col("n_hi_found") == F.col("n_exact_hi")).alias("recall_hi_ok"),
            (F.col("n_mid_found") * 10 >= F.col("n_exact_mid") * 9).alias(
                "recall_mid_ok"
            ),
            F.col("sane").alias("pairs_sane_ok"),
        )
    )


def minhash_highsim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — recall-verified MinHash twin (the ANN invariant-twin
    pattern): exact n-gram Jaccard pairs at >= 0.9, kept only if the
    seeded LSH candidate join ALSO surfaced them. With 8 independent
    seeded hash tables a true j >= 0.9 pair escapes candidacy with
    probability (1-j)^8 <= 1e-8, so the semi join is the identity and
    the result hash-matches the exact-pair oracle — any LSH recall
    regression (banding bug, seed drift, empty-vector handling)
    surfaces as missing rows. The raw candidate set stays available
    as ``minhash_lsh_pairs``; its registered form is the
    bound-assertion :func:`minhash_lsh_checked`.
    """
    from .text import ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(spark, sf_dir, threshold=0.9)
    cand = minhash_lsh_pairs(spark, sf_dir)
    return exact.join(cand.select("a_id", "b_id"), ["a_id", "b_id"], "left_semi")
