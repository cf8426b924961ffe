"""Scale-smoke: measure how headline plans scale when the FACT tables
grow 10x with dimensions fixed — the shape of real growth (SCALE.md's
central claim, turned into numbers).

Builds an sf1-equivalent dataset under the system temp dir by
replicating the sf0.1 fact tables (lineitem / orders / events /
documents) K times with key offsets that keep every join relationship
intact — order keys shift in lockstep on both sides of the
lineitem⋈orders join, customer/supplier/part foreign keys stay inside
the fixed dimension ranges, doc/event ids stay unique. Dimension
tables are copied as-is (dims grow ~log of facts in practice).

Then times a representative query per family at both scales and
prints per-query wall clock + the time ratio. A plan that does
per-row work scales ~linear (ratio ≈ K on fixed cores); anything
super-linear (a pair blow-up, a broadcast that stopped fitting, a
single-reducer stage) shows up as ratio >> K. This is measurement of
OUR plans' scaling exponent, not a driver-graded benchmark — the
oracle gate stays on the driver's own testdata.

Usage: python tools/scale_smoke.py [--k 10] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FACTS = ("lineitem", "orders", "events", "documents")
DIMS = ("region", "nation", "customer", "supplier", "part", "embeddings")

QUERIES = (
    "q1_pricing_summary",          # full-scan agg
    "q9_product_profit",           # multiway broadcast join + fact shuffle
    "flagship_windowed_analytics", # event-time windows
    "l1_dup_group_stats",          # content-hash groupBy
    "l2_ngram_jaccard_pairs",      # capped shingle self-pairing
    "ts_ohlc_hourly",              # mergeable struct-argmin rollup
    "wf_sessionize_events",        # per-user window sort
    "graph_trade_pagerank",        # aggregate-then-iterate graph loop
    "l4_bpe_merge_candidates",     # vocab-dict pair mining
    "l2_line_boilerplate_stats",   # line-hash df + per-lang rollup
    "l4_bigram_logprob_quality",   # bigram LM train + broadcast score
    "l4_bm25_search",              # tf/df build + broadcast query scoring
    "mta_linear_attribution",      # per-user RANGE window credit pass
    "wf_peak_concurrency",         # two-phase distributed prefix sum
    "l2_ppjoin_jaccard_pairs",     # prefix-filtered exact jaccard
    "l2_containment_pairs",        # capped containment scoring
    "ts_ewma_daily_value",         # bounded-frame array-HOF decay
    "graph_trade_triangles",       # oriented-edge triangle join
    "l4_weighted_sample",          # A-ES global top-k selection
    # round-4 additions (r3 verdict ask #4): the round-3 heavyweights
    "l4_rrf_hybrid_search",        # BM25 traversal + cosine scan + RRF fusion
    "l6_training_pipeline",        # composed dedup→quality→pack pipeline
    "dq_zorder_pruning_audit",     # Morton-layout pruning replay
    "m5_logreg_gd",                # unrolled-GD trainer (broadcast weights)
    # second-wave round-4 additions: the new fact-scale shapes
    # (l3_knn_blockmatmul is NOT here: its input, embeddings, is a
    # dimension table in this harness so the ratio would measure
    # nothing — its scan scales like the corpus by construction)
    "l4_textrank_keywords",        # adjacent-pair extract + vocab iteration
    "l4_pmi_collocations",         # bigram/unigram counts + ln ratio
    "dq_hbos_outliers",            # double-histogram score join + top-k
    "sf_gini_topshare_revenue",    # two-phase prefix sums + boundary cut
    "ts_holt_linear_daily",        # daily rollup + 1-row array recurrence
    # fourth-wave round-4 additions
    "rec_copurchase_topk",         # basket self-join + item-pair grain
    "m10_conformal_interval",      # moment fit + order-stat + coverage pass
    "l4_retrieval_metrics",        # postings metrics over the bm25 ranking
    "sf_mutual_information",       # contingency-grid windows
    "l4_feature_hashing_stats",    # vocab-grain bucket histogram
    "l4_quantile_align_audit",     # per-source windows + pooled prefix sum
    # round-7 addition (l3_ivf_recall_sweep is NOT here for the same
    # reason as blockmatmul: embeddings is a dimension table)
    "l2_cdc_chunk_dedup",          # codegen window hash + chunk-store shuffle
    "wf_conversion_lag",           # two user-grain min-aggs + bucket grain
    # fifth-wave round-4 additions
    "wf_cohort_ltv_triangle",      # signup join + (cohort, week) grain
    "m11_auc_logreg",              # GD passes + score-grain rank sums
    "ts_holt_anomaly_days",        # daily Holt + metadata-scale MAD gate
    "l4_importance_weights",       # two unigram LMs + per-doc score
    "dq_delta_attribution",        # fact-dim join + 10-row decomposition
    "graph_trade_harmonic",        # edge build + |V|^2 frontier BFS
    "ts_forecast_backtest",        # Holt output + 1-row metric aggregate
    "s_schema_evolution_scan",     # two-batch staged write + merge scan
    # sixth/seventh-wave round-4 additions
    "m12_adaboost_stumps",         # grid-exploded stump scoring x2 rounds
    "m13_calibration_bins",        # scoring pass + 10-bin reliability agg
    "wf_dau_mau_stickiness",       # 28x membership-amplified distinct
    "er_blocking_quality",         # dim-bound scorecard (facts don't touch it)
    "l3_lsh_plane_sweep",          # 3x corpus projection + sig-grain aggs
    "l2_semantic_threshold_sweep", # label-blocked cosine pairs + explode grid
    "l6_training_mix_v2",          # dedup closure + DSIR gate + packing
    "sketch_countmin_words",       # vocab-grain salted-cell sums
    # eighth/ninth-wave round-4 additions
    "p_corrupt_record_audit",      # staged-fixture permissive scan
    "sf_theil_decomposition",      # per-customer ln moments + 5-row decomp
    "sf_brown_forsythe_value",     # per-group prefix-sum medians + ANOVA
    "wf_new_vs_returning",         # user-grain first-day + day grain
    "graph_trade_assortativity",   # edge build + degree moments
    "ts_periodogram_power",        # daily rollup + 3x trig projection
    "dq_column_entropy_profile",   # four vocab-grain column counts
    "dq_event_order_audit",        # one user-grain conditional-min pass
    "l4_heaps_law_fit",            # first-occurrence deciles + 10-pt OLS
    "sf_partial_correlation",      # user-grain moments, 1-row formula
    # tenth-wave round-4 additions
    "ts_max_drawdown",             # daily cumsum + running max + argmax
    "m14_cohens_kappa",            # m5 scoring pass + 1-row kappa
    "graph_trade_reciprocity",     # edge aggregate + swapped self-join
    # round-5 additions: the real pixel/sample codec stages — per-doc
    # CPU work behind a metadata repartition, expected ~linear
    "l5_png_pixel_decode_stats",   # stdlib PNG encode+full pixel decode
    "l5_wav_pcm_decode_stats",     # RIFF container build + PCM demux
    "l5_decode_quarantine_audit",  # decode + per-row corruption quarantine
    "l5_jpeg_pixel_decode_stats",  # baseline-JPEG entropy code + DCT roundtrip
    "l5_avi_frame_sample_stats",   # AVI mux/demux + stride frame extraction
)


def build(spark, src: str, k: int) -> str:
    from pyspark.sql import functions as F

    st = os.stat(os.path.join(src, "lineitem.parquet"))
    tag = hashlib.md5(f"{src}|{k}|{st.st_mtime_ns}|{st.st_size}".encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"rtba_scale_{tag}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(out, exist_ok=True)

    def rd(name):
        return spark.read.parquet(os.path.join(src, f"{name}.parquet"))

    for name in DIMS:
        rd(name).write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    okey_span = rd("orders").agg(F.max("o_orderkey")).first()[0] + 1
    ev_span = rd("events").agg(F.max("event_id")).first()[0] + 1
    doc_span = rd("documents").agg(F.max("doc_id")).first()[0] + 1

    def replicate(df, shifts: dict):
        copies = []
        for i in range(k):
            c = df
            for col, span in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(int(i * span)))
            copies.append(c)
        r = copies[0]
        for c in copies[1:]:
            r = r.unionByName(c)
        return r

    replicate(rd("orders"), {"o_orderkey": okey_span}).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    replicate(rd("lineitem"), {"l_orderkey": okey_span}).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    replicate(rd("events"), {"event_id": ev_span}).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    replicate(rd("documents"), {"doc_id": doc_span}).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    open(os.path.join(out, "_SUCCESS"), "w").close()
    return out


def build_embed(spark, src: str, k: int) -> str:
    """EMBEDDINGS-scaled corpus (round 10, VERDICT r9 ask #3):
    ``embeddings`` is a dimension table under ``build``'s fact
    replication, so the ANN family had no measured 10x ratio. Here it
    is replicated K times with vec_id shifts (copy i keeps its
    vectors/labels — corpus GROWTH, which is what shard-local graph
    build and search costs scale with); every other table is copied
    as-is (only embeddings-readers are valid against this corpus).
    The N_QUERIES demo query vectors (vec_id < 5) live in copy 0 and
    stay the query set at every K."""
    from pyspark.sql import functions as F

    st = os.stat(os.path.join(src, "embeddings.parquet"))
    tag = hashlib.md5(
        f"{src}|embed|{k}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"rtba_scale_embed_{tag}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(out, exist_ok=True)

    def rd(name):
        return spark.read.parquet(os.path.join(src, f"{name}.parquet"))

    for name in FACTS + tuple(d for d in DIMS if d != "embeddings"):
        rd(name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    emb = rd("embeddings")
    span = emb.agg(F.max("vec_id")).first()[0] + 1
    copies = [emb]
    for i in range(1, k):
        copies.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(int(i * span)))
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    open(os.path.join(out, "_SUCCESS"), "w").close()
    return out


# Queries whose scale axis is the EMBEDDINGS corpus: route to
# build_embed's vector-replicated dir (they read no fact table).
EMBED_QUERIES = (
    "l3_knn_hnsw",
    "l3_knn_hnsw_serving",
    "l3_knn_hnsw_indexed",
    "l3_hnsw_index_append",
)


# Queries valid in --unique mode (documents-only readers): the near-dup
# pair stages and the L6 pipelines whose 10x clique-corpus ratios
# SCALE.md attributes to the replicated-duplicate workload, not the plan.
UNIQUE_QUERIES = (
    "l2_ngram_jaccard_pairs",
    "l2_ppjoin_jaccard_pairs",
    "l2_containment_pairs",
    "l6_training_pipeline",
    "l6_training_mix_v2",
)


def build_unique(spark, src: str, k: int) -> str:
    """MOSTLY-UNIQUE 10x corpus: replicate ``documents`` K times with
    doc_id shifts, but tag every word of copy i>0 with a per-copy
    suffix so replicas share no shingles with each other or the
    original — the shape of real corpus growth (mostly-new text),
    as opposed to ``build``'s verbatim replication which makes every
    document a K-way duplicate clique. Word counts and intra-copy
    near-dup structure are preserved (same generator statistics), so
    the corpus-wide dedup rate equals the base corpus's own (~4.9%% at
    sf0.1 — measured via dedup_corpus survivors 4756/5000), well under
    the 10%% mostly-unique bar. n_chars is recomputed from the tagged
    text so length-gated stages stay consistent. Non-document tables
    are copied as-is (only documents-readers are valid here)."""
    from pyspark.sql import functions as F

    st = os.stat(os.path.join(src, "documents.parquet"))
    tag = hashlib.md5(
        f"{src}|uniq|{k}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"rtba_scale_uniq_{tag}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(out, exist_ok=True)

    def rd(name):
        return spark.read.parquet(os.path.join(src, f"{name}.parquet"))

    for name in DIMS + ("lineitem", "orders", "events"):
        rd(name).write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    docs = rd("documents")
    doc_span = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = [docs]
    for i in range(1, k):
        tagged = F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"~{i}"))),
            " ",
        )
        copies.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(int(i * doc_span)))
            .withColumn("text", tagged)
            .withColumn("n_chars", F.length("text").cast("long"))
        )
    r = copies[0]
    for c in copies[1:]:
        r = r.unionByName(c)
    r.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    open(os.path.join(out, "_SUCCESS"), "w").close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--unique",
        action="store_true",
        help="measure the mostly-unique (word-tagged) 10x corpus instead "
        "of the verbatim clique replication",
    )
    ap.add_argument("names", nargs="*", help="subset of QUERIES to time")
    args = ap.parse_args()

    from real_time_big_data_analytics_spark.registry import all_queries
    from real_time_big_data_analytics_spark.session import get_spark

    spark = get_spark("rtba-scale-smoke")
    if args.unique:
        big = build_unique(spark, args.sf, args.k)
        if not args.names:
            args.names = list(UNIQUE_QUERIES)
    else:
        big = build(spark, args.sf, args.k)
    queries = all_queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(queries["q1_pricing_summary"].fn(spark, args.sf))  # warm-up

    report = {}
    for name in (args.names or QUERIES):
        times = {}
        for label, sf_dir in (("base", args.sf), (f"x{args.k}", big)):
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                force(queries[name].fn(spark, sf_dir))
                runs.append(time.monotonic() - t0)
            times[label] = round(min(runs), 3)
        ratio = round(times[f"x{args.k}"] / max(times["base"], 1e-9), 2)
        report[name] = {**times, "ratio": ratio}
        print(f"{name:34s} base={times['base']:7.3f}s x{args.k}={times[f'x{args.k}']:7.3f}s ratio={ratio}")

    print(json.dumps({"k": args.k, "queries": report}))


if __name__ == "__main__":
    main()
