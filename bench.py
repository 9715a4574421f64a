"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE COMPACT JSON line LAST:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "sf": <float>, "detail_file": "bench_detail.json", ...}

and writes the FULL per-query timing map (plus the same summary fields)
to bench_detail.json next to this script. The driver captures only the
TAIL of stdout; round 6's single giant line (62 per-query timings)
outgrew that window and BENCH_r06.json recorded `parsed: null`, so the
per-query map now lives in the detail file and the stdout line stays
small forever regardless of how many headline queries are added.

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect overhead), timed wall-clock after a warmup scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongo_to_parquet_spark import get_spark  # noqa: E402
from mongo_to_parquet_spark.queries import bench_only, queries  # noqa: E402


def calibrate(spark) -> float:
    """Fixed-work contention sentinel: time a constant in-JVM aggregation
    (no IO, no shuffle — pure whole-stage-codegen arithmetic over
    spark.range). The work is identical every round, so this number
    moves ONLY with environment load (CPU contention, noisy neighbors),
    never with engine code: BENCH_r03 was inflated ~1.6× uniformly by
    sandbox contention, and without a sentinel that was indistinguishable
    from a code regression until the judge re-ran queries by hand.
    Recorded before AND after the suite; compare across rounds to
    normalize totals."""
    t0 = time.perf_counter()
    spark.range(0, 400_000_000, 1, 32).selectExpr(
        "sum(id * 3 + (id % 7)) AS s"
    ).collect()
    return round(time.perf_counter() - t0, 3)

#: headline set: one per operator family that matters at scale
HEADLINE = [
    "q_agg_groupby",        # TPC-H Q1 shape: scan + hash agg
    "q_join_multiway",      # 6-table join chain + agg
    "q_join_sortmerge",     # large-large shuffle join
    "q_join_asof",          # union + window as-of idiom
    "q_win_topk_group",     # window rank + group limit
    "q_topk_global",        # TakeOrderedAndProject
    "q_stream_tumbling",    # time-bucketed agg
    "q_dedup_exact",        # hash groupBy dedup
    "q_dedup_fuzzy",        # exact near-dup pairs (adaptive bitset path)
    "q_dedup_minhash",      # banded MinHash LSH + exact verify (scale path)
    "q_sim_topk",           # brute-force cosine top-k
    "q_sim_topk_batch",     # N probes in one scan (WindowGroupLimit)
    "q_udf_scalar_pandas",  # Arrow-batched pandas UDF
    "q_text_quality_filter",  # per-row text heuristics
    "q_curation_pipeline",  # composed gate→dedup→split, single shuffle
    "q_cluster_zorder",     # codegen'd Morton interleave + agg
    "q_events_transitions",  # sequence window + tiny count agg
    "q_text_entropy",       # zero-shuffle array-HOF per-doc scoring
    "q_dedup_cross_source", # struct-min groupBy, hash-only shuffle
    "q_profile",            # split-plan profiler (two 1-row aggs cross-joined)
    "q_scd2_history",       # gaps-and-islands history, single shuffle
    "q_ts_interpolate",     # grid resample + two ignore-nulls windows
    "q_dedup_semantic",     # centroid broadcast + per-cluster rank
    "q_sample_weighted",    # weighted TakeOrdered sample, pruned scan
    "q_graph_pagerank",     # persisted co-partitioned edges, 3 iterations
    "q_tpch_q5",            # classic 6-table TPC-H join (SMJ facts + bcast dims)
    "q_tpch_q21",           # decorrelated double-EXISTS (1 extra agg, no rescan)
    "q_dedup_clusters",     # iterative min-label propagation to fixed point
    "q_sim_topk_ivf",       # IVF layout: cell-pruned ANN probes
    "q_profile_approx",     # single-pass HLL profile (q_profile's 100 TB mode)
    "q_cdc_apply",          # CDC log -> state via one max_by aggregation
    "q_bm25",               # BM25 ranking: decimal-exact scoring + TakeOrdered
    "q_graph_triangles",    # degree-ordered edge-centric triangle count
    "q_hybrid_rrf",         # RRF fusion of BM25 + cosine lists
    "q_bm25_rm3",           # PRF expansion: feedback mine + weighted re-rank
    "q_drift_psi",          # one-pass binned drift cube
    "q_tpch_q9",            # 5-table profit rollup on the derived part-supplier catalog
    "q_dedup_span",         # C4-style duplicated-window removal + doc reassembly
    "q_dedup_exact_substr", # Lee et al. ExactSubstr: stride-1 windows + run merge
    "q_dedup_substr_incremental",  # ExactSubstr daily-crawl: delta vs persisted index
    "q_logprob_bigram_artifact",   # bigram-LM serve: stored counts, backoff floor
    "q_dedup_fuzzy_prefix",  # exact Jaccard via AllPairs prefix filter (100 TB route)
    "q_ds_rollup_share_rank",  # TPC-DS Q36: ROLLUP Expand feeding Window rank
    "q_ds_distinct_cube",   # CUBE x count-distinct double-Expand report
    "q_embed_kmeans",       # Lloyd k-means: map-only assign + k*d-state update
    "q_join_interval_overlap",  # grid-cell-blocked interval overlap join
    "q_graph_kcore",        # iterative degree peeling, localCheckpoint rounds
    "q_score_recency_decay",  # integer fixed-point decay scoring, one agg
    "q_graph_linkpred",     # kNN-sparsified wedge generation + anti-join
    "q_ts_changepoint",     # CUSUM telescoped to two window frames, one sort
    "q_eval_ann_recall",    # exact + IVF rankings joined for recall@k
    "q_agg_quantile_histogram",  # sortless exact quantiles, 3 censuses/rank
    "q_assoc_rules",        # basket rules via map-side pair generation
    "q_dedup_incremental",  # delta-vs-persisted-index dedup (daily-crawl shape)
    "q_pii_luhn",           # codegen HOF digit folds, pure map-side throughput
    "q_geo_grid_knn",       # grid-cell-blocked spatial kNN join
    "q_stats_spearman",     # two rank censuses joined back onto the fact
    "q_stats_bootstrap",    # 32-replicate Poisson bootstrap, one scan
    "q_sim_topk_ivfpq",     # IVF×PQ layout build+write+ADC probe (round 6)
    "q_select_dsir",        # DSIR importance selection over hashed bigrams
    "q_dsir_apply_artifact",  # DSIR serve: stored integer stats, one featurize pass
    "q_dedup_url",          # map-side URL canonicalization, one shuffle
    "q_text_langid_ngram",  # hashed char-trigram linear classifier, train+eval
    "q_decontaminate_doc",  # broadcast-eval n-gram screening
    "q_partition_bounds",   # shared-round multi-rank boundary probes
    "q_bpe_train",          # full k-merge tokenizer training (census loop)
    "q_unigram_train",      # unigram-LM tokenizer: seed + 2 Viterbi-EM rounds
    "q_wordpiece_train",    # WordPiece: likelihood-score merges (census loop)
    "q_unigram_pipeline",   # unigram train->apply composed (census + 1 corpus pass)
    "q_chunk_fixed",        # map-only token-window chunking (scan-speed)
    "q_pack_greedy",        # T5-style no-split packing, Arrow grouped-map
    "q_pack_bfd",           # best-fit-decreasing packing, same grouped-map shape
    "q_assembly_pipeline",  # gate->dedup->decontaminate->pack, composed
    "q_bpe_apply_artifact",       # apply-only serving path (trained store warm)
    "q_wordpiece_apply_artifact", # apply-only serving path (trained store warm)
    "q_unigram_apply_artifact",   # apply-only serving path (trained store warm)
    "q_langid_apply_artifact",    # classifier serve: stored weights, no retrain
    "q_logprob_apply_artifact",   # LM serve: stored freq table, one token pass
    "q_oov_apply_artifact",       # vocab serve: stored top-k, one token pass
    "q_kmeans_apply_artifact",    # centroid serve: map-only assignment pass
    "q_pca_apply_artifact",       # component serve: 64-row broadcast projection
    "q_bpe_retrain_incremental",  # census-state retrain: O(delta) refresh + train
    "q_mm_parse_headers",   # magic-dispatch container parsing, headers-only scan
    "q_tokenizer_eval",     # triad fertility/coverage report, one census pass
    "q_ann_tuning",         # IVF (overlap x n_probe) recall/cost surface
    "q_ann_drift",          # layout staleness monitor: build-vs-now recall
    "q_dedup_exact_substr_hashed",  # ExactSubstr, 32-byte shuffle keys (scale form)
    "q_quality_train",      # fixed-point logreg training, 16 iterations
    "q_quality_apply_artifact",  # trained-classifier serve: literal weights, scan-speed
    "q_ppl_buckets",        # CCNet tercile bucketing: LM score + one lang window
    "q_curation_report_ppl",  # funnel + per-lang ppl sub-buckets composed
    "q_curation_report_model",  # funnel gated by the TRAINED classifier
    # linkage: SNM is the headline/scale route (candidates exactly n*w,
    # measured linear at x10); q_link_fs (nation-blocked all-pairs) stays a
    # declared key as the small-N exact baseline but is NOT benched — its
    # candidate volume was measured quadratic in corpus growth
    # (scaletest_results_r6_newops.json: pairs x100, wall x19 at x10)
    "q_link_fs_snm",        # Fellegi-Sunter linkage, sorted-neighborhood candidates
    # engine-native sketch formulations (bench-only, not driver-declared:
    # estimates are engine-specific; the declared keys are KMV twins)
    "q_agg_approx_distinct_native",    # one-pass HLL++ count-distinct
    "q_agg_approx_percentile_native",  # GK sketch per group
    "q_agg_hll_sketch_native",         # DataSketches HLL + union merge
    "q_profile_approx_native",         # single-HashAggregate HLL profile
    "q_sim_topk_ivfpq_serve",          # ANN serve latency off a built layout
    "q_sim_topk_ivfpq_refine_serve",   # two-stage serve: + exact 50-vec re-rank
]

#: the round-1 headline set — reported as a subtotal so totals stay
#: comparable across rounds as HEADLINE grows
ROUND1_SET = HEADLINE[:20]

#: fixed reference for contention normalization: the calibrate() time on
#: an idle build/driver box (rounds 4-5 measured 0.33-0.39 across four
#: idle runs). NEVER retune this per round — it is the unit definition.
CALIB_REF_SEC = 0.35

#: re-run the contention sentinel every N keys during the timed loop.
#: A single start-of-suite calibration under-corrects DECAYING contention
#: (BENCH_r09: calib 0.727 before → 0.383 after while the driver's box
#: drained — early keys read 2× slow, late keys honest, and the one-shot
#: normalization split the difference). Per-key normalization uses the
#: NEAREST sentinels instead: each key divides by min(sentinel before its
#: block, sentinel after) / CALIB_REF_SEC. Cost: ~0.4s per sentinel,
#: ~4s per suite.
CALIB_EVERY = 10

#: documented variance outliers (SCALE.md / VERDICT r9: the census-loop
#: trainers' driver-loop wall moved 5.5→8.4s and 2.1→4.4s on identical
#: code) get extra timed reps — min-of-5 instead of min-of-3 — so their
#: round-over-round numbers measure the engine, not scheduler jitter.
EXTRA_REPS = {"q_wordpiece_train": 5, "q_unigram_train": 5}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**queries(), **bench_only()}
    load_start = os.getloadavg()
    calibrate(spark)  # discard: first run pays codegen/JIT, not contention
    calib_before = calibrate(spark)

    # warmup: run every headline plan once at the smallest sf so the timed
    # pass measures steady-state execution, not first-run codegen/JIT
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for key in HEADLINE:
        qs[key](spark, warm_dir).write.format("noop").mode("overwrite").save()

    # best of 3 timed iterations: local[32] wall-clock is noisy (GC, OS
    # scheduler — SCALE.md documents ±15% run-to-run on identical code);
    # the min is the steady-state number a warm cluster would see
    timings: dict[str, float] = {}
    sentinels: list[float] = [calib_before]
    key_sentinel: dict[str, int] = {}
    for i, key in enumerate(HEADLINE):
        if i and i % CALIB_EVERY == 0:
            sentinels.append(calibrate(spark))
        key_sentinel[key] = len(sentinels) - 1
        best = float("inf")
        for _ in range(EXTRA_REPS.get(key, 3)):
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[key] = round(best, 3)
        # iterative queries persist their edge/state relations and leave the
        # cleanup to the caller; drop them so cached blocks from one query
        # don't pressure the next one's heap (isolation, not speed-up)
        spark.catalog.clearCache()
    # close the last block BEFORE the export phase so its keys normalize
    # by a sentinel adjacent in time, not one taken a minute later
    sentinels.append(calibrate(spark))
    # per-key contention factor: min of the sentinels bracketing the
    # key's block (min, not mean — one contended sentinel must not
    # poison ten keys, same reasoning as the suite-level min), CLAMPED
    # at 1.0: the round-10 four-run experiment showed the "fixed-work"
    # sentinel is JIT-state-dependent — late in a session C2 compiles
    # the codegen loop down to 0.12-0.24s vs the 0.35 idle reference,
    # and an unclamped factor then INFLATES late keys ~1.5-2.8×.
    # Normalization exists to correct contention slowdowns; a
    # sub-reference sentinel means JIT luck, not a faster box, so the
    # factor never drops below 1 (idle box ⇒ normalized ≡ raw).
    queries_calib = {
        k: min(sentinels[b], sentinels[b + 1]) for k, b in key_sentinel.items()
    }
    queries_normalized = {
        k: round(timings[k] / max(queries_calib[k] / CALIB_REF_SEC, 1.0), 3)
        for k in timings
    }

    # the reference's core operation: date-partitioned parquet export
    # (scan → year/month/day derivation → hive year= write, zstd). Timed
    # as rows/sec so the number is comparable across rounds and scales —
    # the reference publishes no throughput (BASELINE.md), so this is the
    # engine's own single-node export baseline.
    import shutil
    import tempfile

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.export import export_partitioned

    lineitem = load_table(spark, sf_dir, "lineitem")
    export_rows = lineitem.count()
    out = tempfile.mkdtemp(prefix="bench_export_")
    try:
        # warmup at the small sf: first-use costs (committer init, zstd
        # codec load, output-writer codegen) belong to session startup, not
        # steady-state throughput — then best-of-2, same as the queries
        # (round-over-round comparisons of a single cold shot moved ±20%
        # on identical code)
        export_partitioned(
            load_table(spark, warm_dir, "lineitem"),
            f"{out}/warmup",
            date_field="l_shipdate",
        )
        export_sec = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            export_partitioned(
                lineitem, f"{out}/lineitem{i}", date_field="l_shipdate"
            )
            export_sec = min(export_sec, round(time.perf_counter() - t0, 3))
    finally:
        shutil.rmtree(out, ignore_errors=True)

    calib_after = calibrate(spark)
    load_end = os.getloadavg()

    total = round(sum(timings.values()), 3)
    summary = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "n_queries": len(HEADLINE),
        # same-set subtotal for cross-round comparison (the
        # headline set grows each round; compare THIS number to
        # earlier rounds' value, not the growing total)
        "round1_set_total_sec": round(
            sum(timings[k] for k in ROUND1_SET if k in timings), 3
        ),
        "sf": sf,
        "export_rows": export_rows,
        "export_sec": export_sec,
        "export_rows_per_sec": round(export_rows / export_sec),
        # contention sentinel (see calibrate()): fixed in-JVM work
        # timed before/after the suite + 1/5/15-min loadavg.
        # Identical code ⇒ identical calib time on an idle box;
        # a uniformly inflated round with inflated calib numbers
        # is environment, not regression.
        "calib_before_sec": calib_before,
        "calib_after_sec": calib_after,
        # contention-normalized totals: divide by the MIN
        # calibration time over a fixed reference (0.35s — the
        # round-4/5 driver sentinel on an idle box), so a round
        # whose box ran uniformly 1.6× slow reads ~1.0× here.
        # Min, not mean: a single contended calibration (one
        # run measured 1.21s before / 0.31s after) would poison
        # a mean the same way a cold first rep poisons best-of-3.
        # Compare normalized_* across rounds FIRST; adjudicate
        # raw seconds only when the calibrations already agree.
        "calib_ref_sec": CALIB_REF_SEC,
        # suite-level factor clamped at 1.0 for the same JIT-drift
        # reason as the per-key factors (see queries_normalized)
        "normalized_total": round(
            total / max(min(calib_before, calib_after) / CALIB_REF_SEC, 1.0),
            3,
        ),
        "normalized_round1_set": round(
            sum(timings[k] for k in ROUND1_SET if k in timings)
            / max(min(calib_before, calib_after) / CALIB_REF_SEC, 1.0),
            3,
        ),
        # STEPWISE normalization (round-9 verdict item 5): each key
        # divided by its nearest bracketing sentinel — corrects decaying
        # contention the single-factor normalized_* cannot. Compare these
        # across rounds first; they are stable under a loaded box.
        "normalized_total_stepwise": round(sum(queries_normalized.values()), 3),
        "normalized_round1_set_stepwise": round(
            sum(queries_normalized[k] for k in ROUND1_SET if k in timings), 3
        ),
        "calib_sentinels": sentinels,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "detail_file": "bench_detail.json",
    }
    # full per-query map goes to a FILE, not stdout: the driver captures
    # only the tail of stdout, and a queries-map line already overflowed
    # it once (BENCH_r06.json parsed:null). Written under BOTH the
    # canonical name and a per-core-count name: the driver's low-core
    # scaling rerun overwrote the 32-core run's detail in round 11, which
    # emptied PERF_r11's per_query/scaling blocks (n_common: 0) — the
    # c{cpus} copies keep every run's map addressable (round-11 verdict
    # item 2; additions-only, the canonical file and stdout contract are
    # unchanged).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    here = os.path.dirname(os.path.abspath(__file__))
    detail = {
        **summary,
        "queries": timings,
        "queries_calib": queries_calib,
        "queries_normalized": queries_normalized,
    }
    for name in ("bench_detail.json", f"bench_detail_c{cpus}.json"):
        with open(os.path.join(here, name), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
            f.write("\n")
    # the compact summary is the LAST stdout line (driver-parsed)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
