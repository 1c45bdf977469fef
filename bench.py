"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Headliners cover the engine's main physical shapes: the flagship
point-in-time pipeline (as-of join + windows + scoring), both as-of
strategies in isolation, window features, a TPC-H-style aggregation, the
moment-partial scoring path, dedup via MinHash-LSH, brute-force ANN, and
the synthetic image pipeline (binary payloads + decode-free feature path).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from pyspark.sql import functions as F

    from modlyn_spark.session import get_spark

    spark = get_spark(
        "modlyn-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warmup: JVM JIT + codegen + parquet footer caches, not a benched query
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1).collect()

    def run(df) -> int:
        """Force FULL evaluation: hash every output column of every row
        into one aggregate. A bare count() lets Catalyst prune unreferenced
        window/aggregate expressions (the project's recorded benching trap
        — a count over a percentile query times a key-only groupBy), so the
        consumer must reference every column. xxhash64 over all columns,
        summed in decimal(38,0) (ANSI-safe), one tiny result row."""
        row = (
            df.select(F.xxhash64(*df.columns).alias("__h"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("__h").cast("decimal(38,0)")).alias("s"),
            )
            .collect()[0]
        )
        return int(row["n"])

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # optional subset (comma list) for big-SF runs where only the scaled
    # tables' queries are meaningful: SPARK_GRAFT_QUERIES=a,b,c
    only = {
        q for q in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if q
    }

    def bench(name: str, fn) -> None:
        if only and name not in only:
            return
        t0 = time.perf_counter()
        n = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n

    # resolve ALL query names across both contract dicts so slot
    # reshuffles between queries() and retired_queries() cannot break the
    # bench (asof_join/sessionize retired in r4; the r3 swap already bit
    # once)
    all_qs = {**entrymod.retired_queries(), **qs}

    # flagship: full point-in-time feature + scoring pipeline
    bench("flagship_pipeline", lambda: run(_flagship(spark, sf_dir)))

    bench("asof_union", lambda: run(all_qs["asof_join"](spark, sf_dir)))
    bench("asof_merge", lambda: run(all_qs["asof_join_merge"](spark, sf_dir)))
    bench("window_features", lambda: run(all_qs["rolling_stats"](spark, sf_dir)))
    bench("sessionize", lambda: run(all_qs["session_stats"](spark, sf_dir)))
    bench("tpch_q1", lambda: run(all_qs["tpch_q1"](spark, sf_dir)))
    bench("class_feature_stats", lambda: run(all_qs["class_feature_stats"](spark, sf_dir)))
    bench("f_statistic", lambda: run(all_qs["f_statistic"](spark, sf_dir)))
    # NOTE r01 -> r02: the dedup_minhash_lsh QUERY changed semantics —
    # r01 benched star-edge dedup groups (est-scored, O(n x bands)); r02's
    # driver query is the exact-verified pair set (every pair re-scored by
    # exact n-gram Jaccard — inherently heavier: DuckDB needs ~150s for the
    # same answer at sf0.1). dedup_minhash_groups keeps the r01-comparable
    # workload measurable under its own name.
    bench("dedup_minhash_lsh", lambda: run(all_qs["dedup_minhash_lsh"](spark, sf_dir)))
    bench("dedup_minhash_groups", lambda: run(_minhash_groups(spark, sf_dir)))
    bench("ann_cosine_topk", lambda: run(all_qs["ann_cosine_topk"](spark, sf_dir)))
    bench("image_pipeline", lambda: run(all_qs["image_pipeline"](spark, sf_dir)))
    # round-2 additions: rank-based scoring, bucketed embedding dedup,
    # simhash near-dup (exact-verified), percentile profiling
    bench("wilcoxon_scores", lambda: run(all_qs["wilcoxon_scores"](spark, sf_dir)))
    bench("embedding_dup_pairs",
          lambda: run(all_qs["embedding_dup_pairs"](spark, sf_dir)))
    bench("dedup_simhash", lambda: run(all_qs["dedup_simhash"](spark, sf_dir)))
    bench("value_percentiles",
          lambda: run(all_qs["value_percentiles"](spark, sf_dir)))
    # round-3 additions: Gopher repetition signals (shuffle-free Arrow
    # map), C4 corpus-level chunk dedup, winnowed verbatim-span dedup.
    bench("repetition_signals",
          lambda: run(all_qs["repetition_signals"](spark, sf_dir)))
    bench("corpus_chunk_dedup",
          lambda: run(all_qs["corpus_chunk_dedup"](spark, sf_dir)))
    bench("span_dup_pairs",
          lambda: run(all_qs["span_dup_pairs"](spark, sf_dir)))
    # round-4 additions: cross-corpus contamination (eval-set-sized probe
    # — pins the near-broadcast claim) and the composed curation pipeline
    bench("minhash_contamination",
          lambda: run(all_qs["minhash_contamination"](spark, sf_dir)))
    bench("span_contamination",
          lambda: run(all_qs["span_contamination"](spark, sf_dir)))
    bench("curation_pipeline",
          lambda: run(all_qs["curation_pipeline"](spark, sf_dir)))
    bench("pack_sequences",
          lambda: run(all_qs["pack_sequences"](spark, sf_dir)))
    bench("unigram_logprob",
          lambda: run(all_qs["unigram_logprob"](spark, sf_dir)))
    # late-r4 additions: privacy scrub (pure codegen regex map), SemDeDup
    # cluster-then-prune, Bloom-pruned incremental dedup, and the hashed
    # n-gram classifier (featurize + 8 treeAggregate Adam steps)
    bench("pii_scrub", lambda: run(all_qs["pii_scrub"](spark, sf_dir)))
    bench("semdedup", lambda: run(all_qs["semdedup"](spark, sf_dir)))
    bench("incremental_dedup",
          lambda: run(all_qs["incremental_dedup"](spark, sf_dir)))
    bench("quality_classifier",
          lambda: run(all_qs["quality_classifier"](spark, sf_dir)))
    bench("text_predictions",
          lambda: run(all_qs["text_predictions"](spark, sf_dir)))
    bench("bigram_logprob",
          lambda: run(all_qs["bigram_logprob"](spark, sf_dir)))
    bench("url_filter", lambda: run(all_qs["url_filter"](spark, sf_dir)))
    bench("bm25_topk", lambda: run(all_qs["bm25_topk"](spark, sf_dir)))
    bench("chunk_documents",
          lambda: run(all_qs["chunk_documents"](spark, sf_dir)))
    # r4 third-session additions: the fused feature-store assembly (three
    # state tables, one shuffle), out-of-fold target encoding, and the
    # shared-moments feature-selection pass (corr + MI)
    bench("training_set",
          lambda: run(all_qs["training_set"](spark, sf_dir)))
    bench("target_encode",
          lambda: run(all_qs["target_encode"](spark, sf_dir)))
    bench("feature_corr",
          lambda: run(all_qs["feature_corr"](spark, sf_dir)))
    bench("mi_scores", lambda: run(all_qs["mi_scores"](spark, sf_dir)))
    # r4 fourth-session additions: the composed training-table plan
    # (compaction + fused as-of + age/split/fold) and exact histogram
    # binning + robust scaling
    bench("training_table",
          lambda: run(all_qs["training_table"](spark, sf_dir)))
    bench("quantile_bins",
          lambda: run(all_qs["quantile_bins"](spark, sf_dir)))
    # r4 fifth-session additions: PQ ADC search (encode + top-k over the
    # committed codebook artifact) and blocked edit-distance linkage
    bench("pq_topk", lambda: run(all_qs["pq_topk"](spark, sf_dir)))
    bench("fuzzy_linkage",
          lambda: run(all_qs["fuzzy_linkage"](spark, sf_dir)))
    # r4 sixth-session additions: the data-quality surface (profiler +
    # expectation suite: one fused aggregate scan each), MG heavy hitters
    # (sketch-pruned exact token frequencies) and iterative PageRank over
    # the slot-hash link graph (10 power rounds, rank-vector-only shuffle)
    bench("table_profile",
          lambda: run(all_qs["table_profile"](spark, sf_dir)))
    bench("expectations",
          lambda: run(all_qs["expectations"](spark, sf_dir)))
    bench("heavy_hitters",
          lambda: run(all_qs["heavy_hitters"](spark, sf_dir)))
    bench("pagerank_hosts",
          lambda: run(all_qs["pagerank_hosts"](spark, sf_dir)))
    bench("incremental_agg",
          lambda: run(all_qs["incremental_agg"](spark, sf_dir)))
    bench("source_lang_rollup",
          lambda: run(all_qs["source_lang_rollup"](spark, sf_dir)))
    bench("bootstrap_ci",
          lambda: run(all_qs["bootstrap_ci"](spark, sf_dir)))
    bench("welch_ab",
          lambda: run(all_qs["welch_ab"](spark, sf_dir)))
    # round-5 additions: last-N point-in-time history arrays (window over
    # events + bucketed as-of), survivorship golden records (one fused
    # groupBy + mode histogram), U-shaped multi-touch attribution
    # (bucketized interval join + per-conversion window), and the 3-batch
    # versioned streaming-aggregate replay
    bench("history_features",
          lambda: run(all_qs["history_features"](spark, sf_dir)))
    bench("golden_records",
          lambda: run(all_qs["golden_records"](spark, sf_dir)))
    bench("attribution",
          lambda: run(all_qs["attribution"](spark, sf_dir)))
    bench("agg_maintainer",
          lambda: run(all_qs["agg_maintainer"](spark, sf_dir)))
    # round-5 second wave: ViT patch extraction (Arrow map, zero
    # shuffle), Efraimidis-Spirakis weighted sampling (shard-pruned
    # windows), and apriori pair mining (basket self-join after the
    # broadcast-semi frequent-item cut)
    bench("image_patches",
          lambda: run(all_qs["image_patches"](spark, sf_dir)))
    bench("weighted_take",
          lambda: run(all_qs["weighted_take"](spark, sf_dir)))
    bench("frequent_pairs",
          lambda: run(all_qs["frequent_pairs"](spark, sf_dir)))
    bench("path_transitions",
          lambda: run(all_qs["path_transitions"](spark, sf_dir)))
    bench("trend_features",
          lambda: run(all_qs["trend_features"](spark, sf_dir)))
    bench("triangle_counts",
          lambda: run(all_qs["triangle_counts"](spark, sf_dir)))
    bench("radius_join",
          lambda: run(all_qs["radius_join"](spark, sf_dir)))
    bench("mad_outliers",
          lambda: run(all_qs["mad_outliers"](spark, sf_dir)))
    bench("concentration",
          lambda: run(all_qs["concentration"](spark, sf_dir)))
    bench("quantile_norm",
          lambda: run(all_qs["quantile_norm"](spark, sf_dir)))
    # round-5 third wave: aspect-ratio bucket assignment (one codegen
    # argmin expression, zero shuffle) and per-user CUSUM drift (one
    # entity-keyed window shuffle)
    bench("aspect_buckets",
          lambda: run(all_qs["aspect_buckets"](spark, sf_dir)))
    bench("cusum_changepoints",
          lambda: run(all_qs["cusum_changepoints"](spark, sf_dir)))
    # round-5 fourth wave: the training-dynamics curation tier —
    # cartography (one groupBy over the 5-epoch log), confident-learning
    # label audit (k-row threshold aggregate + shuffle-free restricted
    # argmax), webdataset shard layout (one group exchange + prefix-sum
    # windows)
    bench("dataset_cartography",
          lambda: run(all_qs["dataset_cartography"](spark, sf_dir)))
    bench("label_errors",
          lambda: run(all_qs["label_errors"](spark, sf_dir)))
    bench("shard_plan",
          lambda: run(all_qs["shard_plan"](spark, sf_dir)))
    # round-5 fifth wave: the augmentation + curriculum layer — mixup
    # pairing (one exchange + co-keyed self-join), cutmix geometry
    # (zero shuffle), curriculum entry epochs and per-class data-diet
    # prune (histogram-sized windows)
    bench("mixup_plan",
          lambda: run(all_qs["mixup_plan"](spark, sf_dir)))
    bench("cutmix_plan",
          lambda: run(all_qs["cutmix_plan"](spark, sf_dir)))
    bench("curriculum_plan",
          lambda: run(all_qs["curriculum_plan"](spark, sf_dir)))
    bench("data_diet",
          lambda: run(all_qs["data_diet"](spark, sf_dir)))
    bench("random_projection",
          lambda: run(all_qs["random_projection"](spark, sf_dir)))
    bench("canonical_docs",
          lambda: run(all_qs["canonical_docs"](spark, sf_dir)))
    bench("acquisition_scores",
          lambda: run(all_qs["acquisition_scores"](spark, sf_dir)))
    bench("class_weights",
          lambda: run(all_qs["class_weights"](spark, sf_dir)))
    bench("embedding_drift",
          lambda: run(all_qs["embedding_drift"](spark, sf_dir)))
    bench("rebalance_sample",
          lambda: run(all_qs["rebalance_sample"](spark, sf_dir)))
    bench("channel_stats",
          lambda: run(all_qs["channel_stats"](spark, sf_dir)))
    # round-5 sixth wave: table-maintenance / shuffle-planning ops
    bench("skew_report", lambda: run(all_qs["skew_report"](spark, sf_dir)))
    bench("compaction_plan",
          lambda: run(all_qs["compaction_plan"](spark, sf_dir)))
    # round-5 seventh wave: fused L-lambda regularization path (one
    # stacked GEMM per batch per step — data passes once, not L times)
    bench("regpath_weights",
          lambda: run(all_qs["regpath_weights"](spark, sf_dir)))
    bench("ridge_tstats",
          lambda: run(all_qs["ridge_tstats"](spark, sf_dir)))
    bench("cv_weights",
          lambda: run(all_qs["cv_weights"](spark, sf_dir)))
    bench("kaplan_meier",
          lambda: run(all_qs["kaplan_meier"](spark, sf_dir)))
    bench("mrmr_selection",
          lambda: run(all_qs["mrmr_selection"](spark, sf_dir)))
    # round-5 final wave: split-conformal coverage thresholds (value
    # histogram + distinct-score windows, the exact-order-statistic rule)
    bench("conformal_thresholds",
          lambda: run(all_qs["conformal_thresholds"](spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    # The external driver captures only the LAST ~2000 characters of
    # stdout and json-parses the final line (BENCH_r04.json came back
    # "parsed": null when the line, with 47-entry queries+rows dicts,
    # outgrew that window). So: full per-query detail goes to a jsonl
    # side file, and the LAST stdout line is a compact summary that is
    # guaranteed to fit — scripts/bench_check.py enforces this contract
    # by replaying the driver's tail-parse on the captured stdout.
    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": sf_dir,
        "cpus": int(cpus),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "bench_detail.jsonl"
    )
    try:
        with open(detail_path, "a") as fh:
            fh.write(json.dumps(detail) + "\n")
    except OSError:
        pass  # read-only checkout: stdout detail line below still has it
    # detail first (truncatable), compact summary LAST (must parse)
    print(json.dumps(detail))
    print(build_summary(timings, sf_dir, int(cpus)))
    spark.stop()


# Cross-round comparable set: the queries every round since r1-r3 has
# benched under these names. The summary builder includes these FIRST so
# the driver-recorded BENCH_r{N}.json stays per-query-diffable against
# prior rounds even when the full suite no longer fits the tail window.
_COMPARABLE = [
    "flagship_pipeline", "asof_union", "asof_merge", "window_features",
    "sessionize", "tpch_q1", "class_feature_stats", "f_statistic",
    "dedup_minhash_lsh", "dedup_minhash_groups", "ann_cosine_topk",
    "image_pipeline", "wilcoxon_scores", "embedding_dup_pairs",
    "dedup_simhash", "value_percentiles", "repetition_signals",
    "corpus_chunk_dedup", "span_dup_pairs", "minhash_contamination",
    "span_contamination", "curation_pipeline",
]

_SUMMARY_BUDGET = 1800  # headroom under the driver's ~2000-char tail


def build_summary(timings: dict, sf_dir: str, cpus: int) -> str:
    """One JSON line, guaranteed <= _SUMMARY_BUDGET chars.

    The suite outgrew the driver's tail window at 79 queries (the full
    dict is ~1.9k chars), so the queries dict is filled greedily: the
    cross-round _COMPARABLE set first, then remaining queries by
    descending cost, stopping before the line would exceed the budget.
    Dropped queries remain in the jsonl detail (path recorded in the
    line); `value`/`n_queries` always cover the FULL suite.
    """
    total = round(sum(timings.values()), 3)
    base = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": sf_dir,
        "cpus": cpus,
        "n_queries": len(timings),
        "detail_file": "BENCH/bench_detail.jsonl",
    }
    order = [k for k in _COMPARABLE if k in timings] + [
        k
        for k, _ in sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
        if k not in _COMPARABLE
    ]
    picked: dict[str, float] = {}
    # reserve room for the "queries_in_line" marker added after the fill
    fill_budget = _SUMMARY_BUDGET - len(',"queries_in_line":999')
    for k in order:
        trial = dict(base, queries={**picked, k: round(timings[k], 2)})
        if len(json.dumps(trial, separators=(",", ":"))) > fill_budget:
            break
        picked[k] = round(timings[k], 2)
    base["queries"] = picked
    if len(picked) < len(timings):
        base["queries_in_line"] = len(picked)
    line = json.dumps(base, separators=(",", ":"))
    assert len(line) <= _SUMMARY_BUDGET, len(line)
    return line


def _flagship(spark, sf_dir):
    from modlyn_spark.plans.pipeline import events_feature_pipeline

    return events_feature_pipeline(spark, sf_dir)


def _minhash_groups(spark, sf_dir):
    """r01's dedup workload: star-edge near-dup grouping (same params)."""
    from modlyn_spark.operators.dedup import minhash_dedup_groups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_dedup_groups(docs, "doc_id", "text", k=32, bands=4,
                                threshold=0.9)


if __name__ == "__main__":
    sys.exit(main())
