"""Benchmark harness.

Normal mode: runs the headline KG pipeline (synthetic pages →
extract → link → canonicalize → materialize) plus a battery of operator
queries over $GRAFT_SF_DIR, then prints ONE JSON line.

--scaling: runs the headline pipeline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on identical input and reports both
throughputs plus scaling efficiency (evidence for the N→4N criterion;
no multi-node cluster exists in this sandbox).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time


def ensure_corpus(num_pages: int) -> str:
    """Generate the deterministic pages corpus to parquet ONCE; the
    measured pipeline then reads it like production reads Common Crawl."""
    from kgx.pages import synthetic_pages

    path = "/tmp/kgx_corpus_v3_%d" % num_pages
    marker = os.path.join(path, "_DONE")
    if not os.path.isfile(marker):
        shutil.rmtree(path, ignore_errors=True)
        # ~2500 pages per file so the read stage yields enough blocks to
        # keep every core busy at any cluster size
        blocks = max(64, num_pages // 2500)
        synthetic_pages(num_pages, override_num_blocks=blocks).write_parquet(path)
        with open(marker, "w") as fp:
            fp.write("ok")
    return path


def run_headline(num_pages: int, out_dir: str, warmup: bool = True,
                 engine: str = "exchange") -> dict:
    """Headline: triples/sec end-to-end (read → extract → link →
    canonicalize → materialize) over the pre-generated pages corpus.

    ``engine`` — "exchange" (raw-task two-pass sort with write-in-reduce,
    kgx/exchange.py: the triple stream crosses plasma once) or "dataset"
    (the Dataset-API path, pipeline.build_graph → materialize). Both
    produce the identical canonical graph (tests/test_exchange.py).
    """
    import ray.data

    from kgx.config import PipelineConfig
    from kgx.exchange import write_canonical_graph
    from kgx.materialize import materialize
    from kgx.pipeline import build_graph

    corpus = ensure_corpus(num_pages)
    cfg = PipelineConfig(include_altlabels=True, include_components=True,
                         include_webdewey=True)

    def once(tag: str) -> dict:
        shutil.rmtree(out_dir, ignore_errors=True)
        # flush the previous run's dirty pages so writeback debt does not
        # throttle this measurement
        subprocess.run(["sync"], capture_output=True)
        try:
            with open("/proc/sys/vm/drop_caches", "w") as fp:
                fp.write("1")
        except OSError:
            pass
        t0 = time.time()
        import ray

        if engine == "exchange":
            manifest = write_canonical_graph(
                corpus, out_dir, cfg,
                fingerprint="bench-%s-%d" % (tag, num_pages))
        else:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            # ~2 blocks per CPU: hundreds of small blocks put the
            # driver-side streaming executor on the critical path
            # (93s → 25s at 32 CPUs)
            pages = ray.data.read_parquet(corpus, columns=["url", "html"],
                                          override_num_blocks=2 * ncpu)
            graph = build_graph(pages, cfg)
            manifest = materialize(graph, out_dir,
                                   fingerprint="bench-%s-%d" % (tag, num_pages))
        wall = time.time() - t0
        return {"triples": manifest["rows"], "wall_sec": wall}

    if warmup:
        once("warmup")  # spawn worker processes / warm code paths
    runs = [once("measured-1"), once("measured-2")]
    r = min(runs, key=lambda x: x["wall_sec"])
    return {
        "pages": num_pages,
        "triples": r["triples"],
        "wall_sec": r["wall_sec"],
        "triples_per_sec": r["triples"] / r["wall_sec"],
    }


def run_queries(sf_dir: str) -> dict:
    from kgx import (dedup, events, multimodal, relational, simsearch,
                     sources, textops, traindata)
    from kgx import queries as q
    from kgx.components import clustering_coeff as _clustering_coeff
    from kgx.components import adamic_adar as _adamic_adar
    from kgx.components import kg_cycle_nodes as _kg_cycles
    from kgx.components import graph_random_walks as _walks
    from kgx.components import hits_scores as _hits_scores
    from kgx.components import msf_boruvka as _msf_boruvka
    from kgx.components import kcore as _kcore
    from kgx.components import label_propagation as _label_propagation
    from kgx.components import pagerank as _pagerank
    from kgx.components import personalized_pagerank as _ppr
    from kgx.components import harmonic_centrality as _harmonic
    from kgx.components import bfs_distances as _bfs_distances
    from kgx.components import bipartite_conflicts as _bipartite
    from kgx.components import scc as _scc
    from kgx.components import kg_subtree_sizes as _subtree
    from kgx.components import sssp_weighted as _sssp_weighted
    from kgx.components import luby_mis as _luby_mis
    from kgx.components import powerlaw_alpha as _powerlaw_alpha
    from kgx.components import diameter_estimate as _diameter_estimate
    from kgx.components import modularity_score as _modularity_score
    from kgx.components import ktruss as _ktruss
    from kgx.components import rich_club as _rich_club

    def consume(ds):
        # stream-consume without driver materialization; gated ops may
        # return pandas (DataFrame.count() is per-column — use len)
        import pandas as _pd

        if isinstance(ds, _pd.DataFrame) or not hasattr(ds, "count"):
            return len(ds)
        return ds.count()

    battery = {
        "kg_triples": lambda: q.kg_triples(sf_dir),
        "kg_skosify_exchange": lambda: q.kg_skosify_exchange(sf_dir),
        "kg_skosify_repair": lambda: q.kg_skosify_repair(sf_dir),
        "kg_ingest_batched": lambda: q.kg_ingest_batched(sf_dir),
        "kg_nt_roundtrip": lambda: q.kg_nt_roundtrip(sf_dir),
        "kg_ttl_roundtrip": lambda: q.kg_ttl_roundtrip(sf_dir),
        "kg_label_conflicts": lambda: q.kg_label_conflicts(sf_dir),
        "kg_expand": lambda: q.kg_expand(sf_dir),
        "kg_incremental": lambda: q.kg_incremental(sf_dir),
        "dedup_exact": lambda: dedup.dedup_exact(sf_dir),
        "dedup_normalized": lambda: dedup.dedup_normalized(sf_dir),
        "minhash_lsh": lambda: dedup.minhash_lsh_pairs(sf_dir),
        "jaccard_pairs": lambda: dedup.jaccard_pairs(sf_dir),
        "jaccard_pairs_sim": lambda: dedup.jaccard_pairs_sim(sf_dir),
        "embedding_near_dup_lsh": lambda: dedup.embedding_near_dup_lsh(sf_dir),
        "knn_bruteforce": lambda: simsearch.knn_bruteforce(sf_dir),
        "knn_graph": lambda: simsearch.knn_graph(sf_dir),
        "token_counts": lambda: textops.token_counts(sf_dir),
        "entity_mentions": lambda: textops.entity_mentions(sf_dir),
        "entity_link": lambda: textops.entity_link(sf_dir),
        "mention_cooccurrence": lambda: textops.mention_cooccurrence(sf_dir),
        "compression_ratio": lambda: textops.compression_ratio(sf_dir),
        "top_terms": lambda: textops.top_terms(sf_dir),
        "top_terms_by_lang": lambda: textops.top_terms_by_lang(sf_dir),
        "langid_confusion": lambda: textops.langid_confusion(sf_dir),
        "mutual_information": lambda: textops.mutual_information(sf_dir),
        "chi2_terms": lambda: textops.chi2_terms(sf_dir),
        "repetition_stats": lambda: textops.repetition_stats(sf_dir),
        "dup_ngram_stats": lambda: textops.dup_ngram_stats(sf_dir),
        "unigram_lm_score": lambda: textops.unigram_lm_score(sf_dir),
        "continuation_counts": lambda: textops.continuation_counts(sf_dir),
        "token_burstiness": lambda: textops.token_burstiness(sf_dir),
        "tail_index_hill": lambda: textops.tail_index_hill(sf_dir),
        "bigram_lm_score": lambda: textops.bigram_lm_score(sf_dir),
        "kn_bigram_score": lambda: textops.kn_bigram_score(sf_dir),
        "tfidf_keywords": lambda: textops.tfidf_keywords(sf_dir),
        "pmi_bigrams": lambda: textops.pmi_bigrams(sf_dir),
        "segment_dedup": lambda: traindata.segment_dedup(sf_dir),
        "bm25_search": lambda: traindata.bm25_search(sf_dir),
        "ccnet_buckets": lambda: traindata.ccnet_buckets(sf_dir),
        "winnow_fingerprints": lambda: dedup.winnow_fingerprints(sf_dir),
        "fingerprint_overlap_pairs":
            lambda: dedup.fingerprint_overlap_pairs(sf_dir),
        "pq_codes": lambda: simsearch.pq_codes(sf_dir),
        "cohort_retention": lambda: events.cohort_retention(sf_dir),
        "dense_daily_counts": lambda: events.dense_daily_counts(sf_dir),
        "w1_drift": lambda: events.w1_drift(sf_dir),
        "scd2_intervals": lambda: events.scd2_intervals(sf_dir),
        "autocorr_daily": lambda: events.autocorr_daily(sf_dir),
        "interval_coverage":
            lambda: events.interval_coverage(sf_dir),
        "value_percentiles_cont":
            lambda: events.value_percentiles_cont(sf_dir),
        "daily_anomalies": lambda: events.daily_anomalies(sf_dir),
        "rate_limit_replay":
            lambda: events.rate_limit_replay(sf_dir),
        "psi_drift": lambda: textops.psi_drift(sf_dir),
        "auc_eval": lambda: textops.auc_eval(sf_dir),
        "pr_curve": lambda: textops.pr_curve(sf_dir),
        "stump_split": lambda: textops.stump_split(sf_dir),
        "skipgram_pairs": lambda: textops.skipgram_pairs(sf_dir),
        "spatial_neighbor_pairs":
            lambda: dedup.spatial_neighbor_pairs(sf_dir),
        "pca_power": lambda: simsearch.pca_power(sf_dir),
        "kcenter_coreset": lambda: simsearch.kcenter_coreset(sf_dir),
        "mutual_knn": lambda: simsearch.mutual_knn(sf_dir),
        "knn_greedy_search": lambda: simsearch.knn_greedy_search(sf_dir),
        "hnsw_search": lambda: simsearch.hnsw_search(sf_dir),
        "ann_recall": lambda: simsearch.ann_recall(sf_dir),
        "sssp_weighted": lambda: _sssp_weighted(sf_dir),
        "session_overlap_pairs":
            lambda: events.session_overlap_pairs(sf_dir),
        "gzip_ndjson_roundtrip":
            lambda: sources.gzip_ndjson_roundtrip(sf_dir),
        "bootstrap_means": lambda: traindata.bootstrap_means(sf_dir),
        "linkage_scores": lambda: dedup.linkage_scores(sf_dir),
        "kmv_join_overlap": lambda: traindata.kmv_join_overlap(sf_dir),
        "benford_digits": lambda: relational.benford_digits(sf_dir),
        "simhash_pairs": lambda: dedup.simhash_pairs(sf_dir),
        "ssjoin_prefix": lambda: dedup.ssjoin_prefix(sf_dir),
        "cdc_chunks": lambda: dedup.cdc_chunks(sf_dir),
        "greedy_set_cover": lambda: traindata.greedy_set_cover(sf_dir),
        "debounce_events": lambda: events.debounce_events(sf_dir),
        "ntile_buckets": lambda: textops.ntile_buckets(sf_dir),
        "luby_mis": lambda: _luby_mis(sf_dir),
        "xcorr_daily": lambda: events.xcorr_daily(sf_dir),
        "snm_pairs": lambda: dedup.snm_pairs(sf_dir),
        "cusum_changepoint": lambda: events.cusum_changepoint(sf_dir),
        "bucketed_join": lambda: sources.bucketed_join(sf_dir),
        "wordpiece_encode": lambda: traindata.wordpiece_encode(sf_dir),
        "zonemap_pruned_read": lambda: sources.zonemap_pruned_read(sf_dir),
        "theil_sen_daily": lambda: events.theil_sen_daily(sf_dir),
        "pit_join": lambda: events.pit_join(sf_dir),
        "ks_drift": lambda: textops.ks_drift(sf_dir),
        "powerlaw_alpha": lambda: _powerlaw_alpha(sf_dir),
        "silhouette_eval": lambda: simsearch.silhouette_eval(sf_dir),
        "hrw_assign": lambda: traindata.hrw_assign(sf_dir),
        "group_kfold": lambda: traindata.group_kfold(sf_dir),
        "scene_cuts": lambda: multimodal.scene_cuts(sf_dir),
        "ams_f2": lambda: traindata.ams_f2(sf_dir),
        "classifier_agreement": lambda: textops.classifier_agreement(sf_dir),
        "rank_stability": lambda: textops.rank_stability(sf_dir),
        "delta_dedup": lambda: sources.delta_dedup(sf_dir),
        "bloom_semijoin": lambda: relational.bloom_semijoin(sf_dir),
        "merkle_ranges": lambda: sources.merkle_ranges(sf_dir),
        "mann_kendall": lambda: events.mann_kendall(sf_dir),
        "diameter_estimate": lambda: _diameter_estimate(sf_dir),
        "dbscan_clusters": lambda: dedup.dbscan_clusters(sf_dir),
        "pseudonymize": lambda: textops.pseudonymize(sf_dir),
        "max_streak": lambda: events.max_streak(sf_dir),
        "hll_sliding_users": lambda: traindata.hll_sliding_users(sf_dir),
        "modularity_score": lambda: _modularity_score(sf_dir),
        "percolation_curve": lambda: dedup.percolation_curve(sf_dir),
        "burst_intervals": lambda: events.burst_intervals(sf_dir),
        "coordinated_sample": lambda: relational.coordinated_sample(sf_dir),
        "learned_index_audit": lambda: textops.learned_index_audit(sf_dir),
        "zorder_values": lambda: sources.zorder_values(sf_dir),
        "anova_f": lambda: textops.anova_f(sf_dir),
        "ktruss": lambda: _ktruss(sf_dir),
        "wav_frame_features": lambda: multimodal.wav_frame_features(sf_dir),
        "bmp_dhash": lambda: multimodal.bmp_dhash(sf_dir),
        "keyframes": lambda: multimodal.keyframes(sf_dir),
        "rich_club": lambda: _rich_club(sf_dir),
        "pair_edit_stats": lambda: dedup.pair_edit_stats(sf_dir),
        "wilson_bounds": lambda: events.wilson_bounds(sf_dir),
        "hist_overlap": lambda: textops.hist_overlap(sf_dir),
        "item_similarity": lambda: relational.item_similarity(sf_dir),
        "partition_pruned_read":
            lambda: sources.partition_pruned_read(sf_dir),
        "table_cdc_diff": lambda: sources.table_cdc_diff(sf_dir),
        "near_dup_dedup": lambda: dedup.near_dup_dedup(sf_dir),
        "near_dup_dedup_lsh": lambda: dedup.near_dup_dedup(sf_dir,
                                                           use_lsh=True),
        "knn_ivf": lambda: simsearch.knn_ivf(sf_dir),
        "knn_ivfpq": lambda: simsearch.knn_ivfpq(sf_dir),
        "kmeans_clusters": lambda: simsearch.kmeans_clusters(sf_dir),
        "kmeans_lloyd": lambda: simsearch.kmeans_lloyd(sf_dir),
        "semantic_dedup": lambda: dedup.semantic_dedup(sf_dir),
        "decontaminate": lambda: traindata.decontaminate(sf_dir),
        "decontaminate_bloom": lambda: traindata.decontaminate_bloom(sf_dir),
        "pack_sequences": lambda: traindata.pack_sequences(sf_dir),
        "curate_corpus": lambda: traindata.curate_corpus(sf_dir),
        "perceptron_langid":
            lambda: traindata.perceptron_langid(sf_dir),
        "quantile_sketch_values":
            lambda: traindata.quantile_sketch_values(sf_dir),
        "dp_noisy_counts":
            lambda: traindata.dp_noisy_counts(sf_dir),
        "negative_samples":
            lambda: traindata.negative_samples(sf_dir),
        "stratified_split":
            lambda: traindata.stratified_split(sf_dir),
        "weighted_reservoir_sample":
            lambda: traindata.weighted_reservoir_sample(sf_dir),
        "pagerank": lambda: _pagerank(sf_dir),
        "personalized_pagerank": lambda: _ppr(sf_dir),
        "harmonic_centrality": lambda: _harmonic(sf_dir),
        "kcore": lambda: _kcore(sf_dir),
        "clustering_coeff": lambda: _clustering_coeff(sf_dir),
        "adamic_adar": lambda: _adamic_adar(sf_dir),
        "kg_cycle_nodes": lambda: _kg_cycles(sf_dir),
        "graph_random_walks": lambda: _walks(sf_dir),
        "hits_scores": lambda: _hits_scores(sf_dir),
        "msf_boruvka": lambda: _msf_boruvka(sf_dir),
        "label_propagation": lambda: _label_propagation(sf_dir),
        "temperature_mix": lambda: traindata.temperature_mix(sf_dir),
        "subsample_tokens": lambda: traindata.subsample_tokens(sf_dir),
        "rrf_fusion": lambda: traindata.rrf_fusion(sf_dir),
        "gopher_filter": lambda: textops.gopher_filter(sf_dir),
        "heavy_hitters": lambda: traindata.heavy_hitters(sf_dir),
        "hll_distinct": lambda: traindata.hll_distinct(sf_dir),
        "hll_user_counts": lambda: traindata.hll_user_counts(sf_dir),
        "shard_corpus": lambda: traindata.shard_corpus(sf_dir),
        "bpe_train": lambda: traindata.bpe_train(sf_dir),
        "bpe_encode": lambda: traindata.bpe_encode(sf_dir),
        "running_totals": lambda: events.running_totals(sf_dir),
        "ewma_user_value": lambda: events.ewma_user_value(sf_dir),
        "value_percentiles": lambda: events.value_percentiles(sf_dir),
        "hourly_active_users":
            lambda: events.hourly_active_users(sf_dir),
        "moving_sum_3": lambda: events.moving_sum_3(sf_dir),
        "latest_event_per_user":
            lambda: events.latest_event_per_user(sf_dir),
        "range_join_counts": lambda: events.range_join_counts(sf_dir),
        "rollup_stats": lambda: textops.rollup_stats(sf_dir),
        "pivot_counts": lambda: textops.pivot_counts(sf_dir),
        "normalize_text": lambda: textops.normalize_text(sf_dir),
        "y4m_frame_stats": lambda: multimodal.y4m_frame_stats(sf_dir),
        "freq_spectrum": lambda: textops.freq_spectrum(sf_dir),
        "vocab_growth": lambda: textops.vocab_growth(sf_dir),
        "zscore_quality": lambda: textops.zscore_quality(sf_dir),
        "token_entropy": lambda: textops.token_entropy(sf_dir),
        "dedup_substrings": lambda: textops.dedup_substrings(sf_dir),
        "sessionize": lambda: events.sessionize(sf_dir),
        "session_table": lambda: events.session_table(sf_dir),
        "max_concurrent_sessions":
            lambda: events.max_concurrent_sessions(sf_dir),
        "events_asof": lambda: events.events_asof(sf_dir),
        "lineitem_summary": lambda: relational.lineitem_summary(sf_dir),
        "shipping_priority": lambda: relational.shipping_priority(sf_dir),
        "local_supplier_volume": lambda: relational.local_supplier_volume(sf_dir),
        "big_orders": lambda: relational.big_orders(sf_dir),
        "hash_embed_retrieval":
            lambda: traindata.hash_embed_retrieval(sf_dir),
        "customer_order_counts":
            lambda: relational.customer_order_counts(sf_dir),
        "markov_transitions": lambda: events.markov_transitions(sf_dir),
        "user_paths": lambda: events.user_paths(sf_dir),
        "cooccurrence_pairs":
            lambda: relational.cooccurrence_pairs(sf_dir),
        "late_orders_by_priority":
            lambda: relational.late_orders_by_priority(sf_dir),
        "no_orders_customers":
            lambda: relational.no_orders_customers(sf_dir),
        "top_supplier": lambda: relational.top_supplier(sf_dir),
        "top_supplier_per_part":
            lambda: relational.top_supplier_per_part(sf_dir),
        "promo_revenue": lambda: relational.promo_revenue(sf_dir),
        "parts_supplier_counts":
            lambda: relational.parts_supplier_counts(sf_dir),
        "skyline_parts": lambda: relational.skyline_parts(sf_dir),
        "profile_columns": lambda: relational.profile_columns(sf_dir),
        "linreg_tokens": lambda: textops.linreg_tokens(sf_dir),
        "oov_rate": lambda: textops.oov_rate(sf_dir),
        "doc_rank_by_length":
            lambda: textops.doc_rank_by_length(sf_dir),
        "naive_bayes_langid":
            lambda: traindata.naive_bayes_langid(sf_dir),
        "bfs_distances": lambda: _bfs_distances(sf_dir),
        "label_centroids": lambda: simsearch.label_centroids(sf_dir),
        "bipartite_conflicts": lambda: _bipartite(sf_dir),
        "scc": lambda: _scc(sf_dir),
        "ab_test_zstat": lambda: events.ab_test_zstat(sf_dir),
        "late_events": lambda: events.late_events(sf_dir),
        "division_tokens": lambda: textops.division_tokens(sf_dir),
        "cube_stats": lambda: textops.cube_stats(sf_dir),
        "wait_chain_suppliers":
            lambda: relational.wait_chain_suppliers(sf_dir),
        "daily_type_delta": lambda: events.daily_type_delta(sf_dir),
        "kg_subtree_sizes": lambda: _subtree(sf_dir),
        "unpivot_quality": lambda: textops.unpivot_quality(sf_dir),
        "typo_pairs": lambda: dedup.typo_pairs(sf_dir),
        "typo_pairs_dl": lambda: dedup.typo_pairs_dl(sf_dir),
        "mad_chars": lambda: textops.mad_chars(sf_dir),
        "dedup_keep_best": lambda: dedup.dedup_keep_best(sf_dir),
        "dup_group_spectrum": lambda: dedup.dup_group_spectrum(sf_dir),
        "containment_pairs": lambda: dedup.containment_pairs(sf_dir),
        "arrow_ipc_roundtrip":
            lambda: sources.arrow_ipc_roundtrip(sf_dir),
        "winsorize_values": lambda: events.winsorize_values(sf_dir),
        "gini_values": lambda: events.gini_values(sf_dir),
        "interarrival_percentiles":
            lambda: events.interarrival_percentiles(sf_dir),
        "nation_revenue_share":
            lambda: relational.nation_revenue_share(sf_dir),
        "above_avg_orders": lambda: relational.above_avg_orders(sf_dir),
        "forecast_revenue": lambda: relational.forecast_revenue(sf_dir),
        "small_qty_revenue":
            lambda: relational.small_qty_revenue(sf_dir),
        "order_count_distribution":
            lambda: relational.order_count_distribution(sf_dir),
        "important_parts": lambda: relational.important_parts(sf_dir),
        "ship_delay_priority":
            lambda: relational.ship_delay_priority(sf_dir),
        "returned_top_customers":
            lambda: relational.returned_top_customers(sf_dir),
        "volume_shipping": lambda: relational.volume_shipping(sf_dir),
        "promo_part_suppliers":
            lambda: relational.promo_part_suppliers(sf_dir),
        "market_share": lambda: relational.market_share(sf_dir),
        "product_profit": lambda: relational.product_profit(sf_dir),
        "brand_qty_revenue":
            lambda: relational.brand_qty_revenue(sf_dir),
        "integrity_audit": lambda: relational.integrity_audit(sf_dir),
        "cumulative_users_by_day":
            lambda: events.cumulative_users_by_day(sf_dir),
        "table_checksums": lambda: relational.table_checksums(sf_dir),
    }
    # the exchange headline never spins up Ray Data's streaming executor,
    # so without this the FIRST battery query would be charged the whole
    # framework warmup (worker imports across every core — measured 20+ s
    # on kg_triples)
    import ray.data

    ray.data.range(10000, override_num_blocks=64).map_batches(
        lambda df: df, batch_format="pandas").count()

    out = {}
    for name, make in battery.items():
        t0 = time.time()
        consume(make())
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--pages", type=int, default=int(os.environ.get(
        "GRAFT_BENCH_PAGES", "400000")))
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--scaling-cpus", default="8,32",
                        help="N,4N CPU pair for the scaling runs")
    parser.add_argument("--scaling-reps", type=int, default=2,
                        help="interleaved repetitions per CPU level; best "
                             "throughput per level is reported (this host's "
                             "wall clock drifts ~2x within a session — "
                             "alternating the levels exposes both to the "
                             "same drift)")
    parser.add_argument("--headline-only", action="store_true")
    parser.add_argument("--skip-queries", action="store_true")
    parser.add_argument("--engine", default="exchange",
                        choices=["exchange", "dataset"],
                        help="headline execution path (both produce the "
                             "identical graph; tests/test_exchange.py)")
    args = parser.parse_args()

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.scaling:
        if args.pages == 400000 and "GRAFT_BENCH_PAGES" not in os.environ:
            # scaling needs a compute-bound run; the BASELINE.md numbers
            # use the 1.2M-page corpus
            args.pages = 1200000
        lo, hi = (int(x) for x in args.scaling_cpus.split(","))
        best = {lo: 0.0, hi: 0.0}
        for rep in range(max(1, args.scaling_reps)):
            for cpus in (lo, hi):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
                proc = subprocess.run(
                    [sys.executable, __file__, "--headline-only",
                     "--engine", args.engine, "--pages", str(args.pages)],
                    env=env, capture_output=True, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                line = proc.stdout.strip().splitlines()[-1]
                val = json.loads(line)["value"]
                best[cpus] = max(best[cpus], val)
                print(json.dumps({"rep": rep, "cpus": cpus,
                                  "triples_per_sec": round(val, 1)}),
                      file=sys.stderr)
                # let the previous Ray session's raylet/object store fully
                # release, and flush dirty pages: writeback from the
                # previous run's parquet output otherwise throttles the
                # next run ~2x
                subprocess.run(["ray", "stop", "--force"], capture_output=True)
                subprocess.run(["sync"], capture_output=True)
                try:
                    with open("/proc/sys/vm/drop_caches", "w") as fp:
                        fp.write("3")
                except OSError:
                    pass
                time.sleep(5)
        r_lo = best[lo]
        r_hi = best[hi]
        efficiency = (r_hi / r_lo) / (hi / lo)
        print(json.dumps({
            "metric": "scaling_efficiency_%d_to_%d_cpus" % (lo, hi),
            "value": round(efficiency, 4),
            "unit": "fraction",
            "throughput_%dcpu_triples_per_sec" % lo: round(r_lo, 1),
            "throughput_%dcpu_triples_per_sec" % hi: round(r_hi, 1),
            "pages": args.pages,
            "engine": args.engine,
        }))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    # per-operator CPU reservation halves effective parallelism for this
    # short pipeline chain; the streaming executor still backpressures on
    # object-store budget
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    headline = run_headline(args.pages, "/tmp/kgx_bench/graph",
                            engine=args.engine)
    queries = {} if (args.headline_only or args.skip_queries) else run_queries(
        args.sf_dir)

    print(json.dumps({
        "metric": "triples_per_sec_end_to_end",
        "value": round(headline["triples_per_sec"], 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "engine": args.engine,
        "headline": {k: (round(v, 2) if isinstance(v, float) else v)
                     for k, v in headline.items()},
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
