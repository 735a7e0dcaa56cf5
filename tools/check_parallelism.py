"""Parallelism-invariance check (FIXTURES.md §4.4): run representative
queries at two CPU counts in FRESH processes and require byte-identical
results (values, row counts, tile ids). Usage:
    python tools/check_parallelism.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

QUERIES = [
    "zonal_stats_rect",
    "zonal_median_rect",
    "extract_cells_rect",
    "rasterize_rect",
    "resample_sum",
    "pip_join_counts",
    "dedup_exact",
    "sessionize",
    "knn_cosine",
    "minhash_pairs",
    # round-2 operators
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dups",
    "zonal_feature_seq_rect",
    "asof_join_events",
    "interval_join_sessions",
    "sliding_windows",
    "doc_rolling_fingerprint",
    # late round-2 operators
    "doc_chunks",
    "ngram_counts",
    "contamination",
    "seeded_shuffle",
    "zonal_variety_kmv",
    "zonal_quantile_hist",
    # round-3 operators
    "token_pack",
    "repetition_stats",
    "tfidf_topk",
    "domain_stats",
    "dup_clusters",
    "pii_redact",
    "token_rarity",
    "curate_corpus",
    "semdedup",
    "bigram_coherence",
    "url_dedup",
    "pagerank",
    "topk_per_source",
    "cms_heavy_hitters",
    "degree_stats",
    "source_quantiles",
    "crawl_diff",
    # round-3 second wave
    "retention_cohorts",
    "funnel_counts",
    "orders_return_split",
    "bm25_topk",
    "kmeans_clusters",
    "sample_exact_k",
    "quantile_gate",
    "stratified_exact_k",
    "event_gaps",
    "shipping_priority",
    "percent_rank",
    "normalize_text",
    "cooccurrence_pmi",
    "hybrid_search",
    "fuzzy_name_pairs",
    "doc_keywords",
    "pearson_by_flag",
    "mad_outliers",
    "embedding_gram",
    "event_transitions",
    "running_revenue",
    # late round-3 spatial wave
    "hilbert_cells",
    "hex_cells",
    "spatial_knn",
    "spatial_knn_cells",
    "zone_tile_cover",
    "cell_kring",
    "raster_runs",
    "triangle_counts",
    "moving_avg",
    "pip_join_cells",
    "hll_registers",
    # round-3 continuation wave
    "extract_links",
    "link_pagerank",
    "focal_mean",
    "focal_majority",
    "focal_gradient",
    "distance_join",
    "local_supplier_volume",
    "raster_components",
    "zonal_gradient_mean",
    "nearest_zone",
    "zone_link_stats",
    "linreg_fit",
    "label_centroids",
    "zone_top_tokens",
    "focal_mean5",
    "focal_median",
    "crawl_frontier",
    # round-3 third session
    "zonal_gini",
    "resolve_redirects",
    "vectorize_raster",
    "raster_pyramid",
    "mixture_sample",
    "bpe_pair_counts",
    "zonal_centroid",
    "pareto_orders",
    "rollup_counts",
    "component_zonal_mean",
    "upsert_merge",
    "geohash_cells",
    "table_profile",
    "validate_orders",
    "t5_spans",
    "zonal_regression",
    # round 4
    "zonal_wcount_rect",
    # round-4 session 3 (codec/COG wave)
    "zonal_geotiff_stream",
    "zonal_feature_seq_geotiff",
    "png_decode_features",
    "gif_frames_features",
    "warc_media_probe",
    # round-4 session 5
    "mp4_sample_ranges",
    "image_dhash_pairs",
    "audio_fp_pairs",
    "bpe_train_merges",
    "pdf_extract_text",
    "image_dup_clusters",
    "bpe_encode_tokens",
    "warc_pdf_text",
    "fix_mojibake",
    "photo_zone_join",
    # round-4 session 6 (gdaldem / hydrology / interpolation wave)
    "terrain_hillshade",
    "terrain_indices",
    "flow_direction",
    "flow_accumulation",
    "watershed_basins",
    "contour_lines",
    "raster_crosstab",
    "areal_interp",
    "idw_proximity",
    "resample_bilinear",
    "raster_calc",
    "strahler_order",
    "basin_terrain_stats",
    "convex_hulls",
    "hull_stats",
    "simplify_lines",
    "anchor_text_topk",
    "order_priority_semi",
    "raster_equalize",
    "s2_cells",
    "ccnet_buckets",
    "dsir_topk",
    "winnow_fingerprints",
    "substr_dup_spans",
    "zonal_geojson_zones",
    # round-4 session 7 (H.264 / WebM / audio-probe / FLAC wave)
    "h264_frames_features",
    "webm_frame_ranges",
    "media_probe_kinds",
    "flac_decode_sums",
    "customers_without_urgent",
    "cube_order_counts",
    "first_orderkeys_concat",
    "wordpiece_train_merges",
    "wordpiece_encode_tokens",
    "cost_distance",
    "least_cost_path",
    "sieve_raster",
    "fillnodata",
    "focal_morph",
    "archive_documents",
    "convex_overlay",
    "polygon_buffer",
    "segment_join",
    "hull_diameter",
    "mwu_orders",
    "ks_orders",
    "spearman_orders",
    "kendall_orders",
    "benford_orders",
    "psi_orders",
    "morans_i",
    "gearys_c",
    "getis_ord_g",
    "local_morans",
    "join_counts",
    "semivariogram",
    # round-5 operators
    "zonal_geotiff_jpeg",
    "maximal_dup_spans",
    "knn_cosine_pq",
    "webp_lossy_roundtrip",
    "unigram_train_pieces",
    "unigram_encode_tokens",
    "scene_cuts",
    "image_phash_hashes",
    "cost_distance",
]

_CHILD = r"""
import hashlib, json, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False,
         log_to_driver=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e
import pandas as pd
out = {}
qs = e.queries()
for name in json.loads(sys.argv[3]):
    df = qs[name](sys.argv[2])
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)].sort_values(list(sorted(df.columns)))
    h = hashlib.sha256(df.to_csv(index=False, float_format="%.17g").encode()).hexdigest()
    out[name] = {"rows": len(df), "hash": h}
ray.shutdown()
print("RESULT:" + json.dumps(out))
"""


def run_level(cpus: int, sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), sf_dir, json.dumps(QUERIES)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise RuntimeError(f"child at {cpus} cpus failed:\n{proc.stderr[-2000:]}")


def main():
    global QUERIES
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if len(sys.argv) > 2:  # optional subset of query names
        req = set(sys.argv[2:])
        unknown = req - set(QUERIES)
        if unknown:
            # refuse to silently run nothing (an unknown name used to filter
            # the list to [] and print FAILURES: 0)
            print("UNKNOWN QUERIES (register them in QUERIES):",
                  sorted(unknown))
            sys.exit(2)
        QUERIES = [q for q in QUERIES if q in req]
    a = run_level(4, sf_dir)
    b = run_level(16, sf_dir)
    bad = 0
    for name in QUERIES:
        same = a[name] == b[name]
        if not same:
            bad += 1
        print(f"{name:24s} cpus4={a[name]['rows']} cpus16={b[name]['rows']} "
              f"{'IDENTICAL' if same else 'MISMATCH ' + a[name]['hash'][:12] + ' vs ' + b[name]['hash'][:12]}")
    print("FAILURES:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
