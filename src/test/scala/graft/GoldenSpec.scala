package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden row counts for every registered query at sf0.001 — a
  * mutation tripwire between DuckDB-oracle gate runs: any accidental
  * semantic change (lost filter, wrong join type, changed threshold)
  * shifts a count and fails here immediately. Counts were cross-checked
  * against the DuckDB oracle when recorded; update deliberately when a
  * query's semantics change on purpose.
  */
class GoldenSpec extends AnyFunSuite {
  import TestSpark._

  private val golden: Map[String, Long] = Map(
    "q01_pricing_summary" -> 6L,
    "q02_filter_project" -> 173L,
    "q03_topk_revenue" -> 10L,
    "q04_priority_semijoin" -> 5L,
    "q05_nation_revenue" -> 1L,
    "q06_revenue_delta" -> 1L,
    "q07_supplier_part_rank" -> 30L,
    "q08_distinct_counts" -> 3L,
    "q09_rollup" -> 10L,
    "q10_order_histogram" -> 17L,
    "q11_customers_no_orders" -> 1L,
    "q12_set_ops" -> 3L,
    "q13_promo_share" -> 1L,
    "q14_having" -> 10L,
    "q15_top_supplier" -> 1L,
    "q16_grouping_sets" -> 10L,
    "q17_small_qty_revenue" -> 1L,
    "q18_big_orders" -> 100L,
    "q19_disjunctive" -> 1L,
    "q20_string_funcs" -> 6L,
    "q21_monthly_orders" -> 12L,
    "q22_cube" -> 24L,
    "q23_in_subquery" -> 4L,
    "q24_running_window" -> 397L,
    "q25_events_json" -> 50L,
    "q26_embedding_topk" -> 10L,
    "q27_exact_dedup" -> 500L,
    "q28_neardup_pairs" -> 28L,
    "q29_text_stats" -> 5L,
    "q30_catalog_roundtrip" -> 5L,
    "q31_catalog_snapshot_isolation" -> 5L,
    "q32_approx_distinct" -> 3L,
    "q33_simhash_neardup" -> 21L,
    "q34_langid" -> 10L,
    "q35_quality_score" -> 20L,
    "q36_multimodal_features" -> 20L,
    "q37_event_tumbling" -> 868L,
    "q38_ann_lsh" -> 10L,
    "q39_token_counts" -> 5L,
    "q40_embedding_neardup" -> 0L,
    "q41_label_centroids" -> 10L,
    "q42_ngram_freq" -> 25L,
    "q43_event_dedup" -> 1L,
    "q44_event_sessions" -> 636L,
    "q45_winnow_copydetect" -> 28L,
    "q46_asof_join" -> 210L,
    "q47_range_join" -> 201L,
    "q48_outer_setops" -> 16L,
    "q49_window_breadth" -> 500L,
    "q50_frame_sample" -> 20L,
    "q51_ann_ivf" -> 10L,
    "q52_ann_index_probe" -> 10L,
    "q53_ngram_jaccard_join" -> 28L,
    "q54_image_decode" -> 20L,
    "q55_mor_roundtrip" -> 2L,
    "q56_dedup_components" -> 117L,
    "q57_deterministic_sample" -> 5L,
    "q58_tfidf_terms" -> 25L,
    "q59_pipeline_compose" -> 5L,
    "q60_chunk_windows" -> 20L,
    "q61_pii_scrub" -> 20L,
    "q62_corpus_profile" -> 5L,
    "q63_upsert_roundtrip" -> 15L,
    "q64_merge_equality" -> 8L,
    "q65_stats_agg_pushdown" -> 1L,
    "q66_branch_roundtrip" -> 10L,
    "q67_audio_decode" -> 21L,
    "q68_ann_pq" -> 10L,
    "q69_ann_pq_index" -> 10L,
    "q70_resample_ffill" -> 3485L,
    "q71_bpe_tokens" -> 25L,
    "q72_ann_ivfpq" -> 10L,
    "q73_percentiles" -> 3L,
    "q74_correlated_scalar" -> 13L,
    "q75_incremental_mv" -> 3L,
    "q76_decontaminate" -> 9L,
    "q77_repetition" -> 20L,
    "q78_stream_interval_join" -> 13L,
    "q79_span_dedup" -> 500L,
    "q80_pack_sequences" -> 500L,
    "q81_domain_mixture" -> 20L,
    "q82_unigram_nll" -> 25L,
    "q83_add_files" -> 5L,
    "q84_snapshot_clone" -> 14L,
    "q85_rewrite_deletes" -> 15L,
    "q86_semdedup" -> 49L,
    "q87_pivot" -> 3L,
    "q88_unpivot" -> 6L,
    "q89_mv_retraction" -> 6L,
    "q90_table_changes" -> 2L,
    "q91_bloom_decontaminate" -> 102L,
    "q92_image_phash_neardup" -> 7L,
    "q93_table_stats" -> 3L,
    "q94_substring_dedup" -> 500L,
    "q95_heavy_hitters" -> 58L,
    "q96_source_overlap" -> 190L,
    "q97_sorted_spj_join" -> 5L,
    "q98_dynamic_overwrite" -> 5L,
    "q99_incremental_neardup" -> 14L,
    "q100_curation_pipeline" -> 7L,
    "q101_schema_evolution" -> 5L,
    "q102_rewrite_pos_deletes" -> 5L,
    "q103_bloom_point_lookup" -> 4L,
    "q104_substring_index" -> 8L,
    "q105_time_partitions" -> 15L,
    "q106_truncate_partitions" -> 5L,
    "q107_bpe_encode" -> 32L,
    "q108_mor_split_scan" -> 10L,
    "q109_dv_roundtrip" -> 2L,
    "q110_column_defaults" -> 7L,
    "q111_row_lineage" -> 2L,
    "q112_variant_shred" -> 5L,
    "q113_merge_full" -> 9L,
    "q114_recursive_cte" -> 59L,
    "q115_higher_order_arrays" -> 7L)

  test("every registered query has a golden count (add one when adding a query)") {
    assert(SparkEntry.queries.keySet == golden.keySet,
      s"missing goldens: ${SparkEntry.queries.keySet -- golden.keySet}; " +
        s"stale goldens: ${golden.keySet -- SparkEntry.queries.keySet}")
  }

  for ((name, expected) <- golden.toSeq.sortBy(_._1)) {
    test(s"$name returns exactly $expected rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, sf).count() == expected)
    }
  }
}
