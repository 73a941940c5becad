package graft

/** Dev-only: dump formatted physical plans of representative queries
  * for plan review (pushdown / pruning / broadcast / codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "e3_cross_expand", "m9_missing_cases",
        "m1_merge_outer", "n1_knn_cosine", "ev2_sessionization",
        "a1_median_agg", "a8_topk_per_group", "ev4_asof_join",
        "rj1_range_join",
        // round 11: production SemDeDup, incremental index, paragraph
        // dedup, distributed CC, full corpus build
        "sd2_semantic_dedup_capped", "n9_incremental_index",
        "t19_paragraph_dedup", "d5b_dup_clusters_dist", "p2_corpus_build",
        // round 12: incremental cross-snapshot dedup, perceptual image
        // dedup, trained classifier (+ gate composition), BPE counts,
        // tombstoned index, leakage-safe split, hard negatives
        "d11_incremental_dedup", "d12_containment_pairs", "mm5_perceptual_dedup", "mm6_audio_dedup",
        "t20_quality_classifier", "p3_classifier_gate", "t21_bpe_tokens",
        "n10_tombstone_delete", "sp1_leakage_safe_split", "sp2_temporal_split",
        "n11_hard_negatives", "n12_ann_recall", "cp5_datasheet",
        "t22_classifier_eval", "t23_classifier_auc",
        // round 13: learned BPE, containment sketches, KN bigram LM,
        // video dedup, boilerplate, per-language classifiers,
        // production-cap LSH gate
        "t24_bpe_train", "d13_containment_sketch", "t25_kn_bigram_lm",
        "mm7_video_dedup", "t26_boilerplate", "t20b_perlang_classifier",
        "d3b_minhash_capped", "t27_c4_rules", "t28_stupid_backoff",
        "cp6_perplexity_buckets", "cp7_bucket_mixture", "t29_epoch_shuffle",
        "d14_incremental_containment", "t21c_bpe_encode",
        // round 13 additions the advisor flagged as missing (t24b is
        // t24+t21 composition, sp3/cp8 are one-scan aggs, but their
        // plans should still be dumpable by default; d15 mutates a
        // store under a lease — run it explicitly, not in the default
        // sweep, so a plan dump never moves tombstone state)
        "t24b_bpe_learned_tokens", "sp3_group_kfold", "cp8_pii_audit",
        "mm8_shared_clips",
        // round 14: ENGAGED-cap containment sketch gates, checkpointed
        // BPE, 5-gram LM, audio shared clips, eval contamination,
        // walk-forward CV (cp9 — like d15 — mutates a store under a
        // lease: run it explicitly, never in the default sweep)
        "d13b_containment_capped", "d14b_incremental_capped",
        "t24c_bpe_ckpt_train", "t28b_stupid_backoff5",
        "mm9_shared_jingles", "t30_eval_contamination",
        "sp4_walk_forward",
        // round 15: KN 5-gram LM (+ 5-gram buckets), overlapping-hop
        // audio gate, engaged-cap SimHash gate, calibration curve,
        // batched BPE training (p4 — like cp9/d15 — builds and mutates
        // stores under leases: run it explicitly, never in the default
        // sweep)
        "t25b_kn5_lm", "cp6b_perplexity_buckets5",
        "mm9b_shared_jingles_hop", "d4b_simhash_capped",
        "t22b_calibration", "t24d_bpe_batched_train",
        // round 16: WET record parse + raw-WET rule clean (both write
        // to a fresh scratch dir, safe in the default sweep),
        // byte-level BPE encoding
        "wet1_warc_records", "wet2_wet_rule_clean",
        "t21d_byte_bpe_encode", "t24e_byte_bpe_train",
        "t24f_byte_learned_tokens",
        // round 16 (cont.): URL canonicalization family, mergeable
        // bottom-k quantile sketch
        "wet3_url_normalize", "wet4_url_dedup", "wet5_host_profile",
        "wet6_host_gate", "a2b_quantile_sketch")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
