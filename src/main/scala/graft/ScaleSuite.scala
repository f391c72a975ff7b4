package graft

/** The designated shuffle-heavy scale subset (VERDICT r8 #1): the
  * queries whose 100 TB posture in SCALE.md §2 rests on shuffle-volume
  * arguments, plus two scan/window baselines to normalize for raw I/O
  * growth. `SPARK_GRAFT_SUITE=scale` runs exactly this set (and the
  * DAG lane) so a 10×-data run at sf1 measures the operators whose
  * scaling actually needs evidence, not the 300-query long tail.
  *
  * Stated exemptions (the r9 #8 membership rule): queries whose input
  * is a fixed fixture rather than a corpus-scaled table are exempt —
  * q_jpeg_decode_features (12 synthesized images at any SF; the codec
  * is a narrow per-row pass whose LSH downstream is already covered by
  * q_image_dhash_neardup's band-join gates).
  */
object ScaleSuite {
  /** The 100× (sf10) leg drops the 16-bit fixture SimHash: its
    * 16-bucket bands make candidate volume quadratic in the corpus
    * (measured 5.9× wall over the 10× leg — the documented reason the
    * production path is `q_simhash64_neardup_pairs`, which stays in).
    * Everything else is expected to hold its sub-linear wall growth. */
  def forSuite(name: String): Set[String] = name match {
    case "scale"   => names
    case "scale10" => names - "q_simhash_neardup_pairs"
    case other     => sys.error(s"unknown SPARK_GRAFT_SUITE '$other' (know: scale, scale10)")
  }

  val names: Set[String] = Set(
    // baselines: scan+star-join and keyed-window cost at the new SF
    "q_join_star_region_revenue",
    "q_window_lag_returns",
    // dedup family (gram/band shuffles — the super-linear hazards)
    "q_substring_span_dedup",
    "q_minhash_neardup_pairs",
    "q_neardup_dedup_corpus",
    "q_simhash_neardup_pairs",
    "q_simhash64_neardup_pairs",
    "q_ngram_jaccard_pairs",
    "q_semantic_dedup",
    // fuzzy blocking + iterative closure
    "q_entity_resolution",
    "q_symspell_linkage",
    // graph loops (per-round shuffle pairs)
    "q_pagerank_trade",
    "q_label_propagation_communities",
    "q_bfs_hops_trade",
    "q_triangle_copurchase",
    // text/search + ANN bucket joins
    "q_fts_posting_stats",
    "q_ann_ivf_topk",
    "q_cms_heavy_hitters",
    "q_bpe_merges",
    // market marts: TA/breadth windows + the big fan-ins
    "q_agent_technical_signal_history",
    "q_technical_current_setups",
    "q_market_breadth_signals",
    "q_asset_daily_returns",
    "q_interesting_data_points",
    "q_cross_asset_divergences")
}
