package graft.queries

/** Stored-golden oracles for the three deterministic-but-not-SQL-
  * expressible ML queries (VERDICT r6 #6; IVF promoted in r7): seeded
  * KMeans clusters, NMF topic assignments, and the IVF/multi-probe
  * ANN top-k. Each oracle is a literal VALUES table dumped from the
  * deterministic run at sf0.01 — the driver's DuckDB compare then
  * checks rows/schema/hash exactly like any other oracle.
  *
  * Regenerate (only needed if the corpus or the pipeline changes):
  *   SPARK_GRAFT_ONLY=q_doc_clusters,q_doc_topics,q_ann_ivf_topk \
  *     sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/golden"
  *   python3 tools/golden_values.py /tmp/golden > src/main/scala/graft/queries/TextMlGoldenData.scala
  *
  * Stability argument: the documents/embeddings corpora are
  * driver-generated with a fixed seed (TESTDATA.md); at sf0.01 each
  * scan is a single partition (file ≪ openCostInBytes), so a seeded
  * KMeans fit sees identical data in identical order regardless of
  * SPARK_GRAFT_CPUS, and the NMF is deterministic by construction
  * (NMF.scala:24-29). Cluster labels are additionally canonicalized by
  * representative doc_id, so the clusters golden is invariant even
  * under a label permutation; the IVF golden's cosines are r4-rounded
  * fixed-order dot products, independently cross-checked by
  * tools/check_numeric.py's numpy mirror.
  */
object TextMlGolden {
  def docClusters: Option[String]   = TextMlGoldenData.docClusters
  def docTopics: Option[String]     = TextMlGoldenData.docTopics
  def annIvfTopk: Option[String]    = TextMlGoldenData.annIvfTopk
  def annPqTopk: Option[String]     = TextMlGoldenData.annPqTopk
  def bpeMerges: Option[String]     = TextMlGoldenData.bpeMerges
  def bpeTokenStats: Option[String] = TextMlGoldenData.bpeTokenStats
  def bpePackedSequences: Option[String] = TextMlGoldenData.bpePackedSequences
  def domainClassifierEval: Option[String]    = TextMlGoldenData.domainClassifierEval
  def domainClassifierWeights: Option[String] = TextMlGoldenData.domainClassifierWeights
  // r8 promotions: the three linear-algebra signals (Mahalanobis
  // turbulence, eigen absorption, MST metrics) — deterministic
  // (exact-decimal return panels, Breeze linalg, fixed windows, r4
  // snap), independently recomputed by tools/check_numeric.py.
  def turbulenceIndex: Option[String]   = TextMlGoldenData.turbulenceIndex
  def absorptionRatio: Option[String]   = TextMlGoldenData.absorptionRatio
  def mstNetworkMetrics: Option[String] = TextMlGoldenData.mstNetworkMetrics
}
