package graft.queries

/** Stored-golden oracles for the two deterministic-but-not-SQL-
  * expressible ML queries (VERDICT r6 #6): seeded KMeans clusters and
  * NMF topic assignments. Each oracle is a literal VALUES table dumped
  * from the deterministic run at sf0.01 — the driver's DuckDB compare
  * then checks rows/schema/hash exactly like any other oracle.
  *
  * Regenerate (only needed if the corpus or the pipeline changes):
  *   SPARK_GRAFT_ONLY=q_doc_clusters,q_doc_topics \
  *     sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/golden"
  *   python3 tools/golden_values.py /tmp/golden > src/main/scala/graft/queries/TextMlGoldenData.scala
  *
  * Stability argument: the documents corpus is driver-generated with a
  * fixed seed (TESTDATA.md); at sf0.01 the scan is a single partition
  * (file ≪ openCostInBytes), so the seeded KMeans fit sees identical
  * data in identical order regardless of SPARK_GRAFT_CPUS, and the NMF
  * is deterministic by construction (NMF.scala:24-29). Cluster labels
  * are additionally canonicalized by representative doc_id, so the
  * golden is invariant even under a label permutation.
  */
object TextMlGolden {
  def docClusters: Option[String] = TextMlGoldenData.docClusters
  def docTopics: Option[String]   = TextMlGoldenData.docTopics
}
