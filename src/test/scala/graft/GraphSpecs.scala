package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Scaled-integer PageRank: hand-checked fixpoints, mass bounds,
  * determinism under repartitioning. */
class GraphSpecs extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("graph-specs")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("symmetric 2-node graph: ranks equal and conserve mass (minus floor dust)") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = GraphOps.pageRankScaled(edges, iterations = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == r("b"), "symmetric nodes must tie exactly")
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 999999990000L,
      s"mass $total outside [1 - floor dust, 1]")
  }

  test("star graph: hub outranks leaves; deterministic under repartition") {
    import spark.implicits._
    val spokes = (1 to 20).map(i => ("hub", s"leaf$i")) ++ (1 to 20).map(i => (s"leaf$i", "hub"))
    val edges = spokes.toDF("src", "dst")
    val r1 = GraphOps.pageRankScaled(edges, iterations = 6)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1("hub") > r1("leaf1") * 5, s"hub=${r1("hub")} leaf=${r1("leaf1")}")
    assert((1 to 20).map(i => r1(s"leaf$i")).distinct.size == 1, "leaves must tie exactly")
    val r2 = GraphOps.pageRankScaled(edges.orderBy(col("dst")).repartition(7), iterations = 6)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1 == r2, "byte-stable under repartitioning")
    // completeInbound skips the re-anchoring join; on a symmetrized
    // graph the result must be bit-identical to the general path
    val r3 = GraphOps.pageRankScaled(edges, iterations = 6, completeInbound = true)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1 == r3, "completeInbound fast path must not change results")
  }
}
