package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.SkewOps
import graft.runtime.GraftSession

/** Scale-mechanism specs: salted joins equal plain joins; bucketed
  * tables co-locate joins (no exchange in the plan).
  */
class ScaleSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of rows share one hot key
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 50, s"p$i")).toDF("k", "payload")
    val small = (0 to 60).map(i => (i.toLong, s"dim$i")).toDF("k", "dim")
    val plain  = large.join(small, Seq("k")).select("k", "payload", "dim")
    val salted = SkewOps.saltedJoin(large, small, Seq("k"), buckets = 8).select("k", "payload", "dim")
    assert(plain.exceptAll(salted).count() == 0 && salted.exceptAll(plain).count() == 0)
  }

  test("hotKeySplitJoin equals the plain join") {
    val large = (1 to 500).map(i => (if (i <= 400) 7L else i.toLong % 20, i)).toDF("k", "v")
    val small = (0 to 30).map(i => (i.toLong, s"d$i")).toDF("k", "dim")
    val plain = large.join(small, Seq("k")).select("k", "v", "dim")
    val split = SkewOps.hotKeySplitJoin(large, small, Seq("k"), threshold = 100).select("k", "v", "dim")
    assert(plain.exceptAll(split).count() == 0 && split.exceptAll(plain).count() == 0)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val db = spark
    import db.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse files persist — clear the physical locations too
    val wh = System.getProperty("java.io.tmpdir") + "/graft-warehouse"
    Seq("b_orders", "b_lines").foreach { t =>
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "ov")
      .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("b_orders")
    (1 to 3000).map(i => ((i % 1000 + 1).toLong, s"l$i")).toDF("k", "lv")
      .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("b_lines")
    // disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"), Seq("k"))
      val plan   = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(joined.count() == 3000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
