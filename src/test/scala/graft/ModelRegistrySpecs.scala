package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.runtime.{GraftSession, ModelRegistry}
import graft.runtime.ModelRegistry.{Materialization, ModelDef}

/** Specs for the dbt-style model DAG executor (SURVEY §3.1): one
  * build per model, topological order, per-tier materialization, and
  * incremental MERGE semantics across runs.
  */
class ModelRegistrySpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def wh(): String =
    Files.createTempDirectory("graft-wh").toFile.getAbsolutePath

  test("diamond DAG: topological order, each model built exactly once") {
    val builds = new AtomicInteger(0)
    val reg = new ModelRegistry()
      .register(ModelDef("mr_fanin", Seq("mr_left", "mr_right"), Materialization.Table,
        deps => deps("mr_left").join(deps("mr_right"), "k")))
      .register(ModelDef("mr_left", Seq("mr_src"), Materialization.View,
        deps => deps("mr_src").select(col("k"), (col("v") * 2).as("l"))))
      .register(ModelDef("mr_src", Nil, Materialization.View, { _ =>
        builds.incrementAndGet()
        Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v")
      }))
      .register(ModelDef("mr_right", Seq("mr_src"), Materialization.View,
        deps => deps("mr_src").select(col("k"), (col("v") + 1).as("r"))))

    val res = reg.run(spark, wh())
    // source first, fan-in last, one build of the shared source
    assert(res.order.head == "mr_src" && res.order.last == "mr_fanin")
    assert(builds.get() == 1)
    val out = res.frames("mr_fanin").orderBy("k").collect()
    assert(out.length == 3 && out.head.getAs[Int]("l") == 20 && out.head.getAs[Int]("r") == 11)
    spark.catalog.clearCache()
  }

  test("Table tier: downstream reads the parquet materialization, not the pipeline") {
    val dir = wh()
    val reg = new ModelRegistry()
      .register(ModelDef("mr_base", Nil, Materialization.Table,
        _ => Seq((1, "a"), (2, "b")).toDF("id", "s")))
      .register(ModelDef("mr_child", Seq("mr_base"), Materialization.View,
        deps => deps("mr_base").filter(col("id") > 1)))
    val res = reg.run(spark, dir)
    // the dependency frame is a file scan of warehouse/<name>
    val scanned = res.frames("mr_child").queryExecution.sparkPlan.toString
    assert(scanned.contains("mr_base"), s"child should scan the materialized table, got:\n$scanned")
    assert(new java.io.File(s"$dir/mr_base").isDirectory)
    assert(res.frames("mr_child").count() == 1)
    spark.catalog.clearCache()
  }

  test("Incremental tier: first run full-writes, second run MERGE-upserts by key") {
    val dir = wh()
    def regFor(rows: Seq[(Int, String, Int)]) = new ModelRegistry()
      .register(ModelDef("mr_inc", Nil,
        Materialization.Incremental(Seq("id"), Seq(col("ver").desc)),
        _ => rows.toDF("id", "s", "ver")))
    regFor(Seq((1, "a", 1), (2, "b", 1))).run(spark, dir)
    // second batch: update id=2 (higher ver wins), insert id=3, and a
    // same-key duplicate that precedence must collapse to ver=3
    regFor(Seq((2, "b2", 2), (3, "c", 1), (3, "c3", 3))).run(spark, dir)
    val out = spark.read.parquet(s"$dir/mr_inc")
      .orderBy("id").as[(Int, String, Int)].collect().toSeq
    assert(out == Seq((1, "a", 1), (2, "b2", 2), (3, "c3", 3)))
    assert(!new java.io.File(s"$dir/.mr_inc__staging").exists(), "scratch dir must be cleaned")
  }

  test("real model DAG: cross-asset branches through the registry match the direct fan-in") {
    // The production shape the registry exists for: shared stagings as
    // views, the five int_cross_asset branches as tables, divergences
    // reading materialized branches — results must equal the direct
    // (inline re-derivation) call bit-for-bit.
    val sf = "/root/testdata/sf0.001"
    import graft.queries.{CrossAssetQueries => CA, CrossAssetQueries2 => CA2}
    val dir = wh()
    val reg = new ModelRegistry()
      .register(ModelDef("int_credit", Nil, Materialization.Table,
        _ => CA2.creditSignals(spark, sf, None)))
      .register(ModelDef("int_breadth", Nil, Materialization.Table,
        _ => CA.breadthSignals(spark, sf, None)))
      .register(ModelDef("divergences_lite", Seq("int_credit", "int_breadth"),
        Materialization.Table, deps =>
          deps("int_credit").select("date", "spy_close", "hy_spread")
            .join(deps("int_breadth").select(col("date").as("b_date"), col("iwm_spy_ratio")),
              col("date") === col("b_date"), "left")
            .drop("b_date")))
    val res = reg.run(spark, dir)
    val direct = CA2.creditSignals(spark, sf, None).select("date", "spy_close", "hy_spread")
      .join(CA.breadthSignals(spark, sf, None)
        .select(col("date").as("b_date"), col("iwm_spy_ratio")),
        col("date") === col("b_date"), "left")
      .drop("b_date")
    val a = res.frames("divergences_lite").orderBy("date").collect().toSeq
    val b = direct.orderBy("date").collect().toSeq
    assert(a == b && a.nonEmpty)
    spark.catalog.clearCache()
  }

  test("DAG-mode consumers equal the isolated queries bit-for-bit (bench dag lane, VERDICT r7 #1)") {
    // The bench's DAG lane must be a pure read-path change: every
    // consumer over the Table-tier materializations returns exactly
    // the rows the isolated (inline re-derivation) QueryDef returns.
    val sf = "/root/testdata/sf0.001"
    val dir = wh()
    val frames = graft.queries.DagBenchModels.registry(spark, sf).run(spark, dir).frames
    assert(frames.keySet == graft.queries.DagBenchModels.modelNames.toSet)
    val isolated = graft.queries.Registry.byName
    graft.queries.DagBenchModels.consumers(spark, sf, frames).foreach { case (name, dagFn) =>
      // driver-side stringize+sort: engine sort order on tied rows is
      // not stable, so compare canonicalized multisets
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
        val cols = df.columns.sorted.map(col(_))
        df.select(cols: _*).collect().toSeq.map(_.toString).sorted
      }
      val a = rows(dagFn())
      val b = rows(isolated(name).query(spark, sf))
      assert(a.nonEmpty, s"$name: empty DAG-mode result")
      assert(a == b, s"$name: DAG-mode result differs from isolated query")
      spark.catalog.clearCache()
    }
  }

  test("q_model_dag_mart: incremental run replaces batch-1 customer rows with batch-2") {
    val sf = "/root/testdata/sf0.001"
    val mart = graft.queries.ModelDagQueries.defs.head.query(spark, sf)
      .select("custkey", "last_order_date").collect()
      .map(r => r.getLong(0) -> r.getDate(1)).toMap
    // every customer appears once (MERGE key = custkey)
    assert(mart.nonEmpty)
    // a customer with orders in BOTH batches must carry the batch-2
    // (post-cutoff) aggregate — replacement, not append
    val cutoff = java.sql.Date.valueOf("1995-07-01")
    val both = spark.read.parquet(s"$sf/orders.parquet")
      // fct inner-joins lineitem, so an order with no items never
      // reaches the mart — scope the fixture set the same way
      .join(spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      .groupBy("o_custkey")
      .agg(max(when(col("od") < to_date(lit("1995-07-01")), 1).otherwise(0)).as("b1"),
        max(when(col("od") >= to_date(lit("1995-07-01")), 1).otherwise(0)).as("b2"))
      .filter(col("b1") === 1 && col("b2") === 1)
      .select("o_custkey").collect().map(_.getLong(0))
    assert(both.nonEmpty, "fixture needs customers spanning both batches")
    both.foreach { k =>
      assert(!mart(k).before(cutoff), s"custkey $k kept a batch-1 row after the merge")
    }
    spark.catalog.clearCache()
  }

  test("cycle and unknown-dep detection") {
    val cyc = new ModelRegistry()
      .register(ModelDef("mr_a", Seq("mr_b"), Materialization.View, d => d("mr_b")))
      .register(ModelDef("mr_b", Seq("mr_a"), Materialization.View, d => d("mr_a")))
    val e = intercept[IllegalArgumentException](cyc.topoOrder)
    assert(e.getMessage.contains("cycle") && e.getMessage.contains("mr_a"))

    val dangling = new ModelRegistry()
      .register(ModelDef("mr_x", Seq("mr_missing"), Materialization.View, d => d("mr_missing")))
    assert(intercept[IllegalArgumentException](dangling.topoOrder)
      .getMessage.contains("mr_missing"))

    assert(intercept[IllegalArgumentException] {
      new ModelRegistry()
        .register(ModelDef("mr_dup", Nil, Materialization.View, _ => spark.range(1).toDF()))
        .register(ModelDef("mr_dup", Nil, Materialization.View, _ => spark.range(1).toDF()))
    }.getMessage.contains("duplicate"))
  }
}
