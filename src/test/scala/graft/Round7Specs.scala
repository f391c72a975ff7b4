package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JoinOps, SkewOps}
import graft.runtime.GraftSession

/** Round-7 operators: generalized as-of join (union-spine) and
  * bloom-pruned join. Semantics pinned on hand-built frames (equal-ts
  * inclusivity, tie-breaks, tolerance boundary, unmatched keys) plus
  * equivalence against the naive banded-join form on real testdata.
  */
class Round7Specs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private val HourUs = 3600L * 1000000

  test("asofJoin: backward/forward matches, equal-ts inclusivity, tie-breaks, tolerance cut") {
    val right = Seq(
      (1L, 7L, "2024-01-01 10:00:00"),
      (2L, 7L, "2024-01-01 10:00:00"), // ts tie with id 1
      (3L, 7L, "2024-01-01 11:00:00")
    ).toDF("view_id", "u", "ts").withColumn("ts", to_timestamp(col("ts")))
    val left = Seq(
      (100L, 7L, "2024-01-01 10:30:00"), // between the two right ts
      (101L, 7L, "2024-01-01 10:00:00"), // exactly ON a right ts
      (102L, 7L, "2024-01-01 12:30:00"), // backward beyond tolerance
      (103L, 9L, "2024-01-01 10:30:00")  // key with no right rows
    ).toDF("pid", "u", "ts").withColumn("ts", to_timestamp(col("ts")))

    val out = JoinOps.asofJoin(left, right, Seq("u"), "ts", "ts",
      rTieCol = "view_id", payload = Seq("view_id"), toleranceUs = HourUs)
      .select("pid", "bw_view_id", "bw_delta_us", "fw_view_id", "fw_delta_us")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap

    // 10:30 -> backward = max-tie row at 10:00 (id 2), forward = 11:00
    assert(out(100L) == ((Some(2L), Some(1800L * 1000000), Some(3L), Some(1800L * 1000000))))
    // exactly on 10:00: BOTH directions inclusive; backward takes max
    // tie (2), forward takes min tie (1), both delta 0
    assert(out(101L) == ((Some(2L), Some(0L), Some(1L), Some(0L))))
    // 12:30: backward candidate 11:00 is 90 min > 1 h tolerance; no forward
    assert(out(102L) == ((None, None, None, None)))
    // unmatched key
    assert(out(103L) == ((None, None, None, None)))
  }

  test("asofJoin equals the banded-join + row_number form on real events") {
    val ev = runtime.Tables(spark, "/root/testdata/sf0.001").events
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("u"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("vu"), col("ts").as("vts"))
    val tol = 2 * HourUs

    val spine = JoinOps.asofJoin(p, v.withColumnRenamed("vu", "u").withColumnRenamed("vts", "ts"),
      Seq("u"), "ts", "ts", rTieCol = "vid", payload = Seq("vid"), toleranceUs = tol)
      .select(col("pid"), col("bw_vid"), col("fw_vid"))

    val bwNaive = p.join(v, p("u") === v("vu") &&
        v("vts") <= p("ts") && unix_micros(p("ts")) - unix_micros(v("vts")) <= tol, "left")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(p("pid")).orderBy(v("vts").desc_nulls_last, v("vid").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(p("pid"), v("vid").as("bw_naive"))
    val fwNaive = p.join(v, p("u") === v("vu") &&
        v("vts") >= p("ts") && unix_micros(v("vts")) - unix_micros(p("ts")) <= tol, "left")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(p("pid")).orderBy(v("vts").asc_nulls_last, v("vid").asc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(p("pid").as("fpid"), v("vid").as("fw_naive"))

    val joined = spine
      .join(bwNaive, Seq("pid"))
      .join(fwNaive, spine("pid") === fwNaive("fpid"))
    assert(joined.count() > 0)
    val mismatch = joined.filter(
      !(col("bw_vid") <=> col("bw_naive")) || !(col("fw_vid") <=> col("fw_naive")))
    assert(mismatch.count() == 0)
  }

  test("TopK aggregator equals the window form and is merge-order invariant") {
    import graft.functions.TopKAggregator
    val li = runtime.Tables(spark, "/root/testdata/sf0.001").lineitem.select(
      col("l_returnflag").as("grp"),
      (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 1000000)
        .cast("long").as("score"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))

    def viaAgg(in: org.apache.spark.sql.DataFrame) = in
      .groupBy(col("grp"))
      .agg(TopKAggregator.topK(7, col("score"), col("id")).as("top"))
      .select(col("grp"), posexplode(arrays_zip(col("top.scores"), col("top.ids"))))
      .select(col("grp"), col("pos"), col("col.scores").as("score"), col("col.ids").as("id"))

    val wf = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id").asc)
    val viaWindow = li.withColumn("pos", row_number().over(wf) - 1)
      .filter(col("pos") < 7).select("grp", "pos", "score", "id")

    val a = viaAgg(li)
    assert(a.exceptAll(viaWindow).count() == 0 && viaWindow.exceptAll(a).count() == 0)

    // merge-order invariance: a different physical partitioning must
    // produce the identical cut (the bounded-buffer merge is total-
    // ordered, so repartition cannot change results)
    val b = viaAgg(li.repartition(7, col("id")))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("PQ ANN: codebooks are partitioning-invariant and the shortlist recalls brute-force neighbors") {
    import graft.operators.{PqOps, SimilarityOps}
    val e = runtime.Tables(spark, "/root/testdata/sf0.001").embeddings

    // training reads a deterministic ordered sample — physical layout
    // must not leak into the codebooks
    val cb1 = PqOps.pqTrain(e, "vec_id", "embedding", m = 8, ks = 16)
    val cb2 = PqOps.pqTrain(e.repartition(5, col("vec_id")), "vec_id", "embedding", m = 8, ks = 16)
    assert(cb1.cents.flatten.flatten.toSeq == cb2.cents.flatten.flatten.toSeq,
      "codebooks must be bit-identical under repartitioning")

    // ADC shortlist must recall most true top-10 cosine neighbors
    val qvec = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray.map(_.toDouble)
    val corpus = e.filter(col("vec_id") =!= 0)
    val qvecDf = e.filter(col("vec_id") === 0)
      .select(SimilarityOps.toDouble(col("embedding")).as("qvec"))
    val brute = corpus.crossJoin(broadcast(qvecDf))
      .select(col("vec_id"), SimilarityOps.cosine(corpus, col("embedding"), col("qvec")).as("c"))
      .orderBy(col("c").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val short50 = PqOps.pqEncode(corpus, "embedding", cb1)
      .withColumn("adc", PqOps.adcScore(cb1, qvec, col("pq_codes")))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(50)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = brute.count(short50.contains)
    assert(recall >= 6, s"PQ 50-shortlist recalled only $recall/10 true neighbors")
  }

  test("bloomPrunedJoin equals the plain join and prunes pre-shuffle") {
    val t = runtime.Tables(spark, "/root/testdata/sf0.001")
    val dim = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val plain = t.orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey")
    val pruned = SkewOps.bloomPrunedJoin(t.orders, dim, "o_custkey", "c_custkey", 4096L, 0.01)
      .select("o_orderkey", "o_custkey")
    assert(plain.exceptAll(pruned).count() == 0 && pruned.exceptAll(plain).count() == 0)

    // the pre-shuffle prune is real: the bloom keeps at most
    // true-matches + fpp-slack of the fact side
    val bf = dim.stat.bloomFilter("c_custkey", 4096L, 0.01)
    val total = t.orders.count()
    val trueMatch = t.orders.join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val bfB = spark.sparkContext.broadcast(bf)
    val mc = udf((k: java.lang.Long) => k != null && bfB.value.mightContainLong(k))
    val kept = t.orders.filter(mc(col("o_custkey"))).count()
    assert(kept >= trueMatch, s"bloom must never drop a true match: kept=$kept true=$trueMatch")
    assert(kept <= trueMatch + (0.05 * total).toLong + 1,
      s"bloom kept $kept of $total; true=$trueMatch — fpp far above configured 1%")
  }
}
