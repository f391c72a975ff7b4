package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.runtime.GraftSession
import graft.sources.JdbcWatermark

/** Real JDBC round-trip for the watermark incremental copy, against an
  * embedded Derby instance (the driver Spark ships). */
class JdbcWatermarkSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[2]"), 4)
  private val url = "jdbc:derby:memory:wmdb;create=true"

  override def beforeAll(): Unit = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE events_raw (id BIGINT NOT NULL, payload VARCHAR(64))")
    (1L to 3L).foreach(i =>
      st.execute(s"INSERT INTO events_raw VALUES ($i, 'p$i')"))
    st.close(); c.close()
  }

  override def afterAll(): Unit = spark.stop()

  test("first copy takes everything; second copy takes only the delta, idempotently") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("ID", "PAYLOAD")

    val first = JdbcWatermark.incrementalCopy(spark, url, "events_raw", "ID", empty)
    assert(first.count() == 3)
    assert(JdbcWatermark.currentWatermark(first, "ID").contains(3L))

    // new rows arrive at the source
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    (4L to 5L).foreach(i =>
      st.execute(s"INSERT INTO events_raw VALUES ($i, 'p$i')"))
    st.close(); c.close()

    val second = JdbcWatermark.incrementalCopy(spark, url, "events_raw", "ID", first)
    assert(second.count() == 5)
    // delta read pulls ONLY the two new rows (source-side pruning)
    val delta = JdbcWatermark.readIncrement(spark, url, "events_raw", "ID", Some(3L))
    assert(delta.count() == 2)
    assert(delta.agg(org.apache.spark.sql.functions.min(delta("ID"))).head().getLong(0) == 4L)

    // idempotent when nothing new arrived
    val third = JdbcWatermark.incrementalCopy(spark, url, "events_raw", "ID", second)
    assert(third.count() == 5)
  }
}
