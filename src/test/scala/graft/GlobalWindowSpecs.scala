package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.runtime.GraftSession

/** Standing fleet gate for the bounded-global-window invariant
  * (VERDICT r8 #2; WindowOps.scala header): the ~85 `Window.orderBy`
  * sites with NO partitioning are all documented as sitting above a
  * date-grain aggregate of a market-wide line, so the single partition
  * WindowExec materializes is bounded by the trading calendar at ANY
  * corpus scale. Until now that boundedness was an argument in a
  * comment; this spec measures it: every global-window INPUT across
  * the whole registry is executed in isolation at sf0.01 and must hold
  * ≤ [[GlobalWindowAudit.AbsMax]] rows. The 10×-data growth leg
  * (sf0.1 → sf1, where the calendar is saturated) runs as
  * `Test/runMain graft.GlobalWindowAudit` and is recorded in SCALE.md
  * — growth between the toy SFs is calendar FILL-IN (sparse series
  * gaining missing days), not fact-volume scaling, so it is not gated
  * here.
  */
class GlobalWindowSpecs extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.get(Some("local[8]"), 8)

  override def afterAll(): Unit = spark.stop()

  test("fleet audit: every unpartitioned Window input is calendar-bounded at sf0.01 (VERDICT r8 #2)") {
    val counts = GlobalWindowAudit.audit(spark, "/root/testdata/sf0.01")
    val sites = counts.values.map(_.size).sum
    info(s"queries with global windows: ${counts.size}; distinct sites: $sites")
    // site-detection rot gate: the fleet carries ~85 source-level
    // global-window sites; the optimized plans of 45 queries retain
    // 140+ distinct window inputs. A collapse of this count means the
    // detector (or the plan walk) broke, not that the windows left.
    assert(counts.size >= 40 && sites >= 120,
      s"global-window site detection shrank (${counts.size} queries / $sites sites) — detector rot?")
    val offenders = counts.toSeq.flatMap { case (q, cs) =>
      cs.zipWithIndex.collect {
        case (n, i) if n > GlobalWindowAudit.AbsMax => s"$q site#$i rows=$n"
      }
    }
    assert(offenders.isEmpty,
      s"global-window inputs above ${GlobalWindowAudit.AbsMax} rows at sf0.01 (keyed grain leaked into a global window):\n${offenders.mkString("\n")}")
    val worst = counts.toSeq.map { case (q, cs) => (q, cs.max) }.sortBy(-_._2).take(5)
    info(s"largest inputs: ${worst.map { case (q, n) => s"$q=$n" }.mkString(", ")}")
  }
}
