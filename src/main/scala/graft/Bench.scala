package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  * A warmup pass (flagship star join) is run first so the reported
  * per-query numbers exclude JVM/codegen/parquet-footer warmup.
  *
  * The driver captures only the tail of stdout (~2000 chars), so the
  * printed line must stay short: it carries the total plus the top
  * slowest queries; the full per-query map is written to
  * BENCH_FULL.json next to the build for human/judge inspection.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default matches the stated execution model (local[32], 32
    // shuffle partitions); SPARK_GRAFT_CPUS still overrides for
    // constrained dev shells.
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle width scales with DATA, not cores (SCALE.md §6 #1): at
    // the canonical sf0.1 the 32 default keeps partitions ≈ cores, but
    // the 100× (sf10) leg needs wider shuffles so the widest operator's
    // per-task sort state (ER's 150M-row variant self-join) stays
    // spill-friendly instead of GC-fatal inside one fixed-heap JVM —
    // on a real cluster this is the same knob tuned per job.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The fleet's ~85 bounded global-window sites (WindowOps.scala
    // header; boundedness spec-gated in GlobalWindowSpecs) each emit an
    // identical WindowExec single-partition WARN — thousands of lines
    // that bury real warnings in the driver's tail capture (VERDICT r8
    // #8). Silence that one category; everything else stays at WARN.
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case scala.util.control.NonFatal(_) => () }

    // warmup: JVM + codegen + parquet footers (not reported). Three
    // passes with different shapes — a star join, a window/lookback
    // model, and an object-hash-aggregate snapshot (collect_list/
    // sort_array + broadcast-nested-loop spine join) — so the first
    // measured queries (alphabetically the agent models, which stack
    // exactly these operators) don't absorb the codegen/JIT cost of a
    // whole operator family on the clock. A missing name is a
    // registry bug, not a condition to skip silently.
    Seq("q_join_star_region_revenue", "q_window_lag_returns",
        "q_fred_series_latest_aggregates_snapshot").foreach { q =>
      SparkEntry.queries.get(q) match {
        case Some(fn) =>
          try fn(spark, sfDir).count()
          catch { case scala.util.control.NonFatal(_) => () }
        case None =>
          System.err.println(s"[bench] WARNING: warmup query $q not in registry; JIT warmup skipped")
      }
      spark.catalog.clearCache()
    }

    // Local-dev subset filter (comma-separated names); driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Designated scale-suite mode (VERDICT r8 #1): SPARK_GRAFT_SUITE=scale
    // runs the named shuffle-heavy subset (plus the DAG lane) and DOES
    // record a suffixed BENCH_FULL_<sf>.json — the sf1 evidence run.
    val suite = sys.env.get("SPARK_GRAFT_SUITE")
    val suiteSet: Option[Set[String]] = suite.map(ScaleSuite.forSuite)
    val selected: Option[Set[String]] = only.orElse(suiteSet)
    // Full-record runs: everything except ad-hoc ONLY subsets.
    val record = only.isEmpty
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timed(name: String, fn: (SparkSession, String) => DataFrame): (Double, Boolean) = {
      // Attributable per-query numbers: caches cleared and a full GC
      // forced BEFORE the clock starts, so one query's garbage (or
      // leaked cache) can't bleed into its alphabetical neighbor.
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      // Failures surface on stderr (ADVICE r8: a swallowed exception
      // must not masquerade as a normal timing) but keep the elapsed
      // number — correctness has its own gate; the bench's job is time.
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
            failed += name
            // A dead context turns every later query into an instant
            // no-op "timing" and would poison the record AND its min map
            // (observed: an executor OOM at the sf10 leg shut the context
            // down mid-suite and 17 queries "ran" in 30 ms). Nothing
            // measured after this point means anything — abort loudly.
            if (spark.sparkContext.isStopped) {
              System.err.println(s"[bench] SparkContext is stopped — aborting; NO record written")
              sys.exit(2)
            }
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // per-query caches must not leak across measurements
      (dt, ok)
    }
    // Slow-list entries get median-of-3 (VERDICT r6 #7): a single
    // sample on a >4 s query conflates plan cost with residual JIT /
    // GC timing, so regressions vs improvements were single-sample
    // judgments. The median of three is a steady-state number.
    // Each query also records its MIN across samples — and, below,
    // across the round's prior full runs (VERDICT r7 #4): the box's
    // contention storms hit a different victim each run, so minima
    // are the comparable round-over-round number.
    val MedianFloorSec = 4.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val (first, ok1) = timed(name, fn)
        if (first <= MedianFloorSec || !ok1) {
          // Failure handling per sample (ADVICE r9 #3): a sample that
          // died contributes its death timing to the reported value
          // (the "failed" array flags it) but NEVER to the min map.
          (name, first, 1, if (ok1) first else Double.MaxValue)
        } else {
          // Re-samples must re-pay any driver-side training the query
          // does: the per-dir training memos survive clearCache, so
          // without this a >4 s training query's re-samples measure the
          // memo (~0.1 s) and the MEDIAN becomes the artifact. The
          // clear is scoped to the memos THIS query's family owns
          // (ADVICE r9 #1: an unscoped clear silently re-trained other
          // families' warm members on their own re-samples).
          def resample(): (Double, Boolean) =
            { graft.queries.QueryMemos.clearTraining(name); timed(name, fn) }
          val samples = Seq((first, ok1), resample(), resample())
          val okTimes = samples.filter(_._2).map(_._1).sorted
          // Median over SUCCESSFUL samples only — a death timing mixed
          // into the median is a measurement artifact. If every sample
          // died, report the first death timing (the failed array +
          // absent min row carry the real signal).
          val med = if (okTimes.nonEmpty) okTimes((okTimes.length - 1) / 2) else first
          val curMin = if (okTimes.nonEmpty) okTimes.head else Double.MaxValue
          (name, med, samples.count(_._2), curMin)
        }
      }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val rerun = results.filter(_._3 > 1)

    // Per-query min across THIS run's samples merged with the prior
    // committed record's min map at the same SF (VERDICT r7 #4):
    // repeated full runs during a round tighten the minima instead of
    // replacing them, so a contention storm cannot pollute the
    // round-over-round comparison. Names no longer in the registry
    // are dropped; partial (SPARK_GRAFT_ONLY) runs never merge.
    val sfTag = new java.io.File(sfDir).getName
    // Suite runs ALWAYS write a suite-tagged file (r10: the full-fleet
    // sf1 record now exists — VERDICT r9 #6 — so the r9 carve-out that
    // let the scale suite own BENCH_FULL_sf1.json would clobber it);
    // un-suffixed names belong to full-fleet runs, sf0.1 is canonical.
    // Non-canonical core counts get a _c<cpus> suffix (VERDICT r10 #5:
    // an 8-core full run must neither clobber nor pollute the 32-core
    // record's min map — minima are only comparable at one core count).
    val cpuTag = if (cpus == "32") "" else s"_c$cpus"
    val fullName =
      if (suite.isDefined) s"BENCH_FULL_${suite.get}_$sfTag$cpuTag.json"
      else if (sfTag == "sf0.1") s"BENCH_FULL$cpuTag.json"
      else s"BENCH_FULL_$sfTag$cpuTag.json"

    // Cross-run minima are only comparable across runs of the SAME
    // engine code (ADVICE r8: an unconditional merge lets a regressed
    // query's stale historical minimum persist forever). The scope key
    // is an md5 over the main-source tree — doc/bench-record commits
    // don't disturb it, any operator change resets the min map.
    val codeFp: String = try {
      val root = java.nio.file.Paths.get("src/main/scala")
      if (!java.nio.file.Files.isDirectory(root)) ""
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala
          .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
          .foreach { p =>
            md.update(p.toString.getBytes("UTF-8"))
            md.update(java.nio.file.Files.readAllBytes(p))
          }
        finally walk.close()
        md.digest().map("%02x".format(_)).mkString
      }
    } catch { case scala.util.control.NonFatal(_) => "" }

    val priorTxt: String =
      if (!record) ""
      else try java.nio.file.Files.readString(java.nio.file.Paths.get(fullName))
      catch { case scala.util.control.NonFatal(_) => "" }
    // Flat-object parse bounded to the NAMED object's own closing
    // brace — an unbounded scan once matched the trailing "runs"
    // object, whose sample COUNTS (3) poisoned the minima.
    def priorObj(key: String): Map[String, Double] = {
      val mObj = priorTxt.indexOf("\"" + key + "\":")
      val mEnd = if (mObj < 0) -1 else priorTxt.indexOf('}', mObj)
      if (mObj < 0 || mEnd < 0) Map.empty
      else {
        val pat = java.util.regex.Pattern.compile("\"([A-Za-z0-9_]+)\":(-?[0-9.]+)")
        val m = pat.matcher(priorTxt.substring(mObj + key.length + 3, mEnd + 1))
        val b = Map.newBuilder[String, Double]
        while (m.find()) b += m.group(1) -> m.group(2).toDouble
        b.result()
      }
    }
    def priorScalar(key: String): Option[Double] = {
      val m = java.util.regex.Pattern
        .compile("\"" + key + "\":(-?[0-9.]+)").matcher(priorTxt)
      if (m.find()) Some(m.group(1).toDouble) else None
    }
    val priorCode = {
      val m = java.util.regex.Pattern
        .compile("\"code\":\"([0-9a-f]*)\"").matcher(priorTxt)
      if (m.find()) m.group(1) else ""
    }
    // Minima merge only within the same (code fingerprint, cpus) scope
    // (VERDICT r10 #5): a prior record missing the cpus field predates
    // the scoping and never merges.
    val priorCpus = {
      val m = java.util.regex.Pattern
        .compile("\"cpus\":\"?([0-9]+)\"?").matcher(priorTxt)
      if (m.find()) m.group(1) else ""
    }
    val mergePrior = codeFp.nonEmpty && priorCode == codeFp && priorCpus == cpus
    if (record && priorTxt.nonEmpty && !mergePrior)
      System.err.println(s"[bench] $fullName min map reset (main-source fingerprint changed)")
    val priorMin: Map[String, Double] =
      if (mergePrior) priorObj("min") else Map.empty
    // A failed SAMPLE's elapsed time is how long it took to DIE, not a
    // cost — it never tightens a minimum (curMin is MaxValue unless at
    // least one sample succeeded; ADVICE r9 #3: a query that succeeded
    // first and died on a re-sample keeps its valid first-sample min).
    val minMap: Seq[(String, Double)] = results.map { case (name, _, _, curMin) =>
      name -> math.min(curMin, priorMin.getOrElse(name, Double.MaxValue))
    }.filter(_._2 < Double.MaxValue)

    // DAG-mode lane (VERDICT r7 #1): build the shared mart chain ONCE
    // (Table-tier materializations in a scratch warehouse), then time
    // the fan-in consumers reading the materialized frames — the
    // production read pattern. clearCache between timings cannot
    // evict a durable Table, so these numbers are honest scan costs.
    // Runs only on full sweeps (it shares the JVM-warm state).
    val dagLane: Option[(Double, Seq[(String, Double)])] =
      if (!record) None
      else try {
        val wh = java.nio.file.Files.createTempDirectory("graft-dagbench-").toString
        spark.catalog.clearCache(); System.gc()
        val tb0 = System.nanoTime()
        val frames = graft.queries.DagBenchModels.registry(spark, sfDir).run(spark, wh).frames
        val buildSec = (System.nanoTime() - tb0) / 1e9
        val consumers = graft.queries.DagBenchModels.consumers(spark, sfDir, frames)
        val timings = consumers.map { case (name, f) =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          // A broken consumer must NOT masquerade as a fast valid
          // timing (ADVICE r8): record the sentinel -1, log the cause.
          val ok = try { f().count(); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] dag consumer $name FAILED: ${e.getMessage}")
              false
          }
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
        spark.catalog.clearCache()
        Some((buildSec, timings))
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] dag lane failed: ${e.getMessage}")
          None
      }
    // dag_build + per-consumer minima get the same cross-run (code-
    // scoped) min discipline as the query board (VERDICT r8 #3) —
    // the build cost was a single contended sample until now. Failed
    // consumers (-1 sentinel) never enter the min merge.
    val dagMinJson = dagLane.map { case (build, ts) =>
      val priorDagMin = if (mergePrior) priorObj("dag_min") else Map.empty[String, Double]
      val priorBuildMin = if (mergePrior) priorScalar("dag_build_min") else None
      val buildMin = math.min(build, priorBuildMin.getOrElse(Double.MaxValue))
      val tsMin = ts.map { case (n, v) =>
        val prior = priorDagMin.get(n).filter(_ >= 0)
        n -> (if (v >= 0) math.min(v, prior.getOrElse(Double.MaxValue)) else prior.getOrElse(-1.0))
      }
      (buildMin, tsMin)
    }

    // Full detail → file (not stdout: would blow the driver's tail
    // capture). Partial runs (SPARK_GRAFT_ONLY dev subsets) must NOT
    // clobber the committed full-suite record (ADVICE r6), and neither
    // must full runs at a NON-CANONICAL scale factor (a full sf0.001
    // smoke once overwrote the sf0.1 record): the canonical name is
    // reserved for sf0.1; other SFs write a suffixed record.
    val dagJson = dagLane.map { case (b, ts) =>
      val (bMin, tsMin) = dagMinJson.get
      s""","dag_build":${fmt(b)},"dag_build_min":${fmt(bMin)},"dag":${qmap(ts)},"dag_min":${qmap(tsMin)}"""
    }.getOrElse("")
    // Compact (stdout) variant without the dag_min duplicate — the
    // printed line must stay well under the driver's ~2000-char tail
    // capture (VERDICT r10 #2: BENCH_r09's line outgrew it and cost a
    // round of round-over-round comparability; full maps live in the
    // record file).
    val dagJsonCompact = dagLane.map { case (b, ts) =>
      val bMin = dagMinJson.get._1
      s""","dag_build":${fmt(b)},"dag_build_min":${fmt(bMin)},"dag":${qmap(ts)}"""
    }.getOrElse("")
    val suiteJson = suite.map(su => s""","suite":"$su"""").getOrElse("")
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"code":"$codeFp","cpus":$cpus$suiteJson$failedJson,"queries":${qmap(results.map(r => (r._1, r._2)))},"min":${qmap(minMap)},"runs":${rerun.map(r => "\"" + r._1 + "\":" + r._3).mkString("{", ",", "}")}$dagJson,"sf":"$sfDir"}"""
    if (record) {
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullName), full + "\n")
      catch { case scala.util.control.NonFatal(e) => System.err.println(s"[bench] $fullName write failed: ${e.getMessage}") }
    } else System.err.println(s"[bench] subset run (${results.size} queries): BENCH_FULL.json left untouched")

    // Compact line for the driver: total + the slowest queries, largest
    // first, as many as fit a conservative line budget.
    val byCost = results.map(r => (r._1, r._2)).sortBy(-_._2)
    // Both caps bound the printed line (VERDICT r10 #2): at most 15
    // slowest queries AND a 700-char map budget, so the whole line
    // stays < ~1500 chars even with the dag section.
    val budget = 700
    val top = {
      val b = Seq.newBuilder[(String, Double)]
      var used = 2
      var i = 0
      while (i < byCost.length && i < 15 && used + byCost(i)._1.length + 12 < budget) {
        b += byCost(i)
        used += byCost(i)._1.length + 12
        i += 1
      }
      b.result()
    }
    // min_total = Σ per-query minima across the round's full runs —
    // the storm-resistant comparable (a single run's total conflates
    // plan cost with whatever the host was doing that quarter hour)
    val minTotal = if (record) s""","min_total":${fmt(minMap.map(_._2).sum)}""" else ""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"top_slowest":${top.size},"median_of_3":${rerun.size},"detail":"$fullName"$minTotal$failedJson,"queries":${qmap(top)}$dagJsonCompact,"sf":"$sfDir"}""")
    spark.stop()
  }
}
