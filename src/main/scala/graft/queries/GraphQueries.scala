package graft.queries

import org.apache.spark.sql.SparkSession

import graft.operators.GraphOps
import graft.runtime.Tables

/** Iterative graph analytics ([[graft.operators.GraphOps]]):
  * scaled-integer PageRank over the customer–supplier trade graph.
  * Every iteration is exact BIGINT arithmetic, so an 8-iteration
  * distributed fixpoint hash-matches a SQL engine replaying the same
  * recurrence — no float tolerance anywhere. */
object GraphQueries {

  private val Iters = 8

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_pagerank_trade",
      (s: SparkSession, dir: String) => {
        val t = Tables(s, dir)
        GraphOps.pageRankScaled(
          GraphOps.tradeGraphEdges(t.orders, t.lineitem), iterations = Iters,
          // the symmetrized trade graph qualifies for completeInbound
          // (GraphSpecs proves bit-identity), but measured A/B at
          // sf0.1 local[32] keeps the general path: 5.3 s vs 6.5 s —
          // the re-anchoring join against the 32-partition cached
          // nodes frame preserves checkpoint parallelism, while the
          // join-free path checkpoints the AQE-coalesced (near-single-
          // partition) groupBy output serially per round. On a real
          // cluster with |V| >> cores the join-free path wins instead.
          completeInbound = false)
      },
      Some {
        val base =
          """
        WITH pairs AS (
          SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                          's:' || CAST(l_suppkey AS VARCHAR) AS s
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        edges AS (
          SELECT c AS src, s AS dst FROM pairs
          UNION ALL
          SELECT s AS src, c AS dst FROM pairs
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes CROSS JOIN nn)"""
        val iters = (1 to Iters).map { i =>
          s"""
        c$i AS (
          SELECT e.dst AS node, SUM(r.r // d.d) AS m
          FROM edges e
          JOIN r${i - 1} r ON e.src = r.node
          JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ),
        r$i AS (
          SELECT nodes.node,
            ((1000000000000 * 15 // 100) // nn.n)
              + (COALESCE(c$i.m, 0) * 85) // 100 AS r
          FROM nodes CROSS JOIN nn
          LEFT JOIN c$i ON nodes.node = c$i.node
        )"""
        }.mkString(",", ",", "")
        s"""$base$iters
        SELECT node, CAST(r AS BIGINT) AS rank_u12 FROM r$Iters
      """
      }
    ),
    // Exact triangle counting (degree-ordered orientation) on the
    // 1995 part co-purchase graph: parts are adjacent when some order
    // contains both. Per-node triangle participation + degree, all
    // exact integers. The year scope keeps the bench fixture balanced;
    // the operator is scale-shaped regardless (wedge volume bounded
    // O(m^1.5) by the orientation, never Σ deg²).
    QueryDef(
      "q_triangle_copurchase",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.functions._
        val t = Tables(s, dir)
        val li = t.orders
          .filter(year(to_date(col("o_orderdate"))) === 1995)
          .select(col("o_orderkey"))
          .join(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val pairs = li.select(col("o"), col("p").as("pa"))
          .join(li.select(col("o"), col("p").as("pb")), Seq("o"))
          .filter(col("pa") < col("pb"))
        GraphOps.triangleCounts(pairs, "pa", "pb")
      },
      Some("""
        WITH li AS (
          SELECT l.l_orderkey AS o, l.l_partkey AS p
          FROM lineitem l JOIN orders od ON l.l_orderkey = od.o_orderkey
          WHERE year(od.o_orderdate) = 1995
        ),
        pairs AS (
          SELECT DISTINCT x.p AS a, y.p AS b
          FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
        ),
        deg AS (
          SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs) GROUP BY 1
        ),
        ori AS (
          SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
                 CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS v,
                 CASE WHEN (da.d, a) < (db.d, b) THEN db.d ELSE da.d END AS dv
          FROM pairs JOIN deg da ON a = da.n JOIN deg db ON b = db.n
        ),
        wed AS (
          SELECT e1.u AS u, e1.v AS y, e2.v AS z
          FROM ori e1 JOIN ori e2
            ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
        ),
        tri AS (
          SELECT wed.u AS u, wed.y AS y, wed.z AS z
          FROM wed JOIN ori ON wed.y = ori.u AND wed.z = ori.v
        ),
        corners AS (
          SELECT u AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles,
               CAST(ANY_VALUE(d) AS BIGINT) AS degree
        FROM corners JOIN deg ON node = deg.n
        GROUP BY node
      """)
    )
  )
}
