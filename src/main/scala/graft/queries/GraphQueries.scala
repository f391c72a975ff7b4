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
    )
  )
}
