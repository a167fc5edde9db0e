package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.PageRank
import Q._

/** Graph-analytics surface: PageRank over the bipartite part—supplier
  * graph (who supplies what, from lineitem). The DuckDB oracle replays
  * ALL iterations as generated chained CTEs with the identical 2^-20
  * quantized arithmetic — an end-to-end hash check of an iterative
  * distributed graph computation. (Connected components has its own
  * rows-only query + spec in PipelineQueries — its label-propagation
  * iteration count is data-dependent, so it can't be a fixed CTE chain.)
  */
object GraphQueries {

  private val Iters = 4

  /** Chained-CTE replay: pr_i from pr_{i-1}, same fp op order as
    * PageRank.run (double casts everywhere — bare DuckDB decimals would
    * silently switch the division to decimal arithmetic). */
  private def oracle(iters: Int): String = {
    val base = """
      WITH e0 AS (
        SELECT DISTINCT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst
        FROM lineitem),
      und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      deg AS (SELECT src, COUNT(*) AS outdeg FROM und GROUP BY src),
      pr0 AS (SELECT src AS node, CAST(1 AS DOUBLE) AS pr FROM deg)"""
    val its = (1 to iters).map { i =>
      s""",
      pr$i AS (
        SELECT d.src AS node,
          (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
            + CAST(0.85 AS DOUBLE) * COALESCE(
              SUM(FLOOR(p.pr / ed.outdeg * 1048576) / CAST(1048576 AS DOUBLE)),
              CAST(0 AS DOUBLE)) AS pr
        FROM deg d
        LEFT JOIN und u ON u.dst = d.src
        LEFT JOIN pr${i - 1} p ON p.node = u.src
        LEFT JOIN deg ed ON ed.src = u.src
        GROUP BY d.src)"""
    }.mkString
    base + its + s"\n      SELECT node, pr FROM pr$iters"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_pagerank", (s, dir) => {
      // integral namespaced ids: parts even, suppliers odd
      val e = t(s, dir, "lineitem").select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      PageRank.run(e, "src", "dst", Iters)
    }, Some(oracle(Iters)))
  )
}
