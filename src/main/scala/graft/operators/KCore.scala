package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (public algorithm:
  * Seidman 1983, "Network structure and minimum degree"; the standard
  * distributed formulation peels all sub-k-degree nodes each round) —
  * the graph-curation filter that strips weakly-connected periphery
  * (spam pages, orphan entities) before link-based scoring like
  * PageRank/HITS.
  *
  * Each round: one degree aggregation over the live edge set, one
  * semi-join to drop edges touching sub-k nodes. Rounds are
  * barrier-synchronous (like every Pregel-style loop here); per-round
  * work is linear in the live edge count and the live set only
  * shrinks. A tracked eager checkpoint after each round caps lineage
  * AND releases the previous round's blocks deterministically
  * ([[Checkpoints.tracked]] — relying on the ContextCleaner retained
  * R rounds of edge copies). The k-core is UNIQUE (the
  * maximal subgraph with min degree >= k), which is what lets the gate
  * oracle certify the result exactly: (a) every survivor keeps >= k
  * surviving neighbors, (b) every removed node has < k surviving
  * neighbors — (a)+(b) hold only for the true k-core.
  *
  * Reference has no k-core operator; this rides the same edge tables
  * as [[PageRank]]/[[Hits]] (Gelly, the reference's graph library, is
  * a separate project).
  */
object KCore {

  /** Surviving nodes of the k-core with their in-core degree.
    * `edges` must be a SYMMETRIC simple edge list (src, dst) — use
    * [[symmetrize]] for a directed/one-sided input. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 100): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // trackedCounted: the count that drives convergence IS the action
    // that materializes the round's checkpoint — one pass per round
    // over the live edge set instead of materialize-then-recount (two)
    var (live, n, release) = Checkpoints.trackedCounted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val keep = live.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      val (next, m, releaseNext) = Checkpoints.trackedCounted(live
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
      release() // round t-1's blocks: next is materialized, free them
      converged = m == n
      live = next
      release = releaseNext
      n = m
      rounds += 1
    }
    require(converged || n == 0,
      s"k-core peel did not converge within $maxRounds rounds " +
        s"($n live edges remain); raise maxRounds — the current live " +
        "set would NOT be a k-core")
    live.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
  }

  /** Undirected simple view of a directed edge list: both directions,
    * self-loops dropped, duplicates collapsed. */
  def symmetrize(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }
}
