package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank by iterated joins — in a training-data pipeline
  * this is domain/host authority weighting (quality signal for web
  * corpora, as in public Common-Crawl curation recipes); on the
  * synthetic star schema it ranks part/supplier centrality.
  *
  * Numeric discipline: each iteration's contribution PR(u)/outdeg(u) is
  * floor-quantized to multiples of 2^-20 BEFORE the sum, so the sum is
  * an exact binary fraction (order-independent, identical on any engine
  * and any partitioning — the same trick as graft.operators.Relevance's
  * q1024 scores, finer grain). The damping multiply-add
  * 0.15 + 0.85 * sum is then ONE identical IEEE op sequence per node.
  * This is what makes q_pagerank hash-comparable against a DuckDB
  * replay of the same 2^-20 arithmetic.
  *
  * Scale shape: the undirected edge list is built and persisted ONCE;
  * every iteration is join(edges, ranks on src) → quantized-contribution
  * projection → one shuffle on dst for the sum → left join back onto the
  * node set. Each iteration's rank table is materialized with an eager
  * localCheckpoint — one pass that BOTH caches the blocks and truncates
  * lineage (the persist+count idiom costs a second, separate count
  * action per iteration), so plans and recompute chains never grow with
  * the iteration count. State per node is O(1).
  */
object PageRank {

  private val Q = 1048576L // 2^20

  /** Undirected PageRank over `edges` (any direction; both directions
    * are added, so every node has outdegree >= 1 and there are no
    * dangling-mass corrections to fudge). Node id type is whatever the
    * columns carry — prefer integral ids (string keys hash ~2x slower
    * across the per-iteration joins); namespace ids that can collide
    * (e.g. 2*part vs 2*supp+1). Returns (node, pr). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      // hash-partition the cached edge list on src: every iteration's
      // rank join reuses this partitioning (only the small rank table
      // shuffles), instead of re-shuffling the edges k times
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (iterations == 0) {
      val out = deg.select(col("src").as("node"), lit(1.0).as("pr"))
      Seq(und, deg).foreach(_.unpersist()) // lazy out recomputes from source
      return out
    }
    // The iterate carries (node, outdeg, pr): attaching outdeg once per
    // round on the NODE-sized table (below, pre-checkpoint) replaces a
    // second EDGE-sized join inside every contribution pass. And because
    // `und` is symmetric, every node has outdeg >= 1 AND indegree >= 1,
    // so the mass sum covers exactly the node set — the old
    // nodes LEFT JOIN sums (with coalesce(in_mass, 0)) was a bijective
    // no-op and is dropped outright: two fewer joins per iteration, one
    // of them edge-sized. Emitted ranks are bit-identical (same quantized
    // op sequence per node).
    var pr = deg.select(col("src").as("node"), col("outdeg"),
      lit(1.0).as("pr"))
    var release: () => Unit = () => ()
    for (i <- 1 to iterations) {
      val contrib = und
        .join(pr, und("src") === pr("node"))
        .select(col("dst"),
          (floor(col("pr") / col("outdeg") * Q) / lit(Q.toDouble)).as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val ranked = sums.select(col("dst").as("node"),
        (lit(1.0 - damping) + lit(damping) * col("in_mass")).as("pr"))
      // tracked eager checkpoint: one action materializes the iteration
      // AND caps lineage; the previous iterate's blocks are freed
      // deterministically (Checkpoints.tracked) instead of waiting on
      // the context cleaner's next GC. The last round skips the outdeg
      // attach — nothing consumes it.
      val withDeg = if (i < iterations)
        ranked.join(deg, ranked("node") === deg("src"))
          .select(col("node"), col("outdeg"), col("pr"))
      else ranked
      val (next, releaseNext) = Checkpoints.tracked(withDeg)
      release()
      pr = next
      release = releaseNext
    }
    Seq(und, deg).foreach(_.unpersist())
    pr.select(col("node"), col("pr"))
  }

  /** Driver-side reference implementation with the identical quantized
    * arithmetic — used by the spec as ground truth on small graphs. */
  private[graft] def reference(edges: Seq[(String, String)],
      iterations: Int, damping: Double = 0.85): Map[String, Double] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = deg.keySet
    var pr = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iterations) {
      val mass = und.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) =>
          math.floor(pr(u) / deg(u) * Q) / Q.toDouble
        }.sum
      }
      pr = nodes.map(v => v -> ((1.0 - damping) +
        damping * mass.getOrElse(v, 0.0))).toMap
    }
    pr
  }
}
