package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection by iterated neighbor-majority vote. In a training-data
  * pipeline this is the cheap clustering pass over near-dup candidate
  * graphs: LSH edges in, cluster ids out, no model to train. The
  * reference ships the same algorithm in its Gelly library
  * (flink-libraries/flink-gelly/.../LabelPropagation.java); this is the
  * Spark-first re-expression as iterated relational aggregation.
  *
  * Determinism: each node starts with label = its own id; every
  * iteration a node adopts the most frequent label among its neighbors,
  * ties broken to the SMALLEST label (the reference's Gelly impl keeps
  * the highest — either rule works, what matters is that it's total).
  * A fixed iteration count and the total tie order make the output a
  * pure function of the graph, so the DuckDB oracle replays every
  * iteration as chained CTEs and hash-matches labels exactly. All
  * arithmetic is integral — no float discipline needed at all.
  *
  * Scale shape: the undirected edge list is built, hash-partitioned on
  * src, and persisted ONCE. Each iteration is join(edges, labels) →
  * count by (dst, label) → argmax by dst; both aggregations are
  * partial-aggregate (map-side combine) friendly, and the argmax is a
  * single `max(struct(cnt, -label))` — no window sort. Per-iteration
  * cost is one join plus two combinable shuffles of the label table
  * (the big edge table never re-shuffles); labels materialize via eager
  * localCheckpoint so lineage stays O(1) in the iteration count.
  */
object LabelPropagation {

  /** Undirected LPA over `edges`. Node ids must be nonnegative
    * integrals (the argmax negates labels for the min-tie-break;
    * namespace ids that can collide, e.g. 2*part vs 2*supp+1).
    * Returns (node, label). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var release: () => Unit = () => ()
    for (_ <- 1 to iterations) {
      val (next, releaseNext) = Checkpoints.tracked(
        und.join(lab, und("src") === lab("node"))
          .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
          // argmax(cnt, then min label): max over (cnt, -label) pairs
          .groupBy(col("dst"))
          .agg(max(struct(col("cnt"), negate(col("label")).as("nl"))).as("m"))
          .select(col("dst").as("node"), negate(col("m.nl")).as("label")))
      release() // previous iterate's blocks, freed deterministically
      lab = next
      release = releaseNext
    }
    und.unpersist()
    lab
  }

  /** Driver-side reference with the identical vote/tie rule — ground
    * truth for the spec on small graphs. */
  private[graft] def reference(edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nodes = und.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iterations) {
      lab = nodes.map { v =>
        val votes = und.filter(_._2 == v).map(e => lab(e._1))
          .groupBy(identity).view.mapValues(_.size)
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lab
  }
}
