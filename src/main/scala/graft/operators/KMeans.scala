package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) over an embedding column —
  * the clustering primitive behind cluster-balanced corpus curation
  * (SemDeDup-style "cluster, then act per cluster"; Abbas et al. 2023)
  * and the DCLM-style cluster-cap sampling recipe.
  *
  * The reference has no clustering operator; this is the training-data
  * extension surface. Related in-repo machinery: [[Similarity]] trains
  * k-means on a BOUNDED DRIVER SAMPLE to seed IVF cells (fine for an
  * index, where centroid quality is a recall knob). This operator is the
  * full distributed fit: every Lloyd round scans the WHOLE corpus.
  *
  * Engine-exact by construction, so the assignment table hash-matches a
  * DuckDB replay (same discipline as the 2^-20-quantized PageRank):
  *  - vectors are quantized once to integer grid points
  *    (`floor(x*scale + 0.5)` as BIGINT — identical in both engines);
  *  - distances are integer squared-L2 (exact, order-free);
  *  - argmin ties break on the smaller centroid id;
  *  - centroid updates are exact integer sums re-quantized with ONE
  *    double division + floor (`floor(sum/cnt)` — both sums < 2^53, so
  *    the division is the same double op on any engine);
  *  - seeds are the k rows with the smallest portable md5 hash of the id
  *    (uniform spread, no RNG, replayable in SQL).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the quantized corpus is computed once and persisted; each round is
  *    ONE scan of it;
  *  - assignment is a pure map-side projection (centroids ride inside
  *    the expression as literals — k*dim longs, broadcast-free);
  *  - the update aggregates (cell, pos) partial sums with map-side
  *    combine, so the shuffle is O(partitions * k * dim) rows, never the
  *    corpus;
  *  - driver state is exactly the model: k*dim longs per round.
  */
object KMeans {

  /** Quantize a float/double vector column to integer grid points. */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec.cast("array<double>"),
      x => floor(x * lit(scale) + lit(0.5)).cast("long"))

  /** Integer squared L2 between a quantized vector column and a constant
    * centroid (exact: no floating point anywhere). */
  private def sqDist(vq: Column, centroid: Array[Long]): Column =
    aggregate(
      zip_with(vq, typedLit(centroid.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** `(dist, cluster)` of the nearest centroid: array argmin — ties go
    * to the first (= smallest, the list is sorted) cluster id. */
  private def nearest(vq: Column,
      centroids: Seq[(Int, Array[Long])]): (Column, Column) = {
    val dists = array(centroids.map { case (_, c) => sqDist(vq, c) }: _*)
    val d = array_min(dists)
    val cid = element_at(typedLit(centroids.map(_._1)),
      array_position(dists, d).cast("int"))
    (d, cid)
  }

  /** Fitted model: per-row assignment, the final centroid table, and
    * the quantization grid the centroids live on (assignment of new
    * data MUST quantize at the same scale). */
  final case class Model(
      assignments: DataFrame,              // (idCol, cluster, dist)
      centroids: Seq[(Int, Array[Long])],  // quantized grid points
      scale: Int)

  /** Run `iters` full Lloyd rounds (assign + update), then return the
    * assignment under the final centroids. Cells that receive no points
    * in an update round are dropped (the standard dead-centroid rule),
    * so the result can have fewer than `k` live clusters.
    *
    * k bound: the assignment expression inlines one distance fold per
    * centroid, which is the right shape up to k ≈ a few hundred (the
    * curation use cases). For k in the thousands use the IVF route
    * ([[Similarity]]'s `nearestCentroid` native expression) — same
    * math, single array-literal scan per row instead of k folds.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Int = 1024): Model = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val id = col(idCol)
    val xq = df.select(id.as("__id"), quantize(col(vecCol), scale).as("__vq"))
      .persist()
    try {
      // Seeds: k rows with the smallest portable hash (TakeOrdered — k
      // rows to the driver, bounded model state).
      var centroids: Seq[(Int, Array[Long])] =
        xq.orderBy(Sketches.portableHash32(col("__id")), col("__id"))
          .limit(k).collect().zipWithIndex.map { case (r, i) =>
            i -> r.getSeq[Long](1).toArray
          }.toSeq
      require(centroids.nonEmpty, "KMeans.fit: corpus has no rows")
      val dim = centroids.head._2.length

      for (_ <- 1 to iters) {
        // One corpus scan: map-side nearest + (cell, pos) partial sums.
        // assignment in its OWN projection below the explode: inside
        // the same select as posexplode the expression would re-run
        // once per exploded element (64x the work)
        val sums = xq
          .select(nearest(col("__vq"), centroids)._2.as("__c"), col("__vq"))
          .select(col("__c"), posexplode(col("__vq")).as(Seq("__p", "__v")))
          .groupBy(col("__c"), col("__p"))
          .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
          .collect() // bounded: live-cells * dim rows of model state
        centroids = sums.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
          case (cid, rows) =>
            val c = new Array[Long](dim)
            rows.foreach { r =>
              // floor(sum/cnt): both < 2^53, one exact double division.
              c(r.getInt(1)) =
                math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
            }
            cid -> c
        }
      }
      val (d, cid) = nearest(col("__vq"), centroids)
      val out = xq
        .select(col("__id").as(idCol), cid.as("cluster"), d.as("dist"))
        .localCheckpoint(true) // assignments outlive the persist below
      Model(out, centroids, scale)
    } finally xq.unpersist()
  }

  /** Assignment projection for NEW data under a trained model:
    * `(cluster, dist)` columns — a pure zero-shuffle projection
    * (centroids ride inside the expression), so it runs unchanged in a
    * Structured Streaming query (streaming cluster routing). Takes the
    * Model so new data is quantized on the SAME grid the centroids
    * were fit on. */
  def assignCols(model: Model, vec: Column): (Column, Column) = {
    val (d, c) = nearest(quantize(vec, model.scale), model.centroids)
    (c, d)
  }

  /** Cluster-balanced cap: keep at most `cap` rows per cluster, chosen
    * by the deterministic portable-hash sample rank (a pure function of
    * the data — the DCLM-style "cluster then cap" curation step).
    * Compiles to WindowGroupLimit: map-side partial top-k per cluster
    * before the shuffle, so no executor ships more than `cap` rows per
    * cluster. */
  def capPerCluster(assignments: DataFrame, idCol: String, cap: Int): DataFrame =
    assignments
      .withColumn("__r",
        Sketches.sampleRank(Seq(col("cluster")), col(idCol)))
      .filter(col("__r") <= cap)
      .drop("__r")
}
