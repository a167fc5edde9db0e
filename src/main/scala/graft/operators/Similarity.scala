package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane LSH bucketed variant as the scale path.
  *
  * Vector math uses `zip_with`/`aggregate` higher-order expressions —
  * native Catalyst, evaluated in index order (so the double accumulation
  * is deterministic and engine-comparable), no UDF serialization.
  *
  * Scale shape: brute force broadcasts the (small) query set against the
  * corpus — one pass, no corpus shuffle, partial top-k per partition
  * (WindowGroupLimit) before the final per-query merge. The LSH variant
  * buckets the corpus once (linear) and probes only matching buckets —
  * sign-random-projection (Charikar 2002, public algorithm).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native single-pass expression
    * (graft.functions.CosineSim); accumulates in index order so results
    * are bit-identical to the declarative dot/norm formulation. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Exact top-k by cosine for each query vector.
    *
    * @param corpus  (idCol, vecCol) table — the big side, never shuffled
    *                until the per-query top-k reduction
    * @param queries (qidCol, qvecCol) table — small, broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), round(col("sim"), 6).as("sim"),
        col("rank"))
  }

  /** Sign-random-projection bucket id for one hash table: `planes` sign
    * bits packed into a long — native one-pass expression
    * (graft.functions.SrpBucket). */
  def srpBucket(vec: Column, dim: Int, planes: Int, seed: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.SrpBucket(
      ColumnBridge.expression(vec), dim, planes, seed))
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer splits the
    * corpus into `nlist` cells; queries probe the `nprobe` nearest cells
    * and re-rank exactly within them — the FAISS-style scale path for
    * billion-vector search (public technique, Jégou et al. 2011).
    *
    * Training runs Lloyd's iterations with DataFrame ops; centroids are
    * tiny (nlist × dim) so they live on the driver and broadcast — the
    * corpus is only ever scanned, never shuffled. Deterministic:
    * centroids init from evenly-strided corpus rows.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, qvecCol: String,
      k: Int, dim: Int, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count()
    // deterministic strided init
    val init = corpus.select(col(idCol), col(vecCol))
      .withColumn("__rn", row_number().over(
        Window.orderBy(col(idCol))))
      .filter(pmod(col("__rn"), lit(math.max(n / nlist, 1))) === 1)
      .limit(nlist)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    var centroids: Array[Array[Float]] = init

    def centroidDf(cs: Array[Array[Float]]): DataFrame =
      cs.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("__cell", "__centroid")

    def assigned(df: DataFrame, vec: String): DataFrame = {
      // nearest centroid per row: min euclidean == max dot for unit-ish
      // vectors; use full L2 via cosine-free dot arithmetic
      val withCells = df.crossJoin(broadcast(centroidDf(centroids)))
        .withColumn("__dist", -dot(col(vec), col("__centroid")) * 2 +
          dot(col("__centroid"), col("__centroid")))
      val w = Window.partitionBy(df.columns.map(col): _*)
        .orderBy(col("__dist"), col("__cell"))
      withCells.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .drop("__r", "__dist", "__centroid")
    }

    for (_ <- 0 until iters) {
      val assign = assigned(corpus.select(col(idCol), col(vecCol)), vecCol)
      val updated = assign.groupBy(col("__cell"))
        .agg(collect_list(col(vecCol)).as("__vs"))
        .select(col("__cell"),
          expr(s"""transform(sequence(0, ${dim - 1}), d ->
            aggregate(__vs, CAST(0.0 AS DOUBLE),
              (acc, v) -> acc + CAST(v[d] AS DOUBLE)) / size(__vs))""")
            .as("__mean"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Double](1).map(_.toFloat).toArray).toMap
      centroids = centroids.indices
        .map(i => updated.getOrElse(i, centroids(i))).toArray
    }

    // index: corpus rows tagged with their cell
    val indexed = assigned(corpus.select(col(idCol), col(vecCol)), vecCol)
    // queries probe their nprobe nearest cells
    val qCells = queries.select(col(qidCol), col(qvecCol))
      .crossJoin(broadcast(centroidDf(centroids)))
      .withColumn("__dist", -dot(col(qvecCol), col("__centroid")) * 2 +
        dot(col("__centroid"), col("__centroid")))
    val wq = Window.partitionBy(col(qidCol))
      .orderBy(col("__dist"), col("__cell"))
    val probes = qCells.withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("__cell"))
    val cands = indexed.join(broadcast(probes), Seq("__cell"))
      .filter(col(idCol) =!= col(qidCol))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol))
    cands.withColumn("sim", cosine(col(vecCol), col(qvecCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), round(col("sim"), 6).as("sim"),
        col("rank"))
  }

  /** Explode a vector table into (row, tableIdx, bucket) across `tables`
    * independent hash tables (distinct hyperplanes per table). */
  private def bucketed(df: DataFrame, vecCol: String, dim: Int,
      planes: Int, tables: Int): DataFrame =
    df.select(col("*"),
      posexplode(array((0 until tables).map(t =>
        srpBucket(col(vecCol), dim, planes, t)): _*))
        .as(Seq("tbl", "bucket")))

  /** ANN via SRP-LSH: candidates = same bucket in any hash table, then
    * exact cosine re-rank within candidates. Recall grows with `tables`;
    * cost stays linear in corpus size (no cross join). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, qvecCol: String,
      k: Int, dim: Int, planes: Int = 10, tables: Int = 6): DataFrame = {
    val c = bucketed(corpus.select(col(idCol), col(vecCol)),
      vecCol, dim, planes, tables)
    val q = bucketed(queries.select(col(qidCol), col(qvecCol)),
      qvecCol, dim, planes, tables)
      .withColumnRenamed("tbl", "qtbl").withColumnRenamed("bucket", "qbucket")
    val cands = c.join(broadcast(q),
        col("tbl") === col("qtbl") && col("bucket") === col("qbucket") &&
          col(idCol) =!= col(qidCol))
      .select(col(idCol), col(vecCol), col(qidCol), col(qvecCol))
      .distinct()
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol))
    cands.withColumn("sim", cosine(col(vecCol), col(qvecCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), round(col("sim"), 6).as("sim"),
        col("rank"))
  }
}
