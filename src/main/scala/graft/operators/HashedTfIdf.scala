package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hashed TF-IDF document vectors (feature hashing, Weinberger et al.
  * 2009) + cosine retrieval — full-text semantic-ish search with NO
  * external model: tokens hash into `dim` buckets, weights are
  * tf·idf at bucket granularity, similarity is the cosine of the
  * sparse weight tables. The bridge between the text layer and the
  * ANN/retrieval layer: BM25 ranks against a query string, this ranks
  * document-to-document.
  *
  * Engine-exact discipline (hash-matches the DuckDB replay):
  *  - bucket = portable md5 hash of the token, mod dim;
  *  - tf_b is an exact integer count; df_b an exact distinct count;
  *  - idf = ln(N/df_b) is the ONE transcendental, floor-quantized to
  *    2^-10 (so weight = tf_b · lnq_b stays an exact integer and dots /
  *    norms stay exact integer sums);
  *  - cosine = dot / (√normA·√normB) is two IEEE sqrts + one division
  *    + one multiply on identical operands, floor-quantized to 2^-20.
  *
  * Scale shape: tokenize+hash is map-side; the (id, bucket) count is
  * the only corpus shuffle; the idf table is `dim` rows (broadcast).
  * Retrieval here is the exact brute-force baseline (pairs via the
  * bucket join) — the production-scale path for big query sets is the
  * [[Similarity]] SRP-LSH/IVF family over these same vectors.
  */
object HashedTfIdf {

  private val LnQuant = 1L << 10
  private val SimQuant = 1L << 20

  /** Per-(id, bucket) exact-integer tf·idf weights. */
  def weights(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col("__id"),
        (Sketches.portableHash32(col("__w")) % dim).as("b"))
      .groupBy(col("__id"), col("b"))
      .agg(count(lit(1)).as("tf"))
    val n = docs.agg(countDistinct(col(idCol)).as("__n"))
    val idf = tf.groupBy(col("b")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("b"),
        floor(log(col("__n").cast("double") / col("df").cast("double"))
          * LnQuant).cast("long").as("lnq"))
    tf.join(broadcast(idf), Seq("b"))
      .select(col("__id").as(idCol), col("b"),
        (col("tf") * col("lnq")).as("w"))
  }

  /** Exact cosine top-k of `corpus` weight rows for each query doc's
    * weight rows (both from [[weights]]): quantized similarity, ties to
    * the smaller corpus id, rank via WindowGroupLimit.
    * `broadcastQueries` (default true) hints the query-side norms as a
    * broadcast — correct for the fixed-small-query-workload shape;
    * pass false for large query sets (or route those through the
    * [[Similarity]] LSH/IVF family instead of this exact baseline). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      k: Int, broadcastQueries: Boolean = true): DataFrame = {
    def norms(w: DataFrame) = w.groupBy(col(idCol))
      .agg(sum(col("w") * col("w")).as("n2"))
    val cn = norms(corpus)
    val qn = norms(queries)
    val dots = queries.select(col(idCol).as("qid"), col("b"), col("w").as("wq"))
      .join(corpus.select(col(idCol).as("did"), col("b"), col("w").as("wd")),
        Seq("b"))
      .groupBy(col("qid"), col("did"))
      .agg(sum(col("wq") * col("wd")).as("dot"))
    val sim = floor(col("dot").cast("double") /
      (sqrt(col("qn2").cast("double")) * sqrt(col("cn2").cast("double")))
      * SimQuant).cast("long")
    val qnSide = qn.select(col(idCol).as("qid"), col("n2").as("qn2"))
    dots
      .join(if (broadcastQueries) broadcast(qnSide) else qnSide, Seq("qid"))
      .join(cn.select(col(idCol).as("did"), col("n2").as("cn2")), Seq("did"))
      .filter(col("qn2") > 0 && col("cn2") > 0)
      .select(col("qid"), col("did"), sim.as("simq"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("simq").desc, col("did"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("did"), col("simq"), col("rk"))
  }
}
