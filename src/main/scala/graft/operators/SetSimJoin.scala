package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join (all pairs with Jaccard >= tau) with
  * AllPairs prefix filtering — Bayardo, Ma & Srikant 2007 ("Scaling up
  * all pairs similarity search"); the filter inside PPJoin
  * (Xiao et al. 2008). This is the exact counterpart to the
  * MinHash-LSH candidate path in [[TextDedup]]: LSH trades recall for
  * speed; prefix filtering keeps EXACT results while still avoiding the
  * all-pairs O(N^2) join.
  *
  * Principle: order all tokens by one global total order (ascending
  * document frequency, ties by token — rarest first, so prefixes land
  * in the emptiest buckets). If J(A,B) >= tau then
  * |A∩B| >= ceil(tau*|A|): the first common token in that order sits
  * within the first |A| - ceil(tau*|A|) + 1 tokens of A (at most
  * |A| - |A∩B| non-common tokens precede it), and symmetrically for B —
  * so joining only the PREFIXES of that length on token finds every
  * qualifying pair. Candidates are then verified with an exact
  * intersection count.
  *
  * Scale shape: token explode -> two lightweight aggregations (doc
  * frequency, set size) -> per-doc window rank -> self-join on PREFIX
  * tokens only (the frequent tokens that make the naive token self-join
  * quadratic are exactly the ones prefixes exclude) -> verification
  * join proportional to candidates, not pairs. Every stage is a plain
  * shuffle on token or doc id; no driver state. Skew note: a token
  * shared by k prefixes yields k^2/2 candidate rows; at web scale cap
  * bucket sizes like TextDedup.maxBucket or raise tau.
  */
object SetSimJoin {

  /** All unordered pairs of `docs` ids whose token sets have
    * Jaccard >= tau. `tokensCol` is an array column (dedup'd
    * internally). Returns (id_a, id_b, inter, union_n, jaccard),
    * id_a < id_b. */
  def jaccardJoin(docs: DataFrame, idCol: String, tokensCol: String, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    val tok = docs
      .select(col(idCol).as("id"), explode(col(tokensCol)).as("token"))
      .distinct()
    val sz = tok.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val prefix = tok
      .join(dfreq, "token")
      .join(sz, "id")
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("df"), col("token"))))
      .filter(col("rn") <= col("n") - ceil(lit(tau) * col("n")) + lit(1))
      .select(col("id"), col("token"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.token") === col("b.token") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val inter = cand
      .join(tok.as("ta"), col("id_a") === col("ta.id"))
      .join(tok.as("tb"), col("id_b") === col("tb.id") && col("ta.token") === col("tb.token"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sz.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .select(
        col("id_a"), col("id_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_n"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
