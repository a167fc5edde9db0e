package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up corpus synthesizer: writes a K× copy of a driver SF
  * directory so the heavy bench tail can be measured one decade above
  * the largest driver SF (the round-5 verdict's sf1 spot-check; the
  * driver only generates sf0.001/0.01/0.1). Replication is
  * STRUCTURE-PRESERVING, not naive row copy — naive duplication would
  * turn every document into a 10-way exact-duplicate group and blow
  * the near-dup pair count up quadratically, measuring a skew
  * pathology instead of scale:
  *
  *   - Every key column is offset by `replica * stride` (stride = that
  *     key domain's global max + 1), so joins stay consistent within a
  *     replica and replicas are disjoint — the part–supplier graph
  *     becomes K disjoint copies, exactly K× nodes and edges.
  *   - Document text gets a per-replica suffix on EVERY token
  *     (`w` → `w⦙i`), a bijection on word n-gram shingles: within a
  *     replica all Jaccard similarities (planted near-dup pairs
  *     included) are preserved EXACTLY; across replicas shingle sets
  *     are disjoint, so the dedup workload scales K× linearly, as a
  *     K×-larger crawl would.
  *   - Embeddings are circularly rotated by `replica` positions — an
  *     orthogonal transform applied uniformly per replica, so all
  *     intra-replica dot products (and thus the near-dup/ANN geometry)
  *     are preserved exactly while cross-replica cosines decorrelate.
  *   - Dimension tables that no scaled key references (nation, region)
  *     copy through unchanged.
  *
  * Usage: sbt "runMain graft.ScaleData <inDir> <outDir> [K=10]"
  * then  SPARK_GRAFT_SF_DIR=<outDir> sbt "runMain graft.Bench q_..."
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val (inDir, outDir) = (args(0), args(1))
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-data")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try write(spark, inDir, outDir, k)
    finally spark.stop()
  }

  def write(spark: SparkSession, inDir: String, outDir: String,
      k: Int): Unit = {
    def in(name: String): DataFrame =
      graft.core.Tables.load(spark, inDir, name)

    // one tiny driver-side stride table: max key per domain (+1)
    def strideOf(pairs: (DataFrame, String)*): Long =
      pairs.map { case (df, c) =>
        df.agg(max(col(c))).head().getLong(0)
      }.max + 1

    val (li, ord, cust, docs, emb, ev, part, supp) =
      (in("lineitem"), in("orders"), in("customer"), in("documents"),
        in("embeddings"), in("events"), in("part"), in("supplier"))

    val partS = strideOf(part -> "p_partkey", li -> "l_partkey")
    val suppS = strideOf(supp -> "s_suppkey", li -> "l_suppkey")
    val orderS = strideOf(ord -> "o_orderkey", li -> "l_orderkey")
    val custS = strideOf(cust -> "c_custkey", ord -> "o_custkey")
    val docS = strideOf(docs -> "doc_id")
    val vecS = strideOf(emb -> "vec_id")
    val eventS = strideOf(ev -> "event_id")
    val userS = strideOf(ev -> "user_id")

    /** K-amplify: each input row crossed with replica ids 0..K-1, key
      * columns offset, payload columns optionally transformed. The
      * range side is a K-row local relation — Spark broadcasts it, so
      * amplification is a zero-shuffle map-side explode. */
    def amplify(df: DataFrame, offsets: Map[String, Long],
        transforms: Map[String, Column => Column] = Map.empty): DataFrame = {
      val reps = spark.range(k).toDF("__rep")
      df.crossJoin(broadcast(reps))
        .select(df.columns.map { c =>
          val base = col(c)
          offsets.get(c).map(s => (base + col("__rep") * s).as(c))
            .orElse(transforms.get(c).map(f => f(base).as(c)))
            .getOrElse(base)
        }.toIndexedSeq: _*)
    }

    def out(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    out(amplify(li, Map("l_orderkey" -> orderS, "l_partkey" -> partS,
      "l_suppkey" -> suppS)), "lineitem")
    out(amplify(ord, Map("o_orderkey" -> orderS, "o_custkey" -> custS)),
      "orders")
    out(amplify(cust, Map("c_custkey" -> custS)), "customer")
    out(amplify(part, Map("p_partkey" -> partS)), "part")
    out(amplify(supp, Map("s_suppkey" -> suppS)), "supplier")
    out(amplify(ev, Map("event_id" -> eventS, "user_id" -> userS)),
      "events")
    // token-suffix bijection on shingles; replica 0 keeps the original
    out(amplify(docs, Map("doc_id" -> docS), Map(
      "text" -> (t => when(col("__rep") === 0, t).otherwise(
        regexp_replace(t, lit("(\\S+)"),
          concat(lit("$1⦙"), col("__rep")))))))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")
    // circular rotation = per-replica orthogonal transform
    out(amplify(emb, Map("vec_id" -> vecS), Map(
      "embedding" -> (e => {
        val dim = size(e)
        val rot = pmod(col("__rep"), dim)
        when(rot === 0, e).otherwise(
          concat(slice(e, (rot + 1).cast("int"), (dim - rot).cast("int")),
            slice(e, lit(1), rot.cast("int"))))
      }))), "embeddings")
    Seq("region", "nation").foreach(n => out(in(n), n))
  }
}
