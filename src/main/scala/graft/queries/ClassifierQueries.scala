package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.QualityClassifier
import Q._

/** Distributed quality-classifier training + scoring
  * ([[graft.operators.QualityClassifier]]) — hash-oracled END TO END:
  * the DuckDB oracle replays feature hashing (FNV-1a -> splitmix64 ->
  * power-of-two bucket), the one-pass integer Gram moments, all 160
  * fixed-point ridge-GD steps as chained CTEs (the q_kmeans /
  * q_pca_project replay discipline applied to model TRAINING), and the
  * exact integer scores. The training labels distill a rule (docs
  * mentioning 'spark' but not 'slow') — standing in for human labels /
  * an upstream teacher, exactly how DCLM-style fastText quality
  * filters are bootstrapped.
  */
object ClassifierQueries {

  private val Dim = 32
  private val Iters = 160
  // Operator default; satisfies the documented sufficient stability
  // bound (dim+1)/2^etaShift < 2 (33/64 < 2 — etaShift=4 did not).
  private val EtaShift = 6
  private val LambdaFx = 1024L
  private val Scale = 1L << 20

  /** DuckDB replay of the full train+score chain (see object doc). */
  private val qcOracle: String = {
    val D = DuckHash
    val d1 = Dim + 1
    val steps = (1 to Iters).map { t =>
      val prev = if (t == 1) "w0" else s"w${t - 1}"
      s"""w$t AS (SELECT list_transform(generate_series(1, $d1), i ->
           w[i] - CAST(floor((CAST(floor(CAST(list_sum(
             list_transform(generate_series(1, $d1), j -> A[i][j] * w[j]))
             AS DOUBLE) / $Scale) AS BIGINT) - b[i])
             / ${1L << EtaShift}.0) AS BIGINT)) AS w
         FROM $prev, amat, bvec)"""
    }.mkString(",\n      ")
    s"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents),
      u AS (SELECT doc_id, list_transform(words, wd ->
          ${D.fnv("list_transform(generate_series(1, length(wd))," +
            " i -> CAST(unicode(wd[i]) AS UBIGINT))")}) AS fnv FROM w),
      lab AS (SELECT doc_id,
          CASE WHEN list_contains(words, 'spark')
            AND NOT list_contains(words, 'slow')
          THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y FROM w),
      z0 AS (SELECT doc_id, fnv AS z FROM u),
      ${D.mixStages("z0")},
      bk AS (SELECT doc_id,
          list_transform(z, x -> xor(x, x >> 31) % $Dim) AS bk FROM m3),
      feat AS (SELECT doc_id, list_transform(generate_series(0, ${Dim - 1}),
            b -> CASE WHEN list_contains(bk, CAST(b AS UBIGINT))
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
          || [CAST(1 AS BIGINT)] AS x FROM bk),
      fx AS (SELECT f.doc_id, x, y FROM feat f JOIN lab USING (doc_id)),
      nn AS (SELECT COUNT(*) AS n FROM fx),
      am AS (SELECT i, j, SUM(x[i+1] * x[j+1]) AS a
          FROM fx, generate_series(0, $Dim) g1(i),
            generate_series(0, $Dim) g2(j)
          GROUP BY 1, 2),
      bm AS (SELECT i, SUM(x[i+1] * y) AS b
          FROM fx, generate_series(0, $Dim) g1(i) GROUP BY 1),
      ah AS (SELECT i, j,
          CAST(floor(CAST(a AS DOUBLE) * $Scale / n) AS BIGINT)
            + CASE WHEN i = j THEN $LambdaFx ELSE 0 END AS a
          FROM am, nn),
      arow AS (SELECT i, list(a ORDER BY j) AS r FROM ah GROUP BY i),
      amat AS (SELECT list(r ORDER BY i) AS A FROM arow),
      bvec AS (SELECT list(
            CAST(floor(CAST(b AS DOUBLE) * $Scale / n) AS BIGINT)
            ORDER BY i) AS b FROM bm, nn),
      w0 AS (SELECT list_transform(generate_series(1, $d1),
          q -> CAST(0 AS BIGINT)) AS w),
      $steps
      SELECT f.doc_id,
        CAST(list_sum(list_transform(generate_series(1, $d1),
          i -> w[i] * x[i])) AS BIGINT) AS score_fx,
        CAST(list_sum(list_transform(generate_series(1, $d1),
          i -> w[i] * x[i])) AS BIGINT) > 0 AS pred,
        f.y
      FROM fx f, w$Iters"""
  }

  val defs: Seq[QueryDef] = Seq(

    // Train on the full table (the rule label rides along), score every
    // row with the exact integer margin. rows = documents; columns:
    // doc_id, score_fx (fixed-point margin at 2^20), pred, y.
    QueryDef("q_quality_classifier_train", (s, dir) => {
      val docs = fanOut(t(s, dir, "documents")) // gram moments per row (§2.5 guard)
        .withColumn("words", split(col("text"), " "))
        .withColumn("y", when(array_contains(col("words"), "spark") &&
          !array_contains(col("words"), "slow"), 1L).otherwise(-1L))
      val model = QualityClassifier.fitExact(docs, "text", "y",
        dim = Dim, iters = Iters, etaShift = EtaShift,
        lambdaFx = LambdaFx, scale = Scale)
      docs.select(col("doc_id"),
        QualityClassifier.score(col("text"), model).as("score_fx"),
        col("y"))
        .withColumn("pred", col("score_fx") > 0)
        .select(col("doc_id"), col("score_fx"), col("pred"), col("y"))
    }, Some(qcOracle))
  )
}
