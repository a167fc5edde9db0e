package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

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

  /** Auto-switch point for the vocabulary factorization: above this
    * many distinct tokens the per-bucket distributed rank replaces the
    * single-task global sort (measured crossover region; the exact
    * value only matters within ~2×). */
  val DistributedVocabThreshold: Long = 1000000L

  // ---- oversized-vocab visibility on the lazy sort path ----
  // The default factorization is the lazy single-task sort (no job at
  // construction), so a vocabulary past the distributed crossover is a
  // silent bottleneck. An `observe` metric rides the query's own
  // execution (zero extra jobs, plan unchanged below the window) and a
  // one-time QueryExecutionListener logs the regression when it fires.
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0)
  private val listenerSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        java.lang.Boolean]()))
  private[operators] val warnedVocab =
    new java.util.concurrent.atomic.AtomicLong(-1L) // test observability

  private def observeVocab(dfreq: DataFrame): DataFrame = {
    val spark = dfreq.sparkSession
    if (listenerSessions.add(spark)) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("graft_setsim_vocab_") && !row.isNullAt(0)) {
                val n = row.getLong(0)
                if (n > DistributedVocabThreshold) {
                  warnedVocab.set(n)
                  log.warn(
                    s"SetSimJoin: vocabulary of $n distinct tokens exceeds " +
                      s"the single-task sort crossover ($DistributedVocabThreshold); " +
                      "set spark.graft.setSimJoin.vocab=distributed (or pass " +
                      "distributedVocab=Some(true)) to avoid the sort bottleneck")
                }
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
    dfreq.observe(s"graft_setsim_vocab_${obsCounter.incrementAndGet()}",
      count(lit(1)).as("n"))
  }

  /** All unordered pairs of `docs` ids whose token sets have
    * Jaccard >= tau. `tokensCol` is an array column (dedup'd
    * internally). Returns (id_a, id_b, inter, union_n, jaccard),
    * id_a < id_b. */
  def jaccardJoin(docs: DataFrame, idCol: String, tokensCol: String, tau: Double): DataFrame =
    jaccardJoinTokens(
      docs.select(col(idCol).as("id"), explode(col(tokensCol)).as("token")),
      "id", "token", tau)

  /** Same join over PRE-EXPLODED (id, token) rows — the fast path when
    * tokens come from a generator (e.g. graft.functions.NGrams): one
    * native pass per row instead of building a per-doc array with
    * interpreted higher-order functions, whose lambda-inlined
    * expression trees re-evaluate the tokenizer per element. */
  def jaccardJoinTokens(tok0: DataFrame, idCol: String, tokenCol: String,
      tau: Double, maxBucket: Int = 10000,
      distributedVocab: Option[Boolean] = None): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
    // No explicit persist on the shared tables (measured, r14): the
    // multiply-consumed subtrees below (tok, tokI, docToks) all end in
    // an exchange, and AQE's runtime stage reuse already computes each
    // identical exchange once per run — an added MEMORY_AND_DISK
    // persist only paid the columnar-cache conversion (isolated A/B:
    // neutral-to-slower, medians 4.75 s vs 4.28 s) while at 100 TB it
    // would cache a corpus-sized token table for no avoided pass.
    val tok = tok0
      .select(col(idCol).as("id"), col(tokenCol).as("token"))
      .distinct()
    val dfreq0 = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // Factorization selection. The plan shape depends on the
    // vocabulary size, which only a job can measure — so by DEFAULT
    // construction stays lazy (EXPLAIN/audit flows run no job) and the
    // single-task sort is used; the measured auto-switch is opt-in via
    // conf `spark.graft.setSimJoin.vocab`:
    //  - "sort" (default): global row_number; correct at any size,
    //    single-task vocabulary sort — fine up to ~10^6 tokens.
    //  - "distributed": per-bucket rank; pay ~2 extra shuffles, scale
    //    past one task's sort budget. Set this for web-scale shingle
    //    spaces.
    //  - "probe": restore the eager auto-switch — ONE job (checkpoint
    //    + count of the token-frequency table) at construction picks
    //    the path; the checkpoint is then shared with the rank scan.
    // Callers that know their vocabulary pass Some(...) and skip all
    // of this.
    val (dfreq, useDistributed) = distributedVocab match {
      case Some(dv) => (dfreq0, dv)
      case None =>
        tok0.sparkSession.conf
          .getOption("spark.graft.setSimJoin.vocab").getOrElse("sort") match {
          case "sort" => (dfreq0, false)
          case "distributed" => (dfreq0, true)
          case "probe" =>
            val d = dfreq0.localCheckpoint(true)
            (d, d.count() > DistributedVocabThreshold)
          case other => throw new IllegalArgumentException(
            s"spark.graft.setSimJoin.vocab must be sort|distributed|probe, got '$other'")
        }
    }
    // factorize tokens to dense int ids ordered by (string): bijective,
    // so every downstream set op is EXACT, while candidate buckets and
    // verification arrays carry 4-byte ints instead of shingle strings.
    // Ordering by (df, tid) == (df, token) because tid is
    // token-ascending, so the prefix order is unchanged.
    //
    // Two physically different, value-identical factorizations
    // (auto-selected on vocabulary size unless the caller forces one):
    //  - small vocab: one global row_number window. The vocabulary sort
    //    runs on a single task — MEASURED faster up to ~10^6 tokens
    //    (at sf0.1's 27k-shingle vocab the sort is 0.5s; the
    //    distributed variant's two extra shuffles + broadcast cost
    //    ~1.7s more end-to-end).
    //  - distributed: per-bucket rank + cumulative bucket offsets
    //    (bucket = first token char, a PREFIX of the sort key, so
    //    concatenating bucket-local ranks in bucket order IS the global
    //    token order); only the alphabet-sized offset table touches a
    //    single task. Flip this on when the vocabulary itself is beyond
    //    one executor's sort budget (web-scale shingle spaces); widen
    //    the bucket to 2-3 chars if one leading char still skews.
    val vocab =
      if (!useDistributed)
        observeVocab(dfreq).withColumn("tid",
          row_number().over(Window.orderBy(col("token"))))
      else {
        val bucketed = dfreq.withColumn("b", substring(col("token"), 1, 1))
        val offsets = bucketed.groupBy(col("b")).agg(count(lit(1)).as("bn"))
          .withColumn("off", coalesce(
            sum(col("bn")).over(Window.orderBy(col("b"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("b"), col("off"))
        bucketed
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("b")).orderBy(col("token"))))
          .join(broadcast(offsets), "b")
          .withColumn("tid", (col("off") + col("rn")).cast("int"))
          .select(col("token"), col("df"), col("tid"))
      }
    val tokI = tok.join(vocab, "token").select(col("id"), col("tid"), col("df"))
    // set size and prefix rank from ONE pass over the same id-keyed
    // window: count(*) over the partition IS the old `sz` table, so the
    // separate groupBy(id) aggregation and its join are gone — one
    // exchange on id instead of an aggregation exchange plus a
    // sort-merge join. (The explicit isNotNull matches the inner join's
    // null-key drop; a window partition would otherwise keep null ids.)
    val wId = Window.partitionBy(col("id"))
    val prefix = tokI
      .withColumn("n", count(lit(1)).over(wId))
      .withColumn("rn",
        row_number().over(wId.orderBy(col("df"), col("tid"))))
      .filter(col("rn") <= col("n") - ceil(lit(tau) * col("n")) + lit(1) &&
        col("id").isNotNull)
      .select(col("id"), col("tid"))
    // candidate pairs per prefix-token bucket (the TextDedup.minhashLsh
    // shape): ONE aggregation + a bounded pair expansion per bucket —
    // no second computation of the prefix table for a self-join's other
    // side. Bucket sizes are small BY CONSTRUCTION (prefixes exclude
    // frequent tokens); `maxBucket` is the same quadratic-blowup guard
    // as TextDedup.lshCandidates for a corpus that violates that (a
    // capped bucket trades recall for survival, exactly like LSH —
    // leave it above the corpus' max prefix df for exact results).
    val cand = prefix
      .groupBy(col("tid")).agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    // verification: per-doc SORTED int arrays (broadcast-joined onto the
    // candidates) + one native merge-intersect per pair — not a
    // token-level join (re-shuffles |cand| * avg_set rows), not
    // array_intersect (builds a per-row hash set + result array; ~10x
    // slower than the merge at candidate volume)
    // doc-sized sorted-array table; both verification-join sides read
    // the same aggregate exchange (AQE stage reuse — see note on `tok`)
    val docToks = tokI.groupBy(col("id"))
      .agg(sort_array(collect_list(col("tid"))).as("toks"), count(lit(1)).as("n"))
    val interCnt = ColumnBridge.column(graft.functions.SortedIntersectCount(
      ColumnBridge.expression(col("ta")), ColumnBridge.expression(col("tb"))))
    cand
      .join(docToks.select(col("id").as("id_a"), col("toks").as("ta"), col("n").as("na")), "id_a")
      .join(docToks.select(col("id").as("id_b"), col("toks").as("tb"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        interCnt.cast("long").as("inter"),
        col("na"), col("nb"))
      .select(
        col("id_a"), col("id_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_n"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
