package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based dataset splitting and sampling — the
  * reproducibility primitives of a training-data pipeline.
  *
  * At 100 TB, `df.sample()` / `randomSplit()` are the wrong tools: their
  * output depends on partitioning and rerun seeds, so a retried stage or
  * a repartitioned input silently changes which rows land in the train
  * set. The standard fix (used by every large corpus pipeline) is
  * content-addressed assignment: bucket each row by a cryptographic hash
  * of its stable key, then split/sample by bucket range. Properties:
  *
  *  - pure projection — zero shuffle, zero state, trivially parallel;
  *  - stable under repartitioning, retries, and incremental reruns
  *    (a new corpus drop assigns old rows to the same split);
  *  - different `seed` strings give independent assignments, so a
  *    holdout for experiment A doesn't correlate with experiment B's.
  *
  * Reference behavior: Flink exposes no dataset-split primitive (users
  * hand-roll the same md5-mod in SQL); this formalizes the idiom as an
  * operator. Hashing uses md5 (available and bit-identical in every
  * engine, so results are portable across Spark / DuckDB / Flink SQL).
  */
object DataSplit {

  /** Uniform bucket in [0, buckets) from the md5 of (key, seed).
    * First 8 hex chars → unsigned 32-bit value → mod. */
  def hashBucket(key: Column, buckets: Int, seed: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(seed))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Adds a `split` column: 'train' / 'val' / 'test' with the given
    * percentage weights (must sum to <= 100; remainder goes to test). */
  def assignSplit(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10, seed: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "train+val must be <= 100")
    val b = hashBucket(col(keyCol), 100, seed)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic ~pct% sample: keeps rows whose bucket falls below
    * `pct` of 10,000 basis points (0.01% resolution). */
  def sampleByHash(df: DataFrame, keyCol: String, pctBp: Int,
      seed: String = "sample"): DataFrame =
    df.filter(hashBucket(col(keyCol), 10000, seed) < pctBp)

  /** Deterministic mixture / domain reweighting: keep each row with its
    * source's target rate (basis points of 10,000; sources absent from
    * the map are dropped). The standard way a pretraining pipeline hits
    * a target domain mixture — same content-addressed stability as
    * [[sampleByHash]], rate lookup is a broadcast map literal, so the
    * whole op stays a zero-shuffle projection over the scan. */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
      ratesBp: Map[String, Int], seed: String = "mixture"): DataFrame =
    df.filter(hashBucket(col(keyCol), 10000, seed) <
      coalesce(element_at(typedlit(ratesBp), col(sourceCol)), lit(0)))

  /** Token-budget mixture planning: given a target token budget and
    * per-domain mixture weights, compute each domain's deterministic
    * sampling rate and apply it — the step that turns "2:1:1 web/code/
    * academic at 500 B tokens" into an actual per-row keep decision.
    *
    * rate(d) = min(1, budget * weight(d) / tokens(d)) — a domain with
    * fewer tokens than its allocation keeps everything (the shortfall is
    * NOT redistributed; callers who want renormalization can re-run with
    * adjusted weights, keeping the rule transparent and replayable).
    *
    * Scale shape: pass 1 is one aggregate over the corpus (per-domain
    * token totals, map-side combined); the tiny rate table is collected
    * to the driver (one row per domain — model state) and applied as a
    * zero-shuffle [[mixtureSample]]-style projection keyed by content
    * hash, so the plan stays deterministic under retries/repartition.
    * Weights need not sum to 1 — they are normalized here. */
  def tokenBudgetSample(df: DataFrame, keyCol: String, sourceCol: String,
      tokensCol: String, budget: Long, weights: Map[String, Double],
      seed: String = "budget"): DataFrame = {
    require(budget > 0 && weights.nonEmpty && weights.values.forall(_ >= 0),
      "budget must be positive, weights non-negative")
    val wSum = weights.values.sum
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).as("__tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // basis points of 10,000 — same resolution as sampleByHash, and the
    // integer rate makes the decision replayable in any engine
    val ratesBp: Map[String, Int] = weights.collect {
      case (src, w) if totals.getOrElse(src, 0L) > 0L =>
        val alloc = budget.toDouble * (w / wSum)
        src -> math.min(10000.0, alloc / totals(src) * 10000.0).toInt
    }
    mixtureSample(df, keyCol, sourceCol, ratesBp, seed)
  }

  /** Temperature-based mixture sampling (public method: the α-weighted
    * domain rebalancing of multilingual pretraining — Conneau et al.
    * 2020 XLM-R §3.1, Xue et al. 2021 mT5): sample domain d with
    * probability ∝ n_d^α, α<1 flattening the distribution so
    * low-resource domains are upsampled relative to proportional.
    * rate(d) = min(1, budget·p_d / n_d) with p_d = n_d^α / Σ n^α,
    * applied as the same content-addressed hash keep of
    * [[mixtureSample]].
    *
    * Determinism/portability: n_d^α is floor-quantized to a multiple
    * of 2^-20 before the normalizing sum (so the Σ is exact in any
    * order and any engine), then one fixed chain of IEEE ops produces
    * the basis-point rate — DuckDB replays the rate table bit-for-bit
    * from the same corpus.
    *
    * Scale shape: one count aggregate (map-side combined), a
    * domain-count-sized rate table on the driver (model state), then a
    * zero-shuffle filter projection. */
  def temperatureSample(df: DataFrame, keyCol: String, sourceCol: String,
      alpha: Double, budgetRows: Long,
      seed: String = "temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val q = 1048576.0
    // Contract: rows with a NULL source are excluded from both the rate
    // table and the sample (a null domain has no n_d; and it would NPE
    // the driver-side String sort below).
    val nonNull = df.filter(col(sourceCol).isNotNull)
    val totals = nonNull.groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val qpow = totals.map { case (s, n) =>
      s -> math.floor(math.pow(n.toDouble, alpha) * q) / q
    }
    val sumP = qpow.map(_._2).sum // exact: summands are 2^-20 multiples
    val ratesBp = qpow.zip(totals).map { case ((s, p), (_, n)) =>
      s -> math.min(10000.0,
        math.floor(budgetRows.toDouble * p / sumP / n * 10000.0)).toInt
    }.toMap
    mixtureSample(nonNull, keyCol, sourceCol, ratesBp, seed)
  }

  /** Leakage-guarded split: assign train/val/test by hashing a GROUP
    * key instead of the row key, so every member of a duplicate /
    * near-duplicate group lands in the SAME split. Splitting dedup
    * groups across train and test is the classic eval-contamination
    * bug — a test document with a near-dup in train is memorized, not
    * generalized. Feed `groupCol` with [[graft.operators.TextDedup.normalizedHash]]
    * (exact groups), a MinHash/SimHash band key, or the component id
    * from [[graft.operators.ConnectedComponents]] (transitive near-dup
    * groups). Still a zero-shuffle projection when the group key is
    * already a column; stability properties as [[assignSplit]]. */
  def groupAwareSplit(df: DataFrame, groupCol: String, trainPct: Int = 80,
      valPct: Int = 10, seed: String = "gsplit"): DataFrame =
    assignSplit(df, groupCol, trainPct, valPct, seed)

  /** Deterministic corpus shuffle + sharding — the materialization step
    * that turns a curated corpus into N training shards in a
    * reproducible pseudo-random order (training-data order affects the
    * model; a retried job must produce byte-identical shards). Each row
    * gets shard = md5-bucket(key) and a position within its shard by
    * md5 order — content-addressed like everything here, so the layout
    * is a pure function of the data.
    *
    * Scale shape: the shard assignment is a zero-shuffle projection;
    * the within-shard ordering is ROW_NUMBER per shard — one hash
    * shuffle keyed on shard (each reducer sorts ONE shard locally,
    * which is exactly the file a writer task then emits). No global
    * sort, no driver involvement. */
  def shuffleShards(df: DataFrame, keyCol: String, shards: Int,
      seed: String = "shard"): DataFrame = {
    require(shards > 0, "shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val order = md5(concat(col(keyCol).cast("string"), lit(seed), lit("pos")))
    df.withColumn("shard", hashBucket(col(keyCol), shards, seed))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(order, col(keyCol)))
        .cast("long"))
  }

  /** Deterministic weighted sampling without replacement, per stratum —
    * the A-ES scheme (Efraimidis & Spirakis 2006, public): each row
    * draws key u^(1/w); the n largest keys per stratum are the sample.
    * This is how a curation pipeline biases a fixed-size subsample
    * toward high-quality / long documents while staying reproducible:
    * u comes from the md5 hash of the row id (content-addressed, same
    * stability story as [[sampleByHash]]), never from a RNG.
    *
    * We order by ln(u)/w (monotone in u^(1/w)): ln(u) is
    * floor-quantized to a multiple of 2^-20, leaving one IEEE division
    * by the weight — a fixed op sequence any engine replays
    * bit-for-bit. Weights must be strictly positive (enforced: a
    * zero/negative weight raises an error at evaluation time).
    *
    * Scale shape: zero-shuffle projection for the key, then ROW_NUMBER
    * per stratum — Spark's WindowGroupLimit turns the rank filter into
    * a map-side partial top-n, so a stratum with 10^9 rows ships only
    * n rows per input partition. Returns the sampled rows plus their
    * in-stratum rank `rk`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      strataCol: Column, nPerStratum: Int,
      seed: String = "wsample"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (hashBucket(col(idCol), 1 << 20, seed).cast("double") + 0.5) /
      lit(1048576.0)
    // enforce the strictly-positive-weight precondition loudly: a
    // zero/negative weight would otherwise yield a ±Infinity selection
    // key and silently corrupt the ranking
    val w = when(weightCol.cast("double") > 0.0, weightCol.cast("double"))
      .otherwise(raise_error(concat(
        lit("weightedSample: non-positive weight for id "),
        col(idCol).cast("string"))))
    val selKey = (floor(log(u) * 1048576) / lit(1048576.0)) / w
    val rn = Iterator.from(0).map(i => s"__graft_ws_rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(
        Window.partitionBy(strataCol).orderBy(selKey.desc, col(idCol))))
      .filter(col(rn) <= nPerStratum)
      .withColumnRenamed(rn, "rk")
  }

  /** Per-key cap: keeps at most `maxPerKey` rows per key, the first ones
    * in `orderCol` order — the standard per-domain document cap of web
    * corpus curation (no single host may dominate the training mixture).
    *
    * Scale shape: ROW_NUMBER + rank filter, which Spark's
    * WindowGroupLimit rule turns into a map-side PARTIAL limit before
    * the shuffle and a final limit after it — so a hot domain with 10^8
    * pages ships only `maxPerKey` rows per input partition, not its
    * whole population, and the single hash shuffle moves at most
    * maxPerKey x mappers rows per key. */
  def capPerKey(df: DataFrame, keyCol: String, orderCol: String,
      maxPerKey: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // collision-proof temp column: a caller's own "__rn" must survive
    val rn = Iterator.from(0).map(i => s"__graft_cap_rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(orderCol))))
      .filter(col(rn) <= maxPerKey)
      .drop(rn)
  }
}
