package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large text corpora — the operators a
  * training-data pipeline runs over billions of documents: exact dedup,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Everything is built from native Spark expressions (split / transform /
  * aggregate / hash) — no UDFs, no serialization boundary — so the
  * shingling+hashing stage runs inside the scan stage. The only shuffles
  * are the LSH band group-bys, which move (band_key, doc_id) pairs —
  * tiny compared to the corpus. That is the property that matters at
  * 100 TB: signature computation is embarrassingly parallel, candidate
  * generation shuffles O(bands × docs) small rows, and verification only
  * touches candidate pairs.
  *
  * MinHash math: h_i(x) = (a_i * x + b_i) mod p with p = 2^31 - 1
  * (Mersenne prime) over base hashes folded into [0, p) — a*h stays
  * below 2^62 (no Long overflow under ANSI) while a*h+b >> p, so the
  * modulo genuinely permutes (a*h+b < p would be order-preserving and
  * all signatures would be perfectly correlated). Signature = element-
  * wise min. Banding: b bands of r rows; P[collide] = 1 - (1 - s^r)^b
  * for Jaccard s (Leskovec et al., Mining of Massive Datasets ch. 3).
  */
object TextDedup {

  val MersennePrime: Long = 2147483647L // 2^31 - 1

  /** Deterministic SplitMix64-derived coefficients (public-domain mixing
    * constants) in [1, p). */
  private def coef(seed: Long, n: Int): Seq[Long] =
    (0 until n).map { i =>
      var z = seed + (i + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (math.abs(z ^ (z >>> 31)) % (MersennePrime - 1)) + 1
    }

  /** Word n-gram shingles of a text column, as an array column. */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(textCol, " ")
    transform(
      sequence(lit(1), greatest(size(words) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(words, i, lit(n))))
  }

  /** 31-bit hashes of each shingle (murmur3 folded to [0, 2^31-1)). */
  def shingleHashes(textCol: Column, n: Int): Column =
    transform(shingles(textCol, n),
      s => pmod(hash(s).cast("long"), lit(MersennePrime)))

  /** MinHash signature: array of `numHashes` minima over permuted shingle
    * hashes. Delegates to the native single-pass expression
    * (graft.functions.MinHashSig) — per-row compute, no shuffle, no
    * boxing; see TextHashExprs for why this matters at corpus scale. */
  def minHashSignature(textCol: Column, n: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.MinHashSig(
      ColumnBridge.expression(textCol), n, numHashes))
  }

  /** Per-document signatures: input columns + `minhash_sig`. */
  def withSignature(df: DataFrame, textCol: String,
      n: Int = 3, numHashes: Int = 32): DataFrame =
    df.withColumn("minhash_sig", minHashSignature(col(textCol), n, numHashes))

  /** LSH candidate pairs: docs whose signatures collide in >= 1 band.
    * Returns (id_a, id_b, n_bands) with id_a < id_b.
    *
    * Scale shape: explode to (band_idx, band_hash, id) — `bands` rows per
    * doc — then a per-bucket self-join. Degenerate buckets (boilerplate /
    * empty docs) are capped at `maxBucket` members, the standard guard
    * against quadratic blowup on skewed buckets.
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val banded = withSignature(df, textCol, n, numHashes)
      .select(col(idCol).as("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            transform(slice(col("minhash_sig"), lit(b * r + 1), lit(r)),
              x => x.cast("string"))))))
          .as(Seq("band_idx", "band_hash")))
    val capped = banded
      .withColumn("__bucket_n", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("__bucket_n") <= maxBucket)
      .drop("__bucket_n")
    val a = capped.select(col("band_idx"), col("band_hash"),
      col("__id").as("id_a"))
    val b = capped.select(col("band_idx").as("bi"),
      col("band_hash").as("bh"), col("__id").as("id_b"))
    a.join(b, col("band_idx") === col("bi") &&
        col("band_hash") === col("bh") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("band_idx")).as("n_bands"))
  }

  /** Exact n-gram Jaccard similarity: |A ∩ B| / |A ∪ B| over distinct
    * shingle sets. For verifying LSH candidates. */
  /** Benchmark decontamination: ids of corpus documents sharing at
    * least one word n-gram with an evaluation set — the pretraining
    * hygiene pass that keeps test data out of the training corpus
    * (the n-gram overlap rule of GPT-3 appendix C / PaLM, public).
    *
    * Scale shape: eval sets are tiny relative to a 100 TB corpus, so
    * the distinct benchmark grams BROADCAST and the probe is a map-side
    * LEFT SEMI join over the exploded corpus grams — no corpus shuffle
    * until the final distinct on (already small) matching ids. */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(shingles(col(textCol), n)).as("__g"))
    val bgrams = bench
      .select(explode(shingles(col(benchTextCol), n)).as("__g")).distinct()
    grams.join(broadcast(bgrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  def jaccard(shinglesA: Column, shinglesB: Column): Column = {
    val ai = array_distinct(shinglesA)
    val bi = array_distinct(shinglesB)
    size(array_intersect(ai, bi)).cast("double") /
      size(array_union(ai, bi)).cast("double")
  }

  /** SimHash-64 (Charikar 2002): per-token 64-bit hashes vote ±1 per
    * bit; the fingerprint takes the sign of each bit's vote sum.
    * Delegates to the native expression (graft.functions.SimHash64Expr):
    * one compiled pass per row, no shuffle. */
  def simHash64(textCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.SimHash64Expr(
      ColumnBridge.expression(textCol)))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact dedup key: hash of normalized text (lowercase, collapsed
    * whitespace) — the first pass of any corpus dedup. */
  def normalizedHash(textCol: Column): Column =
    md5(lower(regexp_replace(textCol, "\\s+", " ")))
}
