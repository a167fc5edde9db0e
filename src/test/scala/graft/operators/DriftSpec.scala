package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PSI at corpus scale: the round-5 formulation `require`d
  * n_a·n_b·ln(n_a·n_b)·2^20 < 2^62, which hard-failed balanced
  * snapshots beyond ~4·10^5 rows each. The DECIMAL(38,0) term must
  * accept snapshots past 5·10^7 rows AND stay bit-exact against a
  * BigInt model computed from the analytic bucket counts. */
class DriftSpec extends SparkSpec {

  test("psiTable exact past 5e7 rows per snapshot (old 2^62 bound gone)") {
    val n = 110_000_000L // 5.5e7 per snapshot
    val buckets = 7
    val df = spark.range(n)
      .select(col("id"), (col("id") % buckets).cast("string").as("b"),
        (col("id") % 2 === 0).as("ina"))
    val out = Drift.psiTable(df, col("b"), col("ina"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // analytic smoothed counts: bucket k holds ids k, k+7, … < n;
    // evens (ina) are those with (k + 7j) % 2 == 0
    def cnt(k: Int, even: Boolean): Long =
      (k.toLong until n by buckets.toLong).count(id =>
        (id % 2 == 0) == even) + 1L
    val cents = (0 until buckets).map(k => (cnt(k, true), cnt(k, false)))
    val na = cents.map(_._1).sum
    val nb = cents.map(_._2).sum
    val q = 1L << 20
    for (k <- 0 until buckets) {
      val (ca, cb) = cents(k)
      val lnq = math.floor(math.log(
        ca.toDouble * nb / (cb.toDouble * na)) * q).toLong
      val term = ((BigInt(ca) * nb - BigInt(cb) * na) * lnq) /
        (BigInt(na) * nb)
      val got = out(k.toString)
      assert(got == ((ca, cb, lnq, term.toLong)), s"bucket $k")
    }
    // every term fits comfortably in BIGINT and is non-negative
    assert(out.values.forall(v => v._4 >= 0L && v._4 < (1L << 40)))
  }
}
