package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Window table functions — reference: TUMBLE/HOP/CUMULATE/SESSION TVFs
  * (flink-table-runtime/.../operators/window/tvf/slicing/
  * SliceAssigners.java:46-700, StreamExecWindowTableFunction.java).
  *
  * TUMBLE/HOP map to Spark's `window()`, SESSION to `session_window()`.
  * CUMULATE has no Spark built-in: we assign each row to every cumulative
  * window it belongs to via `sequence()` + `explode` — a generator, the
  * same row-multiplication shape Flink's CumulativeSliceAssigner
  * produces; any downstream group-by is then a plain hash aggregate. The
  * expansion factor is bounded by maxSize/step (e.g. 4 for 1h/15m),
  * constant per row, so it scales linearly and stays inside whole-stage
  * codegen (no UDF).
  */
object TimeWindows {

  /** CUMULATE(ts, step, maxSize): for each row emit one output row per
    * cumulative window it falls into: window_start = floor(ts, maxSize),
    * window_end ∈ {floor(ts, step)+step, ..., window_start+maxSize}.
    *
    * @param stepSec  slice step in seconds
    * @param maxSec   full window size in seconds (multiple of stepSec)
    */
  def cumulate(df: DataFrame, tsCol: String, stepSec: Long, maxSec: Long): DataFrame = {
    require(maxSec % stepSec == 0, "maxSize must be a multiple of step")
    val stepUs = stepSec * 1000000L
    val maxUs = maxSec * 1000000L
    df
      .withColumn("__start_us",
        expr(s"(unix_micros($tsCol) DIV $maxUs) * $maxUs"))
      .withColumn("window_end", explode(expr(
        s"""transform(
              sequence((unix_micros($tsCol) DIV $stepUs) * $stepUs + $stepUs,
                       __start_us + $maxUs, $stepUs),
              x -> timestamp_micros(x))""")))
      .withColumn("window_start", expr("timestamp_micros(__start_us)"))
      .drop("__start_us")
  }
}
