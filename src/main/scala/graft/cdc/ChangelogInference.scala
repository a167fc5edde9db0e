package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog-mode inference over a plan of changelog operators —
  * reference: flink-table-planner/.../optimize/program/
  * FlinkChangelogModeInferenceProgram.scala, which decides per operator
  * (1) what changelog kinds it PRODUCES and (2) what kinds each
  * consumer REQUIRES, and in particular where UPDATE_BEFORE rows can be
  * dropped (the DropUpdateBefore optimization: a sink or stateful
  * operator keyed on the update key does not need -U).
  *
  * The round-5 retraction chains (q_cdc_agg_chain,
  * q_cdc_agg_join_chain) hand-composed these decisions; this module
  * derives them for an arbitrary tree of the supported operators:
  *
  *   Source (insert-only | retract changelog)
  *   Calc (stateless project/filter — mode transparent)
  *   EnrichJoin (changelog ⋈ static dimension — mode transparent)
  *   GroupAgg (retractable COUNT/SUM — consumes its input's changes,
  *             produces an update stream)
  *   Sink (with or without a primary key)
  *
  * Inference (two passes, as in the reference):
  *
  *   - bottom-up "produced": Source produces [I] or [I,UB,UA,D];
  *     Calc/EnrichJoin pass through; GroupAgg produces an updating
  *     stream whose flavor is decided by the consumer below.
  *   - top-down "required": a Sink whose primaryKey equals the update
  *     key of its updating input requires only UPSERT [I,UA,D] — its
  *     producing GroupAgg therefore never emits -U (and emits -D on
  *     group death). A Sink without a primary key requires the full
  *     RETRACT stream [I,UB,UA,D]. A GroupAgg over an updating input
  *     ALWAYS requires retract from below (it must subtract the old
  *     contribution before adding the new one). A GroupAgg over an
  *     insert-only input requires just [I].
  *
  * Execution replays the decided plan with [[ChangelogAgg]]: every
  * GroupAgg runs `updateStream(emitUpdateBefore = <decided>)`, and a
  * keyed Sink materializes last-writer-wins state (exactly what an
  * upsert sink's compaction does). Batch determinism: each Source
  * declares its arrival-order columns; GroupAgg emissions propagate
  * them (`__seq_*`, `__sub`) so downstream stages order changes the
  * way a stream would.
  */
object ChangelogInference {

  private val K = ChangelogFormats.RowKindCol

  sealed abstract class Mode(val label: String) {
    def isUpdating: Boolean = this != InsertOnly
  }
  /** Only +I rows. */
  case object InsertOnly extends Mode("[I]")
  /** +I/+U/-D keyed on the update key — no UPDATE_BEFORE. */
  case object Upsert extends Mode("[I,UA,D]")
  /** The full retract stream +I/-U/+U/-D. */
  case object Retract extends Mode("[I,UB,UA,D]")

  sealed trait Node
  /** `seqCols`: columns giving the deterministic arrival order of the
    * changelog (required when any GroupAgg consumes this source). The
    * DataFrame must carry `__row_kind` unless `insertOnly`. */
  final case class Source(df: DataFrame, insertOnly: Boolean = false,
      seqCols: Seq[String] = Nil) extends Node
  /** Stateless row transform; must preserve `__row_kind` and the
    * sequence columns. */
  final case class Calc(child: Node, f: DataFrame => DataFrame) extends Node
  /** Enrichment join against a STATIC (bounded, unchanging) dimension —
    * row kinds pass through; the dim side broadcasts. */
  final case class EnrichJoin(child: Node, dim: DataFrame,
      streamKey: String, dimKey: String) extends Node
  /** Retractable grouped COUNT/SUM over `valCol`, keyed by `keys`.
    * Output columns: keys..., cnt, sum_val, __row_kind. */
  final case class GroupAgg(child: Node, keys: Seq[String],
      valCol: String) extends Node
  /** Terminal sink. `primaryKey = Some(keys)` declares an upsert sink
    * keyed on those columns. */
  final case class Sink(child: Node, primaryKey: Option[Seq[String]] = None)
    extends Node

  /** The derived plan: per-node produced mode, per-GroupAgg
    * UPDATE_BEFORE decision, and the sink's accepted mode. */
  final case class Inferred(
      produced: Map[Node, Mode],
      emitUpdateBefore: Map[Node, Boolean],
      sinkMode: Mode)

  /** The "update key" a node's updating output is keyed on, if any. */
  private def updateKey(n: Node): Option[Seq[String]] = n match {
    case GroupAgg(_, keys, _) => Some(keys)
    case Calc(c, _) => updateKey(c) // projection must preserve the key
    case EnrichJoin(c, _, _, _) => updateKey(c)
    case Source(_, _, _) => None
    case Sink(c, _) => updateKey(c)
  }

  /** Two-pass mode derivation. Throws IllegalArgumentException for
    * impossible plans (an updating stream into a keyless insert-only
    * consumer is not one — that is just the retract mode). */
  def infer(sink: Sink): Inferred = {
    // bottom-up: what each node WOULD produce, before consumer demands
    def produces(n: Node): Mode = n match {
      case Source(_, insertOnly, _) => if (insertOnly) InsertOnly else Retract
      case Calc(c, _) => produces(c)
      case EnrichJoin(c, _, _, _) => produces(c)
      case GroupAgg(c, _, _) =>
        // a grouped aggregate over ANY input is an updating stream;
        // flavor (upsert vs retract) is fixed top-down
        Retract
      case s: Sink => produces(s.child)
    }
    var produced = Map.empty[Node, Mode]
    var emitUB = Map.empty[Node, Boolean]
    // top-down: what the consumer requires of `n`
    def walk(n: Node, required: Mode): Unit = {
      n match {
        case src @ Source(_, insertOnly, _) =>
          produced += (src -> (if (insertOnly) InsertOnly else Retract))
        case c @ Calc(ch, _) =>
          walk(ch, required); produced += (c -> produced(ch))
        case j @ EnrichJoin(ch, _, _, _) =>
          walk(ch, required); produced += (j -> produced(ch))
        case a @ GroupAgg(ch, _, _) =>
          // the aggregate's own input must carry retractions whenever
          // the input updates; insert-only inputs need nothing more
          val childMode = produces(ch)
          walk(ch, if (childMode.isUpdating) Retract else InsertOnly)
          require(!(childMode.isUpdating && produced(ch) != Retract),
            "GroupAgg over an updating input requires the retract stream")
          val mode = if (required == Upsert) Upsert else Retract
          produced += (a -> mode)
          emitUB += (a -> (mode == Retract))
        case s: Sink => throw new IllegalStateException("nested sink")
      }
    }
    val childMode = produces(sink.child)
    val sinkMode: Mode =
      if (!childMode.isUpdating) InsertOnly
      else sink.primaryKey match {
        case Some(pk) if updateKey(sink.child).contains(pk) => Upsert
        case Some(pk) =>
          throw new IllegalArgumentException(
            s"sink primary key $pk does not match the update key " +
              s"${updateKey(sink.child)} of its input — an upsert sink " +
              "must be keyed on the update key")
        case None => Retract
      }
    walk(sink.child, sinkMode)
    Inferred(produced, emitUB, sinkMode)
  }

  /** Executed flow: the stream DataFrame plus its arrival-order
    * columns. */
  private final case class Flow(df: DataFrame, seq: Seq[String])

  /** Build the decided plan. Returns the CHANGE STREAM delivered to the
    * sink (kinds as decided), or — for a keyed sink — the MATERIALIZED
    * last-writer-wins state (what the upsert sink's compaction holds;
    * no `__row_kind` column). */
  def execute(sink: Sink): DataFrame = {
    val inf = infer(sink)
    def build(n: Node): Flow = n match {
      case Source(df, insertOnly, seqCols) =>
        Flow(if (insertOnly) df.withColumn(K, lit("+I")) else df, seqCols)
      case Calc(c, f) =>
        val fl = build(c); Flow(f(fl.df), fl.seq)
      case EnrichJoin(c, dim, sk, dk) =>
        val fl = build(c)
        Flow(fl.df.join(broadcast(dim), col(sk) === col(dk)), fl.seq)
      case a @ GroupAgg(c, keys, valCol) =>
        val fl = build(c)
        require(fl.seq.nonEmpty,
          "GroupAgg needs arrival-order columns (Source.seqCols)")
        val out = ChangelogAgg.updateStream(fl.df, keys, valCol,
          fl.seq.map(col), K,
          emitUpdateBefore = inf.emitUpdateBefore(a), emitSeq = true)
        // emitted order: the driving change's seq, then retract-before-add
        val renamed = fl.seq.indices.map(i => s"__seq_$i") :+ "__sub"
        Flow(out, renamed)
      case s: Sink => throw new IllegalStateException("nested sink")
    }
    val fl = build(sink.child)
    sink.primaryKey match {
      case None => fl.df.drop(fl.seq.filter(_.startsWith("__")): _*)
      case Some(pk) =>
        // clear plan-validation error instead of an empty-ORDER-BY
        // AnalysisException at runtime: last-writer-wins needs an order
        require(fl.seq.nonEmpty,
          "keyed sink needs arrival-order columns to compact " +
            "last-writer-wins (declare Source.seqCols)")
        // upsert-sink compaction: last writer per key wins; a key whose
        // final row is a delete (or a dangling -U) leaves the store
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(pk.map(col): _*)
          .orderBy(fl.seq.map(c => col(c).desc): _*)
        fl.df.withColumn("__last", row_number().over(w))
          .filter(col("__last") === 1 && col(K).isin("+I", "+U"))
          .drop((fl.seq.filter(_.startsWith("__")) :+ "__last" :+ K): _*)
    }
  }
}
