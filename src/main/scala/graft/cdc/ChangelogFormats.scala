package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CDC ingestion formats — reference: debezium-json / canal-json /
  * maxwell-json / ogg-json decoders (flink-formats/flink-json/src/main/
  * java/org/apache/flink/formats/json/{debezium,canal,maxwell,ogg}/),
  * which turn change envelopes into RowKind-flagged rows.
  *
  * Spark has no RowKind; we decode into an explicit `__row_kind` column
  * ('+I', '-U', '+U', '-D') — the changelog-column convention from
  * SURVEY.md §7.4. Parsing is `from_json` + array-explode, fully
  * declarative: an update envelope becomes two rows (-U with the before
  * image, +U with the after image), scan-side, no shuffle.
  */
object ChangelogFormats {

  val RowKindCol = "__row_kind"

  private def kindRow(kind: String, payload: Column): Column =
    struct(lit(kind).as(RowKindCol), payload.as("row"))

  /** Debezium envelope: {before, after, op: c|r|u|d}.
    *
    * The envelope is parsed into ONE materialized `__env` column and
    * every consumer reads fields from it: from_json (JsonToStructs) is
    * a CodegenFallback expression, so inlining the parse at each of the
    * 5-6 use sites (op test + the four kind payloads) re-parses the
    * JSON per site — measured 3x slower on the decode benchmarks. The
    * multi-referenced non-cheap alias also keeps CollapseProject from
    * undoing the materialization. */
  def fromDebezium(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val env = new StructType()
      .add("before", rowSchema).add("after", rowSchema)
      .add("op", org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn("__env", from_json(col(jsonCol), env))
    val j = col("__env")
    explodeKinds(parsed, j("op"),
      insert = kindRow("+I", j("after")),
      updateBefore = kindRow("-U", j("before")),
      updateAfter = kindRow("+U", j("after")),
      delete = kindRow("-D", j("before")),
      insertOps = Seq("c", "r"), updateOps = Seq("u"), deleteOps = Seq("d"),
      rowSchema)
  }

  /** Oracle GoldenGate envelope: {before, after, op_type: I|U|D}.
    * Single materialized parse — see [[fromDebezium]]. */
  def fromOgg(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val env = new StructType()
      .add("before", rowSchema).add("after", rowSchema)
      .add("op_type", org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn("__env", from_json(col(jsonCol), env))
    val j = col("__env")
    explodeKinds(parsed, j("op_type"),
      insert = kindRow("+I", j("after")),
      updateBefore = kindRow("-U", j("before")),
      updateAfter = kindRow("+U", j("after")),
      delete = kindRow("-D", j("before")),
      insertOps = Seq("I"), updateOps = Seq("U"), deleteOps = Seq("D"),
      rowSchema)
  }

  /** Maxwell envelope: {data, old, type: insert|update|delete}. The
    * `old` image is partial — absent fields take the new value (same
    * merge the reference's MaxwellJsonDeserializationSchema performs). */
  def fromMaxwell(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val env = new StructType()
      .add("data", rowSchema).add("old", rowSchema)
      .add("type", org.apache.spark.sql.types.StringType)
    // single materialized parse — see fromDebezium
    val parsed = df.withColumn("__env", from_json(col(jsonCol), env))
    val j = col("__env")
    val beforeMerged = struct(rowSchema.fieldNames.map(f =>
      coalesce(j("old").getField(f), j("data").getField(f)).as(f)): _*)
    explodeKinds(parsed, j("type"),
      insert = kindRow("+I", j("data")),
      updateBefore = kindRow("-U", beforeMerged),
      updateAfter = kindRow("+U", j("data")),
      delete = kindRow("-D", j("data")),
      insertOps = Seq("insert"), updateOps = Seq("update"),
      deleteOps = Seq("delete"), rowSchema)
  }

  /** Canal envelope: {data: [...], old: [...], type: INSERT|UPDATE|
    * DELETE} — `data` is an array of rows; for updates, `old[i]` holds
    * the changed fields of `data[i]`. */
  def fromCanal(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val env = new StructType()
      .add("data", org.apache.spark.sql.types.ArrayType(rowSchema))
      .add("old", org.apache.spark.sql.types.ArrayType(rowSchema))
      .add("type", org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn("__env", from_json(col(jsonCol), env))
    val exploded = parsed.select(col("__env.type").as("__op"),
      posexplode(col("__env.data")).as(Seq("__i", "__data")),
      col("__env.old").as("__old"))
    val oldRow = element_at(col("__old"), col("__i") + 1)
    val beforeMerged = struct(rowSchema.fieldNames.map(f =>
      coalesce(oldRow.getField(f), col("__data").getField(f)).as(f)): _*)
    val kinds = when(col("__op") === "INSERT",
        array(struct(lit("+I").as(RowKindCol), col("__data").as("row"))))
      .when(col("__op") === "UPDATE",
        array(struct(lit("-U").as(RowKindCol), beforeMerged.as("row")),
          struct(lit("+U").as(RowKindCol), col("__data").as("row"))))
      .when(col("__op") === "DELETE",
        array(struct(lit("-D").as(RowKindCol), col("__data").as("row"))))
    exploded.select(explode(kinds).as("__k"))
      .select(col(s"__k.$RowKindCol"), col("__k.row.*"))
  }

  /** DropUpdateBefore (reference StreamExecDropUpdateBefore.java):
    * remove -U rows when the sink keys on the primary key and doesn't
    * need the pre-image. */
  def dropUpdateBefore(df: DataFrame): DataFrame =
    df.filter(col(RowKindCol) =!= "-U")

  private def explodeKinds(df: DataFrame, op: Column, insert: Column,
      updateBefore: Column, updateAfter: Column, delete: Column,
      insertOps: Seq[String], updateOps: Seq[String], deleteOps: Seq[String],
      rowSchema: StructType): DataFrame = {
    val kinds = when(op.isInCollection(insertOps), array(insert))
      .when(op.isInCollection(updateOps), array(updateBefore, updateAfter))
      .when(op.isInCollection(deleteOps), array(delete))
    df.select(explode(kinds).as("__k"))
      .select(col(s"__k.$RowKindCol"), col("__k.row.*"))
  }
}
