package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (one JSON object per line) ingest/egress — the interchange
  * format crawl dumps arrive in and trainers read back. Ingest rides
  * Spark's native distributed json source with an EXPLICIT schema
  * (never inference — a schema-inference pass is a full extra scan of
  * a 100 TB corpus) and PERMISSIVE corrupt-record capture, so one
  * mangled line quarantines instead of failing the job or silently
  * vanishing. Egress composes the [[ShardExport]] discipline: the
  * deterministic global shuffle, fixed `rowsPerShard` arithmetic
  * assignment, one file per `shard=N/` directory at any upstream
  * parallelism, bounded manifest.
  *
  * The serialization itself is Spark's codegen'd `to_json` /
  * `from_json` (JacksonGenerator/Parser) — row-local, no UDF.
  */
object Jsonl {

  /** The quarantine column the readers append. */
  val corruptCol = "_corrupt_record"

  /** Serialize every row to one JSON line (all columns, field order =
    * column order) in `outCol` — the mid-pipeline half of the writer,
    * usable on a stream (stateless) or before a custom sink.
    */
  def toJsonLines(df: DataFrame, outCol: String = "json"): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as(outCol))

  /** Parse a JSONL string column against an explicit schema with
    * quarantine semantics: output = the schema's fields flattened +
    * [[corruptCol]] holding the raw line when (and only when) the
    * parse failed. Missing fields are null (PERMISSIVE), extra fields
    * are ignored — the crawl-batch contract where producers add
    * fields over time. Row-local, codegen'd.
    */
  def parseJsonLines(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain $corruptCol")
    val withCorrupt = schema.add(corruptCol, StringType, nullable = true)
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)
    df.select(from_json(col(jsonCol), withCorrupt, opts).as("__p"))
      .select(col("__p.*"))
  }

  /** Distributed JSONL read with the same explicit-schema +
    * quarantine contract as [[parseJsonLines]], through Spark's
    * native json source (splittable files, column pruning pushes the
    * parse to only the requested fields). Spark restriction: a query
    * whose only referenced column is [[corruptCol]] is rejected by
    * the source (`QUERY_ONLY_CORRUPT_RECORD_COLUMN`) — select at
    * least one data column alongside it when auditing quarantined
    * lines.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain $corruptCol")
    spark.read
      .schema(schema.add(corruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Write `df` as `shard=N/` JSONL directories (one text file each,
    * rows in deterministic global-shuffle order, `order_id` embedded
    * in each line so a reader can restore the order) and return the
    * bounded manifest (rows + order bounds per shard), derived from
    * the assignment without re-reading the output.
    */
  def writeJsonl(
      df: DataFrame,
      outDir: String,
      idCol: String,
      rowsPerShard: Long,
      seed: Int = 0): DataFrame = {
    val assigned = ShardExport.shardAssignment(df, idCol, rowsPerShard, seed)
    val payload = df.columns :+ "order_id"
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .select(to_json(struct(payload.map(col): _*)).as("value"), col("shard"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .text(outDir)
    assigned
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("order_id")).as("first_order"),
        max(col("order_id")).as("last_order"))
  }
}
