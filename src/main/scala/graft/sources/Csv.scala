package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV ingest/egress with the same contract discipline as [[Jsonl]]:
  * EXPLICIT schema (never inference — an inference pass is a full
  * extra scan at 100 TB), PERMISSIVE corrupt-line quarantine, and
  * the [[ShardExport]] writer layout. Serialization is Spark's
  * codegen'd `to_csv` / `from_csv` (Univocity) — row-local, no UDF.
  *
  * CSV cannot natively distinguish null from the empty string, so
  * both directions pin `nullValue = \N` (the MySQL-dump convention):
  * nulls round-trip as the bare token, empty strings as quoted `""`.
  * One documented lossy corner remains — a data string EQUAL to the
  * null token reads back as null (the parser unquotes before the
  * null compare); corpora where `\N` is live payload should ship
  * JSONL.
  *
  * Splittability note: a CSV file with EMBEDDED NEWLINES needs
  * `multiLine = true`, which makes each file one split — fine for
  * many bounded shards (the [[writeCsv]] layout), wrong for a few
  * huge files. Corpora with newline-bearing text should ship JSONL;
  * this reader exposes the flag so tabular exports (the common CSV
  * case) stay splittable.
  */
object Csv {

  /** The quarantine column the readers append. */
  val corruptCol = "_corrupt_record"

  /** Pinned on every read AND write so the two halves can never
    * disagree on the null token. `emptyValue` is direction-specific
    * (Spark reads it as "what a quoted-empty field BECOMES", writes
    * it as "what an empty string is WRITTEN as"), so each half pins
    * its own: write `""`, read back the empty string.
    */
  val nullToken = "\\N"
  val writeOptions: Map[String, String] = Map(
    "nullValue" -> nullToken, "emptyValue" -> "\"\"")
  val readOptions: Map[String, String] = Map(
    "nullValue" -> nullToken, "emptyValue" -> "")

  // to_csv only takes the java map flavour
  private def jOpts(m: Map[String, String]): java.util.Map[String, String] = {
    val out = new java.util.HashMap[String, String]()
    m.foreach { case (k, v) => out.put(k, v) }
    out
  }

  /** Serialize every row to one CSV line (all columns, field order =
    * column order) in `outCol` — stateless, stream-safe.
    */
  def toCsvLines(df: DataFrame, outCol: String = "csv"): DataFrame =
    df.select(
      to_csv(struct(df.columns.map(col): _*), jOpts(writeOptions)).as(outCol))

  /** Parse a CSV line column against an explicit schema with
    * quarantine semantics: schema fields flattened + [[corruptCol]]
    * holding the raw line iff the parse was not clean. Short rows
    * keep their partial result (missing fields null) AND record the
    * raw line — a column-count mismatch is a malformation in CSV,
    * unlike JSON's missing fields; long and type-bad rows quarantine
    * outright (PERMISSIVE).
    */
  def parseCsvLines(df: DataFrame, csvCol: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain $corruptCol")
    val withCorrupt = schema.add(corruptCol, StringType, nullable = true)
    val opts = readOptions ++ Map(
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)
    df.select(from_csv(col(csvCol), withCorrupt, opts).as("__p"))
      .select(col("__p.*"))
  }

  /** Distributed CSV read with the explicit-schema + quarantine
    * contract, through Spark's native csv source (splittable when
    * `multiLine = false`, column pruning pushes the parse to only
    * the requested fields).
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = false,
      multiLine: Boolean = false): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain $corruptCol")
    spark.read
      .schema(schema.add(corruptCol, StringType, nullable = true))
      .options(readOptions)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .csv(path)
  }

  /** Write `df` as `shard=N/` CSV directories (one headerless text
    * file each, rows in deterministic global-shuffle order,
    * `order_id` embedded per line) and return the bounded manifest —
    * the exact [[Jsonl.writeJsonl]] layout with CSV lines.
    */
  def writeCsv(
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
      .select(
        to_csv(struct(payload.map(col): _*), jOpts(writeOptions)).as("value"),
        col("shard"))
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
