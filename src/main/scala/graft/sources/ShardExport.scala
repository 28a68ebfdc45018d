package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sharded training-data export — the last mile of a curation
  * pipeline: a deterministic global shuffle
  * ([[graft.operators.Sampling.shuffleForTraining]]) laid out as
  * fixed-size shards a trainer can stream in order.
  *
  * Shard assignment is pure arithmetic on the shuffle rank
  * (`order_id div/mod rowsPerShard`), so shard contents are
  * reproducible on any cluster and engine-replayable; the writer
  * repartitions BY SHARD before `partitionBy`, so each shard
  * directory holds exactly one file regardless of upstream
  * parallelism. Size `rowsPerShard` to the target file size — at
  * 100 TB that's the shard-count / file-size trade every export job
  * tunes.
  */
object ShardExport {

  /** Adds `shard` and `shard_pos` (plus the underlying contiguous
    * `orderCol`): row r of the global hash order lands at
    * (r div rowsPerShard, r mod rowsPerShard). The last shard may be
    * short; every other shard holds exactly `rowsPerShard` rows.
    */
  def shardAssignment(
      df: DataFrame,
      idCol: String,
      rowsPerShard: Long,
      seed: Int = 0,
      shardCol: String = "shard",
      posCol: String = "shard_pos",
      orderCol: String = "order_id"): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    graft.operators.Sampling.shuffleForTraining(df, idCol, seed, orderCol)
      .withColumn(shardCol, expr(s"`$orderCol` div $rowsPerShard"))
      .withColumn(posCol, expr(s"`$orderCol` % $rowsPerShard"))
  }

  /** Write `df` as `shard=N/` parquet directories (one file each) and
    * return the manifest: one row per shard with its row count and
    * min/max order bounds — the index a streaming trainer reads
    * first. The manifest is derived from the assignment (≤ one row
    * per shard — bounded), not from re-reading the written files.
    */
  def write(
      df: DataFrame,
      outDir: String,
      idCol: String,
      rowsPerShard: Long,
      seed: Int = 0): DataFrame = {
    val assigned = shardAssignment(df, idCol, rowsPerShard, seed)
    // One file per shard: cluster rows by shard id so each dynamic
    // partition is written by exactly one task.
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
    assigned
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("order_id")).as("first_order"),
        max(col("order_id")).as("last_order"))
  }

  /** Write PACKED TRAINING SEQUENCES ([[graft.functions.TextAnalysis
    * .packToShards]] output: `(seq_id, input_ids, …)`) as
    * `shard=N/` parquet directories, one file each, and return the
    * manifest. Sequences are already globally ordered by `seq_id`
    * (the packing stream), so shard assignment is plain
    * `seq_id div seqsPerShard` — contiguous token ranges per shard,
    * reproducible on any cluster, no extra shuffle beyond the
    * one-task-per-shard clustering write.
    */
  def writeSequences(
      seqs: DataFrame,
      outDir: String,
      seqsPerShard: Long,
      seqIdCol: String = "seq_id"): DataFrame = {
    require(seqsPerShard > 0, "seqsPerShard must be positive")
    val assigned = seqs.withColumn("shard", expr(s"`$seqIdCol` div $seqsPerShard"))
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(seqIdCol))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
    assigned
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_seqs"),
        min(col(seqIdCol)).as("first_seq"),
        max(col(seqIdCol)).as("last_seq"))
  }
}
