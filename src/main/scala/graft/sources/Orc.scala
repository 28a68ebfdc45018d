package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC ingest/egress — the columnar interchange twin of the parquet
  * path for corpora arriving from Hive-era estates (ORC is the other
  * splittable, statistics-bearing columnar format a 100 TB corpus
  * actually shows up in). Spark's native `orc` source gives the same
  * scan-time machinery as parquet: column pruning, predicate
  * pushdown into row-group/stripe statistics (`PushedFilters` in the
  * plan — OrcSpec pins it), and splittable stripes, so every graft
  * operator runs unchanged over an ORC-backed frame.
  *
  * Same contract discipline as [[Jsonl]]/[[Csv]]: EXPLICIT schema on
  * read (schema inference is a wasted extra footer pass, and a
  * drifting vendor schema should fail loudly, not silently widen) —
  * missing columns read as nulls, extra columns are pruned by the
  * requested schema.
  */
object Orc {

  /** Write `df` as ORC at `path`. `zstd` default: the best
    * size/speed trade of the codecs ORC ships, and splittable
    * regardless of codec (stripe-level compression).
    */
  def writeOrc(
      df: DataFrame,
      path: String,
      compression: String = "zstd"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .orc(path)

  /** Distributed ORC read with the explicit-schema contract. */
  def readOrc(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
