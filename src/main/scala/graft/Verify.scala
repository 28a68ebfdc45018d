package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only the named queries (dev targeting;
    // the driver always passes exactly two args)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // row-group-granular splits for derived sf1 data (see Bench)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Reconcile: every query key must yield a result dir. A failure is
    // recorded in errors.json and listed loudly — 6 queries silently
    // absent from the round-7 artifact read as "missing", not "red".
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // A decimal with precision > 18 in an OUTPUT schema materializes
    // asymmetrically across readers (arrow decimal128 → python Decimal
    // vs HUGEINT-backed engines → float64): equal values, different
    // hashes (the round-12 q_rollup_card escape). Ban the class at the
    // dump boundary — operators convert ONCE (BIGINT/DOUBLE) after
    // their exact DECIMAL accumulation.
    def wideDecimals(dt: org.apache.spark.sql.types.DataType,
        path: String): Seq[String] = dt match {
      case d: org.apache.spark.sql.types.DecimalType if d.precision > 18 =>
        Seq(s"$path: $d")
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.toSeq.flatMap(f => wideDecimals(f.dataType, s"$path.${f.name}"))
      case a: org.apache.spark.sql.types.ArrayType =>
        wideDecimals(a.elementType, s"$path[]")
      case m: org.apache.spark.sql.types.MapType =>
        wideDecimals(m.keyType, s"$path<key>") ++
          wideDecimals(m.valueType, s"$path<val>")
      case _ => Nil
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val wide = df.schema.fields.toSeq
            .flatMap(f => wideDecimals(f.dataType, f.name))
          require(wide.isEmpty,
            s"output decimal precision > 18 (reader-asymmetric): ${wide.mkString(", ")}")
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}"
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // Final reconciliation: a key with neither a result dir nor an
    // error entry means the loop itself was skipped — make that loud.
    val expected = SparkEntry.queries.keySet
      .filter(k => only.isEmpty || only.contains(k))
    val missing = expected.filter(k =>
      !new java.io.File(s"$outDir/$k").exists() && !errors.contains(k))
    if (errors.nonEmpty) System.err.println(
      s"[verify] ${errors.size} queries FAILED (see errors.json): ${errors.keys.mkString(", ")}")
    if (missing.nonEmpty) System.err.println(
      s"[verify] ${missing.size} queries produced NO result and NO error: ${missing.toSeq.sorted.mkString(", ")}")
    if (errors.isEmpty && missing.isEmpty) System.err.println(
      s"[verify] all ${expected.size} query keys accounted for")
    spark.stop()
  }
}
