package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Each query is fully materialized through the `noop` v2 sink —
  * `count()` would let Catalyst prune computed columns and
  * under-measure narrow projections.
  */
object Bench {

  /** Fixed-cost calibration probe: a small deterministic aggregation
    * whose wall time depends only on scheduler + CPU availability —
    * the same work every call, so an inflated reading means the BOX
    * was loaded during that rep, not the query. Interleaved after
    * every measured rep (round-11 verdict: board-context noise was
    * the dominant error bar — q_ann_pq read 12.2 s mean vs 7.0 s min
    * on identical code — and the bench could not defend itself).
    */
  def probeOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(500000).selectExpr("sum(id * 7 % 13)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Drop reps whose interleaved probe inflated past
    * `factor × baseline` — the box was contended, the reading is not
    * the query's. If EVERY rep is flagged the readings are kept (a
    * uniformly loaded box is still internally comparable, and
    * reporting nothing would hide the query entirely) — the flag
    * count in the JSON is the tell.
    *
    * @param reps (querySeconds, probeSeconds) per successful rep
    * @return (kept query times, flagged-rep count)
    */
  def filterFlagged(
      reps: Seq[(Double, Double)],
      baseline: Double,
      factor: Double): (Seq[Double], Int) = {
    val (flagged, kept) = reps.partition(_._2 > baseline * factor)
    if (kept.isEmpty) (reps.map(_._1), flagged.length)
    else (kept.map(_._1), flagged.length)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Split single-file tables at row-group granularity: the sf1
      // testdata is one multi-row-group file per table, and the
      // default 128 MiB target would hand a whole table to one task.
      // No effect on the driver's single-row-group sf≤0.1 files; at
      // cluster scale tables arrive as many files and this just sets
      // a reasonable per-task bite.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/JIT and the parquet footer caches so the first
    // measured query doesn't absorb session startup (observed ~5 s),
    // then push tiny synthetic rows through each kernel family
    // (shingle/minhash/simhash, vector cosine/buckets, text counters,
    // calendar, prefix sum) — measured queries then see steady-state
    // kernels instead of paying their JIT (observed 1.5-2 s on the
    // alphabetically-first query of each family).
    import org.apache.spark.sql.functions._
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "documents", "embeddings").foreach { tbl =>
      try spark.read.parquet(s"$sfDir/$tbl.parquet").limit(1).collect()
      catch { case _: Throwable => }
    }
    def warm(df: => org.apache.spark.sql.DataFrame): Unit =
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // Surface (don't swallow) breakage: an un-warmed family lands
        // its JIT cost on its first measured query, invisibly.
        System.err.println(
          s"[bench] warm-up failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    val wDocs = spark.range(200).select(col("id"),
      concat_ws(" ", md5(col("id").cast("string")),
        md5((col("id") * 7).cast("string"))).as("text"))
    val wVecs = spark.range(100).select(col("id"),
      expr("transform(sequence(1, 64), i -> cast(pmod(id * i, 97) as float) / 97)")
        .as("embedding"))
    warm(graft.operators.Dedup.minHashLshPairs(wDocs, "text", "id", 5, 8, 2, 0.1))
    warm(graft.operators.Dedup.simHashPairs(wDocs, "text", "id", 28, 1, 2))
    warm(graft.operators.Dedup.duplicateClusters(
      spark.range(20).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))))
    warm(graft.operators.Similarity.ivfTopK(
      wVecs, wVecs.where(col("id") < 2), "embedding", "id", "id", 3, 10, 2))
    warm(graft.operators.Similarity.nearDupPairs(
      wVecs, "embedding", "id", 64, 0.8, numPlanes = 4, numTables = 2))
    warm(wDocs.select(
      graft.functions.TextAnalysis.languageId(col("text")),
      graft.functions.TextAnalysis.qualityScore(col("text")),
      graft.functions.TextAnalysis.tokenCountRegex(col("text")),
      graft.functions.TextAnalysis.fingerprint(col("text"))))
    warm(graft.functions.TextAnalysis.tfIdfTopK(wDocs, "text", "id", 2))
    warm(wDocs.select(
      graft.functions.TextAnalysis.repetitionSignals(col("text"))))
    warm(wDocs.select(
      graft.functions.TextAnalysis.entropySignals(col("text")),
      graft.functions.TextAnalysis.stripHtml(col("text"))))
    warm(graft.multimodal.Multimodal.dHash(
      graft.multimodal.Multimodal.synthesizePng(
        spark.range(64).toDF("doc_id"), "doc_id")))
    warm(wVecs.select(
      graft.functions.VectorFunctions.quantize8(col("embedding"))))
    warm(graft.multimodal.Multimodal.decodeImage(
      graft.multimodal.Multimodal.synthesizePng(
        spark.range(64).toDF("doc_id"), "doc_id")))
    // the javax.sound WAV family: container parse + PCM transform +
    // re-encode + re-decode — without this the alphabetically-first
    // audio query absorbs the whole codec JIT (round-10 observation:
    // q_audio_normalize vs q_audio_resample order artifact)
    warm(graft.multimodal.Multimodal.decodeWav(
      graft.multimodal.Multimodal.peakNormalizeWav(
        graft.multimodal.Multimodal.resampleWav(
          graft.multimodal.Multimodal.synthesizeWav(
            spark.range(64).toDF("doc_id"), "doc_id"),
          "payload", targetRate = 12000),
        "resampled", targetPeak = 30000),
      "normalized"))
    warm(graft.multimodal.Multimodal.aHash(
      graft.multimodal.Multimodal.synthesizeWav(
        spark.range(64).toDF("doc_id"), "doc_id"), "payload"))
    warm(wDocs.select(graft.functions.TextFunctions.jalaliDate(
      date_add(to_date(lit("1995-01-01")), col("id").cast("int")))))
    warm(graft.operators.Cumulative.withMovingAverage(
      wDocs, col("id"), col("id"), "m", 7))
    warm(graft.operators.Cumulative.withCumulativePercent(
      wDocs, col("id"), col("id"), "cp"))
    // Noise robustness (round-3 verdict: one contended run produced a
    // 3× outlier reading): measure each query `reps` times and report
    // the MEDIAN per query (plus the min, as the low-noise floor).
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    // Optional comma-separated query filter for targeted scale runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // A failed query must surface as FAILED — recording its wall time
    // would report time-to-exception as a (fake) speedup. Its entry
    // becomes {"err": "..."} and it is excluded from the totals.
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    // Self-defense against board-context noise: establish a quiet-box
    // probe baseline (median of 7 — the probe itself JIT-warms during
    // the first runs), then interleave one probe after every measured
    // rep and drop reps whose probe inflated past the factor.
    val flagFactor = sys.env.get("SPARK_GRAFT_PROBE_FACTOR")
      .flatMap(_.toDoubleOption).getOrElse(2.0)
    val warmupBaseline = {
      val ps = (1 to 7).map(_ => probeOnce(spark)).sorted
      ps(ps.length / 2)
    }
    // ORDER ROTATION (round-15 verdict ask #4): the old shape ran each
    // query's reps back-to-back in one alphabetical sweep, so every
    // rep of a late-alphabet query sampled the same end-of-board
    // JVM/GC state — the r15 standing record read q_welch/q_w* at
    // 4-5x their isolated times. Now each rep is a full board sweep
    // starting at a different rotation offset, so a query's reps
    // sample DIFFERENT board positions and the median sheds
    // position-correlated pressure.
    val nSel = selected.size
    val runsByName = scala.collection.mutable.Map.empty[
      String, Vector[Either[String, (Double, Double)]]]
    for (r <- 0 until reps) {
      val offset = if (nSel == 0) 0 else (r * nSel) / reps
      val order = selected.drop(offset) ++ selected.take(offset)
      for ((name, fn) <- order) {
        val t0 = System.nanoTime()
        val res: Either[String, (Double, Double)] = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val q = (System.nanoTime() - t0) / 1e9
          Right((q, probeOnce(spark)))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}")
        }
        runsByName(name) = runsByName.getOrElse(name, Vector.empty) :+ res
      }
    }
    val measured = selected.map { case (name, _) =>
      val runs = runsByName.getOrElse(name, Vector.empty)
      (name, runs.collectFirst { case Left(m) => m },
        runs.collect { case Right(p) => p })
    }
    // The baseline itself can be contended: if the box was loaded
    // during the 7-probe warm-up, every later rep passes the factor
    // test and the filter is silently disabled. Re-derive post hoc as
    // min(warm-up median, median of ALL interleaved probes) — a quiet
    // run pulls an inflated warm-up back down; a uniformly loaded box
    // leaves it unchanged (and the JSON's baseline/median ratio is
    // the red flag either way).
    val interleaved = measured.flatMap(_._3.map(_._2)).sorted
    val probeBaseline =
      if (interleaved.isEmpty) warmupBaseline
      else math.min(warmupBaseline, interleaved(interleaved.length / 2))
    if (probeBaseline < warmupBaseline / flagFactor) System.err.println(
      f"[bench] warm-up probe baseline ${warmupBaseline}%.3fs was itself " +
        f"contended (run median ${probeBaseline}%.3fs) - using the run-derived baseline")
    val results = measured.map { case (name, err, pairs) =>
      val (keptTimes, flagged) = filterFlagged(pairs, probeBaseline, flagFactor)
      if (flagged > 0) System.err.println(
        s"[bench] $name: $flagged/$reps reps flagged (probe > " +
          f"$flagFactor%.1fx baseline ${probeBaseline}%.3fs)")
      (name, err, keptTimes.sorted, flagged, pairs.map(_._2))
    }
    val failed = results.filter(_._2.nonEmpty)
    if (failed.nonEmpty) System.err.println(
      s"[bench] ${failed.length} queries FAILED: ${failed.map(_._1).mkString(", ")}")
    def cell(err: Option[String], t: Seq[Double], pick: Seq[Double] => Double) =
      err match {
        case Some(m) => s"""{"err":"${esc(m)}"}"""
        case None    => pick(t).toString
      }
    val qs = results.map { case (k, err, t, _, _) =>
      "\"" + k + "\":" + cell(err, t, ts => ts(ts.length / 2))
    }.mkString("{", ",", "}")
    val qsMin = results.map { case (k, err, t, _, _) =>
      "\"" + k + "\":" + cell(err, t, _.head)
    }.mkString("{", ",", "}")
    val ok = results.filter(_._2.isEmpty)
    val total = ok.map { case (_, _, t, _, _) => t(t.length / 2) }.sum
    val totalMin = ok.map(_._3.head).sum
    val failedJson = failed.map(f => "\"" + f._1 + "\"").mkString("[", ",", "]")
    val flaggedReps = results.map(_._4).sum
    val allProbes = results.flatMap(_._5).sorted
    val probeMedian =
      if (allProbes.isEmpty) probeBaseline else allProbes(allProbes.length / 2)
    // A run with >10% of its reps probe-flagged is a CONTENDED
    // reading and must refuse to be the record (round-13 verdict:
    // BENCH_LAST with 30 flagged reps overstated the board by 1.4×) —
    // the field lets sf1_gate.sh and any reader detect-and-retry
    // instead of trusting the headline number.
    val contended = allProbes.nonEmpty &&
      flaggedReps.toDouble / allProbes.length > 0.10
    if (contended) System.err.println(
      s"[bench] CONTENDED run: $flaggedReps/${allProbes.length} reps " +
        "flagged (>10%) - this reading is not record-quality; rerun on a quiet box")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"failed":$failedJson,"contended":$contended,"queries":$qs,"total_min":$totalMin,"queries_min":$qsMin,"probe_baseline":$probeBaseline,"probe_warmup_baseline":$warmupBaseline,"probe_median":$probeMedian,"probe_flag_factor":$flagFactor,"flagged_reps":$flaggedReps,"sf":"$sfDir"}"""
    println(json)
    // The driver keeps only the stdout tail, which truncates the full
    // query map (round-5 BENCH artifact parsed as null). Always write
    // the same JSON to a file: SPARK_GRAFT_BENCH_OUT when set, and
    // BENCH_LAST.json as the standing FULL-BOARD copy. Neither a
    // targeted SPARK_GRAFT_BENCH_ONLY run nor a non-default-SF run
    // (sf1_gate's final sf1 bench) may clobber it — the driver reads
    // BENCH_LAST.json as the full sf0.1 board; non-default-SF runs
    // route through SPARK_GRAFT_BENCH_OUT instead.
    val defaultSf = sys.env.contains("SPARK_GRAFT_SF_DIR") == false ||
      sfDir == "/root/testdata/sf0.1"
    val outs = sys.env.get("SPARK_GRAFT_BENCH_OUT").toSeq ++
      (if (only.isEmpty && defaultSf) Seq("BENCH_LAST.json") else Nil)
    outs.foreach { path =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $path: ${e.getMessage}")
      }
    }
    // The driver keeps a ~2 KB stdout TAIL; the full line above is
    // ~16 KB, so it has parsed as null in every BENCH_rNN artifact
    // (16 straight rounds). Print a compact totals-only summary as
    // the FINAL stdout line so the tail always ends with parseable
    // JSON — same methodology, same run, no queries map (that stays
    // in the first line, BENCH_LAST.json and SPARK_GRAFT_BENCH_OUT).
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"n_queries":${results.length},"n_failed":${failed.length},"contended":$contended,"total_min":$totalMin,"probe_baseline":$probeBaseline,"probe_median":$probeMedian,"flagged_reps":$flaggedReps,"sf":"$sfDir","queries_in":"BENCH_LAST.json"}""")
    spark.stop()
  }
}
