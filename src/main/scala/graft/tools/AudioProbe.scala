package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Single-threaded micro-probe of the javax.sound WAV path — which
  * stage of decode → transform → re-encode actually costs: the
  * provider lookup in `AudioSystem.getAudioInputStream`, the stream
  * read, or `AudioSystem.write`. Drives the per-row cost budget of
  * the audio operators ([[graft.multimodal.Multimodal]]).
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = 20000
    // one representative payload (~200 samples, like the testdata)
    val pcm = new Array[Byte](200 * 2)
    var i = 0
    while (i < 200) { pcm(2 * i) = (i % 97).toByte; pcm(2 * i + 1) = 1; i += 1 }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos0 = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 200L),
      AudioFileFormat.Type.WAVE, bos0)
    val wav = bos0.toByteArray

    def time(label: String)(f: => Unit): Unit = {
      // warm
      var k = 0; while (k < 2000) { f; k += 1 }
      val t0 = System.nanoTime()
      k = 0; while (k < n) { f; k += 1 }
      val us = (System.nanoTime() - t0) / 1000.0 / n
      println(f"[audioprobe] $label%-28s ${us}%9.2f us/row")
    }

    time("getAudioInputStream only") {
      AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav)).close()
    }
    time("decode (get+readAllBytes)") {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      ais.readAllBytes(); ais.close()
    }
    time("encode (AudioSystem.write)") {
      val bos = new ByteArrayOutputStream(1024)
      AudioSystem.write(
        new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 200L),
        AudioFileFormat.Type.WAVE, bos)
    }
    time("decode+encode round trip") {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val d = ais.readAllBytes(); ais.close()
      val bos = new ByteArrayOutputStream(1024)
      AudioSystem.write(
        new AudioInputStream(new ByteArrayInputStream(d), fmt, d.length / 2L),
        AudioFileFormat.Type.WAVE, bos)
    }

    // contention check: the same round trip on 32 threads at once —
    // if AudioSystem's provider discovery synchronizes per call, the
    // aggregate rate collapses to ~single-thread
    {
      val threads = 32
      val perThread = 5000
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var k = 0
            while (k < perThread) {
              val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
              val d = ais.readAllBytes(); ais.close()
              val bos = new ByteArrayOutputStream(1024)
              AudioSystem.write(
                new AudioInputStream(new ByteArrayInputStream(d), fmt, d.length / 2L),
                AudioFileFormat.Type.WAVE, bos)
              k += 1
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val total = threads.toLong * perThread
      val us = (System.nanoTime() - t0) / 1000.0 / total
      println(f"[audioprobe] 32-thread round trip        ${us}%9.2f us/row aggregate (ideal = single/32)")
    }

    // distributed chain, stage by stage, against a real SF dir
    sys.env.get("SPARK_GRAFT_SF_DIR").foreach { dir =>
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions.col
      import graft.multimodal.Multimodal
      val ids = graft.operators.Parallelism.spread(
        spark.read.parquet(s"$dir/documents.parquet").select("doc_id"))
      def stage(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[audioprobe] stage $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      stage("ids only")(ids)
      stage("synth")(Multimodal.synthesizeWav(ids, "doc_id"))
      stage("synth+decode")(
        Multimodal.decodeWav(Multimodal.synthesizeWav(ids, "doc_id"), "payload"))
      stage("synth+resample")(
        Multimodal.resampleWav(
          Multimodal.synthesizeWav(ids, "doc_id"), "payload", targetRate = 12000))
      stage("synth+resample+decode")(
        Multimodal.decodeWav(
          Multimodal.resampleWav(
            Multimodal.synthesizeWav(ids, "doc_id"), "payload", targetRate = 12000),
          "resampled"))
    }
  }
}
