package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Micro-probe of ImageIO decode/encode thread scaling — does the
  * per-call reader/writer registry lookup serialize executor threads
  * like javax.sound's provider path does (see [[AudioProbe]])?
  */
object ImageProbe {
  def main(args: Array[String]): Unit = {
    ImageIO.setUseCache(false)
    val png = graft.multimodal.Multimodal.pngBytes(42L)

    def roundTrip(): Unit = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      val bos = new ByteArrayOutputStream(1024)
      ImageIO.write(img, "png", bos)
    }

    // single-thread baseline
    var k = 0; while (k < 2000) { roundTrip(); k += 1 }
    val n = 20000
    var t0 = System.nanoTime()
    k = 0; while (k < n) { roundTrip(); k += 1 }
    val single = (System.nanoTime() - t0) / 1000.0 / n
    println(f"[imageprobe] single-thread round trip ${single}%9.2f us/row")

    // 32-thread aggregate
    val threads = 32
    val perThread = 3000
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    t0 = System.nanoTime()
    val futs = (0 until threads).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = { var j = 0; while (j < perThread) { roundTrip(); j += 1 } }
      })
    }
    futs.foreach(_.get())
    pool.shutdown()
    val agg = (System.nanoTime() - t0) / 1000.0 / (threads.toLong * perThread)
    println(f"[imageprobe] 32-thread round trip    ${agg}%9.2f us/row aggregate (ideal = single/32 = ${single / 32}%.2f)")

    // ---- JPEG: registry ImageIO.read vs the per-thread cached reader
    // (graft.multimodal.Multimodal.readImageCodec). The PNG fix alone
    // left JPEG/GIF/BMP on the contended registry path; this section
    // measures whether the format-keyed ThreadLocal cache restores
    // near-linear 32-thread scaling for a JPEG batch.
    val img0 = ImageIO.read(new ByteArrayInputStream(png))
    val jbos = new ByteArrayOutputStream(4096)
    ImageIO.write(img0, "jpeg", jbos)
    val jpeg = jbos.toByteArray

    def bench(label: String, decode: () => Unit): (Double, Double) = {
      var i = 0; while (i < 2000) { decode(); i += 1 }
      val nn = 20000
      var t = System.nanoTime()
      i = 0; while (i < nn) { decode(); i += 1 }
      val s1 = (System.nanoTime() - t) / 1000.0 / nn
      val p = java.util.concurrent.Executors.newFixedThreadPool(threads)
      t = System.nanoTime()
      val fs = (0 until threads).map { _ =>
        p.submit(new Runnable {
          def run(): Unit = { var j = 0; while (j < perThread) { decode(); j += 1 } }
        })
      }
      fs.foreach(_.get())
      p.shutdown()
      val a = (System.nanoTime() - t) / 1000.0 / (threads.toLong * perThread)
      println(f"[imageprobe] $label%-28s single $s1%8.2f us/row   32-thread $a%8.2f us/row aggregate   scaling ${s1 / a}%5.1fx")
      (s1, a)
    }
    bench("jpeg ImageIO.read (registry)",
      () => ImageIO.read(new ByteArrayInputStream(jpeg)))
    bench("jpeg cached reader",
      () => graft.multimodal.Multimodal.readImageCodec(jpeg))
    bench("png cached reader",
      () => graft.multimodal.Multimodal.readImageCodec(png))
  }
}
