package graft.tools

import java.util.concurrent.Executors

/** Single-thread vs multi-thread AudioCodec cost — isolates the
  * AudioSystem registry lock from real codec work. */
object ProfileAud {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val ids = (0L until n.toLong).toArray
    def work(chunk: Array[Long]): Long =
      graft.multimodal.Multimodal.AudioCodec
        .roundTripAll(chunk.iterator).map(_.abs_sum).sum
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val acc = work(ids)
      println(f"[aud] r$rep single-thread ${(System.nanoTime() - t0) / 1e9}%6.2fs ($acc)")
      val pool = Executors.newFixedThreadPool(32)
      t0 = System.nanoTime()
      val futs = ids.grouped(n / 32 + 1).map { chunk =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = work(chunk)
        })
      }.toList
      val tot = futs.map(_.get()).sum
      println(f"[aud] r$rep 32-thread     ${(System.nanoTime() - t0) / 1e9}%6.2fs ($tot)")
      pool.shutdown()
    }
  }
}
