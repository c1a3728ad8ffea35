package graft.tools

/** Driver-local breakdown of the VideoCodec fixture+decode cost for one
  * partition's worth of docs (no Spark). */
object ProfileVid {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1500)
    val ids = (0L until n.toLong)
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val frames = ids.map(id =>
        (0 until graft.multimodal.Multimodal.VideoCodec.nFrames(id))
          .map(f => graft.multimodal.Multimodal.VideoCodec.frameImage(id, f)))
      println(f"[vid] r$rep frameImage   ${(System.nanoTime() - t0) / 1e9}%6.2fs (${frames.map(_.size).sum} frames)")
      t0 = System.nanoTime()
      val payloads = graft.multimodal.Multimodal.VideoCodec
        .encodeAll(ids.iterator).map(_._2).toArray
      println(f"[vid] r$rep encodeAll    ${(System.nanoTime() - t0) / 1e9}%6.2fs (${payloads.map(_.length.toLong).sum / 1000000} MB)")
      t0 = System.nanoTime()
      val in = ids.iterator.zip(payloads.iterator).map { case (id, p) =>
        val step = (graft.multimodal.Multimodal.VideoCodec.nFrames(id) + 3) / 4
        ((), p, (f: Int) => f % step == 0)
      }
      val decoded = graft.multimodal.Multimodal.VideoCodec
        .decodeSampledAll(in).map(_._3.size).sum
      println(f"[vid] r$rep decodeSample ${(System.nanoTime() - t0) / 1e9}%6.2fs ($decoded frames)")
    }
  }
}
