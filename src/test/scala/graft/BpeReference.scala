package graft

/** Independent in-memory BPE trainer (Sennrich symbol-list merge with
  * an explicit left-to-right skip-two scan) — the reference the
  * distributed doubled-delimiter trainer must match merge for merge.
  * Shared by the 3-step generative property (PropertySpec) and the
  * 50-step scale-envelope pin (BpeSpec). */
object BpeReference {
  def refBpeMerges(words: Seq[String], steps: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Int]) = {
    val freq = words.filter(_.nonEmpty).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    // symbol vectors concatenate back to the word, so distinct words
    // stay distinct keys through every merge
    var vocab: Map[Vector[String], Long] =
      freq.map { case (w, f) => w.map(_.toString).toVector -> f }
    val picks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, s"$x $y") }
        picks += ((step.toLong, s"$a $b", a + b, c))
        vocab = vocab.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        step += 1
      }
    }
    val encoded = vocab.map { case (syms, _) => syms.mkString -> syms.length }
    (picks.toSeq, encoded)
  }
}
