package graft

import graft.operators.MultimodalOps

/** Regenerates the JPEG decode goldens (VERDICT r9 #3).
  *
  * Writes `tools/fixtures/jpeg/img_<id>.jpg` (the JDK-encoded bytes the
  * independent python decoder re-decodes) plus `golden.json` (per-image
  * md5, grid luma sums, dhash halves, and the PRE-ENCODE ground-truth
  * cell sums so both the spec and tools/check_jpeg.py can grade decode
  * error against the lossless source), and prints the oracle VALUES
  * rows to paste into JpegQueries if the images ever change.
  *
  * Same discipline as tools/golden_values.py: goldens are REGENERABLE
  * from a committed recipe and cross-checked by an independent
  * implementation, never hand-typed.
  */
object JpegGoldenGen {
  val N     = 12
  val W     = 36
  val H     = 32
  val GridW = 9
  val GridH = 8
  val Quality = 0.9f

  /** Deterministic grayscale test pattern: per-image paraboloid (vertex
    * position keyed by the image id) plus a bilinear term. Two design
    * constraints, both learned the hard way:
    *  - stays inside [0,255] WITHOUT mod-wrap — sawtooth edges from a
    *    mod-256 pattern smear ~70 gray levels under JPEG and would make
    *    the "decoded output tracks the lossless source" tolerance leg
    *    meaningless;
    *  - NON-monotone in x (rising and falling flanks around the vertex)
    *    — a pure gradient makes every dhash gradient-sign bit 1 and the
    *    hash degenerate. */
  def gray(b: Int)(x: Int, y: Int): Int = {
    val px = 5 + (b * 7) % 25
    val py = 4 + (b * 5) % 23
    30 + b +
      ((x - px) * (x - px) * 100) / ((W - 1) * (W - 1)) +
      ((y - py) * (y - py) * 60) / ((H - 1) * (H - 1)) +
      (x * y * (b % 4) * 15) / ((W - 1) * (H - 1))
  }

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("tools/fixtures/jpeg")
    java.nio.file.Files.createDirectories(dir)
    val sb  = new StringBuilder("[\n")
    val sql = new StringBuilder()
    for (b <- 0 until N) {
      val bytes = MultimodalOps.synthesizeJpegGray(W, H, gray(b), Quality)
      java.nio.file.Files.write(dir.resolve(f"img_$b%02d.jpg"), bytes)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      val cells = MultimodalOps.decodeImageGridSums(bytes, GridW, GridH).get
      val (lo, hi) = MultimodalOps.dhashBits(cells, GridW, GridH)
      // lossless ground truth for the tolerance legs
      val truth = new Array[Long](GridW * GridH)
      for (y <- 0 until H; x <- 0 until W)
        truth((y / (H / GridH)) * GridW + x / (W / GridW)) += 1000L * gray(b)(x, y)
      val maxCellErr = cells.zip(truth).map { case (c, t) =>
        math.abs(c - t) / (1000.0 * (W / GridW) * (H / GridH))
      }.max
      if (b > 0) sb.append(",\n")
      sb.append(s"""  {"id": $b, "md5": "$md5", "byte_len": ${bytes.length}, """)
        .append(s""""dhash_lo": $lo, "dhash_hi": $hi, """)
        .append(s""""cells": [${cells.mkString(",")}], """)
        .append(s""""truth_cells": [${truth.mkString(",")}]}""")
      if (b > 0) sql.append(",\n")
      sql.append(s"          ($b, ${bytes.length}, $W, $H, ${cells.sum}, $lo, $hi)")
      println(f"img_$b%02d len=${bytes.length}%5d maxCellErr=$maxCellErr%.2f gray-levels lo=$lo hi=$hi")
    }
    sb.append("\n]\n")
    java.nio.file.Files.writeString(dir.resolve("golden.json"), sb.toString)
    println("\n-- oracle VALUES (image_id, byte_len, width, height, luma_sum, dhash_lo, dhash_hi):")
    println(sql.toString)
  }
}
