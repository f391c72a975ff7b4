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
}
