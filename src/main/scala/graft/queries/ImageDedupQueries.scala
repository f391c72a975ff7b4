package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Image perceptual-hash (dHash) near-duplicate detection over REAL
  * decoded bytes: deterministic 24-bit BMPs are synthesized in-query
  * (20 base gradient patterns × 3 variants, variants 1/2 perturbing
  * one 4×4 pixel cell each), round-tripped through the byte encoder
  * and the real BITMAPINFOHEADER parser (bottom-up rows, BGR,
  * padding), grid-pooled to 9×8 exact integer luma sums, difference-
  * hashed to 64 bits, then paired via 16-bit LSH bands and verified by
  * exact hamming distance ≤ 3.
  *
  * Scale shape: identical to the SimHash/MinHash discipline —
  * candidate generation is an equi-join on (band, value), never
  * all-pairs, so comparisons are bounded by bucket sizes; the hash is
  * 2×32 bits in BIGINT halves so band extraction and hamming are
  * sign-free in any engine. By 4-band/16-bit pigeonhole, hamming ≤ 3
  * ⟹ at least one band matches: exact recall at the reported cut.
  *
  * The DuckDB oracle replays the pixel formula STRUCTURALLY (no byte
  * container) — so a single byte-offset, padding, or row-order bug in
  * the BMP writer OR parser changes the cell sums and breaks the
  * hash compare. All arithmetic is integer-exact end to end.
  */
object ImageDedupQueries {

  private val N      = 60 // 20 bases x 3 variants
  private val W      = 36
  private val H      = 32
  private val GridW  = 9
  private val GridH  = 8

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_image_dhash_neardup",
      (s, _) => {
        val hashUdf = udf { (id: Long) =>
          val b = (id / 3).toInt
          val v = (id % 3).toInt
          val bytes = MultimodalOps.synthesizeBmp24(W, H, (x, y) => {
            val pert =
              if (v == 1 && x / 4 == 2 && y / 4 == 3) 120
              else if (v == 2 && x / 4 == 5 && y / 4 == 6) 120
              else 0
            val r = (x * 7 + y * 3 + b * 13 + pert) % 256
            val g = (x * 5 + y * 11 + b * 29 + pert) % 256
            val bb = (x * 3 + y * 7 + b * 41 + pert) % 256
            (r, g, bb)
          })
          val cells = MultimodalOps.bmpGrayGridSums(bytes, GridW, GridH).get
          MultimodalOps.dhashBits(cells, GridW, GridH)
        }
        val hashed = s.range(0, N.toLong)
          .withColumn("h", hashUdf(col("id")))
          .select(col("id"), col("h._1").as("lo"), col("h._2").as("hi"))
        val bands = hashed.select(
          col("id"), col("lo"), col("hi"),
          posexplode(array(
            col("lo").bitwiseAND(lit(0xffffL)),
            shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL)),
            col("hi").bitwiseAND(lit(0xffffL)),
            shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL))
          )).as(Seq("k", "bv")))
        val a = bands.as("a")
        val b = bands.as("b")
        a.join(b,
            col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
              col("a.id") < col("b.id"))
          .select(
            col("a.id").as("img_a"), col("b.id").as("img_b"),
            col("a.lo").as("alo"), col("a.hi").as("ahi"),
            col("b.lo").as("blo"), col("b.hi").as("bhi"))
          .distinct()
          .withColumn("hamming",
            (bit_count(col("alo").bitwiseXOR(col("blo"))) +
              bit_count(col("ahi").bitwiseXOR(col("bhi")))).cast("bigint"))
          .filter(col("hamming") <= 3)
          .select(col("img_a"), col("img_b"), col("hamming"))
      },
      Some(s"""
        WITH imgs AS (
          SELECT CAST(i AS BIGINT) AS id, CAST(i // 3 AS BIGINT) AS b, CAST(i % 3 AS BIGINT) AS v
          FROM RANGE(0, $N) t(i)
        ),
        cells AS (
          SELECT id, y // 4 AS cy, x // 4 AS cx,
            SUM(
              299 * ((x*7 + y*3 + b*13
                + CASE WHEN v = 1 AND x // 4 = 2 AND y // 4 = 3 THEN 120
                       WHEN v = 2 AND x // 4 = 5 AND y // 4 = 6 THEN 120
                       ELSE 0 END) % 256)
              + 587 * ((x*5 + y*11 + b*29
                + CASE WHEN v = 1 AND x // 4 = 2 AND y // 4 = 3 THEN 120
                       WHEN v = 2 AND x // 4 = 5 AND y // 4 = 6 THEN 120
                       ELSE 0 END) % 256)
              + 114 * ((x*3 + y*7 + b*41
                + CASE WHEN v = 1 AND x // 4 = 2 AND y // 4 = 3 THEN 120
                       WHEN v = 2 AND x // 4 = 5 AND y // 4 = 6 THEN 120
                       ELSE 0 END) % 256)) AS cell
          FROM imgs, RANGE(0, $W) tx(x), RANGE(0, $H) ty(y)
          GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT a.id, a.cy * 8 + a.cx AS i,
            CASE WHEN a.cell < n.cell THEN 1 ELSE 0 END AS bit
          FROM cells a JOIN cells n ON n.id = a.id AND n.cy = a.cy AND n.cx = a.cx + 1
          WHERE a.cx < 8
        ),
        hashes AS (
          SELECT id,
            CAST(SUM(CASE WHEN i < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS BIGINT) AS lo,
            CAST(SUM(CASE WHEN i >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
          FROM bits GROUP BY 1
        ),
        bands AS (
          SELECT id, lo, hi, k,
            CASE k WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                   WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS bv
          FROM hashes, RANGE(0, 4) t(k)
        ),
        cand AS (
          SELECT DISTINCT a.id AS img_a, b.id AS img_b,
            a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
          FROM bands a JOIN bands b ON a.k = b.k AND a.bv = b.bv AND a.id < b.id
        )
        SELECT img_a, img_b,
          CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
      """)
    )
  )
}
