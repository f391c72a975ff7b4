package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.CorporateActions

/** The FULL corporate-action detection pipeline (SURVEY.md §2.I row 67;
  * ref stg_corporate_actions.sql, all 4 branches):
  *
  *   1. splits_api  — authoritative events (synthesized: top-2 volume
  *      days per symbol), run through the date BACK-SHIFT: if the bar
  *      before the official date already shows the 1/factor price gap
  *      (±10%, factor ≥ 1.2), the event moves to that bar's date
  *      (ref :41-83).
  *   2. api_reported — bars whose (synthesized) split_factor != 1.
  *   3. heuristic   — open/prev_close ratio near a clean reciprocal,
  *      only on bars with no reported factor (ref :104-144).
  *   4. dividend    — bars with dividend > 0; always pass through the
  *      final dedup (ref :148-159).
  *
  * Final combine (ref :170-205): back-shifted API splits always win;
  * api_reported/heuristic SPLIT rows within ±5 days of an API split
  * drop; dividends pass.
  *
  * Synthetic raw columns are md5-keyed so both engines derive the
  * identical fixture: split_factor_raw = 2 on ~1/256 of bars, dividend
  * = low*0.01 on ~1/16 of bars.
  */
object CorporateActionQueries {

  // heuristic targets restricted to exact binary reciprocals so the
  // factor literals (2.0, 4.0, 0.5) and tolerances are bit-identical
  // in both engines; the 8-target production list lives on the operator
  private val targets   = Seq(0.5, 0.25, 2.0)
  private val tolerance = 0.05

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_corporate_actions_full",
      (s, dir) => {
        val b = ModelQueries.bars(s, dir).cache()
        val hx = md5(concat_ws("|", col("symbol"), col("d").cast("string")))
        val dx = md5(concat_ws("|", lit("div"), col("symbol"), col("d").cast("string")))
        val b2 = b
          .withColumn("split_factor_raw",
            when(substring(hx, 1, 2) === "00", lit(2.0)).otherwise(lit(1.0)))
          .withColumn("dividend",
            when(substring(dx, 1, 1) === "0", col("low") * 0.01))

        val wVol = Window.partitionBy(col("symbol")).orderBy(col("volume").desc, col("d"))
        val api = b
          .withColumn("rn", row_number().over(wVol))
          .filter(col("rn") <= 2)
          .select(col("symbol"), col("d"), lit(2.0).as("split_factor"))
        val shifted = CorporateActions
          .backShiftApiSplits(api, b, Seq("symbol"), "d")
          .select(col("symbol"), col("d"), lit("split").as("action_type"),
            col("split_factor"), lit(0.0).as("dividend_amount"),
            lit("splits_api").as("detection_method"))

        val apiRep = b2
          .filter(col("split_factor_raw") =!= 1.0)
          .select(col("symbol"), col("d"), lit("split").as("action_type"),
            col("split_factor_raw").as("split_factor"), lit(0.0).as("dividend_amount"),
            lit("api_reported").as("detection_method"))
        val heur = CorporateActions
          .detectHeuristicSplits(b2, Seq("symbol"), "d",
            targets = targets, tolerance = tolerance,
            gate = col("split_factor_raw") === 1.0)
          .select(col("symbol"), col("d"), lit("split").as("action_type"),
            col("split_factor"), lit(0.0).as("dividend_amount"),
            lit("heuristic").as("detection_method"))
        val divs = CorporateActions.detectDividends(b2, Seq("symbol"), "d", "dividend")
          .select("symbol", "d", "action_type", "split_factor", "dividend_amount", "detection_method")

        CorporateActions.combineDetections(
          shifted, apiRep.unionByName(heur).unionByName(divs),
          Seq("symbol"), "d", days = 5)
      },
      Some {
        val heurCase = targets
          .map(r => s"WHEN ABS(ratio - ($r)) <= (${tolerance * r}) THEN (${1.0 / r})")
          .mkString(" ")
        s"""
        WITH ${ModelQueries.barsSqlPublic},
        b2 AS (
          SELECT *,
            CASE WHEN SUBSTR(md5(symbol || '|' || CAST(d AS VARCHAR)), 1, 2) = '00'
                 THEN 2.0 ELSE 1.0 END AS split_factor_raw,
            CASE WHEN SUBSTR(md5('div|' || symbol || '|' || CAST(d AS VARCHAR)), 1, 1) = '0'
                 THEN low * 0.01 END AS dividend
          FROM bars
        ),
        api AS (
          SELECT symbol, d, 2.0 AS split_factor FROM (
            SELECT symbol, d,
              ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY volume DESC, d) AS rn
            FROM bars
          ) WHERE rn <= 2
        ),
        pri AS (
          SELECT symbol, d, open,
            LAG(close) OVER (PARTITION BY symbol ORDER BY d) AS prev_close
          FROM bars
        ),
        shift AS (
          SELECT symbol,
            CASE WHEN split_factor >= 1.2 AND prev_close IS NOT NULL
                      AND prev_close > 0 AND p_open > 0
                      AND ABS(p_open / prev_close - 1.0 / split_factor)
                          / (1.0 / split_factor) < 0.10
                 THEN p_d ELSE d END AS d,
            'split' AS action_type, split_factor,
            0.0 AS dividend_amount, 'splits_api' AS detection_method
          FROM (
            SELECT a.symbol, a.d, a.split_factor,
              p.d AS p_d, p.open AS p_open, p.prev_close,
              ROW_NUMBER() OVER (PARTITION BY a.symbol, a.d ORDER BY p.d DESC) AS rn
            FROM api a LEFT JOIN pri p ON a.symbol = p.symbol AND p.d < a.d
          ) WHERE rn = 1
        ),
        ohlc AS (
          SELECT symbol, d, 'split' AS action_type,
            split_factor_raw AS split_factor,
            0.0 AS dividend_amount, 'api_reported' AS detection_method
          FROM b2 WHERE split_factor_raw != 1.0
          UNION ALL
          SELECT symbol, d, 'split', CASE $heurCase END, 0.0, 'heuristic'
          FROM (
            SELECT symbol, d, split_factor_raw,
              open / LAG(close, 1) OVER (PARTITION BY symbol ORDER BY d) AS ratio
            FROM b2
          )
          WHERE split_factor_raw = 1.0 AND CASE $heurCase END IS NOT NULL
          UNION ALL
          SELECT symbol, d, 'dividend', 1.0, dividend, 'api_reported'
          FROM b2 WHERE dividend IS NOT NULL AND dividend > 0
        )
        SELECT * FROM shift
        UNION ALL
        SELECT o.* FROM ohlc o
        WHERE NOT (o.action_type = 'split' AND EXISTS (
          SELECT 1 FROM shift s
          WHERE s.symbol = o.symbol AND ABS(o.d - s.d) <= 5
        ))
      """
      }
    )
  )
}
