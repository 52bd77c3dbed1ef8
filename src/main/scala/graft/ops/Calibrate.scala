package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic probability calibration — pool-adjacent-violators (Ayer et
  * al. 1955; sklearn's `IsotonicRegression`/`CalibratedClassifierCV`
  * isotonic mode). Platt-style parametric calibration assumes a
  * sigmoid miscalibration shape; PAV fits the BEST monotone map from
  * raw score to empirical fraud rate, which is what a threshold-picker
  * (A17) or an expected-cost ranker actually needs.
  *
  * Input is quantized scores (caller buckets, e.g. `floor(proba*100)`)
  * with 0/1 labels. The operator:
  *  1. one distributed grouped count → per-bucket (n, Σy) — the only
  *     pass over data;
  *  2. PAV over the score-sorted bucket histogram: merge adjacent
  *     blocks while the left mean exceeds the right (violation test
  *     `y_l·n_r > y_r·n_l` on exact integers — no doubles until the
  *     final rate), a genuinely sequential O(B) stack fold executed in
  *     ONE task via `mapPartitions` over the coalesced histogram.
  *     B is capped by the quantization grid, not by rows, so the
  *     sequential step is O(grid) however large the corpus.
  *
  * The DuckDB oracle deliberately computes the SAME function by a
  * different algorithm — the minimax closed form
  * `fitted_i = max_{j≤i} min_{k≥i} mean(y_{j..k})` over prefix-sum
  * pairs (O(B²), fine for an oracle) — so a shared implementation bug
  * cannot self-confirm; both sides reduce to ratios of the same exact
  * integers, hence bit-identical doubles.
  */
object Calibrate {

  /** Per-bucket calibration frame `(score, n, y, fitted)`, `fitted`
    * non-decreasing in `score`. `scoreCol` must be integral (cast
    * upstream), `labelCol` 0/1.
    */
  def isotonicFit(df: DataFrame, scoreCol: String,
                  labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("y"))
      .as[(Long, Long, Long)]
    hist.coalesce(1).sortWithinPartitions(col("score"))
      .mapPartitions { it =>
        val buckets = it.toArray // sorted by score; O(grid) by contract
        // stack blocks: (start bucket index, pooled n, pooled y)
        val stack = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, Long)]
        for (i <- buckets.indices) {
          var (s, n, y) = (i, buckets(i)._2, buckets(i)._3)
          // merge while the previous block's mean exceeds this one's:
          // y_p/n_p > y/n  ⇔  y_p·n > y·n_p (exact integers). The
          // cross-multiply is widened to BigInt: pooled Long counts
          // pass 2^63 around y·n ~ 3e9² rows and a silent wrap would
          // INVERT the monotone-merge decision; the stack is
          // grid-sized, so the arbitrary-precision compare is free.
          while (stack.nonEmpty &&
            BigInt(stack.last._3) * n > BigInt(y) * stack.last._2) {
            val (ps, pn, py) = stack.remove(stack.length - 1)
            s = ps; n += pn; y += py
          }
          stack += ((s, n, y))
        }
        // expand each block back to its buckets with the pooled rate
        val out = Array.ofDim[(Long, Long, Long, Double)](buckets.length)
        for (b <- stack.indices) {
          val (start, bn, by) = stack(b)
          val end =
            if (b + 1 < stack.length) stack(b + 1)._1 else buckets.length
          val rate = by.toDouble / bn.toDouble
          for (i <- start until end)
            out(i) = (buckets(i)._1, buckets(i)._2, buckets(i)._3, rate)
        }
        out.iterator
      }
      .toDF("score", "n", "y", "fitted")
  }
}
