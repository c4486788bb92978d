package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second time-series operator the
  * builder brief names that Spark's join zoo lacks. With no equality key,
  * Catalyst plans `p.t BETWEEN i.start AND i.end` as a broadcast
  * nested-loop (or cartesian) — O(points × intervals) comparisons that a
  * 100 TB event table cannot survive.
  *
  * Binning turns it into a hash equi-join: intervals explode into the
  * fixed-width time bins they cover, points map to exactly ONE bin, and
  * the join runs on the bin key with the precise range predicate as a
  * residual filter. Each (point, interval) pair can meet in only the
  * point's single bin, so no dedup pass is needed. Cost is
  * |intervals| × (len/binWidth + 1) exploded rows (intervals are the
  * small side by nature — incident windows, maintenance windows,
  * campaign ranges) and one shuffle of the points keyed by bin. Choose
  * binWidth ≈ the typical interval length: shorter bins inflate the
  * interval explode, longer bins inflate residual-filter waste.
  */
object RangeJoin {

  /** Join each point row to every interval row whose
    * `[startCol, endCol]` contains `pointTime` (inclusive). Column names
    * of the two sides must be disjoint; timestamps compare at Spark's
    * native microsecond precision. */
  def pointInInterval(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidthMs: Long): DataFrame = {
    require(binWidthMs > 0, "binWidthMs must be positive")
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_millis(col(startCol)) / binWidthMs),
        floor(unix_millis(col(endCol)) / binWidthMs))))
    val pts = points.withColumn("__bin",
      floor(unix_millis(col(pointTime)) / binWidthMs))
    pts.join(binned, "__bin")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) <= col(endCol))
      .drop("__bin")
  }
}
