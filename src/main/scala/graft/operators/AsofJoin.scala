package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, GraftBridge}

/** Backward as-of join — the time-series operator Spark's join zoo lacks
  * (the builder brief names it explicitly; DuckDB ships it as ASOF JOIN,
  * which is exactly what the driver oracle replays).
  *
  * For each left row, attach the single right row with the greatest
  * `rightTime` ≤ `leftTime` (or strictly <) among rows sharing the join
  * key; null columns when no prior right row exists (left-join
  * semantics).
  *
  * Distributed shape: the union-merge form of a dedicated asof physical
  * operator — tag both sides, shuffle ONCE by key, sort within partitions
  * by (time, side), and carry the latest right payload forward with
  * last(ignoreNulls) over the merged order. That is the same one
  * shuffle + one sort a custom SMJ-based SparkPlan would pay, expressed
  * over standard operators so AQE (including skew-join splitting on the
  * window's hash partitioning) still applies. No per-key collect, no
  * broadcast requirement on either side — both sides stream at 100 TB.
  */
object AsofJoin {

  /** @param payload right columns attached to matched left rows, emitted
    *                as `asof_<name>`; the right time emits as `asof_<rightTime>`.
    *                Right rows are deduplicated per (keys, rightTime) by
    *                lexicographically-greatest payload so the match is
    *                deterministic regardless of partitioning.
    * @param strict  false → rightTime ≤ leftTime (DuckDB `ON l.t >= r.t`);
    *                true → strictly earlier only. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    val keyCols = keys.map(col)

    // deterministic right side: one row per (keys, time)
    val dedupedRight = right
      .groupBy((keys :+ rightTime).map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__r_payload"))
      .select(keyCols :+ col(rightTime).as("__t") :+ col("__r_payload"): _*)

    val rightTimeType = dedupedRight.schema("__t").dataType
    val leftStruct = struct(left.columns.map(col): _*)
    val taggedLeft = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        leftStruct.as("__l"),
        lit(null).cast(dedupedRight.schema("__r_payload").dataType)
          .as("__r"),
        lit(null).cast(rightTimeType).as("__rt")): _*)
    val taggedRight = dedupedRight.select(
      keyCols ++ Seq(
        col("__t"),
        lit(0).as("__side"),
        lit(null).cast(taggedLeft.schema("__l").dataType).as("__l"),
        col("__r_payload").as("__r"),
        col("__t").as("__rt")): _*)

    // inclusive: right (side 0) sorts BEFORE left at equal time, so the
    // carried value includes a same-timestamp right row; strict reverses
    // the tie order so it does not
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__match_t", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = payload.map(p => col("__match").getField(p).as(s"asof_$p")) :+
      col("__match_t").as(s"asof_$rightTime")
    merged.select(leftCols ++ rightCols: _*)
  }

  /** The same backward as-of join as [[asofBackward]], planned through the
    * dedicated Catalyst operator ([[graft.plans.AsofJoinPlan]] →
    * [[graft.plans.AsofMergeJoinExec]]) instead of the union+window
    * composition — the tier-(c) custom-operator form: co-partition, sort,
    * and a single streaming merge per partition with O(1) state.
    *
    * Output schema and values are identical to [[asofBackward]] (the spec
    * asserts it; the driver's DuckDB `ASOF LEFT JOIN` oracle pins both).
    * Prefer this form when a downstream stage re-aggregates on the join
    * keys: the operator preserves the left side's partitioning, so the
    * follow-up `groupBy(keys)` plans with no further shuffle.
    */
  def asofMerge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equality key")
    val spark = left.sparkSession
    GraftBridge.ensureStrategy(spark, graft.plans.GraftStrategy)
    // no pruning rule needed: Catalyst's ColumnPruning prunes generically
    // through unknown nodes via its Project-over-child catch-all, keeping
    // (node.references ++ project.references) — AsofMergePlanSpec pins
    // that unused left columns never reach the parquet scan
    // fresh exprIds + unique names on the right so self-joins (both sides
    // carved from the same source, the common case) analyze cleanly
    val rCols = (keys ++ Seq(rightTime) ++ payload).distinct
    val renamed = right.select(rCols.map(c => col(c).as(c + "__asof_r")): _*)
    val lPlan = GraftBridge.analyzedPlan(left)
    val rPlan = GraftBridge.analyzedPlan(renamed)
    def attrOf(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asof join: column $n not found"))
    val payloadAttrs = payload.map(p => attrOf(rPlan, p + "__asof_r"))
    val rightTimeAttr = attrOf(rPlan, rightTime + "__asof_r")
    val outAttrs = payload.zip(payloadAttrs).map { case (p, a) =>
      AttributeReference(s"asof_$p", a.dataType, nullable = true)()
    } :+ AttributeReference(
      s"asof_$rightTime", rightTimeAttr.dataType, nullable = true)()
    val plan = graft.plans.AsofJoinPlan(
      keys.map(attrOf(lPlan, _)),
      keys.map(k => attrOf(rPlan, k + "__asof_r")),
      attrOf(lPlan, leftTime),
      rightTimeAttr,
      payloadAttrs,
      outAttrs,
      strict,
      lPlan,
      rPlan)
    GraftBridge.ofRows(spark, plan)
  }
}
