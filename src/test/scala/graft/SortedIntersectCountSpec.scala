package graft

import graft.functions.TextFunctions.sortedIntersectCount
import org.apache.spark.sql.functions._

/** The merge-walk common-neighbor kernel must agree exactly with
  * size(array_intersect(a, b)) on its precondition domain — sorted,
  * duplicate-free long arrays (what sort_array ∘ collect_list of a
  * distinct edge list produces) — including empty and disjoint inputs,
  * and propagate null inputs like any binary expression. */
class SortedIntersectCountSpec extends SparkSpec {

  test("randomized: equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      def arr(max: Int, n: Int): Seq[Long] =
        rnd.shuffle((0 until max).map(_.toLong).toVector).take(n).sorted
      (i.toLong, arr(200, rnd.nextInt(60)), arr(200, rnd.nextInt(60)))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        sortedIntersectCount(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    val bad = df.filter(col("merge") =!= col("ref")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("edges: empty, disjoint, identical, null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[Long]()), Some(Seq[Long](1, 2))),
      (2L, Some(Seq[Long](1, 3, 5)), Some(Seq[Long](2, 4, 6))),
      (3L, Some(Seq[Long](1, 2, 3)), Some(Seq[Long](1, 2, 3))),
      (4L, None, Some(Seq[Long](1))))
      .toDF("id", "a", "b")
      .select(col("id"), sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(df == Map(1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> -1L))
  }
}
