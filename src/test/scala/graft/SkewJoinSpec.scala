package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted skew join: exact parity with the plain join on a hot-key
  * dataset, correct left-join null handling, and the partition-spread
  * property the salt exists for. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k facts, 95% on one hot key, joined to a 50-row dimension
  private lazy val facts = spark.range(10000)
    .select(
      when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
  private lazy val dim = spark.range(50)
    .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("label"))

  test("inner salted join equals the plain join exactly") {
    val plain = facts.join(dim, Seq("k"), "inner")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(facts, dim, "k", salts = 8)
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("left salted join preserves unmatched rows with nulls") {
    val sparseDim = dim.filter(col("k") < 5) // hot key 7 now unmatched
    val plain = facts.join(sparseDim, Seq("k"), "left")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(facts, sparseDim, "k", salts = 8, "left")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.exists(_.last == null), "unmatched hot-key rows keep nulls")
  }

  test("the hot key spreads across salt values") {
    val others = facts.columns.filter(_ != "k").map(col)
    val spread = facts.filter(col("k") === 7)
      .withColumn("__salt", pmod(xxhash64(others: _*), lit(8L)))
      .groupBy(col("__salt")).count().collect()
    assert(spread.length == 8, s"hot key must hit every salt: ${spread.toSeq}")
    val counts = spread.map(_.getLong(1))
    assert(counts.max < counts.sum * 0.25,
      s"salting should break the hot key into comparable shards: ${counts.toSeq}")
  }
}
