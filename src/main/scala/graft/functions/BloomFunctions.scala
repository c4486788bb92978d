package graft.functions

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.util.sketch.BloomFilter

/** Column surface over Spark's OWN runtime-filter bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * `InjectRuntimeFilter` plants under joins), composed explicitly so a
  * pipeline can build a membership sketch ONCE and probe it from any later
  * scan. Tier (a) of the custom-operator ladder: existing codegen
  * expressions, no new kernel.
  *
  * Both sides key by `xxhash64`, matching the runtime-filter convention:
  * the sketch stores 64-bit hashes, never the strings, so a billion-key
  * eval set costs ~`1.44·log2(1/fpp)` bits per key (2.9 MB per million at
  * fpp 1e-4) — broadcastable where the distinct-string set is not.
  */
object BloomFunctions {

  /** Aggregate: bloom filter over `item`, sized for `expectedItems` keys
    * at false-positive rate `fpp`. Returns the sketch as one BINARY value
    * (internally tree-merged per partition — build cost is one scan). */
  def bloomAgg(item: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    GraftBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(item))),
      Literal(expectedItems), Literal(bits)).toAggregateExpression())
  }

  /** Membership probe of `item` against a CONSTANT bloom sketch (a
    * `lit(bytes)` of [[bloomAgg]]'s result). Codegen; the sketch
    * deserializes once per task, not per row. No false negatives; false
    * positives at the configured fpp. */
  def bloomMightContain(bloomBinary: Column, item: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloomBinary),
      new XxHash64(Seq(GraftBridge.expression(item)))))
}
