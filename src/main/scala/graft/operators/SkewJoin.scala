package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual salt-replicate join for skewed keys — the fallback when AQE's
  * skew-join splitting doesn't apply (AQE splits oversized SORT-MERGE
  * join partitions at runtime, but a shuffled-hash join, a join under a
  * required distribution, or an engine pinned below Spark 3 gets no
  * help; and AQE can't split the BUILD side of a hash join at all).
  *
  * Shape: every left row gets a deterministic salt in [0, salts); the
  * right side is replicated `salts` times; the join key becomes
  * (key, salt), so one hot key's rows spread over `salts` reducers
  * instead of one. Cost: the right side shuffles `salts`× — correct
  * only when right is small-ish (dimension-scale) yet too big or too
  * dynamic to broadcast, which is exactly the regime where one hot fact
  * key melts a reducer. Result parity with the plain join is exact for
  * inner and left joins (salting is a partitioning trick, not a
  * semantic change — asserted in SkewJoinSpec).
  *
  * The salt derives from xxhash64 over the left row's OTHER columns
  * (never the key, which is constant within the hot group), so it is
  * deterministic across retries — no `rand()`, which would break task
  * re-execution idempotency (a retried task must salt identically or
  * rows double/vanish under speculative execution).
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val others = left.columns.filter(_ != key).map(col)
    val salted = left.withColumn("__salt",
      if (others.isEmpty) lit(0L) else pmod(xxhash64(others: _*), lit(salts.toLong)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
