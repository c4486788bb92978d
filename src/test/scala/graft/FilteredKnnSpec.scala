package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Filtered vector search (vs_knn_filtered / vs_knn_ivf_filtered):
  * predicate containment on both tiers, pre-filter semantics (recall is
  * measured against the FILTERED ground truth), and the recall-floor
  * gate. Oracle parity for the exact tier is the driver gate.
  */
class FilteredKnnSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def labels(dir: String): Map[Long, Int] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("every returned neighbor satisfies the predicate, on both tiers") {
    val lab = labels(sf)
    Seq(VectorQueries.qKnnFiltered(spark, sf),
        VectorQueries.qKnnIvfFiltered(spark, sf)).foreach { df =>
      val neigh = df.select("neighbor_id").collect().map(_.getLong(0))
      assert(neigh.nonEmpty)
      neigh.foreach(id =>
        assert(lab(id) % 4 == 1, s"neighbor $id violates the filter"))
    }
  }

  test("exact tier returns a full filtered top-5 per query") {
    val rows = VectorQueries.qKnnFiltered(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q: ${rs.length} rows")
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 5))
    }
  }

  test("filtered-IVF recall gate holds at the test SF") {
    val gate = VectorQueries.qKnnIvfFilteredRecall(spark, sf).collect()
    assert(gate.length == 10)
    gate.foreach(r => assert(r.getBoolean(2), s"recall below floor: $r"))
  }
}
