package graft

import graft.queries.SearchQueries
import org.apache.spark.sql.functions._

/** Facet counts (ks_facets): totals reconcile with the match set, and the
  * two facet dimensions partition it identically. Oracle parity vs DuckDB
  * is the driver gate.
  */
class FacetSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("facet totals: each dimension's counts sum to the match-set size") {
    val rows = SearchQueries.qFacets(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQf = rows.groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(3)).sum }
    // for every query, the lang partition and the source partition count
    // the same underlying docs
    val qs = byQf.keys.map(_._1).toSet
    qs.foreach { q =>
      assert(byQf((q, "lang")) == byQf((q, "source")),
        s"query $q: facet dimensions disagree on the match-set size")
      assert(byQf((q, "lang")) > 0)
    }
  }

  test("facet values are real metadata values with positive counts") {
    val langs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    SearchQueries.qFacets(spark, sf)
      .filter(col("facet") === "lang").collect()
      .foreach { r =>
        assert(langs.contains(r.getString(2)), s"unknown lang facet: $r")
        assert(r.getLong(3) > 0)
      }
  }
}
