package graft

import graft.queries.{DedupQueries, TextQueries}

/** Dataset card (td_dataset_card): hand-computed headline values on a
  * crafted corpus, and cross-consistency with the detailed reports the
  * card summarizes (exact-dup counts, language distribution). Oracle
  * parity vs DuckDB is the driver gate.
  */
class DatasetCardSpec extends SparkSpec {

  test("crafted corpus: volume, composition and dup rate by hand") {
    import spark.implicits._
    // doc 2 normalizes onto doc 0 (case + collapsed whitespace)
    val docs = Seq(
      (0L, "Alpha beta gamma", "en", "web", 16L),
      (1L, "delta epsilon", "de", "wiki", 13L),
      (2L, "alpha  BETA   gamma", "en", "web", 19L))
    val dir = java.nio.file.Files.createTempDirectory("card").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextQueries.qDatasetCard(spark, dir).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 8 && r.getLong(2) == 48)
    assert(r.getLong(3) == 2 && r.getLong(4) == 2 && r.getLong(5) == 2)
    assert(r.getDouble(6) == BigDecimal(1.0 - 2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getString(7) == "en" && r.getDouble(8) == 0.666667)
  }

  test("testdata: the card agrees with the reports it summarizes") {
    val sf = "/root/testdata/sf0.001"
    val card = TextQueries.qDatasetCard(spark, sf).collect().head
    val nDocs = graft.queries.Tables.documents(spark, sf).count()
    assert(card.getLong(0) == nDocs)
    // integrity column = the exact-dedup report's unique-group count
    val exact = DedupQueries.qDedupExact(spark, sf).collect().head
    assert(card.getLong(5) == exact.getLong(0),
      s"card n_unique ${card.getLong(5)} != dd_exact ${exact.getLong(0)}")
    // dominant language = the language distribution's argmax (that
    // report splits each lang across detected lang_id rows — fold back)
    val top = TextQueries.qLangDistribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .maxBy { case (l, n) => (n, l) }
    assert(card.getString(7) == top._1)
  }
}
