package graft

/** Run-to-run determinism of the rounded float-fit queries (VERDICT r15
  * item 2): td_heaps failed the r15 oracle hash because its Heaps-law
  * beta/k_coef fit accumulated covar_pop/var_pop partials in
  * shuffle-fetch order, flipping round(beta, 6) at a boundary. The fit
  * inputs are now pinned (collected in decile/rank order, re-aggregated
  * over a single-partition LocalRelation); this spec runs each rounded
  * fit query 5x in one session and asserts BIT-identical output
  * (doubles compared by raw bits, not by tolerance).
  */
class FitDeterminismSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Canonical sorted row encoding with doubles rendered as raw bits. */
  private def canon(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case d: java.lang.Double =>
            java.lang.Double.doubleToLongBits(d).toString
          case f: java.lang.Float =>
            java.lang.Float.floatToIntBits(f).toString
          case v => String.valueOf(v)
        }
      }.mkString("|")
    }.sorted

  // td_heaps / td_zipf are the pinned fits; ev_cuped / ev_did compute
  // their fit on the driver from exact integer sums (structurally
  // deterministic); td_dsir / vs_silhouette round per-group double sums
  // — included so a future regression in any of the six trips here
  for (q <- Seq("td_heaps", "td_zipf", "ev_cuped", "ev_did", "td_dsir",
      "vs_silhouette")) {
    test(s"$q: bit-identical output across 5 runs in one session") {
      val first = canon(q)
      assert(first.nonEmpty, s"$q returned no rows on $dir")
      (2 to 5).foreach { i =>
        assert(canon(q) == first, s"$q output flipped on run $i")
      }
    }
  }
}
