package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-plan guardrails: the scale properties the queries are designed
  * around — predicate pushdown into the parquet scan, column pruning,
  * broadcast joins for dimension tables, no stray shuffles — asserted on
  * the executed plan string so a refactor that silently loses them fails
  * CI, not the 100 TB run.
  */
class PlanQualitySpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  def plan(df: DataFrame): String = {
    df.collect() // finalize AQE on THIS plan so codegen stages are visible
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
  }

  def count(haystack: String, needle: String): Int =
    needle.r.findAllMatchIn(haystack).length

  test("q6: range filters push into the parquet scan; schema pruned") {
    val p = plan(graft.queries.RelationalQueries.q6ForecastRevenue(spark, sf))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("l_shipdate"), "shipdate range should reach the scan")
    assert(p.contains("l_discount"), "discount range should reach the scan")
    // column pruning: the scan must not read the full 16-col lineitem row
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"scan reads more columns than the query needs: $readSchema")
  }

  test("q5: dimension joins broadcast; fact side shuffles once at most") {
    val p = plan(graft.queries.RelationalQueries.q5RegionRevenue(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 3,
      "supplier/nation/region must join via broadcast")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") <= 1,
      "only lineitem-orders may shuffle")
  }

  test("q3: customer dim broadcasts; top-10 is TakeOrdered, not global sort") {
    val p = plan(graft.queries.RelationalQueries.q3TopOrders(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 1)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q4: the lateness EXISTS stays a semi join; order window reaches the scan") {
    val p = plan(graft.queries.RelationalQueries.q4OrderPriority(spark, sf))
    assert(p.contains("LeftSemi"), "EXISTS must plan as semi, not inner+distinct")
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"),
      "the two-quarter window should reach the orders scan")
  }

  test("q10: dims broadcast, date+flag filters push down, top-20 is TakeOrdered") {
    val p = plan(graft.queries.RelationalQueries.q10ReturnedItems(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 2, "customer and nation broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
    assert(p.contains("PushedFilters:") && p.contains("l_returnflag"),
      "the returnflag filter should reach the lineitem scan")
  }

  test("q22: the average is a 1-row broadcast; never-ordered is a LeftAnti") {
    val p = plan(graft.queries.RelationalQueries.q22SalesOpportunity(spark, sf))
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as anti join")
    assert(count(p, "BroadcastNestedLoopJoin|BroadcastHashJoin") >= 1,
      "the scalar average joins via broadcast")
    assert(!p.contains("CartesianProduct"), "no unbroadcast cross join")
  }

  test("q8: all six dimension roles broadcast; only the fact-fact join shuffles") {
    val p = plan(graft.queries.RelationalQueries.q8MarketShare(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 5,
      "part/customer/nation(x2)/region/supplier must all broadcast")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") <= 1,
      "only lineitem-orders may shuffle")
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"),
      "the two-year window should reach the orders scan")
  }

  test("q15: the max is a 1-row broadcast over the aggregated view; no re-scan") {
    val p = plan(graft.queries.RelationalQueries.q15TopSupplier(spark, sf))
    assert(count(p, "BroadcastNestedLoopJoin|BroadcastHashJoin") >= 2,
      "the scalar max and the supplier dim both join via broadcast")
    assert(!p.contains("CartesianProduct"), "no unbroadcast cross join")
    // the materialized revenue view hides the fact scan behind the
    // checkpoint: the final plan must carry NO lineitem scan at all
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(count(finalPlan, "lineitem\\.parquet") == 0,
      s"the quarterly revenue view must not re-scan the fact:\n$p")
  }

  test("q17: per-part threshold joins back broadcast onto the materialized slice") {
    // the brand slice is localCheckpointed (it feeds the threshold agg
    // AND the probe — without it the fact scans twice, the q15 lesson),
    // so the brand/part pushdown happens in the checkpoint's own job;
    // the returned plan must show the broadcast threshold join over the
    // checkpoint scan and NO residual fact re-scan
    val p = plan(graft.queries.RelationalQueries.q17SmallQuantity(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 1,
      "the per-part threshold relation joins back broadcast")
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(count(finalPlan, "lineitem\\.parquet") == 0,
      s"the brand slice must not re-scan the fact:\n$p")
    // the pushdown the checkpoint hides, pinned on the raw subtree
    val raw = plan(graft.queries.RelationalQueries.q17BrandSliceRaw(spark, sf))
    assert(raw.contains("PushedFilters:") && raw.contains("p_brand"),
      "the brand filter should reach the part scan")
    assert(count(raw, "BroadcastHashJoin") >= 1, "brand parts broadcast")
  }

  test("q18: the HAVING relation drives the join; top-100 is TakeOrdered") {
    val p = plan(graft.queries.RelationalQueries.q18LargeOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), "top-100 must not global-sort")
    assert(count(p, "BroadcastHashJoin") >= 1, "customer must broadcast")
  }

  test("q19: the disjunction keeps one fact scan and an equi-join on partkey") {
    val p = plan(graft.queries.RelationalQueries.q19DiscountedRevenue(spark, sf))
    // AQE prints Final + Initial sections — count scans in the final only
    assert(count(p.split("== Initial Plan ==")(0), "lineitem\\.parquet") == 1,
      "one lineitem scan only")
    assert(count(p, "BroadcastHashJoin") >= 1, "pruned parts broadcast")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the OR-of-ANDs must not degrade the join to nested-loop")
    assert(p.contains("PushedFilters:") && p.contains("p_brand"),
      "the brand IN-list should reach the part scan")
  }

  test("q20: one fact scan; the semi survives planning; threshold joins broadcast") {
    val p = plan(graft.queries.RelationalQueries.q20DominantSupplier(spark, sf))
    val finalPlan = p.split("== Initial Plan ==")(0)
    // the pair aggregate is materialized once (its checkpoint job paid
    // the single fact scan) — the returned plan must never re-scan
    assert(count(finalPlan, "lineitem\\.parquet") == 0,
      s"q20 must not re-scan the fact:\n$finalPlan")
    assert(finalPlan.contains("LeftSemi"),
      "the qualifying-supplier pruning must stay a semi join")
    assert(count(p, "BroadcastHashJoin") >= 2,
      "part slice, per-part total and nation all join broadcast")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no cartesian anywhere")
  }

  test("q21: EXISTS/NOT-EXISTS stay semi+anti; at most two fact scans") {
    val p = plan(graft.queries.RelationalQueries.q21WaitingSupplier(spark, sf))
    val finalPlan = p.split("== Initial Plan ==")(0)
    // late is materialized (checkpoint) — the returned plan sees the
    // probe lineitem scan only; the checkpoint job paid the other
    assert(count(finalPlan, "lineitem\\.parquet") <= 1,
      s"q21's returned plan re-scans the fact:\n$finalPlan")
    assert(finalPlan.contains("LeftSemi"),
      "the other-supplier EXISTS must stay a semi join")
    assert(finalPlan.contains("LeftAnti"),
      "the sole-late NOT EXISTS must stay an anti join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the supplier-inequality condition must ride the orderkey equi-join")
  }

  test("q9: one lineitem + one orders scan; all three dims broadcast") {
    val p = plan(graft.queries.RelationalQueries.q9ProductTypeProfit(spark, sf))
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(count(finalPlan, "lineitem\\.parquet") == 1, "one lineitem scan only")
    assert(count(finalPlan, "orders\\.parquet") == 1, "one orders scan only")
    assert(count(p, "BroadcastHashJoin") >= 3,
      "part slice, supplier and nation must all broadcast — the fact " +
        "shuffles once, on the orderkey equi-join only")
    assert(p.contains("PushedFilters:") && p.contains("p_name"),
      "the name LIKE should reach the part scan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no cartesian anywhere")
  }

  test("q12: flag+year filters push to the scan; one aggregate pass") {
    val p = plan(graft.queries.RelationalQueries.q12ShippingPriority(spark, sf))
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(count(finalPlan, "lineitem\\.parquet") == 1, "one lineitem scan only")
    assert(count(finalPlan, "orders\\.parquet") == 1, "one orders scan only")
    assert(p.contains("PushedFilters:") && p.contains("l_returnflag"),
      "the returnflag IN should reach the lineitem scan")
    // both CASE sums ride ONE partial aggregate before the final — the
    // two-branch split must never become two scans or two shuffles
    assert(count(p, "partial_sum|Partial") >= 1, "partial agg expected")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no cartesian anywhere")
  }

  test("q14: the part dimension broadcasts; the fact side never reshuffles") {
    val p = plan(graft.queries.RelationalQueries.q14PromoShare(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 1, "part must broadcast")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") == 0,
      "a one-row aggregate over a broadcast join needs no fact shuffle")
  }

  test("windowed top-k pushes a partial group limit below the shuffle") {
    // Spark's InferWindowGroupLimit turns row_number()<=k into a
    // per-partition top-k BEFORE the exchange — at 100 TB the shuffle
    // carries ≤k rows per key per map partition, not every row. This is
    // why the engine does NOT ship a custom top-k aggregate: the
    // declarative window form already gets the map-side reduction, and a
    // refactor that breaks the pattern (e.g. rank computed separately
    // from its filter) would silently shuffle the world.
    val p = plan(graft.queries.RelationalQueries.qWindowTopOrders(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"group limit missing:\n$p")
    val partialIdx = p.indexOf("Partial")
    assert(partialIdx >= 0 && p.contains("WindowGroupLimit"),
      "partial (pre-shuffle) group limit expected")
  }

  test("range join: interval binning keeps a hash join, never nested-loop") {
    val p = plan(graft.queries.EventQueries.qRangeIncidents(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"keyless BETWEEN join must bin to an equi-join:\n$p")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") >= 1,
      "the bin key must drive a hash/merge join")
  }

  test("semi/anti joins stay semi/anti in the physical plan") {
    val ps = plan(graft.queries.RelationalQueries.qSemiJoin(spark, sf))
    assert(ps.contains("LeftSemi"))
    val pa = plan(graft.queries.RelationalQueries.qAntiJoin(spark, sf))
    assert(pa.contains("LeftAnti"))
  }

  test("winnowing: pairing is an equi-join on the fingerprint hash, no cartesian") {
    val p = plan(graft.queries.DedupQueries.qDedupWinnowing(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the pair join must stay an equi-join on h")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      "selection runs as a doc-keyed window pass")
  }

  test("cdc chunks: exchanges keyed by doc or source only; rollup partials map-side") {
    val p = plan(graft.queries.DedupQueries.qDedupCdcChunks(spark, sf))
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
    assert(p.contains("partial_count") || p.contains("partial"),
      "the per-source rollup must partial-aggregate map-side")
  }

  test("MIPS: queries broadcast, the dot kernel is native, no cartesian") {
    val p = plan(graft.queries.VectorQueries.qKnnMips(spark, sf))
    assert(p.contains("dot_product"), "the codegen DotProduct kernel scores")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 10-query side must broadcast")
    assert(!p.contains("CartesianProduct"), "never an unbroadcast cross join")
  }

  test("retrieval scoring stays inside whole-stage codegen") {
    import graft.llm.HashEmbedder
    val emb = new HashEmbedder(64)
    val corpus = {
      import spark.implicits._
      spark.createDataset(Seq(
        graft.model.Node.empty.copy(rowId = "a", scope = "chunk",
          text = "x", embedding = emb.embed("x")))).toDF()
        .repartition(1) // keep the projection out of ConvertToLocalRelation
    }
    val p = plan(graft.retrieval.Retrieval.score(corpus, emb.embed("q"), "chunk"))
    // compact plan strings mark whole-stage codegen stages with "*(n)"
    assert(count(p, "\\*\\(\\d+\\) Project") >= 1, "cosine scan must be codegen'd")
    assert(p.contains("cosine_sim"), "native expression in plan")
  }

  test("dedup signatures are single-pass native expressions in the plan") {
    val p = plan(graft.queries.DedupQueries.qDedupSimhash(spark, sf))
    assert(p.contains("simhash60"))
    val p2 = plan(graft.queries.DedupQueries.qDedupMinhashLsh(spark, sf))
    assert(p2.contains("minhash_sig"))
    assert(p2.contains("word_ngrams"))
  }

  test("embedding near-dup: no cartesian in either dispatch regime") {
    // the synthetic embeddings are diffuse at t=0.45, so the adaptive
    // dispatch (VectorNearDupSpec covers both regimes) picks the blocked
    // sweep here — block-pair equi-join, never a cartesian
    val p = plan(graft.queries.VectorQueries.qEmbNearDup(spark, sf))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      p.linesIterator.take(30).mkString("\n"))
  }

  test("LSH ANN signatures are the native hyperplane kernel in the plan") {
    val p = plan(graft.queries.VectorQueries.qKnnLsh(spark, sf))
    assert(p.contains("hyperplane_sig"), "native kernel, not per-bit HOFs")
    assert(!p.contains("zip_with"), "no per-bit vector rescans")
  }

  test("bucketed corpus tables join with no exchange on either side") {
    import spark.implicits._
    val nodes = spark.createDataset((0 until 64).map { i =>
      graft.model.Node.empty.copy(
        rowId = s"n$i", scope = "chunk",
        namespace = "ns" + (i % 2), repo = "repo" + (i % 8),
        text = s"text $i")
    })
    graft.sources.CorpusStore.writeBucketed(nodes, "corpus_bucketed_a", buckets = 4)
    graft.sources.CorpusStore.writeBucketed(nodes, "corpus_bucketed_b", buckets = 4)
    val joined = spark.table("corpus_bucketed_a").as("a")
      .join(spark.table("corpus_bucketed_b").as("b"),
        Seq("namespace", "repo"))
      .groupBy(col("namespace"), col("repo")).count()
    val p = plan(joined.select(col("namespace"), col("repo"), col("count")))
    assert(count(p, "SortMergeJoin|ShuffledHashJoin") >= 1, "join present")
    // bucket-co-located join: the only exchange allowed is for the final agg
    val joinSection = p.substring(p.indexOf("Join"))
    assert(!joinSection.contains("Exchange hashpartitioning(namespace"),
      s"join inputs must be bucket-pruned, got:\n$p")
  }

  test("corpus store scope filter prunes partition directories") {
    import spark.implicits._
    val nodes = spark.createDataset(graft.model.Node.Scopes.zipWithIndex.flatMap {
      case (sc, i) => (0 until 4).map(j =>
        graft.model.Node.empty.copy(rowId = s"$sc-$j", scope = sc,
          namespace = "ns", repo = "r", text = s"t$i$j"))
    })
    val dir = java.nio.file.Files.createTempDirectory("prune-corpus").toString
    graft.sources.CorpusStore.write(nodes, dir)
    val scoped = graft.sources.CorpusStore.read(spark, dir)
      .filter(col("scope") === "chunk").select("rowId")
    val p = plan(scoped)
    assert(p.contains("PartitionFilters"), "scope must be a partition filter")
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("scope")),
      s"scope filter must prune directories:\n$p")
  }

  test("dd_jaccard_prefix_full executes the prefix plan (dfreq join + rank window)") {
    // the driver gate now hash-checks this entry at sf0.01 — assert the
    // plan it executes IS the prefix plan: a document-frequency aggregate
    // joined back to the postings, ranked by a per-doc window. The naive
    // inverted-index plan has neither.
    val p = plan(graft.queries.DedupQueries.qDedupJaccardPrefixFull(spark, sf))
    assert(count(p, "Window") >= 1, s"prefix rank window missing:\n$p")
    assert(count(p, "HashAggregate") >= 2,
      "dfreq aggregate (plus pair-count agg) must appear in the prefix plan")
    val naive = plan(graft.queries.DedupQueries.qDedupJaccard(spark, sf))
    assert(count(naive, "Window") == 0, "naive plan must not pay the rank window")
  }

  test("per-stratum top-k queries plan pre-shuffle WindowGroupLimit") {
    // weighted sample and source quota share the rank-window-filter
    // shape; both must push the k-limit below the window exchange
    for (df <- Seq(
        graft.queries.PipelineQueries.qWeightedSample(spark, sf),
        graft.queries.PipelineQueries.qSourceQuota(spark, sf))) {
      val p = plan(df)
      assert(p.contains("WindowGroupLimit"), s"missing WindowGroupLimit:\n$p")
    }
  }

  test("pagerank rounds shuffle (node, rank) pairs only — no text columns") {
    val p = plan(graft.queries.DedupQueries.qDedupPagerank(spark, sf, iters = 2))
    assert(!p.contains("CartesianProduct"))
    // the loop reads materialized checkpoints, so the FINAL plan must not
    // re-derive the corpus: no parquet scan of documents survives
    assert(!p.contains("documents.parquet"),
      "iteration plan must read the checkpointed graph, not the corpus")
  }

  test("sequence packing: cumsum window is partition-local, never global") {
    // the canonical cumsum scale trap is sum().over(orderBy(id)) — an
    // empty partition spec that plans every row into ONE partition. The
    // pack query must run its running sum partitioned by pid (the range
    // partition), with the cross-partition carry coming from broadcast
    // offsets.
    val p = plan(graft.queries.PipelineQueries.qPackSequences(spark, sf))
    assert(p.contains("windowspecdefinition(pid"),
      s"running sum must be partitioned by pid:\n$p")
    assert(!p.contains("windowspecdefinition(doc_id"),
      "no window may sort the whole relation globally")
  }

  test("SemDeDup: in-cluster pair join is an equi-join, never cartesian") {
    // post-assignment (the 16-row seed broadcast is the ONLY nested-loop,
    // and it lives before the checkpoint): the pair stage must key on
    // cluster_id, and the removed flag must resolve as a join — no
    // per-row subquery
    val p = plan(graft.queries.VectorQueries.qSemDedup(spark, sf))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the checkpointed assignment must hide the seed broadcast from the pair stage")
    // the pair stage keys on the cluster (aliased ka/kb); at test SF AQE
    // may broadcast one side — any equi-join form qualifies, but the
    // cluster key must be the join key, not a post-join filter
    assert(count(p, "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[ka") >= 1,
      s"pair join must key on the cluster id:\n$p")
  }

  test("source overlap: per-source totals broadcast onto the pair rollup") {
    val p = plan(graft.queries.DedupQueries.qSourceOverlap(spark, sf))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"the two count joins must broadcast:\n$p")
  }

  test("minhash source overlap: signature agg is partial map-side; no text shuffles") {
    // the scale claim of dd_source_overlap_minhash: per-source signatures
    // come from the ONE-PASS mergeable minhash_merge aggregate — partial
    // (map-side) buffers must combine BEFORE the exchange so the shuffle
    // carries one k-long array per (partition, source), and the pair
    // join's long format explodes only AFTER aggregation (|S|·k rows)
    val p = plan(graft.queries.DedupQueries.qSourceOverlapMinhash(spark, sf))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
    assert(count(p, "minhash_merge") >= 2, // partial + final agg pair
      s"mergeable minhash_merge aggregate missing from the plan:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"typed-imperative signature agg should plan as ObjectHashAggregate:\n$p")
    // the pair join keys on (seed) with narrow (source, h) rows
    assert(count(p, "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") >= 1,
      s"signature pair join must be an equi-join:\n$p")
  }

  test("BPE training: the word-count shuffle partial-aggregates map-side") {
    // the ONLY corpus pass BPE training makes is the dictionary count;
    // it must plan partial hash-aggregation before the exchange (token
    // stream shrinks to the vocabulary before any shuffle) and the
    // top-V cap must be a TakeOrdered, never a global sort
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    // assert on the SAME DataFrame production runs (Bpe.dictQuery is
    // exposed for exactly this), not a hand-copied twin that can drift
    val p = plan(graft.operators.Bpe.dictQuery(docs))
    assert(count(p, "HashAggregate") >= 2,
      s"word count must partial-aggregate before the exchange:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-V cap must be TakeOrdered, not Sort+Limit:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("k-means: assignment never shuffles the corpus; mean update is a hash-agg") {
    // one round's assignment = corpus scan × broadcast centroid table,
    // resolved by a map-side-combinable max(struct) — the only exchange
    // carries (vec_id | cluster, pos) aggregate keys, never raw vectors
    // per centroid
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) embedding")
    val seeds = graft.queries.VectorQueries.seededCentroids(emb, 8)
    val assigned = graft.queries.VectorQueries.assignToSeeds(emb, seeds, 8)
    val pa = plan(assigned)
    // struct-max plans as SortAggregate; the map-side partial_max before
    // the exchange is the property that matters
    assert(count(pa, "(HashAggregate|SortAggregate)") >= 2 && pa.contains("partial_max"),
      s"argmax must partial-aggregate map-side:\n$pa")
    assert(!pa.contains("CartesianProduct"),
      "centroids must broadcast (nested-loop over a c-row literal side is fine, " +
        s"a cartesian against the corpus is not):\n$pa")
    // the PRODUCTION mean path (kmeansMeans): a mapPartitions partial-sum
    // pass, so only partitions·c partial rows reach the explode + agg —
    // the corpus-sized n·dim exploded stream must be gone
    val pm = plan(graft.queries.VectorQueries.kmeansMeans(assigned))
    assert(pm.contains("MapPartitions"),
      s"mean update must partial-sum in a mapPartitions pass:\n$pm")
    assert(count(pm, "HashAggregate") >= 2,
      s"partial totals must still hash-aggregate map-side:\n$pm")
  }

  test("C4 clean: one scan, no exchange before the output sort") {
    // the whole split→judge→filter→reassemble program is per-row Column
    // algebra — any hash exchange means a shuffle crept into what must
    // stay an embarrassingly-parallel filter pass
    val p = plan(graft.queries.TextQueries.qC4Clean(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"C4 cleaning must not shuffle:\n$p")
    // compact plan strings mark whole-stage codegen stages with "*(n)"
    assert(count(p, "\\*\\(\\d+\\) Project") >= 1,
      s"rule evaluation must codegen:\n$p")
  }

  test("substring rewrite: exchanges keyed by gram or doc only; no cartesian") {
    val p = plan(graft.queries.DedupQueries.qDedupSubstringRewrite(spark, sf))
    assert(!p.contains("CartesianProduct"), s"no doc×doc anywhere:\n$p")
    // every hashpartitioning key is the gram or the doc id — a shuffle on
    // anything else (e.g. token text) would be corpus-volume
    val keys = "Exchange hashpartitioning\\(([a-z_0-9#]+)".r
      .findAllMatchIn(p).map(_.group(1).takeWhile(_ != '#')).toSet
    assert(keys.subsetOf(Set("g", "doc_id")),
      s"unexpected shuffle keys $keys in:\n$p")
  }

  test("drift: token count partial-aggregates map-side; KL stages are vocab-sized") {
    val p = plan(graft.queries.TextQueries.qDrift(spark, sf))
    // the one corpus-sized aggregation must combine before its exchange
    assert(p.contains("partial_count") || count(p, "HashAggregate.*Partial") >= 1,
      s"(source, half, term) count must partial-agg:\n$p")
    assert(!p.contains("CartesianProduct"))
    // totals/vocab sizes broadcast back — the KL rollup never joins the
    // vocab relation through a shuffled join
    assert(count(p, "BroadcastHashJoin") >= 3,
      s"per-source stats must broadcast onto the pair relation:\n$p")
  }

  test("phrase search: corpus posexplode prunes via broadcast before any exchange") {
    val p = plan(graft.queries.SearchQueries.qPhrase(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"phrase-term and qlen joins must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must filter before the final window shuffle:\n$p")
  }

  test("blob near-dup: band join is an equi-join; signature agg partials map-side") {
    val p = plan(graft.queries.MultimodalQueries.qBlobNeardup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band blocking must stay an equi-join:\n$p")
  }

  test("maxscore: candidate admission is a semi-join over pushed term probes") {
    val p = plan(graft.queries.SearchQueries.qMaxscore(spark, sf))
    assert(p.contains("In(term"),
      s"query terms must push into the postings scan:\n$p")
    assert(p.contains("LeftSemi"),
      s"candidate admission must be a semi-join, not a rescore:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("facets: metadata join reads a narrow documents projection, never text") {
    val p = plan(graft.queries.SearchQueries.qFacets(spark, sf))
    val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(p).toSeq
    val docScan = readSchemas.filter(_.contains("lang"))
    assert(docScan.nonEmpty, s"documents scan missing:\n$p")
    docScan.foreach(rs =>
      assert(!rs.contains("text"), s"facet metadata scan reads text: $rs"))
  }

  test("epoch shuffle: rank windows are bucket-partitioned, never single-partition") {
    val p = plan(graft.queries.PipelineQueries.qEpochShuffle(spark, sf))
    assert(!p.contains("Exchange SinglePartition"),
      s"the two-level rank must not plan a global window:\n$p")
    assert(count(p, "Window") >= 2, s"local rank + offset windows:\n$p")
  }

  test("sliding reach: window replication joins stay equi-joins on the hour key") {
    val p = plan(graft.queries.EventQueries.qSlidingReach(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"sketch window merge must be an equi-join:\n$p")
  }

  test("attribution: conversion-touch pair-up is an equi-join keyed by user") {
    val p = plan(graft.queries.EventQueries.qAttribution(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the time-window filter must ride the user_id equi-join:\n$p")
  }

  test("lpa: rounds shuffle (node, label) pairs only — no text columns") {
    val p = plan(graft.queries.DedupQueries.qDedupLpa(spark, sf))
    assert(!p.toLowerCase.contains("text#"),
      s"document content must never enter the LPA loop:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("pmi: pair counts partial-aggregate map-side; scoring joins broadcast; top-30 is TakeOrdered") {
    val p = plan(graft.queries.TextQueries.qPmi(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-30 must never be a global sort:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"both unigram sides are vocab-sized and must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"no corpus-sized join may appear:\n$p")
  }

  test("phash near-dup: band join is an equi-join; hashes never cross-join") {
    val p = plan(graft.queries.MultimodalQueries.qPhashNeardup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded blocking must stay an equi-join:\n$p")
  }

  test("scd2: one corpus exchange keyed by user; run stitch reuses the clustering") {
    val p = plan(graft.queries.EventQueries.qScd2(spark, sf))
    // lag/cumsum window, run rollup, lead stitch — the event stream must
    // not shuffle on anything except user_id (+ the run rollup's
    // (user_id, version) and the output sort's range partitioning)
    val keys = "Exchange hashpartitioning\\(([a-z_0-9#]+)".r
      .findAllMatchIn(p).map(_.group(1).takeWhile(_ != '#')).toSet
    assert(keys.subsetOf(Set("user_id")),
      s"unexpected shuffle keys $keys in:\n$p")
  }

  test("q7: all four dim chains broadcast; the fact side shuffles once at most") {
    val p = plan(graft.queries.RelationalQueries.q7NationVolume(spark, sf))
    assert(count(p, "BroadcastHashJoin") >= 4, s"dim chains must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // one orderkey exchange for lineitem ⋈ orders at most (AQE may
    // broadcast orders at test SF); the nation-pair filters prune on the
    // broadcast side, never as a post-join fact filter
    assert(count(p, "Exchange hashpartitioning\\((l_orderkey|o_orderkey)") <= 2,
      s"fact side must shuffle on the orderkey only:\n$p")
  }

  test("curriculum: phases come from boundary compares, never a global sort window") {
    val p = plan(graft.queries.TextQueries.qCurriculum(spark, sf))
    // the single-partition ntile trap: no Window operator at all — the
    // quartile cut is an agg plus three broadcast literal compares
    assert(!p.contains("Window"), s"global-sort window leaked into:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("silhouette: the centroid cross is a broadcast, never a cartesian") {
    val p = plan(graft.queries.VectorQueries.qSilhouette(spark, sf, c = 4, rounds = 1))
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the c-row centroid table must broadcast onto the corpus scan")
  }

  test("funnel latency: stage anchors shuffle (user, micros) pairs only") {
    val p = plan(graft.queries.EventQueries.qFunnelLatency(spark, sf))
    assert(!p.contains("CartesianProduct"))
    // every exchange keys on the user (stage joins + conditional mins);
    // the final percentile rollup keys on the step label
    val keys = "Exchange hashpartitioning\\(([a-z_0-9#]+)".r
      .findAllMatchIn(p).map(_.group(1).takeWhile(_ != '#')).toSet
    assert(keys.subsetOf(Set("user_id", "step")),
      s"unexpected shuffle keys $keys in:\n$p")
  }

  test("interval pairs: equi-join on user with the range as join filter") {
    val p = plan(graft.queries.EventQueries.qIntervalPairs(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the BETWEEN must ride a user_id hash join, never nested-loop:\n$p")
    assert(count(p, "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") >= 1)
    assert(p.contains("PushedFilters:") && p.contains("event_type"),
      "view/click filters must reach the scan")
  }

  test("shard rebalance: one projection pass, no corpus shuffle beyond the 16-row agg") {
    val full = plan(graft.queries.PipelineQueries.qShardRebalance(spark, sf))
    // AQE prints final + initial plans; assert on the final one only
    val p = full.split("== Initial Plan ==").head
    assert(!p.contains("Join"), "HRW scoring is per-row; no join expected")
    // exactly the aggregate's exchange (partial → final) plus the
    // 16-row output sort — the corpus itself never reshuffles
    assert(count(p, "Exchange hashpartitioning") <= 1,
      s"corpus-sized shuffle crept into the HRW pass:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"scan must prune to doc_id, got: $readSchema")
  }

  test("hard negatives: label inequality prunes inside the broadcast join") {
    val p = plan(graft.queries.VectorQueries.qHardNegatives(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 10-row query side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("NOT (label"), // the label filter rides the join, pre-scoring
      s"label inequality must appear in the join condition:\n$p")
  }

  test("sorted neighborhood: bucketed rank windows; candidate join is an equi-join") {
    // the rank stage (pre-checkpoint): corpus-sized window partitions by
    // the key-prefix bucket; the only single-partition stage is the
    // ≤|charset|²-row offset prefix sum
    val pr = plan(graft.queries.DedupQueries.snmPositions(spark, sf))
      .split("== Initial Plan ==").head // AQE echoes the pre-AQE tree below
    assert(pr.contains("windowspecdefinition(bucket"),
      s"SNM rank must window within key-prefix buckets:\n$pr")
    assert(count(pr, "Exchange SinglePartition") <= 1,
      s"only the bounded bucket-offset prefix sum may single-partition:\n$pr")
    // the full query: window blocking stays an equi-join
    val p = plan(graft.queries.DedupQueries.qSortedNeighborhood(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"window blocking must stay an equi-join:\n$p")
  }

  test("rag ivf gate: probe scan prunes centroid_id partitions statically; recall holds") {
    val df = graft.queries.RagQueries
      .queries("rag_retrieve_topk_ivf_gate")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 5, s"5 gate queries expected, got ${rows.length}")
    assert(rows.forall(_.getBoolean(2)),
      s"recall floor violated: ${rows.mkString(", ")}")
    // the serving shape: the driver-computed centroid shortlist must
    // reach the stored lists scan as a PARTITION filter (a static IN on
    // the partition column reads only the probed directories — the
    // 100-TB property this gate exists to measure)
    val p = plan(df)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("centroid_id")),
      s"probe scan must prune centroid_id partition dirs:\n$p")
  }

  test("rag ivf skew gate: same static partition pruning under adversarial skew") {
    val df = graft.queries.RagQueries
      .queries("rag_retrieve_topk_ivf_skew_gate")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 5 && rows.forall(_.getBoolean(2)),
      s"skew recall floor violated: ${rows.mkString(", ")}")
    // the capped index must serve through the identical plan shape as
    // the uniform leg — the balanced build changes WHERE rows live
    // (sub-lists of the split hot cluster), never the serving plan
    val p = plan(df)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("centroid_id")),
      s"skew probe scan must prune centroid_id partition dirs:\n$p")
  }

  test("heaps curve: type first-appearance agg partials map-side; no corpus-global window") {
    // the heavy half (r16: the fit now runs over the pinned collected
    // curve, so the corpus-sized plan is [[heapsCurve]], not the output)
    val p = plan(graft.queries.TextQueries.heapsCurve(spark, sf))
    assert(count(p, "partial_min") >= 1,
      s"min(rank) per type must partial-aggregate map-side:\n$p")
    val globals = "Exchange SinglePartition".r.findAllMatchIn(p).length
    // the ≤10-row decile cumsums may single-partition; the corpus-sized
    // rank may not — bounded count is the proxy
    assert(globals <= 4, s"too many single-partition stages ($globals):\n$p")
    assert(count(p, "Window") >= 2, s"two-level rank windows expected:\n$p")
    // the determinism pin: the OUTPUT plan's fit must aggregate a
    // single-partition LocalRelation (fixed accumulation order), never
    // a shuffled relation
    val out = plan(graft.queries.TextQueries.qHeapsLaw(spark, sf))
    assert(out.contains("LocalTableScan"),
      s"fit must run over the pinned collected curve:\n$out")
    assert(!out.contains("Exchange hashpartitioning"),
      s"pinned fit must not reshuffle:\n$out")
  }
}
