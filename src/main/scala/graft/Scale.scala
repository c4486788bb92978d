package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scaler (VERDICT r4 item 2): builds an sf×`factor` copy of a
  * driver sf-dir so the scale claims (graph-family cost ≈ scheduler
  * constant; nothing super-linear beyond documented complexity) can be
  * MEASURED instead of argued. `java -cp … graft.Scale <src> <dst> <N>`.
  *
  * The construction must scale the WORKLOAD structure linearly, not just
  * the row count — naive row duplication would be a trap: 10 identical
  * copies of every document put 10× members in every minhash/simhash
  * bucket, inflating the candidate-pair volume ~100× (quadratic in the
  * copy count), which would indict the data, not the engine. So each
  * copy is a disjoint shard with the ORIGINAL's internal structure:
  *
  *  - keys shift by a per-table stride (max key + 1), keeping FK joins
  *    (orders↔lineitem↔part/supplier, orders↔customer) consistent;
  *    nation/region stay single-copy like TPC-H dimensions;
  *  - document text gets a per-copy token suffix (`$1_cN` on every
  *    token): an injective token map preserves every within-copy
  *    shingle/n-gram relation exactly while making cross-copy overlap
  *    empty — dup pairs scale ×N, never ×N²;
  *  - embeddings get a per-copy deterministic sign-flip pattern:
  *    cos(s∘a, s∘b) = cos(a, b) for one pattern s (within-copy geometry
  *    identical) while cross-copy cosines collapse toward 0 — near-dup
  *    pair counts and IVF cluster shapes scale ×N;
  *  - events shift user/event ids (N× users, same per-user history —
  *    how real traffic grows) with timestamps untouched.
  */
object Scale {

  def main(args: Array[String]): Unit = {
    val Array(src, dst, fStr) = args
    val factor = fStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS): read nanos as long and
      // write the long back — Tables.events handles both encodings
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1
    def copies(df: DataFrame)(project: Int => DataFrame): DataFrame =
      (0 until factor).map(project).reduce(_ unionByName _)
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")

    // dimensions: single copy, shared by every shard
    read("region").write.mode("overwrite").parquet(s"$dst/region.parquet")
    read("nation").write.mode("overwrite").parquet(s"$dst/nation.parquet")

    val customer = read("customer"); val custS = stride(customer, "c_custkey")
    val supplier = read("supplier"); val suppS = stride(supplier, "s_suppkey")
    val part = read("part");         val partS = stride(part, "p_partkey")
    val orders = read("orders");     val ordS = stride(orders, "o_orderkey")

    write(copies(customer) { c =>
      customer.withColumn("c_custkey", col("c_custkey") + lit(c * custS))
    }, "customer", 4)
    write(copies(supplier) { c =>
      supplier.withColumn("s_suppkey", col("s_suppkey") + lit(c * suppS))
    }, "supplier", 2)
    write(copies(part) { c =>
      part.withColumn("p_partkey", col("p_partkey") + lit(c * partS))
    }, "part", 4)
    write(copies(orders) { c =>
      orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(c * ordS))
        .withColumn("o_custkey", col("o_custkey") + lit(c * custS))
    }, "orders", 8)
    val lineitem = read("lineitem")
    write(copies(lineitem) { c =>
      lineitem
        .withColumn("l_orderkey", col("l_orderkey") + lit(c * ordS))
        .withColumn("l_partkey", col("l_partkey") + lit(c * partS))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * suppS))
    }, "lineitem", 16)

    val events = read("events")
    val evS = stride(events, "event_id")
    val userS = stride(events, "user_id")
    write(copies(events) { c =>
      events
        .withColumn("event_id", col("event_id") + lit(c * evS))
        .withColumn("user_id", col("user_id") + lit(c * userS))
    }, "events", 8)

    val documents = read("documents")
    val docS = stride(documents, "doc_id")
    write(copies(documents) { c =>
      val text =
        if (c == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1_c" + c)
      documents
        .withColumn("doc_id", col("doc_id") + lit(c * docS))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("source",
          if (c == 0) col("source") else concat(col("source"), lit("_c" + c)))
    }, "documents", 8)

    val emb = read("embeddings")
    val vecS = stride(emb, "vec_id")
    write(copies(emb) { c =>
      val flipped =
        if (c == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          when(pmod(xxhash64(lit(c), i), lit(2)) === 0, x).otherwise(-x))
      emb
        .withColumn("vec_id", col("vec_id") + lit(c * vecS))
        .withColumn("embedding", flipped)
    }, "embeddings", 4)

    println(s"""{"scaled":"$dst","factor":$factor}""")
    spark.stop()
  }
}
