package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.llm.HashEmbedder
import graft.retrieval.Retrieval
import org.apache.spark.sql.functions._

/** Vector + text function correctness, including codegen-vs-interpreted
  * agreement for the CosineSimilarity expression and SQL registration. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine expression matches local computation (float arrays)") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(0.5f, -1.0f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    val want = Retrieval.cosineLocal(a, b)
    assert(math.abs(got - want) < 1e-12)
  }

  test("cosine: orthogonal → 0, identical → 1, zero/empty/mismatch → null") {
    val rows = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(0f, 0f), Array(1f, 1f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(1f), Array(1f, 2f)))
    val got = rows.toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get) < 1e-12)
    assert(math.abs(got(1).get - 1.0) < 1e-12)
    assert(got(2).isEmpty && got(3).isEmpty && got(4).isEmpty)
  }

  test("null ELEMENT → null for cosine and dot (codegen + interpreted)") {
    // ADVICE r9: arrays with containsNull=true used to read a garbage
    // 0-filled value through getFloat; the contract now matches DuckDB's
    // NULL-propagating list_inner_product on both eval paths.
    VectorFunctions.register(spark)
    val q = "SELECT dot_product(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) d, " +
      "cosine_sim(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) c, " +
      "dot_product(array(1.0F, 2.0F), array(CAST(NULL AS FLOAT), 2.0F)) d2"
    def check(): Unit = {
      val r = spark.sql(q).collect()(0)
      assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // null-free values through the same containsNull=true type still score
    val ok = spark.sql(
      "SELECT dot_product(array(1.0F, nullif(2.0F, 0.0F)), array(3.0F, 4.0F))")
      .as[Double].head()
    assert(math.abs(ok - 11.0) < 1e-12)
  }

  test("cosine survives codegen off (interpreted path agrees)") {
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f))).toDF("a", "b")
    val expected = Retrieval.cosineLocal(Array(1f, 2f, 3f), Array(3f, 2f, 1f))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
      assert(math.abs(interp - expected) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val codegen = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(codegen - expected) < 1e-12)
  }

  test("all native functions registered for SQL") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0F, 2.0F), array(1.0F, 2.0F))").as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
    val ng = spark.sql(
      "SELECT word_ngrams('a b c d', 3)").as[Seq[String]].head()
    assert(ng == Seq("a b c", "b c d"))
    val mh = spark.sql(
      "SELECT minhash_sig(array('x','y'), 8)").as[Seq[Long]].head()
    assert(mh.length == 8)
    val sh = spark.sql(
      "SELECT simhash60(array('x','y')) = simhash60(array('y','x','x'))")
      .as[Boolean].head()
    assert(sh, "set semantics via SQL")
    val hp = spark.sql(
      "SELECT hyperplane_sig(array(1.0F, -2.0F, 0.5F), 0, 8)").as[Int].head()
    assert(hp == graft.functions.HashKernels.hyperplaneSig(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](1.0f, -2.0f, 0.5f)), 0, 8))
    val q8 = spark.sql(
      "SELECT cosine_sim_q8(quantize_q8(array(1.0F, 2.0F, 3.0F)), " +
        "quantize_q8(array(2.0F, 4.0F, 6.0F)))").as[Double].head()
    assert(math.abs(q8 - 1.0) < 1e-4, s"parallel vectors: $q8")
  }

  test("q8 quantized cosine tracks float cosine within quantization error") {
    VectorFunctions.register(spark)
    import org.apache.spark.sql.functions.expr
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(200)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib")).limit(500)
      .select(
        VectorFunctions.cosine(col("va"), col("vb")).as("exact"),
        VectorFunctions.cosineQ8(
          VectorFunctions.quantizeQ8(col("va")),
          VectorFunctions.quantizeQ8(col("vb"))).as("quant"))
      .select(expr("max(abs(exact - quant))")).as[Double].head()
    assert(pairs < 0.02, s"q8 error too large: $pairs")
  }

  test("redactPii: emails, IPv4s, hex secrets replaced; look-alikes kept") {
    import graft.functions.TextFunctions.redactPii
    import spark.implicits._
    def red(s: String): String =
      Seq(s).toDF("t").select(redactPii(col("t"))).as[String].head()
    assert(red("mail bob.smith+x@dev.example.org now") == "mail [EMAIL] now")
    assert(red("node 192.168.0.1 and 10.0.0.255 down") ==
      "node [IP] and [IP] down")
    assert(red("key " + "a1" * 16 + " leaked") == "key [SECRET] leaked")
    // several kinds in one text, redacted in one pass
    assert(red("a@b.co 1.2.3.4 " + "0f" * 20) == "[EMAIL] [IP] " + "[SECRET]")
    // look-alikes survive: version strings, short hex, bare at-signs
    assert(red("v1.2.3 release") == "v1.2.3 release")
    assert(red("deadbeef cafe") == "deadbeef cafe")
    assert(red("meet @ noon") == "meet @ noon")
    assert(red("") == "")
  }

  test("shingles + jaccard") {
    val df = Seq(("a b c d", "a b c e")).toDF("x", "y")
    val got = df.select(
      TextFunctions.jaccardShingles(
        TextFunctions.shingles(col("x"), 3),
        TextFunctions.shingles(col("y"), 3))).as[Double].head()
    // shingles x: {a b c, b c d}; y: {a b c, b c e} → 1/3
    assert(math.abs(got - 1.0 / 3.0) < 1e-12)
  }

  test("simhash: identical texts → distance 0; disjoint texts differ") {
    val df = Seq(
      ("same tokens here", "same tokens here"),
      ("alpha beta gamma delta", "epsilon zeta eta theta")).toDF("x", "y")
    val d = df.select(TextFunctions.hamming(
      TextFunctions.simhash(TextFunctions.tokens(col("x"))),
      TextFunctions.simhash(TextFunctions.tokens(col("y"))))).as[Long].collect()
    assert(d(0) == 0L)
    assert(d(1) > 0L)
  }

  test("langId picks marker language") {
    val df = Seq("the cat is on the mat and the dog",
      "der hund und die katze ist da",
      "xyzzy plugh").toDF("t")
    val got = df.select(TextFunctions.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("hash embedder: deterministic, normalized, similar texts closer") {
    val e = new HashEmbedder(64)
    val a1 = e.embed("retry with backoff")
    val a2 = e.embed("retry with backoff")
    assert(a1.toSeq == a2.toSeq)
    val near = Retrieval.cosineLocal(a1, e.embed("retry with backoff attempts"))
    val far = Retrieval.cosineLocal(a1, e.embed("completely unrelated ledger"))
    assert(near > far)
  }
}
