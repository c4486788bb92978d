package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}

/** Column-API surface for the engine's vector math.
  *
  * `cosine(a, b)` is the one genuinely new scalar the reference needs
  * (SURVEY §2.9): everything else (dot products, norms) stays expressible
  * with built-in higher-order functions, but cosine sits in the hot path of
  * every retrieval/top-k query, so it gets a codegen'd Catalyst expression.
  */
object VectorFunctions {

  /** Cosine similarity of two ArrayType(Float|Double) columns (codegen'd). */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Inner product of two ArrayType(Float|Double) columns (codegen'd
    * [[DotProduct]]) — the MIPS scoring kernel. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Random-hyperplane LSH bucket id (native [[HyperplaneSig]]): one fused
    * pass per vector instead of one aggregate(zip_with) rescan per bit. */
  def hyperplaneSig(vec: Column, table: Int, bits: Int): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(vec), table, bits))

  /** Int8 quantized form of a float/double vector ([[QuantizeQ8]]). */
  def quantizeQ8(vec: Column): Column =
    GraftBridge.column(QuantizeQ8(GraftBridge.expression(vec)))

  /** Cosine over two q8 byte vectors ([[CosineSimilarityQ8]]). */
  def cosineQ8(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarityQ8(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** PQ codes of a float/double vector under `cb` ([[PqEncode]]). Not
    * SQL-registered: the codebook is a trained object, not a literal. */
  def pqEncode(vec: Column, cb: PqCodebooks): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), cb))

  /** ADC score of PQ codes against a per-query lookup-table column
    * ([[PqAdcScore]]). */
  def pqAdc(codes: Column, dtable: Column, ks: Int): Column =
    GraftBridge.column(PqAdcScore(
      GraftBridge.expression(codes), GraftBridge.expression(dtable), ks))

  /** Register SQL names on a live session (for sessions built without
    * [[graft.GraftExtensions]], e.g. the driver-owned one in `entry`). */
  def register(spark: SparkSession): Unit = {
    spark.udf // force session init
    Registration.builders.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftFunctionRegistry.register(spark, name, info, builder)
    }
  }

  private[graft] object Registration {
    val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
      ("cosine_sim",
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
      ("dot_product",
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1))),
      ("minhash_sig",
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
        (args: Seq[Expression]) => MinHashSignature(args(0),
          args(1).eval().asInstanceOf[Number].intValue())),
      ("simhash60",
        new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
        (args: Seq[Expression]) => SimHash60(args(0))),
      ("word_ngrams",
        new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
        (args: Seq[Expression]) => WordNGrams(args(0),
          args(1).eval().asInstanceOf[Number].intValue())),
      ("hyperplane_sig",
        new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
        (args: Seq[Expression]) => HyperplaneSig(args(0),
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].intValue())),
      ("quantize_q8",
        new ExpressionInfo(classOf[QuantizeQ8].getName, "quantize_q8"),
        (args: Seq[Expression]) => QuantizeQ8(args(0))),
      ("cosine_sim_q8",
        new ExpressionInfo(classOf[CosineSimilarityQ8].getName, "cosine_sim_q8"),
        (args: Seq[Expression]) => CosineSimilarityQ8(args(0), args(1))))
  }
}

/** `SparkSessionExtensions` entry point: sessions built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * get the engine's SQL functions natively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.Registration.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // custom whole-operator plans (as-of merge join)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}
