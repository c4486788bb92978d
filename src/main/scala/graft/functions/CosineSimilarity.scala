package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The NULL-element contract shared by [[CosineSimilarity]] and
  * [[DotProduct]] — ONE definition so the two kernels' null semantics
  * can never desync: a null element yields a null result (DuckDB's
  * list_inner_product / list_cosine_similarity contract), checked only
  * when the static type admits null elements so non-nullable embedding
  * scans keep the branch-free loop. */
private[functions] object FloatArrayKernels {
  def mayHaveNullElems(left: Expression, right: Expression): Boolean =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
      case _ => true
    }

  /** Codegen fragment for the per-element guard ("" when statically
    * null-free); `isNull` is the enclosing ev.isNull variable. */
  def nullElemGuard(enabled: Boolean, x: String, y: String, i: String,
      isNull: String): String =
    if (enabled)
      s"if ($x.isNullAt($i) || $y.isNullAt($i)) { $isNull = true; break; }"
    else ""
}

/** Native Catalyst expression: cosine similarity between two fixed-width
  * float/double vectors stored as `ArrayType` columns.
  *
  * This replaces the reference's storage-side ANN scoring (Cassandra SAI
  * cosine index, `helm/templates/cassandra-initdb-configmap.yaml:26-29` in
  * the reference repo) with an in-engine, whole-stage-codegen-friendly
  * scalar: `doGenCode` emits a tight primitive loop with no boxing, no UDF
  * serialization, and no Row allocation, so a 100 TB brute-force scan
  * scores at memory bandwidth within the same codegen stage as the
  * enclosing filter/project.
  *
  * Both children must be arrays of the same floating element type;
  * accumulation is in double either way. Returns null on null/empty input
  * or mismatched lengths rather than throwing, so malformed embedding rows
  * degrade to "no score" exactly like a missing SAI entry would. A NULL
  * ELEMENT also yields null (the NULL-propagating contract of DuckDB's
  * list_inner_product / list_cosine_similarity) — the per-element check is
  * emitted only when the static type says `containsNull = true`, so scans
  * over non-nullable embedding columns keep the branch-free loop.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elementType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType
  }

  private def mayHaveNullElems: Boolean =
    FloatArrayKernels.mayHaveNullElems(left, right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if (a == FloatType || a == DoubleType) && a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects two arrays of the same float/double element type, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || n != y.numElements()) return null
    val checkNulls = mayHaveNullElems
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    if (elementType == FloatType) {
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
    } else {
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elementType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val nullElemGuard = FloatArrayKernels.nullElemGuard(
        mayHaveNullElems, x, y, i, ev.isNull.toString)
      s"""
         |final int $n = $x.numElements();
         |if ($n == 0 || $n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemGuard
         |    final double $xi = (double) $x.$getter($i);
         |    final double $yi = (double) $y.$getter($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native inner product of two float/double array columns — the MIPS
  * scoring kernel (recommender-style retrieval ranks on raw dot
  * products: item popularity lives in the norm, which cosine deliberately
  * divides away). Same codegen shape and null contract as
  * [[CosineSimilarity]], minus the norm accumulators — including the
  * NULL-element propagation (a null element yields null, matching
  * DuckDB's list_inner_product; checked only when the static type admits
  * null elements). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elementType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  private def mayHaveNullElems: Boolean =
    FloatArrayKernels.mayHaveNullElems(left, right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
        if a == b && (a == FloatType || a == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects two arrays of the same float/double element type, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || n != y.numElements()) return null
    val checkNulls = mayHaveNullElems
    var dot = 0.0
    var i = 0
    if (elementType == FloatType) {
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
      }
    } else {
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        dot += x.getDouble(i) * y.getDouble(i); i += 1
      }
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elementType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nullElemGuard = FloatArrayKernels.nullElemGuard(
        mayHaveNullElems, x, y, i, ev.isNull.toString)
      s"""
         |final int $n = $x.numElements();
         |if ($n == 0 || $n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemGuard
         |    $dot += (double) $x.$getter($i) * (double) $y.$getter($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
