package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 vector quantization — the memory-scale path for ANN: a 384-dim
  * float embedding is 1536 bytes; its q8 form is 384. At 100 TB the
  * candidate scan is memory-bandwidth bound, so a 4× smaller row with
  * integer dot products scans 4× more vectors per second from the same
  * storage/cache budget; exact float re-ranking of the surviving
  * candidates keeps the OUTPUT exact (same contract as the LSH/MinHash
  * verify-after-prune operators).
  *
  * `quantize_q8(vec)`: direction-preserving scalar quantization —
  * q_i = round(127 · x_i / ‖x‖) — so the byte vector carries the unit
  * direction and cosine over bytes approximates cosine over floats with
  * per-element error ≤ 1/254.
  */
case class QuantizeQ8(child: Expression) extends UnaryExpression {

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_q8 expects array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return null
    val isFloat = elementType == FloatType
    var ss = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      ss += v * v; i += 1
    }
    val norm = math.sqrt(ss)
    if (norm == 0.0) return null
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = math.rint(127.0 * v / norm).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elementType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $x.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double) $x.$getter($i);
         |  $ss += $v * $v;
         |}
         |final double $norm = java.lang.Math.sqrt($ss);
         |if ($n == 0 || $norm == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final byte[] $out = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.rint(
         |      127.0 * (double) $x.$getter($i) / $norm);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "quantize_q8"
  override protected def withNewChildInternal(newChild: Expression): QuantizeQ8 =
    copy(child = newChild)
}

/** Cosine over two q8 byte vectors: integer dot/norm accumulation (no
  * float math until the final division), null on empty/mismatched input —
  * the same contract as [[CosineSimilarity]] on the quantized
  * representation. */
case class CosineSimilarityQ8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_q8 expects two binary (q8) vectors, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = x.length
    if (n == 0 || n != y.length) return null
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      val xi = x(i).toLong; val yi = y(i).toLong
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble)
    if (denom == 0.0) null else dot.toDouble / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $x.length;
         |if ($n == 0 || $n != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L, $nx = 0L, $ny = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $xi = (long) $x[$i];
         |    final long $yi = (long) $y[$i];
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  final double $denom =
         |    java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = (double) $dot / $denom; }
         |}
       """.stripMargin
    })

  override def prettyName: String = "cosine_sim_q8"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityQ8 =
    copy(left = newLeft, right = newRight)
}
