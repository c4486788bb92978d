package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product quantization (Jégou, Douze, Schmid 2011, "Product Quantization
  * for Nearest Neighbor Search", IEEE TPAMI 33(1)) — the memory-scale
  * path past int8: a d-dim float vector (4d bytes) compresses to `m`
  * one-byte codes by splitting it into m subvectors and snapping each to
  * its nearest entry in a per-subspace codebook of ks ≤ 256 centroids.
  * A 64-dim float32 embedding is 256 bytes, its q8 form 64 bytes, its
  * PQ(m=8) form 8 bytes — a 32× smaller candidate scan.
  *
  * Scoring is asymmetric distance computation (ADC, §IV.A of the paper):
  * the QUERY stays un-quantized; per query a lookup table
  * `dt[j][c] = ⟨q̂_j, codebook_j[c]⟩` is computed once driver-side
  * (m·ks dot products), and each candidate's approximate cosine is then
  * m table lookups — no float vector is read at scan time. Exactness
  * contract: like the q8 and LSH paths, PQ prunes candidates only; the
  * survivors re-rank with the exact float cosine, so output scores are
  * exact and only recall is approximate (gated by `vs_knn_pq_recall`).
  *
  * Vectors are L2-normalized before encoding (and queries before table
  * build), so the summed inner products approximate the cosine directly —
  * the standard IP-over-unit-sphere PQ setup. */
case class PqCodebooks(subDim: Int, centroids: Array[Array[Array[Float]]])
    extends Serializable {
  require(centroids.nonEmpty && centroids.forall(_.length == centroids(0).length),
    "codebooks must be rectangular")
  def m: Int = centroids.length
  def ks: Int = centroids(0).length
  def dim: Int = m * subDim

  /** Flat [m·ks·subDim] centroid layout for the codegen kernels. */
  @transient lazy val flat: Array[Float] = {
    val out = new Array[Float](m * ks * subDim)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        System.arraycopy(centroids(j)(c), 0, out, (j * ks + c) * subDim, subDim)
        c += 1
      }
      j += 1
    }
    out
  }

  /** ‖codebook entry‖²/2 per (subspace, centroid) — the constant term of
    * `argmin ‖v−c‖² = argmax (⟨v,c⟩ − ‖c‖²/2)` in the encoder. */
  @transient lazy val halfNorms: Array[Double] = {
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var ss = 0.0
        val cv = centroids(j)(c)
        var t = 0
        while (t < subDim) { ss += cv(t).toDouble * cv(t); t += 1 }
        out(j * ks + c) = ss / 2.0
        c += 1
      }
      j += 1
    }
    out
  }

  /** One query's flat ADC table: `dt[j·ks + c] = ⟨q̂_sub_j, centroid⟩`.
    * Driver-side — m·ks·subDim multiplies per query, microseconds. */
  def adcTable(q: Array[Float]): Array[Float] = {
    require(q.length == dim, s"query dim ${q.length} != codebook dim $dim")
    var ss = 0.0
    var i = 0
    while (i < q.length) { ss += q(i).toDouble * q(i); i += 1 }
    val norm = math.sqrt(ss)
    val inv = if (norm == 0.0) 0.0 else 1.0 / norm
    val out = new Array[Float](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val cv = centroids(j)(c)
        var dot = 0.0
        var t = 0
        while (t < subDim) { dot += q(j * subDim + t) * inv * cv(t); t += 1 }
        out(j * ks + c) = dot.toFloat
        c += 1
      }
      j += 1
    }
    out
  }
}

object PqCodebooks {

  /** Train per-subspace codebooks on a (driver-local, bounded) sample —
    * the same never-full-corpus discipline as
    * [[graft.retrieval.IvfIndex.buildCentroids]]: codebook quality needs
    * O(ks) observations per centroid, not O(n). Deterministic:
    * farthest-first seeding then `iterations` Lloyd steps, per subspace,
    * under L2 on the normalized sample. */
  def train(
      samples: Array[Array[Float]],
      m: Int,
      ks: Int,
      iterations: Int = 8): PqCodebooks = {
    require(samples.nonEmpty, "empty training sample")
    val dim = samples(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    require(ks >= 1 && ks <= 256, s"ks=$ks must fit one byte")
    val subDim = dim / m
    val unit = samples.map { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0.0) v else v.map(x => (x / n).toFloat)
    }
    val books = (0 until m).map { j =>
      val sub = unit.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      kmeans(sub, math.min(ks, sub.length), iterations, padTo = ks)
    }.toArray
    PqCodebooks(subDim, books)
  }

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic L2 k-means: farthest-first seeds, Lloyd refinement;
    * duplicates the last centroid up to `padTo` so every codebook has
    * exactly ks entries (codes stay valid even on tiny samples). */
  private def kmeans(
      pts: Array[Array[Float]],
      k: Int,
      iterations: Int,
      padTo: Int): Array[Array[Float]] = {
    val seeds = new Array[Int](k)
    val minD = Array.fill(pts.length)(Double.PositiveInfinity)
    seeds(0) = 0
    var chosen = 0
    while (chosen < k - 1) {
      val last = pts(seeds(chosen))
      var far = 0
      var farD = Double.NegativeInfinity
      var i = 0
      while (i < pts.length) {
        val d = l2(pts(i), last)
        if (d < minD(i)) minD(i) = d
        if (minD(i) > farD) { farD = minD(i); far = i }
        i += 1
      }
      chosen += 1
      seeds(chosen) = far
    }
    var cents = seeds.map(pts(_).clone())
    val subDim = pts(0).length
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(k)(new Array[Double](subDim))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val d = l2(p, cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val acc = sums(best)
        var t = 0
        while (t < subDim) { acc(t) += p(t); t += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (prev, c) =>
        if (counts(c) == 0) prev
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
      iter += 1
    }
    if (cents.length >= padTo) cents
    else cents ++ Array.fill(padTo - cents.length)(cents.last.clone())
  }
}

/** `pq_encode(vec)`: normalize, then per subspace pick the L2-nearest
  * codebook entry — m bytes out. Null on dimension mismatch or a zero
  * vector (no direction to encode), mirroring [[QuantizeQ8]]. */
case class PqEncode(child: Expression, cb: PqCodebooks) extends UnaryExpression {

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != cb.dim) return null
    val isFloat = elementType == FloatType
    val v = new Array[Double](cb.dim)
    var ss = 0.0
    var i = 0
    while (i < cb.dim) {
      v(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      ss += v(i) * v(i); i += 1
    }
    val norm = math.sqrt(ss)
    if (norm == 0.0) return null
    val flat = cb.flat
    val half = cb.halfNorms
    val out = new Array[Byte](cb.m)
    var j = 0
    while (j < cb.m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cb.ks) {
        var dot = 0.0
        val base = (j * cb.ks + c) * cb.subDim
        var t = 0
        while (t < cb.subDim) {
          dot += flat(base + t) * (v(j * cb.subDim + t) / norm); t += 1
        }
        val score = dot - half(j * cb.ks + c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elementType == FloatType) "getFloat" else "getDouble"
    val flatRef = ctx.addReferenceObj("pqFlat", cb.flat, "float[]")
    val halfRef = ctx.addReferenceObj("pqHalf", cb.halfNorms, "double[]")
    val (m, ks, subDim, dim) = (cb.m, cb.ks, cb.subDim, cb.dim)
    nullSafeCodeGen(ctx, ev, x => {
      val v = ctx.freshName("v")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val score = ctx.freshName("score")
      s"""
         |if ($x.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $v = new double[$dim];
         |  double $ss = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $v[$i] = (double) $x.$getter($i);
         |    $ss += $v[$i] * $v[$i];
         |  }
         |  final double $norm = java.lang.Math.sqrt($ss);
         |  if ($norm == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    final byte[] $out = new byte[$m];
         |    for (int $j = 0; $j < $m; $j++) {
         |      int $best = 0;
         |      double $bestScore = java.lang.Double.NEGATIVE_INFINITY;
         |      for (int $c = 0; $c < $ks; $c++) {
         |        double $dot = 0.0;
         |        final int $base = ($j * $ks + $c) * $subDim;
         |        for (int $t = 0; $t < $subDim; $t++) {
         |          $dot += $flatRef[$base + $t] * ($v[$j * $subDim + $t] / $norm);
         |        }
         |        final double $score = $dot - $halfRef[$j * $ks + $c];
         |        if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |      }
         |      $out[$j] = (byte) $best;
         |    }
         |    ${ev.value} = $out;
         |  }
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc(codes, dtable)`: the ADC inner loop — Σ_j dt[j·ks + codes[j]].
  * `dtable` is a per-query column (broadcast with the query row), so one
  * fixed expression serves every query; null on a table/code shape
  * mismatch. */
case class PqAdcScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (binary codes, array<float> table), got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val dt = b.asInstanceOf[ArrayData]
    if (codes.isEmpty || dt.numElements() != codes.length * ks) return null
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      s += dt.getFloat(j * ks + (codes(j) & 0xFF)); j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |if ($x.length == 0 || $y.numElements() != $x.length * $ks) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $x.length; $j++) {
         |    $s += (double) $y.getFloat($j * $ks + (((int) $x[$j]) & 0xFF));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
