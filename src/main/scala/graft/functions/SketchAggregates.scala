package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable count-min-sketch surface — the frequency twin of the HLL
  * reach rollup (`EventQueries.qReachSketchRollup`).
  *
  * Spark ships the BUILD side (`count_min_sketch(col, eps, conf, seed)`,
  * used as-is — functions-not-UDFs) but exposes neither a re-aggregation
  * nor a point lookup over the resulting binary sketches, so coarser
  * granularities would have to re-scan raw events. [[CmsMergeAgg]] closes
  * that: it is one of the engine's two genuine UDAF-shaped needs — the
  * other is [[MinhashMergeAgg]] below, same justification (SURVEY §2.11
  * deliberately has none elsewhere) — mergeable BINARY state that no
  * built-in aggregate or window can combine — implemented as a
  * `TypedImperativeAggregate[CountMinSketch]` so partial aggregation
  * (map-side combine of sketches) still applies.
  *
  * Scale shape: the expensive pass over 100 TB of events materializes one
  * KB-scale sketch per fine-grained group; every coarser rollup
  * (day→week→all-time) merges sketches at cost ∝ GROUPS. Point estimates
  * then run on the k-row rollup, never the raw data.
  */
object SketchFunctions {

  /** Merge (UNION) binary count-min sketches built with identical
    * (eps, confidence, seed) — estimates add, the CMS merge law. */
  def cmsMerge(sketch: Column): Column =
    GraftBridge.column(
      CmsMergeAgg(GraftBridge.expression(sketch)).toAggregateExpression())

  /** Point frequency estimate of `item` under a binary CMS. Guarantees
    * est ≥ true count (counters only over-count on hash collisions) and
    * est ≤ true + eps·N with confidence `conf` per probe. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(sketch), GraftBridge.expression(item)))

  /** Mergeable k-component MinHash signature over a grouped STREAM of set
    * elements ([[MinhashMergeAgg]]) — bit-identical to
    * [[graft.functions.TextFunctions.minhashSignature]] over the
    * collected set, without ever materializing the set. */
  def minhashAgg(element: Column, k: Int): Column =
    GraftBridge.column(
      MinhashMergeAgg(GraftBridge.expression(element), k).toAggregateExpression())

  /** Mergeable KMV distinct sketch ([[KmvAgg]]): the k smallest distinct
    * hashes of the group's keys — supports union, Jaccard AND
    * intersection estimates over the rollup (see [[Kmv]]). */
  def kmvSketch(key: Column, k: Int): Column =
    GraftBridge.column(
      KmvAgg(GraftBridge.expression(key), k).toAggregateExpression())
}

/** UNION of binary count-min sketches (same eps/confidence/seed). The
  * aggregation buffer is the live `CountMinSketch`; inputs are the binary
  * blobs `count_min_sketch` emitted upstream. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) buffer
    else {
      val s = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      if (buffer == null) s else { buffer.mergeInPlace(s); buffer }
    }
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    if (b1 == null) b2
    else if (b2 == null) b1
    else { b1.mergeInPlace(b2); b1 }

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val out = new ByteArrayOutputStream()
      buffer.writeTo(out)
      out.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_merge"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_merge expects a BINARY sketch column, got $other")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** Frequency estimate of `right` under the binary sketch `left`.
  *
  * Runs on rollup tables (one row per group), never the raw event scan, so
  * it is deliberately an eval expression (CodegenFallback) with a
  * last-blob deserialization cache: consecutive probes against the same
  * merged sketch — the k-probes-per-group access pattern — deserialize
  * once. Item hashing matches the build side's `count_min_sketch`
  * dispatch (longs as longs, strings as UTF-8 bytes).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType | LongType | StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate expects (BINARY, int/bigint/string), got ($l, $r)")
    }

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes)) {
      lastSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      lastBytes = bytes
    }
    right.dataType match {
      case IntegerType => lastSketch.estimateCount(Long.box(item.asInstanceOf[Int].toLong))
      case LongType => lastSketch.estimateCount(Long.box(item.asInstanceOf[Long]))
      case StringType =>
        lastSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
    }
  }

  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Mergeable MinHash signature over a STREAM of set elements — the
  * second (and with [[CmsMergeAgg]], only other) justified UDAF shape in
  * the engine: element-wise-min ARRAY state that no built-in aggregate
  * combines without exploding k rows per element through the plan.
  *
  * Motivation (dd_source_overlap_minhash): a per-SOURCE signature over
  * its shingle set. The expression form ([[MinHashSignature]]) needs the
  * whole set as one array — at 100 TB a source's shingle set never fits
  * a row. The posexplode formulation (k rows per shingle into a
  * (source, seed) min-agg) is semantically right but materializes
  * |shingles|·k aggregation rows — measured 20 s at sf0.1 with k=1024
  * vs ~1 s for this one-pass fold. Buffer = k longs; update folds one
  * element via [[HashKernels.minhashInto]] (the SAME hash family as the
  * expression kernel, so signatures are bit-identical); merge =
  * element-wise min — map-side partials apply, the shuffle carries one
  * k-long array per (partition, group).
  */
case class MinhashMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) HashKernels.minhashInto(buffer, v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_merge"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_merge expects a STRING element column, got $other")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinhashMergeAgg =
    copy(child = newChild)
}

/** Mergeable KMV (k-minimum-values) distinct sketch (Bar-Yossef et al.
  * 2002, "Counting distinct elements in a data stream" / Beyer et al.
  * 2007 — public papers): the k smallest distinct hash values of the
  * group's elements. The third justified UDAF shape: bounded ORDERED-SET
  * state (k longs) that no built-in aggregate maintains — and the one
  * sketch algebra the HLL family lacks: because the state is the actual
  * k-min sample, two sketches support set INTERSECTION and Jaccard
  * estimates (take the k smallest of the union; the fraction present in
  * both input samples estimates J), not just union cardinality.
  *
  * Estimator contract (k-bounded arrays, computed over the ≤|groups|-row
  * rollup, never the raw data): fewer than k values ⇒ the sketch IS the
  * exact distinct hash set; otherwise D̂ = (k−1)/u(k) with u(k) the kth
  * order statistic mapped to (0,1) — σ/D ≈ 1/√(k−2).
  *
  * Scale shape mirrors [[CmsMergeAgg]]: one pass over 100 TB of events
  * yields an 8·k-byte sketch per group; every coarser rollup and every
  * intersection/union estimate merges k-long arrays at cost ∝ GROUPS. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // keep only the k smallest (signed order — the estimator maps it to
    // the unsigned unit interval monotonically, so any fixed total order
    // on uniform hashes is valid)
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, HashKernels.hashLong(v match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l.longValue()
    }))
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < bytes.length / 8) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch expects an integral key column, got $other")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

/** Driver-side estimator algebra over evaluated KMV sketch arrays —
  * k-bounded inputs, constant work; lives next to the aggregate so the
  * sketch layout and its estimators stay one unit. */
object Kmv {

  private def frac(h: Long): Double =
    (h.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** Distinct estimate: exact when the sketch is under-full. */
  def estimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / frac(sketch(k - 1))

  /** The union's KMV sketch: k smallest of the merged samples. */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    (a.toSet ++ b.toSet).toArray.sorted.take(k)

  /** Jaccard estimate: fraction of the union's k-min sample present in
    * BOTH input samples. */
  def jaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
    val u = union(a, b, k)
    if (u.isEmpty) return 0.0
    val as = a.toSet; val bs = b.toSet
    u.count(h => as.contains(h) && bs.contains(h)).toDouble / u.length
  }

  /** Intersection cardinality estimate: Ĵ · |A ∪ B|̂. */
  def intersection(a: Array[Long], b: Array[Long], k: Int): Double =
    jaccard(a, b, k) * estimate(union(a, b, k), k)
}
