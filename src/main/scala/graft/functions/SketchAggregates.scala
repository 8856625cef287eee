package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sketch aggregates as `TypedImperativeAggregate`s — the custom-aggregate
  * path SURVEY §4 reserves for [EXT] sketches (the reference's `reduce` hook,
  * gmr.h:104, generalized to a mergeable fixed-size state).
  *
  * Why not column-per-permutation `min()` aggregates: 32–64 independent agg
  * columns build an expression tree wide enough to hurt Janino and carry a
  * per-column update loop; the sketch buffer is ONE primitive array updated
  * in a tight loop, shuffles as one compact binary blob, and partial-
  * aggregates map-side — the constant-size-per-key property that matters at
  * 100 TB (signature bytes per document, independent of document size).
  */
object MinHashSig {
  /** 2^31 - 1 (prime); all permutation arithmetic is mod P. */
  val P: Long = 2147483647L
  val MaxPerm = 64

  /** Fixed-seed universal-hash parameters h_i(x) = (a_i·x + b_i) mod P —
    * deterministic across runs/sessions so results are reproducible.
    */
  val (permA, permB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(MaxPerm)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
      Array.fill(MaxPerm)(rnd.nextInt(Int.MaxValue).toLong))
  }
}

/** MinHash signature of a group of 64-bit element hashes: for each of
  * `numPerm` fixed permutations, the minimum permuted value over the group.
  * Input rows are arbitrary longs (e.g. `xxhash64` of a shingle); they are
  * folded into [0, P) internally. Empty groups yield the all-P signature.
  */
case class MinHashSig(
    child: Expression,
    numPerm: Int = 32,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinHashSig._
  require(numPerm > 0 && numPerm <= MaxPerm, s"numPerm must be in [1, $MaxPerm]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a bigint column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(numPerm)(P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = ((v.asInstanceOf[Long] % P) + P) % P
      var i = 0
      while (i < numPerm) {
        val x = (permA(i) * h + permB(i)) % P // < 2^62, no overflow
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSig =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSig =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "minhash_sig"
}

/** Elementwise sum of array<double> rows — the vector-accumulation kernel
  * (k-means centroid updates, mean embeddings). Buffer = one primitive
  * double array that zero-extends to the longest row seen; partial-
  * aggregates map-side, so a groupBy ships k×dim doubles per partition
  * instead of exploding rows×dim. Ragged inputs therefore sum over the
  * LONGEST dimension with absent entries contributing 0.
  */
case class ArraySumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_sum_agg requires array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val out = grow(buf, arr.numElements())
      var i = 0
      while (i < arr.numElements()) { out(i) += arr.getDouble(i); i += 1 }
      out
    }
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    val out = grow(buf, other.length)
    var i = 0
    while (i < other.length) { out(i) += other(i); i += 1 }
    out
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArraySumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "array_sum_agg"
}

/** SimHash signature of a group of 64-bit element hashes: bit b of the
  * result is set iff more elements have bit b set than clear. Same
  * fixed-size-mergeable-state rationale as [[MinHashSig]] — the buffer is
  * 64 signed counters, shuffled as one blob.
  */
case class SimHashSig(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires a bigint column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashSig =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSig =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "simhash_sig"
}

/** Frequent-items (heavy-hitters) sketch over a bigint key column —
  * DataSketches' Misra–Gries/space-saving variant (`LongsSketch`): a fixed
  * `maxMapSize`-slot map whose purge step subtracts the median counter, so
  * the sketch holds every item of frequency > N·3.5/maxMapSize with
  * one-sided error ≤ getMaximumError() regardless of stream order or
  * partitioning. The q12 device applies downstream: estimates are
  * order-dependent under purges (Spark's aggregation order is not
  * deterministic), so gate queries emit exact counts + the sketch's
  * GUARANTEED verdicts (captured / bound membership), never raw estimates.
  *
  * Buffer = one sketch object; partial-aggregates map-side and shuffles as
  * the compact serialized form (≤ ~16·maxMapSize bytes) — at 100 TB the
  * driver-bound state is one sketch, not a key histogram.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    org.apache.datasketches.frequencies.LongsSketch] {

  import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
  import org.apache.datasketches.memory.Memory

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2 ≥ 8, got $maxMapSize")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  private val itemType = StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("max_err", LongType, nullable = false),
    StructField("items", ArrayType(itemType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_items_agg requires a bigint column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch =
    buf.merge(other)

  override def eval(buf: LongsSketch): Any = {
    // NO_FALSE_NEGATIVES: every item whose true count exceeds the maximum
    // error is present. Deterministic emission order (est desc, item asc)
    // for a stable dumped array; the ESTIMATES themselves remain
    // order-dependent — downstream queries must project verdicts.
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => InternalRow(r.getItem, r.getEstimate, r.getLowerBound,
        r.getUpperBound): InternalRow)
    InternalRow(buf.getMaximumError,
      new GenericArrayData(rows.asInstanceOf[Array[Any]]))
  }

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_items_agg"
}
