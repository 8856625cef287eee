package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k smallest (ord, id) pairs seen, kept sorted
  * ascending by (ord, id). Parallel primitive arrays, no boxing; `n` is the
  * live prefix length.
  */
final class TopKState(val k: Int) {
  var n: Int = 0
  val ords: Array[Long] = new Array[Long](k)
  val ids: Array[Long] = new Array[Long](k)

  @inline private def lt(o: Long, i: Long, j: Int): Boolean =
    o < ords(j) || (o == ords(j) && i < ids(j))

  /** Insert (o, i) if it ranks within the top k. O(k) shift — k is a small
    * constant (a quota), so this beats any heap's constant factor.
    */
  def insert(o: Long, i: Long): Unit = {
    if (n == k && !lt(o, i, n - 1)) return
    var pos = if (n < k) n else n - 1 // drop the current max if full
    while (pos > 0 && lt(o, i, pos - 1)) {
      ords(pos) = ords(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    ords(pos) = o; ids(pos) = i
    if (n < k) n += 1
  }
}

/** Top-k-per-group aggregate: the k smallest (ord, id) pairs of the group,
  * ascending (callers negate `ord` for a descending quota). Returns
  * `array<struct<ord bigint, id bigint>>` in rank order.
  *
  * This is the scale-correct form of `row_number() OVER (PARTITION BY g
  * ORDER BY ...) <= k`: the window form shuffles EVERY row to its group's
  * partition and sorts the whole group just to keep k of them; this
  * aggregate's state is a constant 2k longs per group, it partial-aggregates
  * map-side (each task emits at most k rows per group it saw), and the
  * shuffle carries tasks x groups x k pairs instead of the full relation —
  * the difference between a per-domain quota costing a corpus-wide sort and
  * costing a map-side fold at 100 TB.
  *
  * NULL semantics: rows with a NULL ord or id are IGNORED (standard
  * aggregate-input behavior), which diverges from the window form — there
  * `ORDER BY ord, id` ranks NULLs last and they can still land inside the
  * top k when the group is small. Callers needing the window's behavior
  * must coalesce NULLs to a sentinel first; the l47 registry input
  * (documents.n_chars, doc_id) is non-null, so the equivalence claim
  * holds there.
  */
case class TopKAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0 && k <= 1024, s"topk_agg k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = ord :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires two bigint columns, got ${o.simpleString}, ${i.simpleString}")
    }

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      buf.insert(o.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    var j = 0
    while (j < other.n) { buf.insert(other.ords(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKState): Any = {
    val rows = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      rows(j) = new GenericInternalRow(Array[Any](buf.ords(j), buf.ids(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putLong(buf.ords(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new TopKState(k)
    // Serialized form is already rank-sorted: appending preserves order.
    var j = 0
    while (j < n) { st.ords(j) = bb.getLong; st.ids(j) = bb.getLong; j += 1 }
    st.n = n
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_agg"
}
