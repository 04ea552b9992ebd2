package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: parallel-array binary min-heap of (ord, id)
  * with the WORST entry at the root for O(log k) eviction. "Better"
  * means higher ord, ties broken by smaller id — the exact order of
  * `ORDER BY ord DESC, id` — so results are deterministic.
  */
final class TopKBuffer(val k: Int) {
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // a is WORSE than b (belongs nearer the root)
  private def worse(oa: Double, ia: Long, ob: Double, ib: Long): Boolean =
    oa < ob || (oa == ob && ia > ib)

  def offer(ord: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      ords(i) = ord; ids(i) = id; size += 1
      while (i > 0 && worse(ords(i), ids(i), ords((i - 1) / 2),
        ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(ords(0), ids(0), ord, id)) {
      ords(0) = ord; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < size && worse(ords(l), ids(l), ords(w), ids(w))) w = l
        if (r < size && worse(ords(r), ids(r), ords(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val o = ords(a); ords(a) = ords(b); ords(b) = o
    val d = ids(a); ids(a) = ids(b); ids(b) = d
  }

  /** Entries best-first. */
  def sorted: Array[(Double, Long)] =
    ords.take(size).zip(ids.take(size))
      .sortBy { case (o, i) => (-o, i) }
}

/** topk_by(ord, id, k) — exact per-group top-k as ONE aggregation.
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(ord
  * desc)) <= k`) shuffles EVERY row of every group to sort it; this
  * TypedImperativeAggregate keeps a bounded k-entry heap per group
  * and combines map-side, so at most k entries per group per
  * partition reach the shuffle — the difference between moving 100 TB
  * and moving k·groups rows. Output: array of struct(ord, id),
  * best-first; posexplode for ranks.
  */
case class TopKBy(left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with BinaryLike[Expression] with ImplicitCastInputTypes {
  require(k > 0 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = left.eval(input)
    val i = right.eval(input)
    if (o != null && i != null)
      buf.offer(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.offer(b.ords(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (o, i) =>
      val row = new GenericInternalRow(2)
      row.setDouble(0, o); row.setLong(1, i)
      row: Any
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.ords(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBy =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "topk_by"
}

/** bottom_k_distinct(h, k) — the k SMALLEST DISTINCT longs per group:
  * the KMV / bottom-k sketch of a hashed set (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD 2007). A bounded java.util.TreeSet per group
  * (add, trim the max past k) combines map-side like [[TopKBy]], so
  * at most k hashes per group per partition reach the shuffle —
  * per-source sketches over a 100 TB corpus shuffle k·sources longs.
  * Distinctness is intrinsic (a set), so the sketch is insensitive to
  * how often a value repeats — exactly the "distinct documents"
  * semantics overlap estimation needs. Output: ascending long array;
  * EXACTLY the distinct set when the group has ≤ k distinct values.
  */
case class BottomKDistinct(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression]
    with ImplicitCastInputTypes {
  require(k > 0 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long],
      v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(buf, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): BottomKDistinct = copy(child = newChild)
  override def prettyName: String = "bottom_k_distinct"
}

object AggFunctions {
  /** Exact top-k (ord desc, id asc) per group, map-side combined. */
  def topk_by(ord: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKBy(ColumnBridge.expression(ord),
      ColumnBridge.expression(id), k).toAggregateExpression())

  /** The k smallest distinct longs per group (KMV sketch), map-side
    * combined; exactly the distinct set when it has ≤ k values.
    */
  def bottom_k_distinct(h: Column, k: Int): Column =
    ColumnBridge.column(BottomKDistinct(ColumnBridge.expression(h), k)
      .toAggregateExpression())
}
