package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Bounded min-heap buffer for [[TopKAgg]]: retains the k strongest
  * (ord, key) pairs seen so far, where "stronger" means larger `ord`,
  * ties broken toward the SMALLER `key` (so results are deterministic on
  * tied ordinates regardless of partitioning). The heap root is the
  * weakest retained element — the eviction candidate — giving O(log k)
  * insert and O(1) reject of non-qualifying rows, O(k) memory per group
  * no matter how many rows flow through.
  */
final class TopKHeap(val k: Int) {
  val ords = new Array[Double](k)
  val keys = new Array[Long](k)
  var n = 0

  /** (o1,k1) weaker than (o2,k2): lower ord, or same ord with larger key.
    * Ordinates compare via java.lang.Double.compare — the TOTAL order
    * Spark uses for doubles (NaN greatest, -0.0 < 0.0). Primitive `<`/`==`
    * return false on any NaN comparison, which would both wedge the heap
    * (a NaN root permanently rejecting stronger inserts) and hand
    * sortedIdx a non-transitive comparator (TimSort contract violation).
    */
  @inline private def weaker(o1: Double, k1: Long, o2: Double, k2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c < 0 || (c == 0 && k1 > k2)
  }

  def insert(o: Double, key: Long): Unit = {
    if (n < k) {
      ords(n) = o; keys(n) = key
      n += 1
      var i = n - 1 // sift up
      while (i > 0 && weaker(ords(i), keys(i), ords((i - 1) / 2), keys((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (weaker(ords(0), keys(0), o, key)) {
      ords(0) = o; keys(0) = key
      siftDown(0)
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val to = ords(i); ords(i) = ords(j); ords(j) = to
    val tk = keys(i); keys(i) = keys(j); keys(j) = tk
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var w = i
      if (l < n && weaker(ords(l), keys(l), ords(w), keys(w))) w = l
      if (r < n && weaker(ords(r), keys(r), ords(w), keys(w))) w = r
      if (w == i) done = true
      else { swap(i, w); i = w }
    }
  }

  /** Indices of retained elements sorted strongest-first (ord desc, key
    * asc) — strongest-first is exactly "b weaker than a", so the same
    * total-order comparator serves both the heap and the output sort. */
  def sortedIdx: Array[Int] = {
    val idx = Array.range(0, n)
    idx.sortWith { (a, b) => weaker(ords(b), keys(b), ords(a), keys(a)) }
  }
}

/** `graft_topk(ord DOUBLE, key BIGINT, k)` — native bounded-heap top-k
  * aggregate: returns `array<struct<ord:double, key:bigint>>` of the k
  * largest ordinates per group, strongest first, ties broken toward the
  * smaller key.
  *
  * This is the scale-correct form of "top-k per group". The ubiquitous
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` shuffles and
  * sorts EVERY row of every group; this aggregate is a hash aggregation
  * whose partial (map-side) step already reduces each partition's
  * contribution to at most k rows per group — the shuffle then carries
  * `k * partitions * groups` heap entries instead of the whole table, and
  * nothing is ever fully sorted. At 100 TB with a handful of groups the
  * window plan is a cluster-melting skewed sort; this plan is a normal
  * partial-aggregate. Rows with a NULL ordinate or key are ignored, like
  * every builtin aggregate.
  *
  * The merge is associative and commutative (inserting one heap's
  * elements into the other), so results are partitioning-independent —
  * the deterministic tiebreak is what makes that literally true on tied
  * ordinates, which is also what makes the aggregate oracle-checkable
  * against a window-function mirror (q253).
  */
case class TopKAgg(
    ord: Expression,
    key: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"bad k: $other")
  }

  override def children: Seq[Expression] = Seq(ord, key, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("key", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (ord.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk ord must be DOUBLE, got ${ord.dataType.simpleString}")
    else if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk key must be BIGINT, got ${key.dataType.simpleString}")
    else if (!kExpr.foldable || (kExpr.dataType != IntegerType && kExpr.dataType != LongType))
      TypeCheckResult.TypeCheckFailure("graft_topk k must be a foldable integer")
    else if (kExpr.eval(null) == null)
      TypeCheckResult.TypeCheckFailure("graft_topk k must not be null")
    else {
      val kv = kExpr.eval(null) match { case i: Int => i.toLong; case l: Long => l }
      if (kv < 1 || kv > 1000000)
        TypeCheckResult.TypeCheckFailure(s"graft_topk k must be in [1, 1e6], got $kv")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val o = ord.eval(input)
    val ky = key.eval(input)
    if (o != null && ky != null)
      buf.insert(o.asInstanceOf[Double], ky.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = {
    var i = 0
    while (i < b.n) { a.insert(b.ords(i), b.keys(i)); i += 1 }
    a
  }

  override def eval(buf: TopKHeap): Any = {
    val idx = buf.sortedIdx
    new GenericArrayData(idx.map(i =>
      InternalRow(buf.ords(i), buf.keys(i)): Any))
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.ords(i)); bb.putLong(buf.keys(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(ord = newChildren(0), key = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "graft_topk"
}
