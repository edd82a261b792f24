package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k buffer: a binary heap of (id, sim) pairs whose
  * ROOT is the WORST kept element, so a full buffer admits a candidate in
  * O(log k) and rejects one in O(1) — the object each partial aggregate
  * carries is k entries, never the candidate stream.
  *
  * Ordering ("better") is (sim DESC, id ASC) with Spark SQL double
  * semantics — NaN is larger than every double and equal to itself,
  * -0.0 == 0.0 — so the kept set and its order are EXACTLY what
  * `row_number() OVER (ORDER BY sim DESC, id ASC)` kept (asserted in
  * SimilaritySpec), while the shuffle carries O(groups × k) rows instead
  * of every scored candidate. */
final class TopKHeap(val k: Int) {
  val ids = new Array[Long](k)
  val sims = new Array[Double](k)
  var size = 0

  /** Spark SQL double comparison: NaN largest, NaN == NaN, -0.0 == 0.0. */
  private def cmpSim(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else { // at least one NaN
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an && bn) 0 else if (an) 1 else -1
    }

  /** Is (s1, i1) strictly worse-ranked than (s2, i2)? */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = cmpSim(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    val ts = sims(a); sims(a) = sims(b); sims(b) = ts
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && worse(sims(i), ids(i), sims((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2)
      i = (i - 1) / 2
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // worst of node and children bubbles to the top
      if (l < size && worse(sims(l), ids(l), sims(w), ids(w))) w = l
      if (r < size && worse(sims(r), ids(r), sims(w), ids(w))) w = r
      if (w == i) done = true
      else { swap(i, w); i = w }
    }
  }

  def insert(id: Long, sim: Double): Unit =
    if (size < k) {
      ids(size) = id; sims(size) = sim; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(sims(0), ids(0), sim, id)) {
      ids(0) = id; sims(0) = sim
      siftDown(0)
    }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.ids(i), other.sims(i)); i += 1 }
  }

  /** Kept entries best-first: (sim DESC, id ASC). */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, size)
    // boxed sort is fine: this runs once per GROUP on k elements, not on
    // the candidate stream
    idx.sortWith { (i, j) =>
      val c = cmpSim(sims(i), sims(j))
      if (c != 0) c > 0 else ids(i) < ids(j)
    }
  }
}

/** `topk_neighbors(id, sim, k)` — exact per-group top-k as a PARTIAL
  * aggregate: each map task keeps a k-bounded [[TopKHeap]] per group and
  * the exchange moves O(groups × k × partitions) heap entries, not the
  * O(groups × N) scored-candidate stream that ranking through
  * `row_number() OVER (PARTITION BY ... ORDER BY ...)` shuffles and sorts
  * before discarding all but k. At 100 TB this is the difference between
  * shuffling |Q|×k rows and shuffling every (query, candidate) score —
  * the one similarity stage that was still unpartialized in round 4.
  *
  * Returns `array<struct<neighbor_id:long, sim:double>>` sorted best-first
  * ((sim DESC, id ASC) under Spark SQL double semantics); callers
  * `posexplode` it and use pos+1 as the rank column. Null id or sim
  * contributes nothing (a window's row_number would still rank a null-sim
  * row; similarity scores are never null in these pipelines — both
  * formulations see the same input rows). */
case class TopKNeighbors(
    idExpr: Expression,
    simExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  override def left: Expression = idExpr
  override def right: Expression = simExpr

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk_neighbors needs k > 0, got $k")
    else (idExpr.dataType, simExpr.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (i, s) => TypeCheckResult.TypeCheckFailure(
        s"topk_neighbors expects (bigint id, double sim), got " +
          s"(${i.simpleString}, ${s.simpleString})")
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "topk_neighbors"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val id = idExpr.eval(input)
    val sim = simExpr.eval(input)
    if (id != null && sim != null)
      buf.insert(id.asInstanceOf[Long], sim.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val idx = buf.sortedIndices
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(
        Array[Any](buf.ids(i), buf.sims(i))): Any
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.ids(i)).putDouble(buf.sims(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // raw arrays round-trip: the heap invariant is layout-preserved
    while (i < n) {
      heap.ids(i) = bb.getLong()
      heap.sims(i) = bb.getDouble()
      i += 1
    }
    heap.size = n
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKNeighbors =
    copy(idExpr = newLeft, simExpr = newRight)
}

object TopKAggregate {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point for [[TopKNeighbors]]. */
  def topkNeighbors(id: Column, sim: Column, k: Int): Column =
    GraftBridge.column(TopKNeighbors(
      GraftBridge.expression(id),
      GraftBridge.expression(sim), k).toAggregateExpression())
}
