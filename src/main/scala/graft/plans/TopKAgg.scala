package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `graft_topk(score, id, k)` keeps the k
  * best `(score desc, id asc)` entries per group and emits them best-first
  * as `array<struct<id bigint, score double>>`.
  *
  * Replaces the `row_number() OVER (PARTITION BY key ORDER BY score DESC)
  * <= k` idiom. Spark 4's own InferWindowGroupLimit already bounds that
  * form's shuffle (partial WindowGroupLimit before the exchange), but the
  * window plan still pays a FULL local sort of every scored row on the map
  * side (O(n log n)), a second sort + Window pass after the shuffle, and
  * ships k rows per key per partition. The heap aggregate is a sort-free
  * single pass (O(n log k), no spillable sort buffer), ships ONE k-entry
  * buffer per key per partition, and needs no Window node at all — the
  * classic distributed top-k (Spark's `TakeOrderedAndProject`, generalized
  * per key).
  *
  * Determinism: total order on (score desc, id asc) — ties broken by id —
  * so results are reproducible and value-identical to the window form
  * (DedupSimilaritySpec proves equivalence on random data).
  *
  * Buffer: a size-bounded binary min-heap keyed by the SAME total order
  * (root = current worst), so insert beyond k is O(log k) and merge is
  * O(k log k). Null scores/ids are skipped (a null similarity is a
  * non-candidate, matching the window form where NULLS LAST puts them
  * beyond any real rank k).
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  private lazy val k: Int = kExpr.eval(null) match {
    case n: Int => n
    case n: Long => n.toInt
    case n: Short => n.toInt
    case other => throw new IllegalArgumentException(
      s"graft_topk k must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) =>
        if (!kExpr.foldable)
          TypeCheckResult.TypeCheckFailure("graft_topk k must be a literal")
        else if (k <= 0)
          TypeCheckResult.TypeCheckFailure(s"graft_topk k must be positive, got $k")
        else TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (double, bigint, int), got (${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buffer: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKAgg.Heap): Any = {
    val sorted = buffer.sortedBestFirst()
    new GenericArrayData(sorted.map { case (score, id) =>
      InternalRow(id, score)
    })
  }

  override def serialize(buffer: TopKAgg.Heap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap =
    TopKAgg.Heap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKAgg {

  /** Size-bounded binary min-heap over (score asc, id desc): the root is
    * the WORST kept entry under the output order (score desc, id asc), so
    * a new entry replaces the root iff it beats it. Flat primitive arrays
    * — no boxing on the hot path. */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    /** true when (s1, i1) orders WORSE than (s2, i2): lower score, or same
      * score and higher id. */
    @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def offer(score: Double, id: Long): Unit = {
      if (n < k) {
        scores(n) = score; ids(n) = id
        n += 1
        siftUp(n - 1)
      } else if (worse(scores(0), ids(0), score, id)) {
        scores(0) = score; ids(0) = id
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var worst = i
        if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == i) done = true
        else { swap(i, worst); i = worst }
      }
    }

    @inline private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(scores(i), ids(i)); i += 1 }
    }

    /** Entries best-first: score desc, id asc on ties. */
    def sortedBestFirst(): Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + n * 16)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(k: Int, bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val m = bb.getInt
      val h = new Heap(k)
      var i = 0
      while (i < m) { h.offer(bb.getDouble, bb.getLong); i += 1 }
      h
    }
  }
}
