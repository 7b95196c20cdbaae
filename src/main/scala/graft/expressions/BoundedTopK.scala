package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded per-group top-k state for [[BoundedTopK]]: a fixed-capacity
  * binary min-heap over (score, id) pairs under the TOTAL order
  * "score desc, id asc" — the root is always the WORST retained pair,
  * so an offer against a full heap is one comparison in the common
  * case (almost every pair in a scored scan loses to the current
  * k-th). Top-k under a total order is arrival-order-independent, so
  * partial/merge aggregation is deterministic by construction.
  */
final class TopKHeap(val k: Int) {
  var size: Int = 0
  val scores: Array[Long] = new Array[Long](k)
  val ids: Array[Long] = new Array[Long](k)

  /** (s1,i1) strictly worse than (s2,i2) under "score desc, id asc". */
  @inline private def worse(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def offer(s: Long, id: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = id
      var i = size
      size += 1
      var cont = true
      while (cont && i > 0) { // sift up: parent must be worse than child
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else cont = false
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var cont = true
      while (cont) { // sift down: move the replacement below better pairs
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w != i) { swap(i, w); i = w } else cont = false
      }
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Indices of the retained pairs in final rank order (score desc,
    * id asc) — heap layout is partial, so a full sort of ≤ k entries
    * finishes the job.
    */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, size)
    idx.sortWith((a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b)))
  }
}

/** Bounded top-k aggregate: `bounded_top_k(score, id, k)` keeps the k
  * best (score, id) pairs per group under "score desc, id asc" and
  * returns them as a rank-ordered `array<struct<s: bigint, i: bigint>>`.
  *
  * This is the scale-correct form of the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`
  * cut on a massive scored relation: the window form shuffles and
  * sorts EVERY scored row (at the sf10 sweep point the exhaustive ADC
  * scan's rerank cut was an 800 M-row exchange — the slowest stage in
  * the catalog), while the aggregate cuts map-side (partial
  * aggregation holds one k-bounded heap per group per task) so the
  * exchange carries at most groups × tasks × k pairs, and nothing is
  * globally sorted. Identical output to the window form: top-k under
  * a total order is a deterministic SET, and the emitted array is
  * rank-ordered with the same (score desc, id asc) tie-break.
  *
  * A null score ranks below every non-null score (the window form's
  * `DESC` = NULLS LAST), mapped to Long.MinValue; null ids are
  * skipped. Scores here are rank keys (`floor(cosine·1e6)`, integer
  * ADC sums ≪ 2^60), so the sentinel collides with nothing real.
  */
case class BoundedTopK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k >= 1, s"bounded_top_k needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (bigint score, bigint id) inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("i", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val idv = right.eval(input)
    if (idv != null) {
      val sv = left.eval(input)
      val s = if (sv == null) Long.MinValue else sv.asInstanceOf[Long]
      buffer.offer(s, idv.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val idx = buffer.sortedIndices
    new GenericArrayData(idx.map(i =>
      InternalRow(buffer.scores(i), buffer.ids(i)): Any))
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKHeap(k)
    // serialized pairs are already heap-shaped; restore verbatim
    var i = 0
    while (i < n) { h.scores(i) = bb.getLong(); h.ids(i) = bb.getLong(); i += 1 }
    h.size = n
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}
