package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregate MinHash-union: the elementwise minimum of the group's
  * signature arrays — by the MinHash property, the union's signature
  * equals the elementwise min of member signatures, so a group's
  * signature estimates the distinct-shingle profile of the whole group
  * (clusters, sources, partitions) without touching the raw text again.
  *
  * A `TypedImperativeAggregate[Array[Long]]`: the buffer is a primitive
  * long array mutated in place; partial aggregation runs map-side, the
  * shuffle carries k longs per group, and merge is the same elementwise
  * min — associative and commutative, so the result is
  * partitioning-independent.
  */
case class MinHashUnion(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType]
        && child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs an array<bigint> input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_union"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        // skip null slots — getLong on one returns 0, which would win
        // every min and corrupt the signature
        if (!arr.isNullAt(i)) {
          val x = arr.getLong(i)
          if (x < buffer(i)) buffer(i) = x
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnion =
    copy(child = newChild)
}
