package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** minhash_agg(minhash_array) → the element-wise minimum of the group's
  * MinHash signatures — i.e. the MinHash signature of the UNION of the
  * group's shingle sets (min commutes with set union; the defining
  * property that makes MinHash a mergeable sketch).
  *
  * This is the mergeable-aggregation path for group-level similarity at
  * corpus scale (per-source / per-domain / per-shard signatures): a
  * TypedImperativeAggregate with a flat Array[Long] buffer, so Spark runs
  * it partial → shuffle-of-20-longs → final, exactly like a built-in agg —
  * versus the declarative explode(signature) + groupBy(slot) form, which
  * multiplies the shuffle by NumHashes and re-groups. SURVEY §7.5 named
  * this UDAF the north-star extension; semantics are pinned by the
  * explode-replay oracle in q_source_sim and by the equivalence test in
  * LlmOpsSpec.
  *
  * Empty group (or all-NULL input) → NULL. Signatures of mixed lengths in
  * one group throw — that is data corruption, not a mergeable state.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  // containsNull = false only: ArrayData.toLongArray reads a NULL element
  // as 0, and 0 would then win every slot min — silent sketch corruption.
  // minhash_sigs emits non-null elements; ad-hoc SQL with a nullable array
  // is rejected at analysis, honoring the "corruption throws" contract.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        "minhash_agg expects array<bigint> with non-null elements, got " +
          t.simpleString)
    }

  // empty array = "no input yet" sentinel (a real signature is never
  // zero-length: minhash_sigs requires numHashes > 0)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def minInto(acc: Array[Long], next: Array[Long]): Array[Long] =
    if (next.isEmpty) acc
    else if (acc.isEmpty) next.clone()
    else {
      require(acc.length == next.length,
        s"minhash_agg: signature length mismatch (${acc.length} vs " +
          s"${next.length}) — merging sketches of different hash families " +
          "would be silent corruption")
      var i = 0
      while (i < acc.length) {
        if (next(i) < acc(i)) acc(i) = next(i)
        i += 1
      }
      acc
    }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else minInto(buffer, v.asInstanceOf[ArrayData].toLongArray())
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    minInto(b1, b2)

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)

  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashAgg].getName, "minhash_agg")
}
