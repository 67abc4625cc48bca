package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** mg_topk(term, k) → the Misra–Gries frequent-items summary of the
  * group: at most k candidate strings, guaranteed to include EVERY value
  * whose true frequency exceeds n/(k+1).
  *
  * This is the mergeable heavy-hitters sketch (Agarwal et al., "Mergeable
  * Summaries", PODS'12): `update` is the classic k-counter stream step
  * (hit → increment; room → insert; full → decrement all), and `merge`
  * is pointwise sum followed by subtracting the (k+1)-th largest count —
  * the merged summary keeps the n/(k+1) guarantee under ANY merge tree,
  * so Spark can run it partial → shuffle-of-≤k-entries → final exactly
  * like a built-in aggregate. The candidate SET may vary with partition
  * layout (decrements depend on merge order); the guarantee does not —
  * which is why [[graft.operators.TextAnalysis.heavyHitters]] treats the
  * sketch as a pruning pass and recounts candidates exactly.
  *
  * Empty group → empty array (no candidates, vacuously correct). NULL
  * inputs are skipped, matching COUNT/HAVING semantics in the oracle.
  */
case class MisraGriesAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = kExpr

  private lazy val k: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"mg_topk: k must be positive, got $v")
    v
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (StringType, IntegerType) if kExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "mg_topk expects (string, foldable int k), got " +
          s"(${child.dataType.simpleString}, ${kExpr.dataType.simpleString})")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v == null) return buffer
    buffer.get(v) match {
      case Some(c) => buffer(v) = c + 1
      // copy: scan rows hand out UTF8Strings backed by reused buffers
      case None if buffer.size < k => buffer(v.copy()) = 1L
      case None =>
        buffer.mapValuesInPlace((_, c) => c - 1)
        buffer.filterInPlace((_, c) => c > 0)
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (t, c) => b1(t) = b1.getOrElse(t, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count; at most k survive
      val cut = b1.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.filterInPlace((_, c) => c > 0)
    }
    b1
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic emission order for a GIVEN summary: count desc, term asc
    val arr = buffer.toArray
      .sortWith { case ((t1, c1), (t2, c2)) =>
        c1 > c2 || (c1 == c2 && t1.compareTo(t2) < 0)
      }
      .map(_._1)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(
      buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buffer.toArray
    val size = 4 + entries.map { case (t, _) => 4 + t.numBytes() + 8 }.sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (t, c) =>
      val bytes = t.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = mutable.HashMap.empty[UTF8String, Long]
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m(UTF8String.fromBytes(b)) = bb.getLong
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(child = newLeft, kExpr = newRight)

  override def prettyName: String = "mg_topk"
}

object MisraGriesAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MisraGriesAgg].getName, "mg_topk")
}
