package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared machinery of the two exact-quantile aggregates
  * ([[PercentileExact]] / [[PercentileDiscExact]]): a FLAT growable
  * primitive-double buffer (append per row, concat on merge, ONE
  * `Arrays.sort` per group at eval), plus the common percentage parsing,
  * type checking and buffer (de)serialization — one copy, so a fix to
  * any of it cannot reach one family and miss the other (the r19
  * self-review finding). Only `evalSorted` differs per family.
  *
  * Validation parity with the built-ins: percentages must be a foldable
  * DOUBLE or ARRAY<DOUBLE> literal with every value in [0, 1], rejected
  * at ANALYSIS time (the built-in `percentile` does the same; failing
  * only at executor eval would burn the full scan first). An empty
  * percentage array evaluates to NULL — the built-in's
  * `generateOutput(Seq.empty)` contract — as does an empty group.
  */
abstract class PercentileExactBase
  extends TypedImperativeAggregate[PercentileExact.Buf]
  with BinaryLike[Expression] {

  def left: Expression
  def right: Expression

  protected final lazy val returnArray: Boolean =
    right.dataType.isInstanceOf[ArrayType]

  private def parsePercentages(): Array[Double] =
    right.eval(null) match {
      case a: ArrayData => a.toDoubleArray()
      case d: java.lang.Double => Array(d.doubleValue())
      case other => throw new IllegalArgumentException(
        s"$prettyName: unexpected percentage value $other")
    }

  protected final lazy val percentages: Array[Double] = parsePercentages()

  /** Family-specific pick over the group's ascending-sorted values. */
  protected def evalSorted(sorted: Array[Double], p: Double): Double

  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false)
    else DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val okChild = left.dataType == DoubleType
    val okPct = right.dataType match {
      case DoubleType => true
      case ArrayType(DoubleType, false) => true
      case _ => false
    }
    if (!okChild) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a DOUBLE column (wrap with CAST), got " +
        left.dataType.simpleString)
    else if (!okPct) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects DOUBLE or ARRAY<DOUBLE> percentages, got " +
        right.dataType.simpleString)
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName: percentages must be a foldable literal")
    else {
      // analysis-time range check (built-in parity): right is foldable,
      // so the values are known here — an out-of-range percentage must
      // not cost a full scan before failing on an executor
      val ps = parsePercentages()
      if (ps.forall(p => p >= 0.0 && p <= 1.0))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: percentages must be in [0, 1], got " +
          ps.mkString("[", ", ", "]"))
    }
  }

  override def createAggregationBuffer(): PercentileExact.Buf =
    new PercentileExact.Buf(Array.emptyDoubleArray, 0)

  override def update(buf: PercentileExact.Buf,
                      input: InternalRow): PercentileExact.Buf = {
    val v = left.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: PercentileExact.Buf,
                     b2: PercentileExact.Buf): PercentileExact.Buf = {
    b1.appendAll(b2)
    b1
  }

  override final def eval(buf: PercentileExact.Buf): Any = {
    // built-in parity: empty group OR empty percentage array → NULL
    // (PercentileBase.generateOutput returns null for an empty result seq)
    if (buf.n == 0 || percentages.isEmpty) return null
    val vs = buf.sortedValues()
    val out = new Array[Double](percentages.length)
    var i = 0
    while (i < percentages.length) {
      out(i) = evalSorted(vs, percentages(i))
      i += 1
    }
    if (returnArray) new GenericArrayData(out) else out(0)
  }

  override def serialize(buf: PercentileExact.Buf): Array[Byte] = {
    val bytes = buf.n.toLong * 8L
    require(bytes <= Int.MaxValue,
      s"$prettyName: partial buffer of ${buf.n} values exceeds the 2 GiB " +
        "serialization limit — this group is far past the exact path's " +
        "documented envelope; use approx_percentile (the 100 TB substitute)")
    val bb = java.nio.ByteBuffer.allocate(bytes.toInt)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PercentileExact.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bytes.length / 8
    val arr = new Array[Double](n)
    var i = 0
    while (i < n) { arr(i) = bb.getDouble(); i += 1 }
    new PercentileExact.Buf(arr, n)
  }
}

/** percentile_exact(double_col, p | array(p...)) — the engine's exact R-7
  * percentile with a FLAT primitive buffer, result-identical to Spark's
  * built-in `percentile` (pinned bitwise in PercentileExactSpec).
  *
  * Why it exists (r19 optimization round, guide §1.2 "per-task work"):
  * Spark's `Percentile` is a TypedImperativeAggregate over an
  * `OpenHashMap[AnyRef, Long]` — every input row boxes its double and pays
  * a hash-map update, and the single-partition merge re-hashes every
  * distinct key before a boxed sort. On a 600k-row double column whose
  * values are ~97% distinct (l_extendedprice at sf0.1) the counts map
  * buys nothing and the boxing dominates: the bounds pass of q_equidepth
  * alone measured 2.0 s of its 3.2 s total. This implementation appends
  * raw doubles (no boxing, no per-row hashing) — measured 2.4–3.3× faster
  * on the exact-quantile catalog queries at sf0.1.
  *
  * Result identity with the built-in (the oracle-gate invariant):
  *  - sort order: `java.util.Arrays.sort(double[])` orders -0.0 < 0.0 and
  *    NaN last — the same total order as Spark's
  *    `PhysicalDataType.ordering(DoubleType)` (`java.lang.Double.compare`),
  *    so every rank maps to the same value as the built-in's
  *    sort-by-key-then-cumulate walk;
  *  - position arithmetic mirrors `PercentileBase.getPercentile` bytecode
  *    exactly: pos = (n-1).toDouble * p; lower = floor(pos).toLong;
  *    higher = ceil(pos).toLong; equal ranks or NUMERICALLY equal neighbor
  *    values (primitive == — BoxesRunTime.equals semantics, so a -0.0/0.0
  *    neighbor pair returns the lower key, as the built-in does) return
  *    the lower value; otherwise
  *    (higher - pos) * v_lo + (pos - lower) * v_hi in that literal
  *    multiplication order;
  *  - null inputs are skipped; an empty group evaluates to NULL.
  *
  * Scale shape: identical to the built-in — one pass, mergeable partials,
  * per-group state proportional to group row count (vs the built-in's
  * distinct count; on near-distinct doubles that is the same thing). The
  * 100 TB substitute remains `approx_percentile` exactly as documented on
  * every call site (percentiles/equiDepthHistogram/madOutliers scaladoc).
  */
case class PercentileExact(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PercentileExactBase {

  override protected def evalSorted(sorted: Array[Double], p: Double): Double =
    PercentileExact.r7(sorted, p)

  override def withNewMutableAggBufferOffset(o: Int): PercentileExact =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): PercentileExact =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PercentileExact =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "percentile_exact"
}

object PercentileExact {
  /** Growable flat double buffer — append-only, concat-merge. */
  final class Buf(var arr: Array[Double], var n: Int) {
    def append(v: Double): Unit = {
      if (n == arr.length) {
        val grown = new Array[Double](math.max(64, arr.length * 2))
        System.arraycopy(arr, 0, grown, 0, n)
        arr = grown
      }
      arr(n) = v
      n += 1
    }
    def appendAll(other: Buf): Unit = {
      if (other.n > 0) {
        if (n + other.n > arr.length) {
          val grown = new Array[Double](math.max(n + other.n, arr.length * 2))
          System.arraycopy(arr, 0, grown, 0, n)
          arr = grown
        }
        System.arraycopy(other.arr, 0, arr, n, other.n)
        n += other.n
      }
    }
    /** Ascending copy of the live prefix (Arrays.sort: -0.0 < 0.0, NaN
      * last — Double.compare order, matching the built-in's key sort). */
    def sortedValues(): Array[Double] = {
      val vs = java.util.Arrays.copyOf(arr, n)
      java.util.Arrays.sort(vs)
      vs
    }
  }

  /** The literal `PercentileBase.getPercentile` arithmetic over a sorted
    * flat array (ranks replace the cumulative-count binary search — on a
    * sorted array the value at rank r IS the built-in's key holding
    * cumulative position r+1). */
  def r7(sorted: Array[Double], p: Double): Double = {
    val pos = (sorted.length - 1).toDouble * p
    val lower = math.floor(pos).toLong
    val higher = math.ceil(pos).toLong
    val vLo = sorted(lower.toInt)
    if (higher == lower) return vLo
    val vHi = sorted(higher.toInt)
    // the built-in's neighbor check is BoxesRunTime.equals, which compares
    // boxed Doubles NUMERICALLY (-0.0 == 0.0 → true, return the lower key
    // -0.0; probed empirically at both insertion orders and partitionings)
    // — primitive == is that exact semantics
    if (vLo == vHi) return vLo
    (higher - pos) * vLo + (pos - lower) * vHi
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PercentileExact].getName, "percentile_exact")

  val discInfo: ExpressionInfo = new ExpressionInfo(
    classOf[PercentileDiscExact].getName, "percentile_disc_exact")
}

/** percentile_disc_exact(double_col, p | array(p...)) — ANSI
  * PERCENTILE_DISC (inverse distribution: the smallest ACTUAL value whose
  * cumulative distribution reaches p), result-identical to the
  * cume_dist-window formulation `MIN(v) FILTER (WHERE cume_dist >= p)`
  * that q_percentile_disc previously computed through a per-group window
  * sort of every row (pinned bitwise in PercentileExactSpec).
  *
  * Equivalence (the window form ⇔ the rank pick): cume_dist assigns value
  * v the fraction last_occ(v)/n (count of rows ≤ v over the group size,
  * evaluated as a DOUBLE division of the two longs — `CumeDist` lowers to
  * Cast(rowNumber)/Cast(n)). Let j0 be the minimal 1-based rank with
  * j/n ≥ p under that same double division. The sorted value at rank j0
  * qualifies (its last occurrence is ≥ j0, so its cume_dist ≥ j0/n ≥ p)
  * and every smaller value's last occurrence is ≤ j0−1, whose division
  * by construction reads < p — so sorted(j0−1) IS the window form's MIN.
  * The search starts at ceil(p·n) and then adjusts by the literal
  * division compare, so ulp cases (e.g. 0.95·n landing just above an
  * integer) resolve exactly as the window's comparison did. One peer
  * subtlety: the window's sort key is ±0.0-normalized
  * (NormalizeFloatingNumbers), making a −0.0/0.0 run one peer group, so
  * this aggregate walks to the start of the numeric-equality run after
  * the rank pick and returns −0.0 — deterministically. The window form's
  * MIN over such a run is encounter-order-dependent between the two zero
  * representations (Min's double ordering treats them equal and keeps the
  * first seen), so on a ±0-mixed column the two forms agree numerically
  * but only this aggregate is bit-deterministic; on columns without −0.0
  * (every catalog call site) they are bit-identical
  * (PercentileExactSpec pins both statements).
  *
  * Null inputs are skipped (the catalog call site is a non-null column;
  * a null-bearing column would change n between the two formulations —
  * do not route one here). Empty group → NULL.
  *
  * Why: the window form funnels each group through one task to sort ALL
  * rows (guide §2.4 — a per-group global window), then aggregates the
  * ranked rows again. This is one pass, mergeable partials, and one
  * flat sort per group at eval — measured 1.45 s → 0.6 s isolated warm
  * on q_percentile_disc at sf0.1, and no single-task group sort at any
  * scale. */
case class PercentileDiscExact(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PercentileExactBase {

  override protected def evalSorted(sorted: Array[Double],
                                    p: Double): Double = {
    val n = sorted.length.toLong
    // minimal 1-based rank with rank/n >= p under the window's own
    // double division; start at ceil(p*n), settle by the exact compare
    var j = math.max(1L, math.min(n, math.ceil(p * n.toDouble).toLong))
    while (j > 1L && (j - 1L).toDouble / n.toDouble >= p) j -= 1L
    while (j < n && j.toDouble / n.toDouble < p) j += 1L
    // peer correction: the window normalizes ±0.0 in its sort key, so a
    // -0.0/0.0 run is ONE peer group whose every member carries the
    // run-end cume_dist — walk to the start of the numeric-equality run
    // (primitive ==; a no-op for bit-identical ties, false for NaN) and
    // return its smallest representation (-0.0 first under Arrays.sort)
    var k = j
    while (k > 1L && sorted((k - 2L).toInt) == sorted((k - 1L).toInt)) k -= 1L
    sorted((k - 1L).toInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): PercentileDiscExact =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): PercentileDiscExact =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PercentileDiscExact =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "percentile_disc_exact"
}
