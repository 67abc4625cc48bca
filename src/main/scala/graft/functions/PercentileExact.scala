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
    else if (right.eval(null) == null) TypeCheckResult.TypeCheckFailure(
      // a foldable NULL (CAST(NULL AS DOUBLE), a null array literal)
      // passes the type checks above; fail it HERE as a clean analysis
      // error instead of a raw IllegalArgumentException from
      // parsePercentages (ADVICE r19)
      s"$prettyName: percentages must not be null")
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

  /** Family-specific pick over the group's RLE form: `vals` ascending
    * (Double.compare order, runs of bit-identical values), `cum(i)` =
    * total count of values in runs 0..i. Must agree bitwise with
    * [[evalSorted]] over the expanded array (pinned in
    * PercentileExactSpec with a forced-small compaction threshold). */
  protected def evalRle(vals: Array[Double], cum: Array[Long],
                        p: Double): Double

  override final def eval(buf: PercentileExact.Buf): Any = {
    // built-in parity: empty group OR empty percentage array → NULL
    // (PercentileBase.generateOutput returns null for an empty result seq)
    if (buf.totalCount == 0L || percentages.isEmpty) return null
    val out = new Array[Double](percentages.length)
    if (buf.rleM == 0) {
      // plain path — bitwise-identical to the pre-compaction r19 code
      val vs = buf.sortedValues()
      var i = 0
      while (i < percentages.length) {
        out(i) = evalSorted(vs, percentages(i)); i += 1
      }
    } else {
      // compacted path: fold any tail into the RLE, then rank-pick
      buf.compact()
      val cum = buf.cumCounts()
      var i = 0
      while (i < percentages.length) {
        out(i) = evalRle(buf.rleV, cum, percentages(i)); i += 1
      }
    }
    if (returnArray) new GenericArrayData(out) else out(0)
  }

  override def serialize(buf: PercentileExact.Buf): Array[Byte] = {
    val bytes = 8L + buf.rleM.toLong * 16L + buf.n.toLong * 8L
    require(bytes <= Int.MaxValue,
      s"$prettyName: partial buffer of ${buf.n} values plus ${buf.rleM} " +
        "compacted runs exceeds the 2 GiB serialization limit — this " +
        "group is far past the exact path's documented envelope; use " +
        "approx_percentile (the 100 TB substitute)")
    val bb = java.nio.ByteBuffer.allocate(bytes.toInt)
    bb.putInt(buf.rleM)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.rleM) { bb.putDouble(buf.rleV(i)); i += 1 }
    i = 0
    while (i < buf.rleM) { bb.putLong(buf.rleC(i)); i += 1 }
    i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PercentileExact.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = bb.getInt()
    val n = bb.getInt()
    val rleV = if (m == 0) null else new Array[Double](m)
    val rleC = if (m == 0) null else new Array[Long](m)
    var i = 0
    while (i < m) { rleV(i) = bb.getDouble(); i += 1 }
    i = 0
    while (i < m) { rleC(i) = bb.getLong(); i += 1 }
    val arr = new Array[Double](n)
    i = 0
    while (i < n) { arr(i) = bb.getDouble(); i += 1 }
    val b = new PercentileExact.Buf(arr, n)
    b.rleV = rleV; b.rleC = rleC; b.rleM = m
    b
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
  *    values (primitive ==) return the lower value; otherwise
  *    (higher - pos) * v_lo + (pos - lower) * v_hi in that literal
  *    multiplication order. ±0.0 scope (ADVICE r19): the built-in's
  *    OpenHashMap merges -0.0/0.0 into its FIRST-SEEN key (numeric
  *    equality, bit-preserving key), so ITS bit-pattern on ±0-mixed data
  *    is encounter-order/partitioning dependent; this aggregate sorts
  *    -0.0 < 0.0 and deterministically returns -0.0 from a mixed-zero
  *    tie. Bitwise identity with the built-in therefore holds on columns
  *    without -0.0 (every catalog call site); on ±0-mixed columns the
  *    two agree numerically and only this aggregate is bit-deterministic
  *    (the percentile_disc_exact scoping, applied to both families);
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

  override protected def evalRle(vals: Array[Double], cum: Array[Long],
                                 p: Double): Double =
    PercentileExact.r7Rle(vals, cum, p)

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

  /** Tail size that triggers counts-compaction (values). 4M doubles =
    * 32 MB per buffer — far beyond any catalog group at bench SFs (so
    * every oracle-gated run takes the bitwise-pinned plain path), small
    * enough that a 100 TB low-cardinality group folds into a bounded
    * (value, count) form every 32 MB instead of hard-failing the 2 GiB
    * serialize guard (ADVICE r19: l_discount-style columns where the
    * built-in's counts map was O(distinct) and the r19 flat buffer was
    * O(rows)). A var, not a val: PercentileExactSpec forces a tiny
    * threshold to drive the compacted path through the full edge battery
    * and pin bitwise identity with the plain path. */
  private[graft] var CompactThreshold: Int = 1 << 22

  /** When a compaction pass shrinks the data by less than this factor,
    * the column is effectively distinct — compaction stops for that
    * buffer (the flag merges OR-wise) and the buffer degrades to the
    * documented O(rows) envelope instead of paying a useless sort every
    * [[CompactThreshold]] appends. */
  private val CompressFloor = 0.5

  /** Growable flat double buffer with an adaptive counts-compaction
    * fallback: appends land in the flat tail (`arr`, `n`); when the tail
    * reaches [[CompactThreshold]] it folds into the RLE segment
    * (`rleV`/`rleC`, ascending Double.compare order, one run per
    * BIT-identical value — raw-bit run identity keeps −0.0/0.0 and NaN
    * payloads exactly as distinct as Arrays.sort keeps them, so RLE
    * expansion reproduces the flat sorted array verbatim). Low-cardinality
    * groups therefore hold O(distinct) state like the built-in's counts
    * map; near-distinct groups set `noCompact` after one unproductive
    * pass and keep the r19 flat behavior. */
  final class Buf(var arr: Array[Double], var n: Int) {
    var rleV: Array[Double] = null
    var rleC: Array[Long] = null
    var rleM: Int = 0
    var noCompact: Boolean = false

    def totalCount: Long = {
      var s = n.toLong
      var i = 0
      while (i < rleM) { s += rleC(i); i += 1 }
      s
    }

    def append(v: Double): Unit = {
      if (n == arr.length) {
        if (!noCompact && n >= CompactThreshold) compact()
        if (n == arr.length) {
          require(arr.length <= Int.MaxValue / 2,
            "percentile_exact: buffer beyond 2^30 values — far past the " +
              "exact path's documented envelope; use approx_percentile " +
              "(the 100 TB substitute)")
          val grown = new Array[Double](math.max(64, arr.length * 2))
          System.arraycopy(arr, 0, grown, 0, n)
          arr = grown
        }
      }
      arr(n) = v
      n += 1
    }

    def appendAll(other: Buf): Unit = {
      if (other.rleM > 0) mergeRle(other.rleV, other.rleC, other.rleM)
      noCompact ||= other.noCompact
      if (other.n > 0) {
        require(other.n <= Int.MaxValue - n,
          "percentile_exact: merged buffer beyond 2^31 values — far past " +
            "the exact path's documented envelope; use approx_percentile " +
            "(the 100 TB substitute)")
        if (n + other.n > arr.length) {
          val grown = new Array[Double](math.max(n + other.n, arr.length * 2))
          System.arraycopy(arr, 0, grown, 0, n)
          arr = grown
        }
        System.arraycopy(other.arr, 0, arr, n, other.n)
        n += other.n
      }
      if (!noCompact && rleM > 0 && n >= CompactThreshold) compact()
    }

    /** Fold the flat tail into the RLE segment: sort the tail, then one
      * linear merge with the existing runs. Run identity is RAW-BIT
      * equality; order is Double.compare (== Arrays.sort order). */
    def compact(): Unit = {
      if (n == 0) return
      val tail = java.util.Arrays.copyOf(arr, n)
      java.util.Arrays.sort(tail)
      // RLE the sorted tail
      var runs = 1
      var i = 1
      while (i < n) {
        if (java.lang.Double.doubleToRawLongBits(tail(i)) !=
            java.lang.Double.doubleToRawLongBits(tail(i - 1))) runs += 1
        i += 1
      }
      val tv = new Array[Double](runs)
      val tc = new Array[Long](runs)
      var r = -1
      i = 0
      while (i < n) {
        if (i == 0 || java.lang.Double.doubleToRawLongBits(tail(i)) !=
            java.lang.Double.doubleToRawLongBits(tail(i - 1))) {
          r += 1; tv(r) = tail(i); tc(r) = 1L
        } else tc(r) += 1L
        i += 1
      }
      val before = n
      mergeRle(tv, tc, runs)
      arr = Array.emptyDoubleArray
      n = 0
      // adaptive: an unproductive pass (near-distinct data) turns
      // compaction off for this buffer — the r19 flat behavior, with the
      // RLE segment kept (it is correct, just not smaller)
      if (runs > before * CompressFloor) noCompact = true
    }

    /** Merge a sorted RLE segment into this buffer's RLE segment. */
    private def mergeRle(ov: Array[Double], oc: Array[Long],
                         om: Int): Unit = {
      if (rleM == 0) {
        rleV = java.util.Arrays.copyOf(ov, om)
        rleC = java.util.Arrays.copyOf(oc, om)
        rleM = om
        return
      }
      val mv = new Array[Double](rleM + om)
      val mc = new Array[Long](rleM + om)
      var i = 0; var j = 0; var k = -1
      while (i < rleM || j < om) {
        val takeLeft = j >= om || (i < rleM &&
          java.lang.Double.compare(rleV(i), ov(j)) <= 0)
        val v = if (takeLeft) rleV(i) else ov(j)
        val c = if (takeLeft) rleC(i) else oc(j)
        if (k >= 0 && java.lang.Double.doubleToRawLongBits(mv(k)) ==
            java.lang.Double.doubleToRawLongBits(v)) mc(k) += c
        else { k += 1; mv(k) = v; mc(k) = c }
        if (takeLeft) i += 1 else j += 1
      }
      rleV = mv; rleC = mc; rleM = k + 1
    }

    /** cum(i) = total count through run i (requires a compacted buffer:
      * call [[compact]] first so the tail is folded in). */
    def cumCounts(): Array[Long] = {
      val cum = new Array[Long](rleM)
      var s = 0L
      var i = 0
      while (i < rleM) { s += rleC(i); cum(i) = s; i += 1 }
      cum
    }

    /** Ascending copy of the live values (Arrays.sort: -0.0 < 0.0, NaN
      * last — Double.compare order, matching the built-in's key sort).
      * Plain-path only (rleM == 0); the compacted path never expands. */
    def sortedValues(): Array[Double] = {
      val vs = java.util.Arrays.copyOf(arr, n)
      java.util.Arrays.sort(vs)
      vs
    }
  }

  /** Value at 0-based rank r of the RLE form: the run whose cumulative
    * count first exceeds r (binary search over cum). */
  private def rleAtRank(vals: Array[Double], cum: Array[Long],
                        r: Long): Double = {
    var lo = 0
    var hi = cum.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cum(mid) > r) hi = mid else lo = mid + 1
    }
    vals(lo)
  }

  /** [[r7]] over the RLE form — same arithmetic, ranks resolved through
    * the cumulative counts instead of array indices. Bitwise-identical
    * to r7 over the expanded array: RLE expansion IS the sorted array
    * (raw-bit runs in Double.compare order), and the neighbor-equality
    * check compares the same two rank values. */
  def r7Rle(vals: Array[Double], cum: Array[Long], p: Double): Double = {
    val total = cum(cum.length - 1)
    val pos = (total - 1L).toDouble * p
    val lower = math.floor(pos).toLong
    val higher = math.ceil(pos).toLong
    val vLo = rleAtRank(vals, cum, lower)
    if (higher == lower) return vLo
    val vHi = rleAtRank(vals, cum, higher)
    if (vLo == vHi) return vLo
    (higher - pos) * vLo + (pos - lower) * vHi
  }

  /** ANSI disc pick over the RLE form — mirrors
    * [[PercentileDiscExact.evalSorted]]'s rank walk and ±0.0 peer
    * normalization, with ranks resolved through cumulative counts. */
  def discRle(vals: Array[Double], cum: Array[Long], p: Double): Double = {
    val n = cum(cum.length - 1)
    var j = math.max(1L, math.min(n, math.ceil(p * n.toDouble).toLong))
    while (j > 1L && (j - 1L).toDouble / n.toDouble >= p) j -= 1L
    while (j < n && j.toDouble / n.toDouble < p) j += 1L
    // run containing rank j (1-based): first run with cum >= j
    var lo = 0
    var hi = cum.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cum(mid) >= j) hi = mid else lo = mid + 1
    }
    // ±0.0 peer normalization: walk to the start of the numeric-equality
    // run (adjacent RLE runs compare == only for -0.0/0.0)
    var k = lo
    while (k > 0 && vals(k - 1) == vals(k)) k -= 1
    vals(k)
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

  override protected def evalRle(vals: Array[Double], cum: Array[Long],
                                 p: Double): Double =
    PercentileExact.discRle(vals, cum, p)

  override def withNewMutableAggBufferOffset(o: Int): PercentileDiscExact =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): PercentileDiscExact =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PercentileDiscExact =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "percentile_disc_exact"
}
