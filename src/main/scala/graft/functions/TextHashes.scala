package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hash kernels for the dedup hot paths (SURVEY §7.1(7)).
  *
  * Both operators were first written as compositions of built-in
  * higher-order functions (`aggregate`/`zip_with`/`transform`), which are
  * CORRECT but interpreted — one closure dispatch per element, per hash,
  * per token. At corpus scale that inner loop dominates the whole dedup
  * stage. These expressions keep the exact same arithmetic (pinned by
  * equivalence tests against the HOF forms, and by the DuckDB oracles that
  * replay the math in SQL) but run it as a tight primitive loop inside
  * whole-stage codegen — the brief's preference order: built-ins → custom
  * `Expression` with doGenCode → UDF last.
  */
object PolyHash {

  /** 64-bit SimHash of a whitespace-normalized string. Exact semantics of
    * the HOF form in operators/Dedup.scala `simhash` (and the DuckDB SQL
    * replay in SparkEntry.oracleSql "q_simhash_neardup"): tokens split on
    * single spaces (empty tokens kept — Spark `split` keeps trailing
    * empties), per-token polynomial char rolls h1 (base 131 mod 2147483647,
    * bits 0–31) and h2 (base 137 mod 2147483629, bits 32–63), ±1 bit votes,
    * bit set where the vote is ≥ 0. */
  def simhash64(s: UTF8String): Long = {
    val str = s.toString
    val votes = new Array[Int](64)
    val len = str.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        // token = str[start, i); roll over CODE POINTS (the HOF spec's
        // split(t,'') + ascii() and the DuckDB oracle's unicode(t[i]) both
        // see one value per code point, not per UTF-16 unit)
        var h1 = 0L
        var h2 = 0L
        var j = start
        while (j < i) {
          val c = str.codePointAt(j)
          h1 = (h1 * 131 + c) % 2147483647L
          h2 = (h2 * 137 + c) % 2147483629L
          j += Character.charCount(c)
        }
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h1 >> b) & 1L) == 1L) 1 else -1)
          votes(b + 32) += (if (((h2 >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Distinct word 3-grams of a whitespace-normalized string, first
    * occurrence order. Exact semantics of the HOF form in
    * operators/Dedup.scala `signatures` (equivalence-tested): tokens split
    * on single spaces (empties kept), < 3 tokens → one shingle = the whole
    * string, else token-triples joined by single spaces — which, on a
    * single-spaced string, are exactly substrings from token i's start to
    * token i+2's end, so no per-shingle string building happens at all. */
  def shingles3(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    // token start offsets (a token starts at 0 and after every space)
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') starts.add(i + 1)
      i += 1
    }
    val n = starts.size()
    val out = new java.util.LinkedHashSet[String]()
    if (n < 3) {
      out.add(str)
    } else {
      var t = 0
      while (t + 2 < n) {
        // end of token t+2 = (start of token t+3) - 1, or end of string
        val end = if (t + 3 < n) starts.get(t + 3) - 1 else len
        out.add(str.substring(starts.get(t), end))
        t += 1
      }
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** Identity-memoized conversion of the foldable profile literal (an
    * array<array<string>>) to plain JVM arrays: the codegen'd call site
    * passes the SAME Literal-backed ArrayData instance every row (the
    * checkInputDataTypes `foldable` gate + ConstantFolding collapse the arg
    * to a single Literal), so one ThreadLocal (ref, converted) pair makes
    * the conversion once per task instead of ~30 UTF8String→String
    * allocations per row. If that assumption ever breaks (a foldable arg
    * surviving un-collapsed would present a fresh ArrayData per row), the
    * identity check misses and the kernel stays CORRECT — it just converts
    * per row. The ThreadLocal is cleared at task completion so pooled
    * executor threads don't retain the last profile between tasks. */
  private val profileWordsCache =
    new ThreadLocal[(ArrayData, Array[Array[String]])]

  private def profileWords(profiles: ArrayData): Array[Array[String]] = {
    val c = profileWordsCache.get()
    if (c != null && (c._1 eq profiles)) c._2
    else {
      val out = Array.tabulate(profiles.numElements()) { p =>
        val a = profiles.getArray(p)
        (0 until a.numElements())
          .map(a.getUTF8String)
          .filter(_ != null)
          .map(_.toString)
          .toArray
      }
      if (c == null) { // first use in this task: arm the cleanup
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ => profileWordsCache.remove())
      }
      profileWordsCache.set((profiles, out))
      out
    }
  }

  /** One-pass token profile of a whitespace-normalized string against a
    * list of word sets: out(0) = token count (split on single spaces,
    * empties kept — exactly `size(split(s, ' '))`), out(p+1) = number of
    * tokens string-equal to any word of profile p (exactly the
    * `aggregate(tokens, 0, acc + array_contains(...))` HOF this kernel
    * replaces — equivalence-tested in LlmOpsSpec). Tokens are matched by
    * char-region comparison against the in-place string: no per-token or
    * per-shingle allocation anywhere in the loop. */
  def tokenProfile(s: UTF8String, profiles: ArrayData): ArrayData = {
    val str = s.toString
    val words = profileWords(profiles)
    val nProf = words.length
    val counts = new Array[Long](nProf + 1)
    val len = str.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        counts(0) += 1
        val tokLen = i - start
        var p = 0
        while (p < nProf) {
          val ws = words(p)
          var w = 0
          var hit = false
          while (w < ws.length && !hit) {
            val word = ws(w)
            if (word.length == tokLen &&
                str.regionMatches(start, word, 0, tokLen)) {
              counts(p + 1) += 1
              hit = true
            }
            w += 1
          }
          p += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Rabin–Karp rolling fingerprint over code points:
    * acc ← (acc·131 + cp) mod 1e9+7; empty → 0. Exact semantics of the HOF
    * form `aggregate(split(s,''), 0L, (acc,c) -> (acc*131+ascii(c)) % p)`
    * it replaces (Java regex split('') yields one element per code point,
    * and ascii() returns the code point) and of the DuckDB `list_reduce`
    * replay in the q_fingerprint / q_redact oracles. The HOF form was the
    * last interpreted per-character fold in the engine: `ArrayAggregate`
    * is CodegenFallback and `split` materializes a char array per row. */
  def rollingFp(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val c = str.codePointAt(i)
      acc = (acc * 131 + c) % 1000000007L
      i += Character.charCount(c)
    }
    acc
  }

  /** Distinct word n-grams of a whitespace-normalized string, first
    * occurrence order — the generalization of `shingles3` (n = 3 is
    * equivalence-tested against it): tokens split on single spaces
    * (empties kept), < n tokens → one gram = the whole string, else
    * token n-tuples joined by single spaces, which on a single-spaced
    * string are exactly substrings from token t's start to token
    * t+n-1's end — no per-gram string assembly. Used by the
    * benchmark-decontamination operator (word 8-grams, the PaLM-style
    * eval-overlap unit). */
  def wordNGrams(s: UTF8String, n: Int): ArrayData = {
    if (n < 1) throw new IllegalArgumentException(
      s"word_ngrams: n must be >= 1, got $n")
    val str = s.toString
    val len = str.length
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') starts.add(i + 1)
      i += 1
    }
    val nTok = starts.size()
    val out = new java.util.LinkedHashSet[String]()
    if (nTok < n) {
      out.add(str)
    } else {
      var t = 0
      while (t + n - 1 < nTok) {
        // end of token t+n-1 = (start of token t+n) - 1, or end of string
        val end = if (t + n < nTok) starts.get(t + n) - 1 else len
        out.add(str.substring(starts.get(t), end))
        t += 1
      }
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** One-pass repetition statistics of a whitespace-normalized string —
    * the Gopher-style quality signals, per row with no shuffle:
    * [n_tokens, max_token_count, distinct_tokens, distinct_bigrams].
    * Tokens split on single spaces (empties kept — `size(split(s,' '))`
    * semantics, so "" counts 1 empty token); bigrams are adjacent token
    * pairs joined by a single space (n_tokens − 1 of them, 0 when
    * n_tokens < 2). Derived ratios (top-token fraction, duplicate-token
    * fraction, duplicate-bigram fraction) are left to the caller so the
    * kernel stays integer-exact and DuckDB-replayable via unnest/groupBy. */
  def repeatStats(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') starts.add(i + 1)
      i += 1
    }
    val nTok = starts.size()
    val tokCounts = new java.util.HashMap[String, Long]()
    val bigrams = new java.util.HashSet[String]()
    var maxCnt = 0L
    var t = 0
    while (t < nTok) {
      val tokEnd = if (t + 1 < nTok) starts.get(t + 1) - 1 else len
      val tok = str.substring(starts.get(t), tokEnd)
      val c = tokCounts.merge(tok, 1L, (a, b) => a + b)
      if (c > maxCnt) maxCnt = c
      if (t + 1 < nTok) {
        val bgEnd = if (t + 2 < nTok) starts.get(t + 2) - 1 else len
        bigrams.add(str.substring(starts.get(t), bgEnd))
      }
      t += 1
    }
    new GenericArrayData(Array[Any](
      nTok.toLong, maxCnt, tokCounts.size().toLong, bigrams.size().toLong))
  }

  /** Positional span fingerprints — `span_fps(normalized_text, w)`:
    * fp[t] == [[rollingFp]] of the t-th positional w-token span (tokens
    * split on single spaces, empties kept; < w tokens → one fp of the
    * whole string, matching [[wordNGrams]]' short-doc semantics) —
    * computed in O(len) TOTAL via prefix polynomial hashes instead of
    * O(len·w) per-span substring assembly + re-roll: with H(i) = the
    * code-point roll of the prefix before char index i and C(i) its
    * code-point count, fp(a, b) = (H(b) − H(a)·131^(C(b)−C(a))) mod p.
    * This is the corpus-wide pass of the span-mask rewrite operator
    * (operators.Dedup.spanMaskOf): at 100 TB it is the only stage that
    * touches every document, so the n·w→n reduction is the one that
    * matters; span STRINGS materialize later, only for fp-hot
    * occurrences. H/C are filled at code-point ENDS only — span
    * boundaries are spaces (BMP, single char) or string ends, so a
    * boundary can never land mid-surrogate-pair. */
  def spanFps(s: UTF8String, w: Int): ArrayData = {
    if (w < 1) throw new IllegalArgumentException(
      s"span_fps: w must be >= 1, got $w")
    val str = s.toString
    val len = str.length
    val P = 1000000007L
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') starts.add(i + 1)
      i += 1
    }
    val nTok = starts.size()
    val hArr = new Array[Long](len + 1)
    val cArr = new Array[Int](len + 1)
    var acc = 0L
    var cnt = 0
    i = 0
    while (i < len) {
      val c = str.codePointAt(i)
      acc = (acc * 131 + c) % P
      cnt += 1
      i += Character.charCount(c)
      hArr(i) = acc
      cArr(i) = cnt
    }
    val pow = new Array[Long](cnt + 1)
    pow(0) = 1L
    i = 1
    while (i <= cnt) { pow(i) = pow(i - 1) * 131 % P; i += 1 }
    def fp(a: Int, b: Int): Long = {
      val v = (hArr(b) - hArr(a) * pow(cArr(b) - cArr(a))) % P
      if (v < 0) v + P else v
    }
    if (nTok < w) {
      new GenericArrayData(Array[Any](fp(0, len)))
    } else {
      val out = new Array[Any](nTok - w + 1)
      var t = 0
      while (t + w - 1 < nTok) {
        val end = if (t + w < nTok) starts.get(t + w) - 1 else len
        out(t) = fp(starts.get(t), end)
        t += 1
      }
      new GenericArrayData(out)
    }
  }

  /** MinHash signature over a DuckDB-replayable hash family: each shingle
    * reduces ONCE to a polynomial code-point roll p (base 131 mod
    * P = 2147483647 — the same roll as SimHash h1), and seed j applies the
    * affine h_j = (a_j·p + b_j) mod P with a_j = (1103515245·(j+1)) mod P
    * and b_j = (12345·(j+1)) mod P (a_j ≠ 0: P prime, both factors nonzero
    * mod P). minhash[j] = min over shingles of h_j; every intermediate
    * < 2^62, so DuckDB's overflow-checked BIGINT arithmetic reproduces the
    * signature — which lets the oracle state the LSH's ACTUAL candidate
    * set instead of an exhaustive ground truth that only matches when
    * banding recall happens to be 1 (it provably isn't at every SF).
    * Also cheaper than the previous xxhash64 family: one char pass per
    * shingle instead of one xxhash64 per (shingle, seed). */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val P = 2147483647L
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      as(j) = (1103515245L * (j + 1)) % P
      bs(j) = (12345L * (j + 1)) % P
      j += 1
    }
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      // null or empty → p = 0 (the SQL CASE strlen = 0 branch)
      var p = 0L
      if (s != null) {
        val str = s.toString
        var k = 0
        while (k < str.length) {
          val c = str.codePointAt(k)
          p = (p * 131 + c) % P
          k += Character.charCount(c)
        }
      }
      j = 0
      while (j < numHashes) {
        val h = (as(j) * p + bs(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Tabulation-style MinHash signature — the PRODUCTION hash family since
    * r10. Each shingle reduces ONCE to the same polynomial code-point roll
    * p as [[minhash]]; slot j then hashes p as the XOR of four per-byte
    * table values over p's low 4 bytes:
    *   T_jk(v) = (A_jk · (v + 17) + B_jk) mod P,
    *   A_jk = (2654435761 · (4j+k+1)) mod P,
    *   B_jk = (40503 · (4j+k+1) + 7) mod P,   P = 2147483647.
    * The tables come from a fixed affine formula of (slot, byte index,
    * byte value) rather than random entries, so the formal independence
    * guarantees of true (Zobrist/Pǎtraşcu–Thorup) tabulation hashing
    * don't directly apply — but the property that matters for MinHash
    * holds structurally: an XOR of per-byte values is NOT monotone in p,
    * so the affine family's correlated-minima pathology (one small p
    * capturing the min of most slots at once; q_mh_accuracy measured a
    * ~1% tail erring up to 0.82) cannot occur, and the q_mh_tabulation
    * audit measures the worst case collapsing to the plain binomial
    * envelope (~0.22). Every intermediate stays < 2^63, so DuckDB's
    * checked BIGINT arithmetic replays the signature exactly
    * (Dedup.tabSlotSql); the HOF executable spec lives in
    * Dedup.signaturesTabHof (equivalence-tested). */
  /** Cache of the per-(slot, byte) tabulation tables — they depend only on
    * numHashes, which is a foldable plan constant, so after the first row
    * every call hits. The race is benign: the tuple is immutable and the
    * computation idempotent, so a concurrent rebuild just wastes one
    * 160-multiplication pass. */
  @volatile private var tabTables: (Int, Array[Long], Array[Long]) = null

  def minhashTab(shingles: ArrayData, numHashes: Int): ArrayData = {
    val P = 2147483647L
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var cached = tabTables
    if (cached == null || cached._1 != numHashes) {
      val na = new Array[Long](numHashes * 4)
      val nb = new Array[Long](numHashes * 4)
      var j = 0
      while (j < numHashes) {
        var k = 0
        while (k < 4) {
          val t = 4L * j + k + 1
          na(j * 4 + k) = (2654435761L * t) % P
          nb(j * 4 + k) = (40503L * t + 7L) % P
          k += 1
        }
        j += 1
      }
      cached = (numHashes, na, nb)
      tabTables = cached
    }
    val as = cached._2
    val bs = cached._3
    var j = 0
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      var p = 0L
      if (s != null) {
        val str = s.toString
        var k = 0
        while (k < str.length) {
          val c = str.codePointAt(k)
          p = (p * 131 + c) % P
          k += Character.charCount(c)
        }
      }
      j = 0
      while (j < numHashes) {
        var h = 0L
        var k = 0
        while (k < 4) {
          h ^= (as(j * 4 + k) * (((p >> (8 * k)) & 255L) + 17L) +
            bs(j * 4 + k)) % P
          k += 1
        }
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** simhash64(normalized_text) → BIGINT. Null in → null out. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "simhash64")
}

/** rolling_fp(text) → BIGINT. Null in → null out. */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rolling_fp expects string, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.rollingFp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.rollingFp($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)

  override def prettyName: String = "rolling_fp"
}

object RollingFp {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingFp].getName, "rolling_fp")
}

/** shingles3(normalized_text) → ARRAY<STRING>. Null in → null out. */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"shingles3 expects string, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.shingles3($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)

  override def prettyName: String = "shingles3"
}

object Shingles3 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Shingles3].getName, "shingles3")
}

/** minhash_sigs(shingles, numHashes) → ARRAY<BIGINT>. One pass over the
  * shingle array computes every seed's minimum. numHashes must be a
  * foldable positive int. */
case class MinHashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "minhash_sigs expects (array<string>, foldable int), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PolyHash.minhash(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PolyHash.minhash($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSigs].getName, "minhash_sigs")
}

/** tabulation_sigs(shingles, numHashes) → ARRAY<BIGINT>. The production
  * MinHash family since r10 (see PolyHash.minhashTab); one pass over the
  * shingle array computes every slot's minimum. numHashes must be a
  * foldable positive int. */
case class TabulationSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "tabulation_sigs expects (array<string>, foldable int), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PolyHash.minhashTab(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PolyHash.minhashTab($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TabulationSigs =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "tabulation_sigs"
}

object TabulationSigs {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TabulationSigs].getName, "tabulation_sigs")
}

/** token_profile(normalized_text, array(array<string>...)) →
  * ARRAY<BIGINT> [n_tokens, cnt_profile0, ...]. The profile list must be
  * foldable (a literal) — it is converted once per task, not per row.
  * Null text → null out. */
case class TokenProfile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _))
          if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "token_profile expects (string, foldable array<array<string>>), " +
          s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PolyHash.tokenProfile(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PolyHash.tokenProfile($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenProfile =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "token_profile"
}

object TokenProfile {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenProfile].getName, "token_profile")
}

/** word_ngrams(normalized_text, n) → ARRAY<STRING> distinct word n-grams.
  * n must be a foldable positive int. Null text → null out. */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "word_ngrams expects (string, foldable int), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PolyHash.wordNGrams(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PolyHash.wordNGrams($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_ngrams"
}

object WordNGrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordNGrams].getName, "word_ngrams")
}

/** span_fps(normalized_text, w) → ARRAY<BIGINT> positional span
  * fingerprints (fp[t] == rolling_fp of the t-th w-token span).
  * w must be a foldable positive int. Null text → null out. */
case class SpanFps(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "span_fps expects (string, foldable int), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PolyHash.spanFps(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PolyHash.spanFps($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanFps =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_fps"
}

object SpanFps {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SpanFps].getName, "span_fps")
}

/** repeat_stats(normalized_text) → ARRAY<BIGINT>
  * [n_tokens, max_token_count, distinct_tokens, distinct_bigrams].
  * Null in → null out. */
case class RepeatStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"repeat_stats expects string, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.repeatStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.repeatStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepeatStats =
    copy(child = newChild)

  override def prettyName: String = "repeat_stats"
}

object RepeatStats {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RepeatStats].getName, "repeat_stats")
}

/** sorted_intersect_count(a, b) → BIGINT: |a ∩ b| of two ASCENDING-sorted,
  * DISTINCT, non-null ARRAY<STRING> columns via a single merge walk —
  * result-identical to `size(array_intersect(a, b))` on such inputs
  * (array_intersect dedupes, but distinct inputs have nothing to dedupe),
  * without hashing every element or materializing the intersection array.
  *
  * Why (r20, q_sim_join): the PPJoin verify computes |A∩B| per surviving
  * candidate pair over each doc's sorted `%012d|token` key array.
  * `array_intersect` builds a hash set of one side (a full byte-hash of
  * every ~25-byte key) and allocates the intersection as a real array
  * just to take its size — measured as ~2.5 s of the query's 4.4 s at
  * sf0.1 (DevProbe stage breakdown: verify joins with arrays attached
  * but no intersect, 1.08 s; with array_intersect, 3.65 s). The arrays
  * are ALREADY sorted (sort_array pins the global token order for the
  * prefix slice), so a merge walk counts the same intersection in
  * O(|a|+|b|) byte-prefix comparisons with zero allocation.
  *
  * Element order is UTF8String.compareTo — the SAME binary ordering
  * sort_array uses for StringType, so the walk never misses a match on
  * arrays sort_array produced. Inputs violating the contract fail fast:
  * a null element raises (upstream-bug discipline, like the span-dedup
  * null-text raise) rather than returning a wrong count. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count expects (array<string>, array<string>), " +
          s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null element (inputs must be " +
            "sorted, distinct, non-null arrays)")
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1L; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getName, "sorted_intersect_count")
}
