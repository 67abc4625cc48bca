package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Basket

/** Market-basket co-purchase contracts (Basket.scala). */
class BasketSpec extends AnyFunSuite {
  import TestSpark._

  test("co-purchase: top pairs match an independent in-memory recount") {
    val out = SparkEntry.queries("q_copurchase")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty && out.length <= 25)
    // recount from scratch without the engine: baskets, cap, pairs, lift
    val items = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted).toMap
      .filter(_._2.size <= 32)
    val nOrders = baskets.size.toLong
    val freq = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val support = baskets.values.toSeq
      .flatMap(b => for (i <- b.indices; j <- i + 1 until b.size)
        yield (b(i), b(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = support.toSeq
      .map { case ((a, b), s) => (a, b, s) }
      .sortBy { case (a, b, s) => (-s, a, b) }.take(25)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq === top)
    // lift replays as the same one-division formula
    out.foreach { case (a, b, s, lift) =>
      val expect = math.rint(s.toDouble * nOrders /
        (freq(a) * freq(b)) * 1e6) / 1e6
      assert(math.abs(lift - expect) < 1e-9, s"lift mismatch for ($a,$b)")
    }
    // supports are ≥ 2 somewhere, so the ranking is data-exercised
    assert(out.head._3 >= 2)
  }

  test("mega-basket is excluded whole from pair expansion AND the counts") {
    // the testdata's largest basket is 17 distinct parts, so the
    // MaxBasket=32 cap was a dead branch in every gate — plant one. The
    // 40-part order must contribute NO pairs, NO item frequencies, and
    // NOT count in the lift denominator (excluded AND counted out, per
    // the documented discipline).
    val spark2 = spark
    import spark2.implicits._
    // orders 1..4: the pair (100, 200) co-occurs twice out of 4 small
    // baskets; order 99 is the 40-part mega-basket sharing part 100
    val small = Seq(
      1L -> 100L, 1L -> 200L,
      2L -> 100L, 2L -> 200L,
      3L -> 100L, 3L -> 300L,
      4L -> 400L, 4L -> 500L)
    val mega = (0 until 40).map(i => 99L -> (1000L + i)) :+ (99L -> 100L)
    val out = Basket.coPurchaseOf(
      (small ++ mega).toDF("l_orderkey", "l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // no pair touches the mega-basket's 1000+ parts
    assert(out.forall(t => t._1 < 1000 && t._2 < 1000))
    // top pair: (100, 200) support 2; lift = 2 * 4 / (3 * 2) with part
    // 100's frequency NOT inflated by the excluded order 99
    assert(out.head === ((100L, 200L, 2L,
      math.rint(2.0 * 4 / (3 * 2) * 1e6) / 1e6)))
  }
}
