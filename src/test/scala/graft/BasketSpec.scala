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
}
