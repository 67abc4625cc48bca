package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Strings

/** Edit-distance similarity-join contracts (Strings.editJoin). */
class StringsSpec extends AnyFunSuite {
  import TestSpark._

  /** Classic unit-cost Levenshtein DP — the independent reference metric. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("edit join: equals the exhaustive all-pairs DP recount, pairs unique") {
    val out = SparkEntry.queries("q_edit_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // brute-force ground truth over the full dictionary — NO length band,
    // so the test would catch a band that loses pairs
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0)).sorted
    val truth = for {
      i <- names.indices; j <- i + 1 until names.length
      d = lev(names(i), names(j)) if d <= Strings.EditJoinMaxDist
    } yield (names(i), names(j), d.toLong)
    assert(out.toSet === truth.toSet)
    assert(out.length === out.map(t => (t._1, t._2)).distinct.length)
    assert(out.nonEmpty, "dictionary should contain near-duplicate names")
    out.foreach { case (a, b, d) => assert(a < b && d >= 1 && d <= 2) }
  }
}
