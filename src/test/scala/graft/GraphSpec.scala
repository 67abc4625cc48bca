package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("pagerank: teleport floor, structure signal, exact mass bounds") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sf).count()
    assert(rows.size === n) // every node ranked, sources included
    // teleport term is the exact floor: nodes with no inbound links sit
    // at exactly 150000 micro-units; linked nodes strictly above
    assert(rows.values.forall(_ >= 150000L))
    assert(rows.values.exists(_ > 150000L), "no structure signal")
    // damped mass can only shrink: sum(r) <= n * 1e6 (teleport puts back
    // 0.15, contributions pass on < 0.85 of held mass after int floors)
    assert(rows.values.sum <= n * 1000000L)
    // integer arithmetic => bit-identical on re-execution
    val again = SparkEntry.queries("q_pagerank")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === rows)
  }

  test("snapshot diff: per-status counts match the planted edit script") {
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = Tables.documents(spark, sf)
    val added = d.filter(col("doc_id") % 9 === 0).count()
    val removed = d.filter(col("doc_id") % 10 === 0).count()
    val changed =
      d.filter(col("doc_id") % 7 === 0 && col("doc_id") % 10 =!= 0).count()
    val unchanged = d.count() - removed - changed
    assert(rows === Map("added" -> added, "removed" -> removed,
      "changed" -> changed, "unchanged" -> unchanged))
  }

  test("triangles: degree-ordered count equals a brute-force set recount") {
    val r = SparkEntry.queries("q_triangles")(spark, sf).head()
    val (nNodes, nEdges, wedges, tri) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // rebuild the same support>=2 co-purchase edge set, then count
    // triangles the naive way: adjacency sets + neighbor intersection
    val items = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = items.groupBy(_._1).values.toSeq
      .flatMap { b =>
        val ps = b.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
      }
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    assert(nEdges === edges.size)
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert(nNodes === adj.size)
    assert(wedges === adj.values.map(n => n.size.toLong * (n.size - 1) / 2).sum)
    val bruteTri = edges.map { case (a, b) =>
      (adj(a) & adj(b)).size.toLong
    }.sum / 3 // each triangle seen from its 3 edges
    assert(tri === bruteTri)
    assert(tri > 0, "co-purchase graph has no triangles — vacuous")
    assert(math.abs(r.getDouble(4) - 3.0 * tri / wedges) < 1e-6)
  }
}
