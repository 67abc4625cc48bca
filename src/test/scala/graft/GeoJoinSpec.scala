package graft

import graft.operators.GeoJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary stress for the geo join. The reference lost real data exactly
  * here — 1,338 vs 1,427 vs 3,006 county matches depending on the polygon
  * source (01_DataMerge.R:119-128) — because points sitting ON shared
  * polygon edges are double-counted or dropped unless the containment test
  * induces a half-open tiling. These specs pin that tiling on a dense
  * lattice: every shared edge/vertex point belongs to EXACTLY one polygon
  * (the one above/right), so a gap-free polygon set partitions the plane
  * with no loss and no double-assignment.
  */
class GeoJoinSpec extends AnyFunSuite {
  import TestSpark._

  // n×n lattice of unit squares: polygon (r,c) = id r·n+c with corners
  // (r,c)(r,c+1)(r+1,c+1)(r+1,c) in (lat, lon) coordinates
  private val n = 12
  private lazy val lattice: Seq[GeoJoin.Polygon] =
    for { r <- 0 until n; c <- 0 until n } yield GeoJoin.Polygon(
      (r * n + c).toLong,
      Seq((r.toDouble, c.toDouble), (r.toDouble, c + 1.0),
        ((r + 1).toDouble, c + 1.0), ((r + 1).toDouble, c.toDouble)))

  test("ray casting induces a half-open tiling: boundary points get exactly one owner") {
    // every lattice vertex (shared by up to 4 squares), every edge
    // midpoint (shared by 2), and every center — 600+ points, the
    // boundary-sitting cases the reference's county join lost
    val pts =
      (for (r <- 0 to n; c <- 0 to n) yield (r.toDouble, c.toDouble)) ++
        (for (r <- 0 to n; c <- 0 until n) yield (r.toDouble, c + 0.5)) ++
        (for (r <- 0 until n; c <- 0 to n) yield (r + 0.5, c.toDouble)) ++
        (for (r <- 0 until n; c <- 0 until n) yield (r + 0.5, c + 0.5))
    pts.foreach { case (lat, lon) =>
      val owners = lattice.filter(p => GeoJoin.contains(p.ring, lat, lon))
      // inside the lattice's [0,n)×[0,n) half-open cover: exactly one
      // owner; on the outer top/right boundary: none (consistent with
      // each cell owning its bottom/left edges)
      val expected = if (lat < n && lon < n) 1 else 0
      assert(owners.size === expected,
        s"point ($lat,$lon) claimed by ${owners.map(_.id).mkString(",")}")
    }
  }

  test("pointInCounty over the dense lattice returns the unique half-open owner") {
    import spark.implicits._
    val f = GeoJoin.pointInCounty(spark, lattice)
    // all shared corners (each touches up to 4 polygons) + outside probes;
    // first-match-wins must coincide with the unique owner because the
    // tiling admits exactly one match
    val pts = (for (r <- 0 until n; c <- 0 until n)
      yield (r.toDouble, c.toDouble)) ++
      Seq((n.toDouble, n.toDouble), (-0.5, 3.0), (3.0, n.toDouble))
    val out = pts.toDF("lat", "lon")
      .withColumn("cid", f(col("lat"), col("lon")))
      .collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    for (r <- 0 until n; c <- 0 until n) {
      assert(out((r.toDouble, c.toDouble)) === Some((r * n + c).toLong),
        s"corner ($r,$c)")
    }
    assert(out((n.toDouble, n.toDouble)) === None)
    assert(out((-0.5, 3.0)) === None)
    assert(out((3.0, n.toDouble)) === None)
  }

  test("grid cells on exact boundaries keep every point (left join, no loss)") {
    import spark.implicits._
    // points exactly on 1°×10° cell boundaries — floor() assigns each to
    // exactly one cell and the LEFT join keeps it even if the grid had a
    // hole, so the profile total always equals the point count
    val pts = Seq((-60.0, -180.0), (0.0, 0.0), (59.0, 170.0),
      (0.0, -180.0), (-60.0, 170.0), (30.0, -10.0))
      .toDF("lat", "lon")
      .withColumn("lat_cell", floor(col("lat")).cast("long"))
      .withColumn("lon_cell", floor(col("lon") / 10).cast("long"))
    val joined = pts.join(broadcast(GeoJoin.grid(spark)),
      Seq("lat_cell", "lon_cell"), "left")
    assert(joined.count() === 6)
    assert(joined.filter(col("region_id").isNull).count() === 0,
      "every in-range cell must resolve to a region")
  }
}
