package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cells.Hex7

class Hex7Spec extends AnyFunSuite {

  private def randPts(n: Int, seed: Int): Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      // uniform on the sphere (lat from asin of uniform z)
      val lat = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val lon = rnd.nextDouble() * 360 - 180
      (lat, lon)
    }
  }

  test("bit layout: res/face/digit fields round trip, unused digits are 7") {
    for (res <- Seq(0, 1, 7, 11, 15); (lat, lon) <- randPts(50, 7)) {
      val c = Hex7.latLngToCell(lat, lon, res)
      assert(Hex7.resOf(c) === res)
      assert(Hex7.faceIdOf(c) >= 0 && Hex7.faceIdOf(c) < 20)
      for (r <- 1 to res) assert(Hex7.digitOf(c, r) >= 0 && Hex7.digitOf(c, r) <= 6)
      for (r <- res + 1 to Hex7.MaxRes) assert(Hex7.digitOf(c, r) === 7)
    }
  }

  test("parent is digit truncation and is transitive") {
    for ((lat, lon) <- randPts(200, 13)) {
      val c11 = Hex7.latLngToCell(lat, lon, 11)
      val p9 = Hex7.parent(c11, 9)
      assert(Hex7.resOf(p9) === 9)
      for (r <- 1 to 9) assert(Hex7.digitOf(p9, r) === Hex7.digitOf(c11, r))
      assert(Hex7.parent(c11, 7) === Hex7.parent(p9, 7)) // truncation is transitive
      assert(Hex7.parent(p9, 9) === p9)                // idempotent
    }
  }

  test("center-child center coincides with parent center (lattice exactness)") {
    for ((lat, lon) <- randPts(200, 17); res <- Seq(5, 8, 11)) {
      val c = Hex7.latLngToCell(lat, lon, res)
      val child0 = Hex7.children(c)(0)
      val (la1, lo1) = Hex7.cellToLatLng(c)
      val (la2, lo2) = Hex7.cellToLatLng(child0)
      assert(math.abs(la1 - la2) < 1e-9 && math.abs(lo1 - lo2) < 1e-9,
        s"child0 center drifted at res $res: ($la1,$lo1) vs ($la2,$lo2)")
    }
  }

  test("children: 7 distinct cells, all with this parent, centers inside-ish") {
    for ((lat, lon) <- randPts(100, 23)) {
      val c = Hex7.latLngToCell(lat, lon, 8)
      val kids = Hex7.children(c)
      assert(kids.distinct.length === 7)
      kids.foreach { k =>
        assert(Hex7.parent(k, 8) === c)
        assert(Hex7.resOf(k) === 9)
      }
    }
  }

  test("round trip: cell -> center -> cell (res 7-11)") {
    // global sweep: hexes straddling an icosahedron edge can re-encode onto
    // the neighboring face (documented divergence) — require >= 99% globally
    // and 100% away from face edges (the synth-world region).
    for (res <- 7 to 11) {
      val pts = randPts(2000, 100 + res)
      var ok = 0
      pts.foreach { case (lat, lon) =>
        val c = Hex7.latLngToCell(lat, lon, res)
        val (cla, clo) = Hex7.cellToLatLng(c)
        if (Hex7.latLngToCell(cla, clo, res) == c) ok += 1
      }
      assert(ok >= (pts.size * 0.99).toInt, s"res $res: only $ok/${pts.size} round-tripped")
    }
    // synth-world region: exact
    for (res <- 7 to 11; du <- 0 until 20; dv <- 0 until 20) {
      val lat = 37.0 + du * 0.025; val lon = -122.0 + dv * 0.025
      val c = Hex7.latLngToCell(lat, lon, res)
      val (cla, clo) = Hex7.cellToLatLng(c)
      assert(Hex7.latLngToCell(cla, clo, res) === c, s"res $res at ($lat,$lon)")
    }
  }

  test("encode -> decode center stays within one cell radius of the input") {
    // cell size at res r ≈ S0/sqrt(7)^r radians of gnomonic plane; the
    // decoded center must be closer than ~1.2 cell circumradii (gnomonic
    // distortion bound well inside a face)
    for ((lat, lon) <- randPts(500, 41)) {
      val res = 9
      val c = Hex7.latLngToCell(lat, lon, res)
      val (cla, clo) = Hex7.cellToLatLng(c)
      val distRad = {
        val dLat = math.toRadians(cla - lat)
        val dLon = math.toRadians(clo - lon) * math.cos(math.toRadians(lat))
        math.sqrt(dLat * dLat + dLon * dLon)
      }
      val cellRad = 2.0 / math.pow(7.0, res * 0.5) * 1.3
      assert(distRad < cellRad, s"center too far: $distRad vs $cellRad")
    }
  }

  test("resolution refines cell population (synth region)") {
    val pts = for (du <- 0 until 40; dv <- 0 until 40)
      yield (37.0 + du * 0.01, -122.0 + dv * 0.01)
    val counts = (5 to 11).map(res => pts.map(p => Hex7.latLngToCell(p._1, p._2, res)).distinct.size)
    assert(counts === counts.sorted, s"cell counts must grow with res: $counts")
    assert(counts.last > counts.head * 10)
  }

  test("aperture 7: expected cells-per-area growth between resolutions") {
    // counting distinct cells over a dense region: ratio between consecutive
    // resolutions approaches 7 (the aperture)
    // large region + fine resolutions so boundary cells don't dominate
    val pts = for (du <- 0 until 300; dv <- 0 until 300)
      yield (37.0 + du * 0.002, -122.0 + dv * 0.002)
    val c9 = pts.map(p => Hex7.latLngToCell(p._1, p._2, 9)).distinct.size
    val c10 = pts.map(p => Hex7.latLngToCell(p._1, p._2, 10)).distinct.size
    val ratio = c10.toDouble / c9
    assert(ratio > 5.5 && ratio < 8.5, s"aperture ratio off: $ratio ($c9 -> $c10)")
  }
}
