package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** q_poly_measures vs two independent oracles: the EXACT lattice area
  * (the city vertices sit on the half-microdegree lattice, so the true
  * shoelace is an exact integer over translated coordinates), and JTS
  * getArea/getLength (an independent implementation, itself subject to
  * ~1e-11 relative cancellation at lon ≈ -122, hence the looser bound). */
class PolySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("shoelace area and ring perimeter: exact lattice truth + JTS agreement") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_poly_measures")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("alpha", "beta", "gamma"))

    val g = graft.synth.Synth.gridSize(spark, dir)
    val gf = new GeometryFactory()
    for ((name, rings) <- graft.synth.Synth.cityPolys(g)) {
      val flat = rings(0) // [lon,lat,...] on the (k + 0.5) microdegree lattice
      val n = flat.length / 2
      val (nv, area, perim) = got(name)
      assert(nv == n)

      // exact truth: translate to integer microdegree offsets from vertex 0
      // (differences of lattice doubles scaled by 1e6 are exact integers),
      // shoelace in BigInt, halve at the end
      val ix = Array.tabulate(n)(i => BigInt(math.round((flat(2 * i) - flat(0)) * 1e6)))
      val iy = Array.tabulate(n)(i => BigInt(math.round((flat(2 * i + 1) - flat(1)) * 1e6)))
      val twiceA = (0 until n).map { i =>
        val j = (i + 1) % n
        ix(i) * iy(j) - ix(j) * iy(i)
      }.sum.abs
      val exact = twiceA.toDouble / 2.0 * 1e-12
      // accuracy floor: the STORED coordinates are doubles at magnitude
      // ~122°, so each vertex carries ulp(122)/2 ≈ 7e-15° of quantization;
      // a shoelace over n vertices can move by ~perimeter·ulp — that, not
      // the fold, bounds the achievable accuracy
      val quant = (0 until n).map(i => math.ulp(flat(2 * i).abs)).sum
      assert(math.abs(area - exact) <= 2.0 * quant + 1e-13 * exact,
        s"$name area $area vs exact $exact (quant floor $quant)")

      val coords = Array.tabulate(n + 1) { i =>
        val k = i % n; new Coordinate(flat(2 * k), flat(2 * k + 1))
      }
      val poly = gf.createPolygon(coords)
      assert(math.abs(area - poly.getArea) <= 1e-11 * math.max(1e-6, poly.getArea),
        s"$name area $area vs JTS ${poly.getArea}")
      assert(math.abs(perim - poly.getLength) <= 1e-12 * poly.getLength,
        s"$name perimeter $perim vs JTS ${poly.getLength}")
    }
  }
}
