package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cells.S2

class S2Spec extends AnyFunSuite {

  test("face assignment for cardinal directions") {
    assert(S2.fromLatLon(0, 0) >>> 61 === 0)      // +x
    assert(S2.fromLatLon(0, 90) >>> 61 === 1)     // +y
    assert(S2.fromLatLon(90, 0) >>> 61 === 2)     // +z
    assert(S2.fromLatLon(0, 180) >>> 61 === 3)    // -x
    assert(S2.fromLatLon(0, -90) >>> 61 === 4)    // -y
    assert(S2.fromLatLon(-90, 0) >>> 61 === 5)    // -z
  }

  test("(face,i,j) <-> id round trips exactly (random sweep)") {
    val rnd = new scala.util.Random(11)
    (1 to 20000).foreach { _ =>
      val face = rnd.nextInt(6)
      val i = rnd.nextInt(1 << 30)
      val j = rnd.nextInt(1 << 30)
      val id = S2.fromFaceIj(face, i, j)
      assert((id & 1L) === 1L)
      assert(S2.toFaceIj(id) === ((face, i, j)))
    }
  }

  test("leaf ids are unique and level arithmetic works") {
    val id = S2.fromLatLon(37.751, -122.447)
    assert(S2.level(id) === 30)
    val p10 = S2.parentAtLevel(id, 10)
    assert(S2.level(p10) === 10)
    // parent is a prefix: truncating further is idempotent
    assert(S2.parentAtLevel(p10, 10) === p10)
    assert(S2.parentAtLevel(id, 5) === S2.parentAtLevel(p10, 5))
  }

  test("cell containment: a cell contains its own center (all levels)") {
    val pts = Seq((37.751, -122.447), (-33.86, 151.21), (51.5, -0.12), (0.01, 0.01),
      (80.0, 170.0), (-45.0, -90.01))
    for ((la, lo) <- pts; lv <- Seq(5, 10, 16, 24)) {
      val cell = S2.fromLatLonAtLevel(la, lo, lv)
      val (cla, clo) = S2.toLatLon(cell)
      assert(S2.fromLatLonAtLevel(cla, clo, lv) === cell, s"($la,$lo) level $lv")
    }
  }

  test("nearby points share coarse cells, far points do not") {
    val a = S2.fromLatLonAtLevel(37.7510, -122.4470, 12)
    val b = S2.fromLatLonAtLevel(37.7511, -122.4471, 12) // ~15 m away
    val c = S2.fromLatLonAtLevel(37.80, -122.30, 12)
    assert(a === b)
    assert(a !== c)
    // Hilbert locality: ids of nearby points are numerically close at leaf
    val la = S2.fromLatLon(37.7510, -122.4470)
    val lb = S2.fromLatLon(37.7510001, -122.4470001)
    assert(math.abs(la - lb) < (1L << 35))
  }

  test("level sizing: level 11 cells are neighborhood-scale (~10-40 km2 band)") {
    // two points ~3 km apart share level 8 but not level 13
    val a1 = S2.fromLatLonAtLevel(37.75, -122.44, 8)
    val a2 = S2.fromLatLonAtLevel(37.777, -122.44, 8)
    val b1 = S2.fromLatLonAtLevel(37.75, -122.44, 13)
    val b2 = S2.fromLatLonAtLevel(37.777, -122.44, 13)
    assert(b1 !== b2)
  }
}
