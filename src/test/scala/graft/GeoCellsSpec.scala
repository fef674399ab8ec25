package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serving.GeoCells

/** Pins the driver-side geohash CELL arithmetic behind geo
  * completion contexts: scalar encode parity with the classic
  * public vectors (the same ones EsDslGeoSamplingSpec pins for the
  * column encoder — scalar and column twins cannot drift apart
  * without one of the two specs failing), the closed-form neighbour
  * stepping (known single-char neighbour set, antimeridian wrap,
  * missing polar rows, probe-point coverage of the full 3×3 block),
  * and ES's distance-string → geohash-level mapping. */
class GeoCellsSpec extends AnyFunSuite {

  test("encode: classic known vectors at several precisions (the " +
    "column twin's vectors — scalar/column parity by shared pins)") {
    assert(GeoCells.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(GeoCells.encode(57.64911, 10.40744, 5) == "u4pru")
    assert(GeoCells.encode(57.64911, 10.40744, 1) == "u")
    assert(GeoCells.encode(51.5074, -0.1278, 5) == "gcpvj")
    assert(GeoCells.encode(-33.8688, 151.2093, 5) == "r3gx2")
    assert(GeoCells.encode(64.1466, -21.9426, 5) == "ge2ku")
  }

  test("neighbors: the top-row cell 'u' has exactly the 5 known " +
    "neighbours (no row above the pole); interior cells have 8; " +
    "longitude wraps across the antimeridian") {
    // 'u' sits in the top latitude row of the 8×4 precision-1 grid:
    // west g, east v, south s, south-west e, south-east t — the
    // public single-char neighbour table
    assert(GeoCells.neighbors(57.64911, 10.40744, 1).toSet ==
      Set("g", "v", "e", "s", "t"))
    // an interior point: 8 distinct neighbours, own cell excluded
    val own = GeoCells.encode(10.0, 20.0, 6)
    val n8 = GeoCells.neighbors(10.0, 20.0, 6)
    assert(n8.size == 8 && n8.distinct.size == 8 && !n8.contains(own))
    // antimeridian wrap: the cell just west of lon +180 neighbours
    // the cell just east of lon -180
    assert(GeoCells.neighbors(0.0, 179.99, 3)
      .contains(GeoCells.encode(0.0, -179.99, 3)))
    // south pole: no row below
    assert(GeoCells.neighbors(-89.99, 0.0, 3).size == 5)
  }

  test("neighbors: probe points one cell-width/height away land in " +
    "the 3x3 block and cover all 9 cells (closed-form grid check)") {
    val p = 6
    val (lonBits, latBits) = GeoCells.bits(p)
    val cellW = 360.0 / (1L << lonBits)
    val cellH = 180.0 / (1L << latBits)
    val (x, y) = GeoCells.cellIdx(10.0, 20.0, p)
    // the exact center of the (x, y) cell
    val cLon = -180.0 + (x + 0.5) * cellW
    val cLat = -90.0 + (y + 0.5) * cellH
    val block = (GeoCells.encode(cLat, cLon, p) +:
      GeoCells.neighbors(cLat, cLon, p)).toSet
    val probes = for {
      dx <- -1 to 1; dy <- -1 to 1
    } yield GeoCells.encode(cLat + dy * cellH, cLon + dx * cellW, p)
    assert(probes.toSet == block && block.size == 9)
  }

  test("distance-string precision: ES's geoHashLevelsForPrecision " +
    "ladder and the DistanceUnit suffixes") {
    assert(GeoCells.levelsForDistance(10000000.0) == 1) // 10000km
    assert(GeoCells.levelsForDistance(5000000.0) == 2)
    assert(GeoCells.levelsForDistance(1000000.0) == 3)
    assert(GeoCells.levelsForDistance(5000.0) == 5)
    assert(GeoCells.levelsForDistance(1000.0) == 7)
    assert(GeoCells.levelsForDistance(10.0) == 9)
    assert(GeoCells.levelsForDistance(1.0) == 11)
    assert(GeoCells.levelsForDistance(0.001) == 12) // clamped floor
    assert(GeoCells.parseDistanceMeters("1km").contains(1000.0))
    assert(GeoCells.parseDistanceMeters("10m").contains(10.0))
    assert(GeoCells.parseDistanceMeters("1mi").contains(1609.344))
    assert(GeoCells.parseDistanceMeters("2nmi").contains(3704.0))
    assert(GeoCells.parseDistanceMeters("12in").contains(12 * 0.0254))
    assert(GeoCells.parseDistanceMeters("500").isEmpty) // no unit
    assert(GeoCells.parseDistanceMeters("fastkm").isEmpty)
    assert(GeoCells.precisionLevel("6").contains(6))
    assert(GeoCells.precisionLevel("1km").contains(7))
    assert(GeoCells.precisionLevel("fast").isEmpty)
    // all-digit beyond Int range: no level, never a raw
    // NumberFormatException (the caller owns the named rejection)
    assert(GeoCells.precisionLevel("99999999999").isEmpty)
  }
}
