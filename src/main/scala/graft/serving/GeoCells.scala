package graft.serving

/** Closed-form base32 geohash CELL arithmetic on the driver side —
  * the scalar twin of [[EsDsl.geohashColumn]]'s column bit
  * arithmetic (same Niemeyer layout: even bits longitude, MSB
  * first; same top-edge clamp), plus the two pieces ES 8.11's geo
  * completion contexts need beyond encoding:
  *
  *   - NEIGHBOUR cells: at precision p the geohash cells form a
  *     regular 2^lonBits × 2^latBits lon/lat grid, so the 8
  *     neighbours of a cell are exactly the adjacent grid indexes —
  *     longitude wraps modulo the grid width (the antimeridian is a
  *     cell boundary), latitude rows beyond the poles simply do not
  *     exist (a polar cell has 5 neighbours). No lookup tables, no
  *     per-character border cases — stepping CELL INDEXES and
  *     re-encoding is the whole algorithm.
  *   - DISTANCE-STRING precision ("1km", "10m"): ES's
  *     GeoUtils.geoHashLevelsForPrecision maps a distance to the
  *     number of geohash levels whose cell edge at the equator is
  *     at most that distance (reference: src/search_api.py:38-46
  *     passes bodies verbatim to ES 8.11, whose GeoQueryContext
  *     accepts both forms).
  *
  * Everything here is request-sized driver arithmetic: the query
  * side of a geo context folds to LITERAL cell strings, so the
  * executor-side predicate stays `geohash(point) IN (cells)` with
  * the literal side constant-folded — no geo math per row beyond
  * the one encode the scan already does.
  */
private[graft] object GeoCells {

  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** (lonBits, latBits) of a `p`-char geohash: 5p bits interleaved
    * starting with longitude, so longitude gets the extra bit on
    * odd totals. */
  def bits(p: Int): (Int, Int) = {
    val total = 5 * p
    ((total + 1) / 2, total / 2)
  }

  /** Quantized (x, y) cell indexes of a point at precision `p` —
    * the same floor/clamp convention as [[EsDsl.geohashColumn]]
    * (the +90/+180 top edge lands in the last cell). */
  def cellIdx(lat: Double, lon: Double, p: Int): (Long, Long) = {
    val (lonBits, latBits) = bits(p)
    val x = math.min(
      math.floor((lon + 180.0) / 360.0 * math.pow(2, lonBits)).toLong,
      (1L << lonBits) - 1)
    val y = math.min(
      math.floor((lat + 90.0) / 180.0 * math.pow(2, latBits)).toLong,
      (1L << latBits) - 1)
    (x, y)
  }

  /** Base32 geohash of cell (x, y) at precision `p` — MSB-first
    * interleave (lon bit i → combined bit 2i), 5-bit groups onto
    * the base32 alphabet; bit-identical to the column encoder. */
  def encodeIdx(x: Long, y: Long, p: Int): String = {
    val total = 5 * p
    val (lonBits, latBits) = bits(p)
    var code = 0L
    var i = 0
    while (i < lonBits) {
      code |= ((x >>> (lonBits - 1 - i)) & 1L) << (total - 1 - 2 * i)
      i += 1
    }
    i = 0
    while (i < latBits) {
      code |= ((y >>> (latBits - 1 - i)) & 1L) <<
        (total - 1 - (2 * i + 1))
      i += 1
    }
    val sb = new java.lang.StringBuilder(p)
    var g = 0
    while (g < p) {
      sb.append(Alphabet.charAt(((code >>> (5 * (p - 1 - g))) & 31L)
        .toInt))
      g += 1
    }
    sb.toString
  }

  /** The point's own cell as a base32 string. */
  def encode(lat: Double, lon: Double, p: Int): String = {
    val (x, y) = cellIdx(lat, lon, p)
    encodeIdx(x, y, p)
  }

  /** The 8 neighbour cells of the point's cell at precision `p` —
    * fewer at the poles (latitude rows beyond ±90 do not exist);
    * longitude wraps across the antimeridian. The point's OWN cell
    * is excluded (ES's GeoContextMapping adds the exact hash and
    * the neighbours as separate context entries). */
  def neighbors(lat: Double, lon: Double, p: Int): Seq[String] = {
    val (lonBits, latBits) = bits(p)
    val nx = 1L << lonBits
    val ny = 1L << latBits
    val (x, y) = cellIdx(lat, lon, p)
    for {
      dx <- -1 to 1
      dy <- -1 to 1
      if dx != 0 || dy != 0
      yy = y + dy
      if yy >= 0 && yy < ny
    } yield encodeIdx(java.lang.Math.floorMod(x + dx, nx), yy, p)
  }

  /** ES's GeoUtils.geoHashLevelsForPrecision: the number of geohash
    * levels needed so a cell's equatorial edge is at most `meters`
    * — derived from the WGS-84 equator length (2π · 6378137 m) via
    * the bits-of-subdivision count, clamped to the 1..12 geohash
    * range. */
  def levelsForDistance(meters: Double): Int = {
    require(meters > 0, "distance precision must be positive")
    val earthEquator = 2.0 * math.Pi * 6378137.0
    val ratio = 1.0 + earthEquator / meters
    val part = math.ceil(math.log(ratio) / math.log(2.0))
    val full = (part / 5).toInt
    val left = (part % 5).toInt
    val even = full + (if (left > 0) 1 else 0)
    val odd = full + (if (left > 3) 1 else 0)
    math.max(1, math.min(12, even + odd))
  }

  /** Parse an ES distance string to meters — the DistanceUnit
    * suffixes ES accepts on geo precision values. None = not a
    * distance form (no recognized unit suffix / malformed number). */
  def parseDistanceMeters(s: String): Option[Double] = {
    val t = s.trim
    val units = Seq(
      // longest-suffix first so "nmi" wins over "mi", "cm"/"mm" over "m"
      "nmi" -> 1852.0, "NM" -> 1852.0, "km" -> 1000.0, "cm" -> 0.01,
      "mm" -> 0.001, "mi" -> 1609.344, "yd" -> 0.9144, "ft" -> 0.3048,
      "in" -> 0.0254, "m" -> 1.0)
    units.collectFirst {
      case (u, f) if t.endsWith(u) &&
          t.dropRight(u.length).trim.nonEmpty =>
        (t.dropRight(u.length).trim, f)
    }.flatMap { case (num, f) =>
      try Some(num.toDouble * f)
      catch { case _: NumberFormatException => None }
    }
  }

  /** An ES geo-context precision node's value as a geohash level:
    * an integer (or integer string) is a raw level 1..12; a
    * distance string maps through [[levelsForDistance]] — exactly
    * GeoUtils.parsePrecision's dispatch. None = neither form. */
  def precisionLevel(text: String): Option[Int] = {
    val t = text.trim
    if (t.nonEmpty && t.forall(_.isDigit))
      // digits beyond Int range are no level — fall through to the
      // caller's named rejection, never a raw NumberFormatException
      scala.util.Try(t.toInt).toOption
    else parseDistanceMeters(t).map(levelsForDistance)
  }
}
