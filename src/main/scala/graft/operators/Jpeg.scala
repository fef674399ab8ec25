package graft.operators

/** From-scratch BASELINE JPEG codec (ITU-T T.81 sequential DCT with
  * Huffman entropy coding) — plain JVM byte/math work, no imaging
  * libraries, closing the one stubbed arm of the multimodal tier: MJPEG
  * video frames (AVI `00dc` payloads are bare baseline JPEGs) and
  * `image/jpeg` blobs decode to real pixels the same way `image/ppm`
  * and `audio/wav` already decode through [[Ppm]] and [[Wav]].
  *
  * Encoder: 4:4:4 (no chroma subsampling), Annex K quantization tables
  * scaled by the libjpeg quality formula, Annex K Huffman tables,
  * restart-marker-free single scan. Decoder: any baseline (SOF0) stream
  * with 1 or 3 components, arbitrary sampling factors up to 4
  * (4:2:0/4:2:2 included), DRI/RSTn restart intervals, 8-bit
  * quantization tables; progressive (SOF2) and arithmetic streams
  * return None, as do truncated or malformed payloads — the same
  * junk-rows-return-None contract as the other codecs.
  *
  * Exactness note (the oracle hook): a UNIFORM 8×8 block survives the
  * round trip in closed form — only the DC coefficient is nonzero, so
  * decoded value = round(round(8·(v−128)/q₀)·q₀/8) + 128 with q₀ the
  * scaled DC quantizer. `multimodal_mjpeg` hash-gates the entire
  * encoder+decoder against DuckDB computing exactly that formula. The
  * decoder's final rounding carries a +1e-9 bias so ties (x.5 from
  * integer DC values) resolve identically to the oracle's exact
  * arithmetic instead of hanging on 1e-15 IDCT float noise.
  */
object Jpeg {

  // ---- Annex K tables (public ITU-T T.81 spec values) ----------------

  /** zigzag index → natural (row-major) index. */
  private val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val QLumBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChromBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Huffman table spec: (bits per code length 1..16, symbol values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).map(_.toByte).toArray

  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** cos((2x+1)·u·π/16) — shared by FDCT and IDCT. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** libjpeg quality scaling: the DC luminance quantizer this yields is
    * what the `multimodal_mjpeg` oracle computes with (quality 90 →
    * q₀ = 3). */
  def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(b => math.max(1, math.min(255, (b * scale + 50) / 100)))
  }

  // ---- encoder -------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        n -= 8
        val b = ((acc >>> n) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0) // byte stuffing
      }
    }
    def flush(): Unit = if (n > 0) {
      val b = (((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xff).toInt
      out.write(b)
      if (b == 0xff) out.write(0)
      n = 0
    }
  }

  /** symbol → (code, length) from a (bits, vals) spec — canonical
    * Huffman code assignment (T.81 C.2). */
  private def encTable(bits: Array[Int],
                       vals: Array[Byte]): Array[Int] = {
    val table = new Array[Int](256) // (len << 16) | code
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k) & 0xff) = (len << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  private def magnitude(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** FDCT + quantize one 8×8 block (edge-replicated) of `plane`, emit
    * DC diff + AC run-lengths; returns the new DC predictor. */
  private def encodeBlock(bw: BitWriter, plane: Array[Double], w: Int,
                          h: Int, x0: Int, y0: Int, qtab: Array[Int],
                          dcT: Array[Int], acT: Array[Int],
                          pred: Int): Int = {
    val f = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(h - 1, y0 + y)
      var x = 0
      while (x < 8) {
        val sx = math.min(w - 1, x0 + x)
        f(y * 8 + x) = plane(sy * w + sx) - 128.0
        x += 1
      }
      y += 1
    }
    // separable FDCT: rows then columns — 2·8³ multiplies per block
    // instead of the direct definition's 8⁴
    val tmp = new Array[Double](64) // tmp(u, y) = Σx f(x,y)·cos(x,u)
    var yy = 0
    while (yy < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += f(yy * 8 + x) * Cos(x)(u); x += 1 }
        tmp(yy * 8 + u) = s
        u += 1
      }
      yy += 1
    }
    val quantNat = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y2 = 0
        while (y2 < 8) { s += tmp(y2 * 8 + u) * Cos(y2)(v); y2 += 1 }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        // natural position (v row, u col); quantize rounding half-up
        val nat = v * 8 + u
        quantNat(nat) = Math.round(0.25 * cu * cv * s / qtab(nat)).toInt
        u += 1
      }
      v += 1
    }
    val zz = new Array[Int](64)
    var k = 0
    while (k < 64) { zz(k) = quantNat(Zig(k)); k += 1 }
    // DC
    val diff = zz(0) - pred
    val dsz = magnitude(diff)
    val dc = dcT(dsz)
    bw.put(dc & 0xffff, dc >>> 16)
    if (dsz > 0)
      bw.put(if (diff >= 0) diff else diff + (1 << dsz) - 1, dsz)
    // AC: run-lengths with ZRL and EOB
    var run = 0
    k = 1
    while (k < 64) {
      val v = zz(k)
      if (v == 0) run += 1
      else {
        while (run > 15) {
          val zrl = acT(0xf0); bw.put(zrl & 0xffff, zrl >>> 16); run -= 16
        }
        val sz = magnitude(v)
        val sym = acT((run << 4) | sz)
        bw.put(sym & 0xffff, sym >>> 16)
        bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val eob = acT(0); bw.put(eob & 0xffff, eob >>> 16) }
    zz(0)
  }

  /** Encode an RGB image as a baseline 4:4:4 JPEG. */
  def encode(img: Ppm.Image, quality: Int = 90): Array[Byte] = {
    require(img.w > 0 && img.h > 0, "empty image")
    val w = img.w; val h = img.h
    val qY = scaledQuant(QLumBase, quality)
    val qC = scaledQuant(QChromBase, quality)
    val n = w * h
    val yP = new Array[Double](n)
    val cbP = new Array[Double](n)
    val crP = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = img.pixels(3 * i) & 0xff
      val g = img.pixels(3 * i + 1) & 0xff
      val b = img.pixels(3 * i + 2) & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      cbP(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      crP(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def m(a: Int, b: Int): Unit = { out.write(a); out.write(b) }
    def u16(x: Int): Unit = { out.write((x >> 8) & 0xff); out.write(x & 0xff) }
    m(0xff, 0xd8) // SOI
    // DQT ×2 (values in zigzag order, 8-bit precision)
    for ((tq, tab) <- Seq(0 -> qY, 1 -> qC)) {
      m(0xff, 0xdb); u16(67); out.write(tq)
      var k = 0
      while (k < 64) { out.write(tab(Zig(k))); k += 1 }
    }
    // SOF0: 8-bit, 3 components, 1×1 sampling each (4:4:4)
    m(0xff, 0xc0); u16(17); out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y → qtab 0
    out.write(2); out.write(0x11); out.write(1) // Cb → qtab 1
    out.write(3); out.write(0x11); out.write(1) // Cr → qtab 1
    // DHT ×4
    for ((cls, id, bits, vals) <- Seq(
        (0, 0, DcLumBits, DcLumVals), (1, 0, AcLumBits, AcLumVals),
        (0, 1, DcChromBits, DcChromVals), (1, 1, AcChromBits, AcChromVals))) {
      m(0xff, 0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((cls << 4) | id)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      out.write(vals, 0, vals.length)
    }
    // SOS
    m(0xff, 0xda); u16(12); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val dcL = encTable(DcLumBits, DcLumVals)
    val acL = encTable(AcLumBits, AcLumVals)
    val dcC = encTable(DcChromBits, DcChromVals)
    val acC = encTable(AcChromBits, AcChromVals)
    val bw = new BitWriter(out)
    var predY = 0; var predCb = 0; var predCr = 0
    var my = 0
    while (my < (h + 7) / 8) {
      var mx = 0
      while (mx < (w + 7) / 8) {
        predY = encodeBlock(bw, yP, w, h, mx * 8, my * 8, qY, dcL, acL, predY)
        predCb = encodeBlock(bw, cbP, w, h, mx * 8, my * 8, qC, dcC, acC, predCb)
        predCr = encodeBlock(bw, crP, w, h, mx * 8, my * 8, qC, dcC, acC, predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    m(0xff, 0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------

  private final class DecTable(bits: Array[Int], vals: Array[Byte]) {
    // canonical decode arrays (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var hitMarker: Int = -1 // marker byte seen in the stream (RSTn/EOI)
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= bytes.length) throw new RuntimeException("eof")
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          val nx = if (pos + 1 < bytes.length) bytes(pos + 1) & 0xff else -1
          if (nx == 0) pos += 2 // stuffed data byte
          else { hitMarker = nx; throw new RuntimeException("marker") }
        } else pos += 1
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def readBits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Align to a byte boundary and consume an expected RSTn marker. */
    def restart(): Boolean = {
      n = 0
      if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
        val mk = bytes(pos + 1) & 0xff
        if (mk >= 0xd0 && mk <= 0xd7) { pos += 2; return true }
      }
      false
    }
  }

  private def decodeHuff(br: BitReader, t: DecTable): Int = {
    var code = br.readBit()
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
        return t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
      code = (code << 1) | br.readBit()
      l += 1
    }
    throw new RuntimeException("bad huffman code")
  }

  private def extend(bits: Int, size: Int): Int =
    if (size == 0) 0
    else if (bits < (1 << (size - 1))) bits - (1 << size) + 1
    else bits

  private final case class Comp(id: Int, hS: Int, vS: Int, tq: Int,
                                var td: Int = 0, var ta: Int = 0)

  /** Decode a baseline JPEG into RGB pixels (grayscale replicates Y).
    * Any malformed, truncated, progressive, or oversized stream → None. */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] = try {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return None
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[DecTable](4)
    val acTabs = new Array[DecTable](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (pos + 4 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      val mk = bytes(pos + 1) & 0xff
      if (mk == 0xd9) return None // EOI before any scan data
      else if (mk == 0xd8 || mk == 0x01 ||
        (mk >= 0xd0 && mk <= 0xd7)) { pos += 2 } // parameterless markers
      else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        val body = pos + 4
        if (len < 2 || body + len - 2 > bytes.length) return None
        mk match {
          case 0xdb => // DQT (possibly several tables per segment)
            var i = body
            while (i < body + len - 2) {
              val pq = (bytes(i) & 0xff) >> 4
              val tq = bytes(i) & 0x0f
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(Zig(k)) = bytes(i + 1 + k) & 0xff; k += 1
              }
              qtabs(tq) = tab
              i += 65
            }
          case 0xc4 => // DHT (possibly several tables per segment)
            var i = body
            while (i < body + len - 2) {
              val cls = (bytes(i) & 0xff) >> 4
              val id = bytes(i) & 0x0f
              if (cls > 1 || id > 3) return None
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) {
                bits(l) = bytes(i + l) & 0xff; total += bits(l); l += 1
              }
              if (total > 256 || i + 17 + total > body + len - 2)
                return None
              val vals = java.util.Arrays.copyOfRange(bytes, i + 17,
                i + 17 + total)
              val t = new DecTable(bits, vals)
              if (cls == 0) dcTabs(id) = t else acTabs(id) = t
              i += 17 + total
            }
          case 0xc0 => // SOF0 baseline
            if ((bytes(body) & 0xff) != 8) return None
            h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
            w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
            val nc = bytes(body + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h > (1L << 26)) return None // decompression bomb
            comps = Array.tabulate(nc) { c =>
              val o = body + 6 + 3 * c
              val hv = bytes(o + 1) & 0xff
              Comp(bytes(o) & 0xff, hv >> 4, hv & 0x0f,
                bytes(o + 2) & 0xff)
            }
            if (comps.exists(c => c.hS < 1 || c.hS > 4 || c.vS < 1 ||
              c.vS > 4 || c.tq > 3)) return None
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            return None // only baseline sequential Huffman
          case 0xdd => // DRI
            restartInterval =
              ((bytes(body) & 0xff) << 8) | (bytes(body + 1) & 0xff)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = bytes(body) & 0xff
            if (ns != comps.length) return None
            var c = 0
            while (c < ns) {
              val cid = bytes(body + 1 + 2 * c) & 0xff
              val tt = bytes(body + 2 + 2 * c) & 0xff
              comps.find(_.id == cid) match {
                case Some(comp) => comp.td = tt >> 4; comp.ta = tt & 0x0f
                case None       => return None
              }
              c += 1
            }
            sosAt = body + 1 + 2 * ns + 3 // skip Ss/Se/AhAl
          case _ => // APPn / COM / DNL / …: skip
        }
        if (sosAt < 0) pos = body + len - 2
      }
    }
    val hMax = comps.map(_.hS).max
    val vMax = comps.map(_.vS).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component padded planes (whole blocks)
    val planeW = comps.map(c => mcusX * c.hS * 8)
    val planeH = comps.map(c => mcusY * c.vS * 8)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray
    if (comps.exists(c => qtabs(c.tq) == null || dcTabs(c.td) == null ||
      acTabs(c.ta) == null)) return None
    val br = new BitReader(bytes, sosAt)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val pix = new Array[Double](64)
    val idctTmp = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qtabs(c.tq)
        var by = 0
        while (by < c.vS) {
          var bx = 0
          while (bx < c.hS) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val dsz = decodeHuff(br, dcTabs(c.td))
            if (dsz > 11) return None
            preds(ci) += extend(br.readBits(dsz), dsz)
            coef(0) = preds(ci) * q(0)
            // AC
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = decodeHuff(br, acTabs(c.ta))
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 else done = true // ZRL / EOB
              } else {
                k += r
                if (k > 63) return None
                val nat = Zig(k)
                coef(nat) = extend(br.readBits(s), s) * q(nat)
                k += 1
              }
            }
            // separable IDCT (rows then columns; +1e-9 tie-bias at the
            // final rounding, see scaladoc)
            var x = 0
            while (x < 8) {
              var v = 0
              while (v < 8) {
                var s2 = 0.0
                var u = 0
                while (u < 8) {
                  val cu = if (u == 0) InvSqrt2 else 1.0
                  s2 += cu * coef(v * 8 + u) * Cos(x)(u)
                  u += 1
                }
                idctTmp(v * 8 + x) = s2 // g(x, v)
                v += 1
              }
              x += 1
            }
            var y = 0
            while (y < 8) {
              var x2 = 0
              while (x2 < 8) {
                var s2 = 0.0
                var v = 0
                while (v < 8) {
                  val cv = if (v == 0) InvSqrt2 else 1.0
                  s2 += cv * idctTmp(v * 8 + x2) * Cos(y)(v)
                  v += 1
                }
                pix(y * 8 + x2) = 0.25 * s2
                x2 += 1
              }
              y += 1
            }
            val ox = (mx * c.hS + bx) * 8
            val oy = (my * c.vS + by) * 8
            val pw = planeW(ci)
            y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val v0 = math.floor(pix(y * 8 + x) + 128.0 + 0.5 + 1e-9)
                planes(ci)((oy + y) * pw + (ox + x)) =
                  math.max(0, math.min(255, v0.toInt))
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // upsample + color convert
    val outPix = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = 3 * (y * w + x)
        if (comps.length == 1) {
          val g = planes(0)(y * planeW(0) + x).toByte
          outPix(o) = g; outPix(o + 1) = g; outPix(o + 2) = g
        } else {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.hS / hMax
            val sy = y * c.vS / vMax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def cl(d: Double): Byte =
            math.max(0, math.min(255,
              math.floor(d + 0.5 + 1e-9).toInt)).toByte
          outPix(o) = cl(yy + 1.402 * cr)
          outPix(o + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
          outPix(o + 2) = cl(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some(Ppm.Image(w, h, outPix))
  } catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException => None }
}
