package graft.operators

/** PDQ perceptual hashing from PIXELS — the reference's whole domain is
  * PDQ hashes of media (`cir_duplicate_detector/pdq_hash.py:1-20`) yet
  * both the reference and the published baseline only *consume*
  * precomputed hex hashes. This kernel closes that gap: it computes the
  * 256-bit hash from decoded pixel data with the PDQ structure
  * (Facebook ThreatExchange, "The TMK+PDQF video-hashing and PDQ
  * image-hashing algorithms"):
  *
  *   RGB → luminance → 64×64 box downsample → 16×16 DCT-II (the 16
  *   lowest non-DC frequencies per axis) → median threshold → 256 bits
  *   (+ a gradient-based quality score).
  *
  * Deliberate deviation from the published PDQ reference
  * implementation: every stage is FIXED-POINT INTEGER arithmetic, not
  * floating point — Rec.601 luma in parts-per-1000, box downsample as
  * an exact scaled integer mean, the DCT basis as a Q14 integer cosine
  * table (`StrictMath.cos`, bit-exact across JVMs), rank-based median.
  * That makes the hash deterministic across engines, so the DuckDB
  * correctness gate replays the ENTIRE pipeline in SQL (the Q14 table
  * is interpolated into the oracle text from [[dctTable]] — identical
  * by construction, see [[tabSqlValues]]). Published float-PDQ test
  * vectors therefore do NOT apply bit-for-bit; the cross-engine SQL
  * replay is the parity evidence instead (SURVEY §2.12 documents the
  * choice). Bit layout: bit p = i*16+j (i = vertical frequency), hex
  * digit c = bits 4c..4c+3 MSB-first.
  *
  * Scale bounds (all fit in signed 64-bit): downsampled cell v =
  * sum(luma)*256/count ≤ 65280 (17 bits); Q14 coefficient |c| ≤ 2^14;
  * first DCT pass |Σ₆₄ c·v| ≤ 2^36.4; second pass |Σ₆₄ c·s| ≤ 2^56.8.
  */
object PdqHash {

  /** Output cells per axis of the downsample stage. */
  val D = 64
  /** Output frequencies per axis of the DCT stage (D/4). */
  val F = 16
  /** Fixed-point scale of the DCT basis table (Q14). */
  val Q = 16384L
  /** Downsample mean is scaled by this before the integer divide. */
  val MeanScale = 256L
  /** Gradient-sum divisor for the 0..100 quality score — calibrated so
    * textured synthetic scenes land mid-range (~45..90) instead of
    * clamping, while flat images still score 0. */
  val QualityDiv = 500000L

  /** Q14 DCT-II basis, frequencies 1..F (DC excluded, as PDQ does):
    * tab(i)(k) = round(cos(π·(2k+1)·(i+1)/(2·D)) · 2^14). StrictMath
    * (fdlibm) so the table is identical on every JVM. */
  val dctTable: Array[Array[Long]] = Array.tabulate(F, D) { (i, k) =>
    StrictMath.rint(StrictMath.cos(StrictMath.PI * (2 * k + 1) * (i + 1) / (2.0 * D)) * Q).toLong
  }

  /** The table as a DuckDB VALUES list `(i, k, c)` — interpolated into
    * oracle SQL so both engines share one set of constants. */
  def tabSqlValues: String = {
    val rows = for (i <- 0 until F; k <- 0 until D) yield s"($i,$k,${dctTable(i)(k)})"
    rows.mkString(",")
  }

  /** Integer Rec.601 luma of a packed 0xRRGGBB pixel: (299r+587g+114b)/1000
    * (floor; coefficients sum to 1000 so gray maps to itself). */
  @inline def luma(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  /** Exact box downsample of a w×h luma plane to D×D: source pixel
    * (x, y) belongs to cell (x·D/w, y·D/h) (floor — partitions the
    * plane into D non-empty windows per axis whenever w,h ≥ D); cell
    * value = sum·[[MeanScale]]/count (floor). Requires w,h ≥ D. */
  def downsample(w: Int, h: Int, lum: Array[Long]): Array[Long] = {
    require(w >= D && h >= D, s"downsample needs both dims >= $D, got ${w}x$h")
    val sum = new Array[Long](D * D)
    val cnt = new Array[Long](D * D)
    var y = 0
    while (y < h) {
      val cy = y * D / h
      var x = 0
      while (x < w) {
        val cell = cy * D + x * D / w
        sum(cell) += lum(y * w + x)
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(D * D)(c => sum(c) * MeanScale / cnt(c))
  }

  /** Two-pass separable DCT: out = T · cells · Tᵀ, all Long. Row-major
    * F×F result, out(i·F+j) = Σ_ky Σ_kx T(i,ky)·T(j,kx)·cells(ky·D+kx). */
  def dct(cells: Array[Long]): Array[Long] = {
    val inter = new Array[Long](F * D) // inter(i, kx) = Σ_ky T(i,ky)·cells(ky,kx)
    var i = 0
    while (i < F) {
      val t = dctTable(i)
      var kx = 0
      while (kx < D) {
        var s = 0L
        var ky = 0
        while (ky < D) { s += t(ky) * cells(ky * D + kx); ky += 1 }
        inter(i * D + kx) = s
        kx += 1
      }
      i += 1
    }
    val out = new Array[Long](F * F)
    i = 0
    while (i < F) {
      var j = 0
      while (j < F) {
        val t = dctTable(j)
        var s = 0L
        var kx = 0
        while (kx < D) { s += t(kx) * inter(i * D + kx); kx += 1 }
        out(i * F + j) = s
        j += 1
      }
      i += 1
    }
    out
  }

  /** Rank-based median threshold: the 128th-smallest coefficient
    * (sorted index 127 — the lower middle of 256). Bit p set iff
    * out(p) > threshold, so ties land on 0 and at most 128 bits set. */
  def bits(out: Array[Long]): Array[Int] = {
    val sorted = out.clone(); java.util.Arrays.sort(sorted)
    val thr = sorted(F * F / 2 - 1)
    out.map(o => if (o > thr) 1 else 0)
  }

  /** 64-hex-char rendering: digit c = bits 4c..4c+3, MSB-first. */
  def hex(bits: Array[Int]): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = 0
    while (c < 64) {
      val n = (bits(4 * c) << 3) | (bits(4 * c + 1) << 2) | (bits(4 * c + 2) << 1) | bits(4 * c + 3)
      sb.append(java.lang.Character.forDigit(n, 16))
      c += 1
    }
    sb.toString
  }

  /** Gradient "quality" in 0..100 (PDQ reports how much signal survived
    * the downsample): Σ|horizontal deltas| + Σ|vertical deltas| over the
    * D×D plane, scaled by [[QualityDiv]], clamped. A flat image scores
    * 0; a texture-rich one saturates at 100. */
  def quality(cells: Array[Long]): Long = {
    var g = 0L
    var y = 0
    while (y < D) {
      var x = 0
      while (x < D) {
        if (x + 1 < D) g += math.abs(cells(y * D + x + 1) - cells(y * D + x))
        if (y + 1 < D) g += math.abs(cells((y + 1) * D + x) - cells(y * D + x))
        x += 1
      }
      y += 1
    }
    math.min(100L, g / QualityDiv)
  }

  /** Full pipeline: packed-RGB pixels → (64-hex hash, quality). */
  def hashImage(w: Int, h: Int, rgb: Array[Int]): (String, Long) = {
    require(rgb.length == w * h, s"expected ${w * h} pixels, got ${rgb.length}")
    val lum = new Array[Long](rgb.length)
    var p = 0
    while (p < rgb.length) { lum(p) = luma(rgb(p)); p += 1 }
    val cells = downsample(w, h, lum)
    (hex(bits(dct(cells))), quality(cells))
  }

  /** Audio fingerprint sharing the image kernel: mono PCM samples →
    * exact integer box-resample to 4096 points → reshape to a 64×64
    * plane (row = coarse-time window, column = position within the
    * window) → the same Q14 DCT + rank-median threshold → 256 bits.
    * Row frequencies then capture cross-window modulation (rhythm),
    * column frequencies intra-window structure (pitch-ish) — a crude
    * but real modulation-spectrum fingerprint, and because every step
    * is the image pipeline's integer arithmetic, the DuckDB oracle
    * replays it through the SAME SQL chain (samples offset to the
    * unsigned domain and quantized to the 8-bit "loudness luma" the
    * chain's scale bounds assume). Needs ≥ 4096 samples (256 ms at
    * 16 kHz) so every resample bucket is non-empty. */
  def fingerprintSamples(samples: Array[Int]): (String, Long) = {
    val n = samples.length
    require(n >= D * D, s"fingerprint needs >= ${D * D} samples, got $n")
    val sum = new Array[Long](D * D)
    val cnt = new Array[Long](D * D)
    var t = 0
    while (t < n) {
      val b = (t.toLong * (D * D) / n).toInt
      sum(b) += samples(t).toLong + 32768L
      cnt(b) += 1
      t += 1
    }
    // 8-bit quantized bucket mean, then the chain's MeanScale — the
    // identity-downsample form of the image path's cell values
    val cells = Array.tabulate(D * D)(b => sum(b) / cnt(b) / 256L * MeanScale)
    (hex(bits(dct(cells))), quality(cells))
  }

  /** Dihedral variant names, index-aligned with [[transformCells]]:
    * the 8 symmetries of the square (PDQ's dihedral matching tier —
    * a mirrored or rotated repost must still match the original). */
  val DihedralNames: Vector[String] =
    Vector("orig", "flipx", "flipy", "rot180", "transpose", "rot90", "rot270", "antitranspose")

  /** Apply dihedral symmetry `v` to a D×D cell plane: old cell (r, c)
    * lands at — orig (r,c); flipx (r, D-1-c); flipy (D-1-r, c);
    * rot180 (D-1-r, D-1-c); transpose (c, r); rot90 CW (c, D-1-r);
    * rot270 (D-1-c, r); antitranspose (D-1-c, D-1-r). */
  def transformCells(cells: Array[Long], v: Int): Array[Long] = {
    val out = new Array[Long](D * D)
    var r = 0
    while (r < D) {
      var c = 0
      while (c < D) {
        val (nr, nc) = v match {
          case 0 => (r, c)
          case 1 => (r, D - 1 - c)
          case 2 => (D - 1 - r, c)
          case 3 => (D - 1 - r, D - 1 - c)
          case 4 => (c, r)
          case 5 => (c, D - 1 - r)
          case 6 => (D - 1 - c, r)
          case 7 => (D - 1 - c, D - 1 - r)
        }
        out(nr * D + nc) = cells(r * D + c)
        c += 1
      }
      r += 1
    }
    out
  }

  /** All 8 dihedral hashes from ONE decode + downsample: the flips /
    * rotations act on the 64×64 cell plane (exactly equal to
    * transforming the source pixels whenever both dims divide
    * [[D]] evenly, and the PDQ-style approximation otherwise), then
    * each variant re-runs the integer DCT + its own median threshold.
    * Because the Q14 table and rint are odd-symmetric
    * (tab(i)(D−1−k) = (−1)^(i+1)·tab(i)(k) exactly), the cell-plane
    * transform is mathematically identical to sign-flipping /
    * transposing the DCT outputs — this implementation just reuses the
    * one kernel. Quality is dihedral-invariant (same |Δ| multiset) and
    * returned once. */
  def dihedralHashes(w: Int, h: Int, rgb: Array[Int]): (Seq[(String, String)], Long) = {
    require(rgb.length == w * h, s"expected ${w * h} pixels, got ${rgb.length}")
    val lum = new Array[Long](rgb.length)
    var p = 0
    while (p < rgb.length) { lum(p) = luma(rgb(p)); p += 1 }
    val cells = downsample(w, h, lum)
    val hashes = (0 until 8).map(v => DihedralNames(v) -> hex(bits(dct(transformCells(cells, v)))))
    (hashes, quality(cells))
  }
}
