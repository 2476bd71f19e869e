package graft.operators

/** AV1 multi-symbol arithmetic (daala-EC) decoder, per the public AV1
  * bitstream spec §8.2 (init_symbol / decode_symbol / CDF update).
  * Mirrors the reference semantics bit-exactly: a 15-bit probability
  * window kept in COMPLEMENT form so bits past the buffer end read as
  * implicit padding, EC_PROB_SHIFT=6 scaling, an EC_MIN_PROB=4 floor
  * per remaining symbol, and the 4+(count>>4)+(N>3) adaptation rate.
  * CDFs use the inverse representation of [[Av1Tables]] (icdf(k) =
  * 32768 - cum(k), terminal 0, trailing adaptation counter).
  *
  * Validated against libdav1d golden decodes in Av1DecoderSpec — any
  * deviation in the renormalization or update rule diverges within a
  * handful of symbols on the fixture streams.
  */
final class Av1Msac(data: Array[Byte], start: Int, end: Int, val allowUpdate: Boolean) {

  private var pos = start
  private var value = 0 // complemented 15+ bit window, < 2^16 after renorm
  private var range = 1 << 15
  private var maxBits = 8 * (end - start) - 15

  // dev-trace visibility into the coder state (read-only)
  def debugRange: Int = range
  def debugValue: Int = value

  // init_symbol: read the first 15 bits (or fewer when the tile is tiny)
  {
    val numBits = math.min((end - start) * 8, 15)
    var buf = 0
    var got = 0
    while (got < numBits) {
      buf = (buf << 8) | (data(pos) & 0xff)
      pos += 1
      got += 8
    }
    buf = buf >>> (got - numBits)
    val padded = buf << (15 - numBits)
    value = ((1 << 15) - 1) ^ padded
  }

  @inline private def readBitsRaw(n: Int): Int = {
    // f(n) continuation of the byte stream after the initial 15 bits:
    // the stream is consumed MSB-first; track via absolute bit offset.
    var v = 0
    var i = 0
    while (i < n) {
      val bitIndex = 15 + consumedExtra + i
      val byteAt = start + (bitIndex >> 3)
      val bit =
        if (byteAt < end) (data(byteAt) >> (7 - (bitIndex & 7))) & 1
        else 0
      v = (v << 1) | bit
      i += 1
    }
    consumedExtra += n
    v
  }
  private var consumedExtra = 0

  /** Decode one symbol from an n-symbol CDF row (stride >= n+1; row(n)
    * is the adaptation counter). Returns the symbol in [0, n). */
  def decodeSymbol(cdf: Array[Int], off: Int, n: Int): Int = {
    var cur = range
    var symbol = -1
    var prev = 0
    do {
      symbol += 1
      prev = cur
      val f = if (symbol == n - 1) 0 else cdf(off + symbol)
      cur = ((range >> 8) * (f >> 6)) >> 1
      cur += 4 * (n - 1 - symbol)
    } while (value < cur)
    range = prev - cur
    value -= cur
    renorm()
    if (allowUpdate) {
      val count = cdf(off + n)
      val rate = 4 + (count >> 4) + (if (n > 3) 1 else 0)
      var i = 0
      while (i < symbol) { cdf(off + i) += (32768 - cdf(off + i)) >> rate; i += 1 }
      while (i < n - 1) { cdf(off + i) -= cdf(off + i) >> rate; i += 1 }
      cdf(off + n) = count + (if (count < 32) 1 else 0)
    }
    symbol
  }

  def decodeSymbol(cdf: Array[Int], n: Int): Int = decodeSymbol(cdf, 0, n)

  @inline private def renorm(): Unit = {
    // bits = 15 - FloorLog2(range); range in [4, 2^15)
    var bits = 0
    var r = range
    while (r < (1 << 15)) { r <<= 1; bits += 1 }
    if (bits > 0) {
      range = r
      val numBits = math.min(bits, math.max(0, maxBits))
      val newData = readBitsRaw(numBits) << (bits - numBits)
      maxBits -= bits
      value = newData ^ (((value + 1) << bits) - 1)
    }
  }

  /** Equiprobable raw bit: decodeSymbol over the fixed {16384} CDF
    * with no adaptation, returning the decoded symbol. */
  def readBit(): Int = {
    val cur = ((range >> 8) << 7) + 4
    if (value < cur) { // advanced past symbol 0 → symbol 1
      range = cur
      renorm()
      1
    } else {
      value -= cur
      range -= cur
      renorm()
      0
    }
  }

  /** L(n): n equiprobable bits, MSB first. */
  def readLiteral(n: Int): Int = {
    var x = 0
    var i = 0
    while (i < n) { x = (x << 1) | readBit(); i += 1 }
    x
  }

  /** The coefficient-tail Exp-Golomb read (spec read_golomb). */
  /** spec 4.10.7 ns(n): non-symmetric uniform-ish literal over [0, n). */
  def readNS(n: Int): Int = {
    val w = 32 - Integer.numberOfLeadingZeros(n) // FloorLog2(n) + 1
    val m = (1 << w) - n
    val v = if (w - 1 > 0) readLiteral(w - 1) else 0
    if (v < m) v
    else {
      val extra = readBit()
      (v << 1) - m + extra
    }
  }

  def readGolomb(): Int = {
    var numLeadingZeros = 0
    while (numLeadingZeros < 32 && readBit() == 0) numLeadingZeros += 1
    require(numLeadingZeros < 32, "av1: runaway golomb")
    (1 << numLeadingZeros) - 1 + readLiteral(numLeadingZeros)
  }
}
