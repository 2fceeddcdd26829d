package graft.sinks

/** CityHash v1.0.2, 128-bit — the checksum algorithm of the ClickHouse
  * native protocol's compressed-block framing.
  *
  * ClickHouse pins this EXACT historical version (its tree vendors it as
  * `contrib/cityhash102`; the checksum of every compressed frame on the
  * native wire is `CityHash_v1_0_2::CityHash128` of the 9-byte frame
  * header + compressed payload). Later CityHash releases (≥1.1) changed
  * the algorithm, so a current library implementation would NOT
  * interoperate — hence this transcription of the published v1.0.2
  * algorithm (Google cityhash, MIT licensed; the reference's driver,
  * clickhouse-go v2, carries the same port for the same reason —
  * `connection/connection.go:58-60` enables the LZ4 framing this
  * checksums).
  *
  * All arithmetic is unsigned-modular 64-bit, which JVM `Long` ops
  * already are; only shifts need care (`>>>` everywhere the C code
  * right-shifts a uint64).
  */
object CityHash102 {
  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL
  private final val K3 = 0xc949d7c7509e6557L
  private final val KMul = 0x9ddfea08eb382d69L

  /** 128-bit hash of `b[off, off+len)` as (low64, high64). */
  def cityHash128(b: Array[Byte], off: Int, len: Int): (Long, Long) =
    if (len >= 16)
      hash128WithSeed(b, off + 16, len - 16,
        fetch64(b, off) ^ K3, fetch64(b, off + 8))
    else if (len >= 8)
      hash128WithSeed(b, 0, 0,
        fetch64(b, off) ^ (len.toLong * K0),
        fetch64(b, off + len - 8) ^ K1)
    else
      hash128WithSeed(b, off, len, K0, K1)

  private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))

  // shift is in [1, 63] at every call site (len ≤ 16 guards it)
  private def rotateByAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))

  private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Hash128to64 — the 16-byte → 8-byte Murmur-inspired mix. */
  private def hashLen16(u: Long, v: Long): Long = {
    var a = (u ^ v) * KMul
    a ^= (a >>> 47)
    var b = (v ^ a) * KMul
    b ^= (b >>> 47)
    b * KMul
  }

  private def hashLen0to16(b: Array[Byte], off: Int, len: Int): Long =
    if (len > 8) {
      val a = fetch64(b, off)
      val z = fetch64(b, off + len - 8)
      hashLen16(a, rotateByAtLeast1(z + len, len)) ^ z
    } else if (len >= 4) {
      val a = fetch32(b, off)
      hashLen16(len + (a << 3), fetch32(b, off + len - 4))
    } else if (len > 0) {
      val a = b(off) & 0xffL
      val mid = b(off + (len >> 1)) & 0xffL
      val last = b(off + len - 1) & 0xffL
      val y = a + (mid << 8)
      val z = len.toLong + (last << 2)
      shiftMix(y * K2 ^ z * K3) * K2
    } else K2

  /** WeakHashLen32WithSeeds over 32 bytes at `off` with seeds (a, b). */
  private def weakHash32(bts: Array[Byte], off: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(bts, off)
    val x = fetch64(bts, off + 8)
    val y = fetch64(bts, off + 16)
    val z = fetch64(bts, off + 24)
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  /** CityMurmur — the < 128-byte path of CityHash128WithSeed. */
  private def cityMurmur(bts: Array[Byte], off: Int, len: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    var l = len - 16
    if (l <= 0) { // len <= 16
      a = shiftMix(a * K1) * K1
      c = b * K1 + hashLen0to16(bts, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(bts, off) else c))
    } else { // len > 16
      c = hashLen16(fetch64(bts, off + len - 8) + K1, a)
      d = hashLen16(b + len, c + fetch64(bts, off + len - 16))
      a += d
      var s = off
      while (l > 0) {
        a ^= shiftMix(fetch64(bts, s) * K1) * K1
        a *= K1
        b ^= a
        c ^= shiftMix(fetch64(bts, s + 8) * K1) * K1
        c *= K1
        d ^= c
        s += 16
        l -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  private def hash128WithSeed(bts: Array[Byte], off: Int, len0: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(bts, off, len0, seedLo, seedHi)

    // 56 bytes of state: v, w, x, y, z; the same inner loop as
    // CityHash64, manually unrolled twice per 128-byte stride.
    var len = len0
    var s = off
    var x = seedLo
    var y = seedHi
    var z = len.toLong * K1
    var v1 = rotate(y ^ K1, 49) * K1 + fetch64(bts, s)
    var v2 = rotate(v1, 42) * K1 + fetch64(bts, s + 8)
    var w1 = rotate(y + z, 35) * K1 + x
    var w2 = rotate(x + fetch64(bts, s + 88), 53) * K1

    while (len >= 128) {
      var i = 0
      while (i < 2) {
        x = rotate(x + y + v1 + fetch64(bts, s + 16), 37) * K1
        y = rotate(y + v2 + fetch64(bts, s + 48), 42) * K1
        x ^= w2
        y ^= v1
        z = rotate(z ^ w1, 33)
        val v = weakHash32(bts, s, v2 * K1, x + w1)
        val w = weakHash32(bts, s + 32, z + w2, y)
        v1 = v._1; v2 = v._2; w1 = w._1; w2 = w._2
        val t = z; z = x; x = t
        s += 64
        i += 1
      }
      len -= 128
    }

    y += rotate(w1, 37) * K0 + z
    x += rotate(v1 + z, 49) * K0
    // 0 < len < 128: hash up to 4 chunks of 32 bytes from the END.
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * K0 + v2
      w1 += fetch64(bts, s + len - tailDone + 16)
      x = rotate(x, 49) * K0 + w1
      w1 += v1
      val v = weakHash32(bts, s + len - tailDone, v1, v2)
      v1 = v._1; v2 = v._2
    }
    x = hashLen16(x, v1)
    y = hashLen16(y, w1)
    (hashLen16(x + v2, w2) + y, hashLen16(x + w2, y + v2))
  }
}
