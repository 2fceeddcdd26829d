package graft

/** Shared reference model for [[graft.expressions.SimHash64]]: split on
  * single spaces with empty tokens kept; four seeded per-token rolling
  * polynomial hashes (seed s prepends the character `'0'+s`); ±1 sign
  * sums per bit, 16 bits per seed packed into bits 16s..16s+15. Both the
  * unit spec and the ScalaCheck property validate the expression against
  * THIS one model so the convention can't drift between suites. */
object SimHashModel {

  def poly(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 1000000007L)

  def simhash(t: String): Long = {
    val cnt = new Array[Int](64)
    t.split(" ", -1).foreach { w =>
      (0 until 4).foreach { s =>
        val h = poly(('0' + s).toChar.toString + w)
        (0 until 16).foreach(k =>
          cnt(s * 16 + k) += (((h >> k) & 1L) * 2 - 1).toInt)
      }
    }
    // distinct bit positions, so the sum IS the two's-complement pack
    // even when bit 63 (the sign bit) is set
    (0 until 64).filter(cnt(_) > 0).map(1L << _).sum
  }

  /** The seed-'0' 16-bit slice — x28's cluster signature
    * (`Dedup.ClusterSigMask`). Equals bits 0..15 of [[simhash]] by the
    * seeding construction; the clusters spec asserts that identity. */
  def simhash16(t: String): Long = simhash(t) & 0xffffL
}
