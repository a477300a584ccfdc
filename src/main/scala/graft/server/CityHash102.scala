package graft.server

/** CityHash v1.0.2 — 128-bit variant — transcribed from Google's public
  * `city.cc` (MIT, 2011). This EXACT legacy version (not 1.1+) is what the
  * ClickHouse native protocol's compressed-frame checksums use — the
  * reference's clickhouse front door gets it via the clickhouse-srv crate's
  * vendored copy (reference `Cargo.lock`: clickhouse-rs-cityhash-sys);
  * here it is restated over JVM longs.
  *
  * Two translation hazards and how they're handled:
  *   - all C arithmetic is uint64: `*`/`+`/`^` match Scala `Long` exactly
  *     (mod 2^64); every C `>>` here is logical, so Scala `>>>` throughout;
  *   - `Fetch64`/`Fetch32` are little-endian unaligned loads; `Fetch32`
  *     zero-extends (mask to 0xffffffffL).
  *
  * Offline parity caveat: with zero egress there is no trusted third-party
  * vector source in this sandbox; CityHashParitySpec pins this port against
  * an independently written C++ twin (`dev/city102.cc`, native uint64
  * semantics, compiled at test-prep time) across sizes covering every
  * branch (0..16, 17..127 CityMurmur, >=128 long loop + all four tail
  * chunks), which eliminates JVM-translation error as a failure class. */
object CityHash102 {
  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L
  private val kMul = 0x9ddfea08eb382d69L

  private def fetch64(s: Array[Byte], i: Int): Long =
    (s(i) & 0xffL) |
      (s(i + 1) & 0xffL) << 8 |
      (s(i + 2) & 0xffL) << 16 |
      (s(i + 3) & 0xffL) << 24 |
      (s(i + 4) & 0xffL) << 32 |
      (s(i + 5) & 0xffL) << 40 |
      (s(i + 6) & 0xffL) << 48 |
      (s(i + 7) & 0xffL) << 56

  private def fetch32(s: Array[Byte], i: Int): Long =
    (s(i) & 0xffL) |
      (s(i + 1) & 0xffL) << 8 |
      (s(i + 2) & 0xffL) << 16 |
      (s(i + 3) & 0xffL) << 24

  private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))

  // city.cc's RotateByAtLeast1: no shift==0 guard (callers guarantee >=1)
  private def rotateByAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))

  private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Hash128to64 (city.h): the Murmur-inspired 128→64 fold. */
  private def hash128to64(lo: Long, hi: Long): Long = {
    var a = (lo ^ hi) * kMul
    a ^= (a >>> 47)
    var b = (hi ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long =
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, rotateByAtLeast1(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xffL
      val b = s(off + (len >> 1)) & 0xffL
      val c = s(off + len - 1) & 0xffL
      val y = a + (b << 8) // uint32 in C; fits untruncated
      val z = len + (c << 2)
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2

  /** WeakHashLen32WithSeeds — returns (a, b) packed as a tuple. */
  private def weakHash(w: Long, x: Long, y: Long, z: Long,
      a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  private def weakHash(s: Array[Byte], off: Int, a: Long, b: Long): (Long, Long) =
    weakHash(fetch64(s, off), fetch64(s, off + 8), fetch64(s, off + 16),
      fetch64(s, off + 24), a, b)

  /** CityMurmur — the <128-byte path of CityHash128WithSeed. */
  private def cityMurmur(s: Array[Byte], off: Int, len: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    var l = len - 16
    if (l <= 0) { // len <= 16
      a = shiftMix(a * k1) * k1
      c = b * k1 + hashLen0to16(s, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(s, off) else c))
    } else { // len > 16
      c = hashLen16(fetch64(s, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(s, off + len - 16))
      a += d
      var p = off
      while (l > 0) {
        a ^= shiftMix(fetch64(s, p) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(s, p + 8) * k1) * k1
        c *= k1
        d ^= c
        p += 16
        l -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  /** CityHash128WithSeed, v1.0.2 layout (the 1.1 rewrite changed the tail
    * loop and seeds — do NOT "upgrade"; ClickHouse pins 1.0.2). */
  def cityHash128WithSeed(s: Array[Byte], off0: Int, len0: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(s, off0, len0, seedLo, seedHi)
    // 56 bytes of state: v, w, x, y, z
    var off = off0
    var len = len0
    var x = seedLo
    var y = seedHi
    var z = len.toLong * k1
    var vf = rotate(y ^ k1, 49) * k1 + fetch64(s, off)
    var vs = rotate(vf, 42) * k1 + fetch64(s, off + 8)
    var wf = rotate(y + z, 35) * k1 + x
    var ws = rotate(x + fetch64(s, off + 88), 53) * k1

    // CityHash64's inner loop, manually unrolled twice per 128 bytes
    var continue = true
    while (continue) {
      var round = 0
      while (round < 2) {
        x = rotate(x + y + vf + fetch64(s, off + 16), 37) * k1
        y = rotate(y + vs + fetch64(s, off + 48), 42) * k1
        x ^= ws
        y ^= vf
        z = rotate(z ^ wf, 33)
        val v = weakHash(s, off, vs * k1, x + wf)
        vf = v._1; vs = v._2
        val w = weakHash(s, off + 32, z + ws, y)
        wf = w._1; ws = w._2
        val t = z; z = x; x = t
        off += 64
        round += 1
      }
      len -= 128
      continue = len >= 128
    }
    y += rotate(wf, 37) * k0 + z
    x += rotate(vf + z, 49) * k0
    // 0 < len < 128: up to 4 chunks of 32 bytes from the END of the input
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * k0 + vs
      wf += fetch64(s, off + len - tailDone + 16)
      x = rotate(x, 49) * k0 + wf
      wf += vf
      val v = weakHash(s, off + len - tailDone, vf, vs)
      vf = v._1; vs = v._2
    }
    x = hashLen16(x, vf)
    y = hashLen16(y, wf)
    (hashLen16(x + vs, ws) + y, hashLen16(x + ws, y + vs))
  }

  /** CityHash128, v1.0.2 dispatch (three branches — 1.1 collapsed them).
    * Returns (low64, high64); the protocol writes low first, LE. */
  def cityHash128(s: Array[Byte], off: Int, len: Int): (Long, Long) =
    if (len >= 16)
      cityHash128WithSeed(s, off + 16, len - 16,
        fetch64(s, off) ^ k3, fetch64(s, off + 8))
    else if (len >= 8)
      cityHash128WithSeed(Array.emptyByteArray, 0, 0,
        fetch64(s, off) ^ (len.toLong * k0), fetch64(s, off + len - 8) ^ k1)
    else
      cityHash128WithSeed(s, off, len, k0, k1)
}
