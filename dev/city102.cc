// CityHash v1.0.2 (128-bit variant) — independent C++ twin of
// graft/server/CityHash102.scala, transcribed from Google's public city.cc
// (MIT, 2011). Used ONLY to generate the pinned parity vectors in
// src/test/resources/cityhash102_vectors.txt (CityHashParitySpec): native
// uint64 semantics here cross-check the JVM Long translation there.
//
// Regenerate:  g++ -O2 -o /tmp/city102 dev/city102.cc && /tmp/city102
// Output:      one line per length: "<len> <low64> <high64>" (decimal),
//              over a deterministic xorshift-filled buffer.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <utility>

typedef uint64_t uint64;
typedef uint32_t uint32;
typedef uint8_t uint8;
typedef std::pair<uint64, uint64> uint128;

static const uint64 k0 = 0xc3a5c85c97cb3127ULL;
static const uint64 k1 = 0xb492b66fbe98f273ULL;
static const uint64 k2 = 0x9ae16a3b2f90404fULL;
static const uint64 k3 = 0xc949d7c7509e6557ULL;

static uint64 Fetch64(const char *p) {
  uint64 r; memcpy(&r, p, sizeof(r)); return r; // little-endian host
}
static uint32 Fetch32(const char *p) {
  uint32 r; memcpy(&r, p, sizeof(r)); return r;
}
static uint64 Rotate(uint64 val, int shift) {
  return shift == 0 ? val : ((val >> shift) | (val << (64 - shift)));
}
static uint64 RotateByAtLeast1(uint64 val, int shift) {
  return (val >> shift) | (val << (64 - shift));
}
static uint64 ShiftMix(uint64 val) { return val ^ (val >> 47); }

static uint64 Hash128to64(const uint128 &x) {
  const uint64 kMul = 0x9ddfea08eb382d69ULL;
  uint64 a = (x.first ^ x.second) * kMul;
  a ^= (a >> 47);
  uint64 b = (x.second ^ a) * kMul;
  b ^= (b >> 47);
  b *= kMul;
  return b;
}
static uint64 HashLen16(uint64 u, uint64 v) {
  return Hash128to64(uint128(u, v));
}

static uint64 HashLen0to16(const char *s, size_t len) {
  if (len > 8) {
    uint64 a = Fetch64(s);
    uint64 b = Fetch64(s + len - 8);
    return HashLen16(a, RotateByAtLeast1(b + len, len)) ^ b;
  }
  if (len >= 4) {
    uint64 a = Fetch32(s);
    return HashLen16(len + (a << 3), Fetch32(s + len - 4));
  }
  if (len > 0) {
    uint8 a = s[0];
    uint8 b = s[len >> 1];
    uint8 c = s[len - 1];
    uint32 y = static_cast<uint32>(a) + (static_cast<uint32>(b) << 8);
    uint32 z = len + (static_cast<uint32>(c) << 2);
    return ShiftMix(y * k2 ^ z * k3) * k2;
  }
  return k2;
}

static uint128 WeakHashLen32WithSeeds(
    uint64 w, uint64 x, uint64 y, uint64 z, uint64 a, uint64 b) {
  a += w;
  b = Rotate(b + a + z, 21);
  uint64 c = a;
  a += x;
  a += y;
  b += Rotate(a, 44);
  return uint128(a + z, b + c);
}
static uint128 WeakHashLen32WithSeeds(const char *s, uint64 a, uint64 b) {
  return WeakHashLen32WithSeeds(Fetch64(s), Fetch64(s + 8), Fetch64(s + 16),
                                Fetch64(s + 24), a, b);
}

static uint128 CityMurmur(const char *s, size_t len, uint128 seed) {
  uint64 a = seed.first;
  uint64 b = seed.second;
  uint64 c = 0;
  uint64 d = 0;
  signed long l = (signed long)len - 16;
  if (l <= 0) {  // len <= 16
    a = ShiftMix(a * k1) * k1;
    c = b * k1 + HashLen0to16(s, len);
    d = ShiftMix(a + (len >= 8 ? Fetch64(s) : c));
  } else {  // len > 16
    c = HashLen16(Fetch64(s + len - 8) + k1, a);
    d = HashLen16(b + len, c + Fetch64(s + len - 16));
    a += d;
    do {
      a ^= ShiftMix(Fetch64(s) * k1) * k1;
      a *= k1;
      b ^= a;
      c ^= ShiftMix(Fetch64(s + 8) * k1) * k1;
      c *= k1;
      d ^= c;
      s += 16;
      l -= 16;
    } while (l > 0);
  }
  a = HashLen16(a, c);
  b = HashLen16(d, b);
  return uint128(a ^ b, HashLen16(b, a));
}

static uint128 CityHash128WithSeed(const char *s, size_t len, uint128 seed) {
  if (len < 128) {
    return CityMurmur(s, len, seed);
  }
  uint128 v, w;
  uint64 x = seed.first;
  uint64 y = seed.second;
  uint64 z = len * k1;
  v.first = Rotate(y ^ k1, 49) * k1 + Fetch64(s);
  v.second = Rotate(v.first, 42) * k1 + Fetch64(s + 8);
  w.first = Rotate(y + z, 35) * k1 + x;
  w.second = Rotate(x + Fetch64(s + 88), 53) * k1;

  do {
    x = Rotate(x + y + v.first + Fetch64(s + 16), 37) * k1;
    y = Rotate(y + v.second + Fetch64(s + 48), 42) * k1;
    x ^= w.second;
    y ^= v.first;
    z = Rotate(z ^ w.first, 33);
    v = WeakHashLen32WithSeeds(s, v.second * k1, x + w.first);
    w = WeakHashLen32WithSeeds(s + 32, z + w.second, y);
    std::swap(z, x);
    s += 64;
    x = Rotate(x + y + v.first + Fetch64(s + 16), 37) * k1;
    y = Rotate(y + v.second + Fetch64(s + 48), 42) * k1;
    x ^= w.second;
    y ^= v.first;
    z = Rotate(z ^ w.first, 33);
    v = WeakHashLen32WithSeeds(s, v.second * k1, x + w.first);
    w = WeakHashLen32WithSeeds(s + 32, z + w.second, y);
    std::swap(z, x);
    s += 64;
    len -= 128;
  } while (len >= 128);
  y += Rotate(w.first, 37) * k0 + z;
  x += Rotate(v.first + z, 49) * k0;
  for (size_t tail_done = 0; tail_done < len;) {
    tail_done += 32;
    y = Rotate(y - x, 42) * k0 + v.second;
    w.first += Fetch64(s + len - tail_done + 16);
    x = Rotate(x, 49) * k0 + w.first;
    w.first += v.first;
    v = WeakHashLen32WithSeeds(s + len - tail_done, v.first, v.second);
  }
  x = HashLen16(x, v.first);
  y = HashLen16(y, w.first);
  return uint128(HashLen16(x + v.second, w.second) + y,
                 HashLen16(x + w.second, y + v.second));
}

static uint128 CityHash128(const char *s, size_t len) {
  if (len >= 16) {
    return CityHash128WithSeed(s + 16, len - 16,
                               uint128(Fetch64(s) ^ k3, Fetch64(s + 8)));
  } else if (len >= 8) {
    return CityHash128WithSeed(NULL, 0,
                               uint128(Fetch64(s) ^ (len * k0),
                                       Fetch64(s + len - 8) ^ k1));
  } else {
    return CityHash128WithSeed(s, len, uint128(k0, k1));
  }
}

int main() {
  // deterministic buffer: xorshift64*, byte = (state >> 32) & 0xff
  const int N = 4096;
  static char buf[N];
  uint64 st = 0x9E3779B97F4A7C15ULL;
  for (int i = 0; i < N; i++) {
    st ^= st >> 12; st ^= st << 25; st ^= st >> 27;
    buf[i] = (char)((st * 0x2545F4914F6CDD1DULL) >> 32);
  }
  int lens[] = {0, 1, 2, 3, 4, 5, 7, 8, 9, 11, 15, 16, 17, 23, 31, 32, 33,
                47, 63, 64, 65, 100, 127, 128, 129, 160, 191, 192, 223, 224,
                255, 256, 257, 384, 511, 512, 1000, 2048, 4095, 4096};
  for (size_t i = 0; i < sizeof(lens) / sizeof(lens[0]); i++) {
    uint128 h = CityHash128(buf, (size_t)lens[i]);
    printf("%d %llu %llu\n", lens[i],
           (unsigned long long)h.first, (unsigned long long)h.second);
  }
  return 0;
}
