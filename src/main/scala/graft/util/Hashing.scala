package graft.util

/** The library's deterministic hashing primitives, defined ONCE.
  *
  * Every signature scheme in the repo (shingles, minhash, simhash,
  * winnowing, delete-variant blocking, the embedding kernel) builds on
  * the same two functions; their constants are load-bearing — the DuckDB
  * oracles replicate them bit-for-bit (e.g. the `fingerprint_stats`
  * oracle re-implements [[fnv]] in HUGEINT mod-2^64 arithmetic), and any
  * drift between copies would silently desynchronize operators that must
  * agree (index writers vs probers). Keep ONE definition of each.
  */
private[graft] object Hashing {

  /** splitmix64 finalizer — seeded, platform-independent avalanche. */
  @inline def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64-bit over UTF-16 code units. */
  @inline def fnv(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** FNV-1a 64-bit over a [from, until) slice — allocation-free
    * equivalent of `fnv(s.substring(from, until))`.
    */
  @inline def fnvRange(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** FNV-1a 64-bit over raw bytes. */
  @inline def fnvBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= b(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** All unordered pairs of a (capped) bucket's sorted id list — shared
    * by every LSH-banding pair generator.
    */
  def bucketPairs(ids: Seq[Long]): Seq[(Long, Long)] =
    for { i <- ids.indices; j <- (i + 1) until ids.size }
      yield (ids(i), ids(j))
}
