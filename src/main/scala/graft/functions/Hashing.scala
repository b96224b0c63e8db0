package graft.functions

/** Deterministic hash kit for the dedup family (MinHash / SimHash).
  *
  * Everything here is seeded and pure — the same corpus always produces
  * the same signatures, on any executor, in any partition order. That is
  * what makes the signatures safe to compute distributed and join on.
  */
object Hashing extends Serializable {

  /** FNV-1a 64-bit over UTF-8 bytes — cheap, well-distributed, portable. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 — used to derive the MinHash permutation parameters. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Number of MinHash components and the LSH banding shape (default
    * 16 bands of 4 rows ⇒ candidate threshold ≈ (1/16)^(1/4) ≈ 0.5
    * Jaccard) — read once per JVM from the layered GraftConfig
    * (graft.dedup.minhash.k / graft.dedup.lsh.bands), so deployments
    * tune the sketch without recompiling. Driver-contract queries pin
    * the defaults; changing them changes signatures (not oracle-checked
    * — these ops are rows-only verified).
    */
  private lazy val config = graft.GraftConfig.load()
  lazy val MinhashK: Int = config("graft.dedup.minhash.k").toInt
  lazy val Bands: Int = config("graft.dedup.lsh.bands").toInt
  lazy val RowsPerBand: Int = {
    require(Bands > 0 && MinhashK > 0 && MinhashK % Bands == 0,
      s"invalid LSH shape: minhash.k=$MinhashK must be a positive " +
        s"multiple of lsh.bands=$Bands — non-divisible values silently " +
        "drop signature components; bands > k degenerates to constant keys")
    MinhashK / Bands
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def log2ceil(x: Long): Int =
    if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)

  /** LSH bucket-key width as a function of collection size: enough bits
    * that the EXPECTED bucket population n / 2^bits stays ≈ targetRows —
    * the round-2 design's one scale gap. A fixed bit width means bucket
    * population grows linearly with n and within-bucket candidate pairs
    * grow ~n²/buckets; deriving bits from log₂(n/target) keeps per-bucket
    * work constant as the collection scales, and radius-1 multiprobe on
    * the query side compensates the recall lost to the wider keys.
    */
  def bucketBits(n: Long, targetRows: Long, minBits: Int, maxBits: Int): Int =
    math.min(maxBits, math.max(minBits, log2ceil(math.max(1L, n / targetRows))))

  // ------------------------------------- oracle-reproducible sketch kit
  //
  // DuckDB cannot reproduce 64-bit wraparound multiplication (BIGINT
  // overflow throws), so FNV/splitmix-style sketches would be JVM-only.
  // This kit instead keeps every step inside non-overflowing signed-64
  // integer arithmetic so the EXACT same signatures fall out of both
  // engines:
  //   - base hash  = first 15 hex chars of md5(s), parsed as a 60-bit
  //     int (md5 is identical everywhere; DuckDB parses '0x…' casts)
  //   - minhash    = min over shingles of (a·(x mod p) + b) mod p with
  //     p = 2^31−1: products stay < 2^62, a classic universal family
  //   - simhash    = 60-bit sign-aggregate of weighted token-hash bits

  /** Mersenne prime 2^31−1 — the permutation modulus. */
  val ModP: Long = 2147483647L

  /** First 15 hex chars of md5(s) as a non-negative 60-bit Long —
    * `CAST('0x' || substring(md5(s),1,15) AS BIGINT)` in DuckDB.
    */
  def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Affine permutation params in [1,p−1] / [0,p−1], seeded — embedded
    * verbatim as literals in the generated DuckDB oracle.
    */
  lazy val minhashA60: Array[Long] =
    Array.tabulate(MinhashK)(i => (splitmix64(0x5eed0001L + i) >>> 1) % (ModP - 1) + 1)
  lazy val minhashB60: Array[Long] =
    Array.tabulate(MinhashK)(i => (splitmix64(0x5eed1001L + i) >>> 1) % ModP)

  /** MinHash signature over mod-p permutations; component i is
    * min((a_i·(x mod p) + b_i) mod p). All-ModP signature ⇒ no elements.
    */
  def minhash60(elementHashes: Iterator[Long]): Array[Long] = {
    val sig = Array.fill(MinhashK)(ModP)
    elementHashes.foreach { x0 =>
      val x = x0 % ModP
      var i = 0
      while (i < MinhashK) {
        val h = (minhashA60(i) * x + minhashB60(i)) % ModP
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** 60-bit SimHash over (md5_60 hash, weight) pairs. */
  def simhash60(weighted: Iterator[(Long, Int)]): Long = {
    val acc = new Array[Int](60)
    weighted.foreach { case (h, w) =>
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
