package graft

/** DuckDB-SQL mirror of Spark's `xxhash64` over LongType inputs — the
  * oracle-side recomputation that lets hash-partitioned operators (fold
  * splits, hash buckets) graduate from rows-only to the hard DuckDB
  * hash-gate without changing the engine-side hash.
  *
  * Spark's `xxhash64(c1, .., cn)` (seed 42) folds XXH64's 8-byte-input
  * path over the children: `h = hashLong(c_i, h)` starting from the seed
  * (org.apache.spark.sql.catalyst.expressions.XxHash64 — itself the
  * published xxHash spec, Y. Collet, github.com/Cyan4973/xxHash). The
  * 8-byte path is a short fixed sequence of wrap-multiplies, rotations
  * and xor-shifts mod 2^64, all of which DuckDB can express exactly:
  *
  *   - UBIGINT carries the unsigned 64-bit state; `>>` on UBIGINT is the
  *     logical shift (= Java's `>>>`), `xor`/`|`/`&` are bitwise;
  *   - wrap-multiply CANNOT go through HUGEINT products directly (a
  *     64x64 product reaches 2^128 > INT128 max, probed: DuckDB raises
  *     "Overflow in multiplication of INT128"), so [[mulc]] splits the
  *     constant into 32-bit halves — every intermediate stays <= 2^65;
  *   - left-rotate = mask-then-multiply-by-2^s (never `<<`, which range-
  *     errors on UBIGINT overflow) OR'd with the complementary `>>`.
  *
  * Literal children constant-fold in Scala through [[hashLong]], so the
  * emitted chain spends CTE steps only on the data-dependent input.
  * Differentially validated against `F.xxhash64(lit(42L), col)` on 5001
  * ids including full-avalanche (>= 2^63) hashes — zero mismatches.
  */
object XxHash64Sql {

  private val M: BigInt = BigInt(1) << 64
  private val Mask: BigInt = M - 1
  private val P1 = BigInt("11400714785074694791") // 0x9E3779B185EBCA87
  private val P2 = BigInt("14029467366897019727") // 0xC2B2AE3D27D4EB4F
  private val P3 = BigInt("1609587929392839161") // 0x165667B19E3779F9
  private val P4 = BigInt("9650029242287828579") // 0x85EBCA77C2B2AE63
  private val P5 = BigInt("2870177450012600261") // 0x27D4EB2F165667C5

  /** XXH64.hashLong on unsigned-64 BigInts — the Scala-side copy of the
    * spec, used to constant-fold literal children (and unit-testable
    * against Spark's expression directly).
    */
  def hashLong(input: BigInt, seed: BigInt): BigInt = {
    def rotl(x: BigInt, s: Int): BigInt = ((x << s) | (x >> (64 - s))) & Mask
    var h = (seed + P5 + 8) & Mask
    h ^= (rotl((input * P2) & Mask, 31) * P1) & Mask
    h = ((rotl(h, 27) * P1) + P4) & Mask
    h ^= h >> 33
    h = (h * P2) & Mask
    h ^= h >> 29
    h = (h * P3) & Mask
    h ^= h >> 32
    h
  }

  /** The bit pattern of a signed long as unsigned BigInt. */
  def toU64(v: Long): BigInt = BigInt(v) & Mask

  // ---- SQL fragment builders (input exprs must be UBIGINT) ----

  /** Wrap-multiply by a constant via 32-bit halves:
    * a*c mod 2^64 = ((a_hi*c_lo + a_lo*c_hi) mod 2^32)*2^32 + a_lo*c_lo
    * (mod 2^64) — every HUGEINT intermediate <= 2^65.
    */
  private def mulc(a: String, c: BigInt): String = {
    val ch = c >> 32
    val cl = c & 0xFFFFFFFFL
    val hi = s"((CAST(($a >> 32) AS HUGEINT) * $cl + CAST(($a & 4294967295::UBIGINT) AS HUGEINT) * $ch) % 4294967296)"
    s"CAST((($hi * 4294967296 + CAST(($a & 4294967295::UBIGINT) AS HUGEINT) * $cl) % 18446744073709551616) AS UBIGINT)"
  }

  private def addc(a: String, c: BigInt): String =
    s"CAST((CAST($a AS HUGEINT) + $c) % 18446744073709551616 AS UBIGINT)"

  /** a << s mod 2^64 without `<<` (UBIGINT shift overflow is a range
    * error): mask to the low 64-s bits, then multiply — the product is
    * < 2^64 by construction, so no wrap step is needed.
    */
  private def shl(a: String, s: Int): String =
    s"CAST((CAST(($a & ${(BigInt(1) << (64 - s)) - 1}::UBIGINT) AS HUGEINT) * ${BigInt(1) << s}) AS UBIGINT)"

  private def rotl(a: String, s: Int): String = s"(${shl(a, s)} | ($a >> ${64 - s}))"

  /** CTE chain computing `outCol` = Spark `xxhash64(lit(seedLit), key)`
    * as UBIGINT. Returns (cteFragment, lastCteName): the fragment is a
    * comma-joined list of CTE definitions to splice into a WITH clause;
    * the last CTE exposes all of `srcCte`'s columns plus `outCol` (the
    * intermediate step columns are EXCLUDEd).
    *
    * @param srcCte  name of the table/CTE carrying the key
    * @param keyCol  BIGINT key column (any sign)
    * @param seedLit the literal first child (Splits.bucketOf's seed)
    * @param pfx     unique prefix for CTE/step names
    */
  def xxhash64LongCtes(
      srcCte: String,
      keyCol: String,
      outCol: String,
      seedLit: Long,
      pfx: String): (String, String) = {
    // constant-fold hashLong(seedLit, 42) and the subsequent + P5 + 8
    val chainedSeed = hashLong(toU64(seedLit), BigInt(42))
    val acc0 = (chainedSeed + P5 + 8) & Mask
    val in = s"${pfx}_in"
    val steps = Seq(
      s"${pfx}_j" -> mulc(in, P2),
      s"${pfx}_k" -> mulc(rotl(s"${pfx}_j", 31), P1),
      s"${pfx}_b" -> s"xor($acc0::UBIGINT, ${pfx}_k)",
      s"${pfx}_c" -> addc(mulc(rotl(s"${pfx}_b", 27), P1), P4),
      s"${pfx}_d" -> mulc(s"xor(${pfx}_c, (${pfx}_c >> 33))", P2),
      s"${pfx}_e" -> mulc(s"xor(${pfx}_d, (${pfx}_d >> 29))", P3))
    val bits =
      s"CAST((CAST($keyCol AS HUGEINT) + CASE WHEN $keyCol < 0 THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END) AS UBIGINT)"
    val c0 = s"${pfx}0 AS (SELECT *, $bits AS $in FROM $srcCte)"
    val mids = steps.zipWithIndex.map { case ((col, sql), i) =>
      s"${pfx}${i + 1} AS (SELECT *, $sql AS $col FROM ${pfx}$i)"
    }
    val temps = (in +: steps.map(_._1)).mkString(", ")
    val last = s"${pfx}f"
    val cN =
      s"$last AS (SELECT * EXCLUDE ($temps), xor(${pfx}_e, (${pfx}_e >> 32)) AS $outCol FROM ${pfx}${steps.size})"
    ((c0 +: mids :+ cN).mkString(", "), last)
  }

  /** Spark `pmod(<signed view of hashCol>, m)` as BIGINT: reinterpret the
    * UBIGINT hash as the signed long Spark holds, then the non-negative
    * mod (Java pmod = mathematical mod for positive m).
    */
  def signedPmod(hashCol: String, m: Long): String =
    s"CAST((((CAST($hashCol AS HUGEINT) - CASE WHEN $hashCol >= 9223372036854775808::UBIGINT THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END) % $m) + $m) % $m AS BIGINT)"

  // ---- variable-length (string) inputs ----

  /** Byte `pos` (1-based) of the UTF-8 encoding, decoded from its hex
    * dump: DuckDB has no direct blob-byte accessor, but `hex(encode(s))`
    * is two uppercase digits per byte and strpos inverts them exactly.
    */
  private def byteAt(hx: String, pos: String): String =
    s"CAST(((strpos('0123456789ABCDEF', substr($hx, 2*($pos)-1, 1)) - 1) * 16 + " +
      s"strpos('0123456789ABCDEF', substr($hx, 2*($pos), 1)) - 1) AS UBIGINT)"

  /** Little-endian 8-byte lane starting at 0-based byte offset `base`. The
    * byte*256^j products stay < 2^64 and their sum is <= 2^64-1, so plain
    * UBIGINT addition cannot overflow.
    */
  private def lane8(hx: String, base: String): String =
    (0 until 8)
      .map(j => s"${byteAt(hx, s"($base)+${j + 1}")} * ${BigInt(256).pow(j)}::UBIGINT")
      .mkString("(", " + ", ")")

  /** Wrap-add of two variable UBIGINTs (sum < 2^65 fits HUGEINT). */
  private def addv(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % 18446744073709551616 AS UBIGINT)"

  /** CTE chain computing `outCol` = Spark `xxhash64(<string col>)` (seed
    * 42) as UBIGINT for every row of `srcCte` — the engine's token-hash
    * recomputed oracle-side, so MinHash/SimHash/winnowing queries can be
    * hash-gated end-to-end instead of trusted rows-only.
    *
    * Mirrors XXH64.hashUnsafeBytesBlock COMPLETELY: inputs >= 32 bytes
    * run the 4-accumulator stripe path (one STRUCT(a,b,c,d) per 32-byte
    * stripe folded through `list_reduce` — the accumulator struct has the
    * same shape, which is exactly what list_reduce's acc-type = elem-type
    * rule needs — then the rotl(1,7,12,18) merge and four merge rounds),
    * shorter inputs seed directly; both continue through the shared tail
    * (8-byte lanes from the last stripe boundary, one optional 4-byte
    * lane, up to three tail bytes, avalanche). Differentially validated
    * against `F.xxhash64(col)` on empty/1..16/32/33/39/40/63/64/65/95/
    * 100/127/128-byte and multibyte-UTF-8 inputs — zero mismatches.
    */
  def xxhash64StringCtes(
      srcCte: String,
      strCol: String,
      outCol: String,
      pfx: String): (String, String) = {
    val hx = s"${pfx}_hx"
    val len = s"${pfx}_len"
    def laneStep(acc: String, k: String): String =
      addc(mulc(rotl(s"xor($acc, ${mulc(rotl(mulc(k, P2), 31), P1)})", 27), P1), P4)
    def byteStep(h: String, b: String): String =
      mulc(rotl(s"xor($h, ${mulc(b, P5)})", 11), P1)
    // stripe-path accumulator update: acc' = rotl(acc + lane*P2, 31) * P1
    def vRound(acc: String, lane: String): String =
      mulc(rotl(addv(acc, mulc(lane, P2)), 31), P1)
    def mergeRound(h: String, v: String): String =
      addc(mulc(s"xor($h, ${mulc(rotl(mulc(v, P2), 31), P1)})", P1), P4)
    val acc0Const = (BigInt(42) + P5) & Mask
    val v1 = (BigInt(42) + P1 + P2) & Mask
    val v2 = (BigInt(42) + P2) & Mask
    val v3 = BigInt(42)
    val v4 = (BigInt(42) - P1) & Mask
    val fields = Seq("a", "b", "c", "d")
    val stripeLit = fields.zipWithIndex
      .map { case (f, i) => s"'$f': ${lane8(hx, s"(${pfx}_st-1)*32+${8 * i}")}" }
      .mkString("{", ", ", "}")
    val accLit = fields
      .map(f => s"'$f': ${vRound(s"${pfx}_vc.$f", s"${pfx}_sx.$f")}")
      .mkString("{", ", ", "}")
    val vInit =
      s"{'a': $v1::UBIGINT, 'b': $v2::UBIGINT, 'c': $v3::UBIGINT, 'd': $v4::UBIGINT}"
    val mergeInit =
      s"CAST((CAST(${rotl(s"${pfx}_va.a", 1)} AS HUGEINT) + CAST(${rotl(s"${pfx}_va.b", 7)} AS HUGEINT) + " +
        s"CAST(${rotl(s"${pfx}_va.c", 12)} AS HUGEINT) + CAST(${rotl(s"${pfx}_va.d", 18)} AS HUGEINT)) " +
        "% 18446744073709551616 AS UBIGINT)"
    val steps = Seq(
      hx -> s"hex(encode($strCol))",
      len -> s"octet_length(encode($strCol))",
      s"${pfx}_sts" ->
        s"list_transform(generate_series(1, $len // 32), ${pfx}_st -> $stripeLit)",
      s"${pfx}_va" ->
        s"list_reduce([$vInit] || ${pfx}_sts, (${pfx}_vc, ${pfx}_sx) -> $accLit)",
      s"${pfx}_m0" -> mergeInit,
      s"${pfx}_m1" -> mergeRound(s"${pfx}_m0", s"${pfx}_va.a"),
      s"${pfx}_m2" -> mergeRound(s"${pfx}_m1", s"${pfx}_va.b"),
      s"${pfx}_m3" -> mergeRound(s"${pfx}_m2", s"${pfx}_va.c"),
      s"${pfx}_m4" -> mergeRound(s"${pfx}_m3", s"${pfx}_va.d"),
      s"${pfx}_a0" ->
        s"CASE WHEN $len < 32 THEN ${addc(s"CAST($len AS UBIGINT)", acc0Const)} ELSE ${addv(s"${pfx}_m4", s"CAST($len AS UBIGINT)")} END",
      s"${pfx}_lanes" ->
        s"list_transform(generate_series(($len // 32) * 4 + 1, $len // 8), ${pfx}_w -> ${lane8(hx, s"(${pfx}_w-1)*8")})",
      s"${pfx}_h1" ->
        s"list_reduce([${pfx}_a0] || ${pfx}_lanes, (${pfx}_ac, ${pfx}_k) -> ${laneStep(s"${pfx}_ac", s"${pfx}_k")})",
      s"${pfx}_off" -> s"($len // 8) * 8",
      s"${pfx}_c4" -> s"$len - ${pfx}_off >= 4",
      s"${pfx}_w32" ->
        s"CASE WHEN ${pfx}_c4 THEN ${byteAt(hx, s"${pfx}_off+1")} + ${byteAt(hx, s"${pfx}_off+2")} * 256::UBIGINT + ${byteAt(hx, s"${pfx}_off+3")} * 65536::UBIGINT + ${byteAt(hx, s"${pfx}_off+4")} * 16777216::UBIGINT ELSE 0::UBIGINT END",
      s"${pfx}_h2" ->
        s"CASE WHEN ${pfx}_c4 THEN ${addc(mulc(rotl(s"xor(${pfx}_h1, ${mulc(s"${pfx}_w32", P1)})", 23), P2), P3)} ELSE ${pfx}_h1 END",
      s"${pfx}_o2" -> s"${pfx}_off + CASE WHEN ${pfx}_c4 THEN 4 ELSE 0 END") ++
      (0 until 3).map { k =>
        val prev = if (k == 0) s"${pfx}_h2" else s"${pfx}_h${2 + k}"
        s"${pfx}_h${3 + k}" ->
          s"CASE WHEN ${pfx}_o2 + $k < $len THEN ${byteStep(prev, byteAt(hx, s"${pfx}_o2+${k + 1}"))} ELSE $prev END"
      } ++ Seq(
        s"${pfx}_d" -> mulc(s"xor(${pfx}_h5, (${pfx}_h5 >> 33))", P2),
        s"${pfx}_e" -> mulc(s"xor(${pfx}_d, (${pfx}_d >> 29))", P3))
    val c0 = s"${pfx}0 AS (SELECT * FROM $srcCte)"
    val mids = steps.zipWithIndex.map { case ((col, sql), i) =>
      s"${pfx}${i + 1} AS (SELECT *, $sql AS $col FROM ${pfx}$i)"
    }
    val temps = steps.map(_._1).mkString(", ")
    val last = s"${pfx}f"
    val cN =
      s"$last AS (SELECT * EXCLUDE ($temps), xor(${pfx}_e, (${pfx}_e >> 32)) AS $outCol FROM ${pfx}${steps.size})"
    ((c0 +: mids :+ cN).mkString(", "), last)
  }
}

/** DuckDB-SQL mirror of Murmur3_x86_32.hashLong — the hash pair behind
  * Spark's BloomFilterImpl, so bloom-sketch membership (x35) can be
  * recomputed relationally: an item is "might contain" exactly when all
  * k of its bit positions fall inside the union of the banned items'
  * positions, and the positions are pure arithmetic over (h1, h2).
  *
  * Spark 4's `bloom_filter_agg` builds a V2 filter
  * (BloomFilter.create(items, bits) → Version.V2, seed 0 — read from the
  * shipped spark-sketch bytecode, as was the V2 scatter below):
  *   h1 = Murmur3_x86_32.hashLong(item, 0); h2 = hashLong(item, h1);
  *   acc = h1 * Int.MaxValue (SIGNED 64-bit — V2 dropped V1's 32-bit
  *   wrap); then per round i: acc += h2; pos = acc < 0 ? ~acc : acc;
  *   bit = pos % bitSize, with bitSize = ceil(numBits/64)*64 (BitArray
  *   rounds up to whole words).
  *
  * Murmur3_x86_32 itself is all 32-bit wrap arithmetic, which UBIGINT
  * handles directly: every product is < 2^64 and `% 4294967296`
  * truncates exactly. Differentially validated against `F.hash()` (the
  * same hashLong, seed 42) and end-to-end against the engine's own
  * bloom query output — zero mismatches including false positives.
  */
object Murmur3Sql {

  /** Murmur3_x86_32.hashLong on unsigned-32 ints — the executable spec
    * the SQL emission mirrors, pinned against Spark's own `hash()`
    * expression (same hashLong, seed 42) in HashMirrorSpec so a Spark
    * hashing change breaks the build immediately instead of surfacing
    * as a red oracle at verification time.
    */
  def hashLongRef(input: Long, seed: Int): Int = {
    val m = 0xFFFFFFFFL
    def rotl(x: Long, s: Int): Long = ((x << s) | (x >>> (32 - s))) & m
    def mixK1(k0: Long): Long = {
      var k = (k0 * 0xcc9e2d51L) & m
      k = rotl(k, 15)
      (k * 0x1b873593L) & m
    }
    def mixH1(h0: Long, k: Long): Long = {
      var h = h0 ^ k
      h = rotl(h, 13)
      (h * 5L + 0xe6546b64L) & m
    }
    val lo = input & m
    val hi = (input >>> 32) & m
    var h = mixH1(seed.toLong & m, mixK1(lo))
    h = mixH1(h, mixK1(hi))
    h ^= 8L
    h ^= h >>> 16
    h = (h * 0x85ebca6bL) & m
    h ^= h >>> 13
    h = (h * 0xc2b2ae35L) & m
    h ^= h >>> 16
    h.toInt
  }

  private val M32 = "4294967296"

  private def rot(x: String, s: Int): String =
    s"((($x << $s) % $M32) | ($x >> ${32 - s}))"

  private def mixK1(v: String): String =
    s"((${rot(s"(($v * 3432918353::UBIGINT) % $M32)", 15)} * 461845907::UBIGINT) % $M32)"

  private def mixH1(h: String, k: String): String =
    s"(((${rot(s"xor($h, $k)", 13)} * 5::UBIGINT) + 3864292196::UBIGINT) % $M32)"

  /** CTE chain computing the bloom hash pair (`mh1`, `mh2`, UBIGINT
    * 32-bit values) for every row of `srcCte`, whose `itemCol` is the
    * UBIGINT bit pattern of the hashed long (e.g. XxHash64Sql's output).
    */
  def hashLongPairCtes(srcCte: String, itemCol: String, pfx: String): (String, String) = {
    def fmixSteps(tag: String, seed: String): Seq[(String, String)] = Seq(
      s"${pfx}_${tag}a" -> mixH1(seed, mixK1(s"${pfx}_lo")),
      s"${pfx}_${tag}b" -> mixH1(s"${pfx}_${tag}a", mixK1(s"${pfx}_hi")),
      s"${pfx}_${tag}c" -> s"xor(${pfx}_${tag}b, 8::UBIGINT)",
      s"${pfx}_${tag}d" -> s"xor(${pfx}_${tag}c, (${pfx}_${tag}c >> 16))",
      s"${pfx}_${tag}e" -> s"((${pfx}_${tag}d * 2246822507::UBIGINT) % $M32)",
      s"${pfx}_${tag}f" -> s"xor(${pfx}_${tag}e, (${pfx}_${tag}e >> 13))",
      s"${pfx}_${tag}g" -> s"((${pfx}_${tag}f * 3266489909::UBIGINT) % $M32)",
      (if (tag == "p") "mh1" else "mh2") -> s"xor(${pfx}_${tag}g, (${pfx}_${tag}g >> 16))")
    val steps = Seq(
      s"${pfx}_lo" -> s"$itemCol & 4294967295::UBIGINT",
      s"${pfx}_hi" -> s"$itemCol >> 32") ++
      fmixSteps("p", "0::UBIGINT") ++ fmixSteps("q", "mh1")
    val mids = steps.zipWithIndex.map { case ((col, sql), i) =>
      s"$pfx${i + 1} AS (SELECT *, $sql AS $col FROM ${if (i == 0) srcCte else s"$pfx$i"})"
    }
    val temps = steps.map(_._1).filterNot(c => c == "mh1" || c == "mh2").mkString(", ")
    val last = s"${pfx}f"
    (mids.mkString(", ") + s", $last AS (SELECT * EXCLUDE ($temps) FROM $pfx${steps.size})", last)
  }

  /** The V2 bit position for hash round `i` as a BIGINT SQL expression:
    * signed-32 reinterpretation of the pair, the signed-64 accumulator,
    * the negative-flip, then the modulus.
    */
  def v2Position(iExpr: String, bitSize: Long): String = {
    def s32(u: String) =
      s"(CAST($u AS BIGINT) - CASE WHEN $u >= 2147483648::UBIGINT THEN 4294967296 ELSE 0 END)"
    val acc = s"(${s32("mh1")} * 2147483647 + CAST($iExpr AS BIGINT) * ${s32("mh2")})"
    s"(CASE WHEN $acc < 0 THEN -$acc - 1 ELSE $acc END) % $bitSize"
  }
}
