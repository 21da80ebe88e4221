package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * The driver's correctness gate hash-compares our results against DuckDB, so
  * every hash that reaches an output column (fingerprints, MinHash signatures,
  * SimHash bits, LSH band keys) must be computable bit-identically by both
  * engines. Spark's `hash`/`xxhash64` have no DuckDB twin, but MD5 does:
  * we take the first 15 hex chars (60 bits — always non-negative in a signed
  * 64-bit long, so sign semantics can't diverge) and parse them as an integer.
  *
  *   Spark : conv(substr(md5(x), 1, 15), 16, 10) :: long
  *   DuckDB: ('0x' || substr(md5(x), 1, 15)) :: BIGINT
  *
  * Seeding prepends `"<seed>|"` to the input, giving k independent hash
  * families for MinHash from one MD5 core.
  *
  * Scale note: MD5 is ~2-3× slower than xxhash64 but both are memory-bound on
  * a parquet scan; at 100 TB the scan dominates. All expressions here are
  * built-in Catalyst functions — codegen'd, no UDFs, no serialization wall.
  */
object PortableHash {

  /** 60-bit non-negative hash of a string column. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded 60-bit hash: independent family per seed. */
  def md5Long(c: Column, seed: Int): Column =
    md5Long(concat(lit(s"$seed|"), c.cast("string")))

  /** String-salted 60-bit hash (named sampling domains, source tags). */
  def md5Long(c: Column, salt: String): Column =
    md5Long(concat(lit(s"$salt|"), c.cast("string")))

  /** JVM-side twin of [[md5Long]] for hash-derived CONSTANTS baked into
    * plans (e.g. LSH hyperplane values): same MD5 → first 15 hex chars →
    * long, so an oracle engine can regenerate the identical constants from
    * the seed string alone — no JVM-only hash (MurmurHash3 etc.) anywhere
    * in an output-bearing path. */
  def md5LongJvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment for the same value (for oracle authors). */
  def duckSql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  def duckSql(expr: String, seed: Int): String =
    duckSql(s"'$seed|' || $expr")

  // ---------------------------------------------------- universal hashing
  // Cheap seeded rehash families over an already-hashed value — the
  // production MinHash layout: ONE strong hash per shingle, then k
  // arithmetic rehashes h_i(x) = (a_i·x' + b_i) mod p with x' = x & (2³⁰−1).
  // All intermediates stay < 2⁶⁰, so Java long and DuckDB BIGINT agree
  // exactly (no overflow, no sign divergence). ~100× cheaper than k MD5s.

  /** Largest prime below 2³⁰. */
  val UhP: Long = 1073741789L
  /** 2³⁰ − 1: folds a 60-bit hash into the universal-hash domain. */
  val UhMask: Long = 1073741823L

  /** Multiplier for family `seed` — deterministic, in [1, P). */
  def uhA(seed: Int): Long = {
    val x = (seed.toLong * 2654435761L + 1234567891L) % UhP
    if (x <= 0) x + UhP - 1 else x
  }

  /** Offset for family `seed` — deterministic, in [0, P). */
  def uhB(seed: Int): Long = (seed.toLong * 2166136261L + 987654321L) % UhP

  /** Column form: (a·(h & mask) + b) mod p. */
  def rehash(h: Column, seed: Int): Column =
    (lit(uhA(seed)) * h.bitwiseAND(lit(UhMask)) + lit(uhB(seed))) % lit(UhP)

  /** DuckDB twin of [[rehash]]. */
  def rehashDuckSql(hExpr: String, seed: Int): String =
    s"((${uhA(seed)} * ($hExpr & $UhMask) + ${uhB(seed)}) % $UhP)"
}
