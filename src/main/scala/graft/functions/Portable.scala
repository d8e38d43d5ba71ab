package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash / fingerprint helpers that are *portable*: every function here
  * computes bit-identical results in Spark and in DuckDB 1.x, so
  * operators built on them (minhash, simhash, LSH bucketing, shard
  * assignment) can be verified against a SQL oracle.
  *
  * Spark:  conv(substr(md5(x), 1, 15), 16, 10)::bigint
  * DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
  *
  * 15 hex chars = 60 bits — always non-negative, fits a signed int64.
  */
object Portable {

  /** 60-bit non-negative hash of a string column. Computed by the
    * native [[Md5Long60]] codegen expression — bit-identical to the
    * documented `conv(substr(md5(x),1,15),16,10)` formula (the DuckDB
    * side still computes exactly that; PortableSpec asserts equality),
    * but ~40% cheaper per row: no 32-char hex rendering, no conv
    * parse.
    */
  def pHash(c: Column): Column = NativeMd5.hash60(c)

  /** Seeded variant — independent hash families for minhash/LSH. */
  def pHash(c: Column, seed: Int): Column =
    pHash(concat(c, lit("#" + seed)))

  /** Two independent 60-bit hashes from ONE md5 (hex chars 1-15 and
    * 17-31, via the native [[Md5LongPair]] struct expression — one
    * digest per row by construction). With Kirsch-Mitzenmacher double
    * hashing (h_i = h1 + i·h2) this yields a whole minhash family for
    * the price of a single digest — 8 seeded md5s per shingle was the
    * hottest loop in the dedup pipeline. Max value: h1 + 7·h2 <
    * 8·2^60 = 2^63, so the arithmetic never overflows int64 and the
    * oracle computes it exactly.
    */
  def pHashPair(c: Column): (Column, Column) = NativeMd5.hashPair(c)

  def duckHashPair(x: String): (String, String) =
    (s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)",
      s"CAST(('0x' || substr(md5($x), 17, 15)) AS BIGINT)")

  /** DuckDB SQL fragment computing the same value; `x` is a SQL expr. */
  def duckHash(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  def duckHash(x: String, seed: Int): String =
    duckHash(s"($x || '#$seed')")

  /** Canonical text normalization shared by fingerprint/dedup ops:
    * lowercase, collapse whitespace runs, trim. Same regex semantics
    * in DuckDB: trim(regexp_replace(lower(x), '\s+', ' ', 'g')).
    */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  def duckNormText(x: String): String =
    s"trim(regexp_replace(lower($x), '\\s+', ' ', 'g'))"

  /** Driver/JVM twin of [[normText]] (same regex semantics), for
    * test-side recomputation. Locale.ROOT (default-locale toLowerCase
    * would fold 'I' to dotless 'ı' under tr) and a SPACE-only trim
    * (String.trim strips every char <= U+0020, Spark's trim strips
    * spaces only).
    */
  def normTextJvm(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
      .replaceAll("^ | $", "")
}
