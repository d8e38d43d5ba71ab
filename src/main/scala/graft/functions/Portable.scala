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

  /** 60-bit non-negative hash of a string column. */
  def pHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant — independent hash families for minhash/LSH. */
  def pHash(c: Column, seed: Int): Column =
    pHash(concat(c, lit("#" + seed)))

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
}
