package graft.ml

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Portable vector math for the embedding operators.
  *
  * Correctness strategy: float summation order differs between
  * engines, so cosine over raw floats is NOT reproducible bit-for-bit.
  * We therefore quantize each component to an integer
  * (`round(x * 1000)`), compute dot products and squared norms in
  * exact int64 arithmetic (order-independent), and only then perform
  * ONE double division and ONE sqrt — both IEEE-754
  * correctly-rounded, hence bit-identical in Spark and DuckDB.
  *
  * Scale notes: all of this is per-row array math inside codegen —
  * no shuffle, no UDF. At 100 TB the quantized vectors are also 8×
  * smaller to shuffle than float64 and exact to aggregate.
  */
object Vectors {

  val Scale = 1000

  /** embedding array<float> → array<long> of round(x*1000). */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * Scale).cast("long"))

  def duckQuantize(x: String): String =
    s"list_transform($x, e -> CAST(round(CAST(e AS DOUBLE)*$Scale) AS BIGINT))"

  /** Exact integer dot product of two quantized vectors — a native
    * codegen Expression (graft.functions.LongDotProduct); see
    * `dotHof` for the composed-functions equivalent it replaces.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeDot.dot(a, b)

  /** Higher-order-function formulation of `dot` (interpreted; kept
    * as the differential-testing twin of the native expression).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity from integer dot/norms: one div, one sqrt.
    * The norm product multiplies in DOUBLE: an int64 multiply would
    * silently wrap for ‖q‖² pairs beyond ~3·10⁹ each (DuckDB would
    * raise instead — a divergence the oracle can't see at bench
    * norms). Below 2⁵³ the double product rounds the exact value
    * once, identically to casting an exact int64 product, so values
    * are unchanged where both are defined.
    */
  def cosine(dotAB: Column, n2a: Column, n2b: Column): Column =
    dotAB.cast("double") / sqrt(n2a.cast("double") * n2b.cast("double"))

  def duckCosine(dot: String, n2a: String, n2b: String): String =
    s"CAST($dot AS DOUBLE) / sqrt(CAST($n2a AS DOUBLE) * CAST($n2b AS DOUBLE))"

  // --- sign-random-projection LSH ---------------------------------

  /** JVM twin of Portable.pHash — md5 hex, first 15 nibbles, base 16.
    * Used to derive SRP hyperplane weights driver-side; a spec
    * asserts it matches the Spark column function bit-for-bit.
    */
  def jvmPHash(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    new BigInteger(hex.substring(0, 15), 16).longValue()
  }

  /** Deterministic pseudo-random hyperplanes: component (p, i) is
    * pHash("srp#p#i") % 2001 - 1000 ∈ [-1000, 1000]. Derived from the
    * portable hash so the oracle regenerates the identical planes.
    */
  def srpPlanes(nPlanes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map(i => jvmPHash(s"srp#$p#$i") % 2001 - 1000)
    }

  /** DuckDB CTE body generating the same planes as (p, i, w) rows. */
  def duckPlanes(nPlanes: Int, dim: Int): String =
    s"""SELECT p, i,
       |  CAST(('0x' || substr(md5('srp#' || p || '#' || i), 1, 15)) AS BIGINT)
       |    % 2001 - 1000 AS w
       |FROM range($nPlanes) tp(p), range($dim) ti(i)""".stripMargin

  /** Quantized-vector relation shared by the embedding operators:
    * (vec_id, q, n2), spread to full parallelism first (the per-row
    * array math is CPU-heavy but byte-light, so size-based AQE
    * coalescing or a single input split would serialize it).
    * Operators that build this with the SAME call produce identical
    * logical plans, so one operator's persisted copy is reused by the
    * next (CacheManager matches by plan).
    */
  /** Spread a per-vector relation to full parallelism BEFORE the
    * CPU-heavy array math (see [[quantized]]'s rationale) — also used
    * directly by operators that carry extra columns (label) through
    * the quantization.
    */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions,
      col("vec_id"))

  def quantized(embs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spread(embs)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("n2", norm2(col("q")))

  /** Normalized-quantized relation: each component re-scaled onto
    * the unit sphere at `Scale` (qn_i = round(Scale·q_i/√n2)), so
    * L2 distance becomes a monotone proxy for cosine (‖a−b‖² =
    * 2−2cosθ on unit vectors) — what a PQ/ADC index must store to
    * answer cosine queries. Reproducible across engines: the
    * integer-quantized component and exact n2 feed ONE double
    * multiply, ONE sqrt, ONE division, ONE round — all IEEE
    * correctly-rounded. Zero-norm vectors have no direction and are
    * dropped (the brute-force baseline excludes them identically).
    */
  def quantizedNormalized(embs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    quantized(embs)
      .filter(col("n2") > 0)
      .select(col("vec_id"),
        transform(col("q"), x =>
          round(x.cast("double") * Scale / sqrt(col("n2").cast("double")))
            .cast("long")).as("q"))

  /** quantized() + SRP band buckets — the candidate-generation view. */
  def quantizedWithBuckets(
      embs: org.apache.spark.sql.DataFrame,
      bands: Int, rowsPerBand: Int, dim: Int): org.apache.spark.sql.DataFrame =
    quantized(embs)
      .withColumn("buckets", srpBuckets(col("q"), bands, rowsPerBand, dim))

  /** SRP band buckets for a quantized vector column: `bands` buckets,
    * each packing `rowsPerBand` sign bits. Returns an array<long> of
    * length `bands`. Sign bit = (v · plane ≥ 0); planes are literal
    * arrays, so the whole thing is per-row codegen'd math.
    */
  def srpBuckets(q: Column, bands: Int, rowsPerBand: Int, dim: Int): Column = {
    val planes = srpPlanes(bands * rowsPerBand, dim)
    val bits: Seq[Column] = planes.map { pl =>
      val plCol = typedlit(pl)
      when(dot(q, plCol) >= 0, lit(1L)).otherwise(lit(0L))
    }
    val buckets = (0 until bands).map { b =>
      (0 until rowsPerBand).map { j =>
        bits(b * rowsPerBand + j) * lit(1L << j)
      }.reduce(_ + _)
    }
    array(buckets: _*)
  }
}
