package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf1 rehearsal (BASELINE.md "sf1 rehearsal") is only evidence
  * if the generated decade-up data preserves the workload's shape —
  * these are the invariants ScaleUp's Scaladoc claims, asserted on a
  * factor-3 replica of sf0.001 instead of assumed:
  *  - exact factor-x row counts, fixed dims verbatim;
  *  - FK closure survives the per-copy key shift (zero orphans);
  *  - per-key group sizes are PRESERVED, not multiplied (copies are
  *    disjoint key universes — the failure mode would be 3x-deep
  *    groups, which changes join/agg selectivity instead of scale);
  *  - document token universes don't collide across copies (LSH must
  *    see a bigger corpus, not factor-1 synthetic near-dup twins);
  *  - the driver's layout contract: ONE parquet FILE per table
  *    (cdc_stream_roundtrip's pathGlobFilter matches leaf-file names
  *    — a directory-per-table replica streams zero files).
  */
class ScaleUpSpec extends AnyFunSuite {
  import SparkTestSession._

  private val factor = 3
  private lazy val dst: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.generate(spark, sf, dir, factor)
    dir
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")
  private def srcT(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  test("row counts: facts scale by factor, fixed dims verbatim") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(n).count() === srcT(n).count() * factor, n)
    for (n <- Seq("region", "nation")) {
      assert(t(n).count() === srcT(n).count(), n)
      assert(t(n).exceptAll(srcT(n)).isEmpty, s"$n not verbatim")
    }
  }

  test("layout: one parquet FILE per table, no staging leftovers") {
    val entries = new java.io.File(dst).listFiles()
    assert(entries.forall(_.isFile), "directory-per-table breaks " +
      "file-name-matched consumers (fileRoundtrip pathGlobFilter)")
    assert(entries.map(_.getName).sorted.toSeq === Seq("customer",
      "documents", "embeddings", "events", "lineitem", "nation",
      "orders", "part", "region", "supplier").map(_ + ".parquet"))
  }

  test("FK closure: zero orphans after the per-copy shift") {
    def orphans(child: String, ck: String, parent: String, pk: String) =
      t(child).join(t(parent), col(ck) === col(pk), "left_anti").count()
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") === 0L)
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") === 0L)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") === 0L)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") === 0L)
    assert(orphans("customer", "c_nationkey", "nation", "n_nationkey") === 0L)
  }

  test("per-key group sizes are preserved, not multiplied") {
    // the deepest source order must stay the deepest replica order —
    // colliding key universes would stack copies into 3x-deep groups
    def depths(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_orderkey").count()
      .agg(max("count").as("mx"), avg("count").as("mean"))
      .collect()(0)
    val (s, d) = (depths(srcT("lineitem")), depths(t("lineitem")))
    assert(d.getLong(0) === s.getLong(0), "max group depth changed")
    assert(math.abs(d.getDouble(1) - s.getDouble(1)) < 1e-9,
      "mean group depth changed")
  }

  test("document token universes are disjoint across copies") {
    val tok = t("documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("copy", floor(col("doc_id") / lit(1000000000L)))
    // a token seen in two copies would hand LSH synthetic near-dups
    val shared = tok.groupBy("tok")
      .agg(countDistinct("copy").as("copies"))
      .filter(col("copies") > 1).count()
    assert(shared === 0L)
    // and the n_chars metadata tracks the rewritten text
    val bad = t("documents")
      .filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad === 0L)
  }

  test("events keep raw nanos encoding readable by Tables.load") {
    val replica = Tables.load(spark, dst, "events")
    val source = Tables.load(spark, sf, "events")
    assert(replica.schema("ts").dataType === source.schema("ts").dataType)
    // same span (timestamps unshifted: 3x events over one span = 3x rate)
    val Array(a) = source.agg(min("ts"), max("ts")).collect()
    val Array(b) = replica.agg(min("ts"), max("ts")).collect()
    assert(a === b)
  }
}
