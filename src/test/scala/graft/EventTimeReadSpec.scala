package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.withEventTime` absorbs the one environment difference that
  * took down round 7: Spark ≤4.0 reads parquet TIMESTAMP(NANOS) as a
  * raw long (under nanosAsLong), Spark 4.1+ reads it natively as
  * timestamp_ntz and IGNORES the flag. Both branches must produce the
  * same session-zoned micros the DuckDB oracle computes — including
  * for pre-epoch nanos, where a floor division and Spark's
  * truncate-toward-zero `div` would differ by 1 µs.
  */
class EventTimeReadSpec extends AnyFunSuite {
  import SparkTestSession._

  test("active branch: the testdata events read resolves to TimestampType") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // post-epoch data: floor and truncate-toward-zero agree, so both
    // reader branches yield the identical instant (ADVICE r7 caveat).
    val mn = df.agg(min(unix_micros(col("ts")))).head.getLong(0)
    assert(mn > 0L, s"events testdata expected post-epoch, min micros = $mn")
  }

  test("legacy long branch and ntz branch agree micro-exactly, incl. pre-epoch") {
    import spark.implicits._
    // nanos values straddling truncation boundaries on both sides of
    // the epoch. -1001 ns: toward-zero div -> -1 µs; floor -> -2 µs.
    val nanos = Seq(-2000L, -1999L, -1001L, -1000L, -999L, -1L, 0L, 1L,
      999L, 1000L, 1001L, 1999L, 1704067200123456789L)
    val asLong = Tables.withEventTime(nanos.toDF("ts"))
    assert(asLong.schema("ts").dataType == TimestampType)
    val gotLong = asLong.select(unix_micros(col("ts"))).as[Long].collect().toSeq

    // Spark's native TIMESTAMP(NANOS) read truncates toward zero to
    // micros (DuckDB's ns->µs read does the same); model that branch
    // by handing withEventTime the already-truncated ntz column.
    val asNtz = Tables.withEventTime(nanos.toDF("raw")
      .select(timestamp_micros(expr("raw div 1000"))
        .cast(TimestampNTZType).as("ts")))
    assert(asNtz.schema("ts").dataType == TimestampType)
    val gotNtz = asNtz.select(unix_micros(col("ts"))).as[Long].collect().toSeq

    val expected = nanos.map(_ / 1000L)
    assert(gotLong == expected, "legacy long branch drifted from toward-zero µs")
    assert(gotNtz == expected, "ntz branch drifted from toward-zero µs")
  }

  test("native TIMESTAMP(NANOS) read truncates toward zero, incl. pre-epoch") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
    import spark.implicits._

    // A REAL parquet file carrying int64 TIMESTAMP(NANOS, utc=false) —
    // the physical shape the driver testdata uses — written with the
    // low-level parquet example writer so no Spark write path can
    // launder the type. This asserts (not models) the assumption the
    // ntz branch rests on: Spark 4.1's native nanos read truncates
    // toward zero to micros, like DuckDB's ns->µs read.
    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val nanos = Seq(-2000L, -1999L, -1001L, -1000L, -999L, -1L, 0L, 1L,
      999L, 1000L, 1001L, 1999L, 1704067200123456789L)
    val dir = Files.createTempDirectory("graft-nanos-fixture").toString
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet/part-00000.parquet"))
      .withConf(conf).withType(schema).build()
    val factory = new SimpleGroupFactory(schema)
    try nanos.foreach(n => writer.write(factory.newGroup().append("ts", n)))
    finally writer.close()

    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    val expected = nanos.map(_ / 1000L).sorted // Scala / is truncate-toward-zero
    assert(got == expected,
      s"native nanos read drifted from toward-zero µs: got $got expected $expected")
  }

  test("ntz branch fails loudly under a non-UTC session zone") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        Tables.withEventTime(Seq(0L).toDF("raw")
          .select(timestamp_micros(col("raw")).cast(TimestampNTZType).as("ts")))
      }
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("both branches survive a parquet roundtrip of the legacy long shape") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evt-read").toString
    // a raw-nanos long column named ts is exactly what the legacy
    // reader branch sees; write/read it through parquet to prove the
    // dispatch is on the LOADED schema, not on session flags.
    Seq(1704067200000000000L, 1704067201500000999L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].collect().toSet ==
      Set(1704067200000000L, 1704067201500000L))
  }

  test("an unsupported ts type fails loudly at the catalog, not 39 queries deep") {
    import spark.implicits._
    val e = intercept[IllegalStateException] {
      Tables.withEventTime(Seq("boom").toDF("ts"))
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
