package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeFeed, Envelope, SchemaEvolution}

class SchemaEvolutionSpec extends AnyFunSuite {
  import SparkTestSession._

  private val baseSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("controlEvents emits create/alter/drop per table with record-type control") {
    val ctl = SchemaEvolution.controlEvents(ChangeFeed.fromEvents(spark, sf))
    val rows = ctl.collect()
    val perTable = rows.groupBy(_.getAs[String]("table_name"))
    perTable.values.foreach { g =>
      assert(g.map(_.getAs[String]("op")).sorted.toSeq ==
        Seq("alter-table", "create-table", "drop-table"))
    }
    // through the envelope they become control records
    val wrapped = Envelope.wrap(ctl, col("op"), col("schema_name"),
      col("table_name"), col("ts"), lit(null).cast("long"), Seq("table_name"))
    val parsed = Envelope.parse(wrapped.select("message"), "message",
      StructType(Seq(StructField("table_name", StringType))))
    assert(parsed.select("metadata.`record-type`").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("control"))
  }

  test("added column reads as null from old messages") {
    import spark.implicits._
    val df = Seq((1L, 10L, 2.5, "{}")).toDF("event_id", "user_id", "value", "props")
    val wrapped = Envelope.wrap(df, lit("insert"), lit("graft"), lit("t"),
      current_timestamp(), col("event_id"),
      Seq("event_id", "user_id", "value", "props"))
    val evolved = SchemaEvolution.addColumn(baseSchema, "added_col", IntegerType)
    val row = SchemaEvolution.parseDrifted(
      wrapped.select("message"), "message", evolved).select("data.*").collect()(0)
    assert(row.getAs[Long]("event_id") == 1L)
    assert(row.isNullAt(row.fieldIndex("added_col")))
  }

  test("added column with DEFAULT: absent key takes default, explicit value and explicit null survive") {
    import spark.implicits._
    // pre-ALTER message: no is_stock key at all
    val pre = Envelope.wrap(
      Seq((1L, 10L, 2.5, "{}")).toDF("event_id", "user_id", "value", "props"),
      lit("insert"), lit("graft"), lit("t"), current_timestamp(),
      col("event_id"), Seq("event_id", "user_id", "value", "props"))
    // post-ALTER messages: explicit false and explicit null
    val post = Envelope.wrap(
      Seq((2L, 11L, 3.5, "{}", Some(false)), (3L, 12L, 4.5, "{}", None))
        .toDF("event_id", "user_id", "value", "props", "is_stock"),
      lit("insert"), lit("graft"), lit("t"), current_timestamp(),
      col("event_id"), Seq("event_id", "user_id", "value", "props", "is_stock"))
    val evolved = SchemaEvolution.addColumn(baseSchema, "is_stock", BooleanType)
    val rows = SchemaEvolution.parseDrifted(
        pre.select("message").unionByName(post.select("message")),
        "message", evolved, Map("is_stock" -> lit(true)))
      .select("data.event_id", "data.is_stock").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    assert(rows(1L).contains(true))   // pre-ALTER → declared default
    assert(rows(2L).contains(false))  // explicit value kept
    assert(rows(3L).isEmpty)          // explicit null NOT defaulted
    // without defaults the pre-ALTER message reads null (old behavior)
    val plain = SchemaEvolution.parseDrifted(
        pre.select("message"), "message", evolved)
      .select("data.is_stock").collect()(0)
    assert(plain.isNullAt(0))
  }

  test("a nested key with the drifted column's name cannot shadow the presence probe") {
    import spark.implicits._
    // props is a JSON STRING column whose text contains "is_stock":
    // — as a string field its quotes are escaped in the envelope, and
    // the probe must also ignore genuinely nested objects' keys: only
    // a TOP-LEVEL data key counts as present
    val pre = Envelope.wrap(
      Seq((1L, 10L, 2.5, """{"is_stock": false}"""))
        .toDF("event_id", "user_id", "value", "props"),
      lit("insert"), lit("graft"), lit("t"), current_timestamp(),
      col("event_id"), Seq("event_id", "user_id", "value", "props"))
    val evolved = SchemaEvolution.addColumn(baseSchema, "is_stock", BooleanType)
    val row = SchemaEvolution.parseDrifted(
        pre.select("message"), "message", evolved,
        Map("is_stock" -> lit(true)))
      .select("data.is_stock").collect()(0)
    // pre-ALTER message: the declared default applies despite the
    // lookalike inner key
    assert(!row.isNullAt(0) && row.getBoolean(0))
  }

  test("dropped column is ignored; remaining fields survive") {
    import spark.implicits._
    val df = Seq((1L, 10L, 2.5, "{\"k\":1}")).toDF("event_id", "user_id", "value", "props")
    val wrapped = Envelope.wrap(df, lit("insert"), lit("graft"), lit("t"),
      current_timestamp(), col("event_id"),
      Seq("event_id", "user_id", "value", "props"))
    val evolved = SchemaEvolution.dropColumn(baseSchema, "props")
    val parsed = SchemaEvolution.parseDrifted(
      wrapped.select("message"), "message", evolved).select("data.*")
    assert(!parsed.columns.contains("props"))
    assert(parsed.collect()(0).getAs[Double]("value") == 2.5)
  }

  test("retyped column is cast on read (double -> string)") {
    import spark.implicits._
    val df = Seq((1L, 10L, 2.5, "{}")).toDF("event_id", "user_id", "value", "props")
    val wrapped = Envelope.wrap(df, lit("insert"), lit("graft"), lit("t"),
      current_timestamp(), col("event_id"),
      Seq("event_id", "user_id", "value", "props"))
    val evolved = SchemaEvolution.retypeColumn(baseSchema, "value", StringType)
    val row = SchemaEvolution.parseDrifted(
      wrapped.select("message"), "message", evolved).select("data.*").collect()(0)
    assert(row.getAs[String]("value") == "2.5")
  }

  test("mergeSchema reads batches written before and after an ADD COLUMN") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/b=1")
    Seq((2L, "y", 9L)).toDF("id", "a", "added").write.parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "added", "b"))
    val old = merged.filter(col("id") === 1L).collect()(0)
    assert(old.isNullAt(old.fieldIndex("added")))
  }

  test("txn ids group same-minute commits per table") {
    val t = SchemaEvolution.withTxnId(ChangeFeed.fromEvents(spark, sf))
    val bad = t.groupBy(col("table_name"), date_trunc("minute", col("ts")))
      .agg(countDistinct(col("txn_id")).as("n"))
      .filter(col("n") > 1)
    assert(bad.count() == 0)
  }
}
