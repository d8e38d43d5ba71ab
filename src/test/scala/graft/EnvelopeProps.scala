package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.Envelope

/** Property check for the JSON envelope: wrap → parse is the
  * identity on the data payload for adversarial column values —
  * JSON metacharacters (quotes, backslashes), control characters,
  * non-ASCII, empty strings, and explicit nulls (which
  * include_null_and_empty must keep distinguishable from absent).
  */
object EnvelopeProps extends Properties("graft.envelope") {
  private lazy val spark = SparkTestSession.spark

  private val nasty: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('"', '\\', '/', '\n', '\t', '\r'),
    1 -> Gen.oneOf('é', 'ß', '的', 'Ω', '€'),
    1 -> Gen.oneOf('\u0001', '\u001f'))).map(_.mkString)

  private val rows: Gen[List[(Long, Option[String], Option[Long])]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 100L),
      Gen.option(nasty),
      Gen.option(Gen.chooseNum(Long.MinValue, Long.MaxValue))))

  private val dataSchema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("n", LongType)))

  property("wrap then parse is identity on the data payload") =
    Prop.forAll(rows) { data =>
      import spark.implicits._
      val df = data.zipWithIndex
        .map { case ((id, s, n), i) => (i.toLong, id, s, n) }
        .toDF("row_id", "id", "s", "n")
      val wrapped = Envelope.wrap(df,
        op = lit("insert"), schemaName = lit("graft"), tableName = lit("t"),
        ts = to_timestamp(lit("2024-01-01 00:00:00")), txnId = lit("tx"),
        dataCols = Seq("id", "s", "n"))
      val got = Envelope.parse(wrapped, "message", dataSchema)
        .select(col("row_id"), col("data.id"), col("data.s"), col("data.n"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1),
          Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
      val expect = data.zipWithIndex
        .map { case (row, i) => i.toLong -> row }.toMap
      got == expect
    }
}
