package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-payload check for the CSV replication target: quotes,
  * commas, braces, backslashes and unicode must survive the quoted
  * write + schema read-back byte-exactly (props_hash parity). */
class CsvTargetSpec extends AnyFunSuite {
  import SparkTestSession._

  test("CSV and ORC parity under randomized newline-free payloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet =
      "ab\"',\\{}[]:; \tünïcø✓€" + 'é'
    def randStr(): String =
      (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val dir = java.nio.file.Files
      .createTempDirectory("graft-csv-rnd").toString
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-csv-rnd-sink").toString
    (1L to 200L).map { i =>
      (i, new Timestamp(1700000000000L + i * 1000), i % 9,
        Seq("signup", "click", "error")((i % 3).toInt),
        rnd.nextDouble() * 100 - 50,
        if (i % 17 == 0) null else randStr())
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq[(org.apache.spark.sql.SparkSession, String, String) =>
        org.apache.spark.sql.DataFrame](
      sources.CsvTarget.roundtrip, sources.CsvTarget.orcRoundtrip)
      .foreach { fn =>
        fn(spark, dir, tmp).collect().foreach { r =>
          (4 to 7).foreach(i =>
            assert(r.getBoolean(i), s"parity col $i failed for ${r.getString(0)}"))
        }
      }
  }

  test("CSV roundtrip parity holds under hostile string payloads") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-csv-src").toString
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-csv-sink").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup", 1.25,
        """{"k": "a,b", "q": "she said \"hi\""}"""),
      (2L, ts("2024-01-01 01:00:00"), 2L, "click", -3.50,
        """comma, "quote", backslash \ and unicode: ünïcødé ✓"""),
      (3L, ts("2024-01-01 02:00:00"), 3L, "error", 0.00, null),
      (4L, ts("2024-01-01 03:00:00"), 5L, "purchase", 99.99, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = sources.CsvTarget.roundtrip(spark, dir, tmp).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getBoolean(4), s"rows_ok failed for ${r.getString(0)}")
      assert(r.getBoolean(5), s"keys_ok failed for ${r.getString(0)}")
      assert(r.getBoolean(6), s"payload_ok failed for ${r.getString(0)}")
      assert(r.getBoolean(7), s"values_ok failed for ${r.getString(0)}")
    }
  }
}
