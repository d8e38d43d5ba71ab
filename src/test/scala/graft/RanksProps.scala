package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ranks

/** Properties for the two-phase grouped rank: on any input it must
  * equal the single-partition `row_number() OVER (PARTITION BY g
  * ORDER BY v, id)` it replaces at scale, and the NTILE arithmetic
  * must equal SQL NTILE for every (total, n) shape — including
  * total < n, total divisible by n, and the mixed big/small-tile
  * split. Inputs draw heavy ties so the tie-break path is always
  * exercised.
  */
object RanksProps extends Properties("graft.ranks") {
  private lazy val spark = SparkTestSession.spark

  private val rows: Gen[List[(Int, Int, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 2),   // group
      Gen.chooseNum(0, 4),   // value (heavy ties)
      Gen.chooseNum(0, 999)))// id

  property("two-phase grouped rank == window row_number") =
    Prop.forAll(rows) { rs =>
      import spark.implicits._
      // ids deduplicated within group so the order is total
      val distinctRows = rs.groupBy(r => (r._1, r._3)).map(_._2.head).toList
      val df = distinctRows.toDF("g", "v", "id")
      val got = Ranks.grouped(df, Seq("g"), Seq("v", "id"))
        .select(col("g"), col("id"), col("rank"), col("grp_total"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val expect = distinctRows.groupBy(_._1).flatMap { case (g, grp) =>
        val sorted = grp.sortBy(r => (r._2, r._3))
        sorted.zipWithIndex.map { case (r, i) =>
          (g, r._3) -> ((i + 1).toLong, grp.size.toLong)
        }
      }
      got == expect
    }

  property("groupedWithSum == window row_number + exclusive cumsum + totals") =
    Prop.forAll(rows) { rs =>
      import spark.implicits._
      val distinctRows = rs.groupBy(r => (r._1, r._3)).map(_._2.head).toList
      val df = distinctRows.map { case (g, v, id) => (g, v.toLong, id) }
        .toDF("g", "v", "id")
      val got = Ranks.groupedWithSum(df, Seq("g"), Seq("v", "id"), "v")
        .select(col("g"), col("id"), col("rank"), col("grp_total"),
          col("prefix_sum"), col("grp_value_total"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      val expect = distinctRows.groupBy(_._1).flatMap { case (g, grp) =>
        val sorted = grp.sortBy(r => (r._2, r._3))
        val total = grp.map(_._2.toLong).sum
        sorted.zipWithIndex.map { case (r, i) =>
          (g, r._3) -> ((i + 1).toLong, grp.size.toLong,
            sorted.take(i).map(_._2.toLong).sum, total)
        }
      }
      got == expect
    }

  property("two-phase prefixMax == single-partition running max") =
    Prop.forAll(rows) { rs =>
      import spark.implicits._
      val distinctRows = rs.groupBy(_._3).map(_._2.head).toList
      val df = distinctRows.map { case (_, v, id) => (v, id) }.toDF("v", "id")
      val got = Ranks.prefixMax(df, Seq("v", "id"), "v")
        .select(col("id"), col("prefix_max"))
        .collect()
        .map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
      val sorted = distinctRows.map { case (_, v, id) => (v, id) }
        .sortBy(identity)
      val expect = sorted.zipWithIndex.map { case ((_, id), i) =>
        id -> (if (i == 0) None else Some(sorted.take(i).map(_._1).max))
      }.toMap
      got == expect
    }

  property("two-phase prefixSum == single-partition exclusive cumsum") =
    Prop.forAll(rows) { rs =>
      import spark.implicits._
      val distinctRows = rs.groupBy(_._3).map(_._2.head).toList
      val df = distinctRows.map { case (_, v, id) => (v.toLong, id) }
        .toDF("v", "id")
      val got = Ranks.prefixSum(df, Seq("v", "id"), "v")
        .select(col("id"), col("prefix_sum"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val sorted = distinctRows.map { case (_, v, id) => (v.toLong, id) }
        .sortBy(identity)
      val expect = sorted.zipWithIndex.map { case ((_, id), i) =>
        id -> sorted.take(i).map(_._1).sum
      }.toMap
      got == expect
    }

  property("skyline operator == quadratic dominance filter") =
    Prop.forAll(rows) { rs =>
      import spark.implicits._
      // (price, size) points with heavy ties; ids unique
      val pts = rs.groupBy(_._3).map(_._2.head).toList
        .map { case (a, b, id) => (id.toLong, BigDecimal(a), b) }
      val dir = java.nio.file.Files
        .createTempDirectory("graft-skyline").toString
      pts.toDF("p_partkey", "p_retailprice", "p_size")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      val got = graft.operators.Analytics.qSkyline(spark, dir)
        .select(col("p_partkey")).as[Long].collect().toSet
      val expect = pts.filter { p =>
        !pts.exists(o => o._2 <= p._2 && o._3 >= p._3 &&
          (o._2 < p._2 || o._3 > p._3))
      }.map(_._1).toSet
      got == expect
    }

  property("ntileExpr == SQL NTILE tile sizes") =
    Prop.forAll(Gen.chooseNum(1, 40), Gen.chooseNum(1, 9)) { (total, n) =>
      import spark.implicits._
      val df = (1 to total).map(r => (r.toLong, total.toLong))
        .toDF("rank", "grp_total")
      val got = df.selectExpr(s"ntile($n) OVER (ORDER BY rank) AS t",
          Ranks.ntileExpr("rank", "grp_total", n) + " AS u")
        .collect()
      got.forall(r => r.getInt(0).toLong == r.getLong(1))
    }
}
