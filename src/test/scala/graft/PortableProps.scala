package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.cdc.TableMapping
import graft.ml.Vectors

/** Property-based checks (ScalaCheck) for the invariants the oracle
  * parity rests on: the JVM twin of the portable hash, LIKE-pattern
  * equivalence between driver-side matching and Catalyst, and the
  * native dot product vs its higher-order formulation.
  */
object PortableProps extends Properties("graft.portable") {
  private lazy val spark = SparkTestSession.spark

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', '#', '_', '%')))
      .map(_.mkString)

  property("jvmPHash == Spark pHash") = Prop.forAll(asciiText) { s =>
    val fromSpark = spark.range(1)
      .select(graft.functions.Portable.pHash(lit(s)))
      .collect()(0).getLong(0)
    fromSpark == Vectors.jvmPHash(s)
  }

  private val mixedText: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', '#', '_'),
      1 -> Gen.oneOf('的', 'é', 'ß', 'Ω'))).map(_.mkString)

  property("native md5 hash60/pair == hex+conv SQL formula") =
    Prop.forAll(mixedText) { s =>
      val hex = md5(lit(s))
      val (h1, h2) = graft.functions.Portable.pHashPair(lit(s))
      val r = spark.range(1).select(
        graft.functions.Portable.pHash(lit(s)).as("n"),
        conv(substring(hex, 1, 15), 16, 10).cast("long").as("f"),
        h1.as("p1"), h2.as("p2"),
        conv(substring(hex, 17, 15), 16, 10).cast("long").as("f2"))
        .collect()(0)
      r.getLong(0) == r.getLong(1) &&
        r.getLong(2) == r.getLong(1) && r.getLong(3) == r.getLong(4)
    }

  private val likePattern: Gen[String] =
    Gen.listOfN(4, Gen.frequency(
      5 -> Gen.alphaLowerChar.map(_.toString),
      2 -> Gen.const("%"), 1 -> Gen.const("_")))
      .map(_.mkString)

  private val shortName: Gen[String] =
    Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)

  property("driver-side LIKE match == Column.like") =
    Prop.forAll(likePattern, shortName, shortName) { (pat, schema, table) =>
      val m = TableMapping.Mapping(Seq(TableMapping.SelectionRule(pat, pat)))
      val plain = m.selectTables(Seq((schema, table))).nonEmpty
      val viaSpark = spark.range(1)
        .select(m.predicate(lit(schema), lit(table)).as("p"))
        .collect()(0).getBoolean(0)
      plain == viaSpark
    }

  private val vec: Gen[List[Long]] =
    Gen.listOfN(16, Gen.chooseNum(-1000L, 1000L))

  property("native long_dot == higher-order dot == Scala") =
    Prop.forAll(vec, vec) { (a, b) =>
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        Vectors.dot(col("a"), col("b")).as("n"),
        Vectors.dotHof(col("a"), col("b")).as("h")).collect()(0)
      val expected = a.zip(b).map { case (x, y) => x * y }.sum
      r.getLong(0) == expected && r.getLong(1) == expected
    }
}
