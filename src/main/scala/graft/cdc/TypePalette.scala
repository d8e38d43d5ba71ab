package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The MariaDB type palette the reference replicates (lib/query.py:
  * 1-57 exercises INT/VARCHAR/TINYINT/DATE/DECIMAL/BOOLEAN/TIMESTAMP/
  * DATETIME/TEXT/BLOB/ENUM/FLOAT/DOUBLE, and the accounts table
  * declares `age TINYINT UNSIGNED`, lib/query.py:4; SURVEY.md §5 maps
  * them to Spark types). `palette` derives one column of each type
  * from the `part` table so the envelope roundtrip (wrap → JSON →
  * parse) can be verified value-exactly for every type, including
  * BLOB→Binary via base64.
  *
  * UNSIGNED integers have no same-width Spark target — Spark's
  * TINYINT/SMALLINT/INT are signed — so each widens one step
  * (TINYINT U→Short, SMALLINT U→Int, INT U→Long), the standard JDBC
  * mapping. The palette values sit ABOVE the signed range of the
  * declared MariaDB width (e.g. utiny ∈ [128,255]) so a regression to
  * the narrow signed type would overflow and fail the value-exact
  * roundtrip instead of passing silently.
  */
object TypePalette {

  def palette(part: DataFrame): DataFrame = part.select(
    col("p_partkey").as("id"),                                     // INT
    (col("p_partkey") % 128).cast("tinyint").as("tiny"),           // TINYINT
    (col("p_partkey") % 128 + 128).cast("smallint").as("utiny"),   // TINYINT UNSIGNED → Short, 128-255
    (col("p_partkey") % 32768 + 32768).cast("int").as("usmall"),   // SMALLINT UNSIGNED → Int, ≥ 32768
    (col("p_partkey") + 2147483648L).as("uint"),                   // INT UNSIGNED → Long, ≥ 2^31
    col("p_retailprice").cast("decimal(12,2)").as("dec"),          // DECIMAL
    (col("p_partkey") % 2 === 0).as("flag"),                       // BOOLEAN
    col("p_name").as("txt"),                                       // TEXT
    col("p_name").cast("binary").as("blob"),                       // BLOB
    col("p_brand").as("enum_v"),                                   // ENUM
    col("p_retailprice").cast("float").as("f32"),                  // FLOAT
    col("p_retailprice").as("f64"),                                // DOUBLE
    timestamp_micros(col("p_partkey") * 3600000000L).as("ts"),     // DATETIME
    to_date(timestamp_micros(col("p_partkey") * 86400000000L)).as("d")) // DATE

  val paletteSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("tiny", ByteType),
    StructField("utiny", ShortType),
    StructField("usmall", IntegerType),
    StructField("uint", LongType),
    StructField("dec", DecimalType(12, 2)),
    StructField("flag", BooleanType),
    StructField("txt", StringType),
    StructField("blob", BinaryType),
    StructField("enum_v", StringType),
    StructField("f32", FloatType),
    StructField("f64", DoubleType),
    StructField("ts", TimestampType),
    StructField("d", DateType)))

  val paletteCols: Seq[String] = paletteSchema.fields.map(_.name).toSeq
}
