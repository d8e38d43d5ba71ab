package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The MariaDB type palette the reference replicates (lib/query.py:
  * 1-57 exercises INT/VARCHAR/TINYINT/DATE/DECIMAL/BOOLEAN/TIMESTAMP/
  * DATETIME/TEXT/BLOB/ENUM/FLOAT/DOUBLE; SURVEY.md §5 maps them to
  * Spark types). `palette` derives one column of each type from the
  * `part` table so the envelope roundtrip (wrap → JSON → parse) can
  * be verified value-exactly for every type, including BLOB→Binary
  * via base64.
  */
object TypePalette {

  def palette(part: DataFrame): DataFrame = part.select(
    col("p_partkey").as("id"),                                     // INT
    (col("p_partkey") % 128).cast("tinyint").as("tiny"),           // TINYINT
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
