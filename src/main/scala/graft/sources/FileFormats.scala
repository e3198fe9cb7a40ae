package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Topic interchange in the bundled file formats (SURVEY.md §2.B
  * "file formats/connectors"): parquet is the native log encoding
  * (Topic.scala); JSON-lines and CSV are the export/import paths.
  * Schemas are explicit on read — schema inference is a full extra pass
  * over the data and type-lossy (timestamps), both wrong at scale.
  */
object FileFormats {

  // µs-precision timestamp format on BOTH text formats — the default
  // JSON/CSV timestampFormat truncates to milliseconds, silently losing
  // event-time precision on the round-trip
  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeJsonl(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("timestampFormat", TsFmt).json(dir)

  def readJsonl(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("timestampFormat", TsFmt).json(dir)

  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(dir)

  // ORC: the second columnar format Spark bundles — binary-typed,
  // µs-exact timestamps, predicate pushdown and column pruning like
  // parquet (the archive/interop encoding; the topic log itself stays
  // parquet).
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)
}
