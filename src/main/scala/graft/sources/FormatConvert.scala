package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** S14 — the reference's `JsonToCsvTransformerOperator` plugin stub
  * (`plugins/file_transformer_plugin.py:5-13`, body is a `print`), made
  * real: schema-applied JSON → CSV (and back), the trivial case of the
  * engine's general format-conversion surface.
  */
object FormatConvert {

  /** JSON lines → headered CSV. Explicit schema (never inference) per
    * the engine's schema policy; pass `null` schema only for ad-hoc use.
    */
  def jsonToCsv(spark: SparkSession, inPath: String, outPath: String,
      schema: StructType = null): Unit = {
    val reader = spark.read
    val df = (if (schema != null) reader.schema(schema) else reader).json(inPath)
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(outPath)
  }

  /** Headered CSV → JSON lines. */
  def csvToJson(spark: SparkSession, inPath: String, outPath: String,
      schema: StructType = null): Unit = {
    val reader = spark.read.option("header", "true")
    val df = (if (schema != null) reader.schema(schema) else reader).csv(inPath)
    df.write.mode(SaveMode.Overwrite).json(outPath)
  }

  /** Columnar ↔ columnar: parquet → ORC (ORC is in-box in Spark; Avro
    * needs the external spark-avro module, absent here). Schema rides
    * along — no inference involved.
    */
  def parquetToOrc(spark: SparkSession, inPath: String, outPath: String): Unit =
    spark.read.parquet(inPath).write.mode(SaveMode.Overwrite).orc(outPath)

  /** ORC → parquet. */
  def orcToParquet(spark: SparkSession, inPath: String, outPath: String): Unit =
    spark.read.orc(inPath).write.mode(SaveMode.Overwrite).parquet(outPath)
}
