package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet under `{sfDir}/{name}.parquet`. The only
  * wrinkle is `events.ts`, written as parquet TIMESTAMP(NANOS): Spark has no
  * nanosecond timestamp type, so we read it with
  * `spark.sql.legacy.parquet.nanosAsLong` and truncate to microseconds —
  * exactly what DuckDB's nanos→TIMESTAMP cast does, keeping both engines
  * bit-identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** events with `ts` as a microsecond TimestampType (floor-truncated from ns).
    *
    * Sessions built via [[GraftSession]] (or the Verify/Bench mains) already
    * carry the nanosAsLong flag; for a foreign session we set it as a
    * fallback — TIMESTAMP(NANOS) schema inference throws without it and
    * parquet exposes no per-read option (ParquetOptions has no nanos key). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    if (!spark.conf.getOption(NanosConf).contains("true"))
      spark.conf.set(NanosConf, "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      // integral `div`, not `/`: epoch-ns ≈ 1.7e18 overflows double precision
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast(TimestampType))
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
