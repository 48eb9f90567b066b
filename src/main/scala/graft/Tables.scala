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

  /** Spread keys for the compute-carrying fact tables. The driver's test
    * fixtures are ONE parquet file with ONE row group per table, so every
    * scan is a single split and all per-row work fused into the scan
    * stage (regex tokenization, from_json, quantized explodes) runs on
    * one core regardless of the session's parallelism — the guide's
    * "unsplittable input" skew (§2.5). [[spread]] hash-repartitions such
    * a table by its unique key right after the read, ONLY when the input
    * layout under-parallelizes the session (fewer files than shuffle
    * partitions AND a small total size): at production scale a table is
    * thousands of splits and the condition is false, so no extra
    * exchange is ever paid there. Dimension tables (region…part) are
    * broadcast-sized and excluded. */
  private val spreadKeys: Map[String, Seq[String]] = Map(
    "documents" -> Seq("doc_id"),
    "events" -> Seq("event_id"),
    "embeddings" -> Seq("vec_id"),
    "orders" -> Seq("o_orderkey"))

  private val SpreadMaxBytes = 512L * 1024 * 1024

  /** Total size of a scan's input files, resolved through the Hadoop
    * FileSystem API so hdfs://s3a:// URIs and URL-encoded local paths size
    * correctly (the old `new java.io.File(f.stripPrefix("file:"))` probe
    * returned 0 for both, silently disabling the spread on exactly the
    * remote single-split inputs it exists for). Unresolvable files count
    * as 0 — the `bytes > 0` gate then fails closed (no spread), the safe
    * direction. */
  private[graft] def inputBytes(spark: SparkSession, files: Seq[String]): Long =
    files.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(new java.net.URI(f))
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p).getLen
      } catch { case _: Exception => 0L }
    }.sum

  private def spread(spark: SparkSession, df: DataFrame, name: String): DataFrame =
    spreadKeys.get(name) match {
      case Some(keys) =>
        val files = df.inputFiles
        val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
        val small = files.length < parts && {
          val bytes = inputBytes(spark, files.toSeq)
          bytes > 0 && bytes < SpreadMaxBytes
        }
        if (small)
          df.repartition(parts, keys.map(org.apache.spark.sql.functions.col): _*)
        else df
      case None => df
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spread(spark, spark.read.parquet(s"$sfDir/$name.parquet"), name)

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
    val raw = spread(spark, spark.read.parquet(s"$sfDir/events.parquet"), "events")
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
