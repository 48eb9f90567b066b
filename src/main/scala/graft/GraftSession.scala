package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession wired the way the engine expects —
  * graft extensions (native st_intersects + bbox-prefilter rule), UTC
  * session time zone, AQE on, and shuffle parallelism sized to the
  * cluster instead of the 200 default.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", classOf[plans.GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // TIMESTAMP(NANOS) parquet (e.g. the events table) is unreadable
      // without this legacy flag, and parquet has no per-read option for
      // it — set once at session construction (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Attach graft functionality to an existing session (e.g. a shared
    * notebook session created elsewhere). */
  def attach(spark: SparkSession): SparkSession = {
    plans.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
