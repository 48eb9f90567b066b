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
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", BloomFilterMaxBits)
      .config("spark.shuffle.sort.bypassMergeThreshold", BypassMergeThreshold)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        CoalesceMinPartitionSize)

  /** One shared local-session conf block for every driver-contract main
    * (Bench, Verify) and dev tool (ProfileQuery, PlanDump): the engine's
    * session confs live HERE so correctness always runs under the same
    * configs as the bench and dumped plans are the benched plans (the
    * r15 advice: PlanDump was missing two of them). `cpus` sizes both the
    * master and shuffle parallelism per the driver contract. */
  def localBuilder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", BloomFilterMaxBits)
      .config("spark.shuffle.sort.bypassMergeThreshold", BypassMergeThreshold)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        CoalesceMinPartitionSize)

  /** AQE's partition coalescing floor, lowered 1m → 128k: with
    * parallelism-first coalescing the target size is
    * max(totalBytes/parallelism, minPartitionSize), so a compute-DENSE
    * stage whose shuffled bytes are small (a postings join fanning out
    * behind a 4 MB exchange, a gram self-join) collapses to 2–4 tasks at
    * the default floor and serializes minutes of per-row work behind
    * kilobytes of input (q_sparse_cosine_topk's dot stage ran on 2 of 32
    * cores). At production shuffle sizes totalBytes/parallelism dwarfs
    * either floor, so the setting is inert there; it only stops
    * byte-based coalescing from starving small-byte/heavy-CPU stages. */
  val CoalesceMinPartitionSize: String = "128k"

  /** Never use the bypass-merge shuffle writer: it creates one file per
    * REDUCE partition per map task, so a map stage writing an R-partition
    * shuffle pays R file creations per task — thread dumps of the bench
    * showed every executor thread serialized on `FileOutputStream.open0`
    * (32 creations per tiny task; q_kcore's per-round degree stages spent
    * 53 s of task time on ~15k rows, 1.7 s once disabled). With the
    * threshold at 0, small-reducer-count shuffles take the
    * UnsafeShuffleWriter path instead: one data + one index file per map
    * task, binary records, radix sort on partition id. At production
    * scale this conf is inert — `spark.sql.shuffle.partitions` is sized
    * in the thousands, far above the default 200 threshold, so the
    * bypass writer never fires there anyway; the only behavior change is
    * at small partition counts, where file-creation count is exactly
    * what dominates. */
  val BypassMergeThreshold: String = "0"

  /** Runtime bloom-filter join pruning stays ON, but its size is bounded
    * at 512 KiB (4M bits) instead of Spark's 8 MiB ceiling: over
    * stats-free intermediates (checkpointed / cached subplans) the
    * optimizer's cardinality estimate inflates toward the ceiling and the
    * resulting 6–9 MiB filter is serialized into EVERY task binary of the
    * application side — multi-MiB per task launch on a cluster, for
    * creation sides that actually hold a few thousand rows (diagnosed on
    * q_local_clustering: disabling injection removed all large-task-binary
    * warnings; the closure lineage was already checkpoint-truncated). At
    * 4M bits a genuinely selective filter still covers ~400k creation-side
    * items at ~10 bits/item; a deployment with provably larger selective
    * dims can raise the conf. */
  val BloomFilterMaxBits: String = (4L * 1024 * 1024).toString

  /** Attach graft functionality to an existing session (e.g. a shared
    * notebook session created elsewhere). */
  def attach(spark: SparkSession): SparkSession = {
    plans.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
