package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): run queries with a listener and print
  * where the time goes — jobs, stages, tasks, per-stage executor time vs
  * wall clock, shuffle bytes. Args: q_a,q_b,... (required).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').map(_.trim).toSeq)
      .getOrElse(sys.error("usage: ProfileQuery q_a,q_b[,...]"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" → A/B a config experiment
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';')).map(_.split('=')).collect {
        case Array(k, v) => (k.trim, v.trim)
      }
    // shared conf block — see GraftSession.localBuilder
    val b0 = GraftSession.localBuilder(cpus)
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageRec(id: Int, name: String, nTasks: Int,
        submitted: Long, completed: Long, execRunMs: Long, gcMs: Long,
        shufReadMb: Double, shufWriteMb: Double, spillMb: Double)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        // RDD scope names identify the plan operators the stage executes
        // (AQE-materialized stages all share an uninformative callsite)
        val ops = si.rddInfos.sortBy(_.id).flatMap(_.scope)
          .map(_.name.takeWhile(_ != '\n')).distinct.mkString(">")
        stages.add(StageRec(si.stageId,
          si.name.takeWhile(_ != '\n').take(24) + " | " + ops,
          si.numTasks,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          tm.executorRunTime, tm.jvmGCTime,
          tm.shuffleReadMetrics.totalBytesRead / 1e6,
          tm.shuffleWriteMetrics.bytesWritten / 1e6,
          tm.diskBytesSpilled / 1e6))
      }
    }
    // warm-up, mirrors Bench
    SparkEntry.queries("q_agg_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    graft.pipeline.TextPipeline.minhashSignatures(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // run 1 untimed (codegen warm), run 2 profiled
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      stages.clear(); jobs.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // let listener events drain
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(_.id)
      val span = ss.map(s => s.completed - s.submitted).sum / 1e3
      println(f"== $name wall=$wall%.2fs jobs=${jobs.get}%d stages=${ss.length}%d " +
        f"stageSpanSum=$span%.2fs taskRun=${ss.map(_.execRunMs).sum / 1e3}%.2fs " +
        f"gc=${ss.map(_.gcMs).sum / 1e3}%.2fs tasks=${ss.map(_.nTasks).sum}%d")
      ss.sortBy(s => -(s.completed - s.submitted)).take(12).foreach { s =>
        println(f"   stage ${s.id}%4d span=${(s.completed - s.submitted) / 1e3}%6.2fs " +
          f"tasks=${s.nTasks}%3d run=${s.execRunMs / 1e3}%6.2fs gc=${s.gcMs / 1e3}%5.2fs " +
          f"sr=${s.shufReadMb}%7.1fMB sw=${s.shufWriteMb}%7.1fMB spill=${s.spillMb}%6.1fMB ${s.name.take(160)}%s")
      }
    }
    spark.stop()
  }
}
