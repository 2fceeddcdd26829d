package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one or more queries: wall time per Spark JOB with
  * its description/call site, so multi-job operators (iterative solves,
  * eager stage barriers) can be attributed. Audit aid like [[Plans]] —
  * not part of the driver protocol.
  * Usage: `sbt "runMain graft.Profile <query> [query ...]"`;
  * `SPARK_GRAFT_SF_DIR`/`SPARK_GRAFT_CPUS` as in [[Bench]]. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))))
          .getOrElse("")
        // AQE materializes each shuffle stage as its own job with no
        // callsite — the stage NAMES (deduped) are the attribution
        val stages = js.stageInfos.map(_.name.takeWhile(_ != '\n'))
          .distinct.mkString(" | ")
        val label = if (desc.nonEmpty) s"$desc  [$stages]" else s"[$stages]"
        starts.put(js.jobId, (System.nanoTime(), label))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          lines.add(f"job ${je.jobId}%4d  ${dt}%8.3f s  $desc")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          val rt = m.executorRunTime / 1e3
          val in = m.inputMetrics.bytesRead / 1e6
          val sr = m.shuffleReadMetrics.totalBytesRead / 1e6
          val sw = m.shuffleWriteMetrics.bytesWritten / 1e6
          val sp = (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6
          lines.add(f"  stage ${si.stageId}%4d  tasks ${si.numTasks}%4d  " +
            f"cpu ${rt}%8.2f s  in ${in}%8.1f MB  sRead ${sr}%8.1f MB  " +
            f"sWrite ${sw}%8.1f MB  spill ${sp}%8.1f MB")
        }
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup (JIT/codegen), caches released — mirror Bench
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      util.OperatorCaches.release(spark)
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      util.OperatorCaches.release(spark)
      Thread.sleep(300) // let late job-end events drain
      println(s"\n===== $name  total ${f"$total%.3f"} s =====")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
