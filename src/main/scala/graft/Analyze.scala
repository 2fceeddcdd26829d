package graft

import org.apache.spark.sql.SparkSession

/** Analysis-only smoke gate: resolves every query's plan (`df.schema` —
  * Catalyst analysis, zero execution) plus the `entry()` flagship against
  * a tiny SF. An environment shift that breaks analysis (the round-7
  * events/`timestamp_ntz` blackout silently killed 15 queries) becomes a
  * loud non-zero gate exit in seconds. Wired into tools/gate.sh.
  */
object Analyze {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def firstLine(e: Throwable): String = {
      val m = Option(e.getMessage).getOrElse("").trim
      val s = if (m.nonEmpty) m else e.getClass.getName
      s.takeWhile(_ != '\n').take(300)
    }
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, sfDir).schema; () }
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"ANALYZE FAIL $name: ${firstLine(e)}")
      }
    }
    try { SparkEntry.entry(spark).schema; () }
    catch { case e: Throwable =>
      failed += 1
      System.err.println(s"ANALYZE FAIL entry: ${firstLine(e)}")
    }
    println(s"ANALYZE ok=${SparkEntry.queries.size + 1 - failed} failed=$failed")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
