package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional trailing names select a query subset (fast re-verification
    // of individual operators after an oracle/plan change); unknown names
    // fail fast like graft.Bench
    val Array(sfDir, outDir) = args.take(2)
    val subset = args.drop(2).toSet
    val unknown = subset -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val selected =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset).toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // wide initial exchanges + AQE coalesce — see Bench.scala (the
      // sf10 battery's large-SF spill fix; a no-op at the small SFs)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // release the operator-level persists so 50+ queries don't
        // accumulate cached signature tables in one session — scoped to
        // THIS session's graft-registered caches (releaseAll would also
        // drop another live session's registered caches, and clearCache
        // any caller-owned ones, in an embedding process)
        graft.util.OperatorCaches.release(spark)
        // ...and nudge the ContextCleaner: finished queries' SHUFFLE
        // FILES are deleted only when their dependencies are GC'd, and
        // a long single-JVM battery at a large SF otherwise accumulates
        // them until the disk fills (observed: the sf10 full battery
        // died with SPILL_OUT_OF_MEMORY "No space left on device" ~80
        // queries in; Spark's own periodicGC defaults to 30 min —
        // far too slow for a battery that writes tens of GB of shuffle
        // per query)
        System.gc()
      }
    }
    // JSON escape (graft.util.JsonText): a tab or CR in builder-authored
    // SQL would otherwise make the driver's json.load fail and silently
    // zero the round's correctness.
    def q(s: String): String = graft.util.JsonText.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
