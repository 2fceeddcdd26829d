package graft

import org.apache.spark.sql.SparkSession

/** Plan audit main: prints `explain("formatted")` for the headline queries
  * so scan pruning (`PushedFilters`/`ReadSchema`), join strategies, and
  * WholeStageCodegen spans can be reviewed. Not part of the driver
  * protocol. Usage: `sbt "runMain graft.Plans [query ...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n=============== $name ===============")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
