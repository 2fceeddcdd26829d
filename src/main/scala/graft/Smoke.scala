package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quick local smoke of the driver contract: entry() rows>0 plus a few
  * semantic spot-checks. Not part of the driver protocol. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3, 48)
    println("SHORT_SUBJ=" + df.filter(col("session_id") === "").count())
    println("EPOCH0=" + df.filter(
      col("message_timestamp") === to_timestamp(lit("1970-01-01 00:00:00"))).count())
    spark.stop()
  }
}
