package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. local[2] keeps scheduling overhead low;
  * shuffle.partitions=4 keeps small-data exchanges cheap while still
  * exercising multi-partition semantics. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Smallest driver-generated corpus (TESTDATA.md). */
  val Sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    // suites share one session: drop this suite's cache()/persist() entries
    // so later suites inspect clean plans and memory
    spark.catalog.clearCache()
    super.afterAll()
  }
}
