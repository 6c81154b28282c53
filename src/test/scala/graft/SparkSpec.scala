package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** One shared local session for the whole suite (sbt forks a single test
  * JVM; specs run sequentially against it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Small typed DataFrame builder for fixtures. */
  def df(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** The FIXTURES-style `users` seed: the reference's integration specs
    * run against 5-row seed tables (spec/support/dumps/mysql/
    * forklift_test_source_a.sql) — same shape here. */
  val usersSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  def usersRows: Seq[Row] = (1L to 5L).map { i =>
    Row(i, s"user$i@example.com", s"First$i", s"Last$i",
      ts(s"2024-01-0$i 10:00:00"), ts(s"2024-01-0$i 12:00:00"))
  }

  def usersDf: DataFrame = df(usersSchema, usersRows)
}
