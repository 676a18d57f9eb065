package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.events]] must load every parquet physical type the driver's
  * testdata generator has shipped for `events.ts`:
  *
  *   - TIMESTAMP(NANOS): no native Spark type — under nanosAsLong it
  *     surfaces as a raw epoch-nanos long (fabricated here as a plain
  *     int64 column, which exercises the identical LongType branch),
  *   - timestamp[us] naive: surfaces as TIMESTAMP_NTZ under Spark 4's
  *     default inferTimestampNTZ,
  *   - timestamp[us] UTC-adjusted: surfaces as TIMESTAMP.
  *
  * All three must converge to the same session-tz TIMESTAMP instants so
  * every event query behaves identically across testdata generations.
  */
class TablesEventsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").appName("tables-events-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // one instant, expressed per physical encoding
  private val microsEpoch = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  private def writeEvents(dir: java.nio.file.Path, tsType: DataType, tsValue: Any): String = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, tsValue)), schema)
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private def loadedTs(dir: String): (DataType, Long) = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      "events loader must always surface session-tz TIMESTAMP")
    val micros = df.selectExpr("unix_micros(ts)").collect()(0).getLong(0)
    (df.schema("ts").dataType, micros)
  }

  test("raw long nanos (TIMESTAMP(NANOS) generation) → micros instant") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_nanos")
    writeEvents(dir, LongType, microsEpoch * 1000L)
    assert(loadedTs(dir.toString)._2 === microsEpoch)
  }

  test("timestamp[us] naive (TIMESTAMP_NTZ generation) → same instant under UTC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_ntz")
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      microsEpoch / 1000000L, (microsEpoch % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
    writeEvents(dir, TimestampNTZType, ldt)
    assert(loadedTs(dir.toString)._2 === microsEpoch)
  }

  test("timestamp[us] UTC-adjusted (TIMESTAMP generation) → passthrough") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_ltz")
    writeEvents(dir, TimestampType,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        microsEpoch / 1000000L, (microsEpoch % 1000000L) * 1000L)))
    assert(loadedTs(dir.toString)._2 === microsEpoch)
  }

  test("NTZ load is session-timezone independent (non-UTC external session)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_tz")
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      microsEpoch / 1000000L, (microsEpoch % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
    writeEvents(dir, TimestampNTZType, ldt)
    // an externally-built session need not run UTC: the loader must still
    // interpret the naive wall-clock as UTC, not as session-local time
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val micros = Tables.events(spark, dir.toString)
        .selectExpr("unix_micros(ts)").collect()(0).getLong(0)
      assert(micros === microsEpoch)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
