package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time processing over WARC-record streams — the Structured
  * Streaming rendition of the reference's Beam layer, where records are
  * timestamped by WARC-Date (beam/warcio.py:155-157). Batch DataFrames
  * run through the same transforms (Spark's unified API), which is how
  * these are unit-tested.
  */
object EventTime {

  /** Tumbling-window record-type counts with a watermark on record_date:
    * the canonical crawl-monitoring aggregation. Late records beyond the
    * watermark are dropped (state stays bounded at 100 TB/day rates).
    */
  def windowedTypeCounts(records: DataFrame, windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    records
      .withWatermark("record_date", watermark)
      .groupBy(window(col("record_date"), windowDuration), col("record_type"))
      .agg(count(lit(1)).as("n_records"),
           sum(col("content_length")).as("total_bytes"))

  /** Per-host crawl progress via arbitrary stateful processing
    * (mapGroupsWithState): running record count + last-seen event time
    * per target host, with processing-time state expiry so abandoned
    * hosts don't accumulate state.
    */
  final case class HostProgress(host: String, nRecords: Long, lastSeenMicros: Long)

  def hostProgress(records: DataFrame,
      stateTimeout: String = "1 hour"): Dataset[HostProgress] = {
    val spark = records.sparkSession
    import spark.implicits._
    val byHost = records
      .select(
        regexp_extract(
          graft.functions.WarcCols.targetUri(col("headers")),
          "^[a-z]+://([^/]+)", 1).as("host"),
        col("record_date").cast("long").as("ts"))
      .filter(col("host") =!= "")
      .as[(String, Long)]
      .groupByKey(_._1)

    byHost.mapGroupsWithState[HostProgress, HostProgress](
      GroupStateTimeout.ProcessingTimeTimeout) {
      case (host, rows, state: GroupState[HostProgress]) =>
        if (state.hasTimedOut) {
          val last = state.get
          state.remove()
          last
        } else {
          val prev = state.getOption.getOrElse(HostProgress(host, 0L, 0L))
          var n = prev.nRecords
          var last = prev.lastSeenMicros
          rows.foreach { case (_, ts) => n += 1; last = math.max(last, ts) }
          val next = HostProgress(host, n, last)
          state.update(next)
          state.setTimeoutDuration(stateTimeout)
          next
        }
    }
  }

  final case class DedupState(firstSeenMicros: Long, nDuplicates: Long)
  final case class DedupEmit(fp: String, kind: String, firstSeenMicros: Long,
      nDuplicates: Long)

  /** First-occurrence gate as ARBITRARY stateful processing
    * (flatMapGroupsWithState): functionally where
    * `dropDuplicatesWithinWatermark` ends, this begins — the pipeline
    * also gets dedup TELEMETRY. Per content fingerprint the state
    * carries (first-seen time, suppressed-duplicate count); the first
    * occurrence emits a `first` row immediately, later occurrences
    * emit nothing but count, and when the group's event-time timeout
    * (the watermark) expires, a final `expired` row reports how many
    * duplicates the gate absorbed — then the state is gone, which is
    * what bounds memory at 100 TB/day ingest: live state is only the
    * fingerprints seen within the watermark horizon.
    * Input columns: ts (timestamp), fp (string).
    */
  def firstSeenGate(records: DataFrame,
      watermark: String = "1 day"): Dataset[DedupEmit] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.select(col("ts"), col("fp"))
      .withWatermark("ts", watermark)
      .as[(java.sql.Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[DedupState, DedupEmit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (fp, rows, state: GroupState[DedupState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(DedupEmit(fp, "expired", s.firstSeenMicros, s.nDuplicates))
          } else {
            val times = rows.map(r =>
              r._1.getTime * 1000L + (r._1.getNanos % 1000000L) / 1000L).toArray
            val prev = state.getOption
            val first = prev.map(_.firstSeenMicros)
              .getOrElse(times.min)
            val dups = prev.map(_.nDuplicates).getOrElse(-1L) + times.length
            state.update(DedupState(first, dups))
            // Spark RESETS a group's timeout on every function
            // invocation, so it must be re-armed on each call — but
            // clamped above the current watermark: when a duplicate
            // arrives for a key whose expiry (first + horizon) is
            // already at/behind the watermark, re-arming with the raw
            // timestamp THROWS and kills the query; the clamp instead
            // extends that key's life by one more horizon
            state.setTimeoutTimestamp(
              math.max(first / 1000L, state.getCurrentWatermarkMs() + 1L),
              watermark)
            if (prev.isEmpty) Iterator.single(DedupEmit(fp, "first", first, 0L))
            else Iterator.empty
          }
      }
  }

  /** Start the windowed aggregation as a streaming query into a named
    * in-memory sink (for tests / interactive monitoring).
    */
  def startToMemory(records: DataFrame, queryName: String,
      windowDuration: String = "1 hour") =
    windowedTypeCounts(records, windowDuration)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
}
