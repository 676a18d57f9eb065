package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (see TESTDATA.md).
  *
  * Every table is a single parquet file under the scale-factor dir. At
  * cluster scale these would be directories of many files / a catalog
  * table; nothing here assumes single-file inputs.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.ts has shipped as two physical parquet types across testdata
    * generations: TIMESTAMP(NANOS) (no native Spark type — surfaces as a
    * raw long of epoch nanos under nanosAsLong) and plain timestamp[us]
    * (surfaces as TIMESTAMP_NTZ under inferTimestampNTZ, or TIMESTAMP
    * otherwise). Branch on the ACTUAL loaded dtype so either generation
    * reads correctly; downstream queries always see session-tz TIMESTAMP.
    *
    * nanos → micros uses integer div (a double division would lose
    * precision on 1.7e18-scale epochs). NTZ → LTZ is wall-clock-preserving
    * under the UTC session timezone set in Verify/Bench, matching what the
    * DuckDB oracle computes from the naive timestamp[us] column.
    *
    * nanosAsLong is ALSO set at session build in Verify/Bench; the set here
    * is a safety net for externally-built sessions. It only affects
    * TIMESTAMP(NANOS) parquet columns (none of the other tables have any),
    * so it cannot change semantics of other reads.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, convert_timezone, expr, lit, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000L")))
      case TimestampNTZType =>
        // the NTZ wall-clock is UTC (driver-generated naive timestamps);
        // a bare cast would interpret it in the SESSION timezone, which
        // is only correct under the UTC sessions Verify/Bench build.
        // Convert explicitly so an externally-built session in any
        // timezone reads the same instants the DuckDB oracle computes.
        // The rebase target is current_timezone(), NOT the conf value at
        // DataFrame-construction time: the optimizer folds it to the
        // session timezone of the SAME query execution the NTZ->LTZ cast
        // is analyzed in, so changing spark.sql.session.timeZone between
        // load and action cannot skew the instants (both sides always
        // see one timezone).
        df.withColumn("ts",
          convert_timezone(lit("UTC"), expr("current_timezone()"), col("ts"))
            .cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet-loaded type $other")
    }
  }
  /** The per-document/per-embedding kernels (simhash, minhash, lang
    * detect, ANN) are CPU-bound, but the test corpus is ONE small parquet
    * file with ONE row group — an unsplittable single-partition scan that
    * serializes every kernel onto one core. Spread such inputs across the
    * cluster; when the scan already carries >= defaultParallelism splits
    * (any real-scale input), this is skipped and no shuffle is added.
    */
  private val spreadDecision = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def spreadIfTiny(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val target = s.sparkContext.defaultParallelism
    // Estimate the scan's split count from the file listing alone (no
    // .rdd conversion — that forces physical planning per table load).
    // Spark byte-splits files at maxPartitionBytes, so the estimate is
    // sum(ceil(size / maxPartitionBytes)); it over-counts when a file has
    // fewer row groups than byte-splits, which only makes the repartition
    // MORE likely on tiny inputs — the safe direction. Cached per path.
    val tiny = spreadDecision.computeIfAbsent(path, { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      // conf value may carry a unit suffix ("134217728b", "128m"...)
      val maxSplit = try {
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          s.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      } catch { case _: Exception => 134217728L }
      val splits = fs.listStatus(hp).iterator.filter(_.isFile)
        .map(st => math.max(1L, (st.getLen + maxSplit - 1) / maxSplit)).sum
      java.lang.Boolean.valueOf(splits < target)
    })
    if (tiny) df.repartition(target) else df
  }
  def documents(s: SparkSession, dir: String): DataFrame =
    spreadIfTiny(s, s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame =
    spreadIfTiny(s, s"$dir/embeddings.parquet")
  /** lineitem behind the same tiny-input spread as documents/embeddings
    * — for consumers whose per-row kernel is CPU-bound (q17's md5 sample
    * key + exact-percentile buffering serialized on the single-row-group
    * scan: 2.5 s of its 2.7 s wall ran on ONE core). Cheap-aggregate
    * consumers keep the plain narrow scan. No-op on any real-scale
    * (multi-split) input, like every spreadIfTiny use.
    */
  def lineitemSpread(s: SparkSession, dir: String): DataFrame =
    spreadIfTiny(s, s"$dir/lineitem.parquet")
}
