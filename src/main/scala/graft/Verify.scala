package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only iteration aid: SPARK_GRAFT_ONLY=q1,q2 dumps a subset
    // (the driver never sets it, so the gate always sees every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // SPARK_GRAFT_STABILITY=1: rerun each query with a perturbed
    // shuffle-partition count and BIT-compare (doubleToRawLongBits, so
    // -0.0 vs 0.0 and last-ulp drift count as differences) against the
    // parquet the driver will hash. An accumulation-order-sensitive
    // emission becomes a self-detected UNSTABLE row instead of a
    // driver-discovered hash flake.
    val stability = sys.env.get("SPARK_GRAFT_STABILITY").contains("1")
    def renderSorted(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      def render(v: Any): String = v match {
        case null => "∅"
        case d: java.lang.Double => "d" + java.lang.Double.doubleToRawLongBits(d)
        case f: java.lang.Float => "f" + java.lang.Float.floatToRawIntBits(f)
        case b: Array[Byte] => "b" + java.util.Base64.getEncoder.encodeToString(b)
        case s: scala.collection.Seq[_] => s.map(render).mkString("[", ",", "]")
        case m: scala.collection.Map[_, _] =>
          m.map { case (k, x) => render(k) + "→" + render(x) }
            .toSeq.sorted.mkString("{", ",", "}")
        case r: org.apache.spark.sql.Row => r.toSeq.map(render).mkString("(", ",", ")")
        case x => x.toString
      }
      df.collect().toSeq.map(render).sorted
    }
    // self-check ledger: per-query run status written alongside the
    // parquet dumps. Two rounds in a row the driver's correctness
    // artifact arrived empty while the engine verified clean — this
    // makes "engine broke" vs "harness dropped the artifact" provable
    // from the output dir alone.
    var status = List.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        val rows = spark.read.parquet(s"$outDir/$name").count()
        val note =
          if (!stability) ""
          else {
            val first = renderSorted(spark.read.parquet(s"$outDir/$name"))
            val prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions",
              (prev.toInt * 2 + 3).toString)
            val second = try renderSorted(fn(spark, sfDir))
              finally spark.conf.set("spark.sql.shuffle.partitions", prev)
            if (first == second) " stable"
            else {
              val i = first.zip(second).indexWhere(p => p._1 != p._2)
              val d = if (i >= 0) s"row $i: ${first(i).take(120)} vs ${second(i).take(120)}"
                      else s"sizes ${first.size} vs ${second.size}"
              System.err.println(s"[verify] $name UNSTABLE under partition perturbation: $d")
              " UNSTABLE"
            }
          }
        status ::= (name -> s"ok rows=$rows cols=${df.columns.length}$note")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        status ::= (name -> s"error ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val nOk = status.count(_._2.startsWith("ok"))
    val selfJson = s"""{"n_queries":${status.size},"n_ok":$nOk,"n_error":${status.size - nOk},""" +
      s""""sf":${q(sfDir)},"status":${status.sortBy(_._1).map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_self.json"), selfJson)
    System.err.println(s"[verify] self-check: $nOk/${status.size} ok")
    spark.stop()
  }
}
