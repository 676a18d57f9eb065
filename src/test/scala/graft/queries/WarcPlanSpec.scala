package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the WARC headline queries. These guard plan
  * SHAPE, not results: the round-8 audit found w29's `text IS NOT NULL`
  * filter predicate-pushed below the extraction projection, so the full
  * decode->parse->extract kernel ran twice per page (Catalyst has no
  * cross-operator subexpression elimination). The fix removed the filter;
  * this spec fails if any future edit reintroduces a duplicated kernel.
  */
class WarcPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").appName("warc-plan-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def physicalPlan(name: String): String =
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  /** Evaluation sites of the extraction kernel. A Final-mode
    * HashAggregate PRINTS the whole aggregate expression but only merges
    * the partial buffers, so aggregate lines beyond the first are
    * display-only, not evaluations; Filter/Project lines each evaluate.
    */
  private def extractionSites(plan: String): (Int, Int) = {
    val lines = plan.linesIterator.filter(_.contains("extract_plain_text")).toSeq
    val (aggLines, rowLines) = lines.partition(_.contains("Aggregate"))
    (rowLines.size, math.min(aggLines.size, 1))
  }

  test("w29: extraction kernel evaluates exactly once, never in a Filter") {
    val plan = physicalPlan("w29_training_pipeline")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("extract_plain_text")),
      s"extract_plain_text pushed into a Filter (double evaluation):\n$plan")
    val (rowSites, aggSites) = extractionSites(plan)
    assert(rowSites + aggSites === 1,
      s"extract_plain_text must evaluate once, found row=$rowSites agg=$aggSites:\n$plan")
  }

  test("w19: extraction kernel evaluates exactly once, never in a Filter") {
    val plan = physicalPlan("w19_html_extract10k")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("extract_plain_text")),
      s"extract_plain_text pushed into a Filter (double evaluation):\n$plan")
    val (rowSites, aggSites) = extractionSites(plan)
    assert(rowSites + aggSites === 1,
      s"extract_plain_text must evaluate once, found row=$rowSites agg=$aggSites:\n$plan")
  }
}
