package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: one entry per implemented operator
  * from SURVEY.md §2 (plus the training-data-pipeline extensions). Each
  * entry with a matching `oracleSql` is verified against DuckDB by the
  * driver at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Documents.queries ++
    graft.queries.Embeddings.queries ++
    graft.queries.Warc.queries ++
    graft.queries.Multimodal.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
    graft.queries.Documents.oracleSql ++
    graft.queries.Embeddings.oracleSql ++
    graft.queries.Warc.oracleSql ++
    graft.queries.Multimodal.oracleSql
}
