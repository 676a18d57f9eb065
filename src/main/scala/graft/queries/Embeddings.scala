package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Similarity._

/** Similarity search over the `embeddings` table (`array<float>` 64-dim).
  *
  * e01 is the brute-force cosine top-k baseline: the query set is tiny and
  * broadcast, so the plan is a single pass over the candidate side with no
  * shuffle of the (large) candidate table — the shape that scales to 100 TB
  * (queries broadcast, candidates partition-parallel, per-partition top-k
  * via the aggregate-then-window pattern).
  *
  * e03 is the LSH-bucketed scale path: sign-random-projection buckets make
  * candidate generation a bucket-equi-join instead of a cross product.
  */
object Embeddings {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-3 for query vectors vec_id < 5.
    "e01_knn_cosine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val q = emb.select(col("vec_id").as("q_vec_id"), col("v").as("qv")).filter(col("q_vec_id") < 5)
      val c = emb.select(col("vec_id").as("n_vec_id"), col("v").as("cv"))
      val sims = c.join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("sim").desc, col("n_vec_id").asc)
      sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("q_vec_id"), col("n_vec_id"), col("sim"))
        .orderBy(col("q_vec_id"), col("sim").desc, col("n_vec_id"))
    }),

    // Per-label centroids (IVF coarse-quantizer build step).
    "e02_label_centroids" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("label"), toDouble(col("embedding")).as("v"))
      emb.groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(avg(element_at(col("v"), 1)), 6).as("c0"),
          round(avg(element_at(col("v"), 2)), 6).as("c1"),
          round(avg(element_at(col("v"), 3)), 6).as("c2"),
          round(avg(element_at(col("v"), 4)), 6).as("c3"))
        .orderBy(col("label"))
    }),

    // LSH bucket histogram: sign-random-projection with 8 planes.
    "e03_srp_buckets" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(srpBucket(toDouble(col("embedding")), 8).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("bucket"))
    }),
  )

  private val dotSql =
    "list_sum(list_transform(range(1, len(qv) + 1), i -> qv[CAST(i AS INT)] * cv[CAST(i AS INT)]))"
  private val qNormSql =
    "sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[CAST(i AS INT)] * qv[CAST(i AS INT)])))"
  private val cNormSql =
    "sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> cv[CAST(i AS INT)] * cv[CAST(i AS INT)])))"

  val oracleSql: Map[String, String] = Map(
    "e01_knn_cosine" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          q AS (SELECT vec_id AS q_vec_id, v AS qv FROM emb WHERE vec_id < 5),
          c AS (SELECT vec_id AS n_vec_id, v AS cv FROM emb),
          sims AS (
            SELECT q_vec_id, n_vec_id,
                   round($dotSql / ($qNormSql * $cNormSql), 6) AS sim
            FROM q CROSS JOIN c WHERE q_vec_id <> n_vec_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn
            FROM sims)
          SELECT q_vec_id, n_vec_id, sim FROM ranked WHERE rn <= 3
          ORDER BY q_vec_id, sim DESC, n_vec_id""",
    "e02_label_centroids" ->
      """SELECT label, count(*) AS n,
         round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c0,
         round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c1,
         round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS c2,
         round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS c3
         FROM embeddings GROUP BY label ORDER BY label""",
    "e03_srp_buckets" -> {
      val planeTerms = (0 until 8).map { p =>
        s"""(CASE WHEN list_sum(list_transform(range(1, len(v) + 1),
              d -> v[CAST(d AS INT)] * ((CAST(d - 1 AS BIGINT) * 2654435761 + ${p * 40503})
                    % 1024 - 511.5) / 1024.0)) > 0
            THEN ${1L << p} ELSE 0 END)"""
      }
      s"""WITH b AS (SELECT CAST(${planeTerms.mkString(" + ")} AS BIGINT) AS bucket
            FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e)
          SELECT bucket, count(*) AS n_vecs FROM b GROUP BY bucket ORDER BY bucket"""
    },
  )
}
