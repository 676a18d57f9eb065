package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration over a DataFrame edge list — used for
  * cluster-representative selection on the near-dup graph (the most
  * central member of a boilerplate family is a better keeper than the
  * arbitrary min-id) and for host-graph authority scoring.
  *
  * Design for scale and for cross-engine determinism:
  *  - a FIXED number of iterations (no convergence action): the whole
  *    loop is the same computation graph on every engine;
  *  - each iteration's ranks round to 9 decimals — double summation
  *    order differs between engines/partitionings, and without the
  *    per-round rounding a 1-ulp drift would compound across rounds;
  *  - per round: one key-local join (ranks to edges by source) and one
  *    aggregation (sum by destination) — only (id, double) pairs
  *    shuffle; localCheckpoint per round via [[RoundCheckpointer]]
  *    keeps the plan one round deep and releases superseded blocks.
  *
  * Uses the per-node formula rank = (1 - d) + d * sum(in-rank/degree)
  * (Page et al. 1999 as commonly implemented; ranks average to 1, not
  * sum to 1, so scores are comparable across graph sizes).
  */
object PageRank {

  /** `pairs` (doc_a, doc_b) is treated as an UNDIRECTED graph: each
    * pair contributes both directed edges. Returns (id, rank).
    */
  def undirected(pairs: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val ckpt = new RoundCheckpointer(pairs.sparkSession)
    val invariants = new RoundCheckpointer(pairs.sparkSession)
    // edges persists until weightedEdges exists: deg and weightedEdges
    // BOTH materialize it, and `pairs` is typically an expensive
    // upstream DAG (the LSH/verify pipeline) that must not run twice
    val edges = pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .persist()
    val deg = edges.groupBy(col("u"))
      .agg(count(lit(1)).cast("double").as("dg"))
      .persist()
    // The edge list and the degree table are loop-invariant: join them
    // ONCE into (u, v, dg) so each round pays a single join (ranks into
    // the weighted edges) instead of two. localCheckpoint, NOT persist:
    // a persisted frame reuses blocks at runtime but keeps its whole
    // logical plan — with an LSH/verify pipeline upstream, Catalyst
    // re-analyzed that entire tree on EVERY round's plan, and the
    // driver-side planning dominated the loop (measured ~780 ms/round
    // on a 65-node graph at sf0.001; ~60 ms after truncation).
    // At scale this is the table to pre-bucket by u.
    val weightedEdges = invariants.next(edges.join(deg, Seq("u")))
    // materializes deg and sizes the round shuffles: rows per round is
    // O(nodes), so tiny dup graphs iterate at 1 partition instead of
    // paying a session-width stage of empty tasks per round
    val nodes = deg.count()
    val result = RoundPartitions.scoped(pairs.sparkSession, nodes) {
      // Pre-partition the loop-invariant (u, v, dg) table ONCE by the
      // round-join key (r17): the checkpointed RDD reports unknown
      // partitioning, so every round's join re-shuffles the EDGE side as
      // well as the ranks. A persisted hash repartition on u (at the
      // scoped round partition count, so ENSURE_REQUIREMENTS recognizes
      // it) leaves only the O(nodes) ranks side crossing the wire per
      // round — one edge shuffle total instead of one per round: the
      // pre-bucketed edge table the scale comment below promised.
      // SIZE-GATED (RoundPartitions doctrine): at 1-partition round
      // scale the extra repartition job + cache measured 6% SLOWER than
      // just re-shuffling the tiny edge list each round.
      val nPart = pairs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      val prePartition = nPart >= 2
      val we = if (prePartition) weightedEdges.repartition(nPart, col("u")).persist()
        else weightedEdges
      var ranks = ckpt.next(deg.select(col("u").as("id"), lit(1.0).as("rank")))
      // the loop-invariant tables are checkpointed/counted; their
      // lineage (and the upstream pipeline's cache) can go before the
      // rounds start
      edges.unpersist(blocking = false)
      deg.unpersist(blocking = false)
      var i = 0
      while (i < iterations) {
        val contribs = we
          .join(ranks.select(col("id").as("u"), col("rank")), Seq("u"))
          .select(col("v").as("id"), (col("rank") / col("dg")).as("c"))
        val next = ckpt.next(contribs.groupBy(col("id"))
          .agg(round(lit(1.0 - damping) + lit(damping) * sum(col("c")), 9).as("rank")))
        ckpt.releaseSuperseded()
        ranks = next
        i += 1
      }
      if (prePartition) we.unpersist(blocking = false)
      ranks
    }
    invariants.releaseAll()
    result
  }
}
