package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a DataFrame edge list — the graph kernel
  * behind near-duplicate clustering (d11/d12): verified dup pairs in,
  * `(id, lbl)` out with lbl = component-minimum id for every vertex that
  * appears in at least one pair.
  *
  * Two interchangeable algorithms (identical fixpoint):
  *
  *  - [[minLabelPropagate]] — every vertex repeatedly adopts the min
  *    label in its neighborhood. Rounds = component DIAMETER. The right
  *    choice for near-dup graphs, whose components (boilerplate
  *    families) are dense and shallow.
  *  - [[largeStarSmallStar]] — the alternating star contractions of
  *    Kiveris et al., "Connected Components in MapReduce and Beyond"
  *    (SoCC 2014): O(log d) rounds, so pathological chains (linked-list
  *    shaped components) converge where label propagation would need a
  *    round per hop. The planetary-scale path.
  *
  * Both shuffle nothing but (id, id) pairs, localCheckpoint every round
  * (the plan stays one round deep instead of accumulating lineage), and
  * cap rounds defensively. The per-round driver action (a count / a
  * 2-column aggregate) is the Pregel-style superstep convergence check,
  * not a data collect.
  */
object ConnectedComponents {

  /** Iterative min-label propagation: label(v) <- min(label(v),
    * min(label(neighbors))) until fixpoint. Each round is one key-local
    * join + one min-aggregate. `maxRounds` is a runaway backstop, NOT a
    * tuning knob: an unconverged return silently diverges from the true
    * components (and from [[largeStarSmallStar]]), so it is set far
    * above any plausible near-dup component diameter — a graph that
    * legitimately needs it should run the O(log d) star path instead.
    */
  def minLabelPropagate(pairs: DataFrame, maxRounds: Int = 100): DataFrame = {
    val ckpt = new RoundCheckpointer(pairs.sparkSession)
    val invariants = new RoundCheckpointer(pairs.sparkSession)
    // localCheckpoint, NOT persist: the edge list joins into EVERY
    // round's plan, and a persisted frame keeps its whole logical tree —
    // Catalyst re-analyzed the upstream LSH/verify pipeline per round
    // (driver-side planning dominated tiny-graph loops; see PageRank).
    val edgesCk = invariants.next(pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v"))))
    // block count (checkpointed), sizes the round shuffles to the data
    // (tiny dup graphs iterate at 1 partition — see RoundPartitions)
    val edgeRows = edgesCk.count()
    val result = RoundPartitions.scoped(pairs.sparkSession, edgeRows) {
    // Pre-partition the loop-invariant edge table ONCE by the round-join
    // key (r17): the checkpointed RDD reports unknown partitioning, so
    // every round's join re-shuffles the edges as well as the labels — a
    // persisted hash repartition on v leaves only the O(nodes) label
    // side shuffling per round. SIZE-GATED like everything else in this
    // loop (RoundPartitions doctrine): below ~2 round partitions the
    // rounds run at 1 partition where re-shuffling a tiny edge list is
    // cheaper than the extra repartition job + cache — measured 6%
    // SLOWER on the sf0.1 dup graphs — while at scale the per-round edge
    // re-shuffle is the dominant loop cost this removes.
    val nPart = pairs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val prePartition = nPart >= 2
    val edges = if (prePartition) edgesCk.repartition(nPart, col("v")).persist()
      else edgesCk
    // round 0 folds the first propagation into initialization:
    // label(v) = min(v, min(neighbors)); lazy — the signature below
    // materializes it (r17)
    var cur = ckpt.nextLazy(edges.groupBy(col("u"))
      .agg(min(col("v")).as("nmin"))
      .select(col("u").as("id"), least(col("u"), col("nmin")).as("lbl")))
    // Fixpoint test by signature, not by joining next against cur:
    // labels only DECREASE round-over-round, so the label assignment is
    // unchanged iff the (id, lbl) set is identical — compared as
    // (count, bit_xor(h1), bit_xor(h2)) with two independently-salted
    // xxhash64 functions, one cheap scan of the already-checkpointed
    // result instead of a join-shaped shuffle per round. Ending the loop
    // early on a false match would yield wrong labels (not extra
    // rounds), so one 64-bit hash (~2^-64/round) was a silent-wrong-
    // answer mode; requiring BOTH independent hashes to collide
    // simultaneously (~2^-128/round) removes it for free — same
    // aggregate, same single scan.
    def signature(lbls: DataFrame): (Long, Long, Long) = {
      val r = lbls.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("id"), col("lbl"))), lit(0L)),
        coalesce(bit_xor(xxhash64(lit(0x9E3779B97F4A7C15L), col("id"),
          col("lbl"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var sig = signature(cur)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // LAZY checkpoint (r17): the signature aggregate below is the
      // materializing action, fusing the former per-round checkpoint job
      // into the convergence check — one job per round instead of two.
      // releaseSuperseded only runs after signature() has materialized
      // the round (the nextLazy contract).
      val next = ckpt.nextLazy(edges
        .join(cur.select(col("id").as("v"), col("lbl")), Seq("v"))
        .select(col("u").as("id"), col("lbl"))
        .unionAll(cur)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl")))
      val nextSig = signature(next)
      ckpt.releaseSuperseded() // cur's blocks — next is materialized
      converged = nextSig == sig
      sig = nextSig
      cur = next
      round += 1
    }
    if (prePartition) edges.unpersist(blocking = false)
    cur
    }
    invariants.releaseAll()
    result
  }

  /** Alternating large-star / small-star contractions. One round is
    * both phases; at the fixpoint the edge set is a forest of stars,
    * each rooted at its component minimum, read off directly as labels.
    *
    *  - large-star: every node u connects its LARGER neighbors to
    *    min(Γ⁺(u)) — emits (v, m) for v ∈ Γ(u), v > u.
    *  - small-star: every node u connects its smaller-or-equal
    *    neighborhood (smaller neighbors plus u itself) to its minimum.
    *
    * Every emitted edge is (child, root) with child > root, so the edge
    * set has a canonical orientation and the fixpoint test is a cheap
    * signature compare — (count, bit_xor of TWO independently-salted
    * xxhash64s) — instead of a full EXCEPT: a false match needs both
    * 64-bit hashes to collide at once (~2^-128 on a distinct edge set,
    * nothing self-cancels), and `maxRounds` backstops it regardless.
    */
  def largeStarSmallStar(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val ckpt = new RoundCheckpointer(spark)
    var edges = ckpt.next(pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    if (edges.isEmpty)
      return edges.select(col("u").as("id"), col("v").as("lbl"))
    val edgeRows = edges.count() // checkpointed: a block count, not a recompute
    RoundPartitions.scoped(spark, edgeRows) {

    def signature(e: DataFrame): (Long, Long, Long) =
      e.agg(count(lit(1)),
          coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)),
          coalesce(bit_xor(xxhash64(lit(0x9E3779B97F4A7C15L), col("u"),
            col("v"))), lit(0L)))
        .as[(Long, Long, Long)].head()

    def bothDirections(e: DataFrame): DataFrame =
      e.unionAll(e.select(col("v").as("u"), col("u").as("v")))

    def largeStar(e: DataFrame): DataFrame = {
      val nb = bothDirections(e)
      val mins = nb.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nb.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // (child, root), child > root
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val nb = bothDirections(e)
      val sn = nb.filter(col("v") < col("u"))
      val mins = sn.groupBy(col("u")).agg(min(col("v")).as("m"))
      // members of u's small-star: its smaller neighbors plus u itself
      val members = sn.unionAll(mins.select(col("u"), col("u").as("v")))
      members.join(mins, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var sig = signature(edges)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // LAZY checkpoint: signature() is the materializing action (one
      // job per round instead of two — r17); superseded blocks release
      // only after it returns, per the nextLazy contract
      val next = ckpt.nextLazy(smallStar(largeStar(edges)))
      val nextSig = signature(next)
      ckpt.releaseSuperseded() // `next` is materialized; old edges unused
      converged = nextSig == sig
      edges = next
      sig = nextSig
      round += 1
    }
    // stars: children point at roots; roots label themselves
    edges.select(col("u").as("id"), col("v").as("lbl"))
      .unionAll(edges.select(col("v").as("id"), col("v").as("lbl")))
      .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
    }
  }
}
