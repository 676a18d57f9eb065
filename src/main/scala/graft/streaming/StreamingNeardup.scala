package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate suppression — dedup-on-ARRIVAL over 64-bit
  * SimHash codes, the stateful-streaming counterpart of the batch banded
  * search ([[graft.queries.Multimodal.bandedHammingPairs]], d22) and the
  * batch incremental dedup (d20). At 100 TB ingest this is the operator
  * that keeps a crawl's working set clean without nightly batch passes:
  * per-bucket state is ≤64 16-byte codes keyed by (band, 16-bit key) —
  * bounded by construction, no watermark needed (near-dup state never
  * expires; a year-old page still deduplicates today's re-crawl).
  *
  * Semantics: a document is MATCHED iff some band bucket it lands in
  * already holds a code within `maxHamming` from an EARLIER arrival —
  * an earlier micro-batch, or the same micro-batch with a smaller
  * doc_id (the iterator is sorted, so intra-batch order is
  * deterministic). Matched-or-not, the arrival's code joins the bucket
  * state (non-recursive suppression: a suppressed doc still witnesses
  * later dups — same doctrine as d20's "first occurrence wins" with
  * every occurrence indexed).
  *
  * Skew guard: bucket state CAPS at [[MaxBucket]] prefix codes plus a
  * [[RingSize]]-slot second-chance ring — a mega-bucket (the d08
  * regime) stops growing its witness prefix but keeps matching against
  * (a) its first 64 arrivals and (b) the ring, so state stays
  * O(buckets × (64+16) × 16 B) no matter how degenerate the corpus.
  * Why the ring: a prefix poisoned by 64 mutually-distant witnesses
  * (the d29 "tail" regime) used to blind the bucket forever — clone
  * pairs arriving beyond the prefix could never see each other.
  *
  * Ring admission is an exact-dedup LRU (r15 — replaces r14's cyclic
  * always-admit): the ring holds the bucket's [[RingSize]] most
  * recently SEEN distinct over-cap codes. An over-cap arrival whose
  * code sits verbatim in the PREFIX is never admitted (the prefix copy
  * is permanent — an identical ring copy adds zero coverage and costs
  * a slot); an exact repeat of a RING code refreshes that slot's
  * recency in place; only novel codes evict, oldest-last-seen first.
  * This is pointwise ≥ the cyclic ring at identical state: every code
  * covered by "the last 16 over-cap arrivals" has, by definition, an
  * occurrence among the last 16 arrivals, so it is among the ≤16 most
  * recently seen distinct codes — while repeated clones (the common
  * over-cap traffic) stop churning slots they already occupy.
  * Equivalent relational model (the d29 oracle's): witness w sees d
  * iff rk(w) < rk(d) AND (rk(w) ≤ 64 OR code(w) is one of the 16
  * distinct non-prefix codes with the latest over-cap occurrence
  * before d), rk = arrival rank in the bucket. The remaining miss
  * class (pinned by d29's "ring" regime): a clone pair split by >16
  * DISTINCT novel over-cap codes — information-theoretically
  * unavoidable in bounded state; no 16-slot policy can witness 17
  * distinct interleaving codes.
  *
  * This is the streaming rendition of the batch
  * 64-cap: the batch guard drops overfull buckets RETROACTIVELY (it
  * sees total counts), which an append-mode stream cannot replicate —
  * the two agree exactly whenever no bucket exceeds the cap, and the
  * d28 query reports `max_bucket` so the regime is visible in the
  * result. The over-cap divergence is a MEASURED number, not just this
  * comment: the d29 gauge query ([[graft.queries.Documents]]
  * `d29_megabucket_divergence`) pins stream-vs-batch verdicts per
  * regime on a crafted over-cap corpus — an identical-code mega clique
  * (stream suppresses n−1, batch drops the bucket), a below-cap
  * control (exact agreement), a beyond-prefix tail (the ring catches
  * all 5 clone dups the prefix-only policy and the batch drop both
  * miss), a "churn" regime (clone pair split by 20 over-cap arrivals
  * drawn from only 8 distinct codes — the LRU ring catches the twin
  * the r14 cyclic ring evicted), and the "ring" recency bound above.
  *
  * Reference anchor: the reference has no streaming dedup — this is a
  * scale-path extension; banding math is shared with d22/m09/m10
  * (4×16-bit keys from the 64-bit code).
  */
object StreamingNeardup {

  /** One (document, band) row: the 8-byte code rides the band explode,
    * exactly like the batch pipeline. */
  case class BandRow(doc_id: Long, h0: Long, h1: Long, band_id: Int, bkey: Long)

  /** Per-band verdict; `matched` = an earlier arrival within maxHamming
    * sat in this band's bucket. A document is suppressed iff ANY of its
    * four band verdicts matched (aggregate downstream). */
  case class Verdict(doc_id: Long, band_id: Int, matched: Boolean)

  /** Bucket state: parallel code-half arrays, length ≤ [[MaxBucket]] +
    * [[RingSize]]. Slots [0, min(len, MaxBucket)) are the arrival
    * prefix; slots ≥ MaxBucket are the second-chance ring kept in
    * recency order (oldest-seen first — slot MaxBucket is the next
    * eviction victim). `ringNext` is retired (always 0): the r15
    * exact-dedup LRU keeps order positionally instead of with a
    * cyclic pointer.
    */
  case class BucketState(h0s: Array[Long], h1s: Array[Long], ringNext: Int)

  val MaxBucket = 64
  val RingSize = 16

  /** Explode a streaming `codes(doc_id, h0, h1)` frame into band rows
    * and run the stateful match. Output mode: Append.
    */
  def bandVerdicts(codes: DataFrame, maxHamming: Int = 3): Dataset[Verdict] = {
    val s = codes.sparkSession
    import s.implicits._
    val bands = codes.select(col("doc_id"), col("h0"), col("h1"),
      posexplode(array(
        col("h0").bitwiseAND(lit(65535L)),
        shiftright(col("h0"), 16).bitwiseAND(lit(65535L)),
        col("h1").bitwiseAND(lit(65535L)),
        shiftright(col("h1"), 16).bitwiseAND(lit(65535L))))
        .as(Seq("band_id", "bkey"))).as[BandRow]
    bands.groupByKey(r => (r.band_id, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update(maxHamming))
  }

  /** The per-bucket state transition. Package-visible so the spec can
    * drive it directly with crafted iterators. */
  private[streaming] def update(maxHamming: Int)(
      key: (Int, Long), rows: Iterator[BandRow],
      st: GroupState[BucketState]): Iterator[Verdict] = {
    val prior = if (st.exists) st.get
      else BucketState(Array.emptyLongArray, Array.emptyLongArray, 0)
    var n = prior.h0s.length // prefix + occupied ring slots
    val h0s = java.util.Arrays.copyOf(prior.h0s, MaxBucket + RingSize)
    val h1s = java.util.Arrays.copyOf(prior.h1s, MaxBucket + RingSize)
    // intra-batch arrival order = doc_id order (deterministic; the d28
    // staging makes micro-batch = arrival wave)
    val out = rows.toArray.sortBy(_.doc_id).map { r =>
      var m = false
      var exactAt = -1 // first slot holding r's code verbatim, if any
      var i = 0
      if (n < MaxBucket) {
        // under-cap hot path: admission is unconditional, no exact
        // position needed — early-exit on first match
        while (i < n && !m) {
          if (java.lang.Long.bitCount(h0s(i) ^ r.h0) +
              java.lang.Long.bitCount(h1s(i) ^ r.h1) <= maxHamming) m = true
          i += 1
        }
      } else while (i < n && (!m || exactAt < 0)) {
        if (exactAt < 0 && h0s(i) == r.h0 && h1s(i) == r.h1) {
          exactAt = i; m = true // hamming 0 ≤ maxHamming
        } else if (!m && java.lang.Long.bitCount(h0s(i) ^ r.h0) +
            java.lang.Long.bitCount(h1s(i) ^ r.h1) <= maxHamming) m = true
        i += 1
      }
      if (n < MaxBucket) { h0s(n) = r.h0; h1s(n) = r.h1; n += 1 }
      else if (exactAt >= 0 && exactAt < MaxBucket) {
        // over-cap, code sits verbatim in the PREFIX: permanent
        // coverage already — admitting a ring copy would only burn a
        // slot (the mega-clique regime used to churn the whole ring
        // with copies of one code)
      } else if (exactAt >= MaxBucket) {
        // exact repeat of a RING code: refresh its recency in place
        // (move to the newest position) — repeats must not consume
        // capacity, but must keep their code alive
        val c0 = h0s(exactAt); val c1 = h1s(exactAt)
        var j = exactAt
        while (j < n - 1) { h0s(j) = h0s(j + 1); h1s(j) = h1s(j + 1); j += 1 }
        h0s(n - 1) = c0; h1s(n - 1) = c1
      } else if (n < MaxBucket + RingSize) {
        // novel over-cap code, ring has room (matched-but-not-exact
        // arrivals too — non-recursive suppression, every occurrence
        // witnesses later dups)
        h0s(n) = r.h0; h1s(n) = r.h1; n += 1
      } else {
        // novel over-cap code, ring full: evict the least-recently-
        // seen ring code (slot MaxBucket), append at the newest end
        var j = MaxBucket
        while (j < n - 1) { h0s(j) = h0s(j + 1); h1s(j) = h1s(j + 1); j += 1 }
        h0s(n - 1) = r.h0; h1s(n - 1) = r.h1
      }
      Verdict(r.doc_id, r.band_id, m)
    }
    st.update(BucketState(java.util.Arrays.copyOf(h0s, n),
      java.util.Arrays.copyOf(h1s, n), 0))
    out.iterator
  }
}
