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
  * (a) its first 64 arrivals and (b) the ring of its most recent 16
  * over-cap arrivals, so state stays O(buckets × (64+16) × 16 B) no
  * matter how degenerate the corpus. Why the ring: a prefix poisoned
  * by 64 mutually-distant witnesses (the d29 "tail" regime) used to
  * blind the bucket forever — clone pairs arriving beyond the prefix
  * could never see each other. The ring restores bounded matching
  * capacity: every over-cap arrival (matched or not — non-recursive
  * suppression, every occurrence witnesses) cyclically overwrites the
  * oldest ring slot, so a dup whose original arrived among the last 16
  * over-cap arrivals of its bucket is still caught. Equivalent
  * relational model (the d29 oracle's): witness w sees d iff
  * rk(w) < rk(d) AND (rk(w) ≤ 64 OR rk(w) ≥ rk(d) − 16), rk = arrival
  * rank in the bucket. This is the streaming rendition of the batch
  * 64-cap: the batch guard drops overfull buckets RETROACTIVELY (it
  * sees total counts), which an append-mode stream cannot replicate —
  * the two agree exactly whenever no bucket exceeds the cap, and the
  * d28 query reports `max_bucket` so the regime is visible in the
  * result. The over-cap divergence is a MEASURED number, not just this
  * comment: the d29 gauge query ([[graft.queries.Documents]]
  * `d29_megabucket_divergence`) pins stream-vs-batch verdicts per
  * regime on a crafted over-cap corpus — an identical-code mega clique
  * (stream suppresses n−1, batch drops the bucket), a below-cap
  * control (exact agreement), and a beyond-prefix tail (the ring
  * catches all 5 clone dups the prefix-only policy and the batch drop
  * both miss).
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
    * prefix; slots ≥ MaxBucket are the second-chance ring, with
    * `ringNext` the next (oldest) ring slot to overwrite.
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
    var ringNext = prior.ringNext
    val h0s = java.util.Arrays.copyOf(prior.h0s, MaxBucket + RingSize)
    val h1s = java.util.Arrays.copyOf(prior.h1s, MaxBucket + RingSize)
    // intra-batch arrival order = doc_id order (deterministic; the d28
    // staging makes micro-batch = arrival wave)
    val out = rows.toArray.sortBy(_.doc_id).map { r =>
      var m = false
      var i = 0
      while (i < n && !m) {
        if (java.lang.Long.bitCount(h0s(i) ^ r.h0) +
            java.lang.Long.bitCount(h1s(i) ^ r.h1) <= maxHamming) m = true
        i += 1
      }
      if (n < MaxBucket) { h0s(n) = r.h0; h1s(n) = r.h1; n += 1 }
      else {
        // over-cap: cyclically overwrite the oldest second-chance slot
        // (matched arrivals too — every occurrence witnesses later dups)
        val slot = MaxBucket + ringNext
        h0s(slot) = r.h0; h1s(slot) = r.h1
        if (slot >= n) n = slot + 1
        ringNext = (ringNext + 1) % RingSize
      }
      Verdict(r.doc_id, r.band_id, m)
    }
    st.update(BucketState(java.util.Arrays.copyOf(h0s, n),
      java.util.Arrays.copyOf(h1s, n), ringNext))
    out.iterator
  }
}
