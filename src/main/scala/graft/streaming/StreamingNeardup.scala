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
  * Skew guard: bucket state CAPS at [[MaxBucket]] codes — a mega-bucket
  * (the d08 regime) stops absorbing new witnesses but keeps matching
  * against its first 64, so state stays O(buckets × 64 × 16 B) no
  * matter how degenerate the corpus. This is the streaming rendition of
  * the batch 64-cap: the batch guard drops overfull buckets
  * RETROACTIVELY (it sees total counts), which an append-mode stream
  * cannot replicate — the two agree exactly whenever no bucket exceeds
  * the cap, and the d28 query reports `max_bucket` so the regime is
  * visible in the result. The over-cap divergence is a MEASURED number,
  * not just this comment: the d29 gauge query
  * ([[graft.queries.Documents]] `d29_megabucket_divergence`) pins
  * stream-vs-batch verdicts per regime on a crafted over-cap corpus —
  * an identical-code mega clique (stream suppresses n−1, batch drops
  * the bucket), a below-cap control (exact agreement), and a
  * beyond-prefix tail (both engines share the loss).
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

  /** Bucket state: parallel code-half arrays, length ≤ [[MaxBucket]]. */
  case class BucketState(h0s: Array[Long], h1s: Array[Long])

  val MaxBucket = 64

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
    val prior = if (st.exists) st.get else BucketState(Array.emptyLongArray, Array.emptyLongArray)
    var n = prior.h0s.length
    val h0s = java.util.Arrays.copyOf(prior.h0s, MaxBucket)
    val h1s = java.util.Arrays.copyOf(prior.h1s, MaxBucket)
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
      Verdict(r.doc_id, r.band_id, m)
    }
    st.update(BucketState(java.util.Arrays.copyOf(h0s, n),
      java.util.Arrays.copyOf(h1s, n)))
    out.iterator
  }
}
