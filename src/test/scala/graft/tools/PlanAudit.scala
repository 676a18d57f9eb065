package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: dump `explain(formatted)` for the headline queries into
  * PLANS.md — the physical-plan evidence (pushdown reaching the scan,
  * broadcast joins, partial aggregation, no stray shuffles) reviewed
  * after every operator change.
  *   sbt "Test/runMain graft.tools.PlanAudit [sfDir] [outFile]"
  */
object PlanAudit {
  private val Queries = Seq(
    "w08_warc_pushdown" -> "record-type + length pushdown must reach the warc scan (PushedFilters)",
    "w18_warc_scan10k_http" -> "record_types pushdown on the 16-file corpus; payload skip for filtered types",
    "q01_pricing_summary" -> "single scan, partial agg before the shuffle",
    "q02_revenue_by_nation" -> "dimension joins must broadcast (no shuffle join for nation/customer)",
    "q03_top_orders" -> "TakeOrderedAndProject, not a global sort",
    "d01_dedup_exact" -> "scan + hash partial agg; no text in the shuffle (md5 only)",
    "d03_lsh_buckets" -> "single scan -> posexplode -> hash agg on band keys",
    "e01_knn_cosine_baseline" -> "GAUGE BASELINE, not a scale path: the deliberate corpus x queries nested-loop correctness reference — use e04 (partial-agg top-k) / e03 (LSH buckets) / e06 (IVF) at scale",
    "e04_knn_topk" -> "partial-agg top-k: <=k rows per partition per query cross the shuffle (supersedes the e01/e04-window gauge shapes at scale)",
    "e06_ivf_knn" -> "probed-cells join broadcasts the query side; no corpus-wide scan per query",
    "w19_html_extract10k" -> "extraction kernels evaluate inside the scan stage; one partial agg",
    "w13_warc_extract" -> "native extract_plain_text expression — no UDF island in the plan",
    "w27_member_index_rescan" -> "ONE gzip archive re-scanned as >1 member-aligned input partitions",
    "e08_embedding_neardup" -> "banded-LSH candidate join shuffles (vec_id, band, key) only; vectors re-join by id; no cross product",
    "t10_winnow_fingerprint" -> "per-row rolling-hash kernel: one scan, no shuffle below the output sort",
    "d09_paragraph_dedup" -> "dedup rank shuffles (md5, doc_id, idx) — paragraph text only moves in the keyed re-join",
    "d10_decontaminate" -> "benchmark shingle set is BROADCAST; corpus side is one scan + map-side-combined hit counts",
    "w29_training_pipeline" -> "ONE extraction pass in the scan stage; only 32-char fingerprints shuffle (map-side combine); 1-row final agg",
    "t17_quality_rules" -> "all rule flags from ONE codegen'd scan; no shuffle below the output sort",
    "t18_bigram_perplexity" -> "bigram/prefix counts partial-agg before their shuffles; scoring join keyed by the bigram; vocab is a 1-row BROADCAST",
    "d13_similar_topk" -> "per-doc window (never a global sort) over the shared persisted LSH scored stage",
    "q13_table_profile" -> "every stage a HASH aggregate (no expand, no SortAggregate): per-column groupBy-count then a tiny reduce; each arm scans only its pruned column",
    "q14_kmv_ndv" -> "the k-min sketch compiles to TakeOrderedAndProject — per-partition top-k, k-row merge",
    "e10_kmeans" -> "final assign: the 8-row codebook BROADCASTs to the corpus scan as a collected book; argmin is ROW-LOCAL (r17 — the r16 partial-agg min(struct) shape re-shuffled the full vector column per assignment), never a window",
    "q15_time_cooccur" -> "the interval predicate joins as an EQUI join on (user_id, bin) + residual filter — never a BroadcastNestedLoop over the raw non-equi condition",
    "q16_hll_ndv" -> "bucket ranks partial-agg (max) before one 512-row shuffle; the sketch reduce is a 1-row agg",
    "q17_sample_quantiles" -> "the k-min sample compiles to TakeOrderedAndProject; the rank window orders k rows, never the input",
    "t20_nfc_normalize" -> "per-row codegen'd nfc_normalize in the scan projection — no UDF island, no shuffle below the output sort",
    "d17_bloom_gate" -> "bloom words BROADCAST to the probe join; the build side is a map-side-combined bit_or over (word, mask) pairs",
    "q18_session_window" -> "native session_window: ONE shuffle on user_id, the gap-merge is key-local",
    "e14_pq_recall" -> "codebook and per-query distance tables BROADCAST; the ADC join's big side carries only (vec_id, sub_j, code) rows",
    "e15_cluster_purity" -> "contingency = one groupBy(cid, label); the majority window ranks k x L rows, never the corpus",
    "t21_zipf" -> "wordcount partial-aggs map-side; the rank window sorts the VOCABULARY; regression is one agg over types",
    "w33_warc_scan_uncompressed" -> "uncompressed corpus: same envelope-only scan shape as w17; payloads skipped",
    "w34_warc_scan_lz4" -> "LZ4 corpus through the native frame decoder: same envelope-only scan shape as w17",
    "t24_chunk_overlap" -> "one scan, per-row sequence+slice chunk kernels, explode ~n/stride; no shuffle below the output sort",
    "d20_incremental_neardup" -> "asymmetric band probe: incoming keys join existing keys on (band_id, band_key), both sides independently skew-guarded; text only moves in the keyed gram re-joins",
    "e18_truncation_recall" -> "per truncation the 5-query side BROADCASTs and the corpus streams once; top-k is partial-agg, never a window over candidates",
    "e20_binary_rerank_recall" -> "ONE hamming pass over 8-byte codes (query codes BROADCAST); the re-rank joins candidates back to vectors by id with the query-vector side broadcast; both depths filter the same pass",
    "d21_url_canonical_dedup" -> "canonicalization is codegen'd string expressions in the scan; dedup is groupBy(canonical) with map-side partial agg — keys are pages, not captures",
    "w40_segment_reassembly" -> "reassembly groups continuations by origin id (segment-sized rows only); the first-segment join and the md5-pin join broadcast their small sides",
    "e21_ivfpq_recall" -> "IVFPQ: coarse probes and per-query ADC tables BROADCAST; the scored side carries (vec_id, cell, sub_j, code) rows restricted to probed cells — the cell RIDES THROUGH the encode pass (r17; the r16 shape re-joined codes to the corpus by vec_id just to attach it); ranking windows order bounded candidates, never the corpus",
    "m09_image_neardup" -> "image dedup over 8-byte dHash codes: bands shuffle (img_id, band, key) only; candidates from a bucket equi-join behind the 64-cap guard; the hamming verify joins codes, never pixels",
    "w43_crawl_delta" -> "snapshot listings meet in ONE full-outer join keyed by URL (CDX-shaped, co-partitionable at scale); classification and the refetch budget are a projection + partial agg over the joined rows",
    "d22_simhash_neardup" -> "SimHash near-dup through the shared banded-hamming pipeline: fingerprints in-scan, bands shuffle (id, band, 16-bit key), the verify joins 8-byte codes — no shingle explosion anywhere",
    "m11_video_neardup" -> "video near-dup: candidates band frame-0 codes; the per-frame verify joins (media_id, fidx, h0, h1) rows by sample position — pixels are decoded once, at hash time",
    "t31_shard_layout" -> "shard-writer layout: ONE exchange on the hash-derived shard key, the ordered layout digest folds inside the aggregate — no global sort anywhere",
    "t32_resample_exec" -> "the factor table builds from a count agg + two 1-row broadcasts and BROADCAST-joins back to the corpus — the full-size side is never reshuffled",
    "d25_suffix_dups" -> "sorted-suffix adjacency: the window partitions by the suffix prefix (contiguous ranges of the global suffix order) — NO single-partition window; one exchange of (doc_id, pos, <=64B suffix) rows",
    "t33_blocklist_gate" -> "ONE codegen'd scan: the Aho-Corasick walk and all gate algebra evaluate in the scan projection; no shuffle below the output sort",
    "d26_span_removal" -> "dup-window table = groupBy(40-char window) with map-side partial agg (the one corpus-sized shuffle, d25's price of exactness); island merge + cleaned-text fold are DOC-LOCAL windows and a per-row aggregate() — never global",
    "t34_weighted_sample" -> "A-ES weighted sampling compiles to TakeOrderedAndProject (per-partition top-k, k-row merge); the rank window orders the 64 survivors, never the corpus",
    "q19_funnel" -> "ONE shuffle on user_id (partial-agg collect_list); the funnel state machine folds inside the aggregate — no per-stage self-joins, no window re-sorts",
    "q20_cm_heavy_hitters" -> "the sketch IS a 256-row hash aggregate (map-side combine on (row, cell)); key probes join the tiny counter table; top-10 is TakeOrderedAndProject",
    "e23_multiprobe_lsh" -> "multi-probe stays a bucket EQUI-join: the probe side explodes hamming-ball key variants (301 deltas broadcast) against the unprobed key table; one candidate pass yields the whole probe curve",
    "m13_mixed_image_neardup" -> "mixed-format image dedup through the SAME banded pipeline as m09: one dHash core per container, bands shuffle (img_id, band, key) only, the verify joins 8-byte codes — pixels are decoded once, at hash time",
    "q21_retention" -> "three keyed aggregations, all map-side-combinable; the corpus never moves wider than (user_id, week) pairs; cohort sizes join the cells on the (small) cohort key",
    "e24_filtered_ann" -> "filtered ANN: the parity predicate evaluates inside the candidate scan (pushed filter), probes/centroids BROADCAST, both probe depths cut from ONE ranked candidate pass",
    "w45_cleaning_funnel" -> "ONE extraction pass in the scan stage; length gate and Aho-Corasick blocklist evaluate in the same codegen span; only 32-char fingerprints + two small ints shuffle (map-side combine)",
    "d27_split_leakage" -> "leakage audit runs on the DUP PAIRS (bounded by the band/cap structure), never the corpus; split derivation is codegen'd md5 arithmetic on the pair ids",
    "t36_stratified_sample" -> "per-source top-k through the partial-agg Aggregator (<=k rows per source per map task cross the wire); NO window over the corpus anywhere (spec-pinned)",
    "t37_token_budget" -> "three independent 1-row roll-ups (raw / exact-dedup / span-removed tokens) cross-joined as broadcasts; the only corpus-sized shuffles are the stages' own (fp window keys, dup-window groupBy)",
    "t38_lang_dataset" -> "dataset builder: one scan -> per-(lang, example) dedup groupBy -> per-LANG rank window (languages parallelize; the per-language hash order IS the reference's split contract — at 100 TB use md5-range quantiles instead) -> per-lang agg + broadcast join of raw counts",
    "w46_emit_member_index" -> "build-on-first-scan loop: the audited plan is the member-parallel RESCAN over slices planned from the sidecar the first scan emitted as a side-output; each slice decodes in ONE sequential pass (no per-member seek/reopen)",
    "w47_auto_member_index" -> "OPTION-FREE loop closure: the rescan passes no index option at all — the .idx sidecar is auto-discovered at plan time and the single compressed file still plans >1 member-group partition",
    "w48_zstd_roundtrip" -> "the same option-free member-parallel rescan over the sink's .warc.zst output — the codec swap keeps every plan property (pruned scan, member-group slices)",
    "w49_cdxj_collection_lookup" -> "collection-level CDXJ: the key table resolves via BroadcastHashJoin against the member-indexed CDXJ scan (pruned to url/ts/filename/offset); each hit is a ranged point read in a map stage — O(hits) work, the corpus never shuffles",
    "w49_point_read_resolver" -> "the grouped resolvePointReads shape in isolation: the ONLY exchange carries (url, filename, offset) hit tuples keyed by (archive, 16 MiB range) — content bytes never cross it; extraction happens in the post-exchange flatMapGroups with one stream + one dictionary load per group (WarcPlanSpec pins the exchange row width)",
    "w50_dict_lifecycle" -> "zstd dictionary lifecycle: train once -> distributed dict-led write -> member-parallel rescan (pruned 2-column totals agg) -> grouped point-reads THROUGH the dictionary; the returned plan is two 1-row aggregates broadcast-crossJoined — the resolver's hit-tuple-only exchange sits under the point agg",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plan audit (generated by graft.tools.PlanAudit)\n\n")
    sb.append(s"Scale factor dir: `$sfDir`. Regenerate: " +
      "`sbt \"Test/runMain graft.tools.PlanAudit\"`.\n")
    // d11-d13 eagerly localCheckpoint their result, which explains as an
    // opaque RDD scan — audit their pre-materialization lineage instead
    val planSources: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("d13_similar_topk" -> { (s, dir) =>
        val chains = s.createDataFrame(graft.queries.Documents.ChainDocs)
          .toDF("doc_id", "text")
        graft.queries.Documents.similarTopK(
          graft.Tables.documents(s, dir).select("doc_id", "text").unionAll(chains),
          materialize = false)
      },
      "d20_incremental_neardup" -> { (s, dir) =>
        import org.apache.spark.sql.functions.col
        val d = graft.Tables.documents(s, dir).select("doc_id", "text")
        graft.queries.Documents.incrementalNeardup(
          d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
          materialize = false)
      },
      "w49_point_read_resolver" -> { (s, _) =>
        import s.implicits._
        import org.apache.spark.sql.functions.col
        val hits = s.read.format("warc")
          .load("/root/reference/tests/data/warcfile.warc.gz")
          .filter(col("record_type") === "response")
          .select(graft.functions.WarcCols.targetUri(col("headers")).as("url"),
            col("filename"), col("offset"))
          .as[(String, String, Long)]
        graft.queries.Warc.resolvePointReads(hits)
      })
    Queries.foreach { case (name, why) =>
      val df = planSources.getOrElse(name, graft.SparkEntry.queries(name))(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n_${why}_\n\n```\n")
      sb.append(plan.take(12000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }
}
