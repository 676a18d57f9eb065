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

    // Streaming SEMANTIC dedup-on-arrival — the d28 operator reused
    // verbatim across modalities: embeddings stream in, each vector
    // compresses to a 64-bit SRP sign signature (4 bands × 16
    // hyperplanes, e08's exact weight family, so band b's 16-bit chunk
    // IS SRP band b's key), and graft.streaming.StreamingNeardup flags
    // arrivals within signature-hamming 3 of an EARLIER arrival —
    // hamming ≤3 of 64 sign bits ≈ angular distance ≤ 3π/64 (cosine
    // ≳ 0.989), the semdedup-tier threshold. State per vector: 16
    // bytes, no watermark. The oracle recomputes signatures, banded
    // pairs and the arrival rule relationally; the result additionally
    // pins stream == batch and the guard regime (max_bucket).
    "e25_streaming_semdedup" -> ((s, dir) => {
      val bandKeys = srpBandKeys(bands = 4, rows = 16)
      val codes = injectedCorpus(s, dir)
        .select(col("vec_id").as("doc_id"), bandKeys(col("v")).as("keys"))
        .select(col("doc_id"),
          (col("keys")(0) + col("keys")(1) * lit(65536L)).as("h0"),
          (col("keys")(2) + col("keys")(3) * lit(65536L)).as("h1"))
      graft.queries.StreamingDedup.summary(s, codes, "e25")
    }),

    // Brute-force cosine top-3 for query vectors vec_id < 5. Named
    // _baseline deliberately: the final window shuffles ALL |Q|x|C| sim
    // rows into |Q| partitions — the pedagogical correctness reference
    // that e04 (partial-agg top-k) supersedes at scale.
    "e01_knn_cosine_baseline" -> ((s, dir) => {
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

    // Scale-safe kNN: same result set as e01, but top-k via a typed
    // partial-aggregating Aggregator — each map task keeps <= k pairs per
    // query, so the shuffle is k rows per (partition, query) instead of
    // ALL |Q|x|C| similarity rows through |Q| window partitions (the
    // round-1 e01 skew bottleneck at 100x).
    "e04_knn_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val q = emb.select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
        .filter(col("q_vec_id") < 5)
      val c = emb.select(col("vec_id").as("n_vec_id"), col("v").as("cv"))
      val sims = c.join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      val topk = graft.functions.Similarity.topKAgg(3)
      sims.groupBy(col("q_vec_id"))
        .agg(topk(col("sim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), explode(col("top")).as("t"))
        .select(col("q_vec_id"), col("t._2").as("n_vec_id"), col("t._1").as("sim"))
        .orderBy(col("q_vec_id"), col("sim").desc, col("n_vec_id"))
    }),

    // IVF approximate kNN — the similarity-search scale path: the label
    // centroids act as the coarse codebook (IVF cells). Each query probes
    // its top-2 nearest cells and runs exact cosine ONLY against vectors
    // in those cells (~2/10 of the corpus), then top-k. At 100 TB the
    // probe join is a broadcast of (query x cell) pairs against a
    // cell-partitioned table — candidate generation never scans the
    // full corpus per query.
    "e06_ivf_knn" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      // codebook: per-cell (label) mean vector via explode/regroup;
      // components rounded so probe ranking is bit-identical across
      // engines (double avg is summation-order sensitive)
      val centroids = emb
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos")).agg(round(avg(col("x")), 6).as("c"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label").as("cell"), expr("transform(pc, p -> p.c)").as("cv"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      // probe selection: top-2 cells by centroid cosine
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("csim").desc, col("cell"))
      val probes = queries.crossJoin(broadcast(centroids))
        .select(col("q_vec_id"), col("qv"), col("cell"),
          cosine(col("qv"), col("cv")).as("csim"))
        .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= 2)
        .select(col("q_vec_id"), col("qv"), col("cell"))
      // exact search inside probed cells only
      val cands = emb.select(col("vec_id").as("n_vec_id"), col("label").as("cell"),
        col("v").as("cv"))
      val sims = cands.join(broadcast(probes), Seq("cell"))
        .filter(col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      val topk = graft.functions.Similarity.topKAgg(3)
      sims.groupBy(col("q_vec_id"))
        .agg(topk(col("sim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), explode(col("top")).as("t"))
        .select(col("q_vec_id"), col("t._2").as("n_vec_id"), col("t._1").as("sim"))
        .orderBy(col("q_vec_id"), col("sim").desc, col("n_vec_id"))
    }),

    // Symmetric int8 quantization (the storage lever for a 100 TB
    // embedding corpus: 4x smaller vectors + cheap SIMD dot products):
    // per-vector absmax scale, q = round(x * 127 / scale), plus the
    // dequantization error that decides whether recall holds. One scan,
    // no shuffle; at scale the quantized column writes back to parquet.
    "e07_quantize_int8" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      e.withColumn("scale",
          expr("greatest(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x))), 1e-12d)"))
        .withColumn("q", expr("transform(v, x -> CAST(floor(x * 127.0 / scale + 0.5) AS INT))"))
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale"),
          expr("CAST(aggregate(q, 0, (a, x) -> greatest(a, abs(x))) AS INT)").as("max_q"),
          round(expr(
            "aggregate(zip_with(v, q, (x, qq) -> abs(x - qq * scale / 127.0)), " +
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x) / size(v)"), 6).as("mean_abs_err"))
        .orderBy(col("vec_id"))
    }),

    // Embedding-cosine near-duplicate detection — the semantic-dedup
    // operator of an LLM data pipeline (exact/MinHash dedup misses
    // paraphrases; embedding cosine catches them). The synthetic corpus
    // has no natural near-dups (max pairwise cosine 0.51), so the query
    // injects deterministic perturbed copies of vec_id < 10 (component
    // d scaled by 1 + e/128 with e = (d*31 + id*7) % 11 - 5 — a
    // power-of-two denominator so the factor is exactly representable
    // and the cosine bit-matches the DuckDB oracle).
    //
    // Shape is the 100 TB one: banded SRP-LSH candidate generation
    // (4 bands x 16 planes; candidates = bucket-equi-join on the band
    // key, NEVER all pairs), pair dedup, then exact cosine verify only
    // on candidates, vectors fetched by joining back to the corpus so
    // the banding explode shuffles (vec_id, band, key) and never the
    // 64-dim payload.
    "e08_embedding_neardup" -> ((s, dir) => {
      val corpus = injectedCorpus(s, dir)
      val bandKeys = srpBandKeys(bands = 4, rows = 16)
      // bands feed three consumers (the bucket-size agg and both
      // self-join sides). All three need the same (band_id, bkey)
      // shuffle, so at cluster scale (sort-merge joins) AQE dedups the
      // subtree into ONE exchange + ReusedExchange reads — the SRP
      // kernel runs once per corpus row without any manual caching
      // (pinned by EmbeddingsQuerySpec). Under local broadcast-join
      // thresholds the tiny side recomputes instead, which is the
      // cheaper choice at that scale anyway.
      val bands = corpus
        .select(col("vec_id"), posexplode(bandKeys(col("v"))).as(Seq("band_id", "bkey")))
      // mega-bucket guard (same doctrine as d08): a bucket of B members
      // yields B^2/2 candidate pairs, so one dense cluster (a viral
      // template, a zero vector) would go quadratic — drop buckets over
      // the cap before the self-join. Cap 64 drops nothing at test SFs
      // (max bucket ~30); the oracle mirrors it so the pin holds
      // wherever it fires.
      val keptBuckets = bands.groupBy(col("band_id"), col("bkey"))
        .agg(count(lit(1)).as("n_in_bucket"))
        .filter(col("n_in_bucket") <= 64)
        .select(col("band_id"), col("bkey"))
      val pruned = bands.join(keptBuckets, Seq("band_id", "bkey"))
      val cand = pruned.as("a").join(pruned.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bkey") === col("b.bkey") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("orig_id"), col("b.vec_id").as("dup_id"))
        .distinct()
      cand
        .join(corpus.select(col("vec_id").as("orig_id"), col("v").as("va")), "orig_id")
        .join(corpus.select(col("vec_id").as("dup_id"), col("v").as("vb")), "dup_id")
        .select(col("orig_id"), col("dup_id"), cosineRounded(col("va"), col("vb")).as("sim"))
        .filter(col("sim") >= 0.95)
        .orderBy(col("orig_id"), col("dup_id"))
    }),

    // Full 64-dim centroids via explode -> (label, dim) partial agg ->
    // regroup; elementwise array aggregation without any driver-side
    // loop (the round-1 e02 hand-rolled only dims 0-3).
    // Product quantization (Jégou et al. 2011): the 64-dim vector splits
    // into 8 subspaces of 8 dims; each subspace learns a 16-entry
    // codebook (deterministic seeds = the subvectors of vec_id 0..15,
    // one Lloyd iteration with centroids rounded so the refined
    // codebook is bit-identical across engines), then every subvector
    // encodes as its nearest code. 8 bytes replace 256 — the memory
    // lever that makes a 100 TB ANN index fit a cluster. Topology:
    // codebooks are tiny and BROADCAST to both the train-assign and
    // encode joins; argmin is min(struct(dist, code)) — a partial-agg
    // friendly aggregate with a deterministic tie-break, never a
    // window over the full corpus.
    "e09_product_quantize" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      pqEncode(emb, pqCodebook(emb))
        .select(col("vec_id"), col("sub_j"), col("code"), col("err"))
        .orderBy(col("vec_id"), col("sub_j"))
    }),

    // PQ recall gauge (the e12/e13 doctrine for the COMPRESSION path):
    // does top-k search over 8-byte PQ codes still find the true L2
    // neighbors of the full 256-byte vectors? Approx side = asymmetric
    // distance computation (Jégou et al. 2011): per query a distance
    // TABLE of (sub_j, code) -> sqdist(query subvector, codebook entry)
    // — 8x16 doubles, broadcast — so scoring a database vector is 8
    // table lookups summed via the codes join, the vector itself never
    // re-read. Exact side = brute-force L2 top-3 over the same 5
    // queries. Both sides and the recall tail compose existing pieces;
    // at 100 TB the ADC join is the whole point: the scan side touches
    // ONLY the 8-byte code rows, the float corpus stays on disk.
    "e14_pq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val codebook = pqCodebook(emb)
      val enc = pqEncode(emb, codebook)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      val qsub = qs.select(col("q_vec_id"), posexplode(
          transform(sequence(lit(0), lit(7)),
            j => slice(col("qv"), j * lit(8) + 1, lit(8)))).as(Seq("sub_j", "qsv")))
      // per-entry distances rounded BEFORE the 8-way sum: the sum's
      // addend order differs between engines, rounding first keeps the
      // compared value out of last-ulp territory
      val dtable = qsub.join(broadcast(codebook), Seq("sub_j"))
        .select(col("q_vec_id"), col("sub_j"), col("code"),
          round(sqDistCol(col("qsv"), col("cv")), 6).as("d"))
      val approxW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("ad").asc, col("n_vec_id").asc)
      val approx = enc
        .select(col("vec_id").as("n_vec_id"), col("sub_j"), col("code"))
        .join(broadcast(dtable), Seq("sub_j", "code"))
        .filter(col("q_vec_id") =!= col("n_vec_id"))
        .groupBy(col("q_vec_id"), col("n_vec_id"))
        .agg(round(sum(col("d")), 6).as("ad"))
        .withColumn("rn", row_number().over(approxW)).filter(col("rn") <= 3)
        // (ties on ad resolve by n_vec_id in approxW — same in the oracle)
        .select(col("q_vec_id"), col("n_vec_id"))
      val exactW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("ed").asc, col("n_vec_id").asc)
      val exact = emb.select(col("vec_id").as("n_vec_id"), col("v"))
        .join(broadcast(qs), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          round(sqDistCol(col("qv"), col("v")), 6).as("ed"))
        .withColumn("rn", row_number().over(exactW)).filter(col("rn") <= 3)
        .select(col("q_vec_id"), col("n_vec_id"))
      recallVsExact(exact, approx)
    }),

    // Clustering EVALUATION: purity of e10's trained k-means clusters
    // against the held-out label column — the third gauge family
    // (recall gauges e12-e14 judge search; this judges the clustering
    // those searches build on). Per cluster: size, majority label (ties
    // to the smaller label), and purity = majority share. Topology: the
    // contingency table is one groupBy(cid, label) — k x L rows, so the
    // window that picks each cluster's majority orders a handful of
    // rows per partition, never the corpus.
    "e15_cluster_purity" -> ((s, dir) => {
      val embL = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      val emb = embL.select(col("vec_id"), col("v"))
      val cents = kmeansCentroids(s, emb, k = 8, iters = 3)
      // the label rides through the row-local assignment — no corpus
      // re-join by vec_id to attach it (r17)
      val cont = kmeansAssign(embL.select(col("vec_id"), col("label"), col("v")), cents)
        .groupBy(col("cid"), col("label")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cid")).orderBy(col("n").desc, col("label").asc)
      val top = cont.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cid"), col("label").as("top_label"), col("n").as("n_top"))
      cont.groupBy(col("cid")).agg(sum(col("n")).as("n_vecs"))
        .join(top, "cid")
        .select(col("cid").cast("int").as("cid"), col("n_vecs"),
          col("top_label").cast("int").as("top_label"), col("n_top"),
          round(col("n_top").cast("double") / col("n_vecs"), 4).as("purity"))
        .orderBy(col("cid"))
    }),

    // UNSUPERVISED k-means (Lloyd's algorithm, k=8, 3 fixed iterations)
    // — e05/e06 build centroids from the label column; this is the
    // honest IVF training step with no labels: deterministic seeds
    // (vectors vec_id 0..7), per-iteration centroid rounding so both
    // engines iterate bit-identically, min(struct(dist, cid)) argmin
    // with id tie-break — evaluated ROW-LOCALLY against the collected
    // broadcast book since r17 (the r16 crossJoin+groupBy shape
    // re-shuffled the full vector column per assignment). Per
    // iteration: one broadcast of the 8-row book to the assign scan,
    // one explode/regroup to re-center — at 100 TB the corpus is
    // scanned k-means-style 3 times but only the map-side-combined
    // (cid, pos, x) partials ever shuffle. Output: cluster sizes,
    // centroid fingerprints and total inertia — the convergence
    // numbers an IVF tuner actually reads.
    "e10_kmeans" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val cents = kmeansCentroids(s, emb, k = 8, iters = 3)
      kmeansAssign(emb, cents)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(round(col("d"), 6)), 2).as("inertia"))
        .join(cents.select(col("cid"),
          round(aggregate(col("cv"), lit(0.0), (a, x) => a + x), 4).as("centroid_sum"),
          round(element_at(col("cv"), 1), 6).as("c0")), Seq("cid"))
        .orderBy(col("cid"))
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup = cluster the
    // embedding space (e10's k-means, identical seeds/rounding), then
    // find high-cosine pairs ONLY within each cluster — the pairwise
    // stage is bounded by cluster granularity instead of corpus^2,
    // which is the whole trick at 100 TB (pick k so clusters fit the
    // pairwise budget; pairs that straddle a cluster boundary are the
    // scheme's documented recall loss). Same injected perturbed
    // near-dups as e08 guarantee positives at every SF.
    "e11_semdedup" -> ((s, dir) =>
      semdedupPairs(s, injectedCorpus(s, dir))
        .select(col("cid"), col("vec_a"), col("vec_b"), col("cos"))
        .orderBy(col("vec_a"), col("vec_b"))),

    // Mega-cluster stress for the e11 guard: 700 perturbed copies of
    // two base vectors force two clusters past maxCluster (512), so
    // the chunk split actually engages — each degenerate cluster
    // becomes ceil(700/512)=2 bounded tasks instead of one O(n^2)
    // task. Output is the per-cluster audit a pipeline operator would
    // read: how many chunks the guard cut, how many pairs were
    // scored, how many dups found.
    "e17_semdedup_stress" -> ((s, dir) => {
      val corpus = megaClusterCorpus(s, dir)
      val pairs = semdedupPairs(s, corpus, threshold = None)
      val sizes = pairs.groupBy(col("cid"))
        .agg(countDistinct(col("chunk_a")).as("n_chunks"),
          count(lit(1)).as("n_pairs"),
          sum(when(col("cos") >= 0.95, 1L).otherwise(0L)).as("n_dups"))
      sizes.select(col("cid"), col("n_chunks"), col("n_pairs"), col("n_dups"))
        .orderBy(col("cid"))
    }),

    // Recall@3 of the IVF index (e06) against the brute-force exact
    // top-3 (e01) — the self-measuring benchmark every ANN deployment
    // needs: is the probed-cells shortcut actually finding the true
    // neighbors? Composes the two existing queries (and their oracles)
    // verbatim, so the measurement can never drift from the measured.
    // On the synthetic corpus it reports what a practitioner would
    // need to learn: label-partitioned cells barely align with cosine
    // neighborhoods of RANDOM vectors (recall ~0.2), exactly why real
    // IVF trains its coarse quantizer with k-means (e10) instead.
    "e12_ann_recall" -> ((s, dir) => {
      val exact = queries("e01_knn_cosine_baseline")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = queries("e06_ivf_knn")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      recallVsExact(exact, approx)
    }),

    // The fix e12 motivates: IVF whose coarse quantizer is e10's
    // TRAINED k-means codebook instead of the label column. Identical
    // probe topology to e06 (top-2 cells by centroid cosine, exact
    // search inside probed cells, top-3), then recall@3 against the
    // e01 exact baseline in the same query — diagnosis (e12, recall
    // ~0.2 on label cells) and cure measured by the same gauge:
    // trained cells cluster cosine-near vectors together, so probed
    // search actually finds the true neighbors.
    "e13_kmeans_ivf_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val cents = kmeansCentroids(s, emb, k = 8, iters = 3)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("csim").desc, col("cid"))
      val probes = qs.crossJoin(broadcast(cents))
        .select(col("q_vec_id"), col("qv"), col("cid"),
          cosine(col("qv"), col("cv")).as("csim"))
        .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= 2)
        .select(col("q_vec_id"), col("qv"), col("cid"))
      // the row-local assignment already carries v — no corpus self-join
      // by vec_id needed to attach vectors to cells (r17)
      val cands = kmeansAssign(emb, cents)
        .select(col("vec_id").as("n_vec_id"), col("cid"), col("v").as("cv"))
      val sims = cands.join(broadcast(probes), Seq("cid"))
        .filter(col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      val topk = graft.functions.Similarity.topKAgg(3)
      val approx = sims.groupBy(col("q_vec_id"))
        .agg(topk(col("sim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), explode(col("top")).as("t"))
        .select(col("q_vec_id"), col("t._2").as("n_vec_id"))
      val exact = queries("e01_knn_cosine_baseline")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      recallVsExact(exact, approx)
    }),

    // Int8-quantization recall gauge — the third leg of the
    // approximation-audit family (e12: IVF cells, e14: PQ codes, e16:
    // scalar int8). e07 asserts the quantizer's per-vector error;
    // this measures what that error DOES to retrieval: brute-force
    // cosine top-3 over the DEQUANTIZED vectors (q * scale / 127, the
    // exact doubles a SIMD int8 kernel reconstructs) vs the e01 float
    // baseline, through the shared recall gauge. Dequantization is a
    // per-row projection — the search topology (broadcast queries,
    // partial top-k) is unchanged, so the gauge isolates pure
    // quantization loss.
    "e16_int8_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val dq = emb
        .withColumn("scale", expr(
          "greatest(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x))), 1e-12d)"))
        .select(col("vec_id"), expr(
          "transform(v, x -> CAST(floor(x * 127.0 / scale + 0.5) AS DOUBLE) * scale / 127.0)")
          .as("dv"))
      val q = dq.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("dv").as("qv"))
      val c = dq.select(col("vec_id").as("n_vec_id"), col("dv").as("cv"))
      val sims = c.join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      val topk = graft.functions.Similarity.topKAgg(3)
      val approx = sims.groupBy(col("q_vec_id"))
        .agg(topk(col("sim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), explode(col("top")).as("t"))
        .select(col("q_vec_id"), col("t._2").as("n_vec_id"))
      val exact = queries("e01_knn_cosine_baseline")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      recallVsExact(exact, approx)
    }),

    // Matryoshka-style dimension-truncation gauge — the third storage
    // lever next to int8 (e07/e16) and PQ (e09/e14): keep only the
    // first d components of every vector (the MRL prefix property) and
    // measure recall@3 of prefix-cosine search against the full-dim
    // exact baseline, for d = 32 and 16 of 64. At 100 TB this decides
    // how much of the index can live in the hot tier: a d-prefix
    // search touches d/64 of the bytes with zero re-encoding (unlike
    // int8/PQ, truncation needs no codebook — the slice IS the index).
    // The gauge's finding on THIS corpus is the point: synthetic
    // untrained vectors spread signal evenly across dims, so prefix
    // recall collapses (~0.07 at d=32, 0 at d=16) while int8 (e16)
    // holds — truncation is only a valid lever for MRL-trained
    // embeddings, and this query is the check that catches it. Same
    // brute-force shape as e16: query side broadcast, corpus streams,
    // one scan per d.
    "e18_truncation_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val exact = queries("e01_knn_cosine_baseline")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      val topk = graft.functions.Similarity.topKAgg(3)
      Seq(32, 16).map { d =>
        val t = emb.select(col("vec_id"), expr(s"slice(v, 1, $d)").as("tv"))
        val q = t.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_vec_id"), col("tv").as("qv"))
        val c = t.select(col("vec_id").as("n_vec_id"), col("tv").as("cv"))
        val sims = c.join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
          .select(col("q_vec_id"), col("n_vec_id"),
            cosineRounded(col("qv"), col("cv")).as("sim"))
        val approx = sims.groupBy(col("q_vec_id"))
          .agg(topk(col("sim"), col("n_vec_id")).as("top"))
          .select(col("q_vec_id"), explode(col("top")).as("t"))
          .select(col("q_vec_id"), col("t._2").as("n_vec_id"))
        recallVsExact(exact, approx).withColumn("dims", lit(d.toLong))
      }.reduce(_ unionAll _).orderBy(col("dims").desc, col("q_vec_id"))
    }),

    // Binary (1-bit sign) quantization recall — the fourth and smallest
    // rung of the compression ladder (float64 → int8 e07/e16 → PQ
    // e09/e14 → prefix e18 → 1 bit/dim here): 64 dims pack into 8
    // bytes, search is XOR + popcount (the cheapest distance there is),
    // and recall@3 vs the full-precision exact baseline decides whether
    // the 32× storage cut is admissible as a first-pass filter. Packed
    // as two 32-bit halves so neither engine touches the BIGINT sign
    // bit. One corpus scan; the 5-query side broadcasts.
    "e19_binary_quantize_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val coded = signCodes(emb)
      val q = coded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("c0").as("q0"), col("c1").as("q1"))
      val c = coded.select(col("vec_id").as("n_vec_id"), col("c0"), col("c1"))
      val sims = c.join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          (lit(64.0) - (expr("bit_count(c0 ^ q0)") + expr("bit_count(c1 ^ q1)"))
            .cast("double")).as("sim"))
      val topk = graft.functions.Similarity.topKAgg(3)
      val approx = sims.groupBy(col("q_vec_id"))
        .agg(topk(col("sim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), explode(col("top")).as("t"))
        .select(col("q_vec_id"), col("t._2").as("n_vec_id"))
      val exact = queries("e01_knn_cosine_baseline")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      recallVsExact(exact, approx)
    }),

    // The production two-stage shape e19 motivates: binary codes alone
    // recall ~0.33, so they are a FIRST-PASS FILTER — over-fetch the
    // hamming top-k' (k' ≫ final k), then re-rank only those candidates
    // in full precision and keep top-3. Measured at two over-fetch
    // depths (16 and 64) from ONE hamming pass and ONE re-rank join, so
    // the result is the recall-vs-overfetch curve the tiering decision
    // actually reads. The corpus-sized work stays XOR+popcount on
    // 8-byte codes (32× less IO than the vectors); exact cosine runs on
    // ≤64 rows/query. At 100 TB the candidate join is an equi-join on
    // n_vec_id against the vector store — candidates per query are
    // bounded by the over-fetch constant, so the re-rank side never
    // scales with the corpus.
    "e20_binary_rerank_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val coded = signCodes(emb)
      val q = coded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("c0").as("q0"), col("c1").as("q1"))
      val c = coded.select(col("vec_id").as("n_vec_id"), col("c0"), col("c1"))
      val hsims = c.join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          (lit(64.0) - (expr("bit_count(c0 ^ q0)") + expr("bit_count(c1 ^ q1)"))
            .cast("double")).as("hsim"))
      // one hamming top-64 pass; posexplode keeps the hamming rank so
      // the 16-deep candidate set is a filter, not a second pass
      val over = graft.functions.Similarity.topKAgg(64)
      val cand = hsims.groupBy(col("q_vec_id"))
        .agg(over(col("hsim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), posexplode(col("top")).as(Seq("rank", "t")))
        .select(col("q_vec_id"), col("rank"), col("t._2").as("n_vec_id"))
      // re-rank once for all 64: the candidate set (bounded by
      // overfetch × queries rows, NEVER corpus-sized) broadcasts to
      // the vector store's scan, as does the 5-query vector side —
      // the corpus is never shuffled for the re-rank
      val qv = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      val reranked = emb
        .select(col("vec_id").as("n_vec_id"), col("v").as("cv"))
        .join(broadcast(cand), Seq("n_vec_id"))
        .join(broadcast(qv), Seq("q_vec_id"))
        .select(col("q_vec_id"), col("rank"), col("n_vec_id"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      val exact = queries("e01_knn_cosine_baseline")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      val topk = graft.functions.Similarity.topKAgg(3)
      Seq(16, 64).map { depth =>
        val approx = reranked.filter(col("rank") < depth)
          .groupBy(col("q_vec_id"))
          .agg(topk(col("sim"), col("n_vec_id")).as("top"))
          .select(col("q_vec_id"), explode(col("top")).as("t"))
          .select(col("q_vec_id"), col("t._2").as("n_vec_id"))
        recallVsExact(exact, approx).withColumn("overfetch", lit(depth.toLong))
      }.reduce(_ unionAll _).orderBy(col("overfetch"), col("q_vec_id"))
    }),

    // IVF probe-count CURVE — the e20 doctrine for the IVF knob: from
    // ONE candidate pass (cells ranked <= 4 per query, each candidate
    // tagged with its cell's probe rank), measure recall@3 at probes =
    // 1, 2 and 4 — the recall-vs-scan-fraction tradeoff an IVF
    // deployment tunes (each probe step scans another ~1/k of the
    // corpus). Coarse quantizer = e10/e13's trained k-means, so the
    // curve extends the e13 point measurement into the tuning table.
    "e22_ivf_probe_curve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val cents = kmeansCentroids(s, emb, k = 8, iters = 3)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("csim").desc, col("cid"))
      val probes = qs.crossJoin(broadcast(cents))
        .select(col("q_vec_id"), col("qv"), col("cid"),
          cosine(col("qv"), col("cv")).as("csim"))
        .withColumn("cell_rank", row_number().over(probeW))
        .filter(col("cell_rank") <= 4)
        .select(col("q_vec_id"), col("qv"), col("cid"), col("cell_rank"))
      // row-local assignment carries v — no corpus self-join (r17)
      val cands = kmeansAssign(emb, cents)
        .select(col("vec_id").as("n_vec_id"), col("cid"), col("v").as("cv"))
      val sims = cands.join(broadcast(probes), Seq("cid"))
        .filter(col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"), col("cell_rank"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      val exact = queries("e01_knn_cosine_baseline")(s, dir)
        .select(col("q_vec_id"), col("n_vec_id"))
      val topk = graft.functions.Similarity.topKAgg(3)
      Seq(1, 2, 4).map { k =>
        val approx = sims.filter(col("cell_rank") <= k)
          .groupBy(col("q_vec_id"))
          .agg(topk(col("sim"), col("n_vec_id")).as("top"))
          .select(col("q_vec_id"), explode(col("top")).as("t"))
          .select(col("q_vec_id"), col("t._2").as("n_vec_id"))
        recallVsExact(exact, approx).withColumn("probes", lit(k.toLong))
      }.reduce(_ unionAll _).orderBy(col("probes"), col("q_vec_id"))
    }),

    // FILTERED vector search — the vector-DB staple e06 doesn't cover:
    // "nearest neighbors WHERE <predicate>". The naive strategy
    // (post-filter: probe cells as if unfiltered, then apply the
    // predicate) silently loses recall because the filtered survivors
    // of the probed cells may not contain the filtered corpus's true
    // neighbors — and the fix is more probes, not a new index. This
    // gauge measures exactly that: truth = exact top-3 over the
    // FILTERED corpus (a selectivity-0.5 vec_id-parity predicate,
    // deliberately independent of the cell structure), approx =
    // post-filtered IVF at probes 2 and 4 from ONE candidate pass (the
    // e22 trick). At 100 TB the filter pushes into the candidate scan
    // (codegen predicate on the cell-partitioned table) — the probe
    // count is the only recall knob that survives arbitrary predicates.
    "e24_filtered_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      val topk = graft.functions.Similarity.topKAgg(3)
      def top3(sims: DataFrame): DataFrame = sims
        .groupBy(col("q_vec_id")).agg(topk(col("sim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), explode(col("top")).as("t"))
        .select(col("q_vec_id"), col("t._2").as("n_vec_id"))
      val exact = top3(emb.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("n_vec_id"), col("v").as("cv"))
        .crossJoin(broadcast(qs))
        .filter(col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          cosineRounded(col("qv"), col("cv")).as("sim")))
      val centroids = emb
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos")).agg(round(avg(col("x")), 6).as("c"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label").as("cell"), expr("transform(pc, p -> p.c)").as("cv"))
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("csim").desc, col("cell"))
      val probes = qs.crossJoin(broadcast(centroids))
        .select(col("q_vec_id"), col("qv"), col("cell"),
          cosine(col("qv"), col("cv")).as("csim"))
        .withColumn("cell_rank", row_number().over(probeW))
        .filter(col("cell_rank") <= 4)
        .select(col("q_vec_id"), col("qv"), col("cell"), col("cell_rank"))
      val sims = emb.filter(col("vec_id") % 2 === 0) // the filter pushes into the scan
        .select(col("vec_id").as("n_vec_id"), col("label").as("cell"),
          col("v").as("cv"))
        .join(broadcast(probes), Seq("cell"))
        .filter(col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"), col("cell_rank"),
          cosineRounded(col("qv"), col("cv")).as("sim"))
      Seq(2, 4).map { k =>
        recallVsExact(exact, top3(sims.filter(col("cell_rank") <= k)))
          .withColumn("probes", lit(k.toLong))
      }.reduce(_ unionAll _).orderBy(col("probes"), col("q_vec_id"))
    }),

    // Multi-probe LSH (Lv et al. 2007) — e22's recall-vs-cost knob for
    // the SRP side: instead of adding bands (more index state), probe
    // the buckets whose 24-bit band key differs by <=2 bits from the
    // query's. The probe side explodes each key into its 1+24+276
    // hamming-ball variants and equi-joins the UNPROBED key table, so
    // the topology stays a bucket join (no pairwise scan); a matched
    // pair's probe LEVEL is exactly popcount(keyA^keyB) minimized over
    // bands, so one candidate pass yields the whole curve (the e22
    // trick). Recall truth = the 10 planted near-dup pairs of
    // injectedCorpus; candidate volume beside it is the cost axis.
    // Deliberately 2 bands x 24 rows AND a harder perturbation than
    // injectedCorpus (±5/24 per-dim, cos ~0.98, vs ±5/128): sparse
    // enough that probe-0 recall is LOW and the curve earns its keep.
    "e23_multiprobe_lsh" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val pert = base.filter(col("vec_id") < 10)
        .withColumn("v",
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1), (x, d) =>
            x * (lit(1.0) +
              ((d.cast("long") * 31 + col("vec_id") * 7) % 11 - 5).cast("double")
                / 24.0)))
        .select((col("vec_id") + 100000L).as("vec_id"), col("v"))
      val corpus = base.unionAll(pert)
      val keys = srpBandKeys(bands = 2, rows = 24)
      val bands = corpus.select(col("vec_id"),
        posexplode(keys(col("v"))).as(Seq("band_id", "bkey")))
      val deltas = (Seq((0L, 0)) ++
        (0 until 24).map(i => (1L << i, 1)) ++
        (for { i <- 0 until 24; j <- i + 1 until 24 }
          yield ((1L << i) | (1L << j), 2))).toSeq
      val dDf = s.createDataFrame(deltas).toDF("delta", "level")
      val probes = bands.crossJoin(broadcast(dDf))
        .select(col("vec_id"), col("band_id"),
          col("bkey").bitwiseXOR(col("delta")).as("pkey"), col("level"))
      val pairLevels = probes.as("a").join(bands.as("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.pkey") === col("b.bkey") &&
            col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .agg(min(col("a.level")).as("lvl"))
      val planted = (col("id_b") === col("id_a") + 100000L) && col("id_a") < 10
      val lvls = s.createDataFrame(Seq(0, 1, 2).map(Tuple1(_))).toDF("probe_level")
      lvls.join(pairLevels, col("lvl") <= col("probe_level"), "left")
        .groupBy(col("probe_level"))
        .agg(count(col("lvl")).as("n_candidates"),
          sum(when(planted, 1L).otherwise(0L)).as("n_planted_found"))
        .select(col("probe_level").cast("long").as("probe_level"),
          col("n_candidates"),
          col("n_planted_found"),
          round(col("n_planted_found").cast("double") / 10d, 6).as("recall"))
        .orderBy(col("probe_level"))
    }),

    // Combined IVF+PQ — the two scale levers composed into the one
    // index a 100 TB ANN deployment actually runs (the FAISS IVFPQ
    // shape, Jégou et al. 2011 §V): the coarse quantizer (e06's label
    // cells) bounds WHICH vectors are scored (top-2 probed cells, ~2/8
    // of the corpus) and PQ asymmetric distance (e14's 8×16 broadcast
    // table) bounds WHAT is read per vector (the 8-byte code — the
    // float corpus is never touched by the search). Codes are raw-
    // vector PQ, not residual PQ (FAISS `by_residual=false`): one
    // shared codebook keeps the e09/e14/e21 family on the same pin.
    // Topology (r17): the cell RIDES THROUGH the encode pass — pqSub
    // carries non-v columns — so the r16 code-to-cell tagging join (a
    // corpus-sized vec_id equi-join) is gone; probes and distance
    // tables are broadcast, ranking is a per-query window over ≤2
    // cells of candidates, and the only corpus-sized exchange left is
    // the final per-(query, candidate) ADC sum. Recall@3 vs the
    // brute-force L2 truth says what the double approximation costs.
    "e21_ivfpq_recall" -> ((s, dir) => {
      val embl = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      ivfpqRecall(embl, embl)
    }),

    "e05_centroids_full" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      val perDim = e.groupBy(col("label"), col("pos"))
        .agg(avg(col("x")).as("c"), count(lit(1)).as("n"))
      perDim.groupBy(col("label"))
        .agg(max(col("n")).as("n_vecs"),
          round(sum(round(col("c"), 6)), 4).as("centroid_sum"),
          round(max(when(col("pos") === 0, col("c"))), 6).as("c0"),
          round(max(when(col("pos") === 63, col("c"))), 6).as("c63"))
        .orderBy(col("label"))
    }),
  )

  /** e21's IVF+PQ search, factored over (corpus, codebook source) so the
    * ScaleCheck `ivfpq` mode runs the fixed-codebook regime the query's
    * registry comment claims at scale: PQ codebook, coarse centroids and
    * the 5-query set all come from `codebookSrc` (the 1× base in scale
    * runs; the corpus itself in the oracle-gated e21), only the
    * code-tagging join and the probed-cell candidate scan see the scaled
    * corpus. Both frames are (vec_id, label, v: array<double>).
    */
  private[graft] def ivfpqRecall(embl: DataFrame, codebookSrc: DataFrame,
      canonicalId: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]
        = None): DataFrame = {
      // canonicalId: duplicate-invariant recall for ScaleCheck's k x
      // duplicated corpora — candidate ids map to their base id and the
      // min distance per (query, canonical id) ranks, AFTER every copy
      // has flowed through PQ/exact scoring. None (the oracle-gated
      // e21) keeps the ranking exactly as-is.
      def canon(df: DataFrame, dist: String): DataFrame = canonicalId match {
        case None => df
        case Some(f) => df
          .select(col("q_vec_id"), f(col("n_vec_id")).as("n_vec_id"), col(dist))
          // a COPY of the query vector is a canonical self-match: drop
          // it like the raw-id self-match, or it tops both rankings
          .filter(col("q_vec_id") =!= col("n_vec_id"))
          .groupBy(col("q_vec_id"), col("n_vec_id"))
          .agg(min(col(dist)).as(dist))
      }
      val emb = embl.select(col("vec_id"), col("v"))
      val codebook = pqCodebook(codebookSrc.select(col("vec_id"), col("v")))
      // the IVF cell rides through pqSub/pqEncode (r17): the old shape
      // re-joined the 8-codes-per-vector table to the corpus by vec_id
      // just to attach `cell` — a corpus-sized exchange for a column the
      // encode pass already had in hand
      val enc = pqEncode(
        embl.select(col("vec_id"), col("label").as("cell"), col("v")), codebook)
      // coarse codebook: per-cell mean vectors (e06's construction)
      val centroids = codebookSrc
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos")).agg(round(avg(col("x")), 6).as("c"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label").as("cell"), expr("transform(pc, p -> p.c)").as("cv"))
      val qs = codebookSrc.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("csim").desc, col("cell"))
      val probes = qs.crossJoin(broadcast(centroids))
        .select(col("q_vec_id"), col("cell"), cosine(col("qv"), col("cv")).as("csim"))
        .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= 2)
        .select(col("q_vec_id"), col("cell"))
      // ADC table: per (query, sub_j, code) distance, rounded BEFORE
      // the 8-way sum (same last-ulp doctrine as e14)
      val qsub = qs.select(col("q_vec_id"), posexplode(
          transform(sequence(lit(0), lit(7)),
            j => slice(col("qv"), j * lit(8) + 1, lit(8)))).as(Seq("sub_j", "qsv")))
      val dtable = qsub.join(broadcast(codebook), Seq("sub_j"))
        .select(col("q_vec_id"), col("sub_j"), col("code"),
          round(sqDistCol(col("qsv"), col("cv")), 6).as("d"))
      val approxW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("ad").asc, col("n_vec_id").asc)
      val approx = enc
        .select(col("vec_id").as("n_vec_id"), col("cell"), col("sub_j"), col("code"))
        .join(broadcast(probes), Seq("cell"))
        .filter(col("q_vec_id") =!= col("n_vec_id"))
        .join(broadcast(dtable), Seq("q_vec_id", "sub_j", "code"))
        .groupBy(col("q_vec_id"), col("n_vec_id"))
        .agg(round(sum(col("d")), 6).as("ad"))
      val approxRanked = canon(approx, "ad")
        .withColumn("rn", row_number().over(approxW)).filter(col("rn") <= 3)
        .select(col("q_vec_id"), col("n_vec_id"))
      // truth side: brute-force L2 top-3 (the e14 gauge's exact side)
      val exactW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("ed").asc, col("n_vec_id").asc)
      val exact = emb.select(col("vec_id").as("n_vec_id"), col("v"))
        .join(broadcast(qs), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          round(sqDistCol(col("qv"), col("v")), 6).as("ed"))
      val exactRanked = canon(exact, "ed")
        .withColumn("rn", row_number().over(exactW)).filter(col("rn") <= 3)
        .select(col("q_vec_id"), col("n_vec_id"))
      recallVsExact(exactRanked, approxRanked)
  }

  /** recall@k of `approx` against `exact`, both (q_vec_id, n_vec_id)
    * result sets — the single gauge shared by e12 and e13 so the two
    * measurements can never drift apart.
    */
  /** 1-bit sign codes over a (vec_id, v) frame, packed as two 32-bit
    * halves so neither engine touches the BIGINT sign bit — the shared
    * quantizer of e19 (raw-code recall) and e20 (re-rank curve).
    */
  private def signCodes(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("aggregate(sequence(0, 31), 0L, (acc, i) -> " +
        "acc + if(v[i] > 0d, shiftleft(1L, i), 0L))").as("c0"),
      expr("aggregate(sequence(32, 63), 0L, (acc, i) -> " +
        "acc + if(v[i] > 0d, shiftleft(1L, i - 32), 0L))").as("c1"))

  private def recallVsExact(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = exact.join(approx, Seq("q_vec_id", "n_vec_id"))
      .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_vec_id"), "left")
      .select(col("q_vec_id"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_exact"), 4).as("recall"))
      .orderBy(col("q_vec_id"))
  }

  /** The embeddings corpus plus 10 deterministically perturbed copies
    * (vec_id + 100000) — injected near-duplicates so the e08/e11 dedup
    * queries have guaranteed positives at every SF. Perturbation
    * happens BEFORE renaming vec_id: with both in one select, the
    * lambda's vec_id reference would resolve against the aliased
    * output (+100000), silently shifting every factor.
    */
  private def injectedCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val pert = base.filter(col("vec_id") < 10)
      .withColumn("v",
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1), (x, d) =>
          x * (lit(1.0) +
            ((d.cast("long") * 31 + col("vec_id") * 7) % 11 - 5).cast("double") / 128.0)))
      .select((col("vec_id") + 100000L).as("vec_id"), col("v"))
    base.unionAll(pert)
  }

  /** The embeddings corpus plus 700 perturbed copies of base vectors 0
    * and 1 (ids 200000+r / 210000+r) — two clusters forced past the
    * e11 chunk bound so the stress entry exercises the guard.
    * Perturbation happens before the id rename (same alias trap as
    * [[injectedCorpus]]).
    */
  private def megaClusterCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val reps = s.range(0, 700, 1, 1).select(col("id").as("r"))
    val mega = base.filter(col("vec_id") < 2).crossJoin(broadcast(reps))
      .withColumn("v",
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1), (x, d) =>
          x * (lit(1.0) +
            ((d.cast("long") * 13 + col("r")) % 7 - 3).cast("double") / 256.0)))
      .select((col("vec_id") * 10000L + col("r") + 200000L).as("vec_id"), col("v"))
    base.unionAll(mega)
  }

  /** SemDeDup cluster assignment with the mega-cluster guard: clusters
    * larger than `maxCluster` are split into bounded chunks by vec_id
    * rank — the d08 mega-bucket doctrine applied to the semantic
    * space. At 100 TB one dense cluster otherwise lands on a single
    * task as an O(n^2) pairwise loop holding the whole cluster in
    * memory; chunked, it costs ceil(n/maxCluster) bounded tasks.
    * Pairs straddling a chunk boundary are the scheme's documented
    * recall loss — the same class as pairs straddling a cluster
    * boundary, which SemDeDup already accepts by construction.
    */
  private def semdedupChunked(s: SparkSession, corpus: DataFrame,
      maxCluster: Int): DataFrame = {
    val cents = kmeansCentroids(s, corpus, k = 8, iters = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("vec_id"))
    kmeansAssign(corpus, cents)
      .select(col("cid"), col("vec_id"), col("v"), norm(col("v")).as("nrm"))
      .withColumn("chunk", ((row_number().over(w) - 1) / maxCluster).cast("int"))
  }

  /** The SemDeDup pairwise stage over [[semdedupChunked]] groups. This
    * is per-chunk IMPERATIVE work, not a join: a cid-equi self-join
    * materializes two 64-double arrays into every one of the ~n^2/k
    * joined rows (~0.5 GB of array copying at sf0.1, measured 7 s);
    * flatMapGroups materializes each chunk's vectors ONCE and runs a
    * primitive dot loop over the pairs — the documented
    * mapPartitions-as-last-resort case. The kernel emits the RAW
    * cosine; rounding and the threshold stay in Catalyst so the
    * compare semantics match the oracle exactly.
    */
  private def semdedupPairs(s: SparkSession, corpus: DataFrame,
      threshold: Option[Double] = Some(0.95),
      maxCluster: Int = 512): DataFrame = {
    import s.implicits._
    val chunked = semdedupChunked(s, corpus, maxCluster)
      .select(col("cid"), col("chunk"), col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Int, Long, Array[Double], Double)]
    val pairs = chunked.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Long, Array[Double], Double)]) =>
        val m = it.toArray.sortBy(_._3)
        for {
          i <- m.indices.iterator
          j <- (i + 1) until m.length
        } yield {
          val (_, _, ida, va, na) = m(i)
          val (_, _, idb, vb, nb) = m(j)
          var s = 0.0
          var d = 0
          while (d < va.length) { s += va(d) * vb(d); d += 1 }
          (key._1, key._2, ida, idb, s / (na * nb))
        }
      }
      .toDF("cid", "chunk_a", "vec_a", "vec_b", "raw_cos")
      .select(col("cid"), col("chunk_a"), col("vec_a"), col("vec_b"),
        round(col("raw_cos"), 6).as("cos"))
    threshold.fold(pairs)(t => pairs.filter(col("cos") >= t))
  }

  /** 64-dim vectors split into 8 subspaces of 8 dims. Non-`v` input
    * columns ride through (r17) so callers can carry e.g. the IVF cell
    * instead of re-joining the code table to the corpus by vec_id.
    */
  private def pqSub(emb: DataFrame): DataFrame =
    emb.select(emb.columns.filter(_ != "v").map(col).toSeq :+ posexplode(
      transform(sequence(lit(0), lit(7)),
        j => slice(col("v"), j * lit(8) + 1, lit(8)))).as(Seq("sub_j", "sv")): _*)

  /** The codebook regrouped per subspace for the row-local argmin:
    * (sub_j, array<struct<c: code, cv>>) — 8 rows, broadcast to the
    * encode join. */
  private def pqBook(codebook: DataFrame): DataFrame =
    codebook.groupBy(col("sub_j"))
      .agg(collect_list(struct(col("code").as("c"), col("cv"))).as("book"))

  /** The refined 8x16 PQ codebook (seeds = subvectors of vec_id 0..15,
    * ONE Lloyd iteration, 6-dp centroid rounding so both engines hold
    * the bit-identical book). Shared by e09 (encode) and e14 (ADC).
    */
  private[queries] def pqCodebook(emb: DataFrame): DataFrame = {
    val sub = pqSub(emb)
    val seeds = sub.filter(col("vec_id") < 16)
      .select(col("sub_j"), col("vec_id").as("code"), col("sv").as("cv"))
    // row-local argmin over the per-subspace seed book (r17): same
    // min(struct(d, code)) the old crossJoin+groupBy computed, with no
    // exchange — see [[argminBookK]]
    val assign1 = sub.join(broadcast(pqBook(seeds)), Seq("sub_j"))
      .withColumn("best", argminBookK(col("sv"), col("book")))
      .select(col("sub_j"), col("best._2").as("code"), col("sv"))
    assign1
      .select(col("sub_j"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub_j"), col("code"), col("pos"))
      .agg(round(avg(col("x")), 6).as("c"))
      .groupBy(col("sub_j"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("sub_j"), col("code"), expr("transform(pc, p -> p.c)").as("cv"))
  }

  /** Every subvector encoded as its nearest refined code:
    * (vec_id, sub_j, code, err). min(struct) argmin — partial-agg
    * friendly, deterministic tie-break on code, never a window.
    * Callers build the codebook once and pass it in, so a query using
    * the book twice (e14: encode + distance tables) shares ONE plan
    * subtree instead of leaning on exchange reuse to dedup two.
    */
  private[queries] def pqEncode(emb: DataFrame, codebook: DataFrame): DataFrame = {
    // row-local argmin (r17): the old form's groupBy(vec_id, sub_j)
    // exchange shuffled 8 code rows per corpus vector; the argmin now
    // evaluates inside the scan stage against the broadcast per-subspace
    // book — identical min(struct(d, code)), zero exchanges. Non-v input
    // columns (e21's cell) ride through pqSub.
    val carry = emb.columns.filter(_ != "v").map(col).toSeq
    pqSub(emb).join(broadcast(pqBook(codebook)), Seq("sub_j"))
      .withColumn("best", argminBookK(col("sv"), col("book")))
      .select(carry :+ col("sub_j") :+ col("best._2").as("code")
        :+ round(col("best._1"), 4).as("err"): _*)
  }

  /** Squared L2 distance as a compiled loop (r17) — bit-identical to the
    * original `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0, +)`
    * HOF chain (same per-index op order), ~10x cheaper per row because
    * HOF lambdas evaluate interpreted per element (the
    * minhashShingleSigCW doctrine). Null / length-mismatch -> null,
    * matching zip_with's null-padding fold.
    */
  private val sqDistK = udf((a: Seq[Double], b: Seq[Double]) =>
    if (a == null || b == null || a.length != b.length) None
    else {
      val x = a.toArray; val y = b.toArray
      var s = 0.0; var i = 0
      while (i < x.length) { val t = x(i) - y(i); s += t * t; i += 1 }
      Some(s)
    })

  private[queries] def sqDistCol(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = sqDistK(a, b)

  /** Row-local argmin over a collected codebook (r17): returns the
    * lexicographic minimum of struct(d = sqdist(v, cv), c) over the book
    * entries — EXACTLY the `min(struct(d, c))` aggregate the old
    * crossJoin+groupBy form computed, evaluated inside the scan stage
    * instead of across an exchange. The old shape re-shuffled the full
    * vector column once per assignment (the partial agg cut k rows to 1,
    * but the exchange still moved every (vec_id, v) row); this shape
    * shuffles NOTHING — the 100 TB assign pass becomes scan-local.
    * Tie-break (same d) resolves to the smaller c, as struct ordering
    * did. Comparison goes through java.lang.Double.compare (r18, ADVICE
    * r17): Spark's struct-min ordering (nanSafeCompareDoubles) ranks NaN
    * GREATER than every value, so a NaN distance (null/mismatched cv,
    * NaN vector values) must lose to any finite one — the old `<`/`==`
    * form let a NaN FIRST entry win permanently, and since the book
    * comes from collect_list (nondeterministic order) the chosen code
    * became partitioning-dependent on degenerate inputs. Double.compare
    * ranks NaN last exactly like nanSafeCompareDoubles here (-0.0, the
    * one case they differ on, cannot arise from a sum of squares).
    */
  private val argminBookK = udf((v: Seq[Double], book: Seq[org.apache.spark.sql.Row]) =>
    if (v == null || book == null || book.isEmpty) None
    else {
      val x = v.toArray
      var bestD = Double.NaN; var bestC = 0L; var first = true
      book.foreach { k =>
        val c = k.getLong(0)
        val cv = k.getSeq[Double](1)
        var s = 0.0
        if (cv == null || cv.length != x.length) s = Double.NaN
        else {
          var i = 0
          while (i < x.length) { val t = x(i) - cv(i); s += t * t; i += 1 }
        }
        val cmp = if (first) -1 else java.lang.Double.compare(s, bestD)
        if (cmp < 0 || (cmp == 0 && c < bestC)) {
          bestD = s; bestC = c; first = false
        }
      }
      Some((bestD, bestC))
    })

  /** Assign every vector to its nearest centroid — row-local argmin over
    * the broadcast codebook (see [[argminBookK]]); zero exchanges where
    * the r16 form shuffled the corpus per assignment. Extra input
    * columns (label, …) ride through so callers no longer re-join the
    * assignment to the corpus by vec_id. Returns input columns + (cid, d).
    */
  private[queries] def kmeansAssign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val book = cents.agg(collect_list(
      struct(col("cid").cast("long").as("c"), col("cv"))).as("book"))
    emb.crossJoin(broadcast(book))
      .withColumn("best", argminBookK(col("v"), col("book")))
      .select(emb.columns.map(col).toSeq :+ col("best._2").cast("int").as("cid")
        :+ col("best._1").as("d"): _*)
  }

  /** Lloyd's k-means: deterministic seeds (vectors vec_id < k), fixed
    * iteration count, per-iteration 6-dp centroid rounding so both
    * engines iterate bit-identically. Returns the final (cid, cv)
    * codebook, localCheckpointed.
    */
  private def kmeansCentroids(s: SparkSession, emb: DataFrame,
      k: Int, iters: Int): DataFrame = {
    def recenter(assigned: DataFrame): DataFrame =
      assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("x")), 6).as("c"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("cid"), expr("transform(pc, p -> p.c)").as("cv"))
    val ckpt = new graft.operators.RoundCheckpointer(s)
    val invariants = new graft.operators.RoundCheckpointer(s)
    // checkpoint the corpus once: rounds 1..iters and the caller's final
    // assignment otherwise re-scan parquet (and re-run the transform)
    // per round, and each round's plan re-analyzes the upstream tree;
    // the count sizes the round shuffles to the data (a 4k-vector
    // corpus iterates at 1 partition instead of a session-width stage
    // of mostly-empty tasks per round)
    val corpus = invariants.next(emb)
    val rows = corpus.count()
    val result = graft.operators.RoundPartitions.scoped(s, rows) {
      var cents = ckpt.next(corpus.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cid"), col("v").as("cv")))
      var it = 0
      while (it < iters) {
        cents = ckpt.next(recenter(kmeansAssign(corpus, cents)))
        ckpt.releaseSuperseded()
        it += 1
      }
      cents
    }
    invariants.releaseAll()
    result
  }

  /** The unrolled Lloyd chain shared by the e10/e11 oracles: expects an
    * `emb(vec_id, v)` CTE upstream; defines cents0 (seeds) -> a1 ->
    * cents1 -> a2 -> cents2 -> a3 -> cents3 -> a4 (final assignment,
    * `best` = {d, c}).
    */
  private def kmeansChainSql: String = {
    val dist = (cv: String) =>
      s"""list_sum(list_transform(range(1, 65),
          i -> (v[CAST(i AS INT)] - $cv[CAST(i AS INT)])
             * (v[CAST(i AS INT)] - $cv[CAST(i AS INT)])))"""
    def assignCte(a: String, cents: String) =
      s"""$a AS (
          SELECT e.vec_id, e.v,
            min({'d': ${dist("k.cv")}, 'c': k.cid}) AS best
          FROM emb e CROSS JOIN $cents k
          GROUP BY e.vec_id, e.v)"""
    def recenterCte(c: String, a: String) =
      s"""$c AS (
          SELECT cid, list(cc ORDER BY pos) AS cv FROM (
            SELECT best.c AS cid, CAST(pos AS INT) AS pos,
              round(avg(x), 6) AS cc
            FROM (SELECT best, unnest(range(0, 64)) AS pos, unnest(v) AS x
                  FROM $a)
            GROUP BY best.c, pos)
          GROUP BY cid)"""
    s"""cents0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv
         FROM emb WHERE vec_id < 8),
       ${assignCte("a1", "cents0")},
       ${recenterCte("cents1", "a1")},
       ${assignCte("a2", "cents1")},
       ${recenterCte("cents2", "a2")},
       ${assignCte("a3", "cents2")},
       ${recenterCte("cents3", "a3")},
       ${assignCte("a4", "cents3")}"""
  }

  private val dotSql =
    "list_sum(list_transform(range(1, len(qv) + 1), i -> qv[CAST(i AS INT)] * cv[CAST(i AS INT)]))"
  private val qNormSql =
    "sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[CAST(i AS INT)] * qv[CAST(i AS INT)])))"
  private val cNormSql =
    "sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> cv[CAST(i AS INT)] * cv[CAST(i AS INT)])))"

  /** Rounded pair cosine over the e11/e17 `ch` aliases (a.v, b.v). */
  private val pairCosSql =
    """round(list_sum(list_transform(range(1, 65),
         i -> a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]))
       / (sqrt(list_sum(list_transform(range(1, 65),
            i -> a.v[CAST(i AS INT)] * a.v[CAST(i AS INT)])))
        * sqrt(list_sum(list_transform(range(1, 65),
            i -> b.v[CAST(i AS INT)] * b.v[CAST(i AS INT)])))), 6)"""

  /** DuckDB mirror of [[semdedupChunked]]'s chunk assignment: expects
    * `a4` (final k-means assignment) upstream, defines `ch`.
    */
  private val semdedupChunkSql =
    """ch AS (
         SELECT vec_id, v, best.c AS cid,
           CAST(floor((row_number() OVER (
             PARTITION BY best.c ORDER BY vec_id) - 1) / 512) AS INT) AS chunk
         FROM a4)"""

  // same dot/norm construction over the e08 pair aliases (x.v, y.v)
  private val pairDotSql =
    "list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[CAST(i AS INT)] * y.v[CAST(i AS INT)]))"
  private val aNormSql =
    "sqrt(list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[CAST(i AS INT)] * x.v[CAST(i AS INT)])))"
  private val bNormSql =
    "sqrt(list_sum(list_transform(range(1, len(y.v) + 1), i -> y.v[CAST(i AS INT)] * y.v[CAST(i AS INT)])))"

  private val baseOracleSql: Map[String, String] = Map(
    "e07_quantize_int8" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         sc AS (SELECT vec_id, v,
                 greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS scale
                 FROM emb),
         qz AS (SELECT vec_id, v, scale,
                 list_transform(v, x -> floor(x * 127.0 / scale + 0.5)) AS q
                 FROM sc)
         SELECT vec_id, round(scale, 6) AS scale,
           CAST(list_max(list_transform(q, x -> abs(x))) AS INT) AS max_q,
           round(list_sum(list_transform(range(1, len(v) + 1),
             i -> abs(v[CAST(i AS INT)] - q[CAST(i AS INT)] * scale / 127.0))) / len(v), 6)
             AS mean_abs_err
         FROM qz ORDER BY vec_id""",
    "e01_knn_cosine_baseline" ->
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
    "e06_ivf_knn" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          cent AS (
            SELECT label AS cell, pos, round(avg(x), 6) AS c FROM (
              SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS x FROM emb) e
            GROUP BY label, pos),
          centv AS (SELECT cell, list(c ORDER BY pos) AS cv FROM cent GROUP BY cell),
          q AS (SELECT vec_id AS q_vec_id, v AS qv FROM emb WHERE vec_id < 5),
          probes AS (
            SELECT q_vec_id, qv, cell FROM (
              SELECT q.q_vec_id, q.qv, c.cell, c.cv,
                row_number() OVER (PARTITION BY q.q_vec_id
                  ORDER BY $dotSql / ($qNormSql * $cNormSql) DESC, c.cell) AS rn
              FROM q CROSS JOIN centv c) p WHERE rn <= 2),
          sims AS (
            SELECT p.q_vec_id, e.vec_id AS n_vec_id,
              round($dotSql / ($qNormSql * $cNormSql), 6) AS sim
            FROM (SELECT q_vec_id, qv, cell FROM probes) p
            JOIN (SELECT vec_id, label, v AS cv FROM emb) e
              ON e.label = p.cell AND e.vec_id <> p.q_vec_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn
            FROM sims)
          SELECT q_vec_id, n_vec_id, sim FROM ranked WHERE rn <= 3
          ORDER BY q_vec_id, sim DESC, n_vec_id""",
    // e04 = e01's result computed through the aggregate path: same oracle.
    "e04_knn_topk" ->
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
    "e24_filtered_ann" ->
      s"""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          q AS (SELECT vec_id AS q_vec_id, v AS qv FROM emb WHERE vec_id < 5),
          fc AS (SELECT vec_id AS n_vec_id, v AS cv FROM emb WHERE vec_id % 2 = 0),
          exsims AS (
            SELECT q_vec_id, n_vec_id,
                   round($dotSql / ($qNormSql * $cNormSql), 6) AS sim
            FROM q CROSS JOIN fc WHERE q_vec_id <> n_vec_id),
          exact AS (
            SELECT q_vec_id, n_vec_id FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn
              FROM exsims) t WHERE rn <= 3),
          cent AS (
            SELECT label AS cell, pos, round(avg(x), 6) AS c FROM (
              SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS x FROM emb) e
            GROUP BY label, pos),
          centv AS (SELECT cell, list(c ORDER BY pos) AS cv FROM cent GROUP BY cell),
          pr AS (
            SELECT q_vec_id, qv, cell, rn AS cell_rank FROM (
              SELECT q.q_vec_id, q.qv, c.cell, c.cv,
                row_number() OVER (PARTITION BY q.q_vec_id
                  ORDER BY $dotSql / ($qNormSql * $cNormSql) DESC, c.cell) AS rn
              FROM q CROSS JOIN centv c) p WHERE rn <= 4),
          sims AS (
            SELECT p.q_vec_id, e.vec_id AS n_vec_id, p.cell_rank,
              round($dotSql / ($qNormSql * $cNormSql), 6) AS sim
            FROM (SELECT q_vec_id, qv, cell, cell_rank FROM pr) p
            JOIN (SELECT vec_id, label, v AS cv FROM emb WHERE vec_id % 2 = 0) e
              ON e.label = p.cell AND e.vec_id <> p.q_vec_id),
          ks AS (SELECT unnest([2, 4]) AS probes),
          approx AS (
            SELECT probes, q_vec_id, n_vec_id FROM (
              SELECT k.probes, s.q_vec_id, s.n_vec_id,
                row_number() OVER (PARTITION BY k.probes, s.q_vec_id
                  ORDER BY s.sim DESC, s.n_vec_id ASC) AS rn
              FROM ks k JOIN sims s ON s.cell_rank <= k.probes) t
            WHERE rn <= 3),
          hits AS (
            SELECT a.probes, e.q_vec_id, count(*) AS n_hits
            FROM exact e JOIN approx a
              ON a.q_vec_id = e.q_vec_id AND a.n_vec_id = e.n_vec_id
            GROUP BY 1, 2),
          base AS (
            SELECT k.probes, e.q_vec_id, count(*) AS n_exact
            FROM exact e CROSS JOIN ks k GROUP BY 1, 2)
          SELECT b.q_vec_id, CAST(b.n_exact AS BIGINT) AS n_exact,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.n_exact, 4) AS recall,
            CAST(b.probes AS BIGINT) AS probes
          FROM base b LEFT JOIN hits h
            ON h.probes = b.probes AND h.q_vec_id = b.q_vec_id
          ORDER BY b.probes, b.q_vec_id""",
    "e23_multiprobe_lsh" -> {
      // same SRP weight family as e08's oracle, 2 bands x 24 rows; the
      // oracle states candidate levels directly as the min-over-bands
      // POPCOUNT of the key xor (the pipeline's probe enumeration finds
      // exactly the pairs with some band popcount <= 2)
      val rowsN = 24
      def bandKeySql(b: Int): String = {
        val terms = (0 until rowsN).map { r =>
          val q = b * rowsN + r
          s"""(CASE WHEN list_sum(list_transform(range(1, len(v) + 1),
                d -> v[CAST(d AS INT)] * ((CAST(d - 1 AS BIGINT) * 2654435761 + ${q * 40503L})
                      % 1024 - 511.5) / 1024.0)) > 0
              THEN ${1L << r} ELSE 0 END)"""
        }
        s"CAST(${terms.mkString(" + ")} AS BIGINT)"
      }
      val bandsSql = (0 until 2).map { b =>
        s"SELECT vec_id, $b AS band_id, ${bandKeySql(b)} AS bkey FROM corpus"
      }.mkString(" UNION ALL ")
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          pert AS (SELECT 100000 + vec_id AS vec_id,
              list_transform(range(1, len(v) + 1), d -> v[CAST(d AS INT)] *
                (1 + CAST((CAST(d - 1 AS BIGINT) * 31 + vec_id * 7) % 11 - 5 AS DOUBLE)
                     / 24.0)) AS v
            FROM base WHERE vec_id < 10),
          corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
          keys AS ($bandsSql),
          lvl AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              min(bit_count(xor(a.bkey, b.bkey))) AS lvl
            FROM keys a JOIN keys b
              ON a.band_id = b.band_id AND a.vec_id < b.vec_id
            GROUP BY 1, 2),
          levels AS (SELECT unnest(range(0, 3)) AS probe_level)
          SELECT CAST(levels.probe_level AS BIGINT) AS probe_level,
            count(lvl.lvl) AS n_candidates,
            CAST(coalesce(sum(CASE WHEN lvl.id_b = lvl.id_a + 100000
                AND lvl.id_a < 10 THEN 1 ELSE 0 END), 0) AS BIGINT)
              AS n_planted_found,
            round(coalesce(sum(CASE WHEN lvl.id_b = lvl.id_a + 100000
                AND lvl.id_a < 10 THEN 1 ELSE 0 END), 0) / 10.0, 6) AS recall
          FROM levels LEFT JOIN lvl ON lvl.lvl <= levels.probe_level
          GROUP BY levels.probe_level ORDER BY probe_level"""
    },
    // streaming semantic dedup relationally: e08's SRP signature family
    // packed to a 64-bit code, d22's banded pair machinery, d28's
    // arrival rule (wave = vec_id % 3, ties by id) picks the suppressed
    // side of each pair
    "e25_streaming_semdedup" -> {
      val rowsN = 16
      def bandKeySql(b: Int): String = {
        val terms = (0 until rowsN).map { r =>
          val q = b * rowsN + r
          s"""(CASE WHEN list_sum(list_transform(range(1, len(v) + 1),
                d -> v[CAST(d AS INT)] * ((CAST(d - 1 AS BIGINT) * 2654435761 + ${q * 40503L})
                      % 1024 - 511.5) / 1024.0)) > 0
              THEN ${1L << r} ELSE 0 END)"""
        }
        s"CAST(${terms.mkString(" + ")} AS BIGINT)"
      }
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          pert AS (SELECT 100000 + vec_id AS vec_id,
              list_transform(range(1, len(v) + 1), d -> v[CAST(d AS INT)] *
                (1 + CAST((CAST(d - 1 AS BIGINT) * 31 + vec_id * 7) % 11 - 5 AS DOUBLE)
                     / 128.0)) AS v
            FROM base WHERE vec_id < 10),
          corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
          codes AS (
            SELECT vec_id AS id,
              CAST(k0 + k1 * 65536 AS BIGINT) AS h0,
              CAST(k2 + k3 * 65536 AS BIGINT) AS h1
            FROM (SELECT vec_id, ${bandKeySql(0)} AS k0, ${bandKeySql(1)} AS k1,
                    ${bandKeySql(2)} AS k2, ${bandKeySql(3)} AS k3 FROM corpus)),
          ${StreamingDedup.suppressionTailSql}"""
    },
    "e08_embedding_neardup" -> {
      val bandsN = 4
      val rowsN = 16
      def bandKeySql(b: Int): String = {
        val terms = (0 until rowsN).map { r =>
          val q = b * rowsN + r
          s"""(CASE WHEN list_sum(list_transform(range(1, len(v) + 1),
                d -> v[CAST(d AS INT)] * ((CAST(d - 1 AS BIGINT) * 2654435761 + ${q * 40503L})
                      % 1024 - 511.5) / 1024.0)) > 0
              THEN ${1L << r} ELSE 0 END)"""
        }
        s"CAST(${terms.mkString(" + ")} AS BIGINT)"
      }
      val bandsSql = (0 until bandsN).map { b =>
        s"SELECT vec_id, v, $b AS band_id, ${bandKeySql(b)} AS bkey FROM corpus"
      }.mkString(" UNION ALL ")
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          pert AS (SELECT 100000 + vec_id AS vec_id,
              list_transform(range(1, len(v) + 1), d -> v[CAST(d AS INT)] *
                (1 + CAST((CAST(d - 1 AS BIGINT) * 31 + vec_id * 7) % 11 - 5 AS DOUBLE)
                     / 128.0)) AS v
            FROM base WHERE vec_id < 10),
          corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
          bands AS ($bandsSql),
          kept AS (SELECT band_id, bkey FROM bands
                   GROUP BY band_id, bkey HAVING count(*) <= 64),
          pruned AS (SELECT b.vec_id, b.band_id, b.bkey
                     FROM bands b JOIN kept k
                       ON b.band_id = k.band_id AND b.bkey = k.bkey),
          cand AS (
            SELECT DISTINCT a.vec_id AS orig_id, b.vec_id AS dup_id
            FROM pruned a JOIN pruned b
              ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
          pairs AS (
            SELECT c.orig_id, c.dup_id,
              round($pairDotSql / ($aNormSql * $bNormSql), 6) AS sim
            FROM cand c JOIN corpus x ON x.vec_id = c.orig_id
                        JOIN corpus y ON y.vec_id = c.dup_id)
          SELECT orig_id, dup_id, sim FROM pairs WHERE sim >= 0.95
          ORDER BY orig_id, dup_id"""
    },
    "e10_kmeans" ->
      s"""WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         $kmeansChainSql,
         summary AS (
           SELECT best.c AS cid, count(*) AS n_vecs,
             round(sum(round(best.d, 6)), 2) AS inertia
           FROM a4 GROUP BY best.c)
         SELECT s.cid, CAST(s.n_vecs AS BIGINT) AS n_vecs, s.inertia,
           round(list_sum(k.cv), 4) AS centroid_sum,
           round(k.cv[1], 6) AS c0
         FROM summary s JOIN cents3 k ON k.cid = s.cid
         ORDER BY s.cid""",
    "e15_cluster_purity" ->
      s"""WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         $kmeansChainSql,
         cont AS (SELECT a.best.c AS cid, l.label, count(*) AS n
           FROM a4 a JOIN (SELECT vec_id, label FROM embeddings) l
             USING (vec_id)
           GROUP BY 1, 2),
         top AS (SELECT cid, label AS top_label, n AS n_top FROM (
             SELECT cid, label, n, row_number() OVER (
               PARTITION BY cid ORDER BY n DESC, label ASC) AS rn FROM cont)
           WHERE rn = 1),
         sz AS (SELECT cid, sum(n) AS n_vecs FROM cont GROUP BY cid)
         SELECT CAST(s.cid AS INT) AS cid, CAST(s.n_vecs AS BIGINT) AS n_vecs,
           CAST(t.top_label AS INT) AS top_label,
           CAST(t.n_top AS BIGINT) AS n_top,
           round(CAST(t.n_top AS DOUBLE) / s.n_vecs, 4) AS purity
         FROM sz s JOIN top t USING (cid) ORDER BY cid""",
    // ch mirrors semdedupChunked: rank-within-cluster chunking at 512
    // (a no-op at current cluster sizes; parity holds at ANY size
    // because the oracle chunks identically).
    "e11_semdedup" ->
      s"""WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 100000,
             list_transform(range(0, 64), d -> v[CAST(d + 1 AS INT)]
               * (1.0 + ((d * 31 + vec_id * 7) % 11 - 5) / 128.0))
           FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id < 10)),
         $kmeansChainSql,
         $semdedupChunkSql
         SELECT a.cid, a.vec_id AS vec_a, b.vec_id AS vec_b,
           $pairCosSql AS cos
         FROM ch a JOIN ch b
           ON a.cid = b.cid AND a.chunk = b.chunk AND a.vec_id < b.vec_id
         WHERE $pairCosSql >= 0.95
         ORDER BY vec_a, vec_b""",
    "e17_semdedup_stress" ->
      s"""WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           UNION ALL
           SELECT vec_id * 10000 + r + 200000,
             list_transform(range(0, 64), d -> v[CAST(d + 1 AS INT)]
               * (1.0 + ((d * 13 + r) % 7 - 3) / 256.0))
           FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id < 2)
           CROSS JOIN (SELECT unnest(range(0, 700)) AS r)),
         $kmeansChainSql,
         $semdedupChunkSql,
         pairs AS (
           SELECT a.cid, a.chunk AS chunk_a, $pairCosSql AS cos
           FROM ch a JOIN ch b
             ON a.cid = b.cid AND a.chunk = b.chunk AND a.vec_id < b.vec_id)
         SELECT cid, CAST(count(DISTINCT chunk_a) AS BIGINT) AS n_chunks,
           count(*) AS n_pairs,
           CAST(sum(CASE WHEN cos >= 0.95 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
         FROM pairs GROUP BY cid ORDER BY cid""",
    "e09_product_quantize" ->
      s"""WITH $pqChainSql
         SELECT vec_id, sub_j, CAST(best.c AS BIGINT) AS code,
           round(best.d, 4) AS err
         FROM enc ORDER BY vec_id, sub_j""",
    "e14_pq_recall" ->
      s"""WITH $pqChainSql,
         qs AS (SELECT vec_id AS q_vec_id, v AS qv FROM emb WHERE vec_id < 5),
         qsub AS (SELECT q_vec_id, CAST(jj.j AS BIGINT) AS sub_j,
             list_slice(qv, CAST(jj.j * 8 + 1 AS INT),
               CAST(jj.j * 8 + 8 AS INT)) AS qsv
           FROM qs CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jj),
         dtable AS (SELECT q.q_vec_id, q.sub_j, k.code,
             round(list_sum(list_transform(range(1, 9),
               i -> (q.qsv[CAST(i AS INT)] - k.cv[CAST(i AS INT)])
                  * (q.qsv[CAST(i AS INT)] - k.cv[CAST(i AS INT)]))), 6) AS d
           FROM qsub q JOIN refv k USING (sub_j)),
         ad AS (SELECT d.q_vec_id, e.vec_id AS n_vec_id,
             round(sum(d.d), 6) AS ad
           FROM enc e JOIN dtable d
             ON d.sub_j = e.sub_j AND d.code = e.best.c
           WHERE d.q_vec_id <> e.vec_id
           GROUP BY d.q_vec_id, e.vec_id),
         approx AS (SELECT q_vec_id, n_vec_id FROM (
             SELECT q_vec_id, n_vec_id, row_number() OVER (
               PARTITION BY q_vec_id ORDER BY ad ASC, n_vec_id ASC) AS rn
             FROM ad) WHERE rn <= 3),
         ed AS (SELECT q.q_vec_id, e.vec_id AS n_vec_id,
             round(list_sum(list_transform(range(1, 65),
               i -> (q.qv[CAST(i AS INT)] - e.v[CAST(i AS INT)])
                  * (q.qv[CAST(i AS INT)] - e.v[CAST(i AS INT)]))), 6) AS ed
           FROM emb e CROSS JOIN qs q WHERE q.q_vec_id <> e.vec_id),
         exact AS (SELECT q_vec_id, n_vec_id FROM (
             SELECT q_vec_id, n_vec_id, row_number() OVER (
               PARTITION BY q_vec_id ORDER BY ed ASC, n_vec_id ASC) AS rn
             FROM ed) WHERE rn <= 3),
         $recallTailSql""",
    // pqChain supplies emb/refv/enc; embl re-reads with the label so
    // the coarse-cell CTEs (cent/centv, the e06 construction) and the
    // code->cell tag compose without touching the PQ chain's names.
    "e21_ivfpq_recall" ->
      s"""WITH $pqChainSql,
         embl AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
         cent AS (
           SELECT label AS cell, pos, round(avg(x), 6) AS c FROM (
             SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS x
             FROM embl) e
           GROUP BY label, pos),
         centv AS (SELECT cell, list(c ORDER BY pos) AS cv FROM cent GROUP BY cell),
         qs AS (SELECT vec_id AS q_vec_id, v AS qv FROM emb WHERE vec_id < 5),
         probes AS (
           SELECT q_vec_id, cell FROM (
             SELECT q.q_vec_id, c.cell,
               row_number() OVER (PARTITION BY q.q_vec_id
                 ORDER BY $dotSql / ($qNormSql * $cNormSql) DESC, c.cell) AS rn
             FROM qs q CROSS JOIN centv c) p WHERE rn <= 2),
         qsub AS (SELECT q_vec_id, CAST(jj.j AS BIGINT) AS sub_j,
             list_slice(qv, CAST(jj.j * 8 + 1 AS INT),
               CAST(jj.j * 8 + 8 AS INT)) AS qsv
           FROM qs CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jj),
         dtable AS (SELECT q.q_vec_id, q.sub_j, k.code,
             round(list_sum(list_transform(range(1, 9),
               i -> (q.qsv[CAST(i AS INT)] - k.cv[CAST(i AS INT)])
                  * (q.qsv[CAST(i AS INT)] - k.cv[CAST(i AS INT)]))), 6) AS d
           FROM qsub q JOIN refv k USING (sub_j)),
         cells AS (SELECT vec_id, label AS cell FROM embl),
         ad AS (SELECT d.q_vec_id, e.vec_id AS n_vec_id,
             round(sum(d.d), 6) AS ad
           FROM enc e JOIN cells cl ON cl.vec_id = e.vec_id
             JOIN probes p ON p.cell = cl.cell
             JOIN dtable d ON d.q_vec_id = p.q_vec_id
               AND d.sub_j = e.sub_j AND d.code = e.best.c
           WHERE p.q_vec_id <> e.vec_id
           GROUP BY d.q_vec_id, e.vec_id),
         approx AS (SELECT q_vec_id, n_vec_id FROM (
             SELECT q_vec_id, n_vec_id, row_number() OVER (
               PARTITION BY q_vec_id ORDER BY ad ASC, n_vec_id ASC) AS rn
             FROM ad) WHERE rn <= 3),
         ed AS (SELECT q.q_vec_id, e.vec_id AS n_vec_id,
             round(list_sum(list_transform(range(1, 65),
               i -> (q.qv[CAST(i AS INT)] - e.v[CAST(i AS INT)])
                  * (q.qv[CAST(i AS INT)] - e.v[CAST(i AS INT)]))), 6) AS ed
           FROM emb e CROSS JOIN qs q WHERE q.q_vec_id <> e.vec_id),
         exact AS (SELECT q_vec_id, n_vec_id FROM (
             SELECT q_vec_id, n_vec_id, row_number() OVER (
               PARTITION BY q_vec_id ORDER BY ed ASC, n_vec_id ASC) AS rn
             FROM ed) WHERE rn <= 3),
         $recallTailSql""",
    "e05_centroids_full" ->
      """WITH e AS (
           SELECT label,
             unnest(range(0, len(embedding))) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS x
           FROM embeddings),
         per_dim AS (
           SELECT label, pos, avg(x) AS c, count(*) AS n
           FROM e GROUP BY label, pos)
         SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
           round(sum(round(c, 6)), 4) AS centroid_sum,
           round(max(CASE WHEN pos = 0 THEN c END), 6) AS c0,
           round(max(CASE WHEN pos = 63 THEN c END), 6) AS c63
         FROM per_dim GROUP BY label ORDER BY label""",
  )

  /** DuckDB rendition of [[pqCodebook]] + [[pqEncode]]: CTEs emb, subs,
    * seeds, a1 (one Lloyd assign), ref/refv (re-centered codebook),
    * enc (final codes) — the shared front of the e09 and e14 oracles.
    */
  private def pqChainSql: String =
    """emb AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       subs AS (
         SELECT vec_id, CAST(jj.j AS BIGINT) AS sub_j,
           list_slice(v, CAST(jj.j * 8 + 1 AS INT), CAST(jj.j * 8 + 8 AS INT)) AS sv
         FROM emb CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jj),
       seeds AS (SELECT sub_j, vec_id AS code, sv AS cv
         FROM subs WHERE vec_id < 16),
       a1 AS (
         SELECT s.vec_id, s.sub_j, s.sv,
           min({'d': list_sum(list_transform(range(1, 9),
                 i -> (s.sv[CAST(i AS INT)] - k.cv[CAST(i AS INT)])
                    * (s.sv[CAST(i AS INT)] - k.cv[CAST(i AS INT)]))),
                'c': k.code}) AS best
         FROM subs s JOIN seeds k USING (sub_j)
         GROUP BY s.vec_id, s.sub_j, s.sv),
       ref AS (
         SELECT sub_j, code, pos, round(avg(x), 6) AS c
         FROM (SELECT sub_j, best.c AS code,
                 unnest(range(0, 8)) AS pos, unnest(sv) AS x
               FROM a1)
         GROUP BY sub_j, code, pos),
       refv AS (SELECT sub_j, code, list(c ORDER BY pos) AS cv
         FROM ref GROUP BY sub_j, code),
       enc AS (
         SELECT s.vec_id, s.sub_j,
           min({'d': list_sum(list_transform(range(1, 9),
                 i -> (s.sv[CAST(i AS INT)] - k.cv[CAST(i AS INT)])
                    * (s.sv[CAST(i AS INT)] - k.cv[CAST(i AS INT)]))),
                'c': k.code}) AS best
         FROM subs s JOIN refv k USING (sub_j)
         GROUP BY s.vec_id, s.sub_j)"""

  /** The shared embq+coded CTE pair of the binary-quantization oracles
    * (e19/e20) — the SQL mirror of [[signCodes]].
    */
  private val signCodesCteSql: String =
    """embq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          coded AS (SELECT vec_id,
              CAST(list_sum(list_transform(range(0, 32), i ->
                CASE WHEN v[CAST(i + 1 AS INT)] > 0
                  THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS c0,
              CAST(list_sum(list_transform(range(32, 64), i ->
                CASE WHEN v[CAST(i + 1 AS INT)] > 0
                  THEN (CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END)) AS BIGINT) AS c1
            FROM embq),"""

  /** The shared SQL tail of the recall gauges: expects `exact` and
    * `approx` CTEs of (q_vec_id, n_vec_id) upstream — one text for
    * e12, e13 and e14, mirroring [[recallVsExact]].
    */
  private def recallTailSql: String =
    """hits AS (
         SELECT e.q_vec_id, count(*) AS n_hits
         FROM exact e JOIN approx a
           ON a.q_vec_id = e.q_vec_id AND a.n_vec_id = e.n_vec_id
         GROUP BY e.q_vec_id),
       base AS (
         SELECT q_vec_id, count(*) AS n_exact FROM exact GROUP BY q_vec_id)
       SELECT b.q_vec_id, CAST(b.n_exact AS BIGINT) AS n_exact,
         CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.n_exact, 4) AS recall
       FROM base b LEFT JOIN hits h ON h.q_vec_id = b.q_vec_id
       ORDER BY b.q_vec_id"""

  /** e12 wraps the e01/e06 oracle SQL verbatim as subqueries, so the
    * recall measurement can never drift from the measured queries.
    */
  val oracleSql: Map[String, String] = baseOracleSql ++ Map(
    "e13_kmeans_ivf_recall" -> {
      // probe/search SQL mirrors the e06 oracle but the codebook is the
      // trained cents3 and cells come from a4 (the kmeans chain)
      val qvCentDot =
        """list_sum(list_transform(range(1, 65),
             i -> q.qv[CAST(i AS INT)] * c.cv[CAST(i AS INT)]))"""
      val qvNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> q.qv[CAST(i AS INT)] * q.qv[CAST(i AS INT)])))"""
      val centNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> c.cv[CAST(i AS INT)] * c.cv[CAST(i AS INT)])))"""
      val candDot =
        """list_sum(list_transform(range(1, 65),
             i -> p.qv[CAST(i AS INT)] * a.v[CAST(i AS INT)]))"""
      val pNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> p.qv[CAST(i AS INT)] * p.qv[CAST(i AS INT)])))"""
      val candNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> a.v[CAST(i AS INT)] * a.v[CAST(i AS INT)])))"""
      s"""WITH exact AS (${baseOracleSql("e01_knn_cosine_baseline")}),
          emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          $kmeansChainSql,
          q AS (SELECT vec_id AS q_vec_id, v AS qv FROM emb WHERE vec_id < 5),
          probes AS (
            SELECT q_vec_id, qv, cid FROM (
              SELECT q.q_vec_id, q.qv, c.cid,
                row_number() OVER (PARTITION BY q.q_vec_id
                  ORDER BY $qvCentDot / ($qvNorm * $centNorm) DESC, c.cid) AS rn
              FROM q CROSS JOIN cents3 c) p WHERE rn <= 2),
          sims AS (
            SELECT p.q_vec_id, a.vec_id AS n_vec_id,
              round($candDot / ($pNorm * $candNorm), 6) AS sim
            FROM probes p
            JOIN a4 a ON a.best.c = p.cid AND a.vec_id <> p.q_vec_id),
          approx AS (
            SELECT q_vec_id, n_vec_id FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn
              FROM sims) r WHERE rn <= 3),
          $recallTailSql"""
    },
    "e12_ann_recall" ->
      s"""WITH exact AS (${baseOracleSql("e01_knn_cosine_baseline")}),
          approx AS (${baseOracleSql("e06_ivf_knn")}),
          $recallTailSql""",
    // e13's probe/search chain widened to cell_rank <= 4, then the e20
    // per-depth LATERAL tail over probes (1, 2, 4)
    "e22_ivf_probe_curve" -> {
      val qvCentDot =
        """list_sum(list_transform(range(1, 65),
             i -> q.qv[CAST(i AS INT)] * c.cv[CAST(i AS INT)]))"""
      val qvNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> q.qv[CAST(i AS INT)] * q.qv[CAST(i AS INT)])))"""
      val centNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> c.cv[CAST(i AS INT)] * c.cv[CAST(i AS INT)])))"""
      val candDot =
        """list_sum(list_transform(range(1, 65),
             i -> p.qv[CAST(i AS INT)] * a.v[CAST(i AS INT)]))"""
      val pNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> p.qv[CAST(i AS INT)] * p.qv[CAST(i AS INT)])))"""
      val candNorm =
        """sqrt(list_sum(list_transform(range(1, 65),
             i -> a.v[CAST(i AS INT)] * a.v[CAST(i AS INT)])))"""
      s"""WITH exact AS (${baseOracleSql("e01_knn_cosine_baseline")}),
          emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          $kmeansChainSql,
          q AS (SELECT vec_id AS q_vec_id, v AS qv FROM emb WHERE vec_id < 5),
          probes AS (
            SELECT q_vec_id, qv, cid, rn AS cell_rank FROM (
              SELECT q.q_vec_id, q.qv, c.cid,
                row_number() OVER (PARTITION BY q.q_vec_id
                  ORDER BY $qvCentDot / ($qvNorm * $centNorm) DESC, c.cid) AS rn
              FROM q CROSS JOIN cents3 c) p WHERE rn <= 4),
          sims AS (
            SELECT p.q_vec_id, a.vec_id AS n_vec_id, p.cell_rank,
              round($candDot / ($pNorm * $candNorm), 6) AS sim
            FROM probes p
            JOIN a4 a ON a.best.c = p.cid AND a.vec_id <> p.q_vec_id),
          approx AS (
            SELECT CAST(d.probes AS BIGINT) AS probes, q_vec_id, n_vec_id
            FROM (VALUES (1), (2), (4)) d(probes)
            CROSS JOIN LATERAL (
              SELECT q_vec_id, n_vec_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn2
                FROM sims WHERE cell_rank <= d.probes) r WHERE rn2 <= 3) a),
          hits AS (
            SELECT a.probes, e.q_vec_id, count(*) AS n_hits
            FROM exact e JOIN approx a
              ON a.q_vec_id = e.q_vec_id AND a.n_vec_id = e.n_vec_id
            GROUP BY a.probes, e.q_vec_id),
          base AS (
            SELECT CAST(d.probes AS BIGINT) AS probes, q_vec_id,
              count(*) AS n_exact
            FROM exact CROSS JOIN (VALUES (1), (2), (4)) d(probes)
            GROUP BY d.probes, q_vec_id)
          SELECT b.q_vec_id, CAST(b.n_exact AS BIGINT) AS n_exact,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.n_exact, 4) AS recall,
            b.probes
          FROM base b LEFT JOIN hits h
            ON h.q_vec_id = b.q_vec_id AND h.probes = b.probes
          ORDER BY b.probes, b.q_vec_id"""
    },
    // e16: e01's brute-force search over int8-dequantized vectors
    // (e07's quantizer, q * scale / 127), recall'd against the float
    // exact baseline through the shared tail.
    "e16_int8_recall" ->
      s"""WITH exact AS (${baseOracleSql("e01_knn_cosine_baseline")}),
          embq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          dq AS (SELECT vec_id,
              list_transform(v, x -> floor(x * 127.0 / scale + 0.5) * scale / 127.0) AS dv
            FROM (SELECT vec_id, v,
                    greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS scale
                  FROM embq)),
          q AS (SELECT vec_id AS q_vec_id, dv AS qv FROM dq WHERE vec_id < 5),
          c AS (SELECT vec_id AS n_vec_id, dv AS cv FROM dq),
          sims AS (
            SELECT q_vec_id, n_vec_id,
                   round($dotSql / ($qNormSql * $cNormSql), 6) AS sim
            FROM q CROSS JOIN c WHERE q_vec_id <> n_vec_id),
          approx AS (
            SELECT q_vec_id, n_vec_id FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn
              FROM sims) r WHERE rn <= 3),
          $recallTailSql""",
    "e18_truncation_recall" ->
      s"""WITH exact AS (${baseOracleSql("e01_knn_cosine_baseline")}),
          embq AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          td AS (SELECT unnest([32, 16]) AS d),
          t AS (SELECT td.d, vec_id, list_slice(v, 1, td.d) AS tv
                FROM embq CROSS JOIN td),
          q AS (SELECT d, vec_id AS q_vec_id, tv AS qv FROM t WHERE vec_id < 5),
          c AS (SELECT d, vec_id AS n_vec_id, tv AS cv FROM t),
          sims AS (
            SELECT q.d, q_vec_id, n_vec_id,
                   round($dotSql / ($qNormSql * $cNormSql), 6) AS sim
            FROM q JOIN c ON c.d = q.d AND q_vec_id <> n_vec_id),
          approx AS (
            SELECT d, q_vec_id, n_vec_id FROM (
              SELECT *, row_number() OVER (
                PARTITION BY d, q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn
              FROM sims) r WHERE rn <= 3),
          hits AS (
            SELECT a.d, e.q_vec_id, count(*) AS n_hits
            FROM exact e JOIN approx a
              ON a.q_vec_id = e.q_vec_id AND a.n_vec_id = e.n_vec_id
            GROUP BY a.d, e.q_vec_id),
          base AS (
            SELECT td.d, q_vec_id, count(*) AS n_exact
            FROM exact CROSS JOIN td GROUP BY td.d, q_vec_id)
          SELECT b.q_vec_id, CAST(b.n_exact AS BIGINT) AS n_exact,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.n_exact, 4) AS recall,
            CAST(b.d AS BIGINT) AS dims
          FROM base b LEFT JOIN hits h
            ON h.d = b.d AND h.q_vec_id = b.q_vec_id
          ORDER BY b.d DESC, b.q_vec_id""",
    "e19_binary_quantize_recall" ->
      s"""WITH exact AS (${baseOracleSql("e01_knn_cosine_baseline")}),
          $signCodesCteSql
          q AS (SELECT vec_id AS q_vec_id, c0 AS q0, c1 AS q1 FROM coded
                WHERE vec_id < 5),
          c AS (SELECT vec_id AS n_vec_id, c0, c1 FROM coded),
          sims AS (
            SELECT q_vec_id, n_vec_id,
              64.0 - (bit_count(xor(c0, q0)) + bit_count(xor(c1, q1))) AS sim
            FROM q CROSS JOIN c WHERE q_vec_id <> n_vec_id),
          approx AS (
            SELECT q_vec_id, n_vec_id FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn
              FROM sims) r WHERE rn <= 3),
          $recallTailSql""",

    "e20_binary_rerank_recall" ->
      s"""WITH exact AS (${baseOracleSql("e01_knn_cosine_baseline")}),
          $signCodesCteSql
          qb AS (SELECT vec_id AS q_vec_id, c0 AS q0, c1 AS q1 FROM coded
                 WHERE vec_id < 5),
          cb AS (SELECT vec_id AS n_vec_id, c0, c1 FROM coded),
          hsims AS (
            SELECT q_vec_id, n_vec_id,
              64.0 - (bit_count(xor(c0, q0)) + bit_count(xor(c1, q1))) AS hsim
            FROM qb CROSS JOIN cb WHERE q_vec_id <> n_vec_id),
          cand AS (
            SELECT q_vec_id, n_vec_id, rn FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY hsim DESC, n_vec_id ASC) AS rn
              FROM hsims) r WHERE rn <= 64),
          reranked AS (
            SELECT cand.q_vec_id, cand.n_vec_id, cand.rn,
              round($dotSql / ($qNormSql * $cNormSql), 6) AS sim
            FROM cand
            JOIN (SELECT vec_id AS n_vec_id, v AS cv FROM embq) n USING (n_vec_id)
            JOIN (SELECT vec_id AS q_vec_id, v AS qv FROM embq WHERE vec_id < 5) q
              USING (q_vec_id)),
          approx AS (
            SELECT CAST(d.overfetch AS BIGINT) AS overfetch, q_vec_id, n_vec_id
            FROM (VALUES (16), (64)) d(overfetch)
            CROSS JOIN LATERAL (
              SELECT q_vec_id, n_vec_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY q_vec_id ORDER BY sim DESC, n_vec_id ASC) AS rn2
                FROM reranked WHERE rn <= d.overfetch) r WHERE rn2 <= 3) a),
          hits AS (
            SELECT a.overfetch, e.q_vec_id, count(*) AS n_hits
            FROM exact e JOIN approx a
              ON a.q_vec_id = e.q_vec_id AND a.n_vec_id = e.n_vec_id
            GROUP BY a.overfetch, e.q_vec_id),
          base AS (
            SELECT CAST(d.overfetch AS BIGINT) AS overfetch, q_vec_id,
              count(*) AS n_exact
            FROM exact CROSS JOIN (VALUES (16), (64)) d(overfetch)
            GROUP BY d.overfetch, q_vec_id)
          SELECT b.q_vec_id, CAST(b.n_exact AS BIGINT) AS n_exact,
            CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
            round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / b.n_exact, 4) AS recall,
            b.overfetch
          FROM base b LEFT JOIN hits h
            ON h.q_vec_id = b.q_vec_id AND h.overfetch = b.overfetch
          ORDER BY b.overfetch, b.q_vec_id""")
}
