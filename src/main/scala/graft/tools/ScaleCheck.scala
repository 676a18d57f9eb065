package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity harness: runs a pipeline shape over 1×, 4× and 16×
  * its corpus and reports wall-clock per scale plus the deviation from
  * linear. Direct evidence for the "survives a 100× scale-up" claim.
  * Dev tooling — `sbt "runMain graft.tools.ScaleCheck [scales] [mode]"`;
  * results are recorded in SCALING.md §7. Modes:
  *
  *  - `w29` (default): scan → decode → streaming extract → lang/quality
  *    kernels → fingerprint combine over generated WARC corpora
  *    (16/64/256 files × 100 member-copies of the 16 real fixture
  *    pages). Scan-bound with a fingerprint-only shuffle.
  *  - `neardup` (d07 shape): the full minhash → LSH band → bucket join →
  *    verify → summarize pipeline over the documents table scaled k× by
  *    per-copy CHARACTER BIJECTIONS (translate over a 16-letter
  *    alphabet rotated per copy): a bijection maps each copy's shingle
  *    set 1:1, so within-copy Jaccard — and therefore the near-dup
  *    structure — is preserved EXACTLY, while cross-copy shingles are
  *    disjoint. Dup pairs, buckets and candidates all scale ×k; any
  *    super-linear wall growth is the pipeline's own, not the corpus's.
  *  - `ivf` (e06 shape): IVF kNN over the embeddings table scaled k×
  *    (fresh vec_ids, same label cells — the fixed-codebook regime),
  *    with the query set held constant: probed-cell candidate volume
  *    scales ×k, broadcast sides stay O(1).
  *  - `hamming` (d22/m09/m10 shape): the shared banded-hamming dedup
  *    over 64-bit SimHash codes of the documents table scaled k× by
  *    per-copy XOR masks — XOR by a constant is a hamming-space
  *    ISOMETRY, so every copy's within-copy pair distances (and
  *    therefore its near-dup structure) are preserved exactly while
  *    band keys shift; fingerprints are computed ONCE (checkpointed)
  *    so the mode measures the search, not the hashing.
  *  - `ivfpq` (e21 shape): the composed IVF+PQ index in the
  *    fixed-codebook regime over exact-duplicate copies; asserts
  *    duplicate-canonical recall@3 holds bit-for-bit at every scale.
  *  - `funnel` (q19 shape): events scaled k× under disjoint user-id
  *    ranges; asserts every summary count scales exactly ×k.
  *  - `dataset` (t38 shape): bijection-scaled documents with lang kept;
  *    asserts per-language example counts scale exactly ×k, measures
  *    the per-language rank window.
  *  - `spanrm` / `suffix`: d26 / d25 exact-dedup shuffles (see below).
  *  - `cc`: large-star/small-star connected components over deep chain
  *    graphs scaled ×k in disjoint id ranges; asserts component count
  *    scales exactly ×k at constant component size.
  *  - `scan`: the pure batch envelope scan over the same corpora —
  *    parallelism = files, no shuffle; asserts record counts ×k.
  *  - `stream`: the streaming WARC scan under Trigger.AvailableNow with
  *    16-files-per-trigger admission — k× corpus ⇒ k× constant-size
  *    micro-batches (the 100 TB backfill regime); asserts record counts
  *    scale exactly ×k.
  *  - `memberindex`: the emit-on-first-scan loop over ONE k×-sized
  *    multi-member gzip archive (one file = one partition = the worst
  *    case the sidecar exists to fix): phase 1 scans serially with
  *    `emit_member_index`, phase 2 rescans member-parallel from the
  *    auto-discovered sidecar (option-free); reports the speedup.
  *  - `memberindexzstd`: the same loop over a `.warc.zst` archive —
  *    measured r14: 4.2× rescan speedup at 16×, with the zstd first
  *    scan itself ~2.9× faster than the gzip equivalent.
  *  - `cdxjlookup`: the w49 collection-lookup contract — a FIXED 64
  *    point reads against archives grown 1×→16×; asserts per-lookup
  *    wall stays flat (O(hits), never O(corpus)).
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val mode = if (args.length > 1) args(1) else "w29"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pipeline(dir: String): DataFrame = {
      import graft.functions.Web
      val perPage = spark.read.format("warc")
        .option("record_types", "response")
        .load(dir)
        .select(Web.extractPlainText(col("http_body"), col("http_charset")).as("text"))
        .filter(col("text").isNotNull)
        .select(md5(col("text")).as("fp"),
          Web.detectLang(col("text")).getField("lang").as("lang"),
          (graft.functions.TextAnalysis.tokenCount(col("text")) >= 50).cast("int")
            .as("long_enough"))
      perPage.groupBy(col("fp"))
        .agg(count(lit(1)).as("copies"), max(col("lang")).as("lang"),
          max(col("long_enough")).as("qual"))
        .agg(sum(col("copies")).as("n_pages"),
          sum(col("qual")).as("n_unique_docs"))
    }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    /** Documents table at k×: union of k per-copy bijective character
      * translations with disjoint id ranges. 64 distinct permutations of
      * the 16-letter alphabet: 16 rotations × {identity, reversal,
      * adjacent-pair swap, reversal∘swap} — each a bijection, so every
      * copy's within-copy Jaccard structure is preserved exactly.
      */
    def docsAt(k: Int): DataFrame = {
      require(k <= 64, "bijection family supports 64 permutations")
      val alpha = "aeiousrtlnmdchpg"
      def perm(i: Int): String = {
        val rot = alpha.drop(i % 16) + alpha.take(i % 16)
        val rev = if (((i / 16) & 1) == 1) rot.reverse else rot
        if (((i / 16) & 2) == 2) rev.grouped(2).map(_.reverse).mkString else rev
      }
      val base = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      (0 until k).map { i =>
        base.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, perm(i)).as("text"))
      }.reduce(_ unionAll _)
    }

    def embAt(k: Int): DataFrame = {
      val base = graft.Tables.embeddings(spark, sfDir)
        .select("vec_id", "label", "embedding")
      (0 until k).map { i =>
        base.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("label"), col("embedding"))
      }.reduce(_ unionAll _)
    }

    /** e06's IVF shape over a pre-scaled embeddings frame: fixed query
      * set (the base table's vec_id < 5), codebook from cell means,
      * probe top-2 cells, exact search inside probed cells. The codebook
      * is computed from the BASE (1×) table — the fixed-codebook regime
      * e06 claims at scale (codebook trained once, broadcast; only the
      * corpus-side candidate scan grows). Recomputing it from the scaled
      * corpus would grow a dim×-exploded shuffle linearly and measure
      * codebook TRAINING, not search.
      */
    def ivfPipeline(emb0: DataFrame, codebookSrc: DataFrame): DataFrame = {
      import graft.functions.Similarity
      val emb = emb0.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      val centroids = codebookSrc
        .select(col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos")).agg(round(avg(col("x")), 6).as("c"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label").as("cell"), expr("transform(pc, p -> p.c)").as("cv"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("v").as("qv"))
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_vec_id")).orderBy(col("csim").desc, col("cell"))
      val probes = queries.crossJoin(broadcast(centroids))
        .select(col("q_vec_id"), col("qv"), col("cell"),
          Similarity.cosine(col("qv"), col("cv")).as("csim"))
        .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= 2)
        .select(col("q_vec_id"), col("qv"), col("cell"))
      val cands = emb.select(col("vec_id").as("n_vec_id"),
        col("label").as("cell"), col("v").as("cv"))
      // production e06 top-k: partial-agg Aggregator (map side emits ≤k
      // rows per query), NOT a row_number window — a |queries|-partition
      // window caps reducer parallelism at |queries| and measures an
      // O(n log n) sort the real query never runs
      val topk = graft.functions.Similarity.topKAgg(3)
      cands.join(broadcast(probes), Seq("cell"))
        .filter(col("n_vec_id") =!= col("q_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          Similarity.cosine(col("qv"), col("cv")).as("sim"))
        .groupBy(col("q_vec_id")).agg(topk(col("sim"), col("n_vec_id")).as("top"))
        .select(col("q_vec_id"), expr("aggregate(top, 0d, (a, t) -> a + t._1)").as("s"))
        .agg(count(lit(1)).as("n_queries"), round(sum(col("s")), 3).as("sim_mass"))
    }

    def run(label: String, body: Int => (Long, Long)): Unit = {
      // warmup at 1x so codegen/reader init doesn't bill the first scale
      body(1)
      val results = scales.map { s =>
        System.gc()
        val t0 = System.nanoTime()
        val (units, aux) = body(s)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] $label ${s}x  units=$units%9d  aux=$aux%7d  wall=$sec%7.2f s")
        s -> sec
      }
      val (s0, t0) = results.head
      results.foreach { case (s, t) =>
        val linear = t0 * s / s0
        println(f"[scale] $label ${s}x: $t%7.2f s  vs linear $linear%7.2f s  " +
          f"ratio ${t / linear}%5.2f")
      }
    }

    mode match {
      case "w29" =>
        // corpus dirs (reused across runs, like the bench)
        val dirs = scales.map { s =>
          s -> graft.sources.BenchCorpus.ensure(
            s"${System.getProperty("java.io.tmpdir")}/graft_warc_scale_$s",
            files = 16 * s, copiesPerFile = 100)
        }.toMap
        run("w29", { s =>
          val row = pipeline(dirs(s)).collect().head
          (row.getLong(0), row.getLong(1))
        })
      case "neardup" =>
        run("neardup", { s =>
          val row = graft.queries.Documents.neardupSummary(docsAt(s))
            .collect().head
          (row.getLong(0), row.getLong(3)) // n_docs, n_dup_pairs
        })
      case "ivf" =>
        run("ivf", { s =>
          val row = ivfPipeline(embAt(s), embAt(1)).collect().head
          (row.getLong(0), 0L)
        })
      case "ivfpq" =>
        // e21 composed index (IVF probe + PQ asymmetric distance) in the
        // fixed-codebook regime: PQ codebook, coarse centroids and the
        // query set come from the 1x base; only the code-tagging join
        // (vec_id equi-join, the one corpus-sized shuffle) and the
        // probed-cell candidate scan grow with k. Copies are EXACT
        // duplicates under fresh ids (the re-crawled-corpus shape), so
        // the held quality gauge is DUPLICATE-CANONICAL recall@3: every
        // copy flows through PQ encode + ADC scoring (min-per-canonical-
        // id happens after the distance agg, so nothing prunes early),
        // ids then canonicalize to their base and the ranking is the 1x
        // ranking bit-for-bit — recall must hold exactly while candidate
        // volume grows k x, and the harness asserts it.
        def emblAt(k: Int): DataFrame = embAt(k).select(col("vec_id"),
          col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        val baseN = graft.Tables.embeddings(spark, sfDir).count()
        val recalls = scala.collection.mutable.Map.empty[Int, Double]
        run("ivfpq", { s =>
          val rows = graft.queries.Embeddings
            .ivfpqRecall(emblAt(s), emblAt(1),
              canonicalId = Some(_ % lit(10000000L))).collect()
          val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
          recalls(s) = mean
          (s.toLong * baseN, math.round(mean * 10000))
        })
        require(recalls.values.toSet.size == 1,
          s"recall@3 drifted across scales: $recalls")
        println(f"[scale] ivfpq recall@3 held at ${recalls.valuesIterator.next()}%.4f " +
          s"across ${scales.mkString("/")}x")
      case "hamming" =>
        val base = graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            graft.functions.TextAnalysis.simhash64(col("text")).as("sh"))
          .select(col("doc_id"),
            conv(substring(col("sh"), 1, 8), 16, 10).cast("long").as("h0"),
            conv(substring(col("sh"), 9, 8), 16, 10).cast("long").as("h1"))
          .localCheckpoint()
        val baseN = base.count()
        def codesAt(k: Int): DataFrame =
          (0 until k).map { i =>
            val m0 = (i.toLong * 0x9E3779B9L) & 0xFFFFFFFFL
            val m1 = (i.toLong * 0x85EBCA6BL) & 0xFFFFFFFFL
            base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
              expr(s"h0 ^ ${m0}L").as("h0"), expr(s"h1 ^ ${m1}L").as("h1"))
          }.reduce(_ unionAll _)
        run("hamming", { s =>
          val pairs = graft.queries.Multimodal.bandedHammingPairs(
            codesAt(s), "doc_id", "doc_a", "doc_b").count()
          (s.toLong * baseN, pairs)
        })
      case "dataset" =>
        // t38 shape: the documents table scaled k x by the same per-copy
        // character bijections as `neardup`, with the lang column kept —
        // bijections map distinct texts to distinct texts, so per-lang
        // example counts scale EXACTLY x k (asserted; the corpus is
        // fixed per SF, so the check is deterministic). Measures the
        // per-LANGUAGE rank window — the one t38 cost that grows with
        // corpus size per language (PLANS.md note: at 100 TB swap it
        // for md5-range quantile assignment).
        def docsLangAt(k: Int): DataFrame = {
          require(k <= 64, "bijection family supports 64 permutations")
          val alpha = "aeiousrtlnmdchpg"
          def perm(i: Int): String = {
            val rot = alpha.drop(i % 16) + alpha.take(i % 16)
            val rev = if (((i / 16) & 1) == 1) rot.reverse else rot
            if (((i / 16) & 2) == 2) rev.grouped(2).map(_.reverse).mkString else rev
          }
          val base = graft.Tables.documents(spark, sfDir)
            .select("doc_id", "text", "lang")
          (0 until k).map { i =>
            base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
              translate(col("text"), alpha, perm(i)).as("text"), col("lang"))
          }.reduce(_ unionAll _)
        }
        val dsBase = graft.queries.Documents.langDataset(docsLangAt(1), 50)
          .select("lang", "n_examples").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        run("dataset", { s =>
          val rows = graft.queries.Documents.langDataset(docsLangAt(s), 50)
            .select("lang", "n_examples").collect()
          rows.foreach { r =>
            require(r.getLong(1) == s * dsBase(r.getString(0)),
              s"per-lang examples did not scale x$s: ${r.getString(0)} " +
                s"${r.getLong(1)} vs base ${dsBase(r.getString(0))}")
          }
          (rows.map(_.getLong(1)).sum, rows.length.toLong)
        })
      case "funnel" =>
        // q19 shape: events scaled k x under disjoint user-id ranges —
        // the per-user funnel state machines are independent, so every
        // summary count must scale EXACTLY x k (asserted: a drifting
        // count means the shuffle/agg broke under volume, not noise).
        // Measures the one user-keyed shuffle whose buffers hold only
        // funnel-type events (the round-12 bound).
        val baseEv = graft.Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        def evAt(k: Int): DataFrame = (0 until k).map { i =>
          baseEv.select((col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
            (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
            col("event_type"), col("ts"))
        }.reduce(_ unionAll _)
        val base = graft.queries.Relational.funnelSummary(evAt(1)).collect().head
        run("funnel", { s =>
          val row = graft.queries.Relational.funnelSummary(evAt(s)).collect().head
          require(row.getLong(0) == s * base.getLong(0) &&
            row.getLong(1) == s * base.getLong(1) &&
            row.getLong(2) == s * base.getLong(2) &&
            row.getLong(3) == s * base.getLong(3),
            s"funnel counts did not scale x$s exactly: $row vs base $base")
          (row.getLong(0), row.getLong(3)) // n_users, n_purchase
        })
      case "spanrm" =>
        // d26 shape: the dup-window groupBy is the corpus-sized shuffle
        // under measurement; per-copy bijections preserve each copy's
        // within-copy duplicate-window structure exactly (translation is
        // a bijection on the window alphabet), so flagged spans scale
        // ~×k with only incidental cross-copy collisions on top
        run("spanrm", { s =>
          val agg = graft.queries.Documents.spanRemoval(docsAt(s), win = 40)
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_flagged")).as("n_flagged")).collect().head
          (agg.getLong(0), agg.getLong(1))
        })
      case "suffix" =>
        // d25 shape: the word-start suffix SORT is the measured cost —
        // the heaviest exact-dedup shuffle in the engine (O(corpus)
        // suffix rows through a range sort)
        run("suffix", { s =>
          val row = graft.queries.Documents
            .suffixDups(docsAt(s), prefixLen = 4).collect().head
          (row.getLong(0), row.getLong(2)) // n_positions, n_lcp30
        })
      case "cc" =>
        // d12 shape: connected components (large-star/small-star) over a
        // synthetic chain graph — 512 chains of 65 nodes per copy, the
        // deep-diameter shape that stresses round convergence (near-dup
        // clusters are shallower). Copies live in disjoint id ranges, so
        // component count scales EXACTLY ×k and the max component stays
        // 65 nodes (both asserted); rounds stay O(log diameter)
        // regardless of k, so wall growth must come only from the
        // per-round (id, id) shuffle volume.
        val chains = 512L
        val chainLen = 64L // edges per chain -> 65-node components
        def edgesAt(k: Int): DataFrame =
          spark.range(k * chains * chainLen).select(
            (col("id") + floor(col("id") / chainLen)).as("doc_a"),
            (col("id") + floor(col("id") / chainLen) + 1).as("doc_b"))
        run("cc", { s =>
          val labels = graft.operators.ConnectedComponents
            .largeStarSmallStar(edgesAt(s))
          val agg = labels.groupBy(col("lbl"))
            .agg(count(lit(1)).as("sz"))
            .agg(count(lit(1)).as("n_components"), max(col("sz")).as("max_sz"),
              min(col("sz")).as("min_sz")).collect().head
          require(agg.getLong(0) == s * chains,
            s"components did not scale x$s: ${agg.getLong(0)} vs ${s * chains}")
          require(agg.getLong(1) == chainLen + 1 && agg.getLong(2) == chainLen + 1,
            s"component sizes drifted: $agg")
          (agg.getLong(0), agg.getLong(1))
        })
      case "scan" =>
        // w17 shape: the pure batch envelope scan (record-type pushdown,
        // no payload materialization) over the same gzip corpora as the
        // stream mode — parallelism = files, no shuffle at all below the
        // 1-row count. The §1 claim "scan+filter queries shuffle
        // nothing and scale with file count" as a measured curve.
        val scanDirs = scales.map { s =>
          s -> graft.sources.BenchCorpus.ensure(
            s"${System.getProperty("java.io.tmpdir")}/graft_warc_scale_$s",
            files = 16 * s, copiesPerFile = 100)
        }.toMap
        run("scan", { s =>
          val n = spark.read.format("warc")
            .option("record_types", "response")
            .load(scanDirs(s))
            .count()
          require(n == s * 16L * 1600L, s"scan rows did not scale x$s: $n")
          (n, 16L * s)
        })
      case "stream" =>
        // w38 shape: the streaming WARC scan under Trigger.AvailableNow
        // with admission control pinned to 16 files per micro-batch, so
        // a k× corpus runs k× batches of CONSTANT size — the backfill
        // regime a 100 TB archive replays through the streaming path.
        // Asserts records scale exactly ×k; wall growth beyond linear is
        // per-batch planning overhead, the thing this mode measures.
        import org.apache.spark.sql.streaming.Trigger
        val dirs = scales.map { s =>
          s -> graft.sources.BenchCorpus.ensure(
            s"${System.getProperty("java.io.tmpdir")}/graft_warc_scale_$s",
            files = 16 * s, copiesPerFile = 100)
        }.toMap
        val perFile = 50L * 100L // fixture records x copies
        run("stream", { s =>
          val n = spark.sparkContext.longAccumulator(s"stream_rows_$s")
          // incremented on the stream-execution thread, read on the main
          // thread after awaitTermination — needs explicit visibility
          val batches = new java.util.concurrent.atomic.AtomicLong(0)
          val ckpt = new java.io.File(
            s"${System.getProperty("java.io.tmpdir")}/graft_stream_ckpt_" +
              s"${spark.sparkContext.applicationId}_$s")
          org.apache.commons.io.FileUtils.deleteDirectory(ckpt)
          val q = spark.readStream.format("warc")
            .option("record_types", "response")
            .option("max_files_per_trigger", "16")
            .load(dirs(s))
            .select(col("record_id"))
            .writeStream
            .option("checkpointLocation", ckpt.getPath)
            .foreachBatch { (df: DataFrame, _: Long) =>
              n.add(df.count()); batches.incrementAndGet(); ()
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          org.apache.commons.io.FileUtils.deleteDirectory(ckpt)
          val respPerFile = perFile * 16 / 50 // 16 responses per 50-record copy
          require(n.value == s * 16 * respPerFile,
            s"streamed rows did not scale x$s: ${n.value}")
          (n.value, batches.get())
        })
      case "memberindexzstd" =>
        // the memberindex loop on the NEW codec: same shape, `.warc.zst`
        // corpus — proves the emit → auto-discover → member-parallel
        // machinery carries to zstd at scale, and records the codec's
        // decode-speed edge in the first-scan column
        val tmpZ = System.getProperty("java.io.tmpdir")
        spark.read.format("warc").option("record_types", "response")
          .load(graft.sources.BenchCorpus.ensureZstd(
            s"$tmpZ/graft_memberidx_zwarm", files = 1, copiesPerFile = 20)).count()
        scales.foreach { sc =>
          val dir = graft.sources.BenchCorpus.ensureZstd(
            s"$tmpZ/graft_memberidx_z$sc", files = 1, copiesPerFile = 200 * sc)
          val f = new java.io.File(dir).listFiles()
            .filter(_.getName.endsWith(".warc.zst")).head
          new java.io.File(dir, f.getName + ".idx").delete()
          def timed(body: => Long): (Long, Double) = {
            System.gc()
            val t0 = System.nanoTime()
            val n = body
            (n, (System.nanoTime() - t0) / 1e9)
          }
          val (n1, t1) = timed(spark.read.format("warc")
            .option("record_types", "response")
            .option("emit_member_index", dir)
            .load(f.getPath).count())
          require(new java.io.File(dir, f.getName + ".idx").exists(),
            "first zstd scan emitted no sidecar")
          val rescan = spark.read.format("warc")
            .option("record_types", "response")
            .option("max_partition_bytes", (4L * 1024 * 1024).toString)
            .load(f.getPath)
          require(rescan.rdd.getNumPartitions > 1,
            "option-free zstd rescan did not auto-discover the sidecar")
          val (n2, t2) = timed(rescan.count())
          require(n1 == n2 && n1 == 200L * sc * 16,
            s"rows mismatch: first=$n1 indexed=$n2 expected ${200L * sc * 16}")
          require(sc < 4 || t2 < t1,
            f"zstd indexed rescan ($t2%.2f s) did not beat the serial scan ($t1%.2f s) at ${sc}x")
          println(f"[scale] memberindexzstd ${sc}x  rows=$n1%9d  " +
            f"first=$t1%7.2f s  indexed=$t2%7.2f s  speedup ${t1 / t2}%5.1fx")
        }
      case "memberindex" =>
        // One LARGE single-file archive per scale: serial first scan
        // (with the free sidecar side-output), then the member-parallel
        // rescan it unlocks. The speedup column is the point — at 100 TB
        // this is "one executor gunzips a shard" vs "the cluster scans
        // member slices of it" (the reference's Beam dynamic splits).
        val tmp = System.getProperty("java.io.tmpdir")
        // warm the reader/codegen path so phase-1 of the first scale
        // doesn't bill JIT
        spark.read.format("warc").option("record_types", "response")
          .load(graft.sources.BenchCorpus.ensure(
            s"$tmp/graft_memberidx_warm", files = 1, copiesPerFile = 20)).count()
        scales.foreach { s =>
          val dir = graft.sources.BenchCorpus.ensure(
            s"$tmp/graft_memberidx_$s", files = 1, copiesPerFile = 200 * s)
          val f = new java.io.File(dir).listFiles()
            .filter(_.getName.endsWith(".warc.gz")).head
          val idx = new java.io.File(dir, f.getName + ".idx")
          idx.delete()
          def timed(body: => Long): (Long, Double) = {
            System.gc()
            val t0 = System.nanoTime()
            val n = body
            (n, (System.nanoTime() - t0) / 1e9)
          }
          val (n1, t1) = timed(spark.read.format("warc")
            .option("record_types", "response")
            .option("emit_member_index", dir)
            .load(f.getPath).count())
          require(idx.exists(), "first scan emitted no sidecar")
          // rescan is OPTION-FREE: the sidecar beside the file is
          // auto-discovered at plan time (w47) — nobody wires an index
          val rescan = spark.read.format("warc")
            .option("record_types", "response")
            .option("max_partition_bytes", (4L * 1024 * 1024).toString)
            .load(f.getPath)
          require(rescan.rdd.getNumPartitions > 1,
            "option-free rescan did not auto-discover the sidecar")
          val (n2, t2) = timed(rescan.count())
          require(n1 == n2 && n1 == 200L * s * 16,
            s"rows mismatch: first=$n1 indexed=$n2 expected ${200L * s * 16}")
          // asserted curve: once the archive dwarfs fixed task overhead
          // the member-parallel rescan must beat the serial first scan
          require(s < 4 || t2 < t1,
            f"indexed rescan ($t2%.2f s) did not beat the serial scan ($t1%.2f s) at ${s}x")
          println(f"[scale] memberindex ${s}x  rows=$n1%9d  " +
            f"first=$t1%7.2f s  indexed=$t2%7.2f s  speedup ${t1 / t2}%5.1fx")
        }
      case "cdxjlookup" =>
        // The w49 collection-lookup contract at scale: a FIXED number of
        // point reads (K = 64, evenly spaced through the member index)
        // against archives growing 1× → 16×. Each lookup is a seek +
        // one-member decode, so total lookup wall must stay ~flat while
        // the corpus grows — the property that makes a collection-level
        // CDXJ usable at 100 TB (resolving a key table must cost
        // O(hits), never O(corpus)).
        val tmpC = System.getProperty("java.io.tmpdir")
        spark.read.format("warc").option("record_types", "response")
          .load(graft.sources.BenchCorpus.ensure(
            s"$tmpC/graft_cdxjl_warm", files = 1, copiesPerFile = 20)).count()
        val perLookupMs = scala.collection.mutable.ArrayBuffer.empty[Double]
        scales.foreach { sc =>
          val dir = graft.sources.BenchCorpus.ensure(
            s"$tmpC/graft_cdxjl_$sc", files = 1, copiesPerFile = 200 * sc)
          val f = new java.io.File(dir).listFiles()
            .filter(_.getName.endsWith(".warc.gz")).head
          val idx = new java.io.File(dir, f.getName + ".idx")
          if (!idx.exists())
            spark.read.format("warc").option("record_types", "response")
              .option("emit_member_index", dir).load(f.getPath).count()
          val offRe = """"offset"\s*:\s*(\d+)""".r
          val src = scala.io.Source.fromFile(idx, "UTF-8")
          val offsets = try src.getLines()
            .flatMap(l => offRe.findFirstMatchIn(l).map(_.group(1).toLong))
            .toVector.sorted
          finally src.close()
          val k = 64
          require(offsets.size >= k, s"index too small: ${offsets.size}")
          val picks = (0 until k)
            .map(i => offsets((i.toLong * offsets.size / k).toInt))
          import spark.implicits._
          val path = f.getPath
          System.gc()
          val t0 = System.nanoTime()
          val n = spark.createDataset(picks).repartition(8)
            .map(off => graft.core.WarcPointLookup.extract(path, off)
              .map(_.contentLength).getOrElse(-1L))
            .filter(_ >= 0L).count()
          val t = (System.nanoTime() - t0) / 1e9
          require(n == k, s"only $n of $k point reads found a record")
          perLookupMs += t / k * 1000
          println(f"[scale] cdxjlookup ${sc}x  members=${offsets.size}%7d  " +
            f"k=$k  total=$t%6.2f s  per-lookup=${t / k * 1000}%7.2f ms")
        }
        // the asserted curve: per-lookup cost independent of corpus size
        // (generous 2.5x bound absorbs page-cache and task-overhead noise)
        require(perLookupMs.last < perLookupMs.head * 2.5 ||
            perLookupMs.last < 5.0,
          f"per-lookup cost grew with corpus size: ${perLookupMs.head}%.2f -> ${perLookupMs.last}%.2f ms")
        // 10k-lookup phase (r15 verdict item 3): the grouped resolver
        // (one open stream + ONE dict load per (archive, 16 MiB range)
        // group, offsets served ascending) A/B'd against the per-hit
        // extract loop, on gzip AND trained-dict .warc.zst — the dict
        // archive is where per-hit extract pays a dictionary re-read +
        // re-load on EVERY lookup.
        locally {
          import spark.implicits._
          val bigDir = s"$tmpC/graft_cdxjl_${scales.max}"
          val gzF = new java.io.File(bigDir).listFiles()
            .filter(_.getName.endsWith(".warc.gz")).head
          val dictF = new java.io.File(bigDir, "big-dict.warc.zst")
          if (!dictF.exists()) {
            val bos = new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(dictF), 1 << 20)
            try graft.core.WarcWriter.recompressZstdTrained(
              () => new java.io.FileInputStream(gzF), bos)
            finally bos.close()
          }
          def sidecarOffsets(f: java.io.File): Vector[Long] = {
            val idx = new java.io.File(f.getParent, f.getName + ".idx")
            if (!idx.exists())
              spark.read.format("warc").option("record_types", "response")
                .option("emit_member_index", f.getParent).load(f.getPath).count()
            val offRe = """"offset"\s*:\s*(\d+)""".r
            val src = scala.io.Source.fromFile(idx, "UTF-8")
            try src.getLines()
              .flatMap(l => offRe.findFirstMatchIn(l).map(_.group(1).toLong))
              .toVector.sorted
            finally src.close()
          }
          val k10 = 10000
          for ((label, f) <- Seq(("gzip", gzF), ("dict-zstd", dictF))) {
            val offsets = sidecarOffsets(f)
            val picks = (0 until k10).map(i =>
              offsets(((i.toLong * 2654435761L) % offsets.size).toInt))
            val hitsDs = spark.createDataset(
              picks.map(o => ("", f.getPath, o)))
            def timed(body: => Long): (Long, Double) = {
              System.gc()
              val t0 = System.nanoTime()
              val n = body
              (n, (System.nanoTime() - t0) / 1e9)
            }
            def grouped() = timed(
              graft.queries.Warc.resolvePointReads(hitsDs)
                .filter(col("content_length") >= 0L).count())
            def perHit() = timed(hitsDs.repartition(32)
              .map { case (_, p, off) =>
                graft.core.WarcPointLookup.extract(p, off)
                  .map(_.contentLength).getOrElse(-1L) }
              .filter(_ >= 0L).count())
            // interleaved min-of-2 (host-window doctrine, SCALING.md §8c):
            // a single alternation already removes the cold-page-cache
            // bias of whichever side runs first
            val runs = Seq(grouped(), perHit(), grouped(), perHit())
            val (nG, tG) = Seq(runs(0), runs(2)).minBy(_._2)
            val (nP, tP) = Seq(runs(1), runs(3)).minBy(_._2)
            require(nG == k10 && nP == k10,
              s"$label: grouped=$nG per-hit=$nP of $k10 lookups resolved")
            println(f"[scale] cdxjlookup 10k $label%-9s grouped=$tG%6.2f s " +
              f"(${tG / k10 * 1000}%5.2f ms/hit)  per-hit=$tP%6.2f s " +
              f"(${tP / k10 * 1000}%5.2f ms/hit)  amortization ${tP / tG}%4.1fx")
            // per-lookup cost must stay flat-to-falling in the hit count
            // (the O(hits) contract); the amortization REQUIREMENT binds
            // on the trained-dict archive, where per-hit extract pays a
            // real dictionary re-read + JNI re-load per lookup — on local
            // gzip both sides are Spark-stage-overhead-bound at this
            // corpus size (single-threaded A/B: batched == per-hit kernel
            // cost), so gzip reports without asserting a winner
            require(tG / k10 * 1000 < math.max(perLookupMs.last, 5.0),
              f"$label: per-lookup cost rose with hit count: ${tG / k10 * 1000}%.2f ms")
            if (label == "dict-zstd")
              require(tG < tP,
                f"$label: grouped resolver ($tG%.2f s) did not amortize the " +
                f"per-hit dictionary reload ($tP%.2f s)")
          }
        }
      case "planscale" =>
        // Plan-time scale contract (r15 verdict item 1+2): member-
        // indexed planning is O(files + partitions) driver work — the
        // sidecar is NEVER read at plan time (executors parse their own
        // IdxSlice), so plan wall and driver heap are flat in the MEMBER
        // count, and the sidecar existence probe for an explicit file
        // list is batched per parent directory (one listStatus, not one
        // getFileStatus RPC per file). Three measurements:
        //  (a) breadth: a 1,000-file collection with real sidecars —
        //      directory plan must be sub-second with IdxSlice-only
        //      partitions (no embedded offsets);
        //  (b) depth: one archive with a synthetic 1,000,000-line
        //      sidecar (plan cost is content-independent by
        //      construction; slice EXECUTION is proven by IdxSliceSpec
        //      and the memberindex mode) — plan wall and heap delta
        //      must match (a)'s per-file cost, not the member count;
        //  (c) explicit list: planning the same 1,000 files passed as
        //      an explicit paths array must stay within 2× of the
        //      directory-path plan (the batched-probe contract).
        val tmpP = System.getProperty("java.io.tmpdir")
        val dirP = graft.sources.BenchCorpus.ensure(
          s"$tmpP/graft_planscale", files = 1000, copiesPerFile = 1)
        // one emit pass leaves the 1,000 sidecars behind (idempotent)
        if (!new java.io.File(dirP, "bench-000.warc.gz.idx").exists())
          spark.read.format("warc").option("record_types", "response")
            .option("emit_member_index", dirP).load(dirP).count()
        import org.apache.spark.sql.util.CaseInsensitiveStringMap
        def planOf(opts: Map[String, String]): Array[_] = {
          val m = new java.util.HashMap[String, String]()
          opts.foreach { case (k, v) => m.put(k, v) }
          m.put("max_partition_bytes", (64 * 1024).toString)
          new graft.sources.WarcScanBuilder(new CaseInsensitiveStringMap(m))
            .build().toBatch.planInputPartitions()
        }
        def usedHeap(): Long = {
          System.gc(); Thread.sleep(50); System.gc()
          Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
        }
        def timedPlan(opts: Map[String, String]): (Array[_], Double) = {
          val t0 = System.nanoTime()
          val p = planOf(opts)
          (p, (System.nanoTime() - t0) / 1e9)
        }
        planOf(Map("path" -> dirP)) // warm FS/jackson/classloading
        // (a) breadth
        val h0 = usedHeap()
        val (partsDir, tDir) = timedPlan(Map("path" -> dirP))
        val hDir = usedHeap() - h0
        // data-file partitions only (the dir listing also plans the
        // zero-byte READY marker)
        val slices = partsDir.collect {
          case p: graft.sources.WarcInputPartition
            if p.path.endsWith(".warc.gz") => p }
        require(slices.nonEmpty)
        require(slices.forall(p => p.memberOffsets.isEmpty && p.idx.isDefined),
          "plan embedded member offsets — the O(corpus) driver term is back")
        val bos = new java.io.ByteArrayOutputStream()
        val oos = new java.io.ObjectOutputStream(bos)
        slices.foreach(oos.writeObject); oos.close()
        val bytesPerPart = bos.size().toDouble / slices.length
        println(f"[scale] planscale breadth: files=1000 parts=${slices.length}%5d " +
          f"plan=$tDir%6.3f s  heapDelta=${hDir / 1024 / 1024}%4d MB  " +
          f"task-payload=$bytesPerPart%6.0f B/part")
        require(tDir < 1.0, f"1k-file plan took $tDir%.2f s (budget 1 s)")
        require(bytesPerPart < 1024, f"task payload $bytesPerPart%.0f B/part")
        // (b) depth: synthetic 1M-member sidecar beside one real archive
        val deep = new java.io.File(dirP, "deep")
        deep.mkdirs()
        val deepData = new java.io.File(deep, "deep.warc.gz")
        if (!deepData.exists())
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(graft.sources.BenchCorpus.FixtureGz),
            deepData.toPath)
        val deepIdx = new java.io.File(deep, "deep.warc.gz.idx")
        if (!deepIdx.exists()) {
          val w = new java.io.BufferedWriter(new java.io.FileWriter(deepIdx))
          try (0 until 1000000).foreach(i =>
            w.write(s"""{"filename": "deep.warc.gz", "offset": ${i * 137L}}""" + "\n"))
          finally w.close()
        }
        val h1 = usedHeap()
        val (partsDeep, tDeep) = timedPlan(Map("path" -> deepData.getPath))
        val hDeep = usedHeap() - h1
        println(f"[scale] planscale depth: members=1000000 parts=${partsDeep.length}%3d " +
          f"plan=$tDeep%6.3f s  heapDelta=${math.max(0, hDeep) / 1024 / 1024}%4d MB")
        require(tDeep < 1.0, f"1M-member plan took $tDeep%.2f s (budget 1 s)")
        require(math.max(0, hDeep) < 64L * 1024 * 1024,
          s"1M-member plan retained ${hDeep / 1024 / 1024} MB of driver heap")
        // (c) the verdict's exact criterion: a 10,000-file EXPLICIT list
        // must plan within 2x of the glob path (the batched-probe
        // contract — the old code did one sequential getFileStatus RPC
        // per explicit file). The glob matches only *.warc.gz, so BOTH
        // paths probe for sidecars; the probe is one listStatus per
        // parent either way.
        val dir10k = graft.sources.BenchCorpus.ensure(
          s"$tmpP/graft_planscale10k", files = 10000, copiesPerFile = 1)
        if (!new java.io.File(dir10k, "bench-0000.warc.gz.idx").exists() &&
            !new java.io.File(dir10k, "bench-000.warc.gz.idx").exists())
          spark.read.format("warc").option("record_types", "response")
            .option("emit_member_index", dir10k).load(dir10k).count()
        planOf(Map("path" -> s"$dir10k/*.warc.gz")) // warm
        val (partsGlob, tGlob) = timedPlan(Map("path" -> s"$dir10k/*.warc.gz"))
        val fileList = new java.io.File(dir10k).listFiles()
          .filter(_.getName.endsWith(".warc.gz")).map(_.getPath).sorted
        val json = new com.fasterxml.jackson.databind.ObjectMapper()
          .writeValueAsString(fileList)
        val (partsList, tList) = timedPlan(Map("paths" -> json))
        println(f"[scale] planscale 10k explicit-list: files=${fileList.length} " +
          f"parts=${partsList.length}%6d plan=$tList%6.3f s " +
          f"(glob plan $tGlob%6.3f s, ratio ${tList / tGlob}%4.2f)")
        def idxParts(a: Array[_]): Int = a.count {
          case p: graft.sources.WarcInputPartition => p.idx.isDefined
          case _ => false }
        require(fileList.length == 10000, s"corpus has ${fileList.length} files")
        require(idxParts(partsList) == idxParts(partsGlob) && idxParts(partsList) > 0,
          s"explicit list planned ${idxParts(partsList)} idx partitions vs glob ${idxParts(partsGlob)}")
        require(tList < math.max(2 * tGlob, 1.0),
          f"explicit-list plan $tList%.2f s exceeded 2x the glob plan $tGlob%.2f s")
        // (d) consolidated CDXJ (r16 verdict item 3): ONE 1,000,000-line
        // collection index over the 1,000-file corpus, pointed at via
        // member_index. Above the shard threshold the planner must NOT
        // read-and-sort it on the driver — a distributed CdxjShards job
        // writes per-file sidecars (cached by source fingerprint) and
        // the plan goes through IdxSlice. Pins: flat driver heap on the
        // sharding plan, IdxSlice-only partitions, and a sub-second
        // cache-hit re-plan.
        val consDir = new java.io.File(s"$tmpP/graft_planscale_cons")
        consDir.mkdirs()
        val consIdx = new java.io.File(consDir, "collection.cdxj")
        if (!consIdx.exists()) {
          val w = new java.io.BufferedWriter(new java.io.FileWriter(consIdx))
          try (0 until 1000).foreach { f =>
            val name = f"bench-$f%03d.warc.gz"
            (0 until 1000).foreach(i => w.write(
              s"""org,example)/p$f/$i 20240101000000 {"filename": "$name", "offset": ${i * 137L}}""" + "\n"))
          } finally w.close()
        }
        val shardScratch = new java.io.File(consDir, "scratch").getPath
        def consPlan(): (Array[_], Double) = timedPlan(Map(
          "path" -> dirP,
          "member_index" -> consIdx.getPath,
          "member_index_shard_bytes" -> (8L * 1024 * 1024).toString,
          "member_index_scratch" -> shardScratch,
          "auto_member_index" -> "false"))
        val h2 = usedHeap()
        val (partsCons, tCons) = consPlan()
        val hCons = usedHeap() - h2
        val consSlices = partsCons.collect {
          case p: graft.sources.WarcInputPartition
            if p.path.endsWith(".warc.gz") => p }
        require(consSlices.nonEmpty &&
          consSlices.forall(p => p.memberOffsets.isEmpty && p.idx.isDefined),
          "consolidated-CDXJ plan embedded member offsets — the O(members) " +
          "driver term is back")
        val (_, tConsCached) = consPlan()
        println(f"[scale] planscale consolidated-cdxj: lines=1000000 " +
          f"parts=${consSlices.length}%5d shard+plan=$tCons%6.3f s  " +
          f"cached re-plan=$tConsCached%6.3f s  " +
          f"heapDelta=${math.max(0, hCons) / 1024 / 1024}%4d MB")
        require(math.max(0, hCons) < 256L * 1024 * 1024,
          s"consolidated plan retained ${hCons / 1024 / 1024} MB of driver heap")
        require(tConsCached < 1.0,
          f"cache-hit re-plan took $tConsCached%.2f s (budget 1 s)")
      case other => sys.error(
        s"unknown mode $other (w29 | neardup | ivf | ivfpq | hamming | funnel | dataset | spanrm | suffix | cc | scan | stream | memberindex | memberindexzstd | cdxjlookup | planscale)")
    }
    spark.stop()
  }
}
