package graft.tools

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TimeseriesOps

/** Synthetic scale probe: N upsert rows (4 generations per timestamp)
  * through the kernel's hot path — dedup-latest then daily
  * resample+ffill — entirely from `spark.range` (no IO), to measure how
  * the operators themselves behave beyond the driver's sf0.1.
  * `runMain graft.tools.ScaleProbe [rows] [labelFilter]` — the optional
  * second arg runs only probes whose label contains it (substring),
  * so one operator can be re-measured without paying the full suite.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val only: Option[String] = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Instant.parse("2015-01-01T00:00:00Z").toEpochMilli
    // n rows over ~n/4 distinct minutes spanning years: every timestamp
    // written 4 times (created_time generations), values vary
    val df = spark.range(n).select(
      timestamp_millis(lit(base) + (col("id") / 4).cast("long") * 60000L).as("time"),
      timestamp_millis(lit(base) + col("id") * 7L).as("created_time"),
      (col("id") % 1000).cast("double").as("value"))

    var ran = 0
    def timed[A](label: String)(f: => A): Option[A] = {
      if (!only.forall(label.contains)) None
      else {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
        ran += 1
        Some(r)
      }
    }

    timed(s"dedupLatest over $n rows") {
      TimeseriesOps.dedupLatest(df).count()
    }
    val spanEnd = base + (n / 4) * 60000L
    timed(s"dedup + daily resample+ffill over $n rows") {
      TimeseriesOps.resample(
        TimeseriesOps.dedupLatest(df),
        new Timestamp(base), new Timestamp(spanEnd), "1d", Seq("value")).count()
    }
    timed(s"asofJoin 1M-row left against the deduped $n-row series") {
      TimeseriesOps.asofJoin(
        df.select(col("time"), col("value").as("left_v")).limit(1000000),
        TimeseriesOps.dedupLatest(df).select(col("time"), col("value").as("right_v")),
        rightValueCols = Seq("right_v"),
        by = Nil).count()
    }
    // Exact distributed quantiles at 10M rows PER GROUP, ~2.5M distinct
    // values per group: the shape that kills the built-in percentile()
    // (one group = a 10M-value heap in one aggregation buffer). The
    // two-phase rank kernel's per-task state is one range slice of the
    // distinct-value counts (~160k rows at 64 slices) regardless of
    // group count or size — the probe certifies completion + time with
    // per-group state that NEVER materializes on one executor.
    timed(s"exact quantiles over 4 groups x ${n / 4} rows/group (two-phase rank)") {
      val qdf = spark.range(n).select(
        (col("id") % 4).cast("string").as("g"),
        ((col("id") * 2654435761L) % 10000000L).cast("double").as("v"))
      graft.ops.Quantiles.quantileCont(qdf, "v", Seq("g"),
        Seq(("p50", 0.5), ("p25", 0.25), ("p99", 0.99))).collect().length
    }
    // LSH near-dedup at 200x the sf0.1 corpus: 1M synthetic shingle
    // sets (~1% planted near-duplicates share their set with a source
    // doc), candidates via the banded equi-join, exact Jaccard verify.
    // All generated from spark.range — the probe measures the operator,
    // not IO.
    val nDocs = 1000000L
    timed(s"MinHash-LSH near-dedup over $nDocs synthetic docs") {
      val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        transform(
          sequence(lit(0), lit(19)),
          i => concat((col("id") % 990000L + (col("id") % 100) * 7L).cast("string"),
            lit("_"), i)).as("sh"))
      val pairs = graft.functions.SimilarityOps
        .lshCandidatePairs(docs, "doc_id", "sh", aName = "doc_a", bName = "doc_b")
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
        .filter(graft.functions.SimilarityOps.jaccard(col("sha"), col("shb")) >= 0.5)
      pairs.count()
    }
    // Winnowing near-dedup at scale, the post-fix (pinned sketch)
    // formulation of dedup_winnow: ~1% of docs are byte-identical to a
    // source doc, text is 96 synthetic chars, so the sketch explode is
    // ~93 positions per doc. The sketch frame is persisted exactly like
    // QueryLib.mat — built once, read by the band fan-out and both
    // verification join-backs.
    val nWinnow = 300000L
    timed(s"winnowing near-dedup over $nWinnow synthetic docs (~29M k-gram positions)") {
      val docs = spark.range(nWinnow).select(
        col("id").as("doc_id"),
        concat(
          md5((col("id") % 297000L).cast("string")),
          md5(((col("id") % 297000L) + 1000000L).cast("string")),
          md5(((col("id") % 297000L) + 2000000L).cast("string"))).as("text"))
      val sk = graft.functions.SimilarityOps
        .winnowSketch(docs, "doc_id", col("text"), k = 5, w = 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = graft.functions.SimilarityOps
        .lshCandidatePairs(sk, "doc_id", "sketch", aName = "doc_a", bName = "doc_b")
        .join(sk.select(col("doc_id").as("doc_a"), col("sketch").as("ska")), Seq("doc_a"))
        .join(sk.select(col("doc_id").as("doc_b"), col("sketch").as("skb")), Seq("doc_b"))
        .filter(graft.functions.SimilarityOps.jaccard(col("ska"), col("skb")) >= 0.5)
        .count()
      sk.unpersist()
      n
    }
    // SimHash near-dedup at scale, the post-fix (pinned fingerprint)
    // formulation of dedup_simhash: 1M docs x 20 tokens through the
    // explode + md5 + 60-vote hash-agg, fingerprints persisted once,
    // then the 4-band self-join + hamming verify.
    timed(s"SimHash near-dedup over $nDocs synthetic docs (20M token votes)") {
      val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        transform(
          sequence(lit(0), lit(19)),
          i => concat((col("id") % 990000L).cast("string"), lit("_"),
            (i + (col("id") % 100) / 90).cast("string"))).as("toks"))
      val t = graft.functions.SimilarityOps
        .simhashAgg60(docs, "doc_id", col("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = (0 until 4).map { bi =>
        t.select(col("doc_id"), col("fp"), lit(bi).as("band"),
          graft.functions.SimilarityOps.simhashBandKey(col("fp"), bi).as("bkey"))
      }.reduce(_ unionByName _)
      val n = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id"),
          graft.functions.SimilarityOps.hamming(col("x.fp"), col("y.fp")).as("h"))
        .distinct()
        .filter(col("h") <= 3)
        .count()
      t.unpersist()
      n
    }
    // Batched BPE at production merge counts: 500 merges over 200k
    // synthetic word types must land in ≤ 60 driver rounds (the
    // sequential trainer would take 500). Rounds start symbol-starved
    // (a 16-char hex alphabet admits at most ~5 disjoint pairs), then
    // fill as merged symbols diversify — exactly the ramp a real
    // tokenizer sees; the bound certifies the batch fill holds anyway.
    timed("batched BPE: 500 merges over 200k word types in <= 60 driver rounds") {
      val wc = spark.range(200000).select(
        expr("substring(md5(cast(id as string)), 1, 4 + cast(id % 12 as int))").as("word"),
        ((lit(200000L) / (col("id") + 1L)).cast("long") + 1L).as("cnt"))
        .groupBy("word").agg(sum("cnt").as("cnt"))
      val bt = graft.functions.Bpe.trainMergesBatched(wc, 500, batch = 16)
      require(bt.merges.length == 500,
        s"expected 500 merges, trained ${bt.merges.length}")
      require(bt.rounds <= 60,
        s"batched trainer took ${bt.rounds} driver rounds for 500 merges (bound: 60)")
      println(f"[probe]   rounds=${bt.rounds} (${500.0 / bt.rounds}%.1f merges/round)")
      bt.rounds
    }
    // Sign-LSH embedding near-dedup at 1M vectors with the band width
    // SIZED TO THE CORPUS (3 bands x 20 planes -> 2^20 buckets/band,
    // occupancy ~1): the 8-bit driver-query configuration would put
    // ~3,900 vectors in every bucket here and the within-bucket join
    // would quadratically explode — the probe demonstrates the
    // planesPerBand ≈ log2(n) sizing rule holding at scale.
    // Gap-based sessionization at 10M events / 50k users — the
    // q_sessionize kernel: one lag window + running-sum session ids +
    // per-session rollup, all on a single hash exchange (the rollup's
    // (user, session) grouping is satisfied by the window's user_id
    // partitioning). Inter-event deltas jitter up to ~72 min so the
    // 30-min cut actually splits runs.
    timed(s"sessionization over $n synthetic events (50k users)") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ev = spark.range(n).select(
        (col("id") % 50000L).as("user_id"),
        timestamp_millis(lit(base) + (col("id") / 50000L).cast("long") * 60000L +
          (col("id") % 37L) * 120000L).as("ts"),
        col("id").as("event_id"),
        (col("id") % 100L).cast("double").as("value"))
      val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      ev.select(col("user_id"), col("ts"), col("event_id"), col("value"),
          when(gapUs.isNull || gapUs > 1800000000L, 1L).otherwise(0L).as("is_new"))
        .withColumn("session_idx", sum(col("is_new")).over(w))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .count()
    }
    // Decontamination at 1M docs / 20M gram instances — the
    // txt_contamination kernel: md5 gram digests, distinct train-side
    // partial agg, eval-side semi-join; shuffles carry fixed-width
    // digests only.
    timed(s"n-gram decontamination over $nDocs synthetic docs (20M gram instances)") {
      val d = spark.range(nDocs).select(
        col("id").as("doc_id"),
        when(substring(md5(concat(lit("split:"), col("id").cast("string"))), 1, 2) < "1a",
          "eval").otherwise("train").as("split"),
        transform(sequence(lit(0), lit(19)),
          i => concat(((col("id") % 900000L) * 17L + i * 31L).cast("string"),
            lit("_g")).cast("string")).as("grams"))
      val g = d.select(col("doc_id"), col("split"), explode(col("grams")).as("gr"))
        .select(col("doc_id"), col("split"), md5(col("gr")).as("gh"))
      val tr = g.filter(col("split") === "train").select("gh").distinct()
      g.filter(col("split") === "eval").join(tr, Seq("gh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_grams"))
        .count()
    }
    // C4-style repeated-span removal at 1M docs / 4M span instances —
    // the dedup_spans kernel: span explode fused with the generator,
    // one hash-agg for (frequency, keeper), a join back that carries
    // ONLY frequency>1 spans, one per-doc reassembly agg. Docs repeat
    // every 250k ids, so ~75% of span instances are duplicates — the
    // worst case for the join-back side (a real corpus ships far less).
    timed(s"repeated-span removal over $nDocs synthetic docs (4M spans, 75% duplicated)") {
      val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(11)),
          i => concat(((col("id") % 250000L) * 13L + i * 7L).cast("string"), lit("w")))).as("text"))
      val d = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      val nG = ((size(col("tk")) + lit(2)) / lit(3)).cast("int")
      val spans = d.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), nG - 1),
            g => concat_ws(" ", slice(col("tk"), g * lit(3) + lit(1), lit(3))))))
        .withColumnRenamed("col", "gtext")
        .withColumn("gh", md5(col("gtext")))
      val dups = spans.groupBy("gh")
        .agg(min(col("doc_id") * lit(2147483648L) + col("pos")).as("keeper"),
          count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select("gh", "keeper")
      val r = spans.join(dups, Seq("gh"), "left")
        .withColumn("keep", col("keeper").isNull ||
          col("doc_id") * lit(2147483648L) + col("pos") === col("keeper"))
        .groupBy("doc_id")
        .agg(sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
        .agg(count(lit(1)), sum(col("n_dropped"))).head()
      println(s"[probe]   ${r.getLong(0)} docs reassembled, ${r.getLong(1)} duplicate spans dropped")
    }
    // Connected-components star contraction at 1M edges, both
    // adversarial shapes: a single CHAIN (diameter = n — the worst case
    // for plain label propagation, which would need n rounds; the
    // large/small-star contraction must fold it diameter-independently
    // in O(log^2 n) rounds) and a broad STAR (one max-degree hub — the
    // worst case for hub replication in the large-star step). Reports
    // rounds alongside time so the log^2 claim is measured, not cited.
    val nCcEdges = 1000000L
    timed(s"connected components over a $nCcEdges-edge chain (diameter $nCcEdges)") {
      val chain = spark.range(nCcEdges).select((col("id") + 1L).as("a"), col("id").as("b"))
      val (labels, rounds) = graft.functions.Components
        .connectedComponentsWithRounds(chain, "a", "b", maxIterations = 100)
      val r = labels.agg(count(lit(1)), countDistinct(col("component"))).head()
      println(s"[probe]   chain: rounds=$rounds nodes=${r.getLong(0)} components=${r.getLong(1)}")
    }
    timed(s"connected components over a $nCcEdges-edge star (hub degree $nCcEdges)") {
      val star = spark.range(nCcEdges).select((col("id") + 1L).as("a"), lit(0L).as("b"))
      val (labels, rounds) = graft.functions.Components
        .connectedComponentsWithRounds(star, "a", "b")
      val r = labels.agg(count(lit(1)), countDistinct(col("component"))).head()
      println(s"[probe]   star: rounds=$rounds nodes=${r.getLong(0)} components=${r.getLong(1)}")
    }
    val nVecs = 1000000L
    timed(s"sign-LSH embedding near-dedup candidates over $nVecs synthetic vectors") {
      // md5-derived components: genuinely pseudo-random vectors (a
      // smooth generator like sin(a*id + b*d) produces a 1-parameter
      // family — huge near-duplicate clusters that no banding survives)
      val e = spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          conv(substring(md5(concat(col("id").cast("string"), lit("_"), d)), 1, 6), 16, 10)
            .cast("double") / lit(8388608.0) - 1.0).as("v"))
      graft.functions.SimilarityOps
        .signLshCandidatePairs(e, "vec_id", "v", dim = 64, bands = 3, planesPerBand = 20)
        .count()
    }
    // PQ compressed-scan at 1M vectors: encode (narrow, codebooks as
    // literals) then ADC-score ALL 1M codes against 20 queries and keep
    // a 100-candidate shortlist each — the scan that would read 64
    // doubles/vector reads 8 bytes of codes instead; the shortlist then
    // exact-reranks in production (AnnPqSpec pins that recall).
    timed(s"PQ encode + ADC shortlist over $nVecs synthetic vectors (8x16 codes, 20 queries)") {
      val e = spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          conv(substring(md5(concat(col("id").cast("string"), lit("_"), d)), 1, 6), 16, 10)
            .cast("double") / lit(8388608.0) - 1.0).as("v"))
      val cb = graft.functions.AnnPq.buildFixed(e, "v", idCol = "vec_id", m = 8, k = 16)
      val enc = e.select(col("vec_id").as("c_id"),
          graft.functions.AnnPq.encodeExpr(cb, col("v")).as("code"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      enc.count() // materialize the compressed index
      val queries = e.filter(col("vec_id") % 50000L === 7L) // 20 queries
      val shortlisted = graft.functions.AnnPq.query(cb, enc,
        queries.withColumnRenamed("vec_id", "q_id"),
        qIdCol = "q_id", embCol = "v", cIdCol = "c_id", codeCol = "code",
        topK = 100).count()
      enc.unpersist()
      require(shortlisted == 20L * 100, s"expected 2000 shortlist rows, got $shortlisted")
    }
    // Token-budget shard packing at 2N rows over 8 groups: the naive
    // per-group running-sum window would be 8 giant single-task sorts;
    // the two-phase prefix sum range-partitions once, computes a
    // (numPartitions x groups)-row offset frame, and broadcasts it
    // back — every window task bounded by one repartition slice.
    timed(s"packByBudget over ${2 * n} rows, 8 groups") {
      val docs = spark.range(2 * n).select(
        concat(lit("lang"), (col("id") % 8L).cast("string")).as("lang"),
        col("id").as("doc_id"),
        (col("id") % 997L + 1L).as("n_tokens"))
      graft.ops.Pack.packByBudget(docs, "n_tokens", 100000L, Seq("lang"), Seq("doc_id"))
        .agg(countDistinct(col("shard_idx")), count(lit(1))).collect()
    }
    // IVF-KMeans ANN at 1M vectors with REALISTIC density: embedding
    // corpora are clustered, so the corpus is 2048 planted clusters
    // (md5-random center + 0.15-amplitude md5-random noise), not the
    // uniform cloud the sign-LSH probe wants. Recall@16 is measured
    // against brute-force cosine ground truth on ~100 queries; the IVF
    // path probes 8 of 256 cells (~3% of the corpus scanned per query).
    // LshRecallSpec pins 0.85 at fixture size — the probe holds the
    // same floor at 1M.
    timed(s"IVF-KMeans ANN recall@16 over $nVecs clustered vectors (k=256, nProbe=8)") {
      val dim = 64
      def comp(seed: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(seed, lit("_"), d)), 1, 6), 16, 10)
          .cast("double") / lit(8388608.0) - 1.0
      val vecs = spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          comp(concat(lit("c"), (col("id") % 2048L).cast("string")), d) +
            comp(concat(lit("n"), col("id").cast("string")), d) * lit(0.15)).as("emb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()
      val index = graft.functions.AnnIvf.build(vecs, "emb", k = 256, maxIter = 5)
      val assigned = index.copy(assigned = index.assigned
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      assigned.assigned.count()
      val queries = vecs.filter(col("vec_id") % 9973L === 7L) // ~100 queries
      val qb = queries.select(col("vec_id").as("qid"),
        col("emb").cast("array<double>").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("s").desc, col("vec_id"))
      val truthTop = vecs.crossJoin(broadcast(qb))
        .select(col("qid"), col("vec_id"),
          round(graft.plans.CosineSimilarity.cosineSim(
            col("qv"), col("emb").cast("array<double>")), 6).as("s"))
        .withColumn("r", row_number().over(w)).filter(col("r") <= 16)
        .select(col("qid"), col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = truthTop.count()
      val got = graft.functions.AnnIvf
        .query(assigned, queries, "vec_id", topK = 16, nProbe = 8, "vec_id")
        .select(col("vec_id_q").as("qid"), col("vec_id_c").as("vec_id"))
      val hits = truthTop.join(got, Seq("qid", "vec_id"), "left_semi").count()
      val recall = hits.toDouble / total
      println(f"[probe]   recall@16 = $recall%.3f over ${total / 16} queries")
      require(recall >= 0.85, f"IVF recall@16 $recall%.3f fell below the 0.85 spec floor")
      vecs.unpersist(); assigned.assigned.unpersist(); truthTop.unpersist()
    }
    // MERGE INTO at partition scale: 1M rows / 30 day-partitions, a
    // source replacing 3 days (~100k times) plus ~33k never-seen
    // inserts. The retire set must stay confined to the 3 matched
    // days' files — merge cost tracks the OVERLAP footprint, not table
    // size — in exactly one commit, with the final multiset exact.
    timed("txlog MERGE INTO: 1M rows / 30 partitions, 3-day overlap + inserts, one commit") {
      val dir = java.nio.file.Files.createTempDirectory("graft-merge-probe").toString
      val store = new graft.store.TimeseriesStore(spark, dir, backend = "txlog")
      val base = 1704067200000L // 2024-01-01 UTC
      store.save("f", spark.range(1000000).select(
        timestamp_millis(lit(base) + (col("id") % 30) * 86400000L +
          (col("id") / 30).cast("long") * 2000L).as("time"),
        timestamp_millis(lit(base)).as("created_time"),
        col("id").cast("double").as("value")))
      val rows0 = store.read("f").count()
      val preVersion = store.tableVersion("f")
      val log = new graft.store.TxLog(spark.sparkContext.hadoopConfiguration, s"$dir/feature/f")
      val liveBefore = log.snapshot().map(a => a.path -> a.partition).toMap
      // source: every time in days 5..7 replaced; day-40 rows inserted
      val src = spark.range(100002).select(
        timestamp_millis(lit(base) + (lit(5L) + col("id") % 3) * 86400000L +
          (col("id") / 3).cast("long") * 2000L).as("time"),
        timestamp_millis(lit(base) + lit(1L)).as("created_time"),
        lit(-1.0).as("value"))
        .unionByName(spark.range(33333).select(
          timestamp_millis(lit(base) + 40L * 86400000L + col("id") * 1000L).as("time"),
          timestamp_millis(lit(base) + lit(1L)).as("created_time"),
          lit(-2.0).as("value")))
      val t0 = System.nanoTime()
      val (updated, inserted) = store.mergeInto("f", src)
      val mergeSecs = (System.nanoTime() - t0) / 1e9
      require(store.tableVersion("f") == preVersion + 1, "merge must be ONE commit")
      val liveAfter = log.snapshot().map(a => a.path -> a.partition).toMap
      val retired = liveBefore.keySet -- liveAfter.keySet
      val touched = retired.map(liveBefore)
      val expectedDays = Set("2024-01-06", "2024-01-07", "2024-01-08")
      require(touched.nonEmpty && touched.subsetOf(expectedDays),
        s"merge retired files outside the matched days: $touched")
      val rows1 = store.read("f").count()
      // one generation per matched time in the base table, so exactly
      // `updated` rows were replaced and every source row landed
      require(rows1 == rows0 - updated + 100002L + 33333L,
        s"row accounting off: $rows0 -> $rows1 (updated=$updated inserted=$inserted)")
      require(updated == 100002L && inserted == 33333L,
        s"expected (100002, 33333), got ($updated, $inserted)")
      println(f"[probe]   merge $mergeSecs%.1fs: updated=$updated inserted=$inserted, " +
        s"retired ${retired.size} files all in $expectedDays, rows $rows0 -> $rows1")
    }
    // Epoch-mixed evolved read: 1M int rows (epoch 0), widen to double,
    // 1M double rows (epoch 1) — the grouped per-epoch read must still
    // aggregate exactly and pay only a union of two pruned scans.
    timed("txlog schema evolution: epoch-mixed 2M-row read after int->double widen") {
      import org.apache.spark.sql.types.DoubleType
      val dir = java.nio.file.Files.createTempDirectory("graft-evolve-probe").toString
      val store = new graft.store.TimeseriesStore(spark, dir, backend = "txlog")
      val base = 1704067200000L
      store.save("f", spark.range(1000000).select(
        timestamp_millis(lit(base) + col("id") * 1000L).as("time"),
        timestamp_millis(lit(base)).as("created_time"),
        col("id").cast("int").as("value")))
      store.evolveValueType("f", DoubleType)
      store.save("f", spark.range(1000000).select(
        timestamp_millis(lit(base) + (col("id") + 1000000L) * 1000L).as("time"),
        timestamp_millis(lit(base)).as("created_time"),
        (col("id").cast("double") + 0.5).as("value")))
      val agg = store.read("f").agg(
        sum(col("value")).as("s"), count(lit(1)).as("n")).collect()(0)
      // sum = Σ(0..999999) as ints + Σ(i + 0.5) = 2 * 499999500000 + 500000
      require(agg.getLong(1) == 2000000L &&
        agg.getDouble(0) == 2.0 * 499999500000.0 + 500000.0,
        s"epoch-mixed aggregate wrong: ${agg.mkString(",")}")
      println(s"[probe]   2M rows across 2 epochs read exactly (sum=${agg.getDouble(0)})")
    }
    // OPTIMIZE at micro-batch-sink accumulation scale: 120 one-commit
    // appends (~30 partitions each touched repeatedly) leave the table
    // at one file per (commit x partition); one optimize pass must
    // collapse the live set to ~one file per partition in ONE commit,
    // with the row multiset bit-identical. Measures the re-pack cost a
    // nightly maintenance job would pay per feature.
    timed("txlog OPTIMIZE: 120 small commits re-packed in one pass") {
      val dir = java.nio.file.Files.createTempDirectory("graft-opt-probe").toString
      val store = new graft.store.TimeseriesStore(spark, dir, backend = "txlog")
      val batches = 120
      (0 until batches).foreach { i =>
        store.save("f", spark.range(50).select(
          timestamp_millis(lit(1704067200000L) + (col("id") % 30) * 86400000L +
            i * 60000L).as("time"),
          timestamp_millis(lit(1704067200000L) + lit(i.toLong)).as("created_time"),
          (col("id") + i).cast("double").as("value")))
      }
      val log = new graft.store.TxLog(spark.sparkContext.hadoopConfiguration, s"$dir/feature/f")
      val filesBefore = log.snapshot().size
      val rowsBefore = store.read("f").count()
      val preVersion = store.tableVersion("f")
      val t0 = System.nanoTime()
      val retired = store.optimize("f")
      val optSecs = (System.nanoTime() - t0) / 1e9
      val filesAfter = log.snapshot().size
      require(store.tableVersion("f") == preVersion + 1, "optimize must be ONE commit")
      require(store.read("f").count() == rowsBefore, "optimize changed the row count")
      require(filesAfter <= 30 + 1 && retired == filesBefore,
        s"pack failed: $filesBefore files -> $filesAfter (retired $retired)")
      println(f"[probe]   $filesBefore files -> $filesAfter in one commit ($optSecs%.1fs; " +
        s"the rest is the 120 setup saves), $rowsBefore rows preserved")
    }
    // TxLog optimistic concurrency under real contention: 16 threads x
    // 25 append commits hammering ONE log, plus two compactors racing to
    // retire the same seed generation. The no-overwrite rename is the
    // only serialization point, so this measures commit throughput at
    // the contention level a 1000-executor streaming job's driver-side
    // committers would see, and certifies the validation rules: appends
    // blind-retry their lost renames, remove-bearing commits re-validate
    // per attempt (exactly ONE compactor may win; the other must fail
    // with ConcurrentModificationException, never double-publish).
    timed("txlog OCC: 400 racing append commits + 2 racing compactions on one log") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val dir = java.nio.file.Files.createTempDirectory("graft-occ-probe").toString
      val conf = spark.sparkContext.hadoopConfiguration
      val seed = (0 until 8).map(i => graft.store.TxAdd(s"partition=p/seed-$i.parquet", "p"))
      val log = new graft.store.TxLog(conf, dir)
      seed.foreach(s => log.commit(Seq(s)))
      val appenders = (1 to 16).map { t =>
        Future {
          val mine = new graft.store.TxLog(conf, dir)
          (1 to 25).foreach(i => mine.commit(
            Seq(graft.store.TxAdd(s"partition=p/a-$t-$i.parquet", "p")), maxAttempts = 2000))
        }
      }
      val compactors = (1 to 2).map { c =>
        Future {
          try {
            new graft.store.TxLog(conf, dir).commit(
              Seq(graft.store.TxAdd(s"partition=p/comp-$c.parquet", "p")),
              seed.map(s => graft.store.TxRemove(s.path)), maxAttempts = 2000)
            1
          } catch { case _: java.util.ConcurrentModificationException => 0 }
        }
      }
      Await.result(Future.sequence(appenders), 5.minutes)
      val wins = Await.result(Future.sequence(compactors), 5.minutes).sum
      require(wins == 1, s"expected exactly one compaction winner, got $wins")
      // 8 seeds + 400 appends + 1 compaction = versions 0..408, no gaps
      require(log.latestVersion() == 408L,
        s"expected 409 committed versions, high-water = ${log.latestVersion()}")
      val snap = log.snapshot().map(_.path)
      require(snap.length == 401 && !snap.exists(_.contains("seed-")),
        s"snapshot drift: ${snap.length} files (wanted 400 appends + 1 compacted, 0 seeds)")
      println(s"[probe]   409 commits landed exactly-once, 1/2 compactors won")
    }
    // Exactly-once commit validation cost vs log length. Every
    // txn-tagged commit replays the table state; the CHECKPOINT
    // carries every txn id (and live file) ever seen, so a cache-less
    // replay reads O(total history) lines per commit, forever — the
    // pre-fix probe measured exactly that slope (block latencies
    // 1.4 s → 3.9 s across 1000 commits). The WARM path is now the
    // TxLog instance's incremental replay cache (state is immutable
    // once committed, so a cached snapshot is only ever EXTENDED by
    // newer commit files): a long-lived committer pays O(commits since
    // its last replay) per validation, and the block latencies below
    // must stay ~flat. The residual O(history) costs are (a) the
    // checkpoint REWRITE every CheckpointEvery-th commit — a write,
    // not a parse — and (b) one cold anchor replay per process
    // restart, measured separately below. The bound-at-scale story: a
    // year-long streaming job at one commit/minute accumulates ~500k
    // txn ids — ~tens of MB of checkpoint, one cold read per restart;
    // txn-id RETENTION (expiring ids older than the source's replay
    // horizon, the Delta paper's setTransaction retention) is the
    // designed escape hatch if a deployment ever outgrows that.
    timed("txlog txn validation: 1000 exactly-once commits, block latency growth") {
      val dir = java.nio.file.Files.createTempDirectory("graft-txn-probe").toString
      val conf = spark.sparkContext.hadoopConfiguration
      val log = new graft.store.TxLog(conf, dir)
      val blocks = Array.ofDim[Double](10)
      for (b <- 0 until 10) {
        val t0 = System.nanoTime()
        for (i <- 0 until 100) {
          val k = b * 100 + i
          log.commit(Seq(graft.store.TxAdd(s"partition=p/f-$k.parquet", "p")),
            txnId = Some(s"stream#$k"))
        }
        blocks(b) = (System.nanoTime() - t0) / 1e9
        println(f"[probe]   commits ${b * 100}%4d-${b * 100 + 99}%4d: ${blocks(b)}%.2fs")
      }
      // flat-slope gate: with the incremental cache the last block may
      // not cost multiples of the first (pre-fix reading was 2.8x)
      require(blocks.last < blocks.head * 2.0,
        f"warm validation grew with history: ${blocks.head}%.2fs -> ${blocks.last}%.2fs")
      // cold restart: a FRESH instance pays the one-time O(history)
      // anchor replay, then rides its cache
      val t1 = System.nanoTime()
      val cold = new graft.store.TxLog(conf, dir)
      require(cold.txnSeen("stream#0"), "txn ids lost across checkpoints")
      val coldS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      require(cold.txnSeen("stream#999"), "txn ids lost across checkpoints")
      println(f"[probe]   cold replay at 1000 commits: $coldS%.3fs; cached re-check: ${(System.nanoTime() - t2) / 1e9}%.3fs")
      // the whole point of the txn set: duplicates still refuse at 1000
      require(log.commit(Seq(graft.store.TxAdd("partition=p/dup.parquet", "p")),
        txnId = Some("stream#500")) == -1L, "duplicate txn not detected")
    }
    // Metadata-scale: a document catalog pays a full-doc persist per
    // mutation, so registering n features one-by-one is O(n²) bytes —
    // fine for tens, wrong for a pipeline deploying thousands. The
    // probe quantifies the loop form at 1k (don't extrapolate linearly:
    // each persist grows) and the single-transaction bulk form at 10k.
    timed("catalog metadata: bulk vs loop feature registration") {
      val dir = java.nio.file.Files.createTempDirectory("graft-cat-probe").toString
      val c1 = new graft.catalog.Catalog(s"$dir/loop.json")
      c1.createNamespace(graft.catalog.Namespace("m", s"file://$dir/wh1"))
      val t0 = System.nanoTime()
      (0 until 1000).foreach(i =>
        c1.createFeature(graft.catalog.Feature("m", f"f$i%05d")))
      val loopS = (System.nanoTime() - t0) / 1e9
      val c2 = new graft.catalog.Catalog(s"$dir/bulk.json")
      c2.createNamespace(graft.catalog.Namespace("m", s"file://$dir/wh2"))
      val t1 = System.nanoTime()
      c2.createFeatures((0 until 10000).map(i => graft.catalog.Feature("m", f"f$i%05d")))
      val bulkS = (System.nanoTime() - t1) / 1e9
      println(f"[probe]   loop 1k: $loopS%.2fs; bulk 10k: $bulkS%.2fs " +
        f"(${loopS / 1000 * 1e3}%.1f ms/feature loop vs ${bulkS / 10000 * 1e6}%.1f us/feature bulk)")
      require(c2.listFeatures(Some("m")).size == 10000)
      require(bulkS < loopS, "bulk registration must beat the 10x-smaller loop")
    }

    // The streaming-sink ACCUMULATION regime: 10k micro-batch commits
    // on one log — ~a week of one-commit-per-minute ingest. With the
    // legacy opaque-txn form this is the shape that outgrows the
    // checkpoint (every id ever seen rides every 10th-commit rewrite:
    // O(n^2/10) lines written over the run). The structured
    // (streamId, batchId) form keeps ONE line per stream; what remains
    // in the checkpoint is the LIVE FILE set — which is what OPTIMIZE
    // bounds, so the probe interleaves compactions at the cadence a
    // production table would and requires flat block latencies plus a
    // bounded final checkpoint.
    timed("txlog streaming sink: 10000 structured-txn commits + periodic OPTIMIZE") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sink-probe").toString
      val conf = spark.sparkContext.hadoopConfiguration
      val log = new graft.store.TxLog(conf, dir)
      val blocks = Array.ofDim[Double](10)
      var liveSinceOpt = List.empty[String]
      for (b <- 0 until 10) {
        val t0 = System.nanoTime()
        for (i <- 0 until 1000) {
          val k = b * 1000 + i
          val path = f"partition=p/batch-$k%05d.parquet"
          log.commit(Seq(graft.store.TxAdd(path, "p")),
            txnAppVer = Some(("sink-stream", k.toLong)))
          liveSinceOpt ::= path
          // OPTIMIZE cadence: every 2000 commits, re-pack the window's
          // files into one (single atomic remove+add commit)
          if ((k + 1) % 2000 == 0) {
            log.commit(
              Seq(graft.store.TxAdd(f"partition=p/opt-$k%05d.parquet", "p")),
              liveSinceOpt.map(graft.store.TxRemove(_)))
            liveSinceOpt = List(f"partition=p/opt-$k%05d.parquet")
          }
        }
        blocks(b) = (System.nanoTime() - t0) / 1e9
        println(f"[probe]   commits ${b * 1000}%5d-${b * 1000 + 999}%5d: ${blocks(b)}%.2fs")
      }
      require(blocks.last < blocks.head * 2.0,
        f"sink commit latency grew with history: ${blocks.head}%.2fs -> ${blocks.last}%.2fs")
      // final checkpoint: live files since last OPTIMIZE + 1 app line —
      // BOUNDED by compaction cadence, not by total commits
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      val ckpts = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "_txlog"))
        .map(_.getPath.getName).filter(_.endsWith(".checkpoint.json")).sorted
      val lastCkpt = new org.apache.hadoop.fs.Path(dir, s"_txlog/${ckpts.last}")
      val lines = scala.io.Source.fromInputStream(fs.open(lastCkpt), "UTF-8")
        .getLines().count(_.nonEmpty)
      println(s"[probe]   final checkpoint: $lines lines (live files + 1 stream line) at 10k commits")
      require(lines <= 2101, s"checkpoint no longer bounded by OPTIMIZE cadence: $lines lines")
      // cold restart: fresh instance, one anchor replay
      val t1 = System.nanoTime()
      val cold = new graft.store.TxLog(conf, dir)
      require(cold.txnSeen("sink-stream", 9999L), "stream high-water mark lost")
      require(!cold.txnSeen("sink-stream", 10000L), "phantom future batch")
      println(f"[probe]   cold replay at 10k commits: ${(System.nanoTime() - t1) / 1e9}%.3fs")
      // zombie re-delivery of ANY historical batch must no-op
      require(log.commit(Seq(graft.store.TxAdd("partition=p/dup.parquet", "p")),
        txnAppVer = Some(("sink-stream", 5000L))) == -1L, "replayed batch not refused")
    }
    // Interval join at fan-out scale: 1M ten-minute windows against 10M
    // points over 10k keys. The binned kernel's cost model is (fan-out
    // ≈ 2 rows/interval) + one (key, bin) hash shuffle; a naive
    // key-equi SMJ with a range residual pays per-key all-pairs — at
    // 1000 points and 100 intervals per key that is 10^5 candidate
    // rows/key (1e9 total) vs the kernel's ~2e7 shuffled rows. 100 TB:
    // both sides partition on (key, bin); no single key's bin set lands
    // on one task.
    timed("binned interval join: 1M windows x 10M points, 10k keys") {
      val binUs = 600L * 1000000L
      val nIv = 1000000L
      val iv = spark.range(nIv).select(
        col("id").as("iv_id"), (col("id") % 10000L).as("key"),
        timestamp_micros(lit(base * 1000L) + col("id") * (binUs / 97L)).as("w_start"),
        timestamp_micros(lit(base * 1000L) + col("id") * (binUs / 97L) + binUs).as("w_end"))
      val pt = spark.range(10L * nIv).select(
        col("id").as("pt_id"), (col("id") % 10000L).as("key"),
        timestamp_micros(lit(base * 1000L) + col("id") * (binUs / 977L)).as("ts"),
        (col("id") % 100L).cast("double").as("v"))
      val n = graft.ops.IntervalJoin
        .binned(iv, pt, "key", "w_start", "w_end", "ts", binUs)
        .groupBy(col("iv_id")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).head.getLong(0)
      println(s"[probe]   matched pairs: $n")
      require(n > 0)
    }
    // PageRank at graph scale: 2M nodes / 10M weighted edges, 3
    // iterations. Per iteration: one shuffle join (edges on src, built
    // once and reused) + one hash-agg on dst; the rank table is O(|V|)
    // and is the only thing that moves between rounds.
    timed("pageRank: 2M nodes, 10M edges, 3 iterations") {
      val nEdge = 10000000L
      val edges = spark.range(nEdge).select(
        (col("id") % 2000000L).as("src"),
        ((col("id") * 7919L + 13L) % 2000000L).as("dst"),
        (col("id") % 5L + 1L).as("w"))
      val ranks = graft.functions.Graph.pageRank(edges, "src", "dst", "w", 3)
      val s = ranks.agg(sum(col("rank")), count(lit(1))).head
      println(f"[probe]   rank mass ${s.getDouble(0)}%.4f over ${s.getLong(1)} nodes")
      require(s.getLong(1) == 2000000L)
    }
    // BPE at corpus scale: the trainer's cost model is ONE 20M-token
    // corpus reduce to ~50k word types, then 3 merge rounds that touch
    // only the vocab table (plus a 1-row argmax collect each). A
    // trainer that rescanned the corpus per merge would pay 4 corpus
    // passes; this pays 1 + 3·O(|vocab|).
    timed("BPE trainer: 20M-token corpus -> 50k word types, 3 merge rounds") {
      val toks = spark.range(20000000L).select(
        substring(md5((col("id") % 50000L).cast("string")), 1, 8).as("text"))
      val wc = graft.functions.Bpe.wordCounts(toks, "text")
      val merges = graft.functions.Bpe.trainMerges(wc, 3)
      println(s"[probe]   merges: ${merges.map(m => s"${m.left}+${m.right}@${m.count}").mkString(", ")}")
      require(merges.size == 3)
    }
    // Sketches at stream scale: both are one-pass hash-aggs whose
    // OUTPUT is O(sketch size), not O(stream) — 256 registers/key for
    // HLL, 4x1024 counters for CMS — so a 100 TB profile ships
    // kilobytes per key to the driver/warehouse.
    timed("sketches: HLL registers (20M ids, 8 keys) + CMS counters (20M tokens)") {
      val ids = spark.range(20000000L).select(
        (col("id") % 8L).cast("string").as("g"),
        concat(lit("hll:"), (col("id") % 3000000L).cast("string")).as("hin"))
      val est = graft.functions.Hll.registers(ids, Seq("g"), col("hin"))
        .groupBy(col("g")).agg(sum(graft.functions.Hll.sumTerm("r")).as("s"))
        .select(graft.functions.Hll.rawEstimate(col("s")).as("e"))
        .agg(avg(col("e"))).head.getDouble(0)
      // true distinct/key = 375k (gcd(8, 3M) = 8 partitions the id space)
      println(f"[probe]   mean HLL estimate/key: $est%.0f (true 375000)")
      val toks = spark.range(20000000L).select(
        substring(md5((col("id") % 100000L).cast("string")), 1, 6).as("t"))
      val sk = graft.functions.Cms.sketch(toks, col("t"))
      require(sk.count() <= 4096, "CMS output must stay O(d*w)")
    }
    // Row-level DELETE at table scale: 1M rows over 30 day-partitions;
    // erasing one user's rows from ONE day must rewrite only that
    // day's files — the other 29 partitions' files keep their exact
    // paths. This is the 100 TB GDPR claim made checkable: erasure
    // cost is proportional to the files holding the subject's rows,
    // never the table.
    timed("txlog DELETE: 1M rows / 30 partitions, single-day erasure rewrites 1 partition") {
      val dir = java.nio.file.Files.createTempDirectory("graft-del-probe").toString
      val st = new graft.store.TimeseriesStore(spark, dir, backend = "txlog")
      val day0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      st.save("f", spark.range(1000000L).select(
        timestamp_millis(lit(day0) + (col("id") % 30L) * 86400000L +
          expr("(id div 30L) % 86400L") * 1000L).as("time"),
        timestamp_millis(lit(day0) + col("id")).as("created_time"),
        (col("id") % 1000L).cast("double").as("value")))
      val log = new graft.store.TxLog(spark.sparkContext.hadoopConfiguration, s"$dir/feature/f")
      val before = log.snapshot().map(a => a.path -> a.partition).toMap
      // erase value==4 rows from day 2024-01-05 only (id ≡ 4 mod 1000
      // intersects id ≡ 4 mod 30 — the residues must be compatible)
      val deleted = st.deleteWhere("f",
        col("value") === 4.0 &&
          col("time") >= lit("2024-01-05").cast("timestamp") &&
          col("time") < lit("2024-01-06").cast("timestamp"))
      val after = log.snapshot().map(a => a.path -> a.partition).toMap
      val rewrittenParts = (before.keySet -- after.keySet).map(before)
      val freshParts = (after.keySet -- before.keySet).map(after)
      println(s"[probe]   deleted $deleted rows; rewritten partitions: $rewrittenParts; new files in: $freshParts")
      require(deleted > 0)
      require(rewrittenParts == Set("2024-01-05") && freshParts == Set("2024-01-05"),
        s"DELETE touched partitions beyond the target: $rewrittenParts / $freshParts")
      require(st.read("f").count() == 1000000L - deleted)
    }
    // Quantile sketch at stream scale: one-pass hash-agg whose output
    // is O(buckets), not O(stream) — the same economics as HLL/CMS
    // above, for value distributions. 20M uniform values in (0, 10000]
    // per 8 keys: the p50 estimate must sit within the 2^-7 relative
    // bound of 5000 per key.
    timed("quantile sketch: 20M values / 8 keys, p50/p99 within 2^-7") {
      val vals = spark.range(20000000L).select(
        (col("id") % 8L).cast("string").as("g"),
        (((col("id") * 2654435761L) % 1000000L) + 1L).cast("double").as("v"))
      val sk = graft.functions.QuantileSketch.sketch(vals, Seq("g"), col("v") * 0.01)
      val nBuckets = sk.count()
      require(nBuckets < 8 * 3000, s"sketch outgrew its bucket bound: $nBuckets")
      val q = graft.functions.QuantileSketch.quantiles(
        sk, Seq("g"), Seq(("p50", 1, 2), ("p99", 99, 100)))
      val p50s = q.select(col("p50")).collect().map(_.getDouble(0))
      val err = p50s.map(v => math.abs(v - 5000.0) / 5000.0).max
      println(f"[probe]   buckets: $nBuckets; worst p50 rel err: $err%.4f (bound ${1.0 / 128}%.4f)")
      require(err <= 1.0 / 128 + 1e-9)
    }
    // Rolling quantiles: the roll is bucket arithmetic over the DAILY
    // SKETCH table (x7 fan-out of O(days x buckets) rows), never the
    // event rows — 365 days x 8 keys from 20M events extracts 2,920
    // rolling (p50, p90) pairs without re-sorting any raw window.
    timed("rolling 7-day quantiles: 20M events, 365 days x 8 keys") {
      val ev = spark.range(20000000L).select(
        (col("id") % 8L).cast("string").as("g"),
        (col("id") % 365L).as("day"),
        (((col("id") * 40503L) % 100000L) + 1L).cast("double").as("v"))
      val sk = graft.functions.QuantileSketch.sketch(ev, Seq("g", "day"), col("v"))
      val sv = sk.withColumn("o", explode(sequence(lit(0), lit(6))))
        .select(col("g"), (col("day") + col("o")).as("xday"), col("okey"), col("cnt"))
        .filter(col("xday") < 365L)
        .groupBy(col("g"), col("xday"), col("okey")).agg(sum(col("cnt")).as("cnt"))
      val out = graft.functions.QuantileSketch.quantiles(
        sv, Seq("g", "xday"), Seq(("p50", 1, 2), ("p90", 9, 10))).count()
      println(s"[probe]   rolling rows: $out")
      require(out == 8L * 365L)
    }
    // Theta set operations at ID scale: 5M distinct members per side,
    // 2M shared — union/intersection estimated from two 4096-row
    // sketches instead of an 8M-row distinct join. Accuracy rides
    // ~1/sqrt(k); the probe requires 5% on the union and 10% on the
    // smaller intersection.
    timed("theta overlap: |A|=5M, |B|=5M, 2M shared, k=4096 sketches") {
      val a = spark.range(5000000L).select(lit("a").as("g"), concat(lit("u"), col("id")).as("m"))
      val b = spark.range(3000000L, 8000000L).select(lit("b").as("g"), concat(lit("u"), col("id")).as("m"))
      val sk = graft.functions.Kmv.sketch(a.unionByName(b), Seq("g"), col("m"), k = 4096)
      val est = graft.functions.Kmv.thetaSetEstimates(sk, "g", "a", "b", k = 4096).head
      val (u, i) = (est.getDouble(0), est.getDouble(1))
      println(f"[probe]   union est: $u%.0f (true 8000000); inter est: $i%.0f (true 2000000)")
      require(math.abs(u - 8000000) / 8000000.0 < 0.05, s"union off: $u")
      require(math.abs(i - 2000000) / 2000000.0 < 0.10, s"inter off: $i")
    }
    // OPTIMIZE ZORDER at table scale: 1M rows / 30 day-partitions with
    // per-file value ranges spanning the whole domain (append layout);
    // after the z-ordered rewrite a 2% value slice must skip >= half
    // the files from log metadata alone, and the skipping read must
    // return exactly the predicate's rows.
    timed("txlog OPTIMIZE ZORDER: 1M rows / 30 partitions, 2% value-slice skipping") {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder-probe").toString
      val st = new graft.store.TimeseriesStore(spark, dir, backend = "txlog")
      val day0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      st.save("f", spark.range(1000000L).select(
        timestamp_millis(lit(day0) + (col("id") % 30L) * 86400000L +
          expr("(id div 30L) % 86400L") * 1000L).as("time"),
        timestamp_millis(lit(day0) + col("id")).as("created_time"),
        (((col("id") * 2654435761L) % 50000L).cast("double") / 100.0).as("value")))
      val retired = st.optimizeZorder("f", targetBytes = 256L * 1024)
      val live = st.candidateFilesForValueRange("f", 0.0, 500.0)
      val sliced = st.candidateFilesForValueRange("f", 100.0, 110.0)
      val hits = st.readValueRange("f", 100.0, 110.0).count()
      println(s"[probe]   retired $retired files; slice hit ${sliced.size}/${live.size} files; $hits rows")
      require(sliced.size * 2 <= live.size,
        s"z-order skipping too weak: ${sliced.size}/${live.size}")
      require(hits == spark.range(1000000L)
        .filter((((col("id") * 2654435761L) % 50000L).cast("double") / 100.0)
          .between(100.0, 110.0)).count())
    }
    // Containment dedup at corpus scale: 1M docs x 24 shingle digests
    // drawn zipf-ish from a 3M-gram universe, so grams span df=1 up to
    // heavy boilerplate; the maxDf=64 cap bounds the postings self-join
    // at maxDf * |index| candidates however the df tail is shaped.
    timed("containmentPairs: 1M docs x 24 shingles, maxDf=64 inverted index") {
      val nd = 1000000L
      val docs = spark.range(nd).select(col("id").as("doc_id"),
        transform(sequence(lit(0), lit(23)),
          j => pmod(hash(col("id") * 31 + j).cast("long") *
            hash(col("id") + j * 7919).cast("long"), lit(3000000L))).as("sh"))
      val pairs = graft.functions.SimilarityOps.containmentPairs(
        docs, "doc_id", "sh", minContainNum = 4, minContainDen = 5, maxDf = 64)
      println(s"[probe]   containment pairs: ${pairs.count()}")
    }
    // Market-basket rules at fact-table scale: 10M lines / 2M baskets x
    // ~5 items from a 100k-item catalog — candidates are linear in
    // baskets (bounded width), pair counts combine map-side.
    timed("coOccurrence: 10M lines, 2M baskets, 100k items") {
      val lines = spark.range(10000000L).select(
        (col("id") % 2000000L).as("bk"),
        pmod(hash(col("id") * 2654435761L), lit(100000)).cast("long").as("it"))
      val rules = graft.functions.Associations.coOccurrence(lines, "bk", "it", minCo = 3L)
      println(s"[probe]   rules at minCo=3: ${rules.count()}")
    }
    // Rank statistics at 20M rows: the dictionary compression is the
    // whole story — AUC/Gini/KS collapse the scan to <= 40k distinct
    // cents buckets, so the rank walk is metadata-sized at any corpus.
    timed("rank stats: AUC + Gini + KS over 20M rows, 40k-value dictionary") {
      val ev = spark.range(20000000L).select(
        (col("id") % 8).cast("string").as("k"),
        pmod(hash(col("id")), lit(40000)).cast("long").as("v"),
        (col("id") % 5 === 0).as("pos"),
        (col("id") % 2 === 0).as("ref"))
      val auc = graft.functions.Eval.aucExact(ev, col("pos"), col("v")).head.getDouble(2)
      val gin = graft.functions.Eval.gini(ev, "k", col("v")).count()
      val ks = graft.functions.Drift.ksCompare(ev, "k", col("v"), col("ref")).count()
      println(f"[probe]   auc=$auc%.4f gini_keys=$gin ks_keys=$ks")
    }
    // CUSUM + ACF on the pre-aggregated grid: 20M raw events collapse
    // to 1000 keys x ~720 hours before any sequential fold or lag join
    // touches them — the recurrence/lag cost is calendar-sized.
    timed("cusum + acf: 20M events -> 1000 keys x 720-hour grids") {
      // hx must be INDEPENDENT of the key residue: id%1000 and id%720
      // share gcd 40, which would space each key's hours 40 apart and
      // leave lag 1 with zero aligned pairs
      val hours = spark.range(20000000L).select(
        (col("id") % 1000).cast("string").as("k"),
        ((col("id") / 1000).cast("long") % 720).as("hx"),
        pmod(hash(col("id")), lit(10000)).cast("long").as("cents"))
        .groupBy(col("k"), col("hx")).agg(sum(col("cents")).as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mu = hours.groupBy(col("k"))
        .agg((sum(col("x")).cast("double") / count(lit(1))).as("mu"))
      val cs = TimeseriesOps.cusum(
        hours.join(broadcast(mu), Seq("k")).select(col("k"), col("hx"),
          col("x").cast("double").as("xv"), col("mu")),
        keyCol = "k", orderCol = "hx", valueCol = "xv", targetCol = "mu",
        slack = 100.0).count()
      val ac = TimeseriesOps.acf(hours, keyCol = "k", orderCol = "hx",
        valueCol = "x", lags = Seq(1, 2, 3, 24)).count()
      hours.unpersist(blocking = false)
      println(s"[probe]   cusum keys=$cs acf slices=$ac")
    }
    // Experimentation readout end-to-end: the corpus is touched ONCE
    // (per-user hash-agg with map-side combine); assignment is a pure
    // md5 expression fused into that agg's project, CUPED/Welch close
    // over 1-row broadcast scalars and the lift table over the 40k-row
    // score dictionary — so the whole readout is corpus-scan-bound and
    // the downstream never re-shuffles anything user-sized.
    timed("experiment readout: 50M events -> 5M users, assign+CUPED+Welch+lift") {
      val perUser = spark.range(50000000L).select(
          (col("id") % 5000000L).as("u"),
          pmod(hash(col("id")), lit(10000)).cast("long").as("cents"),
          (col("id") % 2 === 0).cast("int").as("pre"))
        .groupBy(col("u"))
        .agg(sum(col("cents") * col("pre")).as("x"),
          sum(col("cents") * (lit(1) - col("pre"))).as("y"))
        .withColumn("variant",
          graft.functions.Experiment.assignVariant(col("u"), "probe"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cu = graft.functions.Experiment.cuped(perUser, "variant", "x", "y")
        .collect()
      val t = graft.functions.Experiment.welchT(perUser, "variant", "y")
        .head.getDouble(5)
      val lift = graft.functions.Eval.liftTable(
        perUser, col("variant") === "treatment", col("y"), buckets = 20).count()
      perUser.unpersist(blocking = false)
      println(f"[probe]   arms=${cu.length} t=$t%.4f lift_rows=$lift")
    }
    // Naive Bayes at corpus scale: training is one (class, token)
    // hash-agg over the exploded corpus; inference re-joins tokens on
    // the vocabulary key fanned by the |classes|-row broadcast. The
    // probe's corpus is 1M docs x 20 tokens from a 100k-type synthetic
    // vocabulary with 5 class-skewed distributions — the work profile
    // (2 shuffles keyed on the token dictionary + 1 doc-keyed agg) is
    // what a 100 TB lang/quality classifier pass runs.
    timed("NB classifier: 1M docs x 20 tokens, 100k vocab, 5 classes") {
      // 25% of positions draw from a 20k-type class-private block, the
      // rest from a 100k-type shared block — separable but noisy, like
      // a language-id corpus
      val docs = spark.range(1000000L).select(
        col("id").as("doc_id"),
        concat(lit("c"), (col("id") % 5).cast("string")).as("label"),
        transform(sequence(lit(1), lit(20)), i =>
          concat(lit("t"),
            when(pmod(hash(col("id") * 31 + i), lit(4)) === 0,
              (col("id") % 5) * 20000 + pmod(hash(col("id") * 17 + i), lit(20000)))
              .otherwise(pmod(hash(col("id") * 31 + i), lit(100000)) + 100000)
              .cast("string"))).as("toks"))
      val out = graft.functions.NbClassifier.classify(
        docs, "doc_id", "label", col("toks"))
      val acc = out.agg(
        avg(when(col("label") === col("pred"), 1.0).otherwise(0.0))).head.getDouble(0)
      println(f"[probe]   self-accuracy=$acc%.3f")
      // classify pins its 20M-row token frame — sweep it so the next
      // probe's timings aren't skewed by resident cache (Bench does
      // the same between gates)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // SemDeDup at corpus scale: k MUST grow with the corpus — k=256
    // over these 1M vectors measured 195 s (≈ 4k rows/cell, ~2e9
    // within-cell pairs); k=4096 collapses the pair volume 256×. Flat
    // assignment at that k is the mapPartitions argmax loop against
    // the driver-collected codebook (pruneWithCentroids) — an n×k row
    // fan-out or a k-wide literal expression both fall over first.
    // Corpus: distinct directions + 1% planted scaled duplicates; the
    // prune must drop ≈ the planted 1%.
    timed("SemDeDup: 1M x 16-dim vectors, 4096 cells, tau=0.999 prune") {
      val dupOf = when(col("id") >= 990000L, col("id") - 990000L).otherwise(col("id"))
      // near-copies perturb by 0.1% — big enough to be distinct rows,
      // small enough to keep the copy in its original's cell (an
      // unnormalized 2x scale can cross a negHalfDist cell boundary)
      val scale = when(col("id") >= 990000L, 1.001).otherwise(1.0)
      val vecs = spark.range(1000000L).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(16)), i =>
          pmod(hash(dupOf * 131 + i), lit(1000)).cast("double") * scale).as("v"))
      val cents = spark.range(4096L).select(
        col("id").as("c_id"),
        transform(sequence(lit(1), lit(16)), i =>
          pmod(hash(col("id") * 131 + i), lit(1000)).cast("double")).as("cv"))
      val kept = graft.functions.SemDedup.pruneWithCentroids(
          vecs, "vec_id", "v", cents, "c_id", "cv", tau = 0.999)
        .filter(col("kept")).count()
      // multi-probe closes the single-assignment boundary miss: a
      // planted near-copy whose perturbation crossed a cell boundary
      // is invisible to nProbe=1 but pairs through its second cell
      // sweep the nProbe=1 run's pinned assigned frame before timing
      // the nProbe=2 leg, and both after
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val kept2 = graft.functions.SemDedup.pruneWithCentroids(
          vecs, "vec_id", "v", cents, "c_id", "cv", tau = 0.999, nProbe = 2)
        .filter(col("kept")).count()
      println(s"[probe]   kept=$kept (nProbe=1) -> $kept2 (nProbe=2) of 1000000 (990000 distinct)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // Wide pivot alignment at production WIDTH: 1,000 single-valued
    // series (1,000 rows each = 1M input rows) must take the
    // union+pivot path — zero joins however many series — and align
    // in one hash exchange plus the fill/sort pair, not 999 chained
    // full-outer joins. What this actually stresses at width 1,000 is
    // the DRIVER side: a 1,000-relation union, a 1,000-bucket
    // PivotFirst aggregate and a 1,001-column fill — the analysis/
    // codegen costs a narrow spec never sees.
    // The composed retrieval stack at corpus scale: candidate
    // ACCOUNTING is the point — the probe must prove the coarse
    // quantizer actually prunes (candidates << queries x corpus) and
    // that the pruned ADC pass finishes in seconds, because at 100 TB
    // the exhaustive term is what makes brute-force impossible.
    timed("IVF+PQ retrieval: 1M x 32-dim corpus, 128 cells, nProbe=4, 64 queries") {
      val dim = 32
      def vecs(ids: org.apache.spark.sql.DataFrame, salt: Int) = ids.select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), i =>
          pmod(hash(col("id") * salt + i), lit(1000)).cast("double")).as("v"))
      val corpus = vecs(spark.range(1000000L).toDF("id"), 131)
      val queries = vecs(spark.range(64L).toDF("id"), 977)
      val t0 = System.nanoTime()
      val ivf = graft.functions.AnnIvf.buildFixed(corpus, "v", idCol = "vec_id", k = 128)
      val pq = graft.functions.AnnPq.buildFixed(corpus, "v", idCol = "vec_id", m = 8, k = 16)
      val encoded = ivf.assigned.select(col("vec_id"), col("cell"),
        graft.functions.AnnPq.encodeExpr(pq, col("v")).as("code"))
        .localCheckpoint() // the index artifact a real system persists ONCE
      println(f"[probe]   index build (assign+encode 1M): ${(System.nanoTime() - t0) / 1e9}%.1fs")
      // candidate accounting: pruning must be real, not aspirational
      val cellSizes = encoded.groupBy("cell").count()
      val probed = queries.select(col("vec_id").as("qid"),
        explode(graft.functions.AnnIvf.probeCells(ivf, col("v"), 4)).as("cell"))
      val cands = probed.join(cellSizes, "cell").agg(sum("count")).head().getLong(0)
      val full = 64L * 1000000L
      println(s"[probe]   ADC candidates: $cands of $full exhaustive (${cands * 100 / full}%)")
      require(cands < full / 10, s"coarse probe did not prune: $cands candidates")
      val t1 = System.nanoTime()
      val top = graft.functions.AnnIvfPq.query(ivf, pq, encoded, queries,
        qIdCol = "vec_id", embCol = "v", cIdCol = "vec_id", codeCol = "code",
        topK = 10, nProbe = 4)
      val n = top.count()
      println(f"[probe]   query 64 x top-10: ${(System.nanoTime() - t1) / 1e9}%.1fs, $n rows")
      require(n == 640L, s"expected 640 result rows, got $n")
      // the SHIPPED configuration: ADC shortlist + exact full-vector
      // re-rank (AnnIvfPq.queryRerank). The accounting claim of the
      // rerank stage is that stage 2 touches |queries| x shortlist
      // rows (64 x 50 = 3,200 here — driver-trivial) and the
      // full-vector fetch is a semi-join point read against the
      // corpus, never a rescan of the 1M vectors
      val t2 = System.nanoTime()
      val reranked = graft.functions.AnnIvfPq.queryRerank(ivf, pq, encoded,
        corpus.select(col("vec_id"), col("v")), queries,
        qIdCol = "vec_id", embCol = "v", cIdCol = "vec_id", codeCol = "code",
        topK = 10, shortlist = 50, nProbe = 4)
      val nr = reranked.count()
      println(f"[probe]   rerank 64 x top-10 (shortlist 50): ${(System.nanoTime() - t2) / 1e9}%.1fs, $nr rows")
      require(nr == 640L, s"expected 640 reranked rows, got $nr")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    timed("alignJoin pivot: 1000 series x 1000 ts (1M rows), no join chain") {
      // one partition per series (spark.range's default 32 would make
      // the union stage 32,000 micro-tasks — measured 582 s of pure
      // task overhead; a real feature is 1+ parquet splits, so 1,000
      // series ≈ 1,000 union tasks is the representative shape)
      val series = (0 until 1000).map { i =>
        spark.range(0, 1000, 1, 1).select(
          timestamp_millis(lit(base) + col("id") * 3600000L).as("time"),
          (col("id") + lit(i)).cast("double").as(s"f$i"))
      }
      // stage split: how much is the union+pivot itself vs the
      // 1,000-column fill machinery that follows it
      val t0 = System.nanoTime()
      val names = (0 until 1000).map(i => s"f$i")
      val pivoted = TimeseriesOps.unionBalanced(series.zip(names).map { case (df, n) =>
        df.select(col("time"), lit(n).as("__series"), col(s"`$n`").as("__value"))
      }).groupBy(col("time")).pivot("__series", names).agg(max(col("__value")))
      pivoted.count()
      println(f"[probe]   union+pivot alone: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      val out = TimeseriesOps.alignJoin(series)
      // the ONLY join allowed is ffill's one-row-per-bucket broadcast
      // seed; a full-outer node means the N-1 join chain came back
      val joins = out.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType.sql
      }
      require(!joins.exists(_.contains("FULL")) && joins.size <= 1,
        s"wide align fell back to a join chain (${joins.mkString(",")})")
      val rows = out.count()
      require(rows == 1000L, s"expected 1000 aligned rows, got $rows")
      val exchanges = out.queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
      println(s"[probe]   0 joins, $exchanges exchanges, ${series.length + 1} output cols")
    }
    timed("alignJoinWide: 10000 series x 100 ts, blocked plans (optimizer headroom)") {
      // 10x the 1,000-series probe in WIDTH — the plan-machinery
      // dimension a user hits first. MEASURED LIMIT that forced the
      // blocked operator: a single alignJoin plan at 10k output
      // columns pins the driver single-core in Catalyst
      // (RemoveRedundantAliases, then ColumnPruning — AttributeSet
      // arithmetic, jstack-confirmed) for >12 minutes before this
      // probe was killed, vs seconds at 1k columns. alignJoinWide
      // bounds every plan to blockSize columns (spine + per-block
      // pivot + checkpoint cut + 1:1 block joins), so 10k features
      // plan in seconds-per-block regardless of total width.
      val k = 10000
      val series = (0 until k).map { i =>
        spark.range(0, 100, 1, 1).select(
          timestamp_millis(lit(base) + col("id") * 3600000L).as("time"),
          (col("id") + lit(i)).cast("double").as(s"f$i"))
      }
      val out = TimeseriesOps.alignJoinWide(series, blockSize = 1024)
      val rows = out.count()
      require(rows == 100L, s"expected 100 aligned rows, got $rows")
      require(out.columns.length == k + 1,
        s"expected ${k + 1} output columns, got ${out.columns.length}")
      // spot-check fill correctness at the far right edge of the width
      val last = out.select(col("time"), col("f9999"))
        .orderBy(col("time")).collect()
      require(last.length == 100 && last.last.getDouble(1) == 99.0 + 9999.0,
        s"f9999 tail mismatch: ${last.last}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    timed(s"capByKey hot-key frequency cap over $n rows") {
      // 5 keys, one owning 60% of the corpus: the shape where the
      // naive per-key window funnels 6M rows through ONE task's sort
      // buffer. The claim under test is the MEMORY bound, not local
      // CPU (see the capByKey scaladoc's cost model): the exact-rank
      // window's input must be ~cap x margin per key regardless of
      // skew, and the result must equal the naive window bit-for-bit.
      val skewed = df.select(
        when(col("value") < 600, lit("hot")).otherwise(
          concat(lit("k"), (col("value") % 4).cast("string"))).as("k"),
        col("created_time").cast("long").as("id"))
      val t0 = System.nanoTime()
      val fast = graft.ops.Scale.capByKey(skewed, "k", "id", cap = 1000)
      val fastN = fast.count()
      val fastSecs = (System.nanoTime() - t0) / 1e9
      // the bound: reconstruct the candidate set the window saw and
      // measure its hottest key — 6M raw rows must have become <= 8k
      val P = 2147483647L
      val counts = skewed.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val hotThr = math.min(P, math.ceil(P.toDouble * 1000 * 4.0 / counts("hot")).toLong)
      val hotCand = skewed.filter(col("k") === "hot" &&
        (col("id") * 2654435761L) % P <= hotThr).count()
      require(hotCand <= 8000 && hotCand >= 1000,
        s"hot-key window input $hotCand outside the [cap, 2 x cap x margin] bound")
      val t1 = System.nanoTime()
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
        .orderBy(((col("id") * 2654435761L) % P), col("id"))
      val naive = skewed.withColumn("__rk",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rk") <= 1000).drop("__rk")
      val naiveN = naive.count()
      val naiveSecs = (System.nanoTime() - t1) / 1e9
      require(fastN == naiveN, s"row counts diverged: $fastN vs $naiveN")
      val diff = fast.except(naive).count() + naive.except(fast).count()
      require(diff == 0, s"capByKey diverged from the naive window by $diff rows")
      println(f"[probe]   window input for the 6M-row hot key: $hotCand rows " +
        f"(bound 8k); capByKey $fastSecs%.1fs vs naive $naiveSecs%.1fs at 10M " +
        "(naive wins CPU while the hot key fits one task — see the cost model)")
    }
    timed("delta sync: 1M-row/90-partition export, then a 1%-delta sync") {
      // the claim under test: syncSnapshotDelta moves the DELTA, never
      // the table — a 1% append + a 2-partition delete must cost a
      // small fraction of the initial export, and the Delta commit it
      // writes must name only the changed files
      val dir = java.nio.file.Files.createTempDirectory("graft-dlsync-probe").toString
      val st = new graft.store.TimeseriesStore(spark, s"$dir/wh", backend = "txlog")
      val rows = spark.range(1000000).select(
        timestamp_millis(lit(base) + (col("id") % 90) * 86400000L +
          (col("id") / 90).cast("long") * 7000L).as("time"),
        (col("id") % 1000).cast("double").as("value"))
      st.save("t", rows)
      val t0 = System.nanoTime()
      st.exportSnapshotDelta("t", s"$dir/delta")
      val exportSecs = (System.nanoTime() - t0) / 1e9
      // the day's increment: 10k new rows on fresh partitions
      st.save("t", spark.range(10000).select(
        timestamp_millis(lit(base) + 91L * 86400000L + col("id") * 8000L).as("time"),
        col("id").cast("double").as("value")))
      st.deleteWhere("t", col("time") < new Timestamp(base + 2L * 86400000L))
      val t1 = System.nanoTime()
      st.syncSnapshotDelta("t", s"$dir/delta")
      val syncSecs = (System.nanoTime() - t1) / 1e9
      val commit1 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/delta/_delta_log/00000000000000000001.json")), "UTF-8")
      val adds = commit1.linesIterator.count(_.contains("\"add\""))
      val removes = commit1.linesIterator.count(_.contains("\"remove\""))
      val n2 = graft.store.DeltaBridge.read(spark, s"$dir/delta").count()
      println(f"[probe]   export $exportSecs%.1fs; sync $syncSecs%.1fs " +
        f"(${exportSecs / syncSecs}%.1fx cheaper), commit1: $adds adds/$removes removes, " +
        s"live rows $n2")
      require(syncSecs < exportSecs,
        "sync must be cheaper than re-export at a 1% delta")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    timed("bloom point-lookup file skipping: 1M rows / 90 daily files") {
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom-probe").toString
      val st = new graft.store.TimeseriesStore(spark, dir, backend = "txlog")
      // keys interleave across every file BY CONSTRUCTION (id mod),
      // so min/max stats can never prune a probe — the bloom's case
      st.save("t", spark.range(4).select(
        timestamp_millis(lit(base) + col("id") * 60000L).as("time"),
        col("id").cast("double").as("value")))
      st.evolveSchema("t", st.tableSchema("t").get
        .add("user_id", org.apache.spark.sql.types.LongType))
      st.declareBloomIndex("t", "user_id")
      val t0 = System.nanoTime()
      st.save("t", spark.range(1000000L).select(
        timestamp_millis(lit(base) + (col("id") % 90L) * 86400000L +
          (col("id") / 90L).cast("long") * 7000L).as("time"),
        col("id").cast("double").as("value"),
        // ~11k distinct keys per file, every key in exactly one file
        // of the 90 — the needle a full scan would hunt everywhere
        (col("id") % 90000L).as("user_id")))
      val writeSecs = (System.nanoTime() - t0) / 1e9
      val live = new graft.store.TxLog(
        spark.sessionState.newHadoopConf(), s"$dir/feature/t").snapshot().size
      val cand = st.candidateFilesForKey("t", "user_id", "12345").size
      val t1 = System.nanoTime()
      val hits = st.readKeyEquals("t", "user_id", 12345L).count()
      val lookupSecs = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val full = st.read("t").filter(col("user_id") === 12345L).count()
      val scanSecs = (System.nanoTime() - t2) / 1e9
      println(f"[probe]   write+bloom $writeSecs%.1fs; probe prunes $live files -> $cand " +
        f"candidates; lookup $lookupSecs%.2fs vs full filter $scanSecs%.2fs, rows $hits/$full")
      require(hits == full && cand < live / 4,
        s"bloom probe must prune most of $live files (kept $cand) and stay exact")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }

    timed("LogReg classifier: 3 epochs over 1M synthetic docs") {
      // disjoint vocabularies -> separable; the probe certifies the
      // epoch-cost shape (one persisted feature pass + K agg rounds)
      // and that the fit separates at scale, not just at spec size
      val docs = spark.range(1000000L).select(
        col("id").as("doc_id"),
        (col("id") % 2L === 0L).as("good"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(when(col("id") % 2L === 0L, lit("g")).otherwise(lit("j")),
            pmod(col("id") * (j + 1), lit(500)))): _*).as("text"))
      val t0 = System.nanoTime()
      val m = graft.functions.LogReg.train(
        docs, "doc_id", graft.functions.TextOps.tokens(col("text")),
        col("good"), epochs = 3, lrate = 1.0)
      val trainSecs = (System.nanoTime() - t0) / 1e9
      val acc = m.scores
        .join(docs.select(col("doc_id"), col("good")), "doc_id")
        .select(avg(when((col("score") >= 0.5) === col("good"), 1.0).otherwise(0.0)))
        .head().getDouble(0)
      m.unpersist()
      println(f"[probe]   3 epochs $trainSecs%.1fs, in-sample accuracy $acc%.3f")
      require(acc > 0.9, s"1M-doc separable fit must separate: acc=$acc")
    }

    timed("DSIR weights over 1M synthetic docs") {
      // 20-word docs over a 4k vocabulary; the target slice (10%)
      // skews to the low half of the vocabulary, so weights separate
      val vocabSize = 4000
      val docs = spark.range(1000000L).select(
        col("id").as("doc_id"),
        (col("id") % 10L === 0L).as("tgt"),
        concat_ws(" ", (0 until 20).map(j =>
          concat(lit("w"), when(col("id") % 10L === 0L,
            pmod(col("id") * (2 * j + 1), lit(vocabSize / 2)))
            .otherwise(pmod(col("id") * (2 * j + 1), lit(vocabSize))))): _*).as("text"))
      val w = graft.functions.Dsir.weights(
        docs, "doc_id", graft.functions.TextOps.tokens(col("text")), col("tgt"))
      val sep = w.join(docs.select("doc_id", "tgt"), "doc_id")
        .groupBy("tgt").agg(avg("weight").as("mw")).collect()
        .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      println(f"[probe]   mean weight target=${sep(true)}%.3f vs raw=${sep(false)}%.3f")
      require(sep(true) > sep(false), "target slice must outscore the raw pool")
    }

    // Misra-Gries heavy hitters vs the naive full groupBy at a 1M-key
    // dictionary: the head (3 keys ~ 45%) must come back exact while
    // the candidate shuffle carries ≤ partitions × capacity keys
    // instead of the million-key dictionary.
    timed("heavyHitters: 10M rows, 1M-key Zipf-ish dictionary, 3-key head") {
      val hh = spark.range(10000000L).select(
        when(col("id") % 5L === 0L, lit("hot0"))
          .when(col("id") % 5L === 1L, lit("hot1"))
          .when(col("id") % 10L === 2L, lit("hot2"))
          .otherwise(concat(lit("t"), pmod(col("id") * 2654435761L, lit(1000000L))))
          .as("k"))
      val got = graft.ops.Scale.heavyHitters(hh, "k", capacity = 19, minShare = 0.05)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(got == Map("hot0" -> 2000000L, "hot1" -> 2000000L, "hot2" -> 1000000L),
        s"heavy-hitter head diverged: $got")
      val naive = hh.groupBy("k").count()
        .filter(col("count") > 500000L).count()
      require(naive == 3L, "naive cross-check diverged")
    }

    // Distributed Lloyd at 10M rows: 3 rounds of map-side argmin +
    // k-key hash-agg; the driver holds k centroids, the shuffle holds
    // k×(d+1) partials per task. Three planted integer bands must come
    // back as three clusters with exact sizes.
    timed("kmeans fitDistributed: 10M rows x 2 features, k=3, 3 iters") {
      val km = spark.range(10000000L).select(
        col("id").as("rid"),
        (col("id") % 3L * 1000L + col("id") % 7L).cast("long").as("x1"),
        (col("id") % 3L * 5000L + col("id") % 11L).cast("long").as("x2"))
      val res = graft.functions.Lloyd
        .fitDistributed(km, "rid", Seq("x1", "x2"), k = 3, iters = 3)
        .collect().map(r => r.getLong(1)).sorted
      require(res.sameElements(Array(3333333L, 3333333L, 3333334L)),
        s"planted bands not recovered: ${res.mkString(",")}")
    }

    // Exact substring dedup at 1M docs: 10% of docs carry one shared
    // 8-token boilerplate run; every copy but the canonical first must
    // lose exactly those 8 tokens, nothing else. ~24M gram postings
    // shuffle as digests; one duplicated digest family joins back.
    timed("substringDedup: 1M docs x ~24 tokens, 100k boilerplate copies") {
      val docs = spark.range(1000000L).select(
        col("id").as("doc_id"),
        // filler tokens are id-INJECTIVE (stride 17 > 2x8 positions), so
        // no accidental cross-doc gram can dup — a modular vocab here
        // makes whole residue classes share their filler grams and
        // breaks the closed-form count
        concat(
          transform(sequence(lit(0), lit(7)),
            j => concat(lit("w"), col("id") * 17L + j)),
          when(col("id") % 10L === 0L,
            split(lit("the quick brown fox jumps over lazy dogs"), " "))
            .otherwise(array().cast("array<string>")),
          transform(sequence(lit(0), lit(7)),
            j => concat(lit("v"), col("id") * 17L + j)))
          .as("tk"))
      val removed = graft.functions.TextOps
        .substringDedup(docs, "doc_id", "tk", w = 8)
        .agg(sum("n_removed")).collect()(0).getLong(0)
      require(removed == 8L * 99999L,
        s"expected ${8L * 99999L} removed boilerplate tokens, got $removed")
    }

    timed("txlog contention: 8 foreign writers x 25 commits + compactor, zero lost") {
      // Optimistic concurrency under REAL parallel committers: each
      // writer thread gets its OWN TxLog instance (a fresh instance =
      // a foreign writer process — no shared knownHighWater, no shared
      // JVM lock; everything serializes through the no-overwrite
      // rename alone), racing pure appends while one compactor races
      // remove+add rewrites of files it picked BEFORE its commit
      // attempt. Claims under test: no lost commits (every returned
      // version unique), a linear history (versions contiguous from
      // 0), and no dangling state (final live set == appended minus
      // compacted-away plus rewrite outputs, exactly).
      val dir = java.nio.file.Files.createTempDirectory("txcontend").toString
      val hc = spark.sessionState.newHadoopConf()
      val writers = 8
      val commitsEach = 25
      val versions = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val compacted = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val rewrites = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      var compactorConflicts = 0
      // daemon threads: a failed assertion inside a Runnable must fail
      // the probe, not leave non-daemon workers pinning the JVM open
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        writers + 1,
        (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
      val tasks = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val log = new graft.store.TxLog(hc, dir) // foreign writer
            (0 until commitsEach).foreach { i =>
              val p = s"partition=p$w/f$w-$i.parquet"
              val v = log.commit(Seq(graft.store.TxAdd(p, s"p$w")))
              require(v >= 0 && versions.add(v), s"version $v returned twice — lost commit")
              appended.add(p)
            }
          }
        })
      } :+ pool.submit(new Runnable {
        def run(): Unit = {
          val log = new graft.store.TxLog(hc, dir)
          (0 until 10).foreach { k =>
            Thread.sleep(20)
            // pick victims from a snapshot taken BEFORE the attempt —
            // the stale-removes validation path is what's under test
            val live = log.snapshot(None).map(_.path)
              .filterNot(p => p.contains("/rw-") || compacted.contains(p))
            if (live.size >= 2) {
              val victims = live.take(2)
              val out = s"partition=rw/rw-$k.parquet"
              try {
                val v = log.commit(
                  Seq(graft.store.TxAdd(out, "rw")),
                  removes = victims.map(graft.store.TxRemove(_)))
                require(v >= 0 && versions.add(v), s"compactor version $v duplicated")
                victims.foreach(compacted.add)
                rewrites.add(out)
              } catch {
                // racing a concurrent retirement of the same victim is
                // the DESIGNED loser outcome (staged files vacuumable)
                case _: java.util.ConcurrentModificationException =>
                  compactorConflicts += 1
              }
            }
          }
        }
      })
      tasks.foreach(_.get())
      pool.shutdown()
      import scala.jdk.CollectionConverters._
      val check = new graft.store.TxLog(hc, dir)
      val latest = check.latestVersion()
      val vs = versions.iterator().asScala.toSeq.sorted
      require(vs == (0L to latest).toSeq,
        s"non-linear history: ${vs.size} committed versions, latest $latest")
      require(vs.size == writers * commitsEach + rewrites.size,
        s"lost commits: ${vs.size} versions for ${writers * commitsEach} appends + ${rewrites.size} rewrites")
      val live = check.snapshot(None).map(_.path).toSet
      val expected = appended.iterator().asScala.toSet --
        compacted.iterator().asScala.toSet ++ rewrites.iterator().asScala.toSet
      require(live == expected,
        s"dangling state: ${live.size} live vs ${expected.size} expected " +
          s"(extra=${(live -- expected).take(3)}, missing=${(expected -- live).take(3)})")
      println(s"[probe]   ${vs.size} commits linear 0..$latest, " +
        s"${live.size} live files exact, $compactorConflicts compactor conflicts (designed losers)")
    }

    // a silent filter miss would look like an instant successful run —
    // say so loudly instead (labels are case-sensitive substrings)
    if (ran == 0)
      only.foreach(f => println(s"[probe] WARNING: no probe label contains '$f' — nothing ran"))
    spark.stop()
  }
}
