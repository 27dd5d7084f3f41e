package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Corpus-scale soak for the production dedup family: synthesize N
  * documents (deterministic hash-derived vocabulary — no RNG — with ~5%
  * planted duplicate pairs), then run the full xxhash64 pipeline
  * end-to-end: shingles -> minhash signatures -> banded LSH (capped
  * degenerate buckets) -> candidate pairs -> connected components ->
  * drop non-representatives. Prints one JSON line with docs/sec.
  *
  * This is the scale check the sf0.1 driver bench can't give: hundreds
  * of thousands of documents through exactly the operators a 100 TB
  * corpus would use, verifying the shuffle volume stays signatures-only
  * and the planted duplicates are the ones that disappear.
  *
  * Phases, one JSON line each (later phases below reuse the same
  * corpus: span scrub, banding quality, and cluster-aware governance —
  * leak-safe split + keep-best canonical — each against closed-form
  * planted answers):
  *  1. one-shot dedup of the full corpus (shingle+hash everything);
  *  2. the nightly incremental shape — 80% of the corpus pre-exists as a
  *     signature store, 20% arrives as a batch: only the batch is
  *     shingled+hashed and only store rows in batch-touched buckets
  *     shuffle, with cross-boundary planted dups recognized through the
  *     store;
  *  3. compaction — recluster the ENTIRE corpus from stored signatures
  *     alone; its wall-clock vs phase 1 is the measured cost of skipping
  *     the shingle+hash stage;
  *  4. the PRODUCTION streaming sink — the same corpus arriving as
  *     JSON-lines waves through [[graft.stream.StreamingCorpusDedup]]
  *     into a transactional warehouse (one catalog commit per
  *     micro-batch, checkpoint restart between waves), proving the
  *     transact/appendIfAbsent machinery holds at corpus scale and the
  *     maintained corpus still equals the one-shot result.
  *
  * Usage: `runMain graft.DedupBench [nDocs]` (default 200000).
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // every 20th doc copies its predecessor -> n/20 planted dup pairs;
    // all other docs draw 50 tokens from a 9973-word hash vocabulary
    val seed = when(col("id") % 20 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(n).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(49)),
          j => concat(lit("w"), pmod(xxhash64(seed, j), lit(9973)))), " ")
          .as("text"))
      .cache()
    docs.count()                       // exclude synthesis from the timing

    val t0 = System.nanoTime()
    val survivors = Dedup.dedupCorpus(docs,
      Dedup.minhashCandidates(docs, numHashes = 32, bands = 8, k = 3,
        threshold = 0.5)).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val expected = n - (n - 1) / 20    // planted dups must be the drops
    println(f"""{"phase":"one_shot","docs":$n,"survivors":$survivors,"expected":$expected,"sec":$sec%.2f,"docs_per_sec":${(n / sec).toLong}}""")
    assert(survivors == expected, s"survivors=$survivors expected=$expected")

    // phase 2: incremental — the store pre-exists (hashed once, outside
    // the timing); the batch is hashed once inside it
    val cut = n * 4 / 5
    val store = Dedup.minhashTable(docs.filter(col("doc_id") < cut),
      numHashes = 32, k = 3).cache()
    store.count()
    val batch = docs.filter(col("doc_id") >= cut)
    val batchN = n - cut
    val t1 = System.nanoTime()
    val batchSigs = Dedup.minhashTable(batch, numHashes = 32, k = 3).cache()
    val edges = Dedup.incrementalMinhashCandidatesFromSigs(store, batchSigs,
      numHashes = 32, bands = 8, threshold = 0.5)
    val batchSurvivors = Dedup.dedupCorpus(batch, edges).count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    // every 20th id in the batch copies its predecessor and must drop —
    // including the boundary doc whose original lives only in the store
    val expectedBatch = batchN - (((n - 1) / 20) - ((cut - 1) / 20))
    println(f"""{"phase":"incremental","store_docs":$cut,"batch_docs":$batchN,"survivors":$batchSurvivors,"expected":$expectedBatch,"sec":$sec2%.2f,"batch_docs_per_sec":${(batchN / sec2).toLong}}""")
    assert(batchSurvivors == expectedBatch,
      s"batch survivors=$batchSurvivors expected=$expectedBatch")

    // phase 3: compaction reclusters ALL n docs from stored signatures —
    // no shingling, no text; the speedup vs phase 1 is the no-re-hash win
    val allSigs = store.unionByName(batchSigs)
    val t2 = System.nanoTime()
    val compacted = graft.llm.CorpusMaintenance.recompacted(docs, allSigs,
      numHashes = 32, bands = 8, threshold = 0.5).count()
    val sec3 = (System.nanoTime() - t2) / 1e9
    println(f"""{"phase":"compaction","docs":$n,"survivors":$compacted,"expected":$expected,"sec":$sec3%.2f,"docs_per_sec":${(n / sec3).toLong}}""")
    assert(compacted == expected, s"compacted=$compacted expected=$expected")

    // phase 4: the streaming sink end-to-end — arrival waves land as
    // JSON-lines files, each micro-batch dedups incrementally against the
    // warehouse store and commits corpus + signatures + the high-water
    // record as ONE catalog transaction; the stream restarts from its
    // checkpoint between waves like a nightly job would
    import java.nio.file.Files
    val whRoot = Files.createTempDirectory("dedupbench-wh")
    val landing = Files.createTempDirectory("dedupbench-landing")
    val ckpt = Files.createTempDirectory("dedupbench-ckpt")
    val wh = new graft.etl.Warehouse(spark, whRoot.toString)
    val sd = new graft.stream.StreamingCorpusDedup(spark, wh,
      landing.toString, ckpt.toString)
    val waves = 5
    val t3 = System.nanoTime()
    (0 until waves).foreach { w =>
      docs.filter(col("doc_id") >= n * w / waves &&
          col("doc_id") < n * (w + 1) / waves)
        .coalesce(4).write.mode("append").json(landing.toString)
      sd.start(availableNow = true).awaitTermination()
    }
    val sec4 = (System.nanoTime() - t3) / 1e9
    val streamed = wh.read("corpus", new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")).count()
    println(f"""{"phase":"streaming_sink","docs":$n,"waves":$waves,"survivors":$streamed,"expected":$expected,"sec":$sec4%.2f,"docs_per_sec":${(n / sec4).toLong}}""")
    assert(streamed == expected, s"streamed survivors=$streamed expected=$expected")

    // phase 5: substring-level pipeline — duplicated-span detection +
    // boilerplate scrub over the same corpus. Planted copies are
    // whole-document duplicates, so exactly the 2 * nPairs docs in a
    // planted pair must carry one full-document span (tokens 0..49) and
    // scrub to empty; every other doc must pass through untouched. The
    // window-hash table is one row per corpus token, so this phase is
    // the token-level scale check (docs x 50 hashes through one shuffle).
    val nPairs = (n - 1) / 20
    val t4 = System.nanoTime()
    val spans = Dedup.dupSpans(docs, k = 8, minCount = 2)
      .agg(count(lit(1)).as("n"),
        sum(when(col("span_start") === 0 && col("span_end") === 49, 1)
          .otherwise(0)).as("full")).head()
    val scrub = Dedup.scrubSpans(docs, k = 8, minCount = 2)
      .agg(sum(when(col("n_kept") === 0, 1).otherwise(0)).as("emptied"),
        sum(col("n_kept")).as("kept")).head()
    val sec5 = (System.nanoTime() - t4) / 1e9
    println(f"""{"phase":"span_scrub","docs":$n,"span_rows":${spans.getLong(0)},"emptied":${scrub.getLong(0)},"sec":$sec5%.2f,"docs_per_sec":${(n / sec5).toLong}}""")
    assert(spans.getLong(0) == 2 * nPairs && spans.getLong(1) == 2 * nPairs,
      s"spans=$spans expected ${2 * nPairs} full-doc spans")
    assert(scrub.getLong(0) == 2 * nPairs &&
      scrub.getLong(1) == (n - 2 * nPairs) * 50,
      s"scrub=$scrub expected ${2 * nPairs} emptied docs")

    // phase 6: the candidate-quality machinery itself at corpus scale —
    // the planted pair table IS the ground truth, so the banding sweep
    // must report hits == n_true == nPairs at EVERY operating point
    // (planted copies are exact: identical text -> identical signature
    // -> same bucket under any banding, and a 2-member bucket can never
    // hit the degenerate cap). Also exercises the one-groupBy
    // pairAgreement shape over pair tables of corpus-scale cardinality.
    val t5 = System.nanoTime()
    val planted = spark.range(n)
      .filter(col("id") % 20 === 0 && col("id") > 0)
      .select((col("id") - 1).as("id_a"), col("id").as("id_b"))
    val sweep = Dedup.bandingSweep(
        Dedup.minhashTable(docs, numHashes = 32, k = 3),
        planted, Seq(4, 8, 16), numHashes = 32, threshold = 0.5)
      .orderBy("bands").collect()
    val sec6 = (System.nanoTime() - t5) / 1e9
    val candTotal = sweep.map(_.getAs[Long]("n_candidates")).sum
    println(f"""{"phase":"banding_quality","docs":$n,"settings":${sweep.length},"planted":$nPairs,"candidates_total":$candTotal,"sec":$sec6%.2f,"docs_per_sec":${(n / sec6).toLong}}""")
    sweep.foreach { r =>
      assert(r.getAs[Long]("n_true") == nPairs,
        s"bands=${r.getAs[Int]("bands")}: n_true=${r.getAs[Long]("n_true")}")
      assert(r.getAs[Long]("hits") == nPairs,
        s"bands=${r.getAs[Int]("bands")}: planted recall must be 100%, " +
          s"hits=${r.getAs[Long]("hits")} of $nPairs")
    }

    // phase 7: cluster-aware governance over the planted pair graph —
    // the split that can never leak a planted dup across the train/eval
    // boundary, and keep-best selection. Closed forms: each planted
    // (i-1, i) pair is a disjoint 2-cluster with representative i-1, so
    // (a) no cluster may straddle splits (checked DISTRIBUTED via a
    // countDistinct per cluster, no collect), (b) every doc's cluster id
    // has the closed form below, and (c) with equal-length copies the
    // canonical falls to the min id with n_members exactly 2.
    val t6 = System.nanoTime()
    val split = Dedup.leakSafeSplit(docs, planted,
      cuts = Seq("train" -> 80, "validation" -> 90), lastSplit = "test")
      .cache()
    val straddled = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    // doc i (i%20==0, i>0) joins representative i-1; everyone else —
    // including the i-1 members, who ARE the representative — keeps
    // its own id as cluster
    val expectedCluster =
      when(col("doc_id") > 0 && col("doc_id") % 20 === 0, col("doc_id") - 1)
        .otherwise(col("doc_id"))
    val misl = split.filter(col("cluster_id") =!= expectedCluster).count()
    val canon = Dedup.canonicalDocs(docs, planted,
      score = length(col("text"))).cache()
    val badCanon = canon.filter(col("canonical_id") =!= col("cluster_id") ||
      col("n_members") =!= 2).count()
    val nClusters = canon.count()
    val sec7 = (System.nanoTime() - t6) / 1e9
    split.unpersist(); canon.unpersist()
    println(f"""{"phase":"governance","docs":$n,"clusters":$nClusters,"straddled":$straddled,"mislabelled":$misl,"bad_canonical":$badCanon,"sec":$sec7%.2f,"docs_per_sec":${(n / sec7).toLong}}""")
    assert(straddled == 0, s"$straddled clusters straddle splits")
    assert(misl == 0, s"$misl docs carry a wrong cluster id")
    assert(badCanon == 0 && nClusters == nPairs,
      s"canonical: bad=$badCanon clusters=$nClusters expected=$nPairs")

    // phase 8: the STREAMING split router end-to-end at corpus scale —
    // the same corpus arrives in waves and every document is routed
    // with the assignment-stable law against the warehouse stores.
    // Closed forms: every planted (i-1, i) pair must share a split
    // (checked distributed over the full table — the leak-safety law);
    // pairs cut by a wave boundary must resolve by INHERITANCE (the
    // later member reads the earlier member's published split through
    // the store); planted clusters are homogeneous, so no row may come
    // back conflicted; and every doc gets exactly one assignment.
    val whRoot2 = Files.createTempDirectory("dedupbench-route-wh")
    val landing2 = Files.createTempDirectory("dedupbench-route-landing")
    val ckpt2 = Files.createTempDirectory("dedupbench-route-ckpt")
    val wh2 = new graft.etl.Warehouse(spark, whRoot2.toString)
    val routerCuts = Seq("train" -> 80, "validation" -> 90)
    val router = new graft.stream.StreamingSplitRouter(spark, wh2,
      landing2.toString, ckpt2.toString, routerCuts, "test")
    val t7 = System.nanoTime()
    (0 until waves).foreach { w =>
      docs.filter(col("doc_id") >= n * w / waves &&
          col("doc_id") < n * (w + 1) / waves)
        .coalesce(4).write.mode("append").json(landing2.toString)
      router.start(availableNow = true).awaitTermination()
    }
    val sec8 = (System.nanoTime() - t7) / 1e9
    val assignSchema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("cluster_id", "long").add("split", "string")
      .add("inherited", "boolean").add("n_store_splits", "long")
      .add("conflicted", "boolean")
    val routed = wh2.read("split_assign", assignSchema).cache()
    val nRouted = routed.count()
    val a = routed.select(col("doc_id").as("a_id"), col("split").as("a_split"))
    val bSide = routed
      .filter(col("doc_id") % 20 === 0 && col("doc_id") > 0)
      .select(col("doc_id").as("b_id"), col("split").as("b_split"),
        col("inherited").as("b_inh"))
    val pairRows = bSide.join(a, col("b_id") - 1 === col("a_id")).cache()
    val leaked = pairRows.filter(col("a_split") =!= col("b_split")).count()
    // wave-boundary pairs: the copy arrived a wave after its original
    val crossWave = pairRows
      .filter(pmod(col("b_id"), lit(n / waves)) === 0)
    val crossWaveNotInherited = crossWave.filter(!col("b_inh")).count()
    val nCrossWave = crossWave.count()
    val conflicted2 = routed.filter(col("conflicted")).count()
    routed.unpersist(); pairRows.unpersist()
    println(f"""{"phase":"streaming_router","docs":$n,"waves":$waves,"routed":$nRouted,"leaked_pairs":$leaked,"cross_wave_pairs":$nCrossWave,"cross_wave_not_inherited":$crossWaveNotInherited,"conflicted":$conflicted2,"sec":$sec8%.2f,"docs_per_sec":${(n / sec8).toLong}}""")
    assert(nRouted == n, s"routed=$nRouted expected=$n")
    assert(leaked == 0, s"$leaked planted pairs straddle the split boundary")
    assert(nCrossWave > 0 && crossWaveNotInherited == 0,
      s"$crossWaveNotInherited of $nCrossWave wave-boundary pairs not inherited")
    assert(conflicted2 == 0, s"$conflicted2 rows flagged in a conflict-free corpus")

    // phase 9: KEEP-FIRST span dedup (the Lee et al. ExactSubstr law)
    // over the same corpus — the complement check to phase 5's
    // scrub-all: the planted copy (the LATER occurrence) must empty,
    // while its original (the first occurrence) keeps all 50 tokens.
    // Closed forms: emptied == nPairs (copies only), total kept ==
    // (n - nPairs) * 50.
    val t8 = System.nanoTime()
    val kf = Dedup.scrubSpansKeepFirst(docs, k = 8)
      .agg(sum(when(col("n_kept") === 0, 1L).otherwise(0L)).as("emptied"),
        sum(col("n_kept")).as("kept")).head()
    val sec9 = (System.nanoTime() - t8) / 1e9
    println(f"""{"phase":"keep_first_spans","docs":$n,"emptied":${kf.getLong(0)},"kept_tokens":${kf.getLong(1)},"sec":$sec9%.2f,"docs_per_sec":${(n / sec9).toLong}}""")
    assert(kf.getLong(0) == nPairs,
      s"emptied=${kf.getLong(0)} expected $nPairs (only the later copies)")
    assert(kf.getLong(1) == (n - nPairs) * 50L,
      s"kept=${kf.getLong(1)} expected ${(n - nPairs) * 50L}")

    // phase 10: novelty scoring of a fresh probe batch against the
    // phase-2 signature store — the acquisition-time audit at corpus
    // scale. Every 20th probe doc copies a store doc with residue 7
    // mod 20 (never itself a planted copy or an original-of-copy, so
    // its text is UNIQUE in the store); all other probe docs are fresh
    // hash-derived text. Closed forms: not-novel == m/20, each with
    // sig_matches == 32 and nearest_id == its exact target; everything
    // else novel with zero candidates.
    val m = n / 10
    val probeSeed = when(col("id") % 20 === 0, (col("id") % 100) * 20 + 7)
      .otherwise(col("id"))
    val probe = spark.range(n, n + m).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(49)),
          j => concat(lit("w"), pmod(xxhash64(probeSeed, j), lit(9973)))), " ")
          .as("text"))
      .cache()
    probe.count()
    val t9 = System.nanoTime()
    val nov = Dedup.noveltyScore(store,
        Dedup.minhashTable(probe, numHashes = 32, k = 3),
        numHashes = 32, bands = 8, tNum = 1, tDen = 2)
      .withColumn("__target", when(col("doc_id") % 20 === 0,
        (col("doc_id") % 100) * 20 + 7))
      .agg(
        sum(when(!col("is_novel"), 1L).otherwise(0L)).as("not_novel"),
        sum(when(!col("is_novel") && col("sig_matches") === 32 &&
          col("nearest_id") === col("__target"), 1L).otherwise(0L))
          .as("exact_hits"),
        sum(when(col("is_novel") && col("n_candidates") === 0, 1L)
          .otherwise(0L)).as("clean_novel"))
      .head()
    val sec10 = (System.nanoTime() - t9) / 1e9
    println(f"""{"phase":"novelty","store_docs":$cut,"probe_docs":$m,"not_novel":${nov.getLong(0)},"exact_hits":${nov.getLong(1)},"clean_novel":${nov.getLong(2)},"sec":$sec10%.2f,"probe_docs_per_sec":${(m / sec10).toLong}}""")
    assert(nov.getLong(0) == m / 20,
      s"not_novel=${nov.getLong(0)} expected ${m / 20}")
    assert(nov.getLong(1) == m / 20,
      s"exact_hits=${nov.getLong(1)} — a planted probe missed its target")
    assert(nov.getLong(2) == m - m / 20,
      s"clean_novel=${nov.getLong(2)} expected ${m - m / 20}")

    // phase 11: AUDIO near-dup dedup at payload scale — 50k REAL WAV
    // payloads through the decoded-waveform perceptual print
    // (graft.llm.Multimodal.audioFingerprint: PCM decode -> 65-window
    // energy envelope -> 64 delta-sign bits) and the pigeonhole
    // block-LSH pairer, against closed-form planted answers. Families
    // are CONSTRUCTED so the whole answer is exact:
    //  - family id f (16 bits) encodes the print [f, ~f, f, ~f] (MSB
    //    first), realized as an amplitude walk (x1.08 up, /1.08 down;
    //    the f/~f alternation bounds drift to 16 steps = x3.43, so
    //    16-bit PCM never clips or underflows) — two distinct families
    //    differ in 4*hamming(f, f') >= 4 print bits, STRICTLY outside
    //    the radius-3 pairing, and every 16-bit LSH block takes a
    //    family-distinct value (tiny buckets — a low-diversity code
    //    here degenerates the block join quadratically, measured);
    //  - every 20th payload is its predecessor at HALF GAIN: energies
    //    scale uniformly, no delta flips — print-identical (the gain
    //    invariance law), so planted pairs sit at hamming 0;
    //  - every 1000th payload (residue 7 — never a copy or an
    //    original) is a 10-sample stub: shorter than the window grid,
    //    prints null, excluded from pairing by contract.
    // Closed forms: nulls == aN/1000, pairs == exactly the planted
    // (id-1, id) set at hamming 0 — nothing else pairs.
    val aN = 50000L
    require(aN <= 65536L, "family ids must fit the 16-bit print code")
    val tA = System.nanoTime()
    import spark.implicits._
    val media = spark.range(aN).map { boxed =>
      val id: Long = boxed
      val isCopy = id % 20 == 0 && id > 0
      val family: Long = if (isCopy) id - 1 else id
      val gain = if (isCopy) 0.5 else 1.0
      val samples: Array[Short] =
        if (id % 1000 == 7) Array.fill(10)((1000 * gain).toShort)
        else {
          // print bit i (MSB first): 16-bit word f on even blocks, ~f
          // on odd; the walk realizes each bit as an energy step
          val amps = new Array[Double](65)
          amps(0) = 8000.0 * gain
          var i = 0
          while (i < 64) {
            val word = if ((i / 16) % 2 == 0) family else ~family
            val up = ((word >> (15 - i % 16)) & 1L) == 1L
            amps(i + 1) = if (up) amps(i) * 1.08 else amps(i) / 1.08
            i += 1
          }
          Array.tabulate(65 * 16)(s => amps(s / 16).toShort)
        }
      val format = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val raw = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), format, samples.length),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      (id, "audio", bos.toByteArray)
    }.toDF("media_id", "kind", "bytes")
      .cache()
    media.count()                      // synthesis excluded from timing
    val tAfp = System.nanoTime()
    val prints = graft.llm.Multimodal.audioFingerprint(spark, media)
      .toDF("media_id", "dhash").cache()
    val nNullPrints = prints.filter(col("dhash").isNull).count()
    val audioPairs = graft.llm.Multimodal
      .imageNearDupPairs(prints, maxHamming = 3)
      .withColumn("__planted",
        col("id_b") === col("id_a") + 1 && col("id_b") % 20 === 0 &&
          col("hamming") === 0)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__planted"), 1L).otherwise(0L)).as("planted"))
      .head()
    val secA = (System.nanoTime() - tAfp) / 1e9
    val expPairs = (aN - 1) / 20
    val expNulls = (aN + 992) / 1000   // ids == 7 mod 1000 in [0, aN)
    println(f"""{"phase":"audio_neardup","payloads":$aN,"null_prints":$nNullPrints,"pairs":${audioPairs.getLong(0)},"planted_hit":${audioPairs.getLong(1)},"expected_pairs":$expPairs,"synth_sec":${(tAfp - tA) / 1e9}%.2f,"sec":$secA%.2f,"payloads_per_sec":${(aN / secA).toLong}}""")
    assert(nNullPrints == expNulls,
      s"null prints=$nNullPrints expected $expNulls (the short stubs)")
    assert(audioPairs.getLong(0) == expPairs &&
      audioPairs.getLong(1) == expPairs,
      s"pairs=${audioPairs.getLong(0)} planted=${audioPairs.getLong(1)} " +
        s"expected exactly $expPairs gain-copy pairs at hamming 0")
    media.unpersist(); prints.unpersist()
    spark.stop()
  }
}
