package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Pipeline, Similarity}

/** Round-12 pins — the r11 ADVICE hardenings plus the retirement
  * lifecycle closure:
  *
  *  1. delete → deferred re-update of the SAME id serves the update
  *     (previously hidden until the next compaction), while other
  *     tombstoned ids — including ones whose stale coding lives only
  *     in the update ledger — stay deleted through the compaction the
  *     re-update triggers.
  *  2. The st13 ledger key is text-sensitive: a wave whose documents
  *     were edited under unchanged doc_ids commits as a NEW wave.
  */
class Round12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // ---------- 1. delete → deferred re-update ----------

  test("deferred update after delete: the re-updated id serves its new " +
    "coding; a tombstoned id whose only stale coding sat in the ledger " +
    "stays deleted through the triggered compaction") {
    val tmp = System.getProperty("java.io.tmpdir")
    val defDir = s"$tmp/graft_r12_delupd_idx"
    val rebDir = s"$tmp/graft_r12_delreb_idx"
    val basePred = col("vec_id") % 10 =!= 9
    val emb = Tables.embeddings(spark, dir)
    // g1: deleted then deferred-re-updated (reversed vectors) — must
    // serve the update. g2: deferred-updated FIRST (so its latest
    // coding lives only in the ledger), then deleted, never
    // re-updated — must stay deleted even though the g1 re-update
    // triggers a tombstone compaction that clears the deletes table.
    val g1 = col("vec_id") % 40 === 19
    val g2 = col("vec_id") % 40 === 39
    val g1New = emb.filter(g1).withColumn("embedding", reverse(col("embedding")))
    val g2Led = emb.filter(g2).withColumn("embedding", reverse(col("embedding")))
    assert(emb.filter(g1).count() > 0 && emb.filter(g2).count() > 0, "vacuous groups")
    Similarity.buildIvfPqIndex(spark, dir, defDir, basePred, basePred)
    Similarity.appendIvfPqIndex(spark, dir, defDir, !basePred)
    Similarity.deferUpdateIvfPqIndex(spark, g2Led, defDir) // g2 now ledger-coded
    Similarity.deleteFromIvfPqIndex(spark, emb.filter(g1 || g2).select(col("vec_id")), defDir)
    Similarity.deferUpdateIvfPqIndex(spark, g1New, defDir) // overlap → compact first
    val served = Similarity.queryIvfPqIndex(spark, dir, defDir).collect().toSeq
    // rebuild-with-current-values: the whole append slice, g1 reversed,
    // g2 absent (deleted), everything else at its original vector
    Similarity.buildIvfPqIndex(spark, dir, rebDir, basePred, basePred)
    Similarity.appendIvfPqIndexFrom(spark,
      emb.filter(!basePred && !g1 && !g2).unionByName(g1New), rebDir)
    assert(served === Similarity.queryIvfPqIndex(spark, dir, rebDir).collect().toSeq,
      "delete→re-update serve != rebuild-with-current-values")
    // physical state: g1 ids live (ledger), g2 ids in NEITHER codes nor
    // the ledger's live view — the triggered compaction folded g2's
    // stale ledger rows into codes and the tombstone pass removed them
    def idsIn(path: String): Set[Long] = {
      val p = new Path(path)
      val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Set.empty
      else spark.read.parquet(path).select(col("vec_id")).distinct()
        .collect().map(_.getLong(0)).toSet
    }
    val g1Ids = emb.filter(g1).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val g2Ids = emb.filter(g2).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val allServed = idsIn(s"$defDir/codes") ++ idsIn(s"$defDir/codes_gen")
    assert(g1Ids.subsetOf(allServed), "re-updated ids missing from the index")
    assert(allServed.intersect(g2Ids).isEmpty,
      "deleted ids resurrected through the triggered compaction")
  }

  test("deletes compaction folds the update ledger first: a tombstoned id " +
    "coded only in the ledger does not survive compactIvfPqDeletes") {
    val tmp = System.getProperty("java.io.tmpdir")
    val idxDir = s"$tmp/graft_r12_foldfirst_idx"
    val basePred = col("vec_id") % 10 =!= 9
    val emb = Tables.embeddings(spark, dir)
    val g = col("vec_id") % 40 === 39
    Similarity.buildIvfPqIndex(spark, dir, idxDir, basePred, basePred)
    Similarity.appendIvfPqIndex(spark, dir, idxDir, !basePred)
    Similarity.deferUpdateIvfPqIndex(spark,
      emb.filter(g).withColumn("embedding", reverse(col("embedding"))), idxDir)
    Similarity.deleteFromIvfPqIndex(spark, emb.filter(g).select(col("vec_id")), idxDir)
    Similarity.compactIvfPqDeletes(spark, idxDir)
    val p = new Path(s"$idxDir/codes_gen")
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(p), "ledger survives the deletes compaction")
    val left = spark.read.parquet(s"$idxDir/codes")
      .join(emb.filter(g).select(col("vec_id")), Seq("vec_id"), "left_semi").count()
    assert(left === 0L, "tombstoned ledger-coded ids survived compaction")
    // and the serve view equals a rebuild without the deleted slice
    val rebDir = s"$tmp/graft_r12_foldfirst_reb"
    Similarity.buildIvfPqIndex(spark, dir, rebDir, basePred, basePred)
    Similarity.appendIvfPqIndexFrom(spark, emb.filter(!basePred && !g), rebDir)
    assert(Similarity.queryIvfPqIndex(spark, dir, idxDir).collect().toSeq ===
      Similarity.queryIvfPqIndex(spark, dir, rebDir).collect().toSeq,
      "post-compaction serve != rebuild-without-deleted")
  }

  // ---------- offboarded generation (e15/e16/e17) ----------

  test("offboard: e14 serves the persisted retraction, which equals both " +
    "the from-scratch incremental retraction and a rebuild-CC over the " +
    "retired-filtered pair table") {
    assert(rows(Pipeline.e14GraphRetract(spark, dir)) ===
      rows(Pipeline.e14Derived(spark, dir)),
      "e14 artifact-served != incremental derivation")
    val rebuilt = Dedup.connectedComponents(
        Pipeline.offboardPairs(spark, dir), "a_id", "b_id")
      .select(col("node").as("doc_id"), col("cluster_id"))
    assert(rows(Pipeline.offboardLabels(spark, dir)) === rows(rebuilt),
      "persisted retraction != rebuild-without-retired")
  }

  test("offboard layers: tombstone-applied signatures equal live-minus-" +
    "retired (non-vacuously), and no layer carries a retired row") {
    val retired = Pipeline.retiredDocs(spark, dir)
    val live = Pipeline.signaturesArtifact(spark, dir)
    assert(live.join(retired, Seq("doc_id"), "left_semi").count() > 0,
      "vacuous: the retired source has no signatures at this SF")
    assert(rows(Pipeline.offboardSignatures(spark, dir)) ===
      rows(live.join(retired, Seq("doc_id"), "left_anti")),
      "offboard signatures != live minus retired")
    val op = Pipeline.offboardPairs(spark, dir)
    assert(op.join(retired.select(col("doc_id").as("a_id")), Seq("a_id"), "left_semi")
      .count() === 0L)
    assert(op.join(retired.select(col("doc_id").as("b_id")), Seq("b_id"), "left_semi")
      .count() === 0L)
    assert(Pipeline.offboardDocflags(spark, dir)
      .filter(col("source") === Pipeline.E14RetiredSource).count() === 0L)
  }

  test("offboard cascade: a doc dropped only because its canonical was " +
    "retired RE-ENTERS dedup survival (constructed — the branch e11's " +
    "frozen-flag filter deliberately skips; live at sf0.1, probed 10 docs)") {
    import spark.implicits._
    // cluster {2 (retired, canonical), 5} via pair (2,5); {7,8} untouched
    val pairs = Seq((2L, 5L), (7L, 8L)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(pairs, "a_id", "b_id")
    assert(labels.filter(col("node") === 5L && col("cluster_id") === 2L).count() === 1L,
      "precondition: 5 is dropped under the live labeling (canonical 2)")
    val out = Pipeline.retractFromGraph(pairs, labels, Seq(2L).toDF("doc_id"))
    // 5's only pair had a retired endpoint: it leaves the labeling
    // entirely — downstream dropsOf() no longer drops it (s1 true)
    assert(out.filter(col("doc_id") === 5L).count() === 0L,
      "5 still labeled — its drop would persist after the retraction")
    assert(rows(out) === Set("[7,7]", "[8,7]"),
      "untouched cluster must pass through unchanged")
  }

  test("e17 exclusion: an arrival sharing a band with a retired doc mints " +
    "a retired-endpoint pair WITHOUT the exclusion and none WITH it " +
    "(constructed signatures; live at sf0.1 — 10 hazard candidates probed)") {
    import spark.implicits._
    def sig(id: Long, v: Long) =
      (id, v, v, v, v, v, v, v, v, v, v, v, v, v, v, v, v)
    val cols = "doc_id" +: (0 until Dedup.NumHashes).map(k => s"mh$k")
    // retired doc 2 and the arriving doc 42 share EVERY minhash (same
    // band buckets); base doc 1 differs
    val full = Seq(sig(1L, 11L), sig(2L, 99L), sig(42L, 99L)).toDF(cols: _*)
    val newSigs = full.filter(col("doc_id") === 42L)
    val candFull = Dedup.arrivalCandidates(newSigs, full)
    assert(rows(candFull) === Set("[2,42]"),
      "the unexcluded banding must surface the retired-endpoint candidate")
    val off = full.filter(col("doc_id") =!= 2L) // the offboarded base
    assert(Dedup.arrivalCandidates(off.filter(col("doc_id") === 42L), off)
      .count() === 0L,
      "the exclusion failed: a retired doc still banded with the arrival")
    // fold level: the unexcluded pair would RESURRECT doc 2 in the
    // labeling; the excluded fold equals rebuild-without-retired
    val basePairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val bad = Dedup.incrementalFold(basePairs, Seq((2L, 42L)).toDF("a_id", "b_id"))
    assert(bad.filter(col("doc_id") === 2L).count() === 1L,
      "sanity: the unexcluded fold resurrects the retired doc")
    val good = Dedup.incrementalFold(basePairs, basePairs)
    assert(good.count() === 0L, "excluded fold != rebuild-without-retired")
  }

  // ---------- e18 offboard cutover ----------

  test("e18 cutover: resumes forward from mid-swap crash windows (layer " +
    "asided but not promoted; layer already promoted), the post-swap LIVE " +
    "layers are the offboarded generation, re-running is a no-op, and the " +
    "protocol-impossible state throws instead of guessing") {
    val scratch = Pipeline.stageCutoverClone(spark, dir)
    val fs = FileSystem.get(new Path(scratch).toUri,
      spark.sparkContext.hadoopConfiguration)
    val tag = Pipeline.offboardTag
    val offLabels = rows(spark.read.parquet(s"$scratch/$tag/labels"))
    val offPairs = spark.read.parquet(s"$scratch/$tag/pairs").count()
    val aside = s"$scratch/cutover_old_$tag"
    // CRASH WINDOW A: signatures asided, not yet promoted
    fs.mkdirs(new Path(aside))
    assert(fs.rename(new Path(s"$scratch/signatures"),
      new Path(s"$aside/signatures")))
    // CRASH WINDOW B: pairs fully promoted (aside done, offboard consumed)
    assert(fs.rename(new Path(s"$scratch/pairs"), new Path(s"$aside/pairs")))
    assert(fs.rename(new Path(s"$scratch/$tag/pairs"), new Path(s"$scratch/pairs")))
    // resume completes forward
    Pipeline.cutoverSubtree(spark, scratch, tag)
    assert(rows(spark.read.parquet(s"$scratch/labels")) === offLabels,
      "post-swap live labels != offboarded labels")
    assert(spark.read.parquet(s"$scratch/pairs").count() === offPairs)
    val retired = Pipeline.retiredDocs(spark, dir)
    assert(spark.read.parquet(s"$scratch/signatures")
      .join(retired, Seq("doc_id"), "left_semi").count() === 0L,
      "a retired doc survived the cutover in the live signatures")
    assert(!fs.exists(new Path(aside)) && !fs.exists(new Path(s"$scratch/$tag")),
      "cutover must clean the aside and the emptied generation")
    // root completeness witness on the promoted epoch-partitioned bins
    // (its generation markers live inside the epoch subdirs): without
    // it the next ensureArtifact consumer would overwrite-rebuild the
    // tree flat while the promoted manifest keeps epoch checksums
    assert(fs.exists(new Path(s"$scratch/bins/_SUCCESS")) &&
      fs.exists(new Path(s"$scratch/bins/_graft_schema.ddl")),
      "promoted bins tree lacks a root completeness witness")
    // idempotent re-run over the completed state: a no-op via the
    // completion marker (the consumed generation alone is ambiguous)
    assert(fs.exists(new Path(s"$scratch/cutover_done_$tag")))
    Pipeline.cutoverSubtree(spark, scratch, tag)
    assert(rows(spark.read.parquet(s"$scratch/labels")) === offLabels)
    // a missing generation WITHOUT the completion witness throws —
    // "report success, serve the unretracted tree" is the wrong answer
    intercept[java.io.IOException] {
      Pipeline.cutoverSubtree(spark, scratch, "offboard_no_such_src")
    }
    // three-way state (layer in live AND aside AND offboard) is the
    // crash+rebuild+rerun path: a run crashed after promoting labels
    // (aside holds the pre-promotion live), the offboard generation
    // was rebuilt, the cutover re-run. live+aside pins live as the
    // previously-promoted copy, so the heal clears the stale aside
    // and promotes the REBUILT generation (r13: was a refusing throw)
    val conf = spark.sparkContext.hadoopConfiguration
    val liveLabels = rows(spark.read.parquet(s"$scratch/labels"))
    // stale aside copy := the (old) pre-promotion live labels
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(s"$scratch/labels"),
      fs, new Path(s"$aside/labels"), false, conf)
    // rebuilt offboard labels := distinct content (the pairs table
    // stands in — any well-formed parquet distinct from live labels)
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(s"$scratch/pairs"),
      fs, new Path(s"$scratch/$tag/labels"), false, conf)
    val rebuilt = rows(spark.read.parquet(s"$scratch/$tag/labels"))
    assert(rebuilt !== liveLabels, "construction must be distinguishable")
    Pipeline.cutoverSubtree(spark, scratch, tag)
    assert(rows(spark.read.parquet(s"$scratch/labels")) === rebuilt,
      "heal must promote the REBUILT offboard generation over live")
    assert(!fs.exists(new Path(aside)) && !fs.exists(new Path(s"$scratch/$tag")),
      "heal must clear the stale aside copy and the emptied generation")
    assert(fs.exists(new Path(s"$scratch/cutover_done_$tag")))
    // r13: crash BETWEEN the completion marker and the cleanup —
    // the marker is written first, so a re-run takes the completed
    // path and finishes the cleanup instead of throwing or re-swapping
    fs.mkdirs(new Path(aside))
    Pipeline.cutoverSubtree(spark, scratch, tag)
    assert(!fs.exists(new Path(aside)),
      "completed-path re-run must finish the crashed cleanup")
    assert(rows(spark.read.parquet(s"$scratch/labels")) === rebuilt)
  }

  // ---------- 2. text-sensitive ledger key ----------

  test("st13 ledger key: the same doc_ids with EDITED text commit as a new " +
    "wave instead of aliasing the committed one") {
    import graft.streaming.DocumentsStream
    val tmp = System.getProperty("java.io.tmpdir")
    val base = s"$tmp/graft_r12_ledgerkey"
    val bp = new Path(base)
    val fs = FileSystem.get(bp.toUri, spark.sparkContext.hadoopConfiguration)
    fs.delete(bp, true)
    val wave = Tables.documents(spark, dir)
      .filter(Pipeline.e4DeltaPred).limit(2).cache()
    try {
      DocumentsStream.maintainBatch(spark, dir, base)(wave, 0L)
      assert(DocumentsStream.committedBatches(spark, base).size === 1)
      // identical re-delivery: skipped (idempotence unchanged)
      DocumentsStream.maintainBatch(spark, dir, base)(wave, 1L)
      assert(DocumentsStream.committedBatches(spark, base).size === 1,
        "identical wave re-committed")
      // same ids, edited text: a DIFFERENT wave, must commit
      val edited = wave.withColumn("text", concat(col("text"), lit(" edited")))
      DocumentsStream.maintainBatch(spark, dir, base)(edited, 2L)
      assert(DocumentsStream.committedBatches(spark, base).size === 2,
        "edited wave aliased the committed one — stale pairs would serve")
    } finally { wave.unpersist(); fs.delete(bp, true); () }
  }

  // ---------- t21 model serve ----------

  test("t21 serves from the persisted DSIR model and equals the " +
    "from-scratch derivation; the cut artifact equals the derived cut") {
    import graft.ext.TextAnalysis
    assert(rows(TextAnalysis.t21DsirSelect(spark, dir)) ===
      rows(TextAnalysis.t21Derived(spark, dir)),
      "t21 artifact-served != from-scratch derivation")
    val servedCut = Pipeline.dsirCutArtifact(spark, dir)
      .collect()(0).getDouble(0)
    val derivedCut = TextAnalysis.dsirCut(
      TextAnalysis.dsirPerDoc(spark, dir)).collect()(0).getDouble(0)
    assert(servedCut === derivedCut, "persisted cut != derived cut")
  }

  test("st14 property: random wave/compact interleavings serve the same " +
    "arrived state as the uncompacted ledger (3 seeds x 6 waves), with one " +
    "live generation and a cumulative folded set at every step") {
    import graft.streaming.DocumentsStream
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7919)
      val base = s"$tmp/graft_r12_compactprop_$seed"
      val bp = new Path(base)
      val fs = FileSystem.get(bp.toUri, spark.sparkContext.hadoopConfiguration)
      fs.delete(bp, true)
      try {
        val all = scala.collection.mutable.Set.empty[String]
        for (w <- 1 to 6) {
          // wave-disjoint id ranges: an exactly-once check needs each
          // committed pair to be distinguishable from every other wave's
          val ids = Seq.fill(rnd.nextInt(3) + 1)(
            rnd.nextInt(900).toLong + 1000L * w).distinct
          val tag = f"b_s${seed}_w$w"
          val sh = ids.flatMap(i => Seq((i, s"x$i"), (i, s"y$i"))).toDF("doc_id", "s")
          val wp = new Path(s"$base/ledger/$tag")
          Dedup.minhashSignatures(sh)
            .write.mode("overwrite").parquet(new Path(wp, "sigs").toString)
          Seq((ids.min, ids.max, 1.0)).toDF("a_id", "b_id", "jaccard")
            .write.mode("overwrite").parquet(new Path(wp, "pairs").toString)
          fs.create(new Path(wp, "_GRAFT_COMMIT"), true).close()
          all += s"${ids.min}:${ids.max}"
          if (rnd.nextBoolean()) {
            DocumentsStream.compactLedger(spark, base)
            assert(DocumentsStream.committedGens(spark, base).size === 1,
              s"seed $seed wave $w: more than one live generation")
          }
          // the INVARIANT every reader depends on: gen + live tail
          // serves each committed pair exactly once, at every step
          val served = spark.read
            .parquet(DocumentsStream.ledgerState(spark, base).dirs("pairs"): _*)
            .select(concat_ws(":", col("a_id"), col("b_id")))
            .as[String].collect()
          assert(served.sorted.toSeq === all.toSeq.sorted,
            s"seed $seed wave $w: served pairs != committed pairs (dup or loss)")
        }
        DocumentsStream.compactLedger(spark, base)
        val st = DocumentsStream.ledgerState(spark, base)
        assert(st.waves.isEmpty && st.folded.size === 6,
          s"seed $seed: final compact must fold all six waves")
      } finally { fs.delete(bp, true); () }
    }
  }

  // ---------- s20 descent round 2 ----------

  test("s20: the recall curve across NN-Descent rounds at sf0.001 is " +
    "monotone and round 2 (the gate's depth since r12) lands the expected " +
    "convergence point") {
    // brute-force ground truth on the same quantized-L2 metric
    // (Round10Spec's harness, re-run here for the rounds sweep)
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong).toArray)
    val norms = raw.map { case (v, a) => v -> a.map(x => x * x).sum }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val exact = raw.map { case (vi, a) =>
      vi -> raw.filter(_._1 != vi)
        .map { case (vj, b) => (norms(vi) + norms(vj) - 2L * dot(a, b), vj) }
        .sortBy(x => (x._1, x._2)).take(Similarity.TopK).map(_._2).toSet
    }.toMap
    def recallAt(rounds: Int): Double = {
      val edges = Similarity.s20KnnGraphRounds(spark, dir, rounds).collect()
      spark.catalog.clearCache()
      edges.count(e => exact(e.getAs[Long]("vec_id"))
        .contains(e.getAs[Long]("neighbor_id")))
        .toDouble / (raw.length * Similarity.TopK)
    }
    val curve = (0 to Similarity.S20DescentRounds).map(recallAt)
    info(s"s20 recall@${Similarity.TopK} by descent rounds: " +
      curve.zipWithIndex.map { case (r, i) => f"$i:$r%.3f" }.mkString(" "))
    assert(curve.sliding(2).forall(w => w(1) >= w(0) - 1e-12),
      s"descent re-ranks a candidate SUPERSET — the curve must be monotone: $curve")
    assert(curve.last > curve(1),
      s"round 2 bought nothing over round 1: $curve — drop S20DescentRounds to 1")
    // measured at sf0.001: 0.721 → 0.886 → 0.912 at the r12 knob
    // (probes=3); r13 widened S20Probes to 4 on the measured frontier
    // (recall is probe-bound past the round-2 knee), lifting the
    // curve's endpoint to 0.9492 — the band pins the measured point
    // at the CURRENT knob
    assert(curve.last >= 0.90, s"round-2 recall under the measured band: $curve")
  }

  // ---------- t30 drift-gated model refresh ----------

  test("t30: the retrain trigger fires non-vacuously (src7 at sf0.001), the " +
    "frozen and refreshed censuses genuinely differ, and the persisted " +
    "frozen cut equals e4's law (quantile of base-scored docs under the " +
    "base-trained model)") {
    import graft.ext.TextAnalysis
    val rows30 = TextAnalysis.t30ModelRefresh(spark, dir).collect()
    val fired = rows30.filter(_.getAs[Long]("retrain") == 1L).map(_.getString(0))
    assert(fired.toSeq === Seq("src7"),
      s"expected exactly src7 above DriftRetrainKl at sf0.001: ${fired.toSeq}")
    assert(rows30.exists(r => r.getAs[Long]("n_frozen_selected") !=
      r.getAs[Long]("n_refreshed_selected")),
      "vacuous: the two model generations select identically everywhere")
    val servedCut = Pipeline.frozenDsirCutArtifact(spark, dir)
      .collect()(0).getDouble(0)
    val derivedCut = TextAnalysis.dsirCut(
      TextAnalysis.dsirPerDocOn(spark, dir, !Pipeline.e4DeltaPred, !Pipeline.e4DeltaPred))
      .collect()(0).getDouble(0)
    assert(servedCut === derivedCut,
      "persisted frozen cut != e4's base-trained base-scored quantile")
  }

  // ---------- t29 batched BPE gate depth ----------

  test("t29: the batched learner reaches the full merge depth in ~merges/B " +
    "snapshots at sf0.001, and the sequential-vs-batched divergence the gate " +
    "doc names is LIVE at this SF (the sf0.01 gate match is a per-corpus " +
    "certification, not a law)") {
    import graft.ext.TextAnalysis
    val vocab = TextAnalysis.bpeVocab(spark, dir)
    val (batched, snapshots) = TextAnalysis.learnBpeMergesBatched(
      vocab, TextAnalysis.BpeBatchedMerges, TextAnalysis.BpeBatch)
    assert(batched.size === TextAnalysis.BpeBatchedMerges,
      "batched learning stopped short of the requested depth")
    // measured 17 snapshots for 32 merges at BOTH sf0.001 and sf0.01:
    // this corpus's frequent pairs form CHAINS (colu→colum→column),
    // and a chained merge consumes the symbol its predecessor just
    // created, so the compatible-prefix rule defers it — a structural
    // sequentiality, not a batching defect; the ~merges/B ideal needs
    // symbol-DIVERSE top candidates (real multi-domain corpora), and
    // the invariant the gate enforces is strict round-trip improvement.
    assert(snapshots < batched.size,
      s"round-trip claim failed: $snapshots snapshots for ${batched.size} merges")
    assert(snapshots === 17, // regression pin for this corpus
      s"snapshot count moved ($snapshots) — re-measure the SURVEY ratio note")
    val (sequential, _) = TextAnalysis.learnBpeMergesFrom(
      vocab, TextAnalysis.BpeBatchedMerges)
    assert(batched !== sequential,
      "vacuous: sf0.001 was expected to witness the creation-tie divergence " +
        "(if regenerated data made them equal, move this pin, don't weaken it)")
    // the shared prefix BEFORE the first divergence must be verbatim —
    // batching reorders/bends only from the first creation-tie on
    val firstDiff = batched.zip(sequential).indexWhere { case (a, b) => a != b }
    assert(firstDiff > 0, "the learners must agree on an initial prefix")
    assert(batched.take(firstDiff) === sequential.take(firstDiff))
  }

  // ---------- 3. st14 ledger compaction ----------

  test("st14: compaction folds the waves into ONE cumulative generation " +
    "(ledger cleared), serve ≡ rebuild, a fresh-checkpoint replay of " +
    "COMPACTED waves re-derives nothing, and the marker→delete crash " +
    "window double-serves nothing") {
    import graft.streaming.DocumentsStream
    import spark.implicits._
    val maintained = rows(DocumentsStream.st14LedgerCompact(spark, dir))
    val rebuilt = rows(Dedup.d7DedupComponents(spark, dir))
    assert(maintained === rebuilt, "compacted serve != full rebuild")
    val base = ArtifactRoots.tagged("graft_st14", dir)
    assert(DocumentsStream.committedBatches(spark, base).isEmpty,
      "compaction must clear the folded wave dirs")
    assert(DocumentsStream.committedGens(spark, base).size === 1,
      "cumulative compaction keeps exactly one live generation")
    val st = DocumentsStream.ledgerState(spark, base)
    assert(st.folded.size === 2, s"both wave tags must be folded: ${st.folded}")

    // fresh-checkpoint replay: the file source re-delivers BOTH waves;
    // their ledger dirs are GONE but the folded set vouches for them —
    // zero dirs recreated, zero pairs re-derived, serve unchanged
    DocumentsStream.runMaintain(spark, dir, base, s"$base/cp_replay").stop()
    assert(DocumentsStream.committedBatches(spark, base).isEmpty,
      "a compacted wave was re-derived on fresh-checkpoint re-delivery")
    assert(rows(DocumentsStream.labelsFromLedger(spark, dir, base)) === rebuilt,
      "serve drifted after the post-compaction replay")

    // crash window: marker written, wave dirs not yet deleted. Restore
    // a covered wave dir with POISON pairs — if any reader opened it,
    // the labeling would change — then assert serve excludes it and the
    // next compact GCs it without minting a new generation.
    val hfs = FileSystem.get(new Path(base).toUri,
      spark.sparkContext.hadoopConfiguration)
    val ghost = new Path(s"$base/ledger/${st.folded.head}")
    Seq((999998L, 999999L, 1.0)).toDF("a_id", "b_id", "jaccard")
      .coalesce(1).write.mode("overwrite")
      .parquet(new Path(ghost, "pairs").toString)
    hfs.create(new Path(ghost, "_GRAFT_COMMIT"), true).close()
    assert(DocumentsStream.committedBatches(spark, base).size === 1,
      "precondition: the ghost wave is marker-committed")
    assert(DocumentsStream.ledgerState(spark, base).waves.isEmpty,
      "a folded wave leaked back into the live tail")
    assert(rows(DocumentsStream.labelsFromLedger(spark, dir, base)) === rebuilt,
      "the crash-window leftover was double-served (poison pair read)")
    DocumentsStream.compactLedger(spark, base)
    assert(DocumentsStream.committedBatches(spark, base).isEmpty,
      "the crash-window leftover was not GC'd")
    assert(DocumentsStream.committedGens(spark, base).size === 1 &&
      DocumentsStream.ledgerState(spark, base).folded.size === 2,
      "a GC-only compact must not mint a new generation")
  }

  test("st14 fold content: the compacted generation carries exactly the " +
    "waves' sigs and pairs, cumulatively across two compactions, and the " +
    "superseded generation is GC'd (constructed)") {
    import graft.streaming.DocumentsStream
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir")
    val base = s"$tmp/graft_r12_compactfold"
    val bp = new Path(base)
    val fs = FileSystem.get(bp.toUri, spark.sparkContext.hadoopConfiguration)
    fs.delete(bp, true)
    try {
      def commitWave(tag: String, ids: Seq[Long], pair: (Long, Long)): Unit = {
        val sh = ids.flatMap(i => Seq((i, s"x$i"), (i, s"y$i"))).toDF("doc_id", "s")
        val w = new Path(s"$base/ledger/$tag")
        Dedup.minhashSignatures(sh)
          .write.mode("overwrite").parquet(new Path(w, "sigs").toString)
        Seq((pair._1, pair._2, 1.0)).toDF("a_id", "b_id", "jaccard")
          .write.mode("overwrite").parquet(new Path(w, "pairs").toString)
        fs.create(new Path(w, "_GRAFT_COMMIT"), true).close()
      }
      commitWave("b_wave_a", Seq(100L, 200L), (100L, 200L))
      DocumentsStream.compactLedger(spark, base)
      val s1 = DocumentsStream.ledgerState(spark, base)
      assert(s1.gen.isDefined && s1.waves.isEmpty && s1.folded === Set("b_wave_a"))
      assert(spark.read.parquet(s1.dirs("sigs"): _*)
        .select("doc_id").as[Long].collect().toSet === Set(100L, 200L),
        "gen 0 must carry wave A's sigs (the post-compaction banding base)")
      commitWave("b_wave_b", Seq(300L), (200L, 300L))
      DocumentsStream.compactLedger(spark, base)
      val s2 = DocumentsStream.ledgerState(spark, base)
      assert(s2.folded === Set("b_wave_a", "b_wave_b"),
        "the folded set must be cumulative")
      assert(DocumentsStream.committedGens(spark, base).size === 1,
        "the superseded generation must be GC'd")
      assert(spark.read.parquet(s2.dirs("sigs"): _*)
        .select("doc_id").as[Long].collect().toSet === Set(100L, 200L, 300L),
        "gen 1 must carry BOTH waves' sigs")
      assert(rows(spark.read.parquet(s2.dirs("pairs"): _*)
        .select(col("a_id"), col("b_id"))) === Set("[100,200]", "[200,300]"),
        "gen 1 must carry both waves' pairs exactly once")
      // idempotent third compact: nothing live — no new generation
      val before = DocumentsStream.committedGens(spark, base).map(_.getName)
      DocumentsStream.compactLedger(spark, base)
      assert(DocumentsStream.committedGens(spark, base).map(_.getName) === before,
        "a no-op compact minted or renamed a generation")
      // THIRD compaction WITH live waves — the generation-numbering
      // collision case: superseded gens were GC'd, so a count-derived
      // next name would equal the LIVE gen (gen_00001) and the scratch
      // delete would destroy it (every folded wave lost — their ledger
      // dirs are long cleared); suffix+1 numbering must mint gen_00002
      commitWave("b_wave_d", Seq(400L), (300L, 400L))
      DocumentsStream.compactLedger(spark, base)
      val s3 = DocumentsStream.ledgerState(spark, base)
      assert(DocumentsStream.committedGens(spark, base).map(_.getName) ===
        Seq("gen_00002"), "third compaction must mint gen_00002, not collide")
      assert(s3.folded === Set("b_wave_a", "b_wave_b", "b_wave_d"))
      assert(spark.read.parquet(s3.dirs("sigs"): _*)
        .select("doc_id").as[Long].collect().toSet === Set(100L, 200L, 300L, 400L),
        "a folded wave's sigs were lost across the third compaction")
      // superseded-gen leak self-heals: plant a stale committed older
      // gen (the crash window between wave-delete and gen-delete) and
      // assert a NO-WORK compact still GCs it
      val stale = new Path(s"$base/compact/gen_00001")
      Seq((0L, 0L, 0.0)).toDF("a_id", "b_id", "jaccard")
        .write.mode("overwrite").parquet(new Path(stale, "pairs").toString)
      fs.create(new Path(stale, "_GRAFT_COMMIT"), true).close()
      DocumentsStream.compactLedger(spark, base)
      assert(DocumentsStream.committedGens(spark, base).map(_.getName) ===
        Seq("gen_00002"), "a no-work compact must GC superseded generations")
    } finally { fs.delete(bp, true); () }
  }
}
