package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for training-data pipelines (SURVEY.md
  * §2.10 extension surface): token counting, n-gram-heuristic
  * language ID, quality scoring. Everything is built from codegen'd
  * built-ins (split / array_intersect / regexp_replace) — no UDFs —
  * and every heuristic is mirrored 1:1 in the DuckDB oracle so the
  * scoring function itself is hash-checked, not just row counts.
  */
object TextAnalysis {

  private def words(c: Column): Column = split(trim(c), " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(words(c))

  /** BPE-ish subword proxy: alphanumeric chunks plus standalone
    * punctuation marks, a cheap stand-in for a real tokenizer's piece
    * count. regexp_extract_all keeps the pattern RE2-compatible so
    * the DuckDB oracle computes the identical number (no lookarounds
    * — RE2 has none). */
  def pieceCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+"), lit(0))) +
      size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Stopword marker sets per language — tiny by design; the point is
    * a deterministic, portable argmax heuristic, not model-grade LID. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** Distinct-stopword hit count for one language. */
  private def hits(c: Column, lang: String): Column = {
    val set = stopwords.toMap.apply(lang)
    size(array_intersect(array_distinct(words(c)), array(set.map(lit): _*)))
  }

  /** Heuristic language guess: argmax of stopword hits with a fixed
    * priority order (en > de > es > fr) for ties; no hits → "und". */
  def langGuess(c: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> hits(c, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: half length-saturation (tokens/50 capped
    * at 1), half English-stopword coverage (hits/4). */
  def qualityScore(c: Column): Column =
    round(least(tokenCount(c) / 50.0, lit(1.0)) * 0.5 + (hits(c, "en") / 4.0) * 0.5, 2)

  /** T1 — per-language corpus statistics. */
  def t1TokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(tokenCount(col("text"))), 2).as("avg_tokens"),
           round(avg(pieceCount(col("text"))), 2).as("avg_pieces"),
           round(avg(col("n_chars")), 2).as("avg_chars"),
           round(avg(length(col("text"))), 2).as("avg_text_len"))
      .orderBy(col("lang"))

  /** T2 — language-ID confusion matrix: labeled lang × heuristic
    * guess. (On this synthetic corpus the text is English-like for
    * every label, so the matrix exposes the heuristic's determinism,
    * not its accuracy.) */
  def t2LangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), langGuess(col("text")).as("guess"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("guess"))

  /** T3 — quality-score histogram (0.1-wide buckets). */
  def t3QualityHist(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(round(floor(qualityScore(col("text")) * 10) / 10.0, 1).as("quality_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("quality_bucket"))

  val GramK = 4       // token k-gram width for the rolling hash
  val WinnowWindow = 8 // winnowing window (MOSS-style document fingerprinting)
  val FpSeed = 11

  /** Distinct winnowing fingerprints per document — the classic MOSS
    * document-fingerprint sketch: hash every GramK-token gram (the
    * rolling-hash sequence), then keep the minimum hash of each
    * WinnowWindow-wide window. Guarantees any shared run of
    * GramK+WinnowWindow-1 tokens yields a shared fingerprint.
    *
    * Shape: rows-first, not nested arrays. Grams are exploded to
    * (doc_id, pos, gram) rows, hashed with the codegen'd md5 path,
    * and the window-min runs as a frame-bounded min() over positions.
    * The earlier all-array formulation (slice+array_min inside a
    * transform lambda) looked equivalent but ran 50× slower: once a
    * Generate consumed the array, Catalyst inlined the gram-hash
    * array into the per-window lambda — no CSE across lambda
    * boundaries — re-hashing every gram once per window (O(tokens²)
    * md5 calls, measured 320 s vs ~6 s on sf0.1). Row form keeps
    * every expression inside WholeStageCodegen and costs one narrow
    * shuffle on doc_id. */
  def winnowFingerprintRows(df: DataFrame, textCol: String): DataFrame = {
    val w = col("_w") // staged token array: lambda reads a buffer, not a re-split
    val grams = when(size(w) >= GramK,
      transform(sequence(lit(0), size(w) - GramK),
        i => concat_ws(" ", (0 until GramK).map(j => element_at(w, i + lit(j + 1))): _*))
    ).otherwise(array(concat_ws(" ", w)))
    val hs = df
      .select(col("doc_id"), words(col(textCol)).as("_w"))
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"),
              graft.functions.StableHash.hash64(FpSeed, col("g")).as("h"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val wRoll = wDoc.orderBy(col("pos")).rowsBetween(Window.currentRow, WinnowWindow - 1)
    hs.withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("wmin", min(col("h")).over(wRoll))
      // window starts: pos ≤ n-W for full windows; a short doc (n<W)
      // keeps only pos 0, whose truncated frame is the global min
      .filter(col("pos") <= col("n") - WinnowWindow ||
              (col("n") < WinnowWindow && col("pos") === 0))
      .select(col("doc_id"), col("wmin").as("fp"))
      .distinct()
  }

  /** T4 — rolling-hash document fingerprinting: winnowing sketches,
    * then shared-fingerprint clusters (docs with overlapping token
    * runs). The sketch is ~|tokens|/WinnowWindow hashes per doc, so
    * the exploded table — and the shuffle — is an order of magnitude
    * smaller than the full shingle set d3/d4 work from. */
  def t4WinnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprintRows(Tables.documents(spark, dir), "text")
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
           min(col("doc_id")).as("min_doc"),
           max(col("doc_id")).as("max_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("fp"))

  /** T5 — bottom-k (KMV) sketch per document via the custom typed
    * Aggregator (graft.functions.BottomK, SURVEY §2.10 UDAF surface):
    * the 4 smallest distinct token hashes fingerprint each doc with
    * O(k) state. Output is the exploded sketch, rank included, so the
    * DuckDB oracle (list_sort + slice) checks the aggregate's exact
    * semantics — partial/merge paths included, since Spark runs them
    * map-side. */
  def t5BottomkSketch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BottomK.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("t"))
      .select(col("doc_id"), graft.functions.StableHash.hash64(col("t")).as("h"))
      .groupBy(col("doc_id"))
      .agg(call_function("bottom_k", col("h")).getField("values").as("sk"))
      .select(col("doc_id"), posexplode(col("sk")).as(Seq("pos", "h")))
      .select(col("doc_id"), (col("pos") + 1).as("rank"), col("h"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_token_stats"  -> (t1TokenStats _),
    "t2_lang_id"      -> (t2LangId _),
    "t3_quality_hist" -> (t3QualityHist _),
    "t4_winnow_fingerprint" -> (t4WinnowFingerprint _),
    "t5_bottomk_sketch"     -> (t5BottomkSketch _))

  // ------------- DuckDB mirrors of the heuristics -------------

  private def sqlHits(lang: String): String = {
    val set = stopwords.toMap.apply(lang).map(s => s"'$s'").mkString(", ")
    s"len(list_intersect(list_distinct(string_split(trim(text), ' ')), [$set]))"
  }

  private val sqlTokens = "len(string_split(trim(text), ' '))"

  private def sqlLangGuess: String = {
    val best = stopwords.map { case (l, _) => sqlHits(l) }
      .reduce((a, b) => s"greatest($a, $b)")
    // same fixed priority order as the Scala foldRight; `best` is
    // inlined (RE2/DuckDB would allow a correlated subquery, but the
    // inline form keeps it a plain scalar expression)
    stopwords.reverse.foldLeft("'und'") { case (acc, (l, _)) =>
      s"CASE WHEN ${sqlHits(l)} = ($best) AND ($best) > 0 THEN '$l' ELSE $acc END"
    }
  }

  private val sqlQuality =
    s"round(least($sqlTokens / 50.0, 1.0) * 0.5 + (${sqlHits("en")} / 4.0) * 0.5, 2)"

  val oracles: Map[String, String] = Map(
    "t1_token_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
         round(avg($sqlTokens), 2) AS avg_tokens,
         round(avg(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
               + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))), 2) AS avg_pieces,
         round(avg(n_chars), 2) AS avg_chars,
         round(avg(length(text)), 2) AS avg_text_len
         FROM documents GROUP BY 1 ORDER BY lang""",
    "t2_lang_id" ->
      s"""WITH g AS (SELECT lang, $sqlLangGuess AS guess FROM documents)
         SELECT lang, guess, count(*) AS n_docs FROM g
         GROUP BY 1, 2 ORDER BY lang, guess""",
    "t3_quality_hist" ->
      s"""SELECT round(floor($sqlQuality * 10) / 10.0, 1) AS quality_bucket,
         count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY quality_bucket""",
    "t4_winnow_fingerprint" -> {
      val h = graft.functions.StableHash.duckdbHash64(FpSeed, "x")
      s"""WITH words AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
         grams AS (SELECT doc_id,
           CASE WHEN len(w) >= $GramK
             THEN list_transform(range(1, len(w) - ${GramK - 2}),
                    i -> ${(0 until GramK).map(j => s"w[i+$j]").mkString(" || ' ' || ")})
             ELSE [array_to_string(w, ' ')] END AS g
           FROM words),
         hs AS (SELECT doc_id, list_transform(g, x -> $h) AS h FROM grams),
         fps AS (SELECT doc_id,
           CASE WHEN len(h) >= $WinnowWindow
             THEN list_distinct(list_transform(range(1, len(h) - ${WinnowWindow - 2}),
                    j -> list_min(h[j:j+${WinnowWindow - 1}])))
             ELSE [list_min(h)] END AS f
           FROM hs),
         u AS (SELECT doc_id, unnest(f) AS fp FROM fps)
         SELECT fp, count(DISTINCT doc_id) AS n_docs,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM u GROUP BY 1 HAVING count(DISTINCT doc_id) > 1 ORDER BY fp"""
    },
    "t5_bottomk_sketch" -> {
      val h = graft.functions.StableHash.duckdbHash64("t")
      val k = graft.functions.BottomK.DefaultK
      s"""WITH toks AS (
           SELECT doc_id, $h AS h
           FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents)),
         sk AS (
           SELECT doc_id, list_sort(list_distinct(list(h)))[1:$k] AS l
           FROM toks GROUP BY 1)
         SELECT doc_id, generate_subscripts(l, 1) AS rank, unnest(l) AS h
         FROM sk ORDER BY doc_id, rank"""
    })
}
