package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_token_stats"  -> (t1TokenStats _),
    "t2_lang_id"      -> (t2LangId _),
    "t3_quality_hist" -> (t3QualityHist _))

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
         FROM documents GROUP BY 1 ORDER BY quality_bucket""")
}
