package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The operators COMPOSED: one DAG that takes the raw corpus through
  * the canonical training-data preparation funnel —
  *
  *   eval split → near-dup dedup (d7 labeling) → repetition quality
  *   filter (t9 rule) → benchmark decontamination (t10 rule)
  *
  * — and reports the per-source survivor funnel with final token
  * mass. Each stage reuses the SAME rule its standalone operator
  * ships (and the oracle reuses the same SQL fragments), so this is
  * a composition proof, not a re-implementation: the numbers here
  * must reconcile with d15/t9/t10 run alone.
  *
  * Scale shape: the union of the parts, nothing new — the d7
  * labeling is candidate-pair-bounded, the quality rule is row-local,
  * the eval-gram semi-join broadcasts, and the funnel rollup is one
  * hash agg. One pass over the corpus feeds all three stage columns.
  */
object Pipeline {

  /** E1 — the composed corpus-preparation funnel. Stages are
    * CUMULATIVE (a doc must survive every earlier stage to be
    * counted at a later one), mirroring a real pipeline's order:
    * dedup first (cheapest global signal), then row-local quality,
    * then decontamination. */
  def e1CorpusFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(trim(col("text")), " ").as("_w"))
    val isEval = TextAnalysis.isEvalDoc

    // stage 1 — global near-dup labeling over the WHOLE corpus (the
    // labeling must see eval docs too: a train doc that duplicates an
    // eval doc is exactly what the canonical-copy rule must catch).
    // Shared helper with d15 — structurally the same drop set.
    val drops = Dedup.nonCanonicalDocs(spark, dir).withColumn("dup", lit(1L))

    // stage 2 — t9's duplicate-3-gram fraction, row-local
    val total = greatest(size(Dedup.shinglesOf(col("_w"))), lit(1))
    val dupFrac = (total - size(array_distinct(Dedup.shinglesOf(col("_w")))))
      .cast("double") / total.cast("double")

    // stage 3 — t10's shared-8-gram contamination, via t10's own
    // helper (one definition of the split and the gram rule)
    val contaminated = TextAnalysis.contaminatedOf(docs).withColumn("contam", lit(1L))

    docs.filter(!isEval)
      .join(drops, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("s1", col("dup").isNull)
      .withColumn("s2", col("s1") && dupFrac <= TextAnalysis.RepetitionThreshold)
      .withColumn("s3", col("s2") && col("contam").isNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pool"),
           sum(when(col("s1"), 1L).otherwise(0L)).as("n_after_dedup"),
           sum(when(col("s2"), 1L).otherwise(0L)).as("n_after_quality"),
           sum(when(col("s3"), 1L).otherwise(0L)).as("n_clean"),
           sum(when(col("s3"), size(col("_w")).cast("long")).otherwise(0L))
             .as("clean_tokens"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_corpus_funnel" -> (e1CorpusFunnel _))

  /** The same funnel assembled from the standalone operators' oracle
    * fragments: d7's transitive-closure labeling, t9's dup-fraction
    * formula, t10's eval-gram overlap. */
  val oracles: Map[String, String] = Map(
    "e1_corpus_funnel" ->
      s"""WITH RECURSIVE ${Dedup.d7LabelCtes},
         w AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
         drops AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
         q AS (SELECT doc_id, source, len(w) AS n_tok,
                 CAST(greatest(len(g), 1) - len(list_distinct(g)) AS DOUBLE)
                   / CAST(greatest(len(g), 1) AS DOUBLE) AS dfrac
               FROM (SELECT doc_id, source, w, ${TextAnalysis.sqlGrams(3)} AS g FROM w) t),
         u AS (SELECT doc_id,
                      unnest(list_distinct(${TextAnalysis.sqlGrams(TextAnalysis.DecontaminationGramK)})) AS g
               FROM w),
         ev AS (SELECT DISTINCT g FROM u WHERE doc_id % ${TextAnalysis.EvalStride} = 0),
         contam AS (SELECT DISTINCT u.doc_id FROM u JOIN ev USING (g)
                    WHERE u.doc_id % ${TextAnalysis.EvalStride} <> 0),
         j AS (
           SELECT q.doc_id, q.source, q.n_tok,
                  (dr.doc_id IS NULL) AS s1,
                  (dr.doc_id IS NULL AND q.dfrac <= ${TextAnalysis.RepetitionThreshold}) AS s2,
                  (dr.doc_id IS NULL AND q.dfrac <= ${TextAnalysis.RepetitionThreshold}
                     AND c.doc_id IS NULL) AS s3
           FROM q
           LEFT JOIN drops dr ON dr.doc_id = q.doc_id
           LEFT JOIN contam c ON c.doc_id = q.doc_id
           WHERE q.doc_id % ${TextAnalysis.EvalStride} <> 0)
         SELECT source, count(*) AS n_pool,
                CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup,
                CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
                CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
                CAST(sum(CASE WHEN s3 THEN n_tok ELSE 0 END) AS BIGINT) AS clean_tokens
         FROM j GROUP BY 1 ORDER BY source""")
}
