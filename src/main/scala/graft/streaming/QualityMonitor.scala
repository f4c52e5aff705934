package graft.streaming

import graft.ops.CorpusOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch `quality_classifier` SCORING pass: the
  * ingest-time quality gate a curation pipeline runs on every arriving
  * document, against a model trained offline ([[CorpusOps.qcFit]]).
  *
  * Scoring is deliberately STATELESS — a trained linear model makes the
  * gate a pure projection, so unlike the dedup/EMA monitors there is no
  * state store at all: the ≤256-bucket weight map rides along as a
  * broadcast literal and each micro-batch is scored with zero shuffle
  * (no explode/groupBy — the logit is an `aggregate` fold over the token
  * array; Long addition is associative and commutative, so the fold
  * equals the batch query's grouped Σ w_b·cnt_b exactly).
  *
  * Exactness contract (the [[EmaMonitor]] discipline): for any document,
  * the emitted (prob, pred) is EQUAL to the batch `quality_classifier`
  * row for that document under the same model — same exact BIGINT logit,
  * same double ops in the same order, same round-6 sigmoid — regardless
  * of how micro-batches partition the corpus, because no cross-document
  * computation exists at scoring time. Tokenless documents are dropped
  * (the batch query's inner-join-on-features semantics).
  */
object QualityMonitor {

  /** Score a documents-shaped stream (doc_id, text, source, …) with a
    * trained (weights, bias) model; emits (doc_id, source, prob, pred). */
  def scores(docs: DataFrame, w: Map[String, Long], bias: Long): DataFrame = {
    val wmap = typedLit(w)
    val weightOf = (t: org.apache.spark.sql.Column) =>
      if (w.isEmpty) lit(0L)
      else coalesce(element_at(wmap, substring(md5(t), 1, 2)), lit(0L))
    docs
      .withColumn("toks", filter(split(col("text"), " "), x => x =!= lit("")))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("zs",
        aggregate(col("toks"), lit(0L), (acc, t) => acc + weightOf(t)))
      .withColumn("z",
        col("zs").cast("double") /
          (col("n_toks").cast("double") * CorpusOps.QcScale)
          + lit(bias).cast("double") / CorpusOps.QcScale)
      .withColumn("prob", round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6))
      .select(col("doc_id"), col("source"), col("prob"),
        when(col("prob") > 0.5, 1).otherwise(0).as("pred"))
  }
}
