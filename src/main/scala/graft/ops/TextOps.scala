package graft.ops

import graft.Tables
import graft.expr.{functions => gf}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline extension
  * (driver north star): quality scoring, language ID, token statistics,
  * document fingerprinting — all over the `documents` table. Ratios are
  * exact integer divisions (identical doubles in both engines).
  */
object TextOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")
  private val stopArr: Column = array(Stopwords.map(lit): _*)
  private val stopSql = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  // Quality scoring: length / token stats / stopword ratio per document.
  private def quality(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents").select(
      col("doc_id"),
      col("lang"),
      col("n_chars"),
      length(col("text")).as("len"),
      size(toks).as("tok_cnt"),
      size(array_distinct(toks)).as("uniq_cnt"),
      size(filter(toks, x => array_contains(stopArr, x))).as("stop_cnt"))
      .withColumn("stop_ratio",
        col("stop_cnt").cast("double") / col("tok_cnt"))
      .withColumn("avg_tok_len",
        (col("len") - (col("tok_cnt") - 1)).cast("double") / col("tok_cnt"))
      .orderBy("doc_id")
  }

  private val qualitySql =
    s"""WITH q AS (
       |  SELECT doc_id, lang, n_chars, CAST(length(text) AS INT) AS len,
       |    CAST(len(string_split(text, ' ')) AS INT) AS tok_cnt,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS uniq_cnt,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> list_contains($stopSql, x))) AS INT) AS stop_cnt
       |  FROM documents)
       |SELECT doc_id, lang, n_chars, len, tok_cnt, uniq_cnt, stop_cnt,
       |  CAST(stop_cnt AS DOUBLE) / tok_cnt AS stop_ratio,
       |  CAST(len - (tok_cnt - 1) AS DOUBLE) / tok_cnt AS avg_tok_len
       |FROM q ORDER BY doc_id""".stripMargin

  // Language ID: n-gram/stopword heuristic. The synthetic corpus is the
  // same vocabulary across langs, so the heuristic is exercised for
  // determinism, not linguistic accuracy.
  private def langid(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (size(filter(toks, x => array_contains(stopArr, x))).cast("double")
          / size(toks)).as("ratio"))
      .withColumn("pred",
        when(col("ratio") >= 0.10, "en")
          .when(col("ratio") >= 0.04, "mixed")
          .otherwise("other"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred")
  }

  private val langidSql =
    s"""WITH r AS (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> list_contains($stopSql, x))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS ratio
       |  FROM documents)
       |SELECT lang,
       |  CASE WHEN ratio >= 0.10 THEN 'en'
       |       WHEN ratio >= 0.04 THEN 'mixed'
       |       ELSE 'other' END AS pred,
       |  count(*) AS n
       |FROM r GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin

  // Corpus token statistics: explode tokens, per-language totals/distinct.
  private def tokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"))
      .orderBy("lang")

  private val tokensSql =
    """SELECT lang, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
      |FROM (SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS tok
      |      FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  // BPE-ish tokenization: the GPT-2-style pre-tokenizer shape — runs of
  // letters, runs of digits, runs of other symbols, each optionally
  // space-prefixed. Kept to char classes + alternation so Java regex
  // (Spark) and RE2 (DuckDB) agree byte-for-byte; per-document counts are
  // the unit a token-budget pipeline actually bills by.
  private val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  private def tokensBpe(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe"))
      .orderBy("doc_id")

  private val tokensBpeSql =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '$BpePattern')) AS INT) AS n_bpe
       |FROM documents ORDER BY doc_id""".stripMargin

  // Document fingerprint: rolling polynomial hash — custom codegen'd
  // expression on the Spark side, mirrored in DuckDB by an identical
  // integer fold over characters (exact arithmetic → exact match).
  private def fingerprintQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), gf.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** DuckDB mirror of `TextHashOps.fingerprint` — the ONE copy of the
    * fold; every oracle that hashes text (here and in CorpusOps's
    * sample_split) must build on it so a kernel change cannot silently
    * desync one of them. */
  private[ops] def fingerprintFoldSql(col: String): String =
    s"""list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split($col, ''),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |    (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  private val fingerprintSql =
    s"""SELECT doc_id,
       |  ${fingerprintFoldSql("text")} AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality" -> (quality _),
    "text_langid" -> (langid _),
    "text_tokens" -> (tokens _),
    "text_tokens_bpe" -> (tokensBpe _),
    "text_fingerprint" -> (fingerprintQ _))

  val oracle: Map[String, String] = Map(
    "text_quality" -> qualitySql,
    "text_langid" -> langidSql,
    "text_tokens" -> tokensSql,
    "text_tokens_bpe" -> tokensBpeSql,
    "text_fingerprint" -> fingerprintSql)
}
