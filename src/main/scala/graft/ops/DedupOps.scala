package graft.ops

import graft.Tables
import graft.expr.{functions => gf}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact (hash
  * groupBy), MinHash+LSH (shingle → signature → band → bucket equi-join),
  * SimHash (band-keyed hamming pairs), and n-gram Jaccard. All pair
  * generation goes through equi-join keys (hash buckets / bands), never a
  * cross join — the property that keeps these runnable at 100 TB.
  */
object DedupOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // Exact dedup: group documents by content hash; keep canonical min id.
  private def exact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .orderBy("text_hash")

  private val exactSql =
    """SELECT md5(text) AS text_hash, count(*) AS n_copies,
      |  min(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // n-gram (word 3-shingle) Jaccard similarity over candidate pairs that
  // share at least one shingle — the shingle equi-join is the candidate
  // generator (no cross product). Exact integer ratio → exact oracle match.
  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), gf.shingles(col("text"), lit(3)).as("shs"))
      .withColumn("n_sh", size(col("shs")))
    val ex = docs.select(col("doc_id"), col("n_sh"),
      explode(col("shs")).as("shingle"))
    val a = ex.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"),
      col("shingle"))
    val b = ex.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"),
      col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_n", "b_n")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter")))
      .filter(col("inter") >= 2)
      .select("a_id", "b_id", "inter", "jaccard")
      .orderBy("a_id", "b_id")
  }

  private val ngramJaccardSql =
    """WITH tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
      |    ELSE [] END AS shs
      |  FROM tk),
      |ex AS (
      |  SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS shingle FROM sh)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter,
      |  CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) AS jaccard
      |FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
      |HAVING count(*) >= 2
      |ORDER BY a_id, b_id""".stripMargin

  // MinHash + LSH: k=32 signature over word 2-shingles, 8 bands × 4 rows.
  // Documents sharing any band hash become candidates (equi-join on
  // (band, hash)); candidate similarity estimated from full-signature
  // agreement. Custom signature expression is not DuckDB-expressible →
  // rows-only driver check; ScalaTest covers planted near-duplicates.
  private val K = 32
  private val Bands = 8
  private val Rows = K / Bands

  private def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), gf.minhash(col("text"), lit(K), lit(2)).as("sig"))
    val bands = docs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map(i =>
        xxhash64(slice(col("sig"), i * Rows + 1, Rows))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bhash")
    val a = bands.select(col("doc_id").as("a_id"), col("sig").as("a_sig"),
      col("band"), col("bhash"))
    val b = bands.select(col("doc_id").as("b_id"), col("sig").as("b_sig"),
      col("band"), col("bhash"))
    a.join(b, Seq("band", "bhash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (gf.sig_agree(col("a_sig"), col("b_sig")).cast("double") / K)
          .as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= 0.2)
      .orderBy("a_id", "b_id")
  }

  // SimHash near-dup pairs: 64-bit simhash, banded into 4×16-bit keys
  // (pigeonhole: hamming ≤ 3 ⇒ at least one band identical); candidates
  // from the band equi-join, verified with bit_count(xor).
  private def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), gf.simhash(col("text"), lit(2)).as("sh"))
    val bands = docs.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkey")
    val a = bands.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
      col("band"), col("bkey"))
    val b = bands.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
      col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 16)
      .orderBy("a_id", "b_id")
  }

  // Embedding cosine near-dup: full pairwise over the embeddings table,
  // with the LSH-bucketed variant in SimilarityOps as the scale path.
  // Norms are computed once per vector; dot product is an element-ordered
  // fold — identical doubles in both engines, so the threshold filter and
  // output values match the oracle exactly with no rounding.
  private[ops] def vdot(x: Column, y: Column): Column = gf.vec_dot(x, y)

  private[ops] def vdotSql(x: String, y: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(" +
      s"list_zip(CAST($x AS DOUBLE[]), CAST($y AS DOUBLE[])), " +
      s"p -> p[1] * p[2])), (acc, v) -> acc + v)"

  /** (vec_id, embedding, norm) projection shared by the cosine operators. */
  private[ops] def normed(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
      sqrt(vdot(col("embedding"), col("embedding"))).as("norm"))

  private[ops] val normedSql: String =
    s"SELECT vec_id, embedding, sqrt(${vdotSql("embedding", "embedding")}) AS norm FROM embeddings"

  private def embeddingCosine(s: SparkSession, dir: String): DataFrame = {
    val e = normed(s, dir)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("norm").as("a_norm"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      col("norm").as("b_norm"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (vdot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")))
          .as("cos_sim"))
      .filter(col("cos_sim") >= 0.35)
      .orderBy("a_id", "b_id")
  }

  private val embeddingCosineSql =
    s"""WITH n AS ($normedSql)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  ${vdotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE ${vdotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) >= 0.35
       |ORDER BY a_id, b_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhashPairs _),
    "dedup_embedding" -> (embeddingCosine _))

  val oracle: Map[String, String] = Map(
    "dedup_exact" -> exactSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_embedding" -> embeddingCosineSql)
}
