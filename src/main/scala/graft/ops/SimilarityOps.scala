package graft.ops

import graft.Tables
import graft.expr.{functions => gf}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Similarity search over the embedding column: brute-force cosine top-k
  * (the exactness baseline, oracle-checked) and a random-hyperplane
  * LSH-bucketed variant (the 100 TB path: bucket equi-join instead of a
  * cross product; recall measured against brute force in ScalaTest).
  */
object SimilarityOps {
  import DedupOps.{normed, normedSql, vdot, vdotSql}

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val TopK = 5
  private val NQueries = 8 // query set: vec_id < 8

  // Brute-force cosine top-k: queries × all candidates, ranked per query.
  private def bruteTopK(s: SparkSession, dir: String): DataFrame = {
    val e = normed(s, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      col("norm").as("c_norm"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("c_id"))
    q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (vdot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  private val bruteTopKSql =
    s"""WITH n AS ($normedSql),
       |sims AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ${vdotSql("q.embedding", "c.embedding")} / (q.norm * c.norm)
       |      AS cos_sim
       |  FROM n q JOIN n c ON q.vec_id < $NQueries
       |    AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos_sim DESC, c_id) AS rank
       |  FROM sims)
       |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM ranked
       |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin

  // LSH-bucketed ANN: multi-table random-hyperplane hashing. Each vector
  // gets L independent `Bits`-bit signatures (disjoint hyperplane sets);
  // candidates share a bucket in ANY table — the join is an equi-join on
  // (table, bucket), never a cross product, which is what survives 100 TB.
  // With per-bit agreement p = 1 − θ/π, recall@top-k ≈ 1 − (1 − p^Bits)^L.
  // Approximate — recall vs brute force is asserted in ScalaTest; driver
  // check is rows-only (bucketing not DuckDB-expressible).
  private val NTables = 16
  private val Bits = 6

  /** (table, bucket) pairs: table t uses hyperplanes [t*Bits, (t+1)*Bits). */
  private def buckets(vec: Column): Column =
    posexplode(array((0 until NTables).map(t =>
      graft.expr.functions.lsh_bucket_offset(vec, lit(Bits), lit(t * Bits))): _*))

  private def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = normed(s, dir)
    val tabs = e.select(col("vec_id"), col("embedding"), col("norm"),
        buckets(col("embedding")))
      .withColumnRenamed("pos", "tab")
      .withColumnRenamed("col", "bucket")
    val q = tabs.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("tab"), col("bucket"))
    val c = tabs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      col("norm").as("c_norm"), col("tab"), col("bucket"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("c_id"))
    q.join(c, Seq("tab", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("q_emb"), col("c_emb"),
        col("q_norm"), col("c_norm"))
      .dropDuplicates("q_id", "c_id") // candidate set = union over tables
      .select(col("q_id"), col("c_id"),
        (vdot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "simsearch_topk" -> (bruteTopK _),
    "simsearch_lsh" -> (lshTopK _))

  val oracle: Map[String, String] = Map(
    "simsearch_topk" -> bruteTopKSql)
}
