package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Dedup operators against a planted-duplicate fixture: synthetic documents
  * with exact copies and near-duplicates, written as a testdata-shaped dir
  * so the production queries run on it unchanged. */
class DedupSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-dedup").toString
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, base, "en", "src0"),
      (1L, base, "en", "src0"), // exact dup of 0
      (2L, base.replace("upsilon", "omega"), "en", "src1"), // near-dup of 0
      (3L, "completely different text with other words entirely here now " +
        "and nothing shared with the first group at all", "en", "src1"),
      (4L, "short", "en", "src2"),
      (5L, base + " extra tail tokens appended here", "en", "src2")) // near-dup
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_exact groups the exact copies") {
    val r = SparkEntry.queries("dedup_exact")(spark, fixtureDir).collect()
    val dupGroup = r.filter(_.getAs[Long]("n_copies") == 2)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keep_id") == 0L)
    assert(r.map(_.getAs[Long]("n_copies")).sum == 6)
  }

  test("dedup_ngram_jaccard finds the near-duplicates with high scores") {
    val r = SparkEntry.queries("dedup_ngram_jaccard")(spark, fixtureDir)
      .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"),
        x.getAs[Double]("jaccard"))).toSeq
    val pairs = r.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L))) // exact dup: jaccard 1.0
    assert(r.find(p => p._1 == 0L && p._2 == 1L).get._3 == 1.0)
    assert(pairs.contains((0L, 2L))) // near dup
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L)) // unrelated doc
  }

  test("dedup_minhash_lsh surfaces exact and near duplicates") {
    val r = SparkEntry.queries("dedup_minhash_lsh")(spark, fixtureDir)
      .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"),
        x.getAs[Double]("est_sim"))).toSeq
    val exact = r.find(p => p._1 == 0L && p._2 == 1L)
    assert(exact.isDefined && exact.get._3 == 1.0)
    assert(r.exists(p => p._1 == 0L && p._2 == 2L && p._3 >= 0.5))
  }

  test("dedup_simhash pairs the near-duplicates, not the unrelated doc") {
    val r = SparkEntry.queries("dedup_simhash")(spark, fixtureDir)
      .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"),
        x.getAs[Int]("hamming"))).toSeq
    val exact = r.find(p => p._1 == 0L && p._2 == 1L)
    assert(exact.isDefined && exact.get._3 == 0)
  }
}
