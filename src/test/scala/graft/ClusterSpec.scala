package graft

import org.apache.spark.sql.functions._

/** Behavior of the distributed k-means fit and the cluster-blocked
  * semantic dedup (`ClusterOps`) — the cross-engine value parity itself
  * is covered by the embed_kmeans / dedup_semantic oracle entries. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("embed_kmeans assigns every vector to a live cell") {
    val r = SparkEntry.queries("embed_kmeans")(spark, sf0001).collect()
    val n = Tables(spark, sf0001, "embeddings").count()
    assert(r.length == n)
    val cells = r.map(_.getInt(1)).distinct.sorted
    assert(cells.forall(c => c >= 0 && c < graft.ops.ClusterOps.K))
    // K seeds drawn from the data: every cell keeps members on this corpus
    assert(cells.length == graft.ops.ClusterOps.K)
    // cosine to own (unit) centroid is a valid cosine
    assert(r.forall(row => row.getDouble(2) >= -1.0001 && row.getDouble(2) <= 1.0001))
  }

  test("embed_kmeans is deterministic across invocations") {
    val a = SparkEntry.queries("embed_kmeans")(spark, sf0001).collect()
    val b = SparkEntry.queries("embed_kmeans")(spark, sf0001).collect()
    assert(a.sameElements(b))
  }

  test("dedup_semantic drops are a subset of the brute-force anchor") {
    val sem = SparkEntry.queries("dedup_semantic")(spark, sf0001)
      .select("drop_id", "keep_id").as[(Long, Long)].collect().toSet
    val exact = SparkEntry.queries("dedup_embedding_exact")(spark, sf0001)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map { case (a, b) => (b, a) }.toSet // drop the higher id
    // blocked candidates can only be a subset of the all-pairs anchor,
    // and each published (drop, keep) must be a real above-threshold pair
    assert(sem.nonEmpty)
    assert(sem.subsetOf(exact))
  }

  test("dedup_semantic recovers planted duplicates with their source as keeper") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sem").toString
    val base = Tables(spark, sf0001, "embeddings")
    // plant exact copies of three originals under high ids: cos = 1, the
    // argmax cell agrees by construction, so the blocked join MUST pair
    // each copy with its source (or an equally-identical lower id)
    val copies = base.filter(col("vec_id").isin(100L, 200L, 300L))
      .select((col("vec_id") + 9000L).as("vec_id"), col("embedding"),
        col("label"))
    base.select("vec_id", "embedding", "label").unionByName(copies)
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val outMap = SparkEntry.queries("dedup_semantic")(spark, dir)
      .select("drop_id", "keep_id").as[(Long, Long)].collect().toMap
    Seq(9100L, 9200L, 9300L).foreach { c =>
      assert(outMap.contains(c), s"planted copy $c not dropped")
      assert(outMap(c) == c - 9000L, s"copy $c kept ${outMap(c)}")
    }
  }
}
