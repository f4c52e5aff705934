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

  test("cluster_quota keeps the per-cell quality top-Q, consistent with the kmeans assignment") {
    val quota = SparkEntry.queries("cluster_quota")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getBoolean(4)))
    val km = SparkEntry.queries("embed_kmeans")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(quota.length == km.size) // one verdict per document
    // cells agree with the shared fit, kept <=> rank within quota
    quota.foreach { case (id, cell, _, rk, kept) =>
      assert(cell == km(id), s"doc $id cell $cell != kmeans ${km(id)}")
      assert(kept == (rk <= 40), s"doc $id kept flag inconsistent")
    }
    // within each cell: ranks are 1..n and ordered by (n_chars desc, id)
    quota.groupBy(_._2).foreach { case (cell, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to rows.length))
      val resorted = rows.sortBy(r => (-r._3, r._1))
      assert(resorted.map(_._1).toSeq == byRank.map(_._1).toSeq,
        s"cell $cell rank order is not (n_chars desc, doc_id)")
    }
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
