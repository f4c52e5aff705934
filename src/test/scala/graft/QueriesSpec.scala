package graft

import org.apache.spark.sql.functions._

/** Invariant tests of the query catalog against sf0.001 (golden values are
  * the DuckDB oracle's job — Verify/compare; here we assert structural
  * properties). */
class QueriesSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("every catalog query runs and most return rows at sf0.001") {
    val counts = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      n -> q(n).count()
    }.toMap
    val empty = counts.filter(_._2 == 0).keys.toSeq.sorted
    // pair-style dedup queries may legitimately be empty at sf0.001
    // (the DCT hash is the strictest: near-median AC ties push planted
    // text near-dups past 3 bits on the tiny corpus — it pairs at
    // sf0.01), and the 200-part sf0.001 co-purchase graph has no
    // 80-core at all (CdcLinkSpec pins kcore against brute force)
    assert(empty.forall(n => n.startsWith("dedup_") || n.startsWith("simsearch")
      || n == "kcore" || n == "media_dcthash_dedup"),
      s"unexpectedly empty: $empty")
  }

  test("oracleSql covers only declared queries") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracle for unknown queries: $undeclared")
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("window_dedup keeps exactly one row per order") {
    val df = q("window_dedup")
    val total = df.count()
    assert(df.select("l_orderkey").distinct().count() == total)
  }

  test("cube_agg covers all grouping sets; grand total matches global count") {
    val rows = q("cube_agg").collect()
    val sets = rows.map(r => (r.getInt(2), r.getInt(3))).toSet
    assert(sets == Set((0, 0), (0, 1), (1, 0), (1, 1)),
      s"missing grouping sets: $sets")
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    val total = q("global_count").collect().head.getLong(0)
    assert(grand.length == 1 && grand.head.getLong(4) == total,
      "grand-total row must equal the global row count")
  }

  test("text_collocations are support-filtered and rank-ordered by PMI") {
    val rows = q("text_collocations").collect()
    assert(rows.nonEmpty)
    val pmis = rows.map(_.getLong(5))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b },
      "PMI scores must be non-increasing")
    rows.foreach(r => assert(r.getLong(2) >= 5, "support filter violated"))
  }

  test("agg_stats group counts sum to global count") {
    val total = q("global_count").collect().head.getLong(0)
    val sum = q("agg_stats").agg(org.apache.spark.sql.functions.sum("n_rows"))
      .collect().head.getLong(0)
    assert(sum == total)
  }

  test("sketch_rollup union estimates track exact distincts within 2%") {
    val exact = Tables(spark, sf0001, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = q("sketch_rollup").collect()
    assert(est.length == exact.size)
    est.foreach { r =>
      val (t, e) = (r.getString(0), r.getLong(2))
      val x = exact(t)
      assert(math.abs(e - x).toDouble / x <= 0.02,
        s"$t: sketch estimate $e vs exact $x")
      assert(r.getLong(1) > 1, "rollup must span multiple daily sketches")
    }
  }

  test("distinct_bottomk estimate tracks the exact distinct count") {
    val r = q("distinct_bottomk").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, est, exact) = (row.getLong(1), row.getDouble(2), row.getLong(3))
      if (n < 256) // sketch not saturated → the sketch IS the distinct set
        assert(est == exact.toDouble,
          s"unsaturated sketch must be exact: $est vs $exact")
      else // KMV rsd ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; 3σ bound ≈ 19%
        assert(math.abs(est - exact) / exact <= 0.19,
          s"bottom-k estimate $est vs exact $exact")
    }
  }

  test("approx_percentile tracks the exact percentiles within 1%") {
    // the sketch path must agree with its oracle-anchored exact twin to
    // within the configured rank accuracy (1/10000 rank error is far
    // tighter than 1% value error on these distributions)
    val exact = q("percentile_agg").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = q("approx_percentile").collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (e50, e95, ep50) = exact(r.getString(0))
      def relErr(a: Double, e: Double) = math.abs(a - e) / math.max(math.abs(e), 1e-9)
      assert(relErr(r.getDouble(1), e50) <= 0.01, s"q50 off: ${r.getDouble(1)} vs $e50")
      assert(relErr(r.getDouble(2), e95) <= 0.01, s"q95 off: ${r.getDouble(2)} vs $e95")
      assert(relErr(r.getDouble(3), ep50) <= 0.01, s"price_p50 off: ${r.getDouble(3)} vs $ep50")
    }
  }

  test("schedule_deviation diffs are clamped to ±600") {
    val bad = q("schedule_deviation")
      .filter(abs(col("avg_diff")) > 600).count()
    assert(bad == 0)
  }

  test("reliability values are probabilities") {
    val r = q("reliability")
    assert(r.filter(col("rel") < 0 || col("rel") > 1).count() == 0)
  }

  test("asof_join picks an order date at or before the event") {
    // every asof date must be <= the event day (events are 2024; orders <= 2001)
    val r = q("asof_join")
    assert(r.count() > 0)
    assert(r.filter(col("asof_date") > "2024-12-31").count() == 0)
  }

  test("spatial_join distances are within the threshold") {
    val r = q("spatial_join")
    assert(r.count() > 0)
    assert(r.filter(col("dist") > 0.15).count() == 0)
  }

  test("spatial_knn matches the brute-force nearest neighbors whenever they sit inside the coverage radius") {
    val got = q("spatial_knn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    assert(got.nonEmpty)
    val parts = Tables(spark, sf0001, "part").select("p_partkey").collect()
      .map(_.getLong(0))
    def lon(k: Long) = (k % 3600) / 10.0 - 180.0
    def lat(k: Long) = (k % 1700) / 10.0 - 85.0
    def d(a: Long, b: Long) = math.sqrt(
      (lon(a) - lon(b)) * (lon(a) - lon(b))
        + (lat(a) - lat(b)) * (lat(a) - lat(b)))
    got.foreach { case (cust, rows) =>
      // ranks are 1..n ordered by (dist, partkey)
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length))
      assert(sorted.map(r => (r._3, r._2)).toSeq ==
        sorted.map(r => (r._3, r._2)).sortBy(identity).toSeq)
      // exactness inside the coverage contract: every returned neighbor
      // closer than 5 degrees must be a true global nearest in order
      val brute = parts.map(p => (d(cust, p), p)).sorted.take(rows.length)
      sorted.zip(brute).foreach { case ((_, gp, gd, rk), (bd, bp)) =>
        if (bd < 5.0)
          assert(gp == bp && math.abs(gd - bd) < 1e-12,
            s"query $cust rank $rk: got ($gp, $gd) vs brute ($bp, $bd)")
      }
    }
  }

  test("geohash-bucketed spatial join equals the brute-force pair set") {
    import org.apache.spark.sql.functions.{sqrt => fsqrt}
    val got = q("spatial_join_geohash")
      .select("c_custkey", "p_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force in-test: cross join on derived coords
    val c = Tables(spark, sf0001, "customer")
      .select(col("c_custkey"),
        ((col("c_custkey") % 3600) / 10.0 - 180.0).as("clon"),
        ((col("c_custkey") % 1700) / 10.0 - 85.0).as("clat"))
    val p = Tables(spark, sf0001, "part")
      .select(col("p_partkey"),
        ((col("p_partkey") % 3600) / 10.0 - 180.0).as("plon"),
        ((col("p_partkey") % 1700) / 10.0 - 85.0).as("plat"))
    val expect = c.crossJoin(p)
      .filter(fsqrt((col("clon") - col("plon")) * (col("clon") - col("plon"))
        + (col("clat") - col("plat")) * (col("clat") - col("plat"))) <= 0.15)
      .select("c_custkey", "p_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(got.nonEmpty)
  }

  test("geo_enrich emits 7-char geohashes and 21-byte WKB hex") {
    val r = q("geo_enrich")
    assert(r.filter(length(col("geohash")) =!= 7).count() == 0)
    assert(r.filter(length(col("wkb_hex")) =!= 42).count() == 0)
  }

  test("top_unshipped is a descending top-10 with the date window enforced") {
    val rows = SparkEntry.queries("top_unshipped")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[String]("order_day"),
        r.getAs[Double]("revenue")))
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_._3)
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not descending")
    assert(rows.forall(_._2 < "1998-07-01"), "an order past the cut leaked in")
  }

  test("dataset_digest is partition-invariant and content-sensitive") {
    import spark.implicits._
    val base = Tables(spark, sf0001, "documents")
    val d1 = java.nio.file.Files.createTempDirectory("graft-dig1").toString
    val d8 = java.nio.file.Files.createTempDirectory("graft-dig8").toString
    val dx = java.nio.file.Files.createTempDirectory("graft-digx").toString
    base.coalesce(1).write.parquet(s"$d1/documents.parquet")
    // same rows, different partitioning AND row order
    base.repartition(8).write.parquet(s"$d8/documents.parquet")
    // one character flipped in one row
    base.withColumn("text", when(col("doc_id") === 0L,
        concat(col("text"), lit("!"))).otherwise(col("text")))
      .coalesce(1).write.parquet(s"$dx/documents.parquet")
    def dig(dir: String) = SparkEntry.queries("dataset_digest")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("digest"),
          r.getAs[Long]("digest_sum")))).toMap
    val (a, b, c) = (dig(d1), dig(d8), dig(dx))
    assert(a == b, "digest changed under repartitioning")
    assert(a != c, "a flipped row did not change the digest")
    // and the difference is localized to the altered row's source
    assert((a.toSet diff c.toSet).size == 1)
    // the parity-blind case the additive component exists for: replace
    // TWO copies of row A with TWO copies of row B — the XOR components
    // cancel (A^A = B^B = 0) and n_rows is unchanged, so only
    // digest_sum can see the corruption
    val dp = java.nio.file.Files.createTempDirectory("graft-digp").toString
    val dq = java.nio.file.Files.createTempDirectory("graft-digq").toString
    def two(txt: String) = Seq(
      (900001L, txt, "en", "srcP", txt.length.toLong),
      (900001L, txt, "en", "srcP", txt.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    two("alpha").coalesce(1).write.parquet(s"$dp/documents.parquet")
    two("omega").coalesce(1).write.parquet(s"$dq/documents.parquet")
    val (p, q) = (dig(dp)("srcP"), dig(dq)("srcP"))
    assert(p._1 == q._1 && p._2 == q._2,
      "fixture broken: the pair swap should be XOR-invisible")
    assert(p._3 != q._3, "digest_sum missed an even-multiplicity swap")
  }
}
