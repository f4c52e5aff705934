package graft

import graft.ops.{CdcOps, LinkOps}
import org.apache.spark.sql.functions._

/** Invariants for the CDC (merge/SCD2) and link (fuzzy join / PageRank)
  * operators; exact values are the DuckDB oracle's job. */
class CdcLinkSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("merge_upsert keeps exactly one row per (user, type), the latest") {
    val df = q("merge_upsert").cache()
    val total = df.count()
    assert(total > 0)
    assert(df.select("user_id", "event_type").distinct().count() == total)
    // every surviving row is the max-us row of its key (ties by event_id)
    val worse = df.as("m")
      .join(Tables(spark, sf0001, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us2"), col("event_id").as("eid2")).as("e"),
        Seq("user_id", "event_type"))
      .filter(col("us2") > col("us") ||
        (col("us2") === col("us") && col("eid2") > col("event_id")))
    assert(worse.count() == 0, "a newer event than the merged row exists")
  }

  test("applyChanges supports tombstones as a post-merge filter") {
    import spark.implicits._
    val base = Seq((1L, "a", 10L, 1L, 1.0), (2L, "a", 10L, 2L, 2.0))
      .toDF("user_id", "event_type", "us", "event_id", "value")
    val changes = Seq((1L, "a", 20L, 3L, Double.NaN), (3L, "a", 20L, 4L, 3.0))
      .toDF("user_id", "event_type", "us", "event_id", "value")
    // NaN value = tombstone convention for this test
    val merged = CdcOps.applyChanges(base, changes)
      .filter(!isnan(col("value")))
    val keys = merged.select("user_id").as[Long].collect().sorted
    assert(keys.toSeq == Seq(2L, 3L), s"got ${keys.toSeq}")
  }

  test("scd2 intervals are disjoint, ordered, and have one current row per key") {
    val df = q("scd2_intervals").cache()
    assert(df.count() > 0)
    // exactly one open interval per key
    val open = df.filter(col("is_current"))
      .groupBy("user_id", "event_type").count()
      .filter(col("count") =!= 1)
    assert(open.count() == 0)
    // valid_to equals the next row's valid_from (half-open chain)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("valid_from_us", "event_id")
    val broken = df
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("valid_to_us").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
    assert(broken.count() == 0, "validity chain must be gapless")
  }

  test("fuzzy_join pairs are blocked, ordered, within distance") {
    val rows = q("fuzzy_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(a < b, "pair must be canonically ordered")
      assert(d >= 1 && d <= LinkOps.MaxDist, s"distance $d out of range")
      val (at, bt) = (a.split(" "), b.split(" "))
      assert(at.head == bt.head || at.last == bt.last,
        s"candidate ($a, $b) agrees on neither blocking token")
    }
  }

  test("pagerank assigns every node a positive rank; mass concentrates on connected parts") {
    val df = q("pagerank").cache()
    val parts = Tables(spark, sf0001, "part").count()
    assert(df.count() == parts, "one rank per part")
    assert(df.filter(col("rank") <= 0).count() == 0)
    val isolatedRank = 0.15 / parts // fixed point of an in-degree-0 node
    val connected = LinkOps.coPurchaseEdges(spark, sf0001)
      .select(col("dst").as("p_partkey")).distinct()
    val minConnected = df.join(connected, "p_partkey")
      .agg(min(col("rank"))).head().getDouble(0)
    assert(minConnected > isolatedRank,
      "nodes with in-edges must out-rank the isolated fixed point")
  }

  test("pagerank is deterministic across runs (per-iteration rounding)") {
    val a = q("pagerank").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = q("pagerank").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.sameElements(b))
  }

  test("triangle_count matches a brute-force enumeration at sf0.001") {
    val row = q("triangle_count").head()
    val und = LinkOps.coPurchaseEdges(spark, sf0001)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).cache()
    assert(row.getAs[Long]("n_edges") == und.count())
    // brute force: three edges (u<v), (v<w), (u<w) close a triangle once
    val e1 = und.select(col("u").as("a"), col("v").as("b"))
    val e2 = und.select(col("u").as("b"), col("v").as("c"))
    val e3 = und.select(col("u").as("a"), col("v").as("c"))
    val brute = e1.join(e2, "b").join(e3, Seq("a", "c")).count()
    assert(row.getAs[Long]("n_triangles") == brute,
      s"oriented count ${row.getAs[Long]("n_triangles")} != brute $brute")
    val t = row.getAs[Double]("transitivity")
    assert(t >= 0.0 && t <= 1.0)
  }

  test("fuzzy_resolve clusters are closed over the fuzzy pair graph") {
    val clusters = q("fuzzy_resolve").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    // every fuzzy pair's endpoints landed in the same cluster, and the
    // canonical id is a real member id (min-label ⇒ ≤ every member key)
    q("fuzzy_join").collect().foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(clusters(a) == clusters(b), s"pair ($a, $b) split across clusters")
    }
    assert(clusters.values.toSet.subsetOf(
      Tables(spark, sf0001, "part").groupBy("p_name")
        .agg(min("p_partkey").as("nid")).collect()
        .map(_.getLong(1)).toSet),
      "canonical ids must be member name-keys")
  }

  test("q-gram blocking recovers pairs token blocking must miss") {
    import spark.implicits._
    import graft.ops.LinkOps
    // one edit in the FIRST token and one in the LAST: no shared
    // first/last-token block exists, so the token pass provably yields
    // nothing — while the pair still shares plenty of rare 3-grams
    val names = Seq("chartreuse widget", "chartreusa widgex").toDF("p_name")
    assert(LinkOps.fuzzyPairsOf(names).isEmpty,
      "token blocking unexpectedly found the double-edit pair")
    val qg = LinkOps.qgramPairsOf(names).collect()
    assert(qg.length == 1 && qg.head.getInt(2) == 2,
      s"q-gram pass missed the planted pair: ${qg.toSeq}")
    // and on the real corpus the recall pass is a superset in spirit:
    // every token-blocked pair that shares at least one rare gram is
    // found by the q-gram pass too (sanity against fan-out pruning)
    val tok = q("fuzzy_join").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val qgAll = q("fuzzy_join_qgram").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert((qgAll -- tok).nonEmpty,
      "q-gram pass found no pairs beyond token blocking on the corpus")
  }

  test("gated resolve breaks the ER chain-merge counter-example") {
    import spark.implicits._
    import graft.ops.{DedupOps, LinkOps}
    // the canonical over-merge, planted with verified distances: all
    // three names share the "red" block; mud–wood is 3 edits over 8
    // chars and mud–woods 4 over 9 (low confidence, both > 0.25) while
    // wood–woods is 1 edit over 9 (a true variant). Ungated closure
    // merges all three; the normalized-distance gate must keep the
    // low-confidence links out so "red mud" stays separate.
    val names = Seq("red mud", "red wood", "red woods").toDF("p_name")
    val pairs = LinkOps.fuzzyPairsOf(names)
    val got = pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("red mud", "red wood"), ("red mud", "red woods"),
      ("red wood", "red woods")), s"unexpected candidate pairs: $got")
    val gated = LinkOps.gateNorm(pairs).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gated == Set(("red wood", "red woods")),
      s"gate admitted a low-confidence link: $gated")
    // closure over the gated edges: {red wood, red woods} merge, the
    // low-confidence neighbor "red mud" stays its own cluster
    def clustersOf(ps: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val key = names.select(col("p_name"),
        length(col("p_name")).cast("long").as("nid")) // any distinct key
      val a = key.select(col("p_name").as("a_name"), col("nid").as("ua"))
      val b = key.select(col("p_name").as("b_name"), col("nid").as("ub"))
      val keyed = ps.join(a, "a_name").join(b, "b_name")
      val edges = keyed.select(col("ua").as("u"), col("ub").as("v"))
        .union(keyed.select(col("ub").as("u"), col("ua").as("v")))
      val (labels, _) = DedupOps.propagateMin(edges)
      key.join(labels, key("nid") === labels("doc_id"), "left")
        .select(col("p_name"), coalesce(col("label"), col("nid")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val ungated = clustersOf(pairs)
    assert(ungated("red mud") == ungated("red woods"),
      "ungated closure should chain the counter-example (it documents the bug)")
    val fixed = clustersOf(LinkOps.gateNorm(pairs))
    assert(fixed("red wood") == fixed("red woods"), "true variants must merge")
    assert(fixed("red mud") != fixed("red woods"),
      "gated closure still chains the counter-example endpoints")
    // and the catalog entry only ever merges gate-surviving pairs
    val cat = q("fuzzy_resolve_gated").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cat.nonEmpty)
    val admitted = LinkOps.gateNorm(
      LinkOps.fuzzyPairsOf(Tables(spark, sf0001, "part")
        .select(col("p_name")).distinct()))
      .collect().map(r => (r.getString(0), r.getString(1)))
    admitted.foreach { case (a, b) =>
      assert(cat(a) == cat(b), s"gated pair ($a, $b) split across clusters") }
  }

  test("quality_gate reasons partition the corpus consistently") {
    val rows = q("quality_gate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val keep = r.getBoolean(r.fieldIndex("keep"))
      val reason = r.getAs[String]("reason")
      assert(keep == (reason == null), "keep must mean exactly no-reason")
    }
    val kept = rows.count(_.getBoolean(rows.head.fieldIndex("keep")))
    assert(kept > 0 && kept < rows.length,
      s"gate must split the corpus, kept $kept of ${rows.length}")
  }

  test("kcore peeling matches a brute-force fixpoint at sf0.001") {
    // k=60 keeps a non-trivial core at this SF (the catalog's k=80
    // dissolves the 200-part graph — also asserted below)
    val (edges, rounds) = LinkOps.kcoreEdges(spark, sf0001, 60)
    assert(rounds <= LinkOps.KcoreRounds, s"no fixpoint within 8 rounds: $rounds")
    val got = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force on the collected sf0.001 graph
    var alive = collection.mutable.Set[Long]()
    val und = LinkOps.coPurchaseEdges(spark, sf0001)
      .filter(col("src") < col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k2, vs) => k2 -> vs.map(_._2).toSet }
    alive ++= adj.keys
    var changed = true
    while (changed) {
      val drop = alive.filter(x => adj(x).count(alive) < 60)
      changed = drop.nonEmpty
      alive --= drop
    }
    val expect = und.filter { case (u, v) => alive(u) && alive(v) }.toSet
    assert(got == expect, s"${got.size} vs ${expect.size} core edges")
    // the catalog k: empty core here, converges well within the unroll
    val (e80, r80) = LinkOps.kcoreEdges(spark, sf0001, LinkOps.KcoreK)
    assert(e80.count() == 0 && r80 <= LinkOps.KcoreRounds)
    // both peel regimes agree: pin the margin cap to 0 to force the
    // distributed rounds (the driver-local endgame, certified exact,
    // must produce the identical subgraph AND round count)
    spark.conf.set(LinkOps.KcoreLocalMaxIdsKey, "0")
    try {
      val (eDist, rDist) = LinkOps.kcoreEdges(spark, sf0001, 60)
      val gotDist = eDist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotDist == got, "distributed peel diverges from endgame")
      assert(rDist == rounds, s"round counts diverge: $rDist vs $rounds")
    } finally spark.conf.unset(LinkOps.KcoreLocalMaxIdsKey)
  }

  test("embed_centroids cosines are bounded and cover every vector") {
    val df = q("embed_centroids").cache()
    val bad = df.filter(
      col("avg_cos_to_centroid") > 1.000001 ||
        col("min_cos_to_centroid") > col("avg_cos_to_centroid") ||
        col("centroid_norm") <= 0)
    assert(bad.count() == 0)
    val total = df.agg(sum(col("n_vecs"))).head().getLong(0)
    assert(total == Tables(spark, sf0001, "embeddings").count())
  }

  test("text_repetition fractions are consistent with text_quality token counts") {
    val rep = q("text_repetition")
    val bad = rep.filter(
      col("uniq_frac") <= 0 || col("uniq_frac") > 1 ||
        col("top_token_frac") <= 0 || col("top_token_frac") > 1 ||
        col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1)
    assert(bad.count() == 0)
    // a doc's top token occurs at least once, so frac·n ≥ 1 (up to the
    // 6-decimal rounding of the published fraction)
    val impossible = rep.filter(
      col("top_token_frac") * col("n_tokens") < lit(1.0 - 1e-3))
    assert(impossible.count() == 0)
  }

  test("mv_incremental merge covers base-only, delta-only, and shared keys") {
    val mv = SparkEntry.queries("mv_incremental")(spark, sf0001)
    val o = Tables(spark, sf0001, "orders")
    // lossless: merged counts add back up to the full fact
    assert(mv.agg(sum("n_orders")).head.getLong(0) == o.count())
    val split = lit(graft.ops.CdcOps.MvSplit).cast("timestamp")
    val baseMonths = o.filter(col("o_orderdate") < split)
      .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct()
      .collect().map(_.getString(0)).toSet
    val deltaMonths = o.filter(col("o_orderdate") >= split)
      .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct()
      .collect().map(_.getString(0)).toSet
    // the split leaves keys on both sides — otherwise the full-outer
    // merge (the part under test) would be vacuous
    assert((baseMonths -- deltaMonths).nonEmpty)
    assert((deltaMonths -- baseMonths).nonEmpty)
    val months = mv.select("month").distinct()
      .collect().map(_.getString(0)).toSet
    assert(months == (baseMonths ++ deltaMonths))
    // every published measure is populated (null-safe min/max merge)
    assert(mv.filter(col("total").isNull || col("min_price").isNull ||
      col("max_price").isNull).count() == 0)
  }
}
