package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the retrieval-prep family (RetrievalOps):
  * chunk coverage/overlap, posting-list bounds, and curriculum phase
  * balance — the properties the DuckDB oracle's value-equality cannot
  * itself explain. */
class RetrievalSpec extends SparkSpec {

  test("doc_chunk covers every token and overlaps by W - S") {
    val r = SparkEntry.queries("doc_chunk")(spark, sf0001).cache()
    // per-doc: chunk 0 starts at 0, strides are exactly S apart, and the
    // last chunk's window reaches the end of the document
    val docs = graft.Tables(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val agg = r.groupBy("doc_id").agg(
      min("start_tok").as("first_start"),
      max(col("start_tok") + col("n_tok_chunk")).as("covered_to"),
      count(lit(1)).as("n_chunks"),
      max("n_tok_chunk").as("max_w"))
    val joined = agg.join(docs, "doc_id").cache()
    assert(joined.filter(col("first_start") =!= 0L).count() == 0L)
    assert(joined.filter(col("covered_to") =!= col("n_tok")).count() == 0L,
      "a document's tail is not covered by its last chunk")
    assert(joined.filter(col("max_w") > 32L).count() == 0L)
    // short docs (n_tok <= W) must produce exactly one chunk
    assert(joined.filter(col("n_tok") <= 32L && col("n_chunks") =!= 1L).count() == 0L)
    // consecutive chunks of one doc overlap by exactly W - S = 8 tokens
    // wherever both are full windows
    val strides = r.filter(col("chunk_id") > 0)
      .select(col("doc_id"), (col("start_tok") - (col("chunk_id") * 24L)).as("drift"))
    assert(strides.filter(col("drift") =!= 0L).count() == 0L)
    joined.unpersist(); r.unpersist()
  }

  test("inverted_index bounds postings at K and orders terms by df") {
    val r = SparkEntry.queries("inverted_index")(spark, sf0001)
      .withColumn("n_post", size(split(col("postings"), ",")))
      .cache()
    assert(r.filter(col("n_post") > 16).count() == 0L, "posting list exceeds K")
    // postings are doc_id-ascending (string compare after numeric sort is
    // checked by the oracle; here check the numeric order directly)
    val unsorted = r.select(col("term"),
        transform(split(col("postings"), ","), _.cast("long")).as("p"))
      .filter(expr("exists(zip_with(p, slice(p, 2, size(p) - 1), (a, b) -> a >= b), x -> x)"))
    assert(unsorted.count() == 0L, "postings not strictly ascending")
    // df never increases down the returned (df DESC, term) order
    val rows = r.select("df").collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sortBy(-_)), "terms not ordered by df desc")
    r.unpersist()
  }

  test("bm25_chunks ranks chunks with spans inside their documents") {
    val r = SparkEntry.queries("bm25_chunks")(spark, sf0001)
      .collect().map(x => (x.getAs[Int]("rank"), x.getAs[Long]("doc_id"),
        x.getAs[Int]("chunk_id"), x.getAs[Long]("start_tok"),
        x.getAs[Long]("n_tok_chunk"), x.getAs[Long]("score_fp"),
        x.getAs[Long]("n_terms")))
    assert(r.nonEmpty && r.map(_._1).toSeq == (1 to r.length),
      "ranks must be dense from 1")
    // descending by (score, doc_id, chunk_id)
    assert(r.sliding(2).forall {
      case Array(a, b) => a._6 > b._6 ||
        (a._6 == b._6 && (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))
      case _ => true
    })
    // spans obey the chunk geometry: start = chunk_id * stride, length
    // in (0, window]; and the span lies inside the document's tokens
    val nTok = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.foreach { case (_, doc, chunk, start, len, score, nt) =>
      assert(start == chunk * 24L, s"start_tok must be chunk_id*stride")
      assert(len >= 1 && len <= 32, s"span length $len outside (0, 32]")
      assert(start + len <= nTok(doc), "span must end inside the document")
      assert(score > 0 && nt >= 1 &&
        nt <= graft.ops.RetrievalOps.Bm25Query.length)
    }
  }

  test("bm25_search ranks by descending score and prefers term-dense docs") {
    val r = SparkEntry.queries("bm25_search")(spark, sf0001)
      .collect().map(x => (x.getAs[Int]("rank"), x.getAs[Long]("doc_id"),
        x.getAs[Long]("score_fp"), x.getAs[Long]("n_terms")))
    assert(r.length == 20, s"top-K must fill at 20, got ${r.length}")
    assert(r.map(_._1).toSeq == (1 to 20), "ranks must be dense 1..20")
    // descending by (score, then doc_id for ties)
    assert(r.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) })
    // a doc can match at most the query's terms; every hit matched >= 1
    assert(r.forall(x => x._4 >= 1 &&
      x._4 <= graft.ops.RetrievalOps.Bm25Query.length))
    // the BM25 direction: the top hit must out-score a doc that matches
    // fewer distinct query terms than it (if any such doc is in the list)
    val top = r.head
    r.find(_._4 < top._4).foreach(worse => assert(top._3 > worse._3))
    // scores are positive: idf(+1 form) is nonnegative and tf >= 1
    assert(r.forall(_._3 > 0), "BM25 +1-idf scores must be positive")
  }

  test("curriculum_order phases quarter the corpus and track difficulty") {
    val r = SparkEntry.queries("curriculum_order")(spark, sf0001).cache()
    val n = r.count()
    val byPhase = r.groupBy("phase").count().collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(byPhase.keySet == Set(1, 2, 3, 4), s"phases present: ${byPhase.keySet}")
    // discrete quartiles: each phase holds 25% +/- the tie mass; at 500
    // docs with distinct-ish difficulties allow a generous 15-35% band
    for ((p, c) <- byPhase)
      assert(c >= n * 0.15 && c <= n * 0.35, s"phase $p holds $c of $n docs")
    // phase is monotone in difficulty: max difficulty of phase p is <= min
    // difficulty of phase p+1 (strict thresholds guarantee it)
    val bounds = r.groupBy("phase")
      .agg(min("difficulty").as("lo"), max("difficulty").as("hi"))
      .orderBy("phase").collect()
    for (i <- 0 until bounds.length - 1)
      assert(bounds(i).getDouble(2) <= bounds(i + 1).getDouble(1),
        s"phase ${i + 1} overlaps phase ${i + 2} in difficulty")
    r.unpersist()
  }

  test("search_hybrid_rrf fuses the two rank lists with exact RRF mass") {
    val rows = SparkEntry.queries("search_hybrid_rrf")(spark, sf0001).collect()
    def contrib(r: Any): Long = r match {
      case null => 0L
      case i: Int => math.round(1e9 / (60 + i))
      case _ => fail(s"rank of unexpected type: $r")
    }
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 8L).toSet)
    for ((q, qr) <- byQ) {
      val ranked = qr.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to ranked.length),
        s"q=$q ranks not dense from 1")
      assert(ranked.length <= 10)
      // the fused score IS the sum of the two lists' reciprocal masses
      for (r <- ranked) {
        val want = contrib(r.get(r.fieldIndex("lex_rank"))) +
          contrib(r.get(r.fieldIndex("vec_rank")))
        assert(r.getAs[Long]("rrf_fp") == want,
          s"q=$q id=${r.getAs[Long]("id")} rrf mismatch")
        assert(r.getAs[Long]("id") != q, "query doc leaked into its own list")
      }
      // fused order is non-increasing in rrf_fp
      val fps = ranked.map(_.getAs[Long]("rrf_fp"))
      assert(fps.zip(fps.tail).forall { case (a, b) => a >= b },
        s"q=$q fused scores not monotone")
      // fusion is real: with 20-deep legs over 500 docs some fused head
      // must carry BOTH ranks somewhere in the catalog output
    }
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("lex_rank")) &&
      !r.isNullAt(r.fieldIndex("vec_rank"))),
      "no fused row carries both a lexical and a vector rank")
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("lex_rank")) ||
      r.isNullAt(r.fieldIndex("vec_rank"))),
      "full-outer fusion never saw a single-list id (suspicious)")
  }
}
