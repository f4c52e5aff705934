package graft

import graft.expr.{GeohashOps, TextHashOps}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-preparation operators (CorpusOps/LayoutOps) + their kernels. */
class CorpusSpec extends SparkSpec {

  test("nfc kernel composes combining sequences and is idempotent") {
    def nfc(s: String) = TextHashOps.nfc(UTF8String.fromString(s)).toString
    val combining = "Café" // e + U+0301
    assert(nfc(combining) == "Café") // precomposed é
    assert(nfc(combining).length == 4)
    assert(nfc(nfc(combining)) == nfc(combining))
    assert(nfc("plain ascii") == "plain ascii")
  }

  test("zorder kernel interleaves bits (x even, y odd)") {
    assert(GeohashOps.zorder(0, 0, 10) == 0L)
    assert(GeohashOps.zorder(3, 1, 2) == 7L) // x=11,y=01 → 0111
    assert(GeohashOps.zorder(0, 3, 2) == 10L) // y bits at odd positions
    assert(GeohashOps.zorder(1023, 1023, 10) == (1L << 20) - 1)
    // locality: same 64×64 tile (top 4 bits of both axes) → same z >> 12
    val (x1, y1, x2, y2) = (130, 515, 180, 570)
    assert((x1 >> 6) == (x2 >> 6) && (y1 >> 6) == (y2 >> 6))
    assert(GeohashOps.zorder(x1, y1, 10) >> 12 ==
      GeohashOps.zorder(x2, y2, 10) >> 12)
  }

  test("hilbert kernel: canonical walk, bijection, unit-step adjacency (the property z-order lacks)") {
    import GeohashOps.hilbert
    // order 1: the canonical U — (0,0) (0,1) (1,1) (1,0)
    assert(hilbert(0, 0, 1) == 0L && hilbert(0, 1, 1) == 1L &&
      hilbert(1, 1, 1) == 2L && hilbert(1, 0, 1) == 3L)
    // order 3 (8×8): d is a bijection onto 0..63 and EVERY consecutive
    // pair of indices is grid-adjacent — z-order jumps at every
    // power-of-two boundary (e.g. z(1,0)=1 → z(0,1)=2 is a diagonal;
    // worse at tile seams), which is exactly why Hilbert-sorted layouts
    // touch fewer row groups per 2-D range scan
    val byD = (for { x <- 0 until 8; y <- 0 until 8 }
      yield hilbert(x, y, 3) -> ((x, y))).toMap
    assert(byD.keySet == (0L until 64L).toSet)
    (0L until 63L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
    // like zorder, only the low `bits` bits of each input are read
    assert(hilbert(5 + 8, 2, 3) == hilbert(5, 2, 3))
    assert(hilbert(5, 2 + 16, 3) == hilbert(5, 2, 3))
  }

  test("split_drift G-statistic and deviations match an in-memory recomputation") {
    import org.apache.spark.sql.functions._
    val strata = Tables(spark, sf0001, "documents")
      .select(col("source"), col("lang"),
        (graft.expr.functions.fingerprint(col("text")) % 100).as("b"))
      .collect().map { r =>
        val split = if (r.getLong(2) < 80) "train"
          else if (r.getLong(2) < 90) "val" else "test"
        (split, r.getString(0), r.getString(1))
      }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val train = strata.collect { case ((s, src, l), c) if s == "train" =>
      (src, l) -> c }.toMap
    val nTrain = train.values.sum
    def halfUp(x: Double): Long =
      new java.math.BigDecimal(x).setScale(0,
        java.math.RoundingMode.HALF_UP).longValueExact()
    val got = SparkEntry.queries("split_drift")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set("test", "val"))
    Seq("test", "val").foreach { sp =>
      val obs = strata.collect { case ((s, src, l), c) if s == sp =>
        (src, l) -> c }.toMap
      // universe = observed ∪ train strata (train-only strata are the
      // missing direction the one-sided version was blind to)
      val universe = obs.keySet ++ train.keySet
      val n = obs.values.sum
      val g = universe.toSeq.map { k =>
        val o = obs.getOrElse(k, 0L)
        train.get(k).filter(_ => o > 0).map(t =>
          halfUp(20000.0 * o * math.log(o.toDouble * nTrain / (n.toDouble * t))))
          .getOrElse(0L)
      }.sum
      val novel = universe.count(k => obs.contains(k) && !train.contains(k))
      val missing = universe.count(k => !obs.contains(k))
      val maxDev = universe.toSeq.map { k =>
        math.floor(math.abs(obs.getOrElse(k, 0L).toDouble / n
          - train.getOrElse(k, 0L).toDouble / nTrain) * 1e6).toLong }.max
      val (gn, gStrata, gNovel, gMissing, gg, gDev) = got(sp)
      assert((gn, gStrata.toInt, gNovel.toInt, gMissing.toInt) ==
        ((n, universe.size, novel, missing)), s"$sp counts drifted")
      assert(gg == g, s"$sp G: engine $gg vs recomputed $g")
      assert(gDev == maxDev, s"$sp max_dev: engine $gDev vs $maxDev")
    }
  }

  test("quality_calibration matches an in-memory reliability recomputation") {
    val probs = SparkEntry.queries("quality_classifier")(spark, sf0001)
      .collect().map(r => (r.getAs[Int]("y"), r.getAs[Double]("prob")))
    val micro = probs.map { case (y, p) => (y, math.round(p * 1e6)) }
    val (mn, mx) = (micro.map(_._2).min, micro.map(_._2).max)
    val expect = micro.groupBy { case (_, pm) =>
        math.min((pm - mn) * 10 / (mx - mn + 1), 9L).toInt }
      .map { case (b, rs) =>
        val n = rs.length.toLong
        val pos = rs.map(_._1.toLong).sum
        val conf = rs.map(_._2).sum
        b -> ((n, pos, math.floor(pos.toDouble * 1e6 / n).toLong,
          math.floor(conf.toDouble / n).toLong))
      }
    val got = SparkEntry.queries("quality_calibration")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (b, (n, pos, acc, conf, gap)) =>
      val (en, epos, eacc, econf) = expect(b)
      assert((n, pos, acc, conf) == ((en, epos, eacc, econf)),
        s"bin $b drifted: got ($n,$pos,$acc,$conf) vs ($en,$epos,$eacc,$econf)")
      assert(gap == math.abs(acc - conf))
    }
    // bin mass conserves the corpus
    assert(got.values.map(_._1).sum == probs.length.toLong)
  }

  test("tokenizer_fertility reconciles with bpe_encode doc totals") {
    val fert = SparkEntry.queries("tokenizer_fertility")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    val meta = Tables(spark, sf0001, "documents")
      .select("doc_id", "source", "lang", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    val enc = SparkEntry.queries("bpe_encode")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = enc.groupBy(e => (meta(e._1)._1, meta(e._1)._2))
      .map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum,
          rs.map(e => meta(e._1)._3).sum)) }
    assert(fert.keySet == expect.keySet)
    fert.foreach { case (k, (docs, words, bpe, chars, tpw, cpt)) =>
      val (ed, ew, eb, ec) = expect(k)
      assert((docs, words, bpe, chars) == ((ed, ew, eb, ec)),
        s"$k totals drifted")
      // the op scales in DOUBLE (the 100 TB-safe path) — mirror that here
      assert(tpw == math.floor(bpe.toDouble * 1e6 / words).toLong &&
        cpt == math.floor(chars.toDouble * 1e6 / bpe).toLong,
        s"$k ppm arithmetic drifted")
    }
  }

  test("layout_prune_stats: identical selection, valid bounds, hilbert never touches more groups") {
    val rows = SparkEntry.queries("layout_prune_stats")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("hilbert", "zorder"))
    val (hg, ht, hb) = rows("hilbert"); val (zg, zt, zb) = rows("zorder")
    // the layout permutes rows, never the data: same groups, same box hits
    assert(hg == zg && hb == zb)
    // touched is at least the information-theoretic floor (the box rows
    // must live SOMEWHERE) and at most everything
    val g = 1L << graft.ops.LayoutOps.PruneShift
    val floor = (hb + g - 1) / g
    assert(ht >= floor && zt >= floor && ht <= hg && zt <= zg)
    // the claim the operator exists to measure: the jump-free curve's
    // bounding boxes never lose to Morton's (strict wins appear once
    // groups are fine relative to the grid — 146 vs 154 at sf1; ties at
    // spec scale are honest, a hilbert loss is a bug)
    assert(ht <= zt, s"hilbert touched $ht > zorder $zt")
  }

  test("zorder3 kernel interleaves three axes (x at 3i, y at 3i+1, z at 3i+2)") {
    assert(GeohashOps.zorder3(0, 0, 0, 10) == 0L)
    assert(GeohashOps.zorder3(1, 0, 0, 1) == 1L)
    assert(GeohashOps.zorder3(0, 1, 0, 1) == 2L)
    assert(GeohashOps.zorder3(0, 0, 1, 1) == 4L)
    // x=11,y=01,z=10 → bits z1 y1 x1 z0 y0 x0 = 1 0 1 0 1 1 = 43
    assert(GeohashOps.zorder3(3, 1, 2, 2) == 43L)
    assert(GeohashOps.zorder3(1023, 1023, 1023, 10) == (1L << 30) - 1)
    // full 21-bit keys stay in a long; 22 bits is refused loudly
    assert(GeohashOps.zorder3((1 << 21) - 1, (1 << 21) - 1, (1 << 21) - 1, 21)
      == (1L << 63) - 1)
    intercept[IllegalArgumentException](GeohashOps.zorder3(0, 0, 0, 22))
    // SQL registration: the kernel is callable as graft_zorder3
    val viaSql = spark.sql("SELECT graft_zorder3(3, 1, 2, 2) AS z")
      .collect()(0).getLong(0)
    assert(viaSql == 43L)
  }

  test("text_normalize lowercases, collapses whitespace, composes NFC") {
    val r = SparkEntry.queries("text_normalize")(spark, sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val norm = row.getAs[String]("norm")
      assert(!norm.exists(_.isUpper), "uppercase survived normalization")
      assert(!norm.contains("  ") && !norm.contains("\t"))
      assert(norm == norm.trim)
      assert(norm.endsWith("the café result")) // NFC-composed single é
      assert(!norm.contains("é"), "combining sequence not composed")
    }
  }

  test("pii_redact finds and masks exactly the seeded email/ip/phone") {
    val r = SparkEntry.queries("pii_redact")(spark, sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Int]("n_email") == 1)
      assert(row.getAs[Int]("n_ip") == 1)
      assert(row.getAs[Int]("n_phone") == 1)
      val tail = row.getAs[String]("redacted_tail")
      assert(tail.contains("<EMAIL>") && tail.contains("<IP>") &&
        tail.contains("<PHONE>"), s"unredacted tail: $tail")
      assert(!tail.contains("@") && !tail.contains("555-"),
        s"PII leaked through redaction: $tail")
    }
  }

  test("sample_split partitions the corpus with a sane train fraction") {
    val rows = SparkEntry.queries("sample_split")(spark, sf0001).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val total = bySplit.values.sum
    val nDocs = Tables(spark, sf0001, "documents").count()
    assert(total == nDocs, s"splits must partition the corpus: $bySplit")
    assert(bySplit.keySet == Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
  }

  test("vocab_topk ranks by frequency with df <= tf") {
    val r = SparkEntry.queries("vocab_topk")(spark, sf0001).collect()
    assert(r.nonEmpty && r.length <= 25)
    val tfs = r.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("tf"))
    assert(tfs.zip(tfs.tail).forall { case (a, b) => a >= b })
    r.foreach(row =>
      assert(row.getAs[Long]("df") <= row.getAs[Long]("tf")))
  }

  test("tfidf_topk emits k ranked terms per doc, rarest-term aware") {
    val r = SparkEntry.queries("tfidf_topk")(spark, sf0001).collect()
    val perDoc = r.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rnk")).sorted.sameElements(
        1 to rows.length))
      val scores = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("embed_quantize maps the max-|x| element to ±127") {
    val r = SparkEntry.queries("embed_quantize")(spark, sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (qMin, qMax) = (row.getAs[Int]("q_min"), row.getAs[Int]("q_max"))
      assert(qMin >= -127 && qMax <= 127)
      assert(qMax == 127 || qMin == -127,
        s"max-magnitude element must hit the int8 rail: [$qMin, $qMax]")
      assert(row.getAs[Double]("scale") > 0)
    }
  }

  test("bpe_train learns exactly the reference merge sequence at sf0.001") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("bpe_train")(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.length == graft.ops.CorpusOps.BpeMerges)
    // in-memory reference: same argmax tie-break (count desc, then l, r),
    // same greedy left-to-right non-overlapping merge application
    var docs = Tables(spark, sf0001, "documents")
      .select(col("text")).collect()
      .map(_.getString(0).split(' ').filter(_.nonEmpty).toVector)
    val expect = (1 to graft.ops.CorpusOps.BpeMerges).map { rank =>
      val counts = collection.mutable.Map[(String, String), Long]()
      docs.foreach(d => d.indices.dropRight(1).foreach { i =>
        counts((d(i), d(i + 1))) = counts.getOrElse((d(i), d(i + 1)), 0L) + 1
      })
      val ((l, r), c) = counts.toSeq
        .minBy { case ((l0, r0), c0) => (-c0, l0, r0) }
      docs = docs.map { d =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < d.length) {
          if (i + 1 < d.length && d(i) == l && d(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += d(i); i += 1 }
        }
        out.result()
      }
      (rank, l, r, c)
    }
    assert(got.toSeq == expect,
      s"merge sequence diverged:\n got   ${got.toSeq}\n expect $expect")
  }

  test("bpe_encode matches an in-memory re-encode with the learned merges") {
    import org.apache.spark.sql.functions.col
    // reference: take bpeFit's merge table (already pinned against the
    // reference TRAINER above) and re-apply it greedily left-to-right
    // in memory; the distributed encode must agree doc-for-doc on both
    // the token count and the full-sequence fingerprint
    val merges = graft.ops.CorpusOps.bpeFit(spark, sf0001)
      .map { case (_, l, r, _) => (l, r) }
    val expect = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { row =>
        var d = row.getString(1).split(' ').filter(_.nonEmpty).toVector
        val n0 = d.length.toLong
        merges.foreach { case (l, r) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < d.length) {
            if (i + 1 < d.length && d(i) == l && d(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += d(i); i += 1 }
          }
          d = out.result()
        }
        row.getLong(0) -> ((n0, d.length.toLong,
          java.security.MessageDigest.getInstance("MD5")
            .digest(d.mkString(" ").getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString))
      }.toMap
    val got = SparkEntry.queries("bpe_encode")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_bpe"),
          r.getAs[String]("enc_fp")))).toMap
    assert(got == expect)
    // the encode must compress: 8 learned merges applied corpus-wide
    assert(got.values.map(v => v._1 - v._2).sum > 0)
  }

  test("winnowing guarantees shared prints for runs >= w+k-1 tokens") {
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    // the winnowing theorem: any shared token run of >= w+k-1 = 6 tokens
    // leaves at least one identical selected print in both docs. Plant a
    // 14-token run (long enough for >= 2 shared prints, the pair gate)
    // at DIFFERENT offsets in otherwise-disjoint docs.
    val run = (0 until 14).map(i => s"run$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    Seq(
      (0L, s"alpha beta gamma delta $run"),
      (1L, s"$run epsilon zeta eta theta iota kappa"),
      (2L, "totally different words with no overlap at all here now"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("winnow_pairs")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("n_shared")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 >= 2),
      s"shared run not detected: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"disjoint doc paired: ${pairs.toSeq}")
    // density: selections are ~2/(w+1) of grams, never more than all
    val w = SparkEntry.queries("text_winnow")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_sel")))
    w.foreach { case (id, ng, ns) =>
      assert(ns >= 1 && ns <= ng, s"doc $id: $ns prints from $ng grams")
    }
    // resolve over the same fixture: the overlapping pair shares one
    // keeper (the min id), the disjoint doc keeps itself
    val res = SparkEntry.queries("winnow_resolve")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_id")).toMap
    assert(res == Map(0L -> 0L, 1L -> 0L, 2L -> 2L), res.toString)

    // positional spans over the same fixture: the run sits at token
    // offset 4 in doc 0 and offset 0 in doc 1, and every token is
    // unique within its doc — so each shared print occurs at exactly
    // one position per side and the a-side islands must be the b-side
    // islands shifted by exactly +4, confined to the run extents.
    val spans = SparkEntry.queries("winnow_spans")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[String]("side"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("end_tok"), r.getAs[Long]("n_prints")))
    assert(spans.forall(s => s._1 == 0L && s._2 == 1L),
      s"span outside the overlapping pair: ${spans.toSeq}")
    val aS = spans.filter(_._3 == "a").map(s => (s._4, s._5, s._6))
      .sorted.toSeq
    val bS = spans.filter(_._3 == "b").map(s => (s._4, s._5, s._6))
      .sorted.toSeq
    assert(aS.nonEmpty && aS.map(s => (s._1 - 4, s._2 - 4, s._3)) == bS,
      s"a/b islands not offset-mirrored: a=${aS.toSeq} b=${bS.toSeq}")
    // run = tokens 4..17 of doc 0, 0..13 of doc 1
    assert(aS.forall(s => s._1 >= 4 && s._2 <= 17), aS.toSeq.toString)
    // each shared print occurs once per side: island print counts sum
    // to the pair's n_shared
    val nShared = pairs.collectFirst {
      case (0L, 1L, n) => n
    }.getOrElse(0L)
    assert(aS.map(_._3).sum == nShared && bS.map(_._3).sum == nShared,
      s"island prints ${aS.map(_._3).sum}/${bS.map(_._3).sum} != $nShared")
  }

  test("dedup_url keeper structure matches the planted page collisions") {
    val rows = SparkEntry.queries("dedup_url")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"),
        r.getAs[String]("canon_url"), r.getAs[Long]("keep_id")))
    assert(rows.nonEmpty)
    // the planted page identity: doc_id%4==3 docs are singletons, the
    // rest share page doc_id%200 — keeper must be the min doc_id of the
    // page group, and canon groups must equal page groups exactly
    def page(id: Long) = if (id % 4 == 3) id else id % 200
    val byPage = rows.groupBy(r => page(r._1))
    rows.foreach { case (id, _, _, keep) =>
      assert(keep == byPage(page(id)).map(_._1).min,
        s"doc $id: keeper $keep != group min")
    }
    val byCanon = rows.groupBy(_._3)
    assert(byCanon.values.map(_.map(_._1).toSet).toSet ==
      byPage.values.map(_.map(_._1).toSet).toSet,
      "canon groups diverge from page groups")
    // spelling noise must actually differ inside a dup group somewhere
    // (else the canonicalizer is untested): find a >=2 group and check
    // the canon key ignores doc-varying port/utm/fragment noise
    assert(byCanon.values.exists(_.size >= 2), "no planted dup groups")
    // host rollup reconciles with the per-doc frame
    val hosts = SparkEntry.queries("dedup_url_hosts")(spark, sf0001).collect()
      .map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_canon"),
          r.getAs[Long]("dup_ppm")))).toMap
    val expect = rows.groupBy(_._2).map { case (h, rs) =>
      val nd = rs.length.toLong
      val nc = rs.map(_._3).distinct.length.toLong
      h -> ((nd, nc, (nd - nc) * 1000000L / nd))
    }
    assert(hosts == expect, s"host rollup mismatch: $hosts vs $expect")
  }

  test("bpe degrades gracefully on corpora with fewer pairs than BpeMerges") {
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    // Only TWO learnable merges exist (< BpeMerges): rounds 3..8 find no
    // pair and must be no-ops on both engines. The expected values here
    // are pinned against a DuckDB run of the generated mirror SQL on the
    // identical corpus (train = 2 rows, enc_fp = md5("abc")), so this
    // test guards the cross-join→LEFT JOIN mirror fix's parity contract.
    val dir = java.nio.file.Files.createTempDirectory("graft-bpedgen").toString
    (0L until 5L).map(i => (i, "a b c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val train = SparkEntry.queries("bpe_train")(spark, dir).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    assert(train.toSeq == Seq((1, "a", "b", 5L), (2, "ab", "c", 5L)),
      train.toSeq.toString)
    val enc = SparkEntry.queries("bpe_encode")(spark, dir).collect()
      .map(r => (r.getAs[Long]("n_tok"), r.getAs[Long]("n_bpe"),
        r.getAs[String]("enc_fp"))).distinct
    assert(enc.toSeq ==
      Seq((3L, 1L, "900150983cd24fb0d6963f7d28e17f72")), enc.toSeq.toString)
    // zero learnable pairs at all: single-token docs pass through unchanged
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bpedgen0").toString
    (0L until 3L).map(i => (i, s"tok$i")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir2/documents.parquet")
    val enc0 = SparkEntry.queries("bpe_encode")(spark, dir2).collect()
    assert(enc0.length == 3 && enc0.forall(r =>
      r.getAs[Long]("n_tok") == 1L && r.getAs[Long]("n_bpe") == 1L),
      enc0.toSeq.toString)
  }

  test("corpus_report reconciles with a direct recomputation of each slice") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf0001, "documents")
      .select(col("source"), col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val nTok = ds.map(_._3.split(' ').count(_.nonEmpty).toLong).sum
      k -> ((ds.length.toLong, ds.map(_._3).distinct.length.toLong, nTok))
    }
    val got = SparkEntry.queries("corpus_report")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_ppm"),
          r.getAs[Long]("vocab"), r.getAs[Long]("entropy_fp")))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, (nd, nu, nt)) =>
      val g = got(k)
      assert((g._1, g._2, g._3) == ((nd, nu, nt)), s"slice $k basic counts")
      assert(g._4 == (nd - nu) * 1000000L / nd, s"slice $k dup_ppm")
      // entropy bounded by ln(vocab) plus discretization slack
      assert(g._6 >= 0 &&
        g._6 <= math.round(math.log(g._5.toDouble) * 1e6) + g._5,
        s"slice $k entropy ${g._6} outside [0, ln(${g._5})]")
    }
  }

  test("url_canon lowercases hosts, strips :443/fragments/utm, sorts params") {
    val rows = SparkEntry.queries("url_canon")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("url"),
        r.getAs[String]("canon_url")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, url, canon) =>
      assert(!canon.contains("#"), s"$id fragment kept")
      assert(!canon.contains(":443"), s"$id default port kept")
      assert(!canon.contains("utm_"), s"$id tracking param kept")
      val host = canon.split('/')(2)
      assert(host == host.toLowerCase, s"$id host not lowercased")
      assert(canon.split('/')(3) == "Path", s"$id path case must survive")
      // params sorted ascending
      val q = canon.split('\\').head.split('?')
      if (q.length > 1) {
        val ps = q(1).split('&').toSeq
        assert(ps == ps.sorted, s"$id params unsorted: ${q(1)}")
      }
      assert(url != canon, s"$id seed was already canonical")
    }
    // a spot-checked exact value: doc 6 is even (port) and %3==0 (utm)
    val six = rows.find(_._1 == 6L).get
    assert(six._3 == "https://www.site6.example.com/Path/6?a=6&b=2", six._3)
  }

  test("doc_lang_segments cuts contiguous same-prediction spans per doc") {
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    import graft.ops.DedupOps.ParaW
    val w = ParaW.toInt
    // 32-token blocks engineered around the langid thresholds: EN has
    // 16/32 stopwords (0.50 >= 0.10), MIX has 2/32 (0.0625 in [0.04,
    // 0.10)), OTH has none.
    val en = (0 until w / 2).flatMap(i => Seq("the", s"x$i")).mkString(" ")
    val en2 = (0 until w / 2).flatMap(i => Seq("of", s"y$i")).mkString(" ")
    val mix = ("the" +: "and" +: (0 until w - 2).map(i => s"m$i")).mkString(" ")
    val oth = (0 until w).map(i => s"z$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-langseg").toString
    Seq((0L, s"$en $en2 $oth"), // en,en,other → 2 segments, major en
        (1L, s"$en $oth $en2"), // alternating → 3 segments, major en (2)
        (2L, mix),              // single mixed block
        (3L, s"$en $oth"))      // 1–1 tie → major breaks to 'en' < 'other'
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("doc_lang_segments")(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_blocks"), x.getAs[Long]("n_segments"),
          x.getAs[String]("major_pred"), x.getAs[Long]("n_major")))).toMap
    assert(r(0L) == ((3L, 2L, "en", 2L)))
    assert(r(1L) == ((3L, 3L, "en", 2L)))
    assert(r(2L) == ((1L, 1L, "mixed", 1L)))
    assert(r(3L) == ((2L, 2L, "en", 1L))) // deterministic tie-break
  }

  test("text_entropy: zero for constant docs, ln(n) for uniform, bounded between") {
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ent").toString
    Seq((0L, "a a a a a a a a"),         // constant → H = 0
        (1L, "a b c d e f g h"),         // uniform over 8 → H = ln 8
        (2L, "a a a a b b c d"))         // mixed → 0 < H < ln 4
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_entropy")(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_uniq"), x.getAs[Long]("entropy_fp")))).toMap
    val scale = graft.ops.CorpusOps.LmScale
    assert(r(0L) == ((1L, 0L)))
    assert(math.abs(r(1L)._2 - math.round(math.log(8) * scale)) <= 8,
      s"uniform entropy ${r(1L)._2} != ln(8)*1e6")
    val h2 = r(2L)._2
    assert(h2 > 0 && h2 < math.round(math.log(4) * scale), s"mixed entropy $h2")
    // corpus-wide bound: H <= ln(n_uniq) (+ discretization slack)
    SparkEntry.queries("text_entropy")(spark, sf0001).collect().foreach { x =>
      val (u, h) = (x.getAs[Long]("n_uniq"), x.getAs[Long]("entropy_fp"))
      assert(h >= 0 && h <= math.round(math.log(u.toDouble) * scale) + u,
        s"doc ${x.getAs[Long]("doc_id")}: H=$h outside [0, ln($u)]")
    }
  }

  test("text_readability computes FK grade from word/sentence/syllable counts") {
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-read").toString
    Seq((0L, "The cat sat. The dog ran."), // 6 words, 2 sents, 6 vowel runs
        (1L, "aaa eee iii"),               // no terminal punct → 1 sentence
        (2L, "tsk tsk"))                   // no vowel groups → 0 syllables
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_readability")(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    def d(id: Long, c: String) = r(id).getAs[Double](c)
    def n(id: Long, c: String) = r(id).getAs[Int](c)
    assert(n(0L, "words") == 6 && n(0L, "sents") == 2 && n(0L, "sylls") == 6)
    assert(math.abs(d(0L, "fk_grade") - (0.39 * 3 + 11.8 * 1 - 15.59)) < 1e-12)
    assert(math.abs(
      d(0L, "reading_ease") - (206.835 - 1.015 * 3 - 84.6 * 1)) < 1e-12)
    assert(n(1L, "sents") == 1, "fragment docs floor at one sentence")
    assert(n(2L, "sylls") == 0 && d(2L, "spw") == 0.0)
  }

  test("tokenize_pack conserves the BPE token mass and packs contiguous bins") {
    val enc = SparkEntry.queries("bpe_encode")(spark, sf0001).collect()
    val totalBpe = enc.map(_.getAs[Long]("n_bpe")).sum
    val packs = SparkEntry.queries("tokenize_pack")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    // conservation: every BPE token of every doc lands in exactly one bin
    assert(packs.map(_._4).sum == totalBpe)
    assert(packs.map(_._3).sum == enc.length.toLong)
    // contiguity: each shard's bins are 0..max with no holes (a hole
    // would mean a >budget gap in the prefix sum, which cannot happen)
    packs.groupBy(_._1).foreach { case (shard, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq, s"shard $shard")
    }
  }

  test("bpe_vocab surfaces merged symbols and conserves the token mass") {
    val merges = graft.ops.CorpusOps.bpeFit(spark, sf0001)
    val vocab = SparkEntry.queries("bpe_vocab")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("cnt"),
        r.getAs[Long]("df")))
    val syms = vocab.map(_._1).toSet
    // the rank-1 merge's joined symbol must be a (frequent) vocab entry
    val (_, l, r, _) = merges.head
    assert(syms.contains(l + r), s"top merge '$l$r' missing from vocab")
    vocab.foreach { case (s, cnt, df) =>
      assert(cnt >= df && df >= 1, s"symbol $s: cnt $cnt < df $df")
    }
    // untruncated vocab must conserve the encoded token mass exactly
    if (vocab.length < graft.ops.CorpusOps.BpeVocabK) {
      val totalBpe = SparkEntry.queries("bpe_encode")(spark, sf0001)
        .collect().map(_.getAs[Long]("n_bpe")).sum
      assert(vocab.map(_._2).sum == totalBpe,
        s"vocab mass ${vocab.map(_._2).sum} != encoded mass $totalBpe")
    }
  }

  test("source_quota caps every source at QuotaCap with a dense deterministic rank") {
    import graft.ops.CorpusOps.QuotaCap
    val rows = SparkEntry.queries("source_quota")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("rk"), r.getAs[Int]("kept")))
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      // ranks are a dense permutation of 1..n within the source
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, src)
      // exactly min(cap, n) docs kept
      assert(rs.count(_._4 == 1) == math.min(QuotaCap, rs.length), src)
    }
    // content-addressed: a second run picks the identical kept set
    val again = SparkEntry.queries("source_quota")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("kept")))
    assert(again.toSeq == rows.map(r => (r._1, r._4)).toSeq)
  }

  test("count-min sketch estimates match exact counts and are partition-invariant") {
    import graft.expr.{functions => gf}
    import graft.ops.CorpusOps.{CmsDepth, CmsWidth}
    import org.apache.spark.sql.functions._
    val toks = Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = SparkEntry.queries("freq_sketch")(spark, sf0001).collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("est")).toMap
    val total = exact.values.sum
    est.foreach { case (tok, e) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(e >= truth, s"CMS under-counted $tok: $e < $truth")
      // the standard CMS guarantee: over-count <= 2N/width w.h.p. —
      // corpus-growth-proof, unlike asserting exact equality
      assert(e <= truth + 2 * total / CmsWidth,
        s"CMS over-count beyond bound for $tok: $e vs $truth (N=$total)")
    }
    // merge is commutative addition → the SKETCH ARRAY is bit-identical
    // at any partition count (the distributed-determinism property)
    def sketchOf(parts: Int): Seq[Long] =
      toks.repartition(parts)
        .agg(gf.cms_agg(CmsWidth, CmsDepth)(col("tok")).as("sk"))
        .collect()(0).getSeq[Long](0)
    assert(sketchOf(1) == sketchOf(16))
  }

  test("z-order write layout tightens per-file 2-D bounds vs hash layout") {
    import graft.expr.{functions => gf}
    import graft.ops.IngestOps
    import org.apache.spark.sql.functions._
    // the payoff claim behind zorder_layout: range-partitioning a write by
    // the z key gives each file a small lat×lon footprint, so min/max
    // footer stats prune 2-D range scans; a hash layout spreads every file
    // across the whole domain. Measure both with real footers.
    val df = IngestOps.decode(Tables(spark, sf0001, "events"))
      .withColumn("z", gf.zorder(
        ((col("longitude") + 79.7) * 1000).cast("int"),
        ((col("latitude") - 43.0) * 1000).cast("int"), lit(10)))
    val zDir = java.nio.file.Files.createTempDirectory("graft-zsort").toString
    val hDir = java.nio.file.Files.createTempDirectory("graft-hash").toString
    df.repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(zDir)
    df.repartition(8).write.mode("overwrite").parquet(hDir)

    def meanFileArea(dir: String): Double = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val areas = files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toString), conf))
        try {
          def span(leaf: String): Double = {
            val ss = r.getFooter.getBlocks.asScala.flatMap(
              _.getColumns.asScala
                .filter(_.getPath.toArray.toSeq == Seq(leaf))
                .map(_.getStatistics))
            ss.map(_.genericGetMax.asInstanceOf[Double]).max -
              ss.map(_.genericGetMin.asInstanceOf[Double]).min
          }
          span("latitude") * span("longitude")
        } finally r.close()
      }
      areas.sum / areas.length
    }
    val (zArea, hArea) = (meanFileArea(zDir), meanFileArea(hDir))
    info(f"mean per-file lat×lon area: z-order $zArea%.5f vs hash $hArea%.5f")
    assert(zArea < hArea * 0.5,
      f"z-order layout should at least halve the per-file 2-D footprint " +
        f"($zArea%.5f vs $hArea%.5f)")
  }

  test("zorder_layout tiles cover all events with consistent bounds") {
    val r = SparkEntry.queries("zorder_layout")(spark, sf0001).collect()
    assert(r.nonEmpty)
    val total = r.map(_.getAs[Long]("n")).sum
    assert(total == Tables(spark, sf0001, "events").count())
    r.foreach { row =>
      val t = row.getAs[Long]("z_tile")
      assert(row.getAs[Long]("z_min") >> 12 == t)
      assert(row.getAs[Long]("z_max") >> 12 == t)
    }
  }

  test("importance_weights separates the target source from the rest") {
    val r = SparkEntry.queries("importance_weights")(spark, sf0001)
      .collect()
      .map(row => (row.getAs[String]("source"), row.getAs[Long]("n_feats"),
        row.getAs[Long]("imp_fixed")))
    assert(r.nonEmpty)
    // every doc with >= 2 tokens contributes features
    assert(r.count(_._2 > 0) > r.length / 2)
    val (t, rest) = r.partition(_._1 == graft.ops.CorpusOps.TargetSrc)
    val tMean = t.map(_._3.toDouble).sum / t.length
    val bySrc = rest.groupBy(_._1).map { case (_, xs) =>
      xs.map(_._3.toDouble).sum / xs.length }
    // the target's own n-gram mix dominates its buckets: its mean
    // log-ratio score must beat every other source's (KL asymmetry)
    assert(bySrc.forall(_ < tMean), s"target mean $tMean not separated")
  }

  test("quality_classifier learns to separate the target source") {
    val r = SparkEntry.queries("quality_classifier")(spark, sf0001)
      .collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Int]("y"),
        x.getAs[Double]("score"), x.getAs[Double]("prob"),
        x.getAs[Int]("pred")))
    assert(r.length == 500, s"one row per document, got ${r.length}")
    // labels are the source indicator; probabilities are probabilities
    assert(r.forall(x => (x._2 == 1) == (x._1 == graft.ops.CorpusOps.TargetSrc)))
    assert(r.forall(x => x._4 > 0.0 && x._4 < 1.0))
    assert(r.forall(x => (x._5 == 1) == (x._4 > 0.5)))
    // prob is the round-6 sigmoid of the round-6 score (one ulp of slack
    // for the double rounding of score itself)
    assert(r.forall(x => math.abs(x._4 - 1.0 / (1.0 + math.exp(-x._3))) < 1e-5))
    // three GD rounds are enough to order the classes: the target
    // source's mean probability must beat every other source's
    val (tgt, rest) = r.partition(_._2 == 1)
    assert(tgt.nonEmpty && rest.nonEmpty)
    val tMean = tgt.map(_._4).sum / tgt.length
    val bySrc = rest.groupBy(_._1).map { case (_, xs) =>
      xs.map(_._4).sum / xs.length }
    assert(bySrc.forall(_ < tMean),
      s"target mean prob $tMean not separated from ${bySrc.toSeq.sorted}")
    // the learned decision moved off initialization: round 1 scores every
    // doc at exactly p = 0.5, a trained model must not
    assert(r.exists(x => math.abs(x._4 - 0.5) > 1e-4), "model did not move")
  }

  test("domain_reweight upweights lossy domains from the token-share baseline") {
    val r = SparkEntry.queries("domain_reweight")(spark, sf0001)
      .collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Double]("token_share"),
        x.getAs[Double]("excess_loss"), x.getAs[Double]("weight")))
    assert(r.length > 1, "needs multiple domains")
    // a probability distribution (up to the per-domain round(6))
    assert(math.abs(r.map(_._4).sum - 1.0) < 1e-4,
      s"weights sum to ${r.map(_._4).sum}, not 1")
    assert(r.forall(_._4 > 0.0), "every domain keeps positive mass")
    // excess loss is anchored at the easiest domain
    assert(r.map(_._3).min == 0.0, "min excess loss must be 0")
    assert(r.forall(_._3 >= 0.0), "excess loss is clamped nonnegative")
    // the zero-excess domain is NOT upweighted; the max-excess domain
    // gains relative to its baseline share (the DoReMi direction)
    val easiest = r.minBy(x => (x._3, x._1))
    assert(easiest._4 <= easiest._2 + 1e-6,
      s"easiest domain gained mass: $easiest")
    val hardest = r.maxBy(x => (x._3, x._1))
    assert(hardest._4 > hardest._2,
      s"hardest domain not upweighted: $hardest")
  }

  test("sampling_plan lands each source near its reweighted token budget") {
    import org.apache.spark.sql.functions._
    val w = SparkEntry.queries("domain_reweight")(spark, sf0001)
      .collect().map(x => (x.getAs[String]("source"),
        x.getAs[Long]("n_tokens"), x.getAs[Double]("weight")))
    val totTok = w.map(_._2).sum.toDouble
    val plan = SparkEntry.queries("sampling_plan")(spark, sf0001)
    val docs = graft.Tables(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val planned = plan.join(docs, "doc_id")
      .groupBy("source")
      .agg(sum(col("n_repeats") * col("n_tok")).as("planned"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    for ((src, nTok, weight) <- w) {
      val target = weight * totTok
      val got = planned.getOrElse(src, 0L).toDouble
      // fingerprint-mod residuals are binomial around the target; allow
      // 4 sigma plus one max-length doc of slack
      val p = {
        val r = target / nTok
        r - math.floor(r)
      }
      val nDocs = plan.filter(col("source") === src).count()
      val slack = 4 * math.sqrt(nDocs * p * (1 - p) + 1) * (nTok.toDouble / nDocs) + 100
      assert(math.abs(got - target) <= slack,
        f"$src planned $got%.0f vs target $target%.0f (slack $slack%.0f)")
    }
    // determinism: a second run produces the identical plan
    val again = SparkEntry.queries("sampling_plan")(spark, sf0001)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSet
    val first = plan.collect().map(x => (x.getLong(0), x.getLong(2))).toSet
    assert(first == again, "plan not reproducible")
  }
}
