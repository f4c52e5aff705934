package graft

import graft.expr.{GeoOps, GeohashOps, StatsOps, TextHashOps}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based kernel checks (SURVEY.md §5 item 3) — plain ScalaCheck
  * `Properties` (run natively by sbt's test interface). */
object PropertySpec extends Properties("graft.kernels") {

  private val lat = Gen.chooseNum(-89.999, 89.999)
  private val lon = Gen.chooseNum(-179.999, 179.999)

  property("geohash prefix containment is monotone in precision") =
    forAll(lat, lon) { (la, lo) =>
      val g8 = GeohashOps.encode(la, lo, 8).toString
      (1 to 7).forall(p => g8.startsWith(GeohashOps.encode(la, lo, p).toString))
    }

  property("geohash decodeCenter stays inside the encoded cell") =
    forAll(lat, lon) { (la, lo) =>
      val gh = GeohashOps.encode(la, lo, 7).toString
      val (cla, clo) = GeohashOps.decodeCenter(gh)
      GeohashOps.encode(cla, clo, 7).toString == gh
    }

  property("WKB encode∘decode is the identity on coordinates") =
    forAll(lat, lon) { (la, lo) =>
      val wkb = GeoOps.pointWkb(lo, la)
      GeoOps.wkbX(wkb) == lo && GeoOps.wkbY(wkb) == la && wkb.length == 21
    }

  property("planar distance is symmetric; dwithin reflexive at 0") =
    forAll(lat, lon, lat, lon) { (a, b, c, d) =>
      val p = GeoOps.pointWkb(b, a)
      val q = GeoOps.pointWkb(d, c)
      GeoOps.dwithin(p, p, 0.0) &&
        GeoOps.distance(p, q) == GeoOps.distance(q, p)
    }

  property("normal CDF is monotone and bounded on [-6,6]") =
    forAll(Gen.chooseNum(-6.0, 6.0), Gen.chooseNum(-6.0, 6.0)) { (z1, z2) =>
      val (lo, hi) = (math.min(z1, z2), math.max(z1, z2))
      val (clo, chi) = (StatsOps.normalCdf(lo), StatsOps.normalCdf(hi))
      clo <= chi + 1e-15 && clo >= -1e-9 && chi <= 1.0 + 1e-9
    }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val doc = Gen.listOfN(30, word).map(_.mkString(" "))

  property("minhash agreement is 32/32 for identical docs, in [0,32] always") =
    forAll(doc, doc) { (a, b) =>
      val sa = TextHashOps.minhash(UTF8String.fromString(a), 32, 2)
      val sb = TextHashOps.minhash(UTF8String.fromString(b), 32, 2)
      val agree = (0 until 32).count(i => sa.getLong(i) == sb.getLong(i))
      (if (a == b) agree == 32 else true) && agree >= 0 && agree <= 32
    }

  property("fingerprint is deterministic and within the modulus") =
    forAll(doc) { a =>
      val u = UTF8String.fromString(a)
      val f = TextHashOps.fingerprint(u)
      f == TextHashOps.fingerprint(u) && f >= 0 && f < 1000000007L
    }

  property("shingle count is tokens - n + 1 before dedup (distinct <= that)") =
    forAll(doc) { a =>
      val n = TextHashOps.shingleStrings(UTF8String.fromString(a), 3)
        .numElements()
      val toks = a.split(' ').count(_.nonEmpty)
      n <= math.max(0, toks - 2)
    }

  // ---- IVF coarse-quantizer kernel ----

  private val vec = Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0))
    .map(l => org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      l.map(_.toFloat).toArray))
  private val cents = Gen.listOfN(4 * 8, Gen.chooseNum(-1.0, 1.0))
    .map(l => org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      l.toArray))

  property("topCells returns min(top,K) distinct in-range ids, dot-ordered") =
    forAll(vec, cents, Gen.chooseNum(1, 6)) { (v, c, top) =>
      val out = graft.expr.EmbedOps.topCells(v, c, 8, top)
      val ids = (0 until out.numElements()).map(out.getInt)
      def dot(cell: Int): Double =
        (0 until 8).map(i => v.getFloat(i).toDouble * c.getDouble(cell * 8 + i)).sum
      val dots = ids.map(dot)
      ids.length == math.min(top, 4) &&
        ids.distinct.length == ids.length &&
        ids.forall(i => i >= 0 && i < 4) &&
        dots.zip(dots.tail).forall { case (a, b) => a >= b - 1e-12 }
    }

  property("topCells degrades to id order on all-NaN vectors, never throws") =
    forAll(cents, Gen.chooseNum(1, 6)) { (c, top) =>
      val v = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.fill(8)(Float.NaN))
      val out = graft.expr.EmbedOps.topCells(v, c, 8, top)
      val ids = (0 until out.numElements()).map(out.getInt)
      ids == (0 until math.min(top, 4)) // deterministic lowest-id fallback
    }

  // full spill (= k1) must reduce the hierarchical kernel to flat
  // scoring of the concatenated level-2 matrix — the tree is then pure
  // reorganization, and any divergence is a descent/tie-break bug
  property("topCells2 with full spill equals flat topCells on the level-2 matrix") =
    forAll(vec, Gen.listOfN(2 * 8, Gen.chooseNum(-1.0, 1.0)),
      Gen.listOfN(2 * 3 * 8, Gen.chooseNum(-1.0, 1.0)),
      Gen.chooseNum(1, 7)) { (v, c1l, c2l, top) =>
      val arrD = (l: List[Double]) =>
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(l.toArray)
      val (c1, c2) = (arrD(c1l), arrD(c2l)) // k1=2 blocks of k2=3 cells
      val h = graft.expr.EmbedOps.topCells2(v, c1, c2, 8, 2, top)
      val f = graft.expr.EmbedOps.topCells(v, c2, 8, top)
      (0 until h.numElements()).map(h.getInt) ==
        (0 until f.numElements()).map(f.getInt)
    }

  property("topCells2 spill=1 ids stay inside the chosen block, dot-ordered") =
    forAll(vec, Gen.listOfN(2 * 8, Gen.chooseNum(-1.0, 1.0)),
      Gen.listOfN(2 * 3 * 8, Gen.chooseNum(-1.0, 1.0))) { (v, c1l, c2l) =>
      val arrD = (l: List[Double]) =>
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(l.toArray)
      val out = graft.expr.EmbedOps.topCells2(v, arrD(c1l), arrD(c2l), 8, 1, 3)
      val ids = (0 until out.numElements()).map(out.getInt)
      val blk = ids.head / 3
      def dot(cell: Int): Double =
        (0 until 8).map(i => v.getFloat(i).toDouble * c2l(cell * 8 + i)).sum
      val dots = ids.map(dot)
      ids.length == 3 && ids.forall(i => i / 3 == blk) &&
        ids.distinct.length == 3 &&
        dots.zip(dots.tail).forall { case (a, b) => a >= b - 1e-12 }
    }

  property("count-min sketch never under-counts, any corpus, any merge split") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d e", "ffff", "g"))) { toks =>
      val agg = new graft.expr.CmsAggregator(64, 4)
      // arbitrary split point → merge path differs, result must not
      val (l, r) = toks.splitAt(toks.length / 2)
      val buf = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)
      toks.distinct.forall { t =>
        graft.expr.CmsSketch.estimate(arr,
          UTF8String.fromString(t), 64, 4) >= toks.count(_ == t)
      }
    }

  // ---- GTFS-rt decoder robustness ----

  private val junk = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
    .map(_.toArray)

  property("gtfs-rt decode never throws on arbitrary bytes") =
    forAll(junk) { bytes =>
      val out = graft.expr.GtfsRtOps.decodeFeed(bytes)
      out != null && out.numElements() >= 0
    }

  property("gtfs-rt decode never throws on truncated valid feeds") =
    forAll(Gen.chooseNum(0, 200)) { cut =>
      val full = TestProto.singleVehicleFeed(1709650000L)
      val trunc = full.take(math.min(cut, full.length))
      val out = graft.expr.GtfsRtOps.decodeFeed(trunc)
      out != null && out.numElements() >= 0
    }

  // ---- product quantization ----

  private val pqDim = 16 // 4 subspaces × subDim 4 at m=4
  private val pqM = 4
  private val pqKs = 4
  private val vecGen = Gen.listOfN(pqDim, Gen.chooseNum(-1.0f, 1.0f))
  private val bookGen =
    Gen.listOfN(pqM * pqKs * (pqDim / pqM), Gen.chooseNum(-1.0, 1.0))

  private def arr(fs: Seq[Float]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(fs.toArray)
  private def arrD(ds: Seq[Double]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ds.toArray)

  property("pq codes pick the L2-nearest code in every subspace") =
    forAll(vecGen, bookGen) { (v, book) =>
      val codes = graft.expr.EmbedOps.pqEncode(arr(v), arrD(book),
        pqDim, pqM, pqKs)
      val subDim = pqDim / pqM
      (0 until pqM).forall { sub =>
        def d2(code: Int): Double = (0 until subDim).map { i =>
          val diff = v(sub * subDim + i) - book((sub * pqKs + code) * subDim + i)
          diff * diff
        }.sum
        val got = codes.getInt(sub)
        (0 until pqKs).forall(c => d2(got) <= d2(c) + 1e-12)
      }
    }

  property("pq ADC cosine of the reconstruction stays in [-1, 1]") =
    forAll(vecGen, bookGen) { (v, book) =>
      val codes = graft.expr.EmbedOps.pqEncode(arr(v), arrD(book),
        pqDim, pqM, pqKs)
      val cos = graft.expr.EmbedOps.pqAdcCos(arr(v), codes, arrD(book),
        pqDim, pqM, pqKs)
      cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9
    }

  // ---- BPE merge kernel ----

  private val tokGen = Gen.listOfN(24,
    Gen.oneOf("a", "b", "c", "ab", "x"))

  private def arrS(ts: Seq[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ts.map(UTF8String.fromString).toArray[Any])

  property("bpe merge preserves concatenated characters") =
    forAll(tokGen) { ts =>
      val out = TextHashOps.bpeMergeStep(arrS(ts),
        UTF8String.fromString("a"), UTF8String.fromString("b"))
      val outToks = (0 until out.numElements())
        .map(out.getUTF8String(_).toString)
      outToks.mkString == ts.mkString
    }

  property("bpe merge leaves no adjacent (a, b) pair") =
    forAll(tokGen) { ts =>
      val out = TextHashOps.bpeMergeStep(arrS(ts),
        UTF8String.fromString("a"), UTF8String.fromString("b"))
      val outToks = (0 until out.numElements())
        .map(out.getUTF8String(_).toString)
      !outToks.zip(outToks.drop(1)).contains(("a", "b"))
    }

  property("bpe merge shrinks length by exactly the merge count") =
    forAll(tokGen) { ts =>
      val out = TextHashOps.bpeMergeStep(arrS(ts),
        UTF8String.fromString("a"), UTF8String.fromString("b"))
      val merged = (0 until out.numElements())
        .count(i => out.getUTF8String(i).toString == "ab")
      val pre = ts.count(_ == "ab")
      out.numElements() == ts.length - (merged - pre)
    }

  // ---- rotation / dot kernels ----

  property("identity rotation makes pqEncodeRot equal pqEncode") =
    forAll(vecGen, bookGen) { (v, book) =>
      val id = Array.tabulate(pqDim * pqDim)(i =>
        if (i / pqDim == i % pqDim) 1.0 else 0.0)
      val a = graft.expr.EmbedOps.pqEncode(arr(v), arrD(book), pqDim, pqM, pqKs)
      val b = graft.expr.EmbedOps.pqEncodeRot(arr(v), arrD(id.toSeq),
        arrD(book), pqDim, pqM, pqKs)
      (0 until pqM).forall(i => a.getInt(i) == b.getInt(i))
    }

  property("dotFD against a float-exact double vector equals dotF") =
    forAll(vecGen, vecGen) { (x, y) =>
      val f = graft.expr.EmbedOps.dotF(arr(x), arr(y))
      val fd = graft.expr.EmbedOps.dotFD(arr(x),
        arrD(y.map(_.toDouble)))
      f == fd
    }

  // ---- audio energy kernel ----

  private def wavOf(amps: Seq[Short]): Array[Byte] = {
    val pcm = new Array[Byte](amps.length * 2)
    amps.zipWithIndex.foreach { case (a, i) =>
      pcm(2 * i) = (a & 0xff).toByte
      pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, amps.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  property("constant-amplitude clips yield that amplitude in every window") =
    forAll(Gen.chooseNum(0, 32767), Gen.chooseNum(1, 8)) { (amp, mult) =>
      val n = 64 * mult
      val es = graft.ops.MultimodalOps
        .audioWindowEnergies(wavOf(Seq.fill(n)(amp.toShort)), 64).get
      es.length == 64 && es.forall(_ == amp.toLong)
    }

  property("audioWindowEnergies never throws on arbitrary bytes") =
    forAll(Gen.listOfN(64, Gen.chooseNum(-128, 127))) { bs =>
      val r = graft.ops.MultimodalOps
        .audioWindowEnergies(bs.map(_.toByte).toArray, 64)
      r == None || r.get.length == 64
    }

  // ---- winnowing scheme guarantee (Schleimer et al. 2003 theorem) ----
  // Reference selection mirroring TextOps' relational formulation
  // (k = WinnowK = 3 word-grams, w = WinnowW = 4 windows; the constants
  // are private[ops], so they are restated here — CorpusSpec pins the
  // Spark implementation against the same scheme on a planted fixture).
  private def winnowSelect(tokens: Seq[String]): Set[Long] = {
    val grams = tokens.sliding(3).filter(_.sizeIs == 3)
      .map(g => TextHashOps.fingerprint(UTF8String.fromString(g.mkString(" "))))
      .toVector
    if (grams.isEmpty) Set.empty
    else if (grams.length < 4) Set(grams.min) // clamped single window
    else grams.sliding(4).map(_.min).toSet
  }

  private val winTok = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
  private val winRun = Gen.chooseNum(6, 24).flatMap(Gen.listOfN(_, winTok))
  private val winCtx = Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, winTok))

  property("any shared token run of >= w+k-1 yields a shared winnow print") =
    forAll(winRun, winCtx, winCtx, winCtx, winCtx) { (run, pa, sa, pb, sb) =>
      // run length >= 6 = w+k-1 tokens ⇒ >= w = 4 consecutive shared
      // grams ⇒ one full shared window whose minimum is selected by BOTH
      // docs, regardless of surrounding context
      val selA = winnowSelect(pa ++ run ++ sa)
      val selB = winnowSelect(pb ++ run ++ sb)
      (selA & selB).nonEmpty
    }

  property("winnow selection is a nonempty subset of the doc's gram hashes") =
    forAll(Gen.chooseNum(3, 40).flatMap(Gen.listOfN(_, winTok))) { toks =>
      val grams = toks.sliding(3).filter(_.sizeIs == 3)
        .map(g => TextHashOps.fingerprint(UTF8String.fromString(g.mkString(" "))))
        .toSet
      val sel = winnowSelect(toks)
      sel.nonEmpty && sel.subsetOf(grams)
    }

  // The Hilbert index is, at EVERY order, a bijection onto [0, 4^bits)
  // whose consecutive indices are grid-adjacent — the invariant pair the
  // layout ops rely on. Exhaustive per sampled order (≤ 2^12 cells), so
  // the property covers the rotation logic at all recursion depths, not
  // just the order-3 case the unit test pins.
  property("hilbert is a bijection with unit-step adjacency at every order") =
    forAll(Gen.chooseNum(1, 6)) { bits =>
      val n = 1 << bits
      val byD = (for { x <- 0 until n; y <- 0 until n }
        yield GeohashOps.hilbert(x, y, bits) -> ((x, y))).toMap
      byD.keySet == (0L until n.toLong * n).toSet &&
        (0L until n.toLong * n - 1).forall { d =>
          val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
          math.abs(x1 - x2) + math.abs(y1 - y2) == 1
        }
    }

  // High input bits are ignored (the zorder contract): shifting garbage
  // above the consumed range never changes the index.
  property("hilbert reads only the low `bits` bits of each input") =
    forAll(Gen.chooseNum(0, 255), Gen.chooseNum(0, 255),
      Gen.chooseNum(1, 8), Gen.chooseNum(1, 1 << 10)) { (x, y, bits, junk) =>
      GeohashOps.hilbert(x + (junk << bits), y, bits) ==
        GeohashOps.hilbert(x, y, bits) &&
      GeohashOps.hilbert(x, y + (junk << bits), bits) ==
        GeohashOps.hilbert(x, y, bits)
    }
}
