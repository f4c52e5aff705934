package graft

import graft.expr.{GeoOps, GeohashOps, StatsOps, TextHashOps}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel unit tests: geohash against published vectors, WKB byte layout,
  * erf/Φ against table values, text-hash determinism. */
class ExprSpec extends AnyFunSuite {

  // -- geohash (published test vectors from the public algorithm) --

  test("geohash encodes published vectors") {
    assert(GeohashOps.encode(42.605, -5.603, 5).toString == "ezs42")
    assert(GeohashOps.encode(57.64911, 10.40744, 11).toString == "u4pruydqqvj")
    assert(GeohashOps.encode(0.0, 0.0, 1).toString == "s")
    assert(GeohashOps.encode(90.0, 180.0, 4).toString == "zzzz")
    assert(GeohashOps.encode(-90.0, -180.0, 4).toString == "0000")
  }

  test("geohash decode-center round-trips") {
    for (gh <- Seq("ezs42", "u4pruyd", "9q8yyk8", "s000000")) {
      val (lat, lon) = GeohashOps.decodeCenter(gh)
      assert(GeohashOps.encode(lat, lon, gh.length).toString == gh)
    }
  }

  test("geohash prefix containment: longer hash refines the same cell") {
    val (lat, lon) = (43.6532, -79.3832) // Toronto
    val g7 = GeohashOps.encode(lat, lon, 7).toString
    val g5 = GeohashOps.encode(lat, lon, 5).toString
    assert(g7.startsWith(g5))
  }

  // -- WKB point (reference layout: 21-byte LE, handler.py:131-141) --

  test("WKB point byte layout is 21-byte little-endian") {
    val wkb = GeoOps.pointWkb(1.0, 2.0)
    val hex = wkb.map("%02X".format(_)).mkString
    assert(hex == "0101000000" + "000000000000F03F" + "0000000000000040")
  }

  test("WKB x/y round-trip and distance") {
    val a = GeoOps.pointWkb(-79.3832, 43.6532)
    assert(GeoOps.wkbX(a) == -79.3832)
    assert(GeoOps.wkbY(a) == 43.6532)
    val b = GeoOps.pointWkb(-79.3832, 43.6535)
    assert(math.abs(GeoOps.distance(a, b) - 0.0003) < 1e-12)
    assert(GeoOps.dwithin(a, b, 0.0003000001))
    assert(!GeoOps.dwithin(a, b, 0.0002))
  }

  test("WKB big-endian points parse too") {
    val bb = java.nio.ByteBuffer.allocate(21)
    bb.put(0.toByte); bb.putInt(1); bb.putDouble(10.5); bb.putDouble(-20.25)
    val be = bb.array()
    assert(GeoOps.wkbX(be) == 10.5 && GeoOps.wkbY(be) == -20.25)
  }

  // -- erf / normal CDF (A&S 7.1.26, max abs err 1.5e-7) --

  test("erf matches table values within approximation error") {
    val table = Seq(0.0 -> 0.0, 0.5 -> 0.5204998778, 1.0 -> 0.8427007929,
      2.0 -> 0.9953222650, 3.0 -> 0.9999779095)
    for ((x, v) <- table) {
      assert(math.abs(StatsOps.erf(x) - v) < 2e-7, s"erf($x)")
      assert(math.abs(StatsOps.erf(-x) + v) < 2e-7, s"erf(-$x)")
    }
  }

  test("normal CDF matches table values") {
    // A&S coefficients sum to 1 - 1e-9, so erf(0) ≈ 1e-9 rather than 0
    assert(math.abs(StatsOps.normalCdf(0.0) - 0.5) < 1e-9)
    assert(math.abs(StatsOps.normalCdf(1.96) - 0.9750021049) < 2e-7)
    assert(math.abs(StatsOps.normalCdf(-1.0) - 0.1586552539) < 2e-7)
  }

  test("reliability is P(lo <= X <= hi)") {
    // symmetric window around the mean of a standard normal
    val p = StatsOps.reliability(0.0, 1.0, -1.0, 1.0)
    assert(math.abs(p - 0.6826894921) < 4e-7)
    // reference window: P(-60 <= X <= 300 | mu=0, sigma=218.7)
    val r = StatsOps.reliability(0.0, 218.7, -60.0, 300.0)
    assert(r > 0.5 && r < 0.6)
  }

  // -- text hashing --

  private def u(s: String) = UTF8String.fromString(s)

  test("fingerprint matches a manual fold") {
    val s = "abc"
    val expect = (((0L * 31 + 'a') % 1000000007L) * 31 + 'b') % 1000000007L * 31 + 'c'
    assert(TextHashOps.fingerprint(u(s)) == expect % 1000000007L)
    assert(TextHashOps.fingerprint(u("")) == 0L)
  }

  test("fingerprint folds code points — matches the DuckDB ascii() mirror on non-ASCII") {
    // vectors computed with the oracle's own fold (list_transform +
    // ascii(c)): a byte-fold kernel desyncs on every one of these
    assert(TextHashOps.fingerprint(u("café latte")) == 99490332L)
    assert(TextHashOps.fingerprint(u("héllo wörld")) == 309710581L)
    assert(TextHashOps.fingerprint(u("数据 管道")) == 741342092L)
    assert(TextHashOps.fingerprint(u("a😀b")) == 4077187L) // surrogate pair
  }

  test("shingles are distinct, ordered word n-grams") {
    val sh = TextHashOps.shingleStrings(u("a b c d a b c d"), 3)
    val strs = (0 until sh.numElements()).map(i => sh.getUTF8String(i).toString)
    assert(strs == Seq("a b c", "b c d", "c d a", "d a b"))
    assert(TextHashOps.shingleStrings(u("a b"), 3).numElements() == 0)
  }

  test("minhash: identical docs agree, disjoint docs do not") {
    val a = TextHashOps.minhash(u("the quick brown fox jumps over the lazy dog"), 32, 2)
    val a2 = TextHashOps.minhash(u("the quick brown fox jumps over the lazy dog"), 32, 2)
    val b = TextHashOps.minhash(u("entirely different words in this sentence here now"), 32, 2)
    assert((0 until 32).forall(i => a.getLong(i) == a2.getLong(i)))
    val agree = (0 until 32).count(i => a.getLong(i) == b.getLong(i))
    assert(agree < 8, s"disjoint docs agreed on $agree/32")
  }

  test("minhash: near-duplicates agree on most positions") {
    val a = TextHashOps.minhash(u("one two three four five six seven eight nine ten"), 32, 2)
    val b = TextHashOps.minhash(u("one two three four five six seven eight nine zzz"), 32, 2)
    val agree = (0 until 32).count(i => a.getLong(i) == b.getLong(i))
    assert(agree >= 16, s"near-dups agreed only on $agree/32")
  }

  test("simhash: near-duplicates are hamming-close") {
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val a = TextHashOps.simhash64(u("one two three four five six seven eight nine ten"), 2)
    val b = TextHashOps.simhash64(u("one two three four five six seven eight nine zzz"), 2)
    val c = TextHashOps.simhash64(u("totally unrelated content with other tokens entirely"), 2)
    assert(ham(a, b) < ham(a, c))
  }

  // r12: text_repetition's per-row statistics ride the gramStats kernel;
  // pin [distinct count, max multiplicity] for n = 1 and 2 against a
  // plain-Scala brute force over the same token arrays, including
  // multibyte tokens, heavy repetition, and the len < n boundaries.
  test("gramStats matches brute-force n-gram multiset statistics") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def stats(toks: Seq[String], n: Int): (Long, Long) = {
      val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      if (grams.isEmpty) (0L, 0L)
      else {
        val counts = grams.groupBy(identity).map(_._2.length.toLong)
        (counts.size.toLong, counts.max)
      }
    }
    val docs = Seq(
      Seq.empty[String],
      Seq("solo"),
      Seq("a", "a"),
      Seq("a", "b", "a", "b", "a"),
      Seq("x", "x", "x", "x"),
      Seq("déjà", "vu", "déjà", "vu", "naïve"),
      Seq("日本", "語", "日本", "語", "日本"),
      "the quick brown fox jumps over the lazy dog the quick brown fox"
        .split(' ').toSeq)
    for (doc <- docs; n <- Seq(1, 2)) {
      val arr = new GenericArrayData(
        doc.map(t => u(t): AnyRef).toArray)
      val got = TextHashOps.gramStats(arr, n)
      assert((got.getLong(0), got.getLong(1)) == stats(doc, n),
        s"doc=$doc n=$n")
    }
  }
}
