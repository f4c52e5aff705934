package graft.streaming

import org.apache.hadoop.fs.Path
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generative properties of the [[DirIndex]] watermark adoption rule —
  * the invariant the whole exactly-once index protocol hangs on ("the
  * RULE, not directory deletion, carries correctness"). `adopt` is a
  * pure function over directory names, so the state space (arbitrary
  * mixes of seed/append/compact generations, with and without a replay
  * bound, with re-materialized absorbed dirs) is explored generatively
  * instead of by a handful of hand-picked lifecycles. */
object DirIndexSpec extends Properties("graft.streaming.DirIndex") {

  private def p(n: String) = new Path(s"/idx/$n")
  private def b(j: Long) = p(f"b$j%08d")
  private def c(k: Long) = p(f"c$k%08d")

  private val genBatches: Gen[Set[Long]] =
    Gen.someOf(0L to 12L).map(_.toSet)
  private val genCompacts: Gen[Set[Long]] =
    Gen.someOf(0L to 10L).map(_.toSet)
  private val genSeed: Gen[Boolean] = Gen.oneOf(true, false)

  private def committed(seed: Boolean, bs: Set[Long],
      cs: Set[Long]): Seq[Path] =
    (if (seed) Seq(p(DirIndex.SeedDir)) else Seq.empty) ++
      bs.toSeq.sorted.map(b) ++ cs.toSeq.sorted.map(c)

  property("at most one compact generation is adopted — the highest") =
    forAll(genSeed, genBatches, genCompacts) { (seed, bs, cs) =>
      val adopted = DirIndex.adopt(committed(seed, bs, cs)).map(_.getName)
      val adoptedCs = adopted.flatMap(DirIndex.compactId)
      adoptedCs.size <= 1 &&
        (cs.isEmpty || adoptedCs == Seq(cs.max))
    }

  property("every adopted append sits strictly above the watermark") =
    forAll(genSeed, genBatches, genCompacts) { (seed, bs, cs) =>
      val adopted = DirIndex.adopt(committed(seed, bs, cs)).map(_.getName)
      val wm = cs.maxOption
      adopted.flatMap(DirIndex.batchId)
        .forall(j => wm.forall(j > _))
    }

  property("the seed is adopted iff no compact generation exists") =
    forAll(genSeed, genBatches, genCompacts) { (seed, bs, cs) =>
      val adopted = DirIndex.adopt(committed(seed, bs, cs)).map(_.getName)
      adopted.contains(DirIndex.SeedDir) == (seed && cs.isEmpty)
    }

  property("no committed row is lost: adopted covers seed+appends exactly once") =
    forAll(genSeed, genBatches, genCompacts) { (seed, bs, cs) =>
      // semantic coverage: c<k> REPRESENTS seed + all appends <= k; the
      // adopted set must cover every committed append exactly once —
      // absorbed ones through the single adopted generation, the rest
      // live
      val adopted = DirIndex.adopt(committed(seed, bs, cs)).map(_.getName)
      val wm = cs.maxOption
      val live = adopted.flatMap(DirIndex.batchId).toSet
      val expectedLive = wm match {
        case None    => bs
        case Some(k) => bs.filter(_ > k)
      }
      live == expectedLive
    }

  property("a replay bound drops exactly the at-or-above appends") =
    forAll(genSeed, genBatches, genCompacts, Gen.chooseNum(0L, 14L)) {
      (seed, bs, cs, bound) =>
        val dirs = committed(seed, bs, cs)
        val wm = cs.maxOption
        if (wm.exists(_ >= bound)) {
          // watermark at/past the playing batch must fail loudly
          try { DirIndex.adopt(dirs, Some(bound)); false }
          catch { case _: IllegalArgumentException => true }
        } else {
          val bounded = DirIndex.adopt(dirs, Some(bound)).map(_.getName)
          val unbounded = DirIndex.adopt(dirs).map(_.getName)
          bounded.toSet == unbounded.filter(n =>
            DirIndex.batchId(n).forall(_ < bound)).toSet
        }
    }

  property("re-materialized absorbed appends never change adoption") =
    forAll(genSeed, genBatches, genCompacts) { (seed, bs, cs) =>
      cs.isEmpty || {
        // a replayed batch re-creates any subset of absorbed b dirs;
        // the adopted set must be identical with or without them
        val wm = cs.max
        val ghosts = (0L to wm).toSet
        val base = DirIndex.adopt(committed(seed, bs, cs)).map(_.getName)
        val withGhosts =
          DirIndex.adopt(committed(seed, bs ++ ghosts, cs)).map(_.getName)
        base.toSet == withGhosts.toSet
      }
    }

  property("unrecognized and oversized-id names are ignored by the parsers") =
    forAll(Gen.oneOf("x123", "b", "c", "t", "b12a", "seedling",
      "b" + "9" * 20, "c" + "1" * 19)) { n =>
      DirIndex.batchId(n).isEmpty && DirIndex.compactId(n).isEmpty &&
        DirIndex.stagingId(n).isEmpty
    }
}
