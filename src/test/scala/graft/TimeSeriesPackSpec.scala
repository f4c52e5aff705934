package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 time-series and batch-assembly
  * operators (exact values are the DuckDB oracle's job; these pin the
  * properties that must hold at any scale) plus their plan shapes. */
class TimeSeriesPackSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan.toString

  // ---- events_headway ----

  test("headway: n_gaps per type is exactly count-1, gaps are ordered") {
    val events = Tables(spark, sf0001, "events")
    val perType = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("events_headway").collect().foreach { r =>
      val (tpe, nGaps) = (r.getString(0), r.getLong(1))
      assert(nGaps == perType(tpe) - 1, s"$tpe: $nGaps gaps for ${perType(tpe)} events")
      assert(r.getDouble(2) <= r.getDouble(3), s"$tpe: avg gap above max gap")
      assert(r.getDouble(2) > 0, s"$tpe: non-positive average gap")
    }
  }

  // ---- anomaly_zscore ----

  test("zscore anomalies: anomalies are a strict minority; threshold respected") {
    q("anomaly_zscore").collect().foreach { r =>
      val (n, nAnom, maxZ) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nAnom < n / 10, s"${r.getString(0)}: $nAnom anomalies of $n is not a tail")
      if (nAnom > 0) assert(maxZ > 3, "anomalies flagged but max |z| <= 3")
      else assert(maxZ <= 3, "no anomalies flagged but max |z| > 3")
    }
  }

  // ---- resample_locf ----

  test("LOCF resample: dense spine, carried values match the previous bucket") {
    val rows = q("resample_locf").collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (tpe, rs) =>
      val buckets = rs.map(_.getLong(1)).sorted
      // dense: every 600-second step present between min and max
      assert(buckets.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 600),
        s"$tpe: spine has holes")
      // LOCF: a filled row carries exactly the previous row's value
      val ordered = rs.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(prev, cur) if cur.getLong(3) == 1L && !prev.isNullAt(2) =>
          assert(cur.getDouble(2) == prev.getDouble(2),
            s"$tpe bucket ${cur.getLong(1)}: filled value differs from carried value")
        case _ =>
      }
    }
    // some gaps must actually have been filled for the test to mean anything
    assert(rows.count(_.getLong(3) == 1L) > 0, "no filled buckets — spine degenerate")
  }

  // ---- seq_pack ----

  test("sequence packing conserves docs and tokens; bins contiguous per shard") {
    val docs = Tables(spark, sf0001, "documents")
    val totDocs = docs.count()
    val totToks = docs.select(sum(size(split(col("text"), "\\s+"))))
      .collect().head.getLong(0)
    val packs = q("seq_pack").collect()
    assert(packs.map(_.getLong(2)).sum == totDocs, "docs not conserved")
    assert(packs.map(_.getLong(3)).sum == totToks, "tokens not conserved")
    packs.groupBy(_.getLong(0)).foreach { case (shard, rs) =>
      val bins = rs.map(_.getLong(1)).sorted
      assert(bins.head == 0 && bins.last == bins.length - 1,
        s"shard $shard: bins not contiguous from 0: ${bins.toSeq}")
    }
  }

  // ---- mixture_weights ----

  test("mixture weights: capped at 2x, expectation bounded by cap and total") {
    val rows = q("mixture_weights").collect()
    val totTok = rows.map(_.getLong(2)).sum.toDouble
    val nSrc = rows.length
    rows.foreach { r =>
      val (w, exp, toks) = (r.getDouble(3), r.getLong(4), r.getLong(2))
      assert(w > 0 && w <= 2.0, s"${r.getString(0)}: weight $w out of (0, 2]")
      assert(exp <= 2L * toks, "expectation exceeds the upsample cap")
      // an uncapped source lands exactly on the uniform token share
      if (w < 2.0)
        assert(math.abs(exp - totTok / nSrc) <= 1.0,
          s"${r.getString(0)}: uncapped source missed the uniform share")
    }
  }

  // ---- sample_stratified ----

  test("stratified sample: rates honored, large strata downsampled toward min") {
    val rows = q("sample_stratified").collect()
    val minTotal = rows.map(_.getLong(1)).min
    rows.foreach { r =>
      val (total, rate, sampled) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(sampled <= total, "sampled more than the stratum holds")
      if (total == minTotal) assert(rate == 100, "smallest stratum must keep all")
      // fingerprint-mod sampling tracks the nominal rate (binomial, loose 3σ)
      val expected = total * rate / 100.0
      val sigma = math.sqrt(expected) max 1.0
      assert(math.abs(sampled - expected) <= 4 * sigma,
        s"${r.getString(0)}: $sampled vs expected $expected (rate $rate%)")
    }
  }

  // ---- table_profile ----

  test("profile: one row per column, consistent bounds, matches table count") {
    val n = Tables(spark, sf0001, "lineitem").count()
    val rows = q("table_profile").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) == n, s"${r.getString(0)}: row count mismatch")
      assert(r.getLong(3) <= n - r.getLong(2), "distinct exceeds non-null count")
      assert(r.getDouble(4) <= r.getDouble(5), "min above max")
    }
  }

  test("approx profile: HLL distincts within 3x rsd of exact, rest identical, no Expand") {
    val exact = q("table_profile").collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = q("table_profile_approx").collect()
    assert(approx.length == exact.size)
    // 3σ of the configured rsd: the tolerance tracks the setting, so
    // retuning ProfileRsd (or regenerating testdata) can't strand a
    // column past a hardcoded constant with 1.25σ of headroom
    val bound = 3 * graft.ops.PackOps.ProfileRsd
    approx.foreach { r =>
      val e = exact(r.getString(0))
      // everything but the distinct estimate is computed identically
      assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2) &&
        r.getDouble(4) == e.getDouble(4) && r.getDouble(5) == e.getDouble(5),
        s"${r.getString(0)}: non-distinct measures diverged from the exact form")
      val (est, act) = (r.getLong(3).toDouble, e.getLong(3).toDouble)
      assert(math.abs(est - act) / act <= bound,
        s"${r.getString(0)}: HLL estimate $est vs exact $act beyond 3x rsd ($bound)")
    }
    // the whole point of the twin: approx distincts need no Expand replay
    val p = plan("table_profile_approx")
    assert(!p.contains("Expand"), s"approx profile still pays the Expand:\n$p")
    assert(plan("table_profile").contains("Expand"),
      "exact anchor unexpectedly lost its Expand — update the scale notes")
  }

  // ---- funnel / cohort ----

  test("funnel steps are monotonically shrinking") {
    val steps = q("funnel").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(steps.keySet == Set("step1_view", "step2_click", "step3_purchase"))
    assert(steps("step1_view") >= steps("step2_click"),
      "a later funnel step cannot exceed an earlier one")
    assert(steps("step2_click") >= steps("step3_purchase"))
    assert(steps("step1_view") > 0)
  }

  test("cohort retention: offset 0 equals cohort size, offsets within cap") {
    val events = Tables(spark, sf0001, "events")
    val cohortSizes = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = q("cohort_retention").collect()
    rows.foreach { r =>
      val (cohort, off, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(off >= 0 && off <= 7, s"offset $off out of range")
      assert(n <= cohortSizes(cohort), "active users exceed the cohort size")
      // every user is active on their first-seen day by construction
      if (off == 0) assert(n == cohortSizes(cohort),
        s"cohort $cohort: day-0 actives $n != cohort size ${cohortSizes(cohort)}")
    }
  }

  // ---- dq_check ----

  test("data-quality gate: generator data passes every rule with zero violations") {
    val rows = q("dq_check").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == Seq("discount_range", "orphan_orderkey",
      "price_positive", "quantity_range", "shipdate_null"))
    rows.foreach { case (rule, n) =>
      assert(n == 0, s"rule $rule reports $n violations on healthy data")
    }
  }

  // ---- plan shapes ----

  test("time-series windows are partitioned — no single-partition exchange") {
    for (name <- Seq("events_headway", "resample_locf", "seq_pack")) {
      val p = plan(name)
      assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
        s"$name funnels a window through one partition:\n$p")
    }
  }

  test("anomaly and stratified-sample stats joins broadcast") {
    for (name <- Seq("anomaly_zscore", "sample_stratified")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: stats join not broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name: cartesian product")
    }
  }

  test("table_profile is a single scan of lineitem") {
    val p = plan("table_profile")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"profile scans the table more than once:\n$p")
  }

  test("events_holt: a linear ramp is a fixed point (exact level/trend/forecast)") {
    import spark.implicits._
    // v_t = 10 + 2.5·t is a FIXED POINT of Holt smoothing: the seed
    // (l = v1, b = v2 − v1) lies on the line and every update returns
    // to it, so level = last value, trend = slope, forecast = next
    // point — EXACTLY, in doubles (the per-step arithmetic is exact for
    // these dyadic values). A non-linear user in the same fixture must
    // NOT sit on its line.
    val dir = java.nio.file.Files.createTempDirectory("graft-holt").toString
    val lin = (0 until 20).map(i => (i.toLong, 7L, 10.0 + 2.5 * i))
    val bent = (0 until 20).map(i =>
      (100L + i, 8L, if (i == 10) 500.0 else 10.0 + 2.5 * i))
    (lin ++ bent)
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("event_type", lit("x")).withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("events_holt")(spark, dir).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Double]("level"), x.getAs[Double]("trend"),
          x.getAs[Double]("forecast")))).toMap
    assert(r(7L) == ((10.0 + 2.5 * 19, 2.5, 10.0 + 2.5 * 20)))
    assert(r(8L)._2 != 2.5, "the level spike must perturb the trend")
  }

  test("events_hw: a pure periodic series is a fixed point; short series seed-degrade") {
    import spark.implicits._
    // y_t = c + season[t mod 4] with a zero-sum season is a FIXED POINT
    // of additive Holt-Winters under the first-season seed: l₀ = c
    // (one-season mean), b₀ = 0, s_i = the exact deviations; every
    // update returns (c, 0, s) and the forecast hits the NEXT value
    // exactly, in doubles (dyadic season and gains). A user whose
    // period is 5 ≠ m in the same fixture must NOT predict exactly.
    val season = Array(4.0, -2.0, 1.5, -3.5) // sums to 0
    val c = 20.0
    val per = (0 until 21).map(i => (i.toLong, 1L, c + season(i % 4)))
    val off = (0 until 21).map(i =>
      (100L + i, 2L, c + (if (i % 5 == 0) 4.0 else -1.0)))
    val short3 = (0 until 3).map(i => (200L + i, 3L, 10.0 + i)) // n < m
    val single = Seq((300L, 4L, 42.0))
    (per ++ off ++ short3 ++ single)
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("event_type", lit("x")).withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(s"$dir2/events.parquet")
    val r = SparkEntry.queries("events_hw")(spark, dir2).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Double]("level"), x.getAs[Double]("trend"),
          x.getAs[Double]("season_next"), x.getAs[Double]("forecast")))).toMap
    // 21 points = seed season + 17 updates; next index is 21, 21 % 4 = 1
    assert(r(1L) == ((c, 0.0, season(1), c + season(1))),
      s"periodic fixed point violated: ${r(1L)}")
    assert(r(2L)._4 != c + 4.0 && r(2L)._4 != c - 1.0,
      "a period-5 series must not be an m=4 fixed point")
    // n < m: seed only — level = mean of the 3 values, trend 0, and the
    // next season slot is the first deviation
    assert(r(3L) == ((11.0, 0.0, 10.0 - 11.0, 11.0 + 0.0 + (10.0 - 11.0))))
    assert(r(4L) == ((42.0, 0.0, 0.0, 42.0)))
  }

  test("events_cusum: a planted mean shift alarms, a constant series never does") {
    import spark.implicits._
    // user 1: 30 points at 10 then 30 points at 30 — a textbook level
    // shift. With sd computed over the WHOLE series (both regimes), the
    // shift magnitude (≈2 sd) clears the K = sd/2 allowance quickly and
    // S+ crosses H = 4 sd within the second regime. user 2: constant —
    // sd = 0 degrades K = H = 0 and the strict > never fires.
    val shift = (0 until 60).map(i =>
      (i.toLong, 1L, if (i < 30) 10.0 else 30.0))
    val const = (0 until 40).map(i => (100L + i, 2L, 7.5))
    (shift ++ const).toDF("event_id", "user_id", "value")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
      .withColumn("event_type", lit("x")).withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(s"$dir3/events.parquet")
    val r = SparkEntry.queries("events_cusum")(spark, dir3).collect()
      .map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Long]("n_alarms"), x.getAs[Double]("s_plus"),
          x.getAs[Double]("s_minus")))).toMap
    assert(r(1L)._1 >= 1L, s"planted shift raised no alarm: ${r(1L)}")
    assert(r(2L) == ((0L, 0.0, 0.0)), s"constant series drifted: ${r(2L)}")
    // sums are non-negative by construction
    r.values.foreach { case (_, sp, sm) => assert(sp >= 0.0 && sm >= 0.0) }
  }

  private lazy val dir2: String =
    java.nio.file.Files.createTempDirectory("graft-hw").toString

  private lazy val dir3: String =
    java.nio.file.Files.createTempDirectory("graft-cusum").toString
}
