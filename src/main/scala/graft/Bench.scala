package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs the query catalog on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line. Each query is fully materialized through the `noop` sink
  * (executes the whole plan — joins, windows, sorts — without collect()
  * driver pressure or disk writes). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.functions.register(spark)

    def runOne(name: String, fn: (SparkSession, String) => DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed on $dir: ${e.getMessage}")
        -1.0
      }
    }

    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)

    // Warmup pass on the smallest SF: same plan shapes → compiles every
    // wholestage-codegen class and lets the JIT finish before timing, so
    // the timed pass measures the plans rather than compilation lag.
    // Concurrent: codegen/JIT compilation is the bottleneck, not cores.
    val warmDir = "/root/testdata/sf0.001"
    val t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      catalog.map { case (name, fn) =>
        pool.submit(new Runnable { def run(): Unit = runOne(name, fn, warmDir) })
      }.foreach(_.get())
    } finally pool.shutdown()
    // Idle settle: the parallel warmup saturates the C2 compile queue;
    // timing immediately would charge the drain to the first (alphabetical)
    // queries. An idle pause lets the compiler threads finish.
    Thread.sleep(20000)
    System.err.println(f"[bench] warmup done ${(System.nanoTime() - t0) / 1e9}%.1fs")

    // Timed: two full passes over the catalog, per-query min across
    // passes. Host-level noise arrives in windows of tens of seconds;
    // consecutive reruns share a window, but the same query in two
    // well-separated passes almost never does. Every run executes the
    // full plan through the noop sink.
    def pass(): Map[String, Double] =
      catalog.map { case (name, fn) => name -> runOne(name, fn, sfDir) }.toMap
    val p1 = pass()
    val p2 = pass()
    val results = catalog.map { case (name, _) =>
      val (s1, s2) = (p1(name), p2(name))
      val sec = if (s1 < 0 || s2 < 0) -1.0 else math.min(s1, s2)
      System.err.println(f"[bench] $name $sec%.2fs (passes $s1%.2f / $s2%.2f)")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
