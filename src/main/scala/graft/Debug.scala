package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry point (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // match Bench/Verify: without AQE the broadcast decisions differ
      // and Debug timings mislead (pagerank measured 3x slower here
      // before this line)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.functions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    if (args.length > 1 && args(1) == "entry") {
      println(s"[debug] entry rows = ${SparkEntry.entry(spark).count()}")
      spark.stop(); return
    }
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df =
        if (n == "ivf_inline") // bisect twin: round-5 inline candidate shape
          graft.ops.SimilarityOps.ivfTopKAssign(spark, dir, None)
        else if (n == "hn_probe_stages") // mining-pipeline cardinality probe
          graft.ops.SimilarityOps.hnStageProbe(spark, dir)
        else SparkEntry.queries(n)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      println(f"[debug] $n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
