package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement probe (round 12): print the per-trigger flagship
  * join plan under (a) plain parquet dim scans and (b) persisted
  * (MEMORY_AND_DISK) dim copies — the two tables-providers the streaming
  * MV can use — to adjudicate the pre-round dim-cache commit (2bd5e7c).
  */
object DebugFlagshipDims {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-flagship")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.functions.register(spark)

    // one micro-batch worth of events (1/8th, like the 8-chunk scale run)
    val batch = Tables(spark, dir, "events").filter(col("event_id") % 8 === 0)

    val parquetProv: (SparkSession, String, String) => DataFrame =
      (s, d, n) => Tables(s, d, n)
    println("=== provider: parquet scans ===")
    graft.ops.Flagship.deviationCandidates(spark, dir, batch, parquetProv)
      .explain("formatted")

    val cached = graft.ops.Flagship.DimCols.map { case (n, cols) =>
      val df = Tables(spark, dir, n).select(cols.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      n -> df
    }
    val cachedProv: (SparkSession, String, String) => DataFrame =
      (s, d, n) => cached(n)
    println("=== provider: persisted dims ===")
    graft.ops.Flagship.deviationCandidates(spark, dir, batch, cachedProv)
      .explain("formatted")
    spark.stop()
  }
}
