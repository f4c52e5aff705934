package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's compaction plane (compaction/runtime/handler.py): rewrite
  * a day's (or month's) many small snappy files into few large zstd-15
  * files with tuned row groups (:104-127) — in Spark, a ~20-line batch job:
  * schema-pinned scan → coalesce → sort-within-partitions → parquet write
  * with codec + block-size options.
  *
  * At 100 TB this is the small-file fix that keeps scan parallelism sane:
  * target row groups of 61,440–122,880 rows (the reference's tuning, from
  * the DuckDB perf guide) so readers get locality, and one output file per
  * `targetFiles` so the file index stays small.
  */
object CompactOps {

  /** Zstd level the reference uses for the cold zone (:110-112). */
  val ZstdLevel = 15

  /** Reference row-group bounds (compaction/runtime/handler.py:104-106). */
  val MinRowsPerGroup = 61440
  val MaxRowsPerGroup = 122880

  /** A6: parquet footer introspection — (rows, compressed bytes, codec)
    * per row group across all files of `path`. Mirrors the reference's
    * pq.read_metadata schema/footer pin (compaction handler :86-95). */
  def rowGroupStats(spark: SparkSession,
      path: String): Seq[(Long, Long, String)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    files.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        reader.getFooter.getBlocks.asScala.map { rg =>
          val codec = rg.getColumns.asScala.headOption
            .map(_.getCodec.toString).getOrElse("NONE")
          (rg.getRowCount, rg.getCompressedSize, codec)
        }.toSeq
      } finally reader.close()
    }
  }

  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFiles: Int = 1, sortCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(inPath)
    val arranged = {
      val coalesced = df.coalesce(targetFiles)
      if (sortCols.nonEmpty)
        coalesced.sortWithinPartitions(sortCols.map(col): _*)
      else coalesced
    }
    arranged.write
      .option("compression", "zstd")
      .option("parquet.compression.codec.zstd.level", ZstdLevel.toString)
      // ~122,880 rows × ~100 B/row keeps row groups inside the reference's
      // 61,440–122,880-row band for this schema.
      .option("parquet.block.size", (12 * 1024 * 1024).toString)
      .mode("overwrite")
      .parquet(outPath)
  }
}
