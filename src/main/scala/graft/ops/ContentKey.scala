package graft.ops

import org.apache.spark.sql.SparkSession

/** Content-addressed cache keys for per-dataset derived artifacts (the
  * geo lake, the IVF quantizer, the bucketed join copies): a key built
  * from every underlying file's (length, mtime) — recursing into
  * directories, so partitioned layouts invalidate too — means
  * regenerated source data can never be served a stale derivative, in
  * this JVM or any other. One definition, shared by all cache sites.
  */
private[graft] object ContentKey {

  def md5(x: String, n: Int = 16): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(n)

  /** (total length, max mtime) digest over one or more table paths. */
  def of(s: SparkSession, paths: Seq[String]): String = {
    val conf = s.sparkContext.hadoopConfiguration
    var len = 0L
    var mtime = 0L
    paths.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val it = path.getFileSystem(conf).listFiles(path, true)
      while (it.hasNext) {
        val f = it.next()
        len += f.getLen
        if (f.getModificationTime > mtime) mtime = f.getModificationTime
      }
    }
    md5(s"${paths.mkString("|")}|$len|$mtime")
  }

  /** Remove stale sibling key-directories of `parent` (every subdir
    * except `keep`) — called when a new content key materializes so tmp
    * holds at most one derivative per source. */
  def evictStale(parent: java.io.File, keep: String): Unit =
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName != keep)
      .foreach { stale =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(stale)
      }
}
