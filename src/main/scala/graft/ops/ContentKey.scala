package graft.ops

import org.apache.spark.sql.SparkSession

/** Content-addressed cache keys for per-dataset derived artifacts (the
  * geo lake, the IVF quantizer, the bucketed join copies): a key built
  * from every underlying file's (path, length, mtime) — recursing into
  * directories, so partitioned layouts invalidate too. Any regeneration
  * that changes a file's size, name, or mtime (at the filesystem's mtime
  * granularity — 1 s on some stores) yields a new key, so a stale
  * derivative is only possible for a byte-identical same-second rewrite.
  * One definition, shared by all cache sites.
  */
private[graft] object ContentKey {

  def md5(x: String, n: Int = 16): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(n)

  /** Digest of every file's (path, length, mtime) triple under the given
    * table paths. Per-file, not aggregated: summing lengths / maxing
    * mtimes would let a regeneration with identical total bytes alias to
    * the old key. Triples are sorted — listing order is not contractual
    * across filesystems. */
  def of(s: SparkSession, paths: Seq[String]): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val triples = Seq.newBuilder[String]
    paths.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val it = path.getFileSystem(conf).listFiles(path, true)
      while (it.hasNext) {
        val f = it.next()
        triples += s"${f.getPath}|${f.getLen}|${f.getModificationTime}"
      }
    }
    md5(s"${paths.mkString("|")}#${triples.result().sorted.mkString("#")}")
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
