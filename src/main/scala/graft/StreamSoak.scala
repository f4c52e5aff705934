package graft

import java.nio.file.Files
import graft.streaming.{DedupMonitor, DirIndex, IvfMonitor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger, TTLConfig}

/** Long-run streaming soak (round-9 verdict ask #6): per-trigger
  * throughput was proven by the Bench load sweep; nothing proved LONG-RUN
  * stability — state-store growth, latency drift, and the DirIndex
  * compact/vacuum protocol cycling underneath a live ingest for hundreds
  * of triggers. This main drives two streams concurrently to a trigger
  * budget (default 500 each):
  *
  *   - an [[IvfMonitor]] ingest: rate-sourced (vec_id, embedding) rows
  *     assigned under the frozen sf0.01 quantizer, one committed `b<j>`
  *     append per trigger, with [[DirIndex.compact]] + vacuum cycled
  *     every `SOAK_COMPACT_EVERY` completed triggers from a maintenance
  *     thread — the mid-stream exactly-once stress the protocol documents;
  *   - a TTL-active [[DedupMonitor]] (transformWithState state API v2,
  *     RocksDB provider): content-hash claim store under a TTL chosen so
  *     the soak crosses several retention horizons — state must PLATEAU,
  *     not grow with stream length. A TTL stream in ProcessingTime mode
  *     never quiesces (shouldRunAnotherBatch is unconditionally true), so
  *     both streams run throttled ProcessingTime triggers and the driver
  *     polls listener counts against a deadline — the StreamingSpec
  *     drive discipline.
  *
  * Per-100-trigger windows record p50/p95 trigger latency per stream,
  * dedup state rows + bytes (stateOperators), committed index dirs, and
  * cumulative compact absorptions / vacuum removals. Printed as ONE JSON
  * line (the Bench contract) — the pass criteria are flat p95 across
  * windows and bounded state, judged from the published windows.
  */
object StreamSoak {

  private case class Prog(sec: Double, stateRows: Long, stateBytes: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val triggers = sys.env.getOrElse("SOAK_TRIGGERS", "500").toInt
    val window = 100
    val compactEvery = sys.env.getOrElse("SOAK_COMPACT_EVERY", "25").toInt
    val rowsPerSec = sys.env.getOrElse("SOAK_ROWS_PER_SEC", "2000").toInt
    val quantDir = sys.env.getOrElse("SOAK_QUANT_DIR", "/root/testdata/sf0.01")
    val deadlineSec = sys.env.getOrElse("SOAK_DEADLINE_SEC", "1200").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // transformWithState (state API v2) requires the RocksDB provider
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming" +
          ".state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft-soak").toString
    val indexDir = s"$root/ivf_index"
    // seed the index from the reference corpus — the offline base load
    IvfMonitor.seed(spark, quantDir, Tables(spark, quantDir, "embeddings")
      .select(col("vec_id"), col("embedding")), indexDir)

    // deterministic rate-derived embedding stream: 64 pseudo-random floats
    // per row from splitmix-style hashing — enough spread that cell
    // assignment exercises the whole quantizer
    val dim = 64
    val emb = transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(col("value") * dim + i), lit(2000)) / 1000.0 - 1.0)
        .cast("float"))
    val ivfIn = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec).load()
      .select(col("value").as("vec_id"), emb.as("embedding"))

    // dedup stream with TTL: key space cycles every 50k ids so hashes
    // recur within the horizon (exercising the claim path) while the TTL
    // forgets cold hashes (exercising expiry — the bounded-state claim)
    val dedupIn = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec).load()
      .select(col("value").as("doc_id"),
        concat(lit("doc "), (col("value") % 50000).cast("string")).as("text"))
    val dedupOut = DedupMonitor.dedup(dedupIn, "doc_id", "text",
      TTLConfig(java.time.Duration.ofSeconds(60)))

    val ivfProg = new java.util.concurrent.CopyOnWriteArrayList[Prog]()
    val dedupProg = new java.util.concurrent.CopyOnWriteArrayList[Prog]()
    @volatile var ivfId: java.util.UUID = null
    @volatile var dedupId: java.util.UUID = null
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) {
          val sec = Option(p.durationMs.get("triggerExecution"))
            .map(_.toDouble / 1000.0).getOrElse(0.0)
          val (rows, bytes) = p.stateOperators.headOption
            .map(so => (so.numRowsTotal, so.memoryUsedBytes)).getOrElse((0L, 0L))
          if (p.id == ivfId) ivfProg.add(Prog(sec, rows, bytes))
          else if (p.id == dedupId) dedupProg.add(Prog(sec, rows, bytes))
        }
      }
    }
    spark.streams.addListener(listener)

    val ivfQ = IvfMonitor.attach(ivfIn, quantDir, indexDir)
      .option("checkpointLocation", s"$root/ivf_ckpt")
      .trigger(Trigger.ProcessingTime("400 milliseconds"))
      .start()
    ivfId = ivfQ.id
    val dedupQ = dedupOut.writeStream.format("noop")
      .option("checkpointLocation", s"$root/dedup_ckpt")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("400 milliseconds"))
      .start()
    dedupId = dedupQ.id

    // maintenance loop: cycle compact + vacuum against the LIVE ingest
    // every `compactEvery` completed ivf triggers (serialized, as the
    // DirIndex contract requires — only the ingest runs concurrently)
    var absorbed = 0L
    var vacuumed = 0L
    var lastMaint = 0
    val deadline = System.nanoTime() + deadlineSec * 1e9.toLong
    try {
      while ((ivfProg.size < triggers || dedupProg.size < triggers) &&
          System.nanoTime() < deadline) {
        Thread.sleep(200)
        val done = ivfProg.size
        if (done - lastMaint >= compactEvery) {
          lastMaint = done
          absorbed += IvfMonitor.compact(spark, indexDir)
          vacuumed += IvfMonitor.vacuum(spark, indexDir)
        }
      }
    } finally { ivfQ.stop(); dedupQ.stop() }
    spark.streams.removeListener(listener)

    // final maintenance pass with the ingest stopped, then verify the
    // adopted index is readable end-to-end (a torn protocol would fail
    // loudly here, not pass silently)
    absorbed += IvfMonitor.compact(spark, indexDir)
    vacuumed += IvfMonitor.vacuum(spark, indexDir)
    val dirs = IvfMonitor.committedDirs(spark, indexDir)
    val indexRows = IvfMonitor.index(spark, indexDir).count()

    import scala.jdk.CollectionConverters._
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0
      else xs.sorted.apply(
        math.min(xs.size - 1, math.ceil(p * xs.size).toInt - 1).max(0))
    def windows(ps: Seq[Prog]): Seq[String] =
      ps.grouped(window).zipWithIndex.filter(_._1.size >= window / 2)
        .map { case (w, i) =>
          val secs = w.map(_.sec)
          f"""{"w":$i,"n":${w.size},"p50":${pct(secs, 0.5)}%.3f,""" +
            f""""p95":${pct(secs, 0.95)}%.3f,""" +
            s""""state_rows":${w.last.stateRows},""" +
            s""""state_bytes":${w.last.stateBytes}}"""
        }.toSeq
    val ivfW = windows(ivfProg.asScala.toSeq)
    val dedupW = windows(dedupProg.asScala.toSeq)
    ivfW.zipWithIndex.foreach { case (w, i) => println(s"[soak] ivf $w") }
    dedupW.zipWithIndex.foreach { case (w, i) => println(s"[soak] dedup $w") }
    println(
      s"""{"metric":"stream_soak","triggers_ivf":${ivfProg.size},""" +
        s""""triggers_dedup":${dedupProg.size},""" +
        s""""compact_absorbed":$absorbed,"vacuumed":$vacuumed,""" +
        s""""committed_dirs":${dirs.size},"index_rows":$indexRows,""" +
        s""""ivf_windows":[${ivfW.mkString(",")}],""" +
        s""""dedup_windows":[${dedupW.mkString(",")}]}""")
    spark.stop()
  }
}
