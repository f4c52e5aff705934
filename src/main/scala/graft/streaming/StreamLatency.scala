package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import scala.jdk.CollectionConverters._

/** End-to-end latency of the polling ingest path — HTTP fetch → protobuf
  * decode → enrich → hive-partitioned parquet append — measured per
  * trigger from the engine's own progress events, so the number covers
  * everything a trigger does (poll, plan, write, commit), not just the
  * fetch. Published by [[graft.Bench]] as p50/p95 seconds so streaming
  * regressions are visible round over round.
  */
object StreamLatency {

  /** Serve a synthetic feed from a loopback JDK HttpServer and poll it
    * until `triggers` non-empty triggers have been measured (or
    * `deadlineSec` passes — the result then carries however many
    * completed). `useV2` picks the measured path: the offset-tracked V2
    * source with its payload WAL ([[HttpFeedSource.pollQueryV2]], the
    * production path and the default) or the legacy rate-tick poller
    * ([[HttpFeedSource.pollQuery]]) — benched side by side so the WAL's
    * durability cost per trigger is a published number, not a guess.
    * Returns (p50, p95, n). */
  def measure(spark: SparkSession, triggers: Int, vehicles: Int = 200,
      deadlineSec: Int = 120, useV2: Boolean = true): (Double, Double, Int) = {
    // everything after server.start()/addListener nests in try/finally:
    // a leaked HttpServer keeps a non-daemon dispatcher thread alive and
    // the Bench JVM would never exit
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val polls = new java.util.concurrent.atomic.AtomicLong(0)
    server.createContext("/feed", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        // advance the feed timestamp per poll like a live feed would
        val body = FeedGen.vehicleFeed(vehicles, 1700000000L + polls.getAndIncrement())
        x.sendResponseHeaders(200, body.length)
        try x.getResponseBody.write(body) finally x.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/feed"
      val durations = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Double]()
      // only the poll query's triggers count: the listener is session-
      // global, and a concurrent stream's progress events must not be
      // attributed to this measurement
      @volatile var measuredId: java.util.UUID = null
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          // rate-source ticks arrive ~1/s; sub-second triggers in between
          // carry no rows and do no ingest work — skip them
          if (measuredId != null && e.progress.id == measuredId &&
              e.progress.numInputRows > 0)
            Option(e.progress.durationMs.get("triggerExecution"))
              .foreach(ms => durations.add(ms.toDouble / 1000.0))
      }
      spark.streams.addListener(listener)
      val out = Files.createTempDirectory("graft-e2e-out")
      val ckpt = Files.createTempDirectory("graft-e2e-ckpt")
      try {
        // V2 covers the production poll path per trigger: WAL persist +
        // offset advance + decode/enrich/write; legacy covers the same
        // ingest minus the durable source bookkeeping
        val t = Trigger.ProcessingTime("500 milliseconds")
        val q =
          if (useV2) HttpFeedSource.pollQueryV2(spark, url, out.toString,
            ckpt.toString, trigger = t)
          else HttpFeedSource.pollQuery(spark, url, out.toString,
            ckpt.toString, trigger = t)
        measuredId = q.id
        val deadline = System.nanoTime() + deadlineSec * 1e9.toLong
        try
          while (durations.size < triggers && System.nanoTime() < deadline)
            Thread.sleep(100)
        finally q.stop()
        val ds = durations.asScala.map(_.doubleValue()).toSeq.sorted
        require(ds.nonEmpty, "no non-empty triggers completed before the deadline")
        def pct(p: Double): Double =
          ds(math.min(ds.size - 1, math.ceil(p * ds.size).toInt - 1).max(0))
        (pct(0.5), pct(0.95), ds.size)
      } finally {
        spark.streams.removeListener(listener)
        rmTree(out); rmTree(ckpt) // recurring bench path must not grow /tmp
      }
    } finally server.stop(0)
  }

  private def rmTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files => F}
    if (F.exists(root)) {
      val walk = F.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => F.deleteIfExists(p))
      finally walk.close()
    }
  }
}
