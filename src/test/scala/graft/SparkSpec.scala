package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base — one lazy SparkSession per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf0001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // A query stopped between processAllAvailable() and stop() can lose a
    // teardown race: the interrupted foreachBatch surfaces as a scary but
    // benign `ForeachBatchUserFuncException: InterruptedException` ERROR
    // in an otherwise green run. Tests assert outcomes, not logs — mute
    // the two stream-driver loggers (test scope only; production keeps
    // them, and real failures still fail the suite through assertions).
    Seq("org.apache.spark.sql.execution.streaming.MicroBatchExecution",
        "org.apache.spark.sql.execution.streaming.StreamExecution",
        "org.apache.spark.sql.classic.StreamingQueryManager").foreach { l =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.FATAL)
    }
    graft.expr.functions.register(s)
    s
  }
}
