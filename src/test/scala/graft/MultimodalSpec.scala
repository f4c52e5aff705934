package graft

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: batch decode through mapPartitions
  * with the stubbed kernel — schema, batch shape, and determinism. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val blobs = Tables(spark, sf0001, "documents")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  test("decodeBatch yields one typed MediaMeta per blob") {
    val out = MultimodalOps.decodeBatch(spark, blobs)
    assert(out.count() == 500)
    val r = out.filter(col("doc_id") === 0).collect().head
    assert(r.n_bytes > 0 && r.width >= 64 && r.height >= 64 && r.frames >= 1)
  }

  test("stub decode is deterministic across runs and partitionings") {
    val a = MultimodalOps.decodeBatch(spark, blobs).collect().sortBy(_.doc_id)
    val b = MultimodalOps.decodeBatch(spark, blobs.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("decode runs distributed (partition-level batches, no collect)") {
    val plan = MultimodalOps.decodeBatch(spark, blobs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions")
      || plan.contains("SerializeFromObject"), plan)
  }
}
