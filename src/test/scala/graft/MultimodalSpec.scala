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

  test("resizeBatch fits dimensions into the max while keeping aspect") {
    val decoded = MultimodalOps.decodeBatch(spark, blobs)
    val resized = MultimodalOps.resizeBatch(decoded, maxDim = 100).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(m => m.width <= 100 && m.height <= 100))
    val orig = decoded.collect().map(m => m.doc_id -> m).toMap
    resized.foreach { m =>
      val o = orig(m.doc_id)
      if (o.width <= 100 && o.height <= 100) // small media untouched
        assert(m.width == o.width && m.height == o.height)
      else { // aspect preserved within integer truncation
        val r0 = o.width.toDouble / o.height
        val r1 = m.width.toDouble / m.height
        assert(math.abs(r0 - r1) / r0 < 0.1, s"aspect drifted: $o -> $m")
      }
    }
  }

  test("frameSample emits every step-th frame index per video") {
    val decoded = MultimodalOps.decodeBatch(spark, blobs)
    val frames = MultimodalOps.frameSample(decoded, step = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx")))
    val byDoc = frames.groupBy(_._1)
    val counts = decoded.collect().map(m => m.doc_id -> m.frames).toMap
    byDoc.foreach { case (id, fs) =>
      val expect = (0 until counts(id) by 2).toSet
      assert(fs.map(_._2).toSet == expect, s"doc $id: ${fs.toSeq} vs $expect")
    }
  }

  test("decode runs distributed (partition-level batches, no collect)") {
    val plan = MultimodalOps.decodeBatch(spark, blobs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions")
      || plan.contains("SerializeFromObject"), plan)
  }
}
