package graft.ops

import graft.expr.{functions => gf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import DedupOps.{normed, normedSql, vdot, vdotSql}

/** Distributed k-means over the embedding corpus + semantic (cluster-
  * blocked) near-duplicate pruning — the SemDeDup recipe (Abbas et al.
  * 2023, public): cluster the corpus, then prune near-duplicates INSIDE
  * each cluster, so the pair search is blocked by cluster id and never
  * quadratic in the corpus.
  *
  * Contrast with [[SimilarityOps.fitCentroids]]: that quantizer fit runs
  * Lloyd on a bounded DRIVER-side sample (it only needs a good-enough
  * coarse index). `kmFit` here is the DISTRIBUTED fit — every iteration
  * assigns EVERY vector on the cluster (a zero-shuffle projection through
  * the codegen [[graft.expr.EmbedOps.topCells]] kernel against a broadcast
  * centroid literal) and recomputes centroids with one tiny
  * (cell, dim)-keyed aggregate (map-side partials; k·dim rows to the
  * driver per round, the BPE-argmax precedent for iterative training).
  * At 100 TB the per-iteration cost is one scan of the checkpointed
  * vectors + a k·dim-row shuffle — nothing driver-side grows with |corpus|.
  *
  * Float discipline (the pagerank/embed_centroids rules):
  *   - per-iteration centroids are `round(avg(x), 9)` in BOTH engines
  *     (cross-row sums are partition-order-dependent; round-9 restores
  *     parity), and the seeds are round-9 too, so carried centroids are
  *     uniformly round-9 values;
  *   - the driver normalizes centroid rows with the same index-ordered
  *     fold the mirror's `sqrt(vdotSql)` + `list_transform` computes —
  *     bit-identical doubles in, bit-identical doubles out;
  *   - assignment compares `dot(vec, ncent)` folded in index order in
  *     both engines (kernel loop vs `list_reduce`), ties to the lowest
  *     cell (kernel keeps the first strict maximum; mirror orders
  *     `sim DESC, cell`).
  *
  * K is pinned small (8) so the oracle can unroll the whole fit as
  * MATERIALIZED CTEs (one cross join of N×K rows per iteration at
  * sf0.01). Production runs the same code path with `ivfParams`-scaled
  * K (~√N cells): only the literal grows; the plan shape is identical.
  */
object ClusterOps {

  private def t(s: SparkSession, dir: String, n: String) =
    graft.Tables(s, dir, n)

  private[graft] val K = 8
  private[graft] val KmIters = 4
  private val CentScale = 9 // per-iteration centroid rounding (parity)
  private val OutScale = 6 // published cosine rounding
  /** Same near-dup threshold as the `dedup_embedding*` family — the
    * planted dups sit far above it, the synthetic bulk far below. */
  private[graft] val SemThresh = 0.35

  /** Fit-once cache keyed by dataset content (the fitCentroids rule: a
    * regenerated dataset refits instead of silently reusing a stale model). */
  private val kmCache = new ContentKey.Lru[(Int, Array[Array[Double]])](8)

  /** Driver-side normalization of the round-9 centroid rows. Index-ordered
    * fold for the norm, one division per component — the exact IEEE ops the
    * mirror's `sqrt(vdotSql(cent, cent))` + `list_transform(cent, x -> x / cn)`
    * performs, so both engines assign against bit-identical unit rows.
    * A zero row (impossible on this corpus, guarded anyway) passes through
    * unnormalized in both engines. */
  private def normRows(c: Array[Array[Double]]): Array[Array[Double]] =
    c.map { r =>
      var acc = 0.0
      var i = 0
      while (i < r.length) { acc += r(i) * r(i); i += 1 }
      val n = math.sqrt(acc)
      if (n == 0) r.clone() else r.map(_ / n)
    }

  /** (dim, K×dim round-9 centroid matrix) after [[KmIters]] distributed
    * Lloyd rounds, seeded by the K lowest-id vectors. All rounding happens
    * IN-ENGINE (`round(·, 9)` on seeds and on every per-cell mean) — the
    * driver never rounds, it only carries engine-rounded values between
    * rounds, so the mirror's unrolled `round(avg(x), 9)` CTEs see the same
    * decimals. Empty cells carry their previous centroid (mirror: LEFT
    * JOIN + coalesce against the prior round). */
  private[graft] def kmFit(s: SparkSession, dir: String): (Int, Array[Array[Double]]) = {
    val key = ContentKey.of(s, Seq(s"$dir/embeddings.parquet"))
    kmCache.get(key) {
      // one materialization; every Lloyd round re-reads these blocks
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val seeds = e.filter(col("vec_id") < K).orderBy("vec_id")
        .select(transform(col("embedding"),
          x => round(x.cast("double"), CentScale)).as("se"))
        .collect().map(_.getSeq[Double](0).toArray)
      val dim = seeds.head.length
      var cents = seeds
      for (_ <- 1 to KmIters) {
        val flat = typedLit(normRows(cents).flatten.toSeq)
        val upd = e
          .select(
            element_at(gf.ivf_cells(col("embedding"), flat, lit(dim), lit(1)), 1)
              .as("cell"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          .agg(round(avg(col("x").cast("double")), CentScale).as("c"))
          .collect()
        val next = cents.map(_.clone()) // empty-cell carry
        upd.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        cents = next
      }
      (dim, cents)
    }
  }

  /** Final assignment frame: (vec_id, embedding, norm, cell) — a pure
    * projection over the vectors (broadcast literal, no join, no shuffle). */
  private def assigned(s: SparkSession, dir: String): DataFrame = {
    val (dim, cents) = kmFit(s, dir)
    val flat = typedLit(normRows(cents).flatten.toSeq)
    normed(s, dir).select(col("vec_id"), col("embedding"), col("norm"),
      element_at(gf.ivf_cells(col("embedding"), flat, lit(dim), lit(1)), 1)
        .as("cell"))
  }

  /** Per-vector cluster assignment + cosine to the (unit) centroid. */
  private def embedKmeans(s: SparkSession, dir: String): DataFrame = {
    val (_, cents) = kmFit(s, dir)
    val rows = typedLit(normRows(cents).map(_.toSeq).toSeq)
    assigned(s, dir)
      .select(col("vec_id"), col("cell"),
        round(
          gf.vec_dot_fd(col("embedding"), element_at(rows, col("cell") + 1))
            / col("norm"), OutScale).as("cos_c"))
      .orderBy("vec_id")
  }

  /** Cluster-blocked near-dup pruning: candidate pairs are an equi-join on
    * the cluster id (the banded-join discipline — never a cross product),
    * exact cosine inside. A vector is DROPPED when a lower-id vector in
    * its cluster clears [[SemThresh]]; the published keeper is the
    * strongest such partner (max cos, ties to the lowest id — a total
    * order, the rn=1 discipline). Recall vs the brute anchor
    * (`dedup_embedding_exact`) is bounded by cluster agreement — near-dups
    * essentially always share an argmax cell (asserted in ClusterSpec);
    * the trade is the point of SemDeDup: pair work drops from |corpus|²
    * to Σ|cell|². */
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = assigned(s, dir)
    val a = e.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("norm").as("a_norm"))
    val b = e.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("norm").as("b_norm"))
    a.join(b, "cell")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (vdot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")))
          .as("cos"))
      .filter(col("cos") >= SemThresh)
      .groupBy("b_id")
      .agg(
        max_by(col("a_id"), struct(col("cos").as("c"), (-col("a_id")).as("t")))
          .as("keep_id"),
        max(col("cos")).as("cos"))
      .select(col("b_id").as("drop_id"), col("keep_id"),
        round(col("cos"), OutScale).as("cos_sim"))
      .orderBy("drop_id")
  }

  // ---- oracle mirrors: the fit unrolls as MATERIALIZED CTEs ----

  /** Shared CTE prefix replaying the whole distributed fit in DuckDB:
    * km_dd (unnested doubles), km_c0 (round-9 seeds), then per round i:
    * km_n{i} (normalized rows of c{i-1}) → km_a{i} (argmax assignment)
    * → km_c{i} (round-9 means, empty-cell carry), ending in km_nf/km_af
    * (final normalized centroids and final assignment with its sim). */
  private val kmCtes: String = {
    def nOf(src: String, alias: String) =
      s"""$alias AS (
         |  SELECT cell, CASE WHEN cn = 0 THEN cent
         |    ELSE list_transform(cent, x -> x / cn) END AS ncent
         |  FROM (
         |    SELECT cell, cent, sqrt(${vdotSql("cent", "cent")}) AS cn
         |    FROM (SELECT cell, list(c ORDER BY pos) AS cent
         |          FROM $src GROUP BY cell)))""".stripMargin
    def aOf(nSrc: String, alias: String) =
      s"""$alias AS MATERIALIZED (
         |  SELECT vec_id, cell, sim FROM (
         |    SELECT e.vec_id, n.cell,
         |      ${vdotSql("e.embedding", "n.ncent")} AS sim,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${vdotSql("e.embedding", "n.ncent")} DESC, n.cell)
         |        AS rn
         |    FROM embeddings e, $nSrc n) WHERE rn = 1)""".stripMargin
    val iters = (1 to KmIters).map { i =>
      s"""${nOf(s"km_c${i - 1}", s"km_n$i")},
         |${aOf(s"km_n$i", s"km_a$i")},
         |km_c$i AS MATERIALIZED (
         |  SELECT p.cell, p.pos, coalesce(m.c, p.c) AS c
         |  FROM km_c${i - 1} p LEFT JOIN (
         |    SELECT a.cell, d.pos, round(avg(d.x), $CentScale) AS c
         |    FROM km_a$i a JOIN km_dd d USING (vec_id) GROUP BY 1, 2) m
         |  ON m.cell = p.cell AND m.pos = p.pos)""".stripMargin
    }.mkString(",\n")
    s"""km_dd AS MATERIALIZED (
       |  SELECT vec_id,
       |    unnest(CAST(embedding AS DOUBLE[])) AS x,
       |    unnest(range(1, len(embedding) + 1)) AS pos
       |  FROM embeddings),
       |km_c0 AS (
       |  SELECT CAST(vec_id AS INT) AS cell, pos, round(x, $CentScale) AS c
       |  FROM km_dd WHERE vec_id < $K),
       |$iters,
       |${nOf(s"km_c$KmIters", "km_nf")},
       |${aOf("km_nf", "km_af")}""".stripMargin
  }

  // ---- per-cluster curation quota (cluster-balanced sampling) ----
  // The D4/DataComp step after SemDeDup: cap what any one semantic
  // region contributes to the training mix — dense regions are
  // redundant, rare regions carry the diversity signal. Per k-means
  // cell, rank documents by quality (n_chars DESC, doc_id tiebreak — a
  // total order, deterministic in both engines) and keep the top
  // [[QuotaPerCell]]. Blocked by the SHARED kmFit assignment — the same
  // cells dedup_semantic prunes within — so curation and dedup agree on
  // what "a semantic region" is. Scale shape: one cell-partitioned rank
  // window over |corpus| rows; nothing global, nothing quadratic.
  private val QuotaPerCell = 40

  private def clusterQuota(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cell")
      .orderBy(col("n_chars").desc, col("doc_id"))
    assigned(s, dir).select(col("vec_id").as("doc_id"), col("cell"))
      .join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id")
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("cell").cast("int").as("cell"),
        col("n_chars"), col("rk").cast("int").as("rk"),
        (col("rk") <= QuotaPerCell).as("kept"))
      .orderBy("doc_id")
  }

  private val clusterQuotaSql =
    s"""WITH $kmCtes,
       |cq AS (
       |  SELECT a.vec_id AS doc_id, CAST(a.cell AS INT) AS cell, d.n_chars,
       |    CAST(row_number() OVER (PARTITION BY a.cell
       |      ORDER BY d.n_chars DESC, a.vec_id) AS INT) AS rk
       |  FROM km_af a JOIN documents d ON d.doc_id = a.vec_id)
       |SELECT doc_id, cell, n_chars, rk, rk <= $QuotaPerCell AS kept
       |FROM cq ORDER BY doc_id""".stripMargin

  private val embedKmeansSql =
    s"""WITH $kmCtes
       |SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
       |  round(a.sim / sqrt(${vdotSql("e.embedding", "e.embedding")}),
       |    $OutScale) AS cos_c
       |FROM km_af a JOIN embeddings e USING (vec_id)
       |ORDER BY vec_id""".stripMargin

  private val dedupSemanticSql =
    s"""WITH $kmCtes,
       |nv AS ($normedSql),
       |pc AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${vdotSql("ea.embedding", "eb.embedding")} / (ea.norm * eb.norm)
       |      AS cos
       |  FROM km_af a JOIN km_af b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN nv ea ON ea.vec_id = a.vec_id
       |  JOIN nv eb ON eb.vec_id = b.vec_id),
       |pf AS (SELECT * FROM pc WHERE cos >= $SemThresh)
       |SELECT b_id AS drop_id, a_id AS keep_id, round(cos, $OutScale) AS cos_sim
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY b_id
       |    ORDER BY cos DESC, a_id) AS rn FROM pf)
       |WHERE rn = 1 ORDER BY drop_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_kmeans" -> (embedKmeans _),
    "cluster_quota" -> (clusterQuota _),
    "dedup_semantic" -> (dedupSemantic _))

  val oracle: Map[String, String] = Map(
    "embed_kmeans" -> embedKmeansSql,
    "cluster_quota" -> clusterQuotaSql,
    "dedup_semantic" -> dedupSemanticSql)
}
