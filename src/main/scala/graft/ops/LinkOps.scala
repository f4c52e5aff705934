package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Record-linkage and link-analysis operators — the graph layer of the
  * training-data extension. The reference has no graph plane; these are the
  * two shapes a corpus pipeline adds on top of dedup (reference analogue:
  * nothing — extension mandated by the driver brief):
  *
  *   - `fuzzy_join`: blocked edit-distance similarity self-join on part
  *     names — candidate pairs come from token-block equi-joins, never a
  *     cross product; `levenshtein` only runs inside blocks.
  *   - `pagerank`: fixed-iteration PageRank over the part co-purchase
  *     graph (parts sharing an order), the standard "importance over an
  *     association graph" op — iterative join+aggregate, the same
  *     distributed shape as [[DedupOps]] pointer-jumping resolve.
  *
  * Scale notes: fuzzy_join's blocking keys (first + last name token) are
  * equi-join keys, so candidate generation is a hash join whose fan-out is
  * the block-size distribution, not |names|²; PlanSpec's catalog-wide sweep
  * asserts no cartesian product. Missed pairs differing in BOTH blocking
  * tokens are the documented recall trade — the production upgrade is more
  * passes (q-gram blocks), each still an equi-join. PageRank's per-iteration
  * plan is edges ⋈ ranks (shuffle keyed by src) → groupBy dst with map-side
  * partial aggregation; ranks and degrees are |V|-row frames, edges |E| —
  * nothing driver-side, no global sort. Five unrolled iterations keep the
  * plan finite (the oracle mirrors them as five CTEs); a production run
  * loops to convergence with `localCheckpoint` every few rounds exactly as
  * `dedup_resolve` does.
  *
  * Float discipline (pagerank): contributions are summed in whatever
  * partition order the shuffle lands, so both engines round each
  * iteration's rank to 9 decimals (and the published rank to 6) — the
  * noise floor of a ~hundred-term double sum is ~1e-15, far below the
  * 5e-10 rounding step, so per-iteration rounding makes the iteration
  * deterministic across engines and cluster sizes.
  */
object LinkOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---- fuzzy similarity join ----

  private[graft] val MaxDist = 4

  private def fuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part").select(col("p_name")).distinct()
    // two blocking passes: first token and last token of the name; a pair
    // is a candidate if it agrees on either block (array_distinct keeps
    // one-token names from double-counting themselves)
    val toks = split(col("p_name"), " ")
    val blocked = names.select(col("p_name"),
      explode(array_distinct(array(
        element_at(toks, 1), element_at(toks, -1)))).as("blk"))
    val a = blocked.select(col("blk"), col("p_name").as("a_name"))
    val b = blocked.select(col("blk"), col("p_name").as("b_name"))
    a.join(b, "blk")
      .filter(col("a_name") < col("b_name"))
      .select("a_name", "b_name").distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= MaxDist)
      .orderBy("a_name", "b_name")
  }

  private val fuzzyJoinSql =
    s"""WITH nm AS (SELECT DISTINCT p_name FROM part),
       |bl AS (
       |  SELECT p_name, unnest(list_distinct(
       |    [string_split(p_name, ' ')[1], string_split(p_name, ' ')[-1]])) AS blk
       |  FROM nm),
       |cand AS (
       |  SELECT DISTINCT a.p_name AS a_name, b.p_name AS b_name
       |  FROM bl a JOIN bl b ON a.blk = b.blk AND a.p_name < b.p_name)
       |SELECT a_name, b_name,
       |  CAST(levenshtein(a_name, b_name) AS INT) AS dist
       |FROM cand
       |WHERE levenshtein(a_name, b_name) <= $MaxDist
       |ORDER BY a_name, b_name""".stripMargin

  // ---- PageRank over the co-purchase graph ----

  private[ops] val Damp = 0.85
  private[ops] val Base = 0.15 // 1 - Damp, written as the same literal in both engines
  private[ops] val Iters = 5
  private val IterScale = 9 // per-iteration rounding (see float discipline)

  /** Directed edge list: src part → dst part whenever both appear in the
    * same order (both directions, deduplicated). Self-join on the
    * high-cardinality order key — scales as Σ lines²/order, not |fact|². */
  private[graft] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val a = li.select(col("ok"), col("l_partkey").as("src"))
    val b = li.select(col("ok"), col("l_partkey").as("dst"))
    a.join(b, "ok").filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = coPurchaseEdges(s, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(deg, "src")
    val parts = t(s, dir, "part").select(col("p_partkey").as("id"))
    // 1-row broadcast total (the PackOps pattern) — no driver collect
    val tot = parts.agg(count(lit(1)).cast("double").as("nn"))
    var pr = parts.crossJoin(broadcast(tot))
      .select(col("id"), (lit(1.0) / col("nn")).as("pr"))
    for (_ <- 1 to Iters) {
      val contrib = ed.join(pr, ed("src") === pr("id"))
        .select(ed("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      pr = parts.join(contrib, Seq("id"), "left").crossJoin(broadcast(tot))
        .select(col("id"),
          round(lit(Base) / col("nn") + lit(Damp) * coalesce(col("c"), lit(0.0)),
            IterScale).as("pr"))
    }
    pr.select(col("id").as("p_partkey"), round(col("pr"), 6).as("rank"))
      .orderBy("p_partkey")
  }

  private val pagerankSql: String = {
    val iters = (1 to Iters).map { i =>
      s"""p$i AS (
         |  SELECT pt.p_partkey AS id,
         |    round($Base / (SELECT n FROM nn) + $Damp * coalesce(c.c, 0), $IterScale) AS pr
         |  FROM part pt LEFT JOIN (
         |    SELECT ed.dst AS id, sum(p.pr / ed.outdeg) AS c
         |    FROM ed JOIN p${i - 1} p ON p.id = ed.src GROUP BY 1) c
         |  ON c.id = pt.p_partkey)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN d USING (src)),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM part),
       |p0 AS (SELECT p_partkey AS id, 1.0 / (SELECT n FROM nn) AS pr FROM part),
       |$iters
       |SELECT id AS p_partkey, round(pr, 6) AS rank FROM p$Iters
       |ORDER BY p_partkey""".stripMargin
  }

  // ---- triangle counting / transitivity ----
  // Global clustering structure of the co-purchase graph. The scale-safe
  // formulation is degree-ordered orientation (each undirected edge points
  // from the (degree, id)-smaller endpoint): the oriented graph is a DAG
  // whose out-degrees are bounded by O(√|E|), so the wedge join
  // (e1.t = e2.s) enumerates each triangle exactly once and its fan-out is
  // Σ outdeg² — the arboricity-bounded count from Chiba–Nishizeki, not the
  // Σ deg² blowup a naive orientation gives on skewed graphs. All counts
  // are integers: zero float-parity risk; transitivity is one final
  // division of two exact BIGINTs, identical in both engines.
  private def triangleCount(s: SparkSession, dir: String): DataFrame = {
    val und = coPurchaseEdges(s, dir).filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val du = deg.select(col("id").as("u"), col("d").as("d_u"))
    val dv = deg.select(col("id").as("v"), col("d").as("d_v"))
    val fwd = col("d_u") < col("d_v") ||
      (col("d_u") === col("d_v") && col("u") < col("v"))
    val o = und.join(du, "u").join(dv, "v")
      .select(when(fwd, col("u")).otherwise(col("v")).as("s"),
        when(fwd, col("v")).otherwise(col("u")).as("t"))
    val wedge = o.select(col("s").as("a"), col("t").as("b"))
      .join(o.select(col("s").as("b"), col("t").as("c")), "b")
    val tri = wedge.join(o.select(col("s").as("a"), col("t").as("c")),
      Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))
    val edges = und.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("transitivity"))
  }

  private val triangleCountSql =
    """WITH e AS (
      |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
      |    greatest(a.l_partkey, b.l_partkey) AS v
      |  FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      |deg AS (
      |  SELECT id, count(*) AS d FROM (
      |    SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e)
      |  GROUP BY 1),
      |o AS (
      |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |           THEN e.u ELSE e.v END AS s,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |           THEN e.v ELSE e.u END AS t
      |  FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
      |tri AS (
      |  SELECT count(*) AS n_triangles
      |  FROM o e1 JOIN o e2 ON e1.t = e2.s
      |    JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t),
      |nodes AS (
      |  SELECT count(*) AS n_nodes,
      |    CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      |  FROM deg),
      |edges AS (SELECT count(*) AS n_edges FROM e)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |  round(3.0 * n_triangles / n_wedges, 6) AS transitivity
      |FROM nodes, edges, tri""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_join" -> ((s, dir) => fuzzyJoin(s, dir)),
    "pagerank" -> ((s, dir) => pagerank(s, dir)),
    "triangle_count" -> ((s, dir) => triangleCount(s, dir)))

  val oracle: Map[String, String] = Map(
    "fuzzy_join" -> fuzzyJoinSql,
    "pagerank" -> pagerankSql,
    "triangle_count" -> triangleCountSql)
}
