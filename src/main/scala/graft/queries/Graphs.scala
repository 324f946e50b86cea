package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Iterative graph analytics over relationship tables — the link-
  * analysis pass a large corpus pipeline runs to weight sources
  * (PageRank over a citation/link graph is the classic quality
  * prior for web-scale training data; reference analog: ranking the
  * store's photo graph by aspect co-occurrence would use the same
  * machinery).
  *
  * Scale design notes (100 TB posture):
  *  - The rank frame is NODE-count-sized; only the edge frame is
  *    data-sized. The per-edge contribution weight (1/deg) is static
  *    per src, so deg is attached to the edge frame ONCE before the
  *    loop and the enriched frame is localCheckpointed — the loop
  *    body never joins deg and never re-materializes or re-shuffles
  *    the data-sized side (round-7 VERDICT: the in-loop deg re-join
  *    plus 5 unpartitioned edge shuffles were 16% of the bench).
  *  - Each iteration joins the node-sized rank frame to the static
  *    edge frame as a BROADCAST (nodes ≪ edges; at node counts past
  *    broadcast range the same loop body runs against an
  *    edges-bucketed-by-src table, which is what the one-time
  *    repartition($"src") before the checkpoint stands in for), so
  *    the only per-iteration exchange is the partial-aggregated
  *    groupBy(dst) of node-sized combiner output.
  *  - Each iteration ends in a localCheckpoint of the node-sized
  *    rank frame: lineage stays O(1) across iterations instead of
  *    growing a 5-deep join tree (the q_dup_clusters precedent).
  *  - Per-edge contributions are rounded to 12dp and summed in
  *    DECIMAL(38,12), so the distributed accumulation order cannot
  *    drift the ranks — both engines hash-match at full precision.
  */
object Graphs {

  /** One damped PageRank step: rank mass flows src → dst over the
    * deg-enriched static edge frame `ew(src, dst, deg)`; `r(node, r)`
    * is the incoming rank frame, `nn` the broadcast 1-row node count.
    * Exposed for the plan-shape spec: the edge side must enter the
    * join without an Exchange and the rank side must broadcast. */
  private[queries] def step(ew: DataFrame, nn: DataFrame,
      r: DataFrame): DataFrame =
    ew.join(broadcast(r), ew("src") === r("node"))
      .groupBy(col("dst"))
      .agg(sum(round(col("r") / col("deg"), 12)
        .cast(DecimalType(38, 12))).as("m"))
      .crossJoin(nn)
      .select(col("dst").as("node"),
        round(lit(0.15) / col("n").cast("double") +
          lit(0.85) * col("m").cast("double"), 12).as("r"))

  /** Unrolled-iteration oracle: DuckDB's recursive CTEs disallow
    * aggregation over the recursive relation, so the fixed 5
    * PageRank steps are generated as 5 chained CTEs — the same
    * per-iteration expression the Spark loop builds. */
  private def pagerankSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""m$k AS (SELECT e.dst AS node,
         |    sum(CAST(round(r.r / d.deg, 12) AS DECIMAL(38,12))) AS m
         |  FROM edges e JOIN r${k - 1} r ON r.node = e.src
         |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
         |r$k AS (SELECT node,
         |    round(0.15 / n + 0.85 * CAST(m AS DOUBLE), 12) AS r
         |  FROM m$k, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
       |            FROM lineitem),
       |edges AS (SELECT 'p' || p AS src, 's' || s AS dst FROM e0
       |          UNION ALL SELECT 's' || s, 'p' || p FROM e0),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT src AS node, 1.0 / n AS r FROM deg, nn),
       |$steps
       |SELECT node, r AS rank FROM r$iters
       |ORDER BY r DESC, node LIMIT 100""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // PAGERANK — 5 damped iterations (d = 0.85) over the undirected
    // bipartite part↔supplier graph from lineitem: who supplies
    // widely-sourced parts, which parts sit at the center of the
    // supply web. Every node has in-edges (edges are symmetric), so
    // no dangling-mass term is needed. The iteration count is fixed
    // — convergence-to-tolerance would put a driver-side loop
    // condition on a distributed reduce, which is exactly the shape
    // the fixed unroll avoids (and lets the oracle state the same
    // five steps as chained CTEs).
    Q("q_pagerank", pagerankSql(5)) { (s, d) =>
      val (ew, nn, r0) = frames(s, d)
      var r = r0
      for (_ <- 1 to 5) r = step(ew, nn, r).localCheckpoint()
      r.select(col("node"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    },

    // BUTTERFLY COUNTING — 4-cycles in the bipartite part↔supplier
    // graph: for each supplier pair, C(shared_parts, 2) butterflies.
    // The butterfly is the bipartite clustering primitive (triangles
    // don't exist in bipartite graphs); high counts flag densely
    // co-sourced supplier pairs — in a corpus pipeline the same
    // query over (document, domain)/(user, item) graphs surfaces
    // coordinated/templated clusters. Scale: wedges (s1, s2 sharing
    // a part) come from ONE equi-join on p — wedge volume is
    // Σ_p C(deg_p, 2), bounded when per-part degree is (as here)
    // small; for power-law degree the standard mitigation is
    // splitting hub vertices before wedging (the q_join_salted
    // treatment), never an all-pairs join. The pair aggregate is
    // supplier-pair-sized; top-20 is TakeOrderedAndProject.
    Q("q_butterfly",
      """WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |            FROM lineitem),
        |w AS (SELECT a.s AS s1, b.s AS s2 FROM e0 a
        |      JOIN e0 b ON a.p = b.p AND a.s < b.s),
        |g AS (SELECT s1, s2, count(*) AS shared_parts FROM w
        |      GROUP BY s1, s2)
        |SELECT s1, s2, shared_parts,
        |  CAST(shared_parts * (shared_parts - 1) / 2 AS BIGINT)
        |    AS butterflies
        |FROM g WHERE shared_parts >= 2
        |ORDER BY butterflies DESC, s1, s2 LIMIT 20""".stripMargin) { (s, d) =>
      val e0 = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .distinct()
      val w = e0.as("a").join(e0.as("b"),
        col("a.p") === col("b.p") && col("a.s") < col("b.s"))
        .select(col("a.s").as("s1"), col("b.s").as("s2"))
      w.groupBy("s1", "s2").agg(count(lit(1)).as("shared_parts"))
        .filter(col("shared_parts") >= 2)
        .withColumn("butterflies",
          (col("shared_parts") * (col("shared_parts") - 1) / 2)
            .cast("long"))
        .orderBy(col("butterflies").desc, col("s1"), col("s2"))
        .limit(20)
    },
  )

  /** Graph construction, ONCE per query: the deg-enriched edge frame
    * (repartitioned by src — the bucketed-table stand-in — and
    * localCheckpointed so no iteration recomputes or re-shuffles
    * it), the broadcast 1-row node count, and the uniform r0.
    * Exposed for the conservation + plan-shape spec. */
  private[queries] def frames(s: org.apache.spark.sql.SparkSession,
      d: String): (DataFrame, DataFrame, DataFrame) = {
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct()
      .localCheckpoint()
    val edges = e0
      .select(concat(lit("p"), col("p")).as("src"),
        concat(lit("s"), col("s")).as("dst"))
      .unionAll(e0.select(concat(lit("s"), col("s")).as("src"),
        concat(lit("p"), col("p")).as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // The 1-row node count is checkpointed too: without it every
    // iteration's job would re-run deg's edge-sized aggregation just
    // to re-derive this constant.
    val nn = broadcast(deg.agg(count(lit(1)).as("n")).localCheckpoint())
    val ew = edges.join(deg, "src")
      .repartition(col("src"))
      .localCheckpoint()
    val r0 = deg.crossJoin(nn)
      .select(col("src").as("node"),
        (lit(1.0) / col("n").cast("double")).as("r"))
      .localCheckpoint()
    (ew, nn, r0)
  }
}
