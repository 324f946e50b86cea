package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-13 cluster-evaluation wave: the "is this clustering any
  * good" readouts that gate every unsupervised curation decision —
  * external validation against labels (purity + NMI) and internal
  * geometry (silhouette). Both consume THE SAME Lloyd chain as
  * q_kmeans ([[Semantic.kmeansRanked]] / [[Semantic.kmeansChainSql]],
  * shared verbatim), so the evaluated clustering is provably the one
  * the engine ships — an eval op that silently re-clusters is
  * auditing nothing.
  *
  * Scale design notes (100 TB posture): everything downstream of the
  * (already k-bounded) assignment is contingency-table-sized —
  * k×|labels| cells for purity/NMI, k rows for silhouette means; the
  * only per-row work is the rn ≤ 2 fold of the ranked frame, one
  * partial-aggregated pass. */
object ClusterEval {

  val qs: Seq[Q] = Seq(

    // CLUSTER PURITY + NMI — external validation of q_kmeans'
    // clustering against the embedding labels: per-cluster majority
    // share (purity: are clusters label-coherent) and normalized
    // mutual information (NMI: chance-corrected, so a k=n shredding
    // can't fake a perfect purity). The readout that decides whether
    // embedding-space structure is TRUSTWORTHY enough to drive
    // label propagation / stratified sampling (q_knn_classifier
    // grades neighbor votes; this grades the partition itself).
    // Determinism: contingency cells are exact BIGINTs; entropy/MI
    // terms are identical double chains rounded 9 dp into DECIMAL
    // sums; final ratios round 6 dp, nullif-guarded.
    Q("q_cluster_purity",
      s"""WITH ${Semantic.kmeansChainSql(2, 8)},
         |asgn AS (SELECT vec_id, label, cid FROM rf WHERE rn = 1),
         |ct AS (SELECT cid, label, CAST(count(*) AS BIGINT) AS nc
         |  FROM asgn GROUP BY cid, label),
         |cs AS (SELECT cid, CAST(sum(nc) AS BIGINT) AS n_c,
         |    CAST(max(nc) AS BIGINT) AS maxc
         |  FROM ct GROUP BY cid),
         |ls AS (SELECT label, CAST(sum(nc) AS BIGINT) AS n_l
         |  FROM ct GROUP BY label),
         |t AS (SELECT CAST(sum(nc) AS BIGINT) AS n FROM ct),
         |hc AS (SELECT CAST(sum(CAST(round(
         |      -(CAST(n_c AS DOUBLE) / n) * ln(CAST(n_c AS DOUBLE) / n),
         |      9) AS DECIMAL(38,9))) AS DOUBLE) AS h_c
         |  FROM cs CROSS JOIN t),
         |hl AS (SELECT CAST(sum(CAST(round(
         |      -(CAST(n_l AS DOUBLE) / n) * ln(CAST(n_l AS DOUBLE) / n),
         |      9) AS DECIMAL(38,9))) AS DOUBLE) AS h_l
         |  FROM ls CROSS JOIN t),
         |mi AS (SELECT CAST(sum(CAST(round(
         |      (CAST(nc AS DOUBLE) / n) * ln(CAST(nc AS DOUBLE) * n
         |        / (CAST(n_c AS DOUBLE) * n_l)), 9) AS DECIMAL(38,9)))
         |      AS DOUBLE) AS mi
         |  FROM ct JOIN cs USING (cid) JOIN ls USING (label) CROSS JOIN t),
         |ov AS (SELECT round(CAST(sum(maxc) AS DOUBLE) / max(n), 6)
         |      AS overall_purity FROM cs CROSS JOIN t)
         |SELECT cid, n_c AS n, maxc AS n_majority,
         |  round(CAST(maxc AS DOUBLE) / n_c, 6) AS purity,
         |  overall_purity,
         |  round(mi / nullif(sqrt(h_c * h_l), 0), 6) AS nmi
         |FROM cs CROSS JOIN hc CROSS JOIN hl CROSS JOIN mi CROSS JOIN ov
         |ORDER BY cid""".stripMargin) { (s, dir) =>
      val asgn = Semantic.kmeansRanked(s, dir)
        .filter(col("rn") === 1).select("vec_id", "label", "cid")
      val ct = asgn.groupBy("cid", "label")
        .agg(count(lit(1)).cast("long").as("nc"))
        .localCheckpoint(eager = false) // k×|labels| contingency cells
      val cs = ct.groupBy("cid")
        .agg(sum("nc").cast("long").as("n_c"),
          max("nc").cast("long").as("maxc"))
        .localCheckpoint(eager = false)
      val ls = ct.groupBy("label").agg(sum("nc").cast("long").as("n_l"))
      val t = ct.agg(sum("nc").cast("long").as("n"))
      def entSum(df: org.apache.spark.sql.DataFrame, cnt: String,
          out: String) =
        df.crossJoin(broadcast(t))
          .select(round(-(col(cnt).cast("double") / col("n"))
            * log(col(cnt).cast("double") / col("n")), 9).as("term"))
          .agg(sum(col("term").cast(DecimalType(38, 9))).cast("double")
            .as(out))
      val hc = entSum(cs, "n_c", "h_c")
      val hl = entSum(ls, "n_l", "h_l")
      val mi = ct.join(broadcast(cs.select("cid", "n_c")), "cid")
        .join(broadcast(ls), "label")
        .crossJoin(broadcast(t))
        .select(round((col("nc").cast("double") / col("n"))
          * log(col("nc").cast("double") * col("n")
            / (col("n_c").cast("double") * col("n_l"))), 9).as("term"))
        .agg(sum(col("term").cast(DecimalType(38, 9))).cast("double")
          .as("mi"))
      val ov = cs.crossJoin(broadcast(t))
        .agg(round(sum("maxc").cast("double")
          / max(col("n")), 6).as("overall_purity"))
      cs.crossJoin(broadcast(hc)).crossJoin(broadcast(hl))
        .crossJoin(broadcast(mi)).crossJoin(broadcast(ov))
        .selectExpr("cid", "n_c AS n", "maxc AS n_majority",
          "round(CAST(maxc AS DOUBLE) / n_c, 6) AS purity",
          "overall_purity",
          "round(mi / nullif(sqrt(h_c * h_l), 0), 6) AS nmi")
        .orderBy("cid")
    },

    // SIMPLIFIED SILHOUETTE — internal geometry of the SAME q_kmeans
    // partition, no labels needed: per point, a = distance to its
    // own centroid, b = distance to the second-nearest centroid,
    // s = (b−a)/max(a,b) ∈ [−1, 1] (the centroid-based silhouette —
    // the O(n·k) form production systems run; the classic O(n²)
    // all-pairs silhouette is exactly the pair explosion this engine
    // refuses on principle). Per-cluster means localize which
    // clusters are mush (s ≈ 0 = boundary mass, s < 0 =
    // misassigned). Scale: the ranked frame's rn ≤ 2 rows fold to
    // one row per point in ONE partial aggregate; everything after
    // is k-row algebra. Determinism: d2 is the chain's 6 dp-rounded
    // fold; a/b/s one identical double chain rounded 6 dp into exact
    // micros; per-cluster means exact half-up integer micros; a
    // point equidistant-zero to two centroids yields NULL s via
    // nullif and is excluded by count(s) on both engines.
    Q("q_silhouette",
      s"""WITH ${Semantic.kmeansChainSql(2, 8)},
         |ab AS (SELECT vec_id,
         |    max(CASE WHEN rn = 1 THEN cid END) AS cid,
         |    max(CASE WHEN rn = 1 THEN d2 END) AS a2,
         |    max(CASE WHEN rn = 2 THEN d2 END) AS b2
         |  FROM rf WHERE rn <= 2 GROUP BY vec_id),
         |sv AS (SELECT cid,
         |    CAST(round(round((sqrt(b2) - sqrt(a2))
         |      / nullif(greatest(sqrt(a2), sqrt(b2)), 0), 6) * 1000000,
         |      0) AS BIGINT) AS s6
         |  FROM ab),
         |g AS (SELECT cid, CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(s6) AS BIGINT) AS n_scored,
         |    CAST(sum(s6) AS BIGINT) AS ss FROM sv GROUP BY cid),
         |o AS (SELECT CAST(count(s6) AS BIGINT) AS ons,
         |    CAST(sum(s6) AS BIGINT) AS oss FROM sv)
         |SELECT cid, n, n_scored,
         |  floor((2 * ss + n_scored) / (2.0 * nullif(n_scored, 0))) / 1e6
         |    AS mean_silhouette,
         |  floor((2 * oss + ons) / (2.0 * nullif(ons, 0))) / 1e6
         |    AS overall_silhouette
         |FROM g CROSS JOIN o ORDER BY cid""".stripMargin) { (s, dir) =>
      val ab = Semantic.kmeansRanked(s, dir)
        .filter(col("rn") <= 2)
        .groupBy("vec_id")
        .agg(max(when(col("rn") === 1, col("cid"))).as("cid"),
          max(when(col("rn") === 1, col("d2"))).as("a2"),
          max(when(col("rn") === 2, col("d2"))).as("b2"))
      val sv = ab.selectExpr("cid",
        """CAST(round(round((sqrt(b2) - sqrt(a2))
          |  / nullif(greatest(sqrt(a2), sqrt(b2)), 0), 6) * 1000000,
          |  0) AS BIGINT) AS s6""".stripMargin)
        .localCheckpoint(eager = false) // one row per point, reused 2×
      val g = sv.groupBy("cid")
        .agg(count(lit(1)).cast("long").as("n"),
          count(col("s6")).cast("long").as("n_scored"),
          sum("s6").cast("long").as("ss"))
      val o = sv.agg(count(col("s6")).cast("long").as("ons"),
        sum("s6").cast("long").as("oss"))
      g.crossJoin(broadcast(o))
        .selectExpr("cid", "n", "n_scored",
          "floor((2 * ss + n_scored) / (2.0 * nullif(n_scored, 0))) / 1e6" +
            " AS mean_silhouette",
          "floor((2 * oss + ons) / (2.0 * nullif(ons, 0))) / 1e6" +
            " AS overall_silhouette")
        .orderBy("cid")
    },

    // B-CUBED PRECISION / RECALL — the per-POINT external validation
    // of the same q_kmeans partition: for each point, precision =
    // share of its cluster with its label, recall = share of its
    // label in its cluster; corpus means collapse to the contingency
    // identity P = Σ n_cl²/n_c / N, R = Σ n_cl²/n_l / N. The member
    // of the cluster-eval triple that PUNISHES both shredding (k = n
    // gives perfect purity but tiny B³ recall) and merging (one blob
    // gives perfect recall but tiny precision) point-by-point —
    // purity/NMI read the table, B³ reads each point's experience
    // (the standard entity-resolution/coref metric, Bagga & Baldwin
    // 1998). Scale: the identity means NOTHING per-point is ever
    // materialized — the same k×|labels| contingency fold as
    // q_cluster_purity, then constant-size algebra. Determinism:
    // exact BIGINT cells; per-cell terms are rationals rounded 9 dp
    // into DECIMAL sums; F1 one identical double chain.
    Q("q_bcubed",
      s"""WITH ${Semantic.kmeansChainSql(2, 8)},
         |asgn AS (SELECT vec_id, label, cid FROM rf WHERE rn = 1),
         |ct AS (SELECT cid, label, CAST(count(*) AS BIGINT) AS nc
         |  FROM asgn GROUP BY cid, label),
         |cs AS (SELECT cid, CAST(sum(nc) AS BIGINT) AS n_c
         |  FROM ct GROUP BY cid),
         |ls AS (SELECT label, CAST(sum(nc) AS BIGINT) AS n_l
         |  FROM ct GROUP BY label),
         |t AS (SELECT CAST(sum(nc) AS BIGINT) AS n FROM ct),
         |terms AS (SELECT
         |    round(CAST(nc AS DOUBLE) * nc / n_c, 9) AS pterm,
         |    round(CAST(nc AS DOUBLE) * nc / n_l, 9) AS rterm
         |  FROM ct JOIN cs USING (cid) JOIN ls USING (label)),
         |pr AS (SELECT
         |    CAST(sum(CAST(pterm AS DECIMAL(38,9))) AS DOUBLE) AS ps,
         |    CAST(sum(CAST(rterm AS DECIMAL(38,9))) AS DOUBLE) AS rs
         |  FROM terms)
         |SELECT n,
         |  round(ps / n, 6) AS b3_precision,
         |  round(rs / n, 6) AS b3_recall,
         |  round(2 * (ps / n) * (rs / n) / nullif(ps / n + rs / n, 0), 6)
         |    AS b3_f1
         |FROM pr CROSS JOIN t""".stripMargin) { (s, dir) =>
      val asgn = Semantic.kmeansRanked(s, dir)
        .filter(col("rn") === 1).select("vec_id", "label", "cid")
      val ct = asgn.groupBy("cid", "label")
        .agg(count(lit(1)).cast("long").as("nc"))
        .localCheckpoint(eager = false)
      val cs = ct.groupBy("cid").agg(sum("nc").cast("long").as("n_c"))
      val ls = ct.groupBy("label").agg(sum("nc").cast("long").as("n_l"))
      val t = ct.agg(sum("nc").cast("long").as("n"))
      val pr = ct.join(broadcast(cs), "cid").join(broadcast(ls), "label")
        .select(
          round(col("nc").cast("double") * col("nc") / col("n_c"), 9)
            .as("pterm"),
          round(col("nc").cast("double") * col("nc") / col("n_l"), 9)
            .as("rterm"))
        .agg(sum(col("pterm").cast(DecimalType(38, 9))).cast("double")
            .as("ps"),
          sum(col("rterm").cast(DecimalType(38, 9))).cast("double")
            .as("rs"))
      pr.crossJoin(broadcast(t))
        .selectExpr("n",
          "round(ps / n, 6) AS b3_precision",
          "round(rs / n, 6) AS b3_recall",
          "round(2 * (ps / n) * (rs / n) / nullif(ps / n + rs / n, 0), 6)" +
            " AS b3_f1")
    })
}
