package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.EdgeOps
import graft.bfs.Bfs
import graft.validate.Validator
import graft.stats.Teps

/**
 * Driver contract — maps every implemented operator (SURVEY.md §2.9 queries
 * Q1-Q10 + training-data pipeline ops) to a named DataFrame query over the
 * driver test tables, with an equivalent DuckDB SQL oracle where the
 * semantics are SQL-expressible.
 *
 * Graph queries run over the deterministic bipartite graph derived from
 * `lineitem` (FIXTURES.md §2): order-node = 2*l_orderkey,
 * part-node = 2*l_partkey + 1; BFS root = min(src).
 */
object SparkEntry {

  /** Shared oracle-SQL prelude: raw edge list, cleaned symmetric edge set,
    * BFS depth via bounded recursive CTE (max depth 6 on this data; bound 20
    * for safety), min-parent tree. */
  private val GraphCte =
    """WITH RECURSIVE
      |raw AS (SELECT 2*l_orderkey AS src, 2*l_partkey+1 AS dst FROM lineitem),
      |clean AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM raw WHERE src <> dst
      |    UNION ALL
      |    SELECT dst AS src, src AS dst FROM raw WHERE src <> dst
      |  )
      |),
      |verts AS (SELECT DISTINCT src AS vertex FROM clean),
      |root AS (SELECT min(src) AS r FROM clean),
      |walk(vertex, depth) AS (
      |  SELECT r, 0 FROM root
      |  UNION
      |  SELECT e.dst, w.depth + 1 FROM walk w JOIN clean e ON e.src = w.vertex
      |  WHERE w.depth < 20
      |),
      |d AS (SELECT vertex, min(depth) AS depth FROM walk GROUP BY vertex),
      |minpar AS (
      |  SELECT c.dst AS vertex, min(c.src) AS pred
      |  FROM clean c JOIN d du ON c.src = du.vertex JOIN d dv ON c.dst = dv.vertex
      |  WHERE du.depth + 1 = dv.depth
      |  GROUP BY c.dst
      |),
      |tree AS (
      |  SELECT v.vertex,
      |         COALESCE(CASE WHEN dd.depth = 0 THEN v.vertex ELSE p.pred END,
      |                  CAST(-1 AS BIGINT)) AS pred,
      |         CAST(dd.depth AS BIGINT) AS depth
      |  FROM verts v
      |  LEFT JOIN d dd ON v.vertex = dd.vertex
      |  LEFT JOIN minpar p ON v.vertex = p.vertex
      |)
      |""".stripMargin

  // ---- shared per-sfDir intermediates (Verify runs queries sequentially
  // in one session; BFS is iterative, so reuse its result across the
  // queries that consume it) ----
  private val treeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def rawEdges(s: SparkSession, dir: String): DataFrame =
    EdgeOps.edgesFromLineitem(s, dir)

  private def clean(s: SparkSession, dir: String): DataFrame =
    EdgeOps.cleanEdges(rawEdges(s, dir))

  private def rootOf(s: SparkSession, dir: String): Long =
    rawEdges(s, dir).agg(min(col("src"))).head().getLong(0)

  private def tree(s: SparkSession, dir: String): DataFrame =
    treeCache.computeIfAbsent(dir, _ => {
      val r = Bfs.bfsMinParent(s, clean(s, dir), rootOf(s, dir))
      r.tree.localCheckpoint(true)
    })

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    tree(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — deterministic Kronecker generation (scale 10); structural
    // invariants are unit-tested, MRG is not SQL-expressible → rows check.
    "q1_generate" -> ((s, _) => graft.gen.Kronecker.generate(s, 10)),

    // Q2 — clean edges: drop loops, symmetrize, dedup.
    "q2_clean_edges" -> ((s, dir) => clean(s, dir)),

    // Q3 — per-vertex degrees.
    "q3_degrees" -> ((s, dir) => EdgeOps.degrees(clean(s, dir))),

    // Q4 — degree-descending reorder map (mode 2).
    "q4_reorder_degree" -> ((s, dir) => EdgeOps.reorderMap(clean(s, dir), 2)),

    // Q5 — graph summary counts.
    "q5_graph_counts" -> ((s, dir) => EdgeOps.graphCounts(clean(s, dir))),

    // Q6 — deterministic BFS-root sample over the derived graph (MRG-driven,
    // not SQL-expressible → rows check). nGlobalVerts = max vertex id + 1.
    "q6_roots" -> ((s, dir) => {
      import s.implicits._
      val maxV = clean(s, dir).agg(max(greatest(col("src"), col("dst"))))
        .head().getLong(0)
      val vertSet = clean(s, dir).select("src").distinct()
        .collect().map(_.getLong(0)).toSet
      graft.gen.Kronecker.sampleRoots(16, maxV + 1, vertSet.contains)
        .zipWithIndex.map { case (r, i) => (i.toLong, r) }.toSeq
        .toDF("idx", "root")
    }),

    // Q7 — canonical min-parent BFS tree from root = min(src).
    "q7_bfs" -> ((s, dir) => tree(s, dir)),

    // Q8 — Graph500 five-predicate validation of the Q7 tree.
    "q8_validate" -> ((s, dir) => {
      val maxV = clean(s, dir).agg(max(greatest(col("src"), col("dst"))))
        .head().getLong(0)
      Validator.validate(s, rawEdges(s, dir), tree(s, dir), rootOf(s, dir), maxV + 1)
    }),

    // Q9 — Graph500 stat block incl. harmonic-mean TEPS over a deterministic
    // 64-"run" table derived from orders.
    "q9_teps" -> ((s, dir) => Teps.statBlock(runStats(s, dir))),

    // Q10 — per-level frontier sizes.
    "q10_level_sizes" -> ((s, dir) => Bfs.levelSizes(tree(s, dir)))
  )

  /** Deterministic pseudo run-stats: 64 smallest orders; bfs_time from
    * totalprice, nedge from orderkey (see q9 oracle). */
  private def runStats(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(s"$dir/orders.parquet")
      .orderBy(col("o_orderkey")).limit(64)
    o.select(
      col("o_orderkey").as("run"),
      (col("o_totalprice") / 1000.0).as("bfs_time"),
      lit(0.0).as("validate_time"),
      (col("o_orderkey") + 1000L).cast("double").as("nedge"))
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for q1/q6 (MRG PRNG not expressible
    * in SQL → driver records a rows-only check). */
  def oracleSql: Map[String, String] = Map(
    "q2_clean_edges" -> (GraphCte + "SELECT src, dst FROM clean"),

    "q3_degrees" ->
      (GraphCte + "SELECT src AS vertex, count(*) AS degree FROM clean GROUP BY src"),

    "q4_reorder_degree" -> (GraphCte +
      """, deg AS (SELECT src AS vertex, count(*) AS degree FROM clean GROUP BY src)
        |SELECT vertex,
        |       CAST(row_number() OVER (ORDER BY degree DESC, vertex) - 1 AS BIGINT) AS new_id
        |FROM deg""".stripMargin),

    "q5_graph_counts" -> (GraphCte +
      """SELECT count(DISTINCT src) AS non_isolated_vertices,
        |       max(greatest(src, dst)) AS max_used_vertex,
        |       CAST(count(*) / 2 AS BIGINT) AS undirected_edge_count
        |FROM clean""".stripMargin),

    "q7_bfs" -> (GraphCte + "SELECT vertex, pred, depth FROM tree"),

    "q8_validate" -> (GraphCte +
      """, maxv AS (SELECT max(greatest(src, dst)) AS m FROM clean)
        |SELECT
        |  (SELECT count(*) FROM tree WHERE pred < -1 OR pred >= (SELECT m + 1 FROM maxv)) AS range_errors,
        |  (SELECT count(*) FROM tree WHERE vertex = (SELECT r FROM root)
        |     AND (pred <> vertex OR depth <> 0)) AS root_errors,
        |  (SELECT count(*) FROM tree WHERE vertex <> (SELECT r FROM root)
        |     AND pred = vertex) AS self_parent_errors,
        |  (SELECT count(*) FROM tree WHERE (pred = -1) <> (depth IS NULL)) AS depth_presence_errors,
        |  (SELECT count(*) FROM tree t LEFT JOIN tree p ON t.pred = p.vertex
        |     WHERE t.pred <> -1 AND t.vertex <> (SELECT r FROM root)
        |       AND (p.depth IS NULL OR t.depth <> p.depth + 1)) AS depth_chain_errors,
        |  (SELECT count(*) FROM (
        |     SELECT least(t.vertex, t.pred) AS lo, greatest(t.vertex, t.pred) AS hi
        |     FROM tree t WHERE t.pred <> -1 AND t.vertex <> (SELECT r FROM root)) pp
        |     WHERE NOT EXISTS (SELECT 1 FROM raw e WHERE e.src <> e.dst
        |       AND least(e.src, e.dst) = pp.lo AND greatest(e.src, e.dst) = pp.hi)) AS pred_edge_missing,
        |  (SELECT count(*) FROM raw e
        |     LEFT JOIN tree tu ON e.src = tu.vertex
        |     LEFT JOIN tree tv ON e.dst = tv.vertex
        |     WHERE (tu.depth IS NOT NULL AND tv.depth IS NOT NULL
        |            AND abs(tu.depth - tv.depth) > 1)
        |        OR ((tu.depth IS NULL) <> (tv.depth IS NULL))) AS edge_depth_errors,
        |  (SELECT count(*) FROM raw e
        |     JOIN tree tu ON e.src = tu.vertex AND tu.depth IS NOT NULL
        |     JOIN tree tv ON e.dst = tv.vertex AND tv.depth IS NOT NULL
        |     WHERE abs(tu.depth - tv.depth) <= 1) AS edge_visit_count""".stripMargin),

    "q9_teps" ->
      """WITH rs AS (
        |  SELECT o_orderkey AS run, o_totalprice / 1000.0 AS bfs_time,
        |         CAST(o_orderkey + 1000 AS DOUBLE) AS nedge
        |  FROM orders ORDER BY o_orderkey LIMIT 64
        |)
        |SELECT
        |  round(min(bfs_time), 6) AS time_min,
        |  round(quantile_cont(bfs_time, 0.25), 6) AS time_q1,
        |  round(quantile_cont(bfs_time, 0.5), 6) AS time_median,
        |  round(quantile_cont(bfs_time, 0.75), 6) AS time_q3,
        |  round(max(bfs_time), 6) AS time_max,
        |  round(avg(bfs_time), 6) AS time_mean,
        |  round(stddev_samp(bfs_time), 6) AS time_stddev,
        |  round(min(nedge), 6) AS nedge_min,
        |  round(quantile_cont(nedge, 0.25), 6) AS nedge_q1,
        |  round(quantile_cont(nedge, 0.5), 6) AS nedge_median,
        |  round(quantile_cont(nedge, 0.75), 6) AS nedge_q3,
        |  round(max(nedge), 6) AS nedge_max,
        |  round(avg(nedge), 6) AS nedge_mean,
        |  round(stddev_samp(nedge), 6) AS nedge_stddev,
        |  round(1.0 / avg(bfs_time / nedge), 6) AS harmonic_mean_teps
        |FROM rs""".stripMargin,

    "q10_level_sizes" -> (GraphCte +
      """SELECT CAST(depth AS BIGINT) AS level, count(*) AS frontier_size
        |FROM d GROUP BY depth""".stripMargin)
  )
}
