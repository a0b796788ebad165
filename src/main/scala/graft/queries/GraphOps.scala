package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph traversal over relational edge lists — the reference's memory
  * graph / causality shapes (SURVEY J3/J5/R5, mnemo-graph/src/lib.rs:53-78,
  * query/causality.rs:41-288) as iterative DataFrame joins.
  *
  * Scale design: every hop is one equi-join on the edge key — shuffle
  * partitioned by node id, no driver-side adjacency structure; bounded
  * depth (2–3) keeps the plan static, and the connected-components pass
  * is pointer-doubled min-label propagation (one neighbor join + one
  * aggregate + one label self-join per iteration, converging in
  * O(log diameter) rounds — see the shared builder's scaladoc).
  * The co-occurrence edge list is derived from `lineitem` with a
  * modulo-sampled order set so the test subgraph is deterministic.
  */
object GraphOps extends QueryGroup {

  /** Bidirectional part co-occurrence edges over a modulo-sampled order
    * subset: (src, dst) part pairs sharing an order, possibly repeated
    * across orders — both consumers (min-hop BFS in g1, min-label
    * propagation in g3) are insensitive to edge multiplicity, so the
    * full-frame distinct() the earlier formulation paid for is skipped.
    *
    * One lineitem scan + one shuffle (partial-aggregated collect_set per
    * order) + a bounded double-explode (orders have ≤7 parts, so ≤42
    * pairs each) — replaces the earlier self-join formulation, which
    * scanned and shuffled lineitem twice before a distinct. */
  private def coEdges(s: SparkSession, dir: String, mod: Int): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % mod === 0)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  private def coEdgesSql(mod: Int) =
    s"""li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey % $mod = 0),
       |edges AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk)""".stripMargin

  private val q1 = QueryDef(
    "g1_two_hop",
    (s, dir) => {
      // R5 graph lane: BFS from seeds with per-hop score decay 0.5^hop,
      // first-seen (min-hop) dedup. Frontiers are broadcast (5 seeds,
      // then ≤ one hop's neighborhood) so each hop is a broadcast hash
      // join against the partitioned edge list — the shape that holds at
      // 100 TB as long as frontiers stay bounded. No intermediate
      // distinct(): the final min-hop aggregate dedupes, and the h1
      // frontier is deduped only where it feeds the h2 join.
      val edges = coEdges(s, dir, 50).cache()
      val seeds = edges.select(col("src").as("node")).distinct()
        .orderBy("node").limit(5).cache()
      val h1 = edges.join(broadcast(seeds.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"))
        .withColumn("hop", lit(1))
      val frontier = h1.select(col("node").as("src")).distinct()
      val h2 = edges.join(broadcast(frontier), "src")
        .select(col("dst").as("node"))
        .withColumn("hop", lit(2))
      h1.unionAll(h2)
        .join(broadcast(seeds), Seq("node"), "left_anti")
        .groupBy("node").agg(min(col("hop")).as("hop"))
        .withColumn("score", round(pow(0.5, col("hop")), 6))
        .orderBy("node")
    },
    Some(s"""
      WITH ${coEdgesSql(50)},
      seeds AS (SELECT DISTINCT src AS node FROM edges ORDER BY node LIMIT 5),
      h1 AS (SELECT DISTINCT dst AS node, 1 AS hop
             FROM edges JOIN seeds ON edges.src = seeds.node),
      h2 AS (SELECT DISTINCT e.dst AS node, 2 AS hop
             FROM edges e JOIN h1 ON e.src = h1.node),
      uni AS (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
      SELECT node, MIN(hop) AS hop, ROUND(POW(0.5, MIN(hop)), 6) AS score
      FROM uni
      WHERE node NOT IN (SELECT node FROM seeds)
      GROUP BY node
      ORDER BY node"""))

  private val q2 = QueryDef(
    "g2_causality_trace",
    (s, dir) => {
      // J5 causality: parent = previous event in the per-user stream,
      // so the depth-d ancestor of an event IS lag(event_id, d) over
      // the same window — the bounded-BFS of causality.rs collapses to
      // ONE window pass (3 lags share one sort), zero joins, zero
      // cache. The general iterative-join expansion over an arbitrary
      // DAG lives in g1/g3/d6; here the data model admits the direct
      // plan, which is the one that survives a 100× scale-up (the
      // previous 3-join formulation shuffled the corpus three times).
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("ancs", array((1 to 3).map(d =>
          lag(col("event_id"), d).over(w)): _*))
        .filter(col("event_type") === "error" && col("ancs")(0).isNotNull)
        .select(col("event_id"), posexplode(col("ancs")).as(Seq("pos", "ancestor_id")))
        .filter(col("ancestor_id").isNotNull)
        .select(col("event_id"), (col("pos") + 1).as("depth"), col("ancestor_id"))
        .orderBy("event_id", "depth")
        .limit(1000)
    },
    Some("""
      WITH RECURSIVE parented AS (
        SELECT event_id, user_id, event_type,
               LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS parent_id
        FROM events),
      trace AS (
        SELECT event_id AS root, parent_id AS anc, 1 AS depth
        FROM parented WHERE event_type = 'error' AND parent_id IS NOT NULL
        UNION ALL
        SELECT t.root, p.parent_id, t.depth + 1
        FROM trace t JOIN parented p ON t.anc = p.event_id
        WHERE t.depth < 3 AND p.parent_id IS NOT NULL)
      SELECT root AS event_id, depth, anc AS ancestor_id
      FROM trace
      ORDER BY event_id, depth
      LIMIT 1000"""))

  private val q3 = QueryDef(
    "g3_connected_components",
    (s, dir) => {
      // min-label CC via the SHARED builder (DedupEnrich
      // .minLabelComponents — the same implementation d6 and the pl16
      // funnel run): the co-purchase edge list is already symmetric
      // (the double-explode emits both directions), the
      // modulo-sampled subgraph is tiny by construction so the
      // size-gated union-find fast path labels it driver-locally;
      // the Pregel-style distributed loop stays the at-scale fallback
      // inside the builder (conf graft.cc.localEdgeLimit=0 forces it)
      // one direction only (src < dst): the builder symmetrizes
      // internally, so passing the already-both-directions edge list
      // would double every edge in the distributed fallback and halve
      // the fast path's effective size gate (review finding)
      val labels = graft.functions.DedupEnrich.minLabelComponents(
        coEdges(s, dir, 300).filter(col("src") < col("dst"))
          .select(col("src").as("a"), col("dst").as("b")),
        IterSizing.iterParts(s))
      labels.groupBy("component")
        .agg(count(lit(1)).as("n_nodes"), max(col("node")).as("max_node"))
        .orderBy("component")
    },
    Some(s"""
      WITH RECURSIVE ${coEdgesSql(300)},
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      reach AS (
        SELECT node, node AS r FROM nodes
        UNION
        SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src),
      comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
      SELECT component, COUNT(*) AS n_nodes, MAX(node) AS max_node
      FROM comp
      GROUP BY component
      ORDER BY component"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3)
}
