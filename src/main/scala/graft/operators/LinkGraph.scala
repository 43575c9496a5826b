package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph signals for web-scale corpus curation: PageRank over the
  * host/domain graph (the classic crawl-quality prior — a page's worth
  * rides its host's centrality in the link graph) and seeded label
  * propagation (spread a small curated host whitelist/topic labeling to
  * the rest of the graph).
  *
  * Design for 100 TB:
  *  - the graph these operators run on is HOST-level (distinct registered
  *    domains and their link edges), orders of magnitude below the page
  *    corpus — edge extraction from documents is the corpus-scale pass and
  *    happens upstream as a plain projection + distinct;
  *  - each power-iteration round is two key-partitioned aggregations (one
  *    join edges⋈ranks on src, one sum keyed dst) — the standard
  *    distributed PR shape; the edge list is checkpointed ONCE and every
  *    round re-reads its blocks, never the upstream extraction lineage;
  *  - rank frames are node-sized and eagerly checkpointed per round
  *    because each round fans out over the previous one twice (incoming
  *    contributions + the dangling-mass sum) — the barrier discipline for
  *    fan-out frames (cache() races recomputation, see NOTES);
  *  - all rank arithmetic is INTEGER fixed-point ([[Scale]] = 1e12), so
  *    aggregation order cannot perturb results and any engine replays the
  *    trajectory bit-exactly (the discipline [[KMeans]] and
  *    [[LanguageModel]] established); the damping update is exact long
  *    math: dampNum · mass ≤ 100 · 1e12 ≪ 2⁶³.
  */
object LinkGraph {

  /** Fixed-point scale for rank mass: 1 unit of rank = 1/Scale. Total
    * initial mass is n·(Scale div n) ≤ Scale = 1e12; every per-round
    * product stays well under Long.MaxValue for dampDen ≤ 10⁶. */
  val Scale: Long = 1000000000000L

  /** PageRank by power iteration over a directed edge list.
    *
    * Semantics (mirrored VERBATIM by the DuckDB oracle — change both or
    * neither; all divisions are integer floor divisions of non-negative
    * values, identical in Spark `div` and DuckDB `//`):
    *  - edges are de-duplicated; nodes = distinct(src ∪ dst);
    *  - r₀(v) = Scale div n for every node;
    *  - per round, with out-degree d(u) and damping dampNum/dampDen:
    *      contrib(u) = r(u) div d(u)            (per out-edge)
    *      dang       = Σ r(u) over out-degree-0 nodes
    *      r'(v) = (dampDen − dampNum)·(Scale div n) div dampDen
    *            + dampNum·(Σ_{u→v} contrib(u) + dang div n) div dampDen
    *    — i.e. the dangling mass is redistributed uniformly, the standard
    *    treatment, and floors make every quantity engine-exact.
    *
    * Output: (node, rank_int, rank) — rank_int is the exact fixed-point
    * mass, rank = rank_int / 1e12 (one IEEE division, deterministic).
    * Self-loops count as ordinary edges (an out-edge and an in-edge of
    * the same node); callers filter them upstream if unwanted. */
  def pageRank(edges: DataFrame, iterations: Int,
               dampNum: Long = 85L, dampDen: Long = 100L,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations: need >= 1")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen <= 1000000L,
      s"damping $dampNum/$dampDen: need 0 <= dampNum <= dampDen <= 1e6 " +
        "(keeps dampNum * total mass exact in long)")
    // the edge list is referenced by EVERY round (contrib join) and by the
    // degree frame — checkpoint once so rounds scan blocks, not the
    // upstream extraction plan
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e0.select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count() // one driver scalar: feeds literal arithmetic
    require(n > 0, "pageRank: empty edge list")
    // node-sized, referenced twice per round (contrib division + the
    // dangling anti-join) — one eager checkpoint
    val deg = e0.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__deg")).localCheckpoint(true)
    val base = (dampDen - dampNum) * (Scale / n) / dampDen // exact long math
    var r = nodes.select(col("node"), lit(Scale / n).as("rank_int"))
    for (_ <- 1 to iterations) {
      // mass parked on out-degree-0 nodes, redistributed uniformly below
      val dang = r.join(deg, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank_int")), lit(0L)).as("__dang"))
      val contrib = e0
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("rank_int div __deg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      r = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang)) // one-row total
        .select(col("node"),
          (lit(base) + expr(
            s"(($dampNum * (coalesce(__in, 0) + (__dang div $n))) div $dampDen)"))
            .as("rank_int"))
        .localCheckpoint(true) // fan-out barrier for the next round
    }
    r.select(col("node"), col("rank_int"),
      (col("rank_int").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Seeded label propagation over an UNDIRECTED view of the edge list —
    * spread a small curated labeling (a quality whitelist, a topic
    * taxonomy over hosts) to the whole graph.
    *
    * Semantics (deterministic, mirrored by the DuckDB oracle):
    *  - the edge list is symmetrized and de-duplicated; only nodes
    *    appearing in it are emitted (seeds outside the graph are ignored,
    *    the [[Dedup.connectedComponents]] contract); a node seeded with
    *    several labels keeps the lexicographically smallest non-null one
    *    (min skips nulls), and a node whose only seed label is null is
    *    treated as unseeded;
    *  - synchronous rounds: every node's candidate label is the MAJORITY
    *    label among its currently-labeled neighbors, ties to the
    *    lexicographically smallest label;
    *  - per round, label(v) = coalesce(seed(v), majority(v), previous(v))
    *    — seeds are clamped, and a node with no labeled neighbor keeps
    *    what it had (possibly null).
    *
    * Scale shape: one vote aggregation keyed (node, label) per round plus
    * a node-partitioned window for the argmax — both partition on the
    * node id; label frames are node-sized and eagerly checkpointed per
    * round (each is referenced by the next round's votes AND its
    * keep-previous leg). Output: (node, label nullable, is_seed). */
  def labelPropagate(edges: DataFrame, seeds: DataFrame, iterations: Int,
                     srcCol: String = "src", dstCol: String = "dst",
                     nodeCol: String = "node",
                     labelCol: String = "label"): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations: need >= 1")
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e0 = raw.unionByName(
        raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val nodes = e0.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val sd = seeds.groupBy(col(nodeCol).as("node"))
      .agg(min(col(labelCol)).as("__seed")).localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("__c").desc, col("__nl").asc)
    var l = nodes.join(sd, Seq("node"), "left")
      .select(col("node"), col("__seed").as("label")).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val pick = e0
        .join(l.filter(col("label").isNotNull)
          .select(col("node").as("src"), col("label").as("__nl")), Seq("src"))
        .groupBy(col("dst").as("node"), col("__nl"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node"), col("__nl").as("__win"))
      l = nodes
        .join(sd, Seq("node"), "left")
        .join(pick, Seq("node"), "left")
        .join(l.select(col("node"), col("label").as("__prev")), Seq("node"))
        .select(col("node"),
          coalesce(col("__seed"), col("__win"), col("__prev")).as("label"))
        .localCheckpoint(true)
    }
    l.join(sd, Seq("node"), "left")
      .select(col("node"), col("label"), col("__seed").isNotNull.as("is_seed"))
  }
}
