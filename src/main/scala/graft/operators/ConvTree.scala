package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-TREE flattening — the ShareGPT/LMSYS export shape, where
  * regenerations and edits branch a conversation into a tree of turns and
  * the training artifact is one linear conversation per ROOT-TO-LEAF path
  * (each path then feeds [[SftPrep.formatConversation]]).
  *
  * The reference pipeline has no tree operator (its records are flat);
  * this is part of the LLM-pipeline tier (SURVEY.md §2.8 L135).
  *
  * Scale shape: the sequential parent-walk is a POINTER-DOUBLING orbit,
  * not a driver loop — the [[SftPrep.packGreedy]] / [[LinkGraph]]
  * discipline. Each round is ONE (node-keyed) equi-join of the state
  * frame with itself, eagerly checkpointed; after r rounds every node
  * carries its nearest 2^r ancestors, so a forest of depth ≤ D resolves
  * in ceil(log2(D)) rounds. The state carries ID ARRAYS only (the path),
  * never turn text — rendering joins text ONCE at the end, bounded by
  * Σ path lengths, so heavy payloads cross the shuffle once, not
  * log-depth times.
  */
object ConvTree {

  /** Per-node root path by pointer doubling.
    *
    * Input: one row per turn with `idCol` (unique, any integral/string
    * type) and `parentCol` (null for roots; every non-null parent must
    * exist as a node — dangling parents fail the resolution check).
    *
    * `maxDepth` bounds the deepest root-to-leaf path the caller expects;
    * the operator runs ceil(log2(maxDepth)) doubling rounds and FAILS
    * FAST (with the unresolved count) if any node is still un-rooted
    * after them — a silent partial path would corrupt every downstream
    * conversation.
    *
    * Output: (node_id, root_id, depth, path) — path is root-first and
    * includes the node itself; depth = size(path); roots have depth 1.
    */
  def rootPaths(turns: DataFrame, maxDepth: Int,
                idCol: String = "node_id",
                parentCol: String = "parent_id"): DataFrame = {
    require(maxDepth >= 1, s"maxDepth=$maxDepth")
    val rounds = math.ceil(math.log(maxDepth.toDouble) / math.log(2.0))
      .toInt.max(1)
    // state invariant after round r: `path` = the chain of the node's
    // nearest min(2^r, all) ancestors ending at the node (top-down);
    // `__jump` = the next ancestor above the chain (null once a root is in)
    var state = turns
      .select(col(idCol).as("node_id"), col(parentCol).as("__jump"),
        array(col(idCol)).as("path"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val above = state.select(col("node_id").as("__jump"),
        col("__jump").as("__jump2"), col("path").as("__path2"))
      // no-match (__path2 null) means a DANGLING parent: the state is kept
      // unchanged so the node stays unresolved and the final check names
      // it — a silent null path would corrupt downstream conversations
      val stalled = col("__jump").isNull || col("__path2").isNull
      state = state
        .join(above, Seq("__jump"), "left")
        .select(col("node_id"),
          when(stalled, col("__jump")).otherwise(col("__jump2")).as("__j"),
          when(stalled, col("path"))
            .otherwise(concat(col("__path2"), col("path"))).as("path"))
        .withColumnRenamed("__j", "__jump")
        .localCheckpoint(true) // fan-out barrier for the next round
    }
    val unresolved = state.filter(col("__jump").isNotNull).count()
    require(unresolved == 0,
      s"rootPaths: $unresolved node(s) deeper than maxDepth=$maxDepth " +
        "(or with a dangling parent) after " + rounds + " doubling rounds")
    state.select(col("node_id"), element_at(col("path"), 1).as("root_id"),
      size(col("path")).as("depth"), col("path"))
  }

  /** Root-to-leaf conversations: [[rootPaths]] filtered to LEAVES (nodes
    * that are nobody's parent), each rendered by joining turn text back
    * along the path — one posexplode + one equi-join + the window-ordered
    * collection idiom, all bounded by Σ leaf-path lengths.
    *
    * Output: (leaf_id, root_id, depth, path_str, conv_text) — path_str
    * is the '>'-joined id chain, conv_text the ' | '-joined texts in
    * root-to-leaf order. */
  def leafConversations(turns: DataFrame, maxDepth: Int,
                        idCol: String = "node_id",
                        parentCol: String = "parent_id",
                        textCol: String = "text"): DataFrame = {
    val parents = turns.filter(col(parentCol).isNotNull)
      .select(col(parentCol).as("node_id")).distinct()
    val leaves = rootPaths(turns, maxDepth, idCol, parentCol)
      .join(parents, Seq("node_id"), "left_anti")
      .select(col("node_id").as("leaf_id"), col("root_id"), col("depth"),
        concat_ws(">", col("path").cast("array<string>")).as("path_str"),
        col("path"))
    // Null text coalesces to "" BEFORE the render join: collect_list
    // skips nulls, so an uncoalesced null turn would silently shorten
    // conv_text (and a recursive-CTE engine would null the whole
    // conversation instead) — coalescing pins one engine-independent
    // semantic: a null turn renders as an empty segment.
    val steps = leaves
      .select(col("leaf_id"), posexplode(col("path")).as(Seq("__pos", "__n")))
      .join(turns.select(col(idCol).as("__n"),
          coalesce(col(textCol), lit("")).as("__t")),
        Seq("__n"))
    val wCum = Window.partitionBy(col("leaf_id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rendered = steps
      .withColumn("__arr", collect_list(col("__t")).over(wCum))
      .groupBy(col("leaf_id"))
      .agg(max(struct(col("__pos"), col("__arr"))).as("__last"))
      .select(col("leaf_id"),
        array_join(col("__last.__arr"), " | ").as("conv_text"))
    leaves.drop("path").join(rendered, Seq("leaf_id"))
  }
}
