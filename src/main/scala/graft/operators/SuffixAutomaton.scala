package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Generalized suffix automaton (Blumer et al. 1985's DAWG, built by the
  * online construction) over token sequences — the third, algorithmically
  * independent formulation of ExactSubstr duplicated-span detection
  * (Lee et al. 2022), cross-checking [[SubstringDedup]] (hashed k-grams)
  * and [[SuffixArray]] (prefix-doubling + neighbor LCP). Parity between
  * independent algorithms is the strongest oracle available: the SAM path
  * shares NO intermediate structure with either sibling — no gram hashes
  * (matches are exact token strings, collisions impossible), no global
  * suffix order, no doubling tables.
  *
  * Distribution: two tiers, built so the automaton does the expensive
  * work where it is strongest — inside a partition, with zero shuffle.
  *  - Tier 1 (per partition, mapPartitions): ONE generalized SAM over all
  *    of the partition's documents; state occurrence counts (endpos-class
  *    sizes) by the classic suffix-link propagation. Every position whose
  *    minLen-gram the SAM counts ≥ 2 is resolved duplicated LOCALLY and
  *    never shuffles its gram text. In the boilerplate-heavy corpora this
  *    operator exists for, within-partition repetition is the common case
  *    — exactly the rows the SAM absorbs.
  *  - Tier 2 (cross-partition): a position whose gram is LOCALLY UNIQUE
  *    emits one (gram text, doc, pos) row; a gram locally repeated emits
  *    one presence-only row per partition. A gram is globally duplicated
  *    iff its tier-2 record count reaches 2 (each unresolved position IS
  *    its partition's single occurrence, and a presence row certifies ≥2
  *    more) — one count aggregation + one equi-join, both keyed on the
  *    gram, carrying only locally-unique positions and distinct repeated
  *    grams. Shuffle volume is strictly ≤ the k-gram path's
  *    every-position emission, and shrinks as duplication grows.
  *
  * Memory contract (the honest cost of the exact automaton): a
  * partition's SAM is O(partition tokens) states (< 2n), each a
  * HashMap-transition node — roughly 100–200 bytes per token. Partitions
  * must be sized so tokens × ~200 B fits the executor (the default
  * 128 MB input split ≈ 25 M tokens ≈ 5 GB of automaton is TOO BIG:
  * repartition the corpus to ~10–20 MB of text per partition first, or
  * prefer the [[SubstringDedup]] / [[SuffixArray]] formulations as the
  * routine 100 TB paths — this operator's production role is the
  * independent AUDIT of those paths on samples and suspect slices).
  *
  * Spans are merged per document by the shared
  * [[SubstringDedup.mergeStartPositions]], so all three paths produce
  * byte-identical output frames on the same corpus (spec-pinned on
  * random corpora; oracle-gated against the k-gram DuckDB formulation).
  */
object SuffixAutomaton {

  /** One generalized-SAM node: longest member length, suffix link,
    * token-keyed transitions, and the endpos-class count accumulator. */
  private final class Node(val len: Int, var link: Int) {
    val next = new mutable.HashMap[String, Int]()
    var cnt: Long = 0L
  }

  /** Mutable generalized suffix automaton over token sequences. Exposed
    * private[operators] for the equivalence specs. */
  private[operators] final class Sam {
    private val nodes = mutable.ArrayBuffer(new Node(0, -1))
    private var last = 0

    /** Online extension by one token (standard construction, with the
      * existing-transition cases that make it GENERALIZED — documents
      * are added by [[reset]]-ing to the root, and a prefix already in
      * the automaton must reuse or clone instead of duplicating). Each
      * extension credits one occurrence to the state of the current
      * document prefix; [[propagate]] turns those into endpos sizes. */
    def extend(token: String): Unit = {
      val l = nodes(last)
      l.next.get(token) match {
        case Some(q) if nodes(q).len == l.len + 1 =>
          last = q
          nodes(q).cnt += 1L
        case Some(q) =>
          val clone = cloneNode(q, l.len + 1)
          redirect(last, token, q, clone)
          last = clone
          nodes(clone).cnt += 1L
        case None =>
          val cur = nodes.length
          nodes += new Node(l.len + 1, -1)
          nodes(cur).cnt = 1L
          var p = last
          while (p != -1 && !nodes(p).next.contains(token)) {
            nodes(p).next(token) = cur
            p = nodes(p).link
          }
          if (p == -1) nodes(cur).link = 0
          else {
            val q = nodes(p).next(token)
            if (nodes(q).len == nodes(p).len + 1) nodes(cur).link = q
            else {
              val clone = cloneNode(q, nodes(p).len + 1)
              redirect(p, token, q, clone)
              nodes(cur).link = clone
            }
          }
          last = cur
      }
    }

    private def cloneNode(q: Int, len: Int): Int = {
      val c = nodes.length
      val n = new Node(len, nodes(q).link)
      n.next ++= nodes(q).next
      nodes += n
      nodes(q).link = c
      c
    }

    /** Re-point p's suffix-chain transitions on `token` from q to its
      * fresh clone (shared tail of both clone sites). */
    private def redirect(from: Int, token: String, q: Int, c: Int): Unit = {
      var p = from
      while (p != -1 && nodes(p).next.get(token).contains(q)) {
        nodes(p).next(token) = c
        p = nodes(p).link
      }
    }

    /** Start the next document: suffixes never cross documents. */
    def reset(): Unit = last = 0

    /** Turn per-prefix occurrence credits into endpos-class sizes: add
      * each state's count into its suffix link, longest states first
      * (a counting sort on len — the construction guarantees
      * len(link) < len). Call once, after ALL documents are added. */
    def propagate(): Unit = {
      val maxLen = nodes.iterator.map(_.len).max
      val buckets = Array.fill(maxLen + 1)(List.empty[Int])
      var i = nodes.length - 1
      while (i >= 1) { buckets(nodes(i).len) ::= i; i -= 1 }
      var l = maxLen
      while (l >= 1) {
        buckets(l).foreach { v =>
          val lk = nodes(v).link
          if (lk >= 1) nodes(lk).cnt += nodes(v).cnt
        }
        l -= 1
      }
    }

    /** Occurrence count of the exact token sequence `gram` (0 when the
      * automaton has never seen it). Valid only after [[propagate]]. */
    def count(gram: Array[String], from: Int, len: Int): Long = {
      var s = 0
      var i = 0
      while (i < len) {
        nodes(s).next.get(gram(from + i)) match {
          case Some(t) => s = t
          case None => return 0L
        }
        i += 1
      }
      nodes(s).cnt
    }
  }

  private val hitSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pos", LongType, nullable = true),
    StructField("gram", StringType, nullable = true)))

  /** Maximal duplicated token spans per document — identical contract
    * (and, by construction, identical output) to
    * [[SubstringDedup.duplicatedSpans]] at k = minLen and
    * [[SuffixArray.duplicatedSpans]]: (doc_id, span_start, span_end),
    * end-exclusive, a span meaning every minLen-window starting inside
    * [span_start, span_end - minLen] occurs ≥ 2 times corpus-wide. */
  def duplicatedSpans(docs: DataFrame, minLen: Int,
                      idCol: String = "doc_id",
                      textCol: String = "text",
                      maxPartitionTokens: Long = 4000000L): DataFrame = {
    require(minLen >= 1, s"minLen=$minLen")
    require(maxPartitionTokens >= 1, s"maxPartitionTokens=$maxPartitionTokens")
    val spark = docs.sparkSession
    // null text coalesces to the empty document (zero positions) — the
    // same silent skip the sibling formulations get from posexplode of a
    // null array; idCol must be NON-NULL (the per-row kernel reads it as
    // a primitive long, and the span merge keys on it)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.WordShingles.allShingles(
        coalesce(col(textCol), lit("")), 1).as("t"))
    // tier 1: one SAM per partition. Row kinds by nullability: resolved
    // positions carry no gram text (gram null), locally-unique positions
    // carry their exact gram, and each distinct locally-repeated gram
    // adds one presence-only row (pos null)
    val hits = spark.createDataFrame(
      toks.rdd.mapPartitions { rows =>
        // runtime enforcement of the memory contract documented above:
        // the running token count trips BEFORE the rest of an oversized
        // partition materializes (and long before the O(tokens) automaton
        // builds), so misuse fails with the repartition hint instead of
        // an executor OOM
        var partTokens = 0L
        val parts = rows.map { r =>
          val t = r.getSeq[String](1).toArray
          partTokens += t.length
          if (partTokens > maxPartitionTokens)
            throw new IllegalStateException(
              s"SuffixAutomaton.duplicatedSpans: partition exceeds " +
                s"$maxPartitionTokens tokens (~${maxPartitionTokens * 200 / (1 << 20)} MB " +
                "of automaton at ~200 B/token). Repartition the corpus to " +
                "~10-20 MB of text per partition first, raise " +
                "maxPartitionTokens if the executor heap genuinely has " +
                "room, or use SubstringDedup/SuffixArray as the routine " +
                "large-corpus paths.")
          (r.getLong(0), t)
        }.toArray
        val sam = new Sam
        parts.foreach { case (_, t) =>
          sam.reset()
          t.foreach(sam.extend)
        }
        sam.propagate()
        val out = mutable.ArrayBuffer.empty[Row]
        val presence = new mutable.HashSet[String]()
        parts.foreach { case (id, t) =>
          var p = 0
          while (p + minLen <= t.length) {
            val c = sam.count(t, p, minLen)
            if (c >= 2L) {
              out += Row(id, p.toLong, null)
              // one presence row per distinct locally-repeated gram:
              // other partitions' unique holders of it must resolve
              val g = t.slice(p, p + minLen).mkString(" ")
              if (presence.add(g)) out += Row(id, null, g)
            } else {
              out += Row(id, p.toLong, t.slice(p, p + minLen).mkString(" "))
            }
            p += 1
          }
        }
        out.iterator
      }, hitSchema).localCheckpoint(true)
    val resolved = hits.filter(col("gram").isNull)
      .select(col("doc_id"), col("pos"))
    val open = hits.filter(col("gram").isNotNull)
    // a gram reaching 2 tier-2 records is globally duplicated: every
    // unresolved position is its partition's single occurrence and a
    // presence row certifies ≥ 2 more elsewhere
    val dup = open.groupBy(col("gram")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("gram"))
    val crossResolved = open.filter(col("pos").isNotNull)
      .join(dup, Seq("gram")).select(col("doc_id"), col("pos"))
    SubstringDedup.mergeStartPositions(
      resolved.unionByName(crossResolved), minLen)
  }
}
