package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group corpus reporting — the summary a training-data pipeline prints
  * per language/source/domain before and after each filtering stage: how
  * many documents, how many tokens, how diverse the sources, where the
  * median document sits.
  *
  * Two tiers with the same schema:
  *  - [[stats]] is EXACT (count-distinct + exact percentile). Exact
  *    distinct and exact median both need the full value set per group —
  *    fine to ~billions of rows per group, and required for the oracle
  *    gate.
  *  - [[approxStats]] is the 100 TB path: HyperLogLog++ distinct
  *    (`approx_count_distinct`, fixed-size sketch, map-side combinable)
  *    and t-digest median (`percentile_approx`) — both stream in one pass
  *    with bounded memory per group, at the cost of a small documented
  *    relative error. Same columns, so a report consumer can switch tiers
  *    by data volume without schema changes.
  */
object CorpusStats {

  /** Exact per-`groupCol` stats: document count, total `tokenCountCol`,
    * distinct `distinctCol` count, exact interpolated median of
    * `tokenCountCol` (index p·(n−1), linear interpolation — the same
    * definition DuckDB's quantile_cont uses, so halves of integers compare
    * bit-exactly). */
  def stats(docs: DataFrame, groupCol: String, tokenCountCol: String,
            distinctCol: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCountCol)).as("total_tokens"),
        countDistinct(col(distinctCol)).as("n_distinct"),
        // Column API, not an expr() splice: a column name needing backticks
        // (dot, space) resolves like every other parameter here
        percentile(col(tokenCountCol), lit(0.5)).as("median_tokens"))

  /** Sketch-based variant: identical schema, bounded-memory aggregation.
    * `accuracy` is percentile_approx's inverse-error knob (10000 ≈ 0.01%
    * rank error); approx_count_distinct runs at its default ~2% rsd. */
  def approxStats(docs: DataFrame, groupCol: String, tokenCountCol: String,
                  distinctCol: String, accuracy: Int = 10000): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCountCol)).as("total_tokens"),
        approx_count_distinct(col(distinctCol)).as("n_distinct"),
        percentile_approx(col(tokenCountCol), lit(0.5), lit(accuracy))
          .cast("double").as("median_tokens"))

  /** Per-group length-band outlier filter (the Gopher-style drop): keep
    * documents whose `tokenCountCol` lies inside the [loQ, hiQ] percentile
    * band of their OWN group — absolute cutoffs misfire across languages
    * whose documents tokenize to very different lengths, per-group bands
    * don't.
    *
    * Two tiers, same contract as [[stats]]/[[approxStats]]: `exact = true`
    * uses interpolated percentiles (gate-checkable; per-group value sets
    * must fit an aggregation buffer), `exact = false` uses t-digest
    * sketches at `accuracy` — the 100 TB path, one streaming pass. Either
    * way the band frame is one row per group and broadcasts; the corpus
    * pass is a broadcast join + filter, no second shuffle. */
  def lengthBandFilter(docs: DataFrame, groupCol: String,
                       tokenCountCol: String, loQ: Double, hiQ: Double,
                       exact: Boolean = true,
                       accuracy: Int = 10000): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ,
      s"need 0 <= loQ <= hiQ <= 1, got [$loQ, $hiQ]")
    val reserved = Seq("__lo", "__hi")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by lengthBandFilter")
    def q(p: Double) =
      if (exact) percentile(col(tokenCountCol), lit(p))
      else percentile_approx(col(tokenCountCol), lit(p), lit(accuracy))
        .cast("double")
    val bands = docs.groupBy(col(groupCol))
      .agg(q(loQ).as("__lo"), q(hiQ).as("__hi"))
    docs.join(broadcast(bands), Seq(groupCol))
      .filter(col(tokenCountCol) >= col("__lo") &&
        col(tokenCountCol) <= col("__hi"))
      .drop("__lo", "__hi")
      .select(docs.columns.map(col).toSeq: _*)
  }

  /** EXACT per-group quantiles with NO per-group value buffer — the third
    * tier beside [[stats]] (exact, per-group buffer) and [[approxStats]]
    * (t-digest sketch): for DISCRETE-valued columns (token counts, line
    * counts, byte lengths) the per-(group, value) HISTOGRAM is
    * cardinality-bounded however large the corpus grows, so exact
    * quantiles cost one map-side-combinable aggregation plus a window
    * over the histogram — bounded memory AND zero rank error, where the
    * buffer tier risks the aggregation buffer and the sketch tier pays a
    * documented error. (Continuous doubles would need value bucketing
    * first; that re-introduces an error bound and the sketch tier is
    * then the honest choice.)
    *
    * Quantile definition (mirrored literally by the oracle): rank
    * r_p = max(1, ceil(p·n)) (1-based), quantile = smallest value whose
    * cumulative histogram count reaches r_p — the discrete lower
    * quantile. The ceil runs on the p·n DOUBLE product in both engines,
    * so the cut index is engine-exact.
    *
    * Output: (group, n, q_<p> per requested p — 0.25 → "q_25"). */
  def histogramQuantiles(docs: DataFrame, groupCol: String,
                         valueCol: String,
                         ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95))
      : DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must lie in (0, 1], got $ps")
    // q_<p> names round to whole percents — two requested quantiles that
    // round to the same percent would silently collide (ADVICE r12)
    require(ps.map(p => math.round(p * 100)).distinct.size == ps.size,
      s"quantile column names collide after rounding to percents: $ps")
    val reserved = Seq("__cnt", "__cum", "n")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by histogramQuantiles")
    val hist = docs.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__cnt"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("n", sum(col("__cnt")).over(wAll))
    def qName(p: Double): String =
      "q_" + math.round(p * 100).toString
    val aggs = max(col("n")).as("n") +: ps.map { p =>
      val r = greatest(lit(1L),
        ceil(lit(p) * col("n").cast("double")).cast("long"))
      min(when(col("__cum") >= r, col(valueCol))).as(qName(p))
    }
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Dataset-card rollup: doc and token counts over every grouping-set
    * combination of two dimensions (each alone, both, and the grand
    * total) in ONE pass — Spark's `cube` expands the sets map-side, so
    * the corpus is read once however many combinations report.
    * `gid` is `grouping_id(dim1, dim2)` (bit 1 = dim1 grouped out,
    * bit 0 = dim2 — the same encoding DuckDB's GROUPING() emits), which
    * disambiguates a genuine NULL dimension value from a rolled-up row.
    *
    * Output: (dim1, dim2, gid, n_docs, total_tokens). */
  def rollupReport(docs: DataFrame, dim1: String, dim2: String,
                   tokenCountCol: String): DataFrame =
    docs.cube(col(dim1), col(dim2))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
        sum(col(tokenCountCol)).as("total_tokens"))
      .select(col(dim1), col(dim2), col("gid"), col("n_docs"),
        col("total_tokens"))

  /** Distribution DRIFT report — Population Stability Index per signal
    * between a `reference` snapshot and the `current` ingest: the
    * monitoring gate a continuously-fed corpus runs before letting a new
    * crawl batch into the pool (PSI < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted — the standard reading).
    *
    * Semantics (engine-exact, mirrored by the oracle):
    *  - per signal, bucket edges are the numBuckets−1 exact percentiles
    *    of the REFERENCE (equal-population reference buckets, the
    *    standard PSI arrangement); bucket(x) = #cuts strictly below x —
    *    the [[Packing.curriculumOrder]] cut discipline;
    *  - proportions are add-one smoothed — p = (n + 1)/(N + numBuckets) —
    *    so an empty bucket on either side stays finite;
    *  - each term (p_cur − p_ref)·ln(p_cur/p_ref) is quantized to integer
    *    MICRO units before summation (the [[LanguageModel]] micro-nat
    *    discipline: ln's last-ULP engine differences vanish under the
    *    1e6 rounding, and the long sum is order-independent). Terms are
    *    provably non-negative (both factors share a sign).
    *
    * Scale shape: THREE jobs total, independent of the signal count —
    * one reference aggregation carrying every signal's cut array, then
    * one conditional aggregation per side carrying every (signal,
    * bucket) count against the broadcast cut row; the PSI assembly is a
    * static projection over the two one-row frames. The corpus never
    * shuffles and is read once per side. NULL signal values get a null
    * bucket (see [[bucketOf]]) and are excluded from that signal's
    * counts on BOTH sides — n_ref/n_cur are per-signal non-null counts.
    * Output: (signal, psi, n_ref, n_cur), one row per signal. */
  /** Equal-population cut row for [[bucketOf]]: the n−1 exact percentiles
    * of `valueCol` as one `__cuts<tag>` array column — ONE narrow
    * aggregation, broadcast by the caller. The shared definition of the
    * quantile-bucket discipline ([[Packing.curriculumOrder]] bands and
    * [[driftReport]] PSI buckets ride the same two functions, so the cut
    * and tie semantics cannot drift apart). */
  private[operators] def quantileCutExpr(valueCol: Column, n: Int,
                                         tag: String = ""): Column =
    percentile(valueCol,
      typedlit((1 until n).map(_.toDouble / n))).as(s"__cuts$tag")

  /** bucket(x) = #cuts strictly below x, against the `__cuts<tag>` column
    * a broadcast [[quantileCutExpr]] row provides — a static codegen'd
    * comparison sum; ties at a cut land in the LOWER bucket. A NULL value
    * gets a NULL bucket (every comparison is null), so null-signal rows
    * are VISIBLE to the caller rather than silently landing in bucket
    * 0 — [[Packing.curriculumOrder]] surfaces them as a null band,
    * [[driftReport]] excludes them from both sides' counts. */
  private[operators] def bucketOf(valueCol: Column, n: Int,
                                  tag: String = ""): Column =
    when(valueCol.isNull, lit(null))
      .otherwise((1 until n)
        .map(i => when(valueCol > element_at(col(s"__cuts$tag"), i), 1)
          .otherwise(0))
        .reduce(_ + _))

  def driftReport(reference: DataFrame, current: DataFrame,
                  signalCols: Seq[String], numBuckets: Int = 10): DataFrame = {
    require(numBuckets >= 2, s"numBuckets=$numBuckets: need >= 2")
    require(signalCols.nonEmpty, "driftReport: need at least one signal")
    // ONE reference aggregation carries every signal's cut array; ONE
    // conditional aggregation per side carries every (signal, bucket)
    // count — three jobs total, independent of the signal count (a 100 TB
    // crawl batch is read once, not once per signal). NULL signal values
    // get a null bucket (see bucketOf) and are excluded from that
    // signal's counts on both sides.
    val cutCols = signalCols.zipWithIndex.map { case (sc, si) =>
      quantileCutExpr(col(sc), numBuckets, si.toString)
    }
    val cuts = reference.agg(cutCols.head, cutCols.tail: _*)
    def countsRow(df: DataFrame, side: String): DataFrame = {
      val aggs = signalCols.zipWithIndex.flatMap { case (sc, si) =>
        val b = bucketOf(col(sc), numBuckets, si.toString)
        (0 until numBuckets).map { k =>
          sum(when(b === k, 1L).otherwise(0L)).as(s"__${side}_${si}_$k")
        }
      }
      df.crossJoin(broadcast(cuts)).agg(aggs.head, aggs.tail: _*)
    }
    val row = countsRow(reference, "r").crossJoin(countsRow(current, "c"))
    val entries = signalCols.zipWithIndex.map { case (sc, si) =>
      val nr = (0 until numBuckets).map(k => col(s"__r_${si}_$k"))
      val nc = (0 until numBuckets).map(k => col(s"__c_${si}_$k"))
      val tr = nr.reduce(_ + _)
      val tc = nc.reduce(_ + _)
      val terms = (0 until numBuckets).map { k =>
        val pr = (nr(k) + 1).cast("double") /
          (tr + numBuckets).cast("double")
        val pc = (nc(k) + 1).cast("double") /
          (tc + numBuckets).cast("double")
        round((pc - pr) * log(pc / pr) * 1e6).cast("long")
      }
      struct(lit(sc).as("signal"),
        (terms.reduce(_ + _).cast("double") / 1e6).as("psi"),
        tr.as("n_ref"), tc.as("n_cur"))
    }
    row.select(explode(array(entries: _*)).as("__e")).select(col("__e.*"))
  }

  /** Multi-signal quality ENSEMBLE rank — the blended-percentile score a
    * curation mix uses when no single signal is trusted (the
    * FineWeb-Edu-style blend, signal-agnostic): each integer signal maps
    * to its exact cumulative percentile rank
    * (#{docs with value ≤ mine}·10⁶ div n — ties share a rank by
    * construction), and the ensemble is the integer mean of the per-
    * signal ranks. All-integer → engine-exact.
    *
    * Scale shape: per signal, ONE value-keyed histogram aggregation
    * (map-side combined), a cumulative window over the DISTINCT-VALUE
    * frame (cardinality-bounded — the [[histogramQuantiles]] state
    * discipline; a partitionless window over distinct values, never over
    * documents), and one value-keyed join back. The corpus never
    * self-joins; K signals cost K histogram passes over one shared
    * checkpointed projection.
    *
    * Output: (idCol, <signal columns>, rank_<signal>… (micro),
    * ensemble_micro). */
  def ensembleRank(docs: DataFrame, idCol: String,
                   signals: Seq[(String, Column)]): DataFrame = {
    require(signals.nonEmpty, "ensembleRank needs at least one signal")
    require(signals.map(_._1).distinct.size == signals.size,
      s"duplicate signal names: ${signals.map(_._1)}")
    val base = docs.select(col(idCol).as("doc_id") +:
        signals.map { case (n, c) => c.cast("long").as(n) }: _*)
      .localCheckpoint(true) // K histogram passes + the final join chain
    var out = base
    for ((n, _) <- signals) {
      val hist = base.groupBy(col(n)).agg(count(lit(1)).as("__c"))
      val w = Window.orderBy(col(n))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranks = hist
        .withColumn("__cum", sum(col("__c")).over(w))
        .withColumn("__n", sum(col("__c")).over(all))
        .select(col(n), expr("(__cum * 1000000) div __n").as(s"rank_$n"))
      out = out.join(ranks, Seq(n))
    }
    val mean = expr(signals.map(s => s"rank_${s._1}").mkString("(", " + ", s") div ${signals.size}"))
    out.select((col("doc_id").as(idCol) +: signals.map(s => col(s._1))) ++
      signals.map(s => col(s"rank_${s._1}")) :+
      mean.as("ensemble_micro"): _*)
  }

  /** Vocabulary-growth report (L145) — the Heaps-law curve read off real
    * ingest batches: per bucket (a shard, snapshot, crawl day — any
    * ordered batch key the caller supplies), how many token occurrences
    * arrived and how many NEW types appeared (types whose FIRST bucket
    * is this one), plus both cumulative curves. A corpus whose new-type
    * curve stops bending is saturating its vocabulary — the health check
    * behind "do we need more diverse data?" and closed-vocab sizing
    * ([[graft.operators.TextAnalysis.vocabCoverage]]'s longitudinal
    * twin).
    *
    * Scale shape: one (bucket) count and one (token) min-bucket
    * aggregation, both map-side-combined; the rollup and the cumulative
    * window run on the BUCKETS-sized frame (dozens of rows — the
    * partitionless window is over batches, never the corpus). */
  def vocabGrowth(docs: DataFrame, bucketCol: String,
                  textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(bucketCol).as("bucket"),
      explode(graft.operators.TextAnalysis.tokens(col(textCol))).as("__tok"))
    val perBucket = tok.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val newTypes = tok.groupBy(col("__tok"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_new_types"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(newTypes, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_types", sum(col("n_new_types")).over(w))
  }
}
