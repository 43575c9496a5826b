package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-joins for skewed keys — the manual fallback when AQE's
  * skew-join splitting can't help (AQE only splits SORT-MERGE join
  * partitions; a skewed key inside an aggregation-feeding join, or a
  * deployment with AQE off, still hot-spots one task).
  *
  * Shape: the SKEWED side scatters each row to one of `saltBuckets`
  * sub-keys (deterministic hash of the row, so reruns place rows
  * identically); the REPLICATED side duplicates each row into every
  * sub-key. The join key becomes (key, salt), fanning one hot key's rows
  * across `saltBuckets` tasks. Replication multiplies the small side by
  * `saltBuckets` — size that side accordingly (dimension-sized inputs;
  * for two large skewed sides, split the hot keys out and union two
  * joins instead).
  *
  * Results are row-identical to the unsalted join: salt never reaches
  * the output, and inner-join multiplicity is preserved (each skewed row
  * meets each matching replicated row exactly once — in the one salt
  * bucket the skewed row landed in).
  */
object SkewJoin {

  /** Inner equi-join of `skewed ⋈ small` on `keys`, salted to
    * `saltBuckets`. Output columns = the unsalted join's (skewed side's
    * columns first).
    *
    * Scatter: by default, the deterministic hash of the skewed side's
    * hashable non-key columns (hash over the keys alone would send a hot
    * key's rows to one salt — the exact hot spot being split; map-typed
    * columns can't hash). That default CANNOT split a hot key whose rows
    * are IDENTICAL in every hashable non-key column (duplicate-heavy skew
    * — the common case for scraped corpora): identical rows hash to one
    * salt and the hot spot survives. For those inputs pass `scatterBy` —
    * any expression distinct-ish within a key (a row id,
    * `monotonically_increasing_id()` captured BEFORE the join, a source
    * offset). It must be deterministic per ROW (retried tasks must place
    * rows identically or results change), but need not be unique —
    * collisions only cost balance, never correctness. Any type works
    * (string ids, structs): the override is hashed, never cast, so a
    * non-numeric or null value can never yield a null salt. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, scatterBy: Option[Column] = None): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(!skewed.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "__salt is reserved by saltedJoin")
    val scatterExpr = scatterBy match {
      // hash the override, never cast it: cast("long") on a uuid string or
      // null value yields a null __salt and the inner join on __salt then
      // silently DROPS those rows; xxhash64 is non-null for any input type
      case Some(c) => xxhash64(c)
      case None =>
        // not rand() — retried tasks must place rows identically or results
        // change; not maps — Spark refuses hash over MapType
        val hashable = skewed.schema.fields
          .filter(f => !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
          .map(_.name).filterNot(keys.contains)
        require(hashable.nonEmpty,
          "saltedJoin needs a hashable non-key column on the skewed side to " +
            "scatter rows within a key; add one (e.g. a row id) or pass scatterBy")
        xxhash64(hashable.toIndexedSeq.map(col): _*)
    }
    val scatter = pmod(scatterExpr, lit(saltBuckets.toLong)).cast("int")
    val s = skewed.withColumn("__salt", scatter)
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    val cond = (keys.map(k => s(k) === r(k)) :+ (s("__salt") === r("__salt")))
      .reduce(_ && _)
    val dropCols = r("__salt") +: keys.map(r(_))
    dropCols.foldLeft(s.join(r, cond, "inner")) { (df, c) => df.drop(c) }
      .drop("__salt")
  }
}
