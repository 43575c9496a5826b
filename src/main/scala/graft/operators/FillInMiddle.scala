package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation (Bavarian et al. 2022 — the
  * code-LLM data prep behind Code Llama / StarCoder infilling): a slice
  * of documents is rearranged from `prefix middle suffix` to the PSM
  * order `<fim_pre> prefix <fim_suf> suffix <fim_mid> middle`, teaching
  * a causal model to infill while the untouched remainder preserves
  * left-to-right quality.
  *
  * Deterministic distributed formulation — a PURE PROJECTION, no window,
  * no join, no shuffle (streaming-safe in append mode by construction):
  *
  *  - the transform gate is one md5 draw on the document key
  *    ([[Sampling.bernoulli]]'s discipline) against `fimRate` (the
  *    paper's 0.5-0.9);
  *  - the two cut points are two more md5 draws mapped onto token
  *    positions 0..n (mod n+1 — each of the n+1 boundaries equally
  *    likely), ordered so cut1 ≤ cut2; prefix = tokens[0, cut1),
  *    middle = [cut1, cut2), suffix = [cut2, n);
  *  - spans materialize via codegen'd `slice` on the token array (the
  *    native 1-gram [[graft.functions.WordShingles]] scan).
  *
  * Draw-to-position mapping uses the 8-hex-digit draw value mod (n+1) —
  * deterministic and engine-exact (integer ops on an exact 32-bit
  * value), with the same negligible modulo bias every engine computes
  * identically.
  *
  * Output: (doc_id, fim ∈ {true,false}, text_fim, n_prefix, n_middle,
  * n_suffix) — untransformed docs carry their tokens rejoined and zero
  * span counts.
  */
object FillInMiddle {

  val PreTok = "<fim_pre>"
  val SufTok = "<fim_suf>"
  val MidTok = "<fim_mid>"

  private def drawMod(key: Column, salt: String, modulus: Column): Column =
    conv(Sampling.draw(key, salt), 16, 10).cast("long") % modulus

  def transform(docs: DataFrame, fimRate: Double = 0.5,
                idCol: String = "doc_id", textCol: String = "text",
                salt: String = "fim"): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1, s"fimRate=$fimRate")
    val key = col("doc_id").cast("string")
    val toks = graft.functions.WordShingles.allShingles(col(textCol), 1)
    val n = size(col("__toks")).cast("long")
    val c1raw = drawMod(key, salt + ":a", n + lit(1L))
    val c2raw = drawMod(key, salt + ":b", n + lit(1L))
    val gate = Sampling.draw(key, salt) <
      lit(Sampling.thresholdHex(fimRate))
    docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .withColumn("__fim", gate && n > 0)
      .withColumn("__c1", least(c1raw, c2raw))
      .withColumn("__c2", greatest(c1raw, c2raw))
      .select(col("doc_id"), col("__fim").as("fim"),
        // one array concat then ONE join: empty spans contribute zero
        // elements, so no double separators (concat_ws would keep the
        // empty strings a per-span join produces)
        when(col("__fim"),
          concat_ws(" ", concat(
            array(lit(PreTok)),
            slice(col("__toks"), lit(1), col("__c1").cast("int")),
            array(lit(SufTok)),
            slice(col("__toks"),
              (col("__c2") + 1).cast("int"), (n - col("__c2")).cast("int")),
            array(lit(MidTok)),
            slice(col("__toks"),
              (col("__c1") + 1).cast("int"),
              (col("__c2") - col("__c1")).cast("int")))))
          .otherwise(concat_ws(" ", col("__toks"))).as("text_fim"),
        when(col("__fim"), col("__c1")).otherwise(lit(0L)).as("n_prefix"),
        when(col("__fim"), col("__c2") - col("__c1")).otherwise(lit(0L))
          .as("n_middle"),
        when(col("__fim"), n - col("__c2")).otherwise(lit(0L)).as("n_suffix"))
  }
}
