package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F9 — the reference's single most-shared operator: disease-name → EFO-ID
  * mapping, called from 9 parsers (`common/ontology.py:16-94`).
  *
  * The reference implemented it as a driver-side pandas `parallel_apply`
  * with HTTP calls to OnToma. Re-expressed as pure dataflow: the resolver
  * becomes a lookup table (the reference itself degrades to exactly this
  * for its GPT cache, `Pharmacogenetics.py:101-106`), and application is a
  * null-safe left join (`common/ontology.py:87-94` uses `eqNullSafe` on
  * both keys because either may be null).
  *
  * Scale notes: the LUT is distinct (name, id) pairs — orders of magnitude
  * smaller than the evidence table — so we `broadcast()` it and the join is
  * shuffle-free. Null-safe equality would normally block broadcast-hash on
  * some planners; Spark handles `<=>` in broadcast joins natively.
  */
object OntologyMap {

  /** Null-safe left join of a mapping LUT onto `df`.
    *
    * @param keys  (dfCol, lutCol) pairs compared null-safely (`<=>`)
    * @param payload columns of `lut` to bring in
    */
  def nullSafeLeftJoin(
      df: DataFrame,
      lut: DataFrame,
      keys: Seq[(String, String)],
      payload: Seq[String],
  ): DataFrame = {
    val l = df.alias("l")
    val r = lut.alias("r")
    val cond = keys
      .map { case (a, b) => col(s"l.$a") <=> col(s"r.$b") }
      .reduce(_ && _)
    l.join(broadcast(r), cond, "left")
      .select(Seq(col("l.*")) ++ payload.map(p => col(s"r.$p")): _*)
  }

  /** EFO-map application in the reference's shape: distinct (label, id)
    * pairs exist in `mappingLut(diseaseFromSource, diseaseFromSourceId,
    * diseaseFromSourceMappedId)`; evidence rows pick up
    * `diseaseFromSourceMappedId` via null-safe match on both keys.
    */
  def addEfoMapping(evidence: DataFrame, mappingLut: DataFrame): DataFrame =
    nullSafeLeftJoin(
      evidence,
      mappingLut,
      Seq("diseaseFromSource" -> "diseaseFromSource", "diseaseFromSourceId" -> "diseaseFromSourceId"),
      Seq("diseaseFromSourceMappedId"),
    )
}
