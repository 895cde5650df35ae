package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the entity-resolution core behind
  * q_entity_match, factored out so the batch query and the streaming
  * serve path share one definition.
  *
  * Scale shape: candidates come from an equi-join on the blocking key
  * (turning n² all-pairs into Σ block²), scoring is the codegen'd
  * [[graft.functions.JaroWinkler]] kernel (DuckDB-exact semantics), and
  * the per-probe argmax compiles to WindowGroupLimit. Determinism: ties
  * break on (sim desc, roster id asc).
  */
object Linkage {

  /** Best roster match per probe row: (d_key, d_name, matched_key, sim),
    * probes with no in-block candidate at `minSim` are absent. The
    * blocking key is the last `blockLen` characters — callers pick a
    * suffix their dirt model leaves intact (q_entity_match's typo
    * classes all preserve the numeric tail).
    */
  def bestMatch(
      probes: DataFrame,
      probeId: String,
      probeName: String,
      roster: DataFrame,
      rosterId: String,
      rosterName: String,
      blockLen: Int = 4,
      minSim: Double = 0.85,
  ): DataFrame = {
    val p = probes.select(col(probeId).as("d_key"), col(probeName).as("d_name"),
      right(col(probeName), lit(blockLen)).as("blk"))
    val r = roster.select(col(rosterId).as("matched_key"), col(rosterName).as("r_name"),
      right(col(rosterName), lit(blockLen)).as("blk"))
    val w = Window.partitionBy(col("d_key")).orderBy(col("sim").desc, col("matched_key"))
    p.join(r, Seq("blk"))
      .withColumn("sim", graft.functions.GraftFunctions.jaroWinkler(col("d_name"), col("r_name")))
      .filter(col("sim") >= minSim)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("d_key"), col("d_name"), col("matched_key"), round(col("sim"), 6).as("sim"))
  }
}
