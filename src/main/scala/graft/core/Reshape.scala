package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators — SURVEY.md §2.8 (R1–R11).
  *
  * The headline op is R3: melt/unpivot of wide matrices whose column names
  * are data (DepMap gene×cell-line matrices with ~19k gene columns,
  * `Essentiality.py:210-247`; Encore per-cell-line stat triplets,
  * `encore_parser.py:137-170`).
  *
  * Scale note: the reference used `stack(n, ...)`, a giant n-branch
  * projection. We use `Dataset.unpivot` (Spark ≥3.4), which plans a single
  * `Expand` node — one pass, no shuffle, codegen-friendly, and the 19k-col
  * case stays a single operator instead of a 19k-way expression tree.
  */
object Reshape {

  /** R3: melt a wide matrix — id columns stay, every other column becomes
    * (varName, valName) rows. Column list is discovered at runtime from the
    * schema (the reference's "column names are data" pattern).
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      varName: String = "variable",
      valName: String = "value",
      valueCols: Option[Seq[String]] = None,
  ): DataFrame = {
    val values = valueCols.getOrElse(df.columns.filterNot(idCols.contains).toSeq)
    df.unpivot(idCols.map(col).toArray, values.map(col).toArray, varName, valName)
  }

  /** R3 (Encore variant): wide columns named `<entity>_<metric>` melt into
    * one row per entity with one column per metric. E.g. cell-line stat
    * triplets `SIDMx_CSIDy_{pval,fdr,lfc}` (`encore_parser.py:137-170`).
    * Implemented as melt → split variable → pivot-free regroup via
    * `groupBy(id, entity).agg(first(when(metric==m, value)))`.
    */
  def meltMetricTriplets(
      df: DataFrame,
      idCols: Seq[String],
      metrics: Seq[String],
      entityName: String = "entity",
  ): DataFrame = {
    val molten = melt(df, idCols)
    // variable = "<entity>_<metric>" where metric is a known suffix
    val metricExpr = metrics
      .foldLeft(lit(null).cast("string")) { (acc, m) =>
        when(col("variable").endsWith("_" + m), lit(m)).otherwise(acc)
      }
    val entityExpr = metrics
      .foldLeft(col("variable")) { (acc, m) =>
        regexp_replace(acc, "_" + m + "$", "")
      }
    def metricCol(m: String): Column =
      first(when(col("__metric") === m, col("value")), ignoreNulls = true).as(m)
    molten
      .withColumn("__metric", metricExpr)
      .withColumn(entityName, entityExpr)
      .filter(col("__metric").isNotNull)
      .groupBy((idCols :+ entityName).map(col): _*)
      .agg(metricCol(metrics.head), metrics.tail.map(metricCol): _*)
  }

  /** R9: zip two arrays, padding the shorter second array by reusing its
    * first element (reference UDF `zip_alterations_with_type`,
    * `cancerBiomarkers.py:62-65,318-331`) — expressed natively with
    * indexed `transform` + `coalesce`, no UDF.
    */
  def zipWithPad(values: Column, types: Column): Column =
    transform(
      values,
      // `get` is 0-based and null-on-out-of-bounds (ANSI-safe, unlike
      // element_at which throws under Spark 4's default ANSI mode).
      (v, i) => struct(v.as("value"), coalesce(get(types, i), get(types, lit(0))).as("type")),
    )

  /** Static-arity [[zipWithPad]]: when the two sides are known column
    * lists (the cancerBiomarkers case — fixed alteration/type columns),
    * unroll the lambda into a plain `array(struct(...))` projection. The
    * `transform` variant is evaluated interpreted per row (HOFs don't join
    * whole-stage codegen); this one stays inside codegen.
    */
  def zipWithPadStatic(values: Seq[Column], types: Seq[Column]): Column = {
    require(types.nonEmpty, "zipWithPadStatic needs at least one type column")
    array(values.zipWithIndex.map { case (v, i) =>
      val ty = if (i < types.size) coalesce(types(i), types.head) else types.head
      struct(v.as("value"), ty.as("type"))
    }: _*)
  }

  /** A7: empty collection → null repair (`TargetSafety.py:78-101`,
    * `cancerBiomarkers.py:281-287`).
    */
  def emptyArrayToNull(c: Column): Column =
    when(size(c) =!= 0, c)

  /** R10: split a delimited scalar into named fields
    * (`Pharmacogenetics.py:117-129`: genotypeId → chr/pos/ref/alt).
    */
  def splitToStruct(c: Column, sep: String, names: Seq[String]): Column = {
    val parts = split(c, sep)
    // get(), not getItem(): missing trailing segments become null fields
    // instead of an ANSI out-of-bounds error.
    struct(names.zipWithIndex.map { case (n, i) => get(parts, lit(i)).as(n) }: _*)
  }
}
