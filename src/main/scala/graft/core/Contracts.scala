package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Output-schema contracts — the engine-side counterpart of the
  * reference's post-hoc JSON-Schema validation (`opentargets_validator`
  * run by every Snakefile rule, `Snakefile:110` et al.; SURVEY.md §5.1).
  *
  * The reference validates serialized JSON after the fact; here the same
  * contract is enforced on the DataFrame schema BEFORE the write — plan
  * metadata only, no data pass. The VALUE half of the validation
  * (required fields, enums, patterns, nested-member shapes, counted per
  * row) is [[Qc.EvidenceContract]] / [[Qc.validateEvidence]].
  */
object Contracts {

  final case class ContractViolation(msg: String) extends RuntimeException(msg)

  /** Field-by-field subset check: every declared field must exist with
    * the declared type (nested structs/arrays compared structurally;
    * nullability is advisory in parquet and ignored, matching the
    * validator's behavior on optional fields).
    */
  def assertConforms(df: DataFrame, contract: StructType): Unit = {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    def compare(path: String, expected: DataType, actual: DataType): Unit =
      (expected, actual) match {
        case (e: StructType, a: StructType) =>
          e.fields.foreach { ef =>
            a.fields.find(_.name == ef.name) match {
              case None => problems += s"$path.${ef.name}: missing"
              case Some(af) => compare(s"$path.${ef.name}", ef.dataType, af.dataType)
            }
          }
        case (ArrayType(e, _), ArrayType(a, _)) => compare(s"$path[]", e, a)
        case (e, a) if e != a => problems += s"$path: expected ${e.simpleString}, got ${a.simpleString}"
        case _ =>
      }
    compare("$", contract, df.schema)
    if (problems.nonEmpty)
      throw ContractViolation(s"schema contract violations: ${problems.mkString("; ")}")
  }

  /** The recurring evidence-string core (SURVEY.md §1.1 / FIXTURES.md
    * B10): fields every parser output carries.
    */
  val evidenceCore: StructType = StructType(Seq(
    StructField("datasourceId", org.apache.spark.sql.types.StringType),
    StructField("targetFromSourceId", org.apache.spark.sql.types.StringType),
  ))

  /** Required-field nullness check (one data pass, all fields at once). */
  def assertNoNulls(df: DataFrame, fields: Seq[String]): Unit =
    Qc.assertAll(df, fields.map(f => s"null_$f" -> df.col(f).isNull))
}
