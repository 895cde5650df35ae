package graft.core

import org.apache.spark.sql.DataFrame

/** Set combinators — SURVEY.md §2.7 (U1, U2).
  *
  * U1 is the reference's multi-source combinator:
  * `reduce(unionByName(allowMissingColumns=True))` folded over N parser
  * outputs (`GeneBurden.py:55-56`, `TargetSafety.py:68-70`,
  * `ChEMBL.py:65-68`, …).
  *
  * Scale note: union is metadata-only in Spark (no shuffle); each input's
  * partitioning is preserved. Missing columns materialize as null literals
  * in the plan — free at scan time because Catalyst prunes them per-branch.
  */
object Union {

  /** U1: schema-tolerant N-way union. */
  def unionByNameAll(dfs: Seq[DataFrame], allowMissingColumns: Boolean = true): DataFrame = {
    require(dfs.nonEmpty, "unionByNameAll of zero DataFrames")
    dfs.reduce(_.unionByName(_, allowMissingColumns))
  }

  /** U2: positional union (schemas already identical — `encore_parser.py:542`). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionAll of zero DataFrames")
    dfs.reduce(_.union(_))
  }
}
