package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (extension — no reference
  * analogue; the pre-ingest gate a large pipeline runs before trusting
  * a drop of new data). All constraints compile into ONE aggregation
  * pass over the frame — a single job, no shuffle beyond the final
  * 1-row reduce — so validating a 100 TB table costs one scan
  * regardless of how many constraints are declared. `Unique` is the
  * exception by nature: distinct-counting needs its own aggregation,
  * so it contributes a second map-side-combined pass.
  */
object DataQuality {

  sealed trait Constraint {
    /** Column name of this constraint's violation count in the report. */
    def name: String
  }
  /** Rows where `col` is null. */
  final case class NotNull(col: String) extends Constraint {
    def name = s"null_$col"
  }
  /** Rows where `col` is non-null and outside [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    def name = s"range_$col"
  }
  /** Rows where `col` is non-null and not in `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Constraint {
    def name = s"domain_$col"
  }
  /** Excess rows beyond one per distinct (cols) tuple. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name = s"dup_${cols.mkString("_")}"
  }

  private def violation(c: Constraint): Option[Column] = c match {
    case NotNull(f) =>
      Some(sum(when(col(f).isNull, 1L).otherwise(0L)))
    case InRange(f, lo, hi) =>
      Some(sum(when(col(f).isNotNull && (col(f) < lo || col(f) > hi), 1L).otherwise(0L)))
    case InSet(f, vs) =>
      Some(sum(when(col(f).isNotNull && !col(f).isin(vs: _*), 1L).otherwise(0L)))
    case Unique(_) => None // needs its own aggregation; handled below
  }

  /** One wide report row: `n_rows` plus one violation-count column per
    * constraint (named by `Constraint.name`). A frame passes when every
    * violation column is 0.
    */
  def report(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "declare at least one constraint")
    // coalesce to 0: sum() over an EMPTY frame is NULL, and a vacuously
    // clean batch must report zero violations — a gate written as
    // `col(name) === 0` would otherwise read NULL and treat the empty
    // batch as indeterminate/failing
    val scalar = constraints.flatMap(c => violation(c).map(v => coalesce(v, lit(0L)).as(c.name)))
    val aggCols = count(lit(1)).as("n_rows") +: scalar
    val base = df.agg(aggCols.head, aggCols.tail: _*)
    constraints.collect { case u: Unique =>
      // duplicates = rows minus distinct key tuples; two-level hash-agg
      // (map-side partial on the key) — never a window or a sort
      val dups = df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as(u.name))
      dups
    }.foldLeft(base)(_ crossJoin _)
  }

  /** True iff every declared constraint has zero violations. */
  def passes(df: DataFrame, constraints: Seq[Constraint]): Boolean = {
    val row = report(df, constraints).collect().head
    constraints.forall(c => row.getAs[Long](c.name) == 0L)
  }
}
