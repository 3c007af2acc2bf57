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
  /** Rows where `col` is non-null and does not match `regex`
    * (anchored or not — the pattern is passed to `rlike` verbatim).
    * Stay inside the RE2 ∩ Java syntax subset for cross-engine
    * reproducibility (no backrefs, no lookaround).
    */
  final case class MatchesRegex(col: String, regex: String) extends Constraint {
    def name = s"regex_$col"
  }
  /** Referential integrity: rows whose non-null `col` has no match in
    * `dim(dimCol)` — the orphan count. Needs its own job (a left-anti
    * join); the dimension side is a distinct projection, so when the
    * dimension is table-of-dimensions-sized the anti-join broadcasts
    * and the fact side never shuffles.
    */
  final case class ForeignKey(col: String, dim: DataFrame, dimCol: String) extends Constraint {
    def name = s"fk_$col"
  }

  private def violation(c: Constraint): Option[Column] = c match {
    case NotNull(f) =>
      Some(sum(when(col(f).isNull, 1L).otherwise(0L)))
    case InRange(f, lo, hi) =>
      Some(sum(when(col(f).isNotNull && (col(f) < lo || col(f) > hi), 1L).otherwise(0L)))
    case InSet(f, vs) =>
      Some(sum(when(col(f).isNotNull && !col(f).isin(vs: _*), 1L).otherwise(0L)))
    case MatchesRegex(f, rx) =>
      Some(sum(when(col(f).isNotNull && !col(f).rlike(rx), 1L).otherwise(0L)))
    case Unique(_) | ForeignKey(_, _, _) => None // own-job constraints; handled below
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
    constraints.collect {
      case u: Unique =>
        // duplicates = rows minus distinct key tuples; two-level hash-agg
        // (map-side partial on the key) — never a window or a sort
        df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as(u.name))
      case fk: ForeignKey =>
        // orphans = non-null keys with no dimension match; the dim side
        // is a distinct 1-column projection so Spark broadcasts it when
        // dimension-sized and the fact side never shuffles
        df.select(col(fk.col)).filter(col(fk.col).isNotNull)
          .join(fk.dim.select(col(fk.dimCol).as(fk.col)).distinct(),
            Seq(fk.col), "left_anti")
          .agg(count(lit(1)).as(fk.name))
    }.foldLeft(base)(_ crossJoin _)
  }

  /** A constraint's (kind, column) labels for the long-format report. */
  private def labels(c: Constraint): (String, String) = c match {
    case NotNull(f)          => ("not_null", f)
    case InRange(f, _, _)    => ("in_range", f)
    case InSet(f, _)         => ("in_set", f)
    case Unique(cols)        => ("unique", cols.mkString(","))
    case MatchesRegex(f, _)  => ("matches_regex", f)
    case ForeignKey(f, _, _) => ("foreign_key", f)
  }

  /** Multi-table expectation suite in LONG format: one row per declared
    * expectation — `(tbl, expectation, column, violations, total,
    * passed)` — the report a pipeline persists and alerts on. Each
    * table still pays exactly one scan for all its row-level checks
    * (`report`'s single agg pass) plus one job per Unique/ForeignKey;
    * the unpivot runs on the 1-row report, so it is metadata-sized
    * however wide the suite is.
    */
  def suite(tables: Seq[(String, DataFrame, Seq[Constraint])]): DataFrame = {
    require(tables.nonEmpty, "declare at least one table")
    tables.map { case (tbl, df, cs) =>
      val wide = report(df, cs)
      val rows = cs.map { c =>
        val (kind, column) = labels(c)
        struct(lit(kind).as("expectation"), lit(column).as("column"),
          col(c.name).as("violations"))
      }
      wide.select(lit(tbl).as("tbl"), col("n_rows").as("total"),
          explode(array(rows: _*)).as("e"))
        .select(col("tbl"), col("e.expectation").as("expectation"),
          col("e.column").as("column"), col("e.violations").as("violations"),
          col("total"), (col("e.violations") === 0L).as("passed"))
    }.reduce(_ unionByName _)
  }

  /** True iff every declared constraint has zero violations. */
  def passes(df: DataFrame, constraints: Seq[Constraint]): Boolean = {
    val row = report(df, constraints).collect().head
    constraints.forall(c => row.getAs[Long](c.name) == 0L)
  }
}
