package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the constraint/expectation
  * gate (the public Delta CHECK-constraint / Great-Expectations idea)
  * a pipeline runs against every batch before publishing it: each
  * rule states a property, the engine reports violation counts, and a
  * caller quarantines or aborts on non-zero rows (composing with the
  * T4 quarantine path in [[Clean]]).
  *
  * Execution, not iteration, is the design point at 100 TB: every
  * ROW-level rule (not-null, range, set membership, regex, arbitrary
  * predicate) compiles to one conditional-count aggregate, and ALL of
  * them run in a SINGLE scan of the batch — adding a rule adds a
  * counter, not a pass. Table-level rules cost what they must: key
  * uniqueness is one distinct-count in the same aggregate; referential
  * integrity is one left-anti join against the parent keys (the q04
  * shape — parent pruned to its key column, broadcast when small).
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Row rule: `predicate` must hold on every row ("expect"). Nulls in
    * the predicate count as violations (three-valued logic made
    * strict: a rule that cannot be proven true failed).
    */
  final case class Expect(name: String, predicate: Column) extends Rule

  /** Key rule: `cols` are unique; violations = rows beyond the first
    * of each duplicate key group (n_rows − n_distinct_keys).
    */
  final case class UniqueKey(name: String, cols: Seq[String]) extends Rule

  /** Referential rule: every non-null `cols` tuple exists in
    * `parent`'s `parentCols`; violations = orphan child rows.
    */
  final case class RefIntegrity(name: String, cols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]) extends Rule

  def notNull(name: String, c: String): Rule = Expect(name, col(c).isNotNull)
  def between(name: String, c: String, lo: Column, hi: Column): Rule =
    Expect(name, col(c) >= lo && col(c) <= hi)
  def inSet(name: String, c: String, values: Seq[Any]): Rule =
    Expect(name, col(c).isin(values: _*))
  def matches(name: String, c: String, regex: String): Rule =
    Expect(name, col(c).rlike(regex))

  /** Violation report: one row per rule — (rule, n_violations,
    * n_rows). All row rules + key rules share ONE scan; each
    * referential rule adds one anti-join job.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val expects = rules.collect { case r: Expect => r }
    val uniques = rules.collect { case r: UniqueKey => r }
    val refs = rules.collect { case r: RefIntegrity => r }
    val spark = df.sparkSession
    import spark.implicits._

    val scanAggs =
      expects.map(r => sum(when(coalesce(r.predicate, lit(false)),
        0L).otherwise(1L)).as(s"__e__${r.name}")) ++
      uniques.map(r => (count(lit(1)) - count_distinct(
        struct(r.cols.map(col): _*))).as(s"__u__${r.name}"))
    val scanned: Seq[(String, Long)] =
      if (scanAggs.isEmpty) Nil
      else {
        val row = df.agg(count(lit(1)).as("__rows"),
          scanAggs: _*).head()
        val total = row.getLong(0)
        (expects.map(_.name) ++ uniques.map(_.name)).zipWithIndex.map {
          case (n, i) => n -> (if (row.isNullAt(i + 1)) 0L
            else row.getLong(i + 1))
        } :+ ("__rows" -> total)
      }
    val totalRows = scanned.collectFirst { case ("__rows", n) => n }
      .getOrElse(df.count())
    val refCounts: Seq[(String, Long)] = refs.map { r =>
      val parentKeys = r.parent
        .select(r.parentCols.map(col): _*).na.drop().distinct()
        .toDF(r.cols: _*)
      val orphans = df.select(r.cols.map(col): _*).na.drop("any")
        .join(parentKeys, r.cols, "left_anti").count()
      r.name -> orphans
    }
    val byName = (scanned.filterNot(_._1 == "__rows") ++ refCounts).toMap
    // preserve caller rule order in the report
    rules.map(r => (r.name, byName(r.name), totalRows))
      .toDF("rule", "n_violations", "n_rows")
  }
}
