package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Hidden-partitioning predicate rewrite (SURVEY.md §4.1/§7.3) — the
  * engine-native analog of Iceberg's transform-aware pruning (reference
  * partitions bronze by `hours(event_timestamp)`, streaming_job.py:37, and
  * relies on time predicates pruning files,
  * design_doc/DataModel_SchemaDesign.md:111).
  *
  * Contract (established by `graft.table.TableLayout.daysPartition`): a
  * DateType column named `<ts>_day` holds exactly `to_date(<ts>)` for the
  * TimestampType column `<ts>` in the same relation. Under that invariant,
  * any range/equality predicate on `<ts>` implies one on `<ts>_day`:
  *
  *   ts >= T  ⟹  ts_day >= date(T)      ts <  T  ⟹  ts_day <= date(T)
  *   ts =  T  ⟹  ts_day  = date(T)
  *
  * The rule conjoins the implied predicate, and Spark's built-in
  * `PruneFileSourcePartitions` then prunes partition directories — queries
  * written against the raw timestamp get partition pruning "for free",
  * which is the entire point of hidden partitioning. The added conjunct is
  * redundant for correctness (a superset range), so results are unchanged.
  *
  * Safety gating: the rule pairs a timestamp column ONLY with a `<ts>_day`
  * column that is an actual PARTITION column of a file relation — a data
  * column that merely matches the naming pattern never triggers it. The
  * `to_date` contract is evaluated in the session time zone, so tables
  * must be written and read under the same zone (this engine pins UTC).
  * Kill switch: `spark.graft.hiddenPartitioning.enabled=false`.
  *
  * Injected through `SparkSessionExtensions.injectOptimizerRule` (runs in
  * the operator-optimization batch, before partition pruning).
  */
object PartitionPredicateRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Suffix = "_day"
  private val EnabledKey = "spark.graft.hiddenPartitioning.enabled"

  /** DateType PARTITION columns of file relations in the subtree — the
    * rewrite only pairs against these, never against an ordinary data
    * column that merely shares the naming pattern (which could violate the
    * to_date contract and silently drop rows).
    */
  private def partitionDateCols(plan: LogicalPlan): Set[String] =
    plan.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.partitionSchema.filter(_.dataType == DateType).map(_.name)
          case _ => Seq.empty[String]
        }
    }.flatten.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transform {
    case f @ Filter(cond, child) =>
      // pair every timestamp attribute with its derived day PARTITION column
      val partCols = partitionDateCols(child)
      val byName = child.output.groupBy(_.name).view.mapValues(_.head)
      val pairs: Map[ExprId, Attribute] = child.output.flatMap { a =>
        a.dataType match {
          case TimestampType if partCols.contains(a.name + Suffix) =>
            byName.get(a.name + Suffix).collect {
              case d if d.dataType == DateType => a.exprId -> d
            }
          case _ => None
        }
      }.toMap
      if (pairs.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val implied = conjuncts.flatMap(c => derive(c, pairs))
          .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
        if (implied.isEmpty) f
        else Filter((conjuncts ++ implied).reduce(And), child)
      }
    }
  }

  // timestamp→date needs the session zone; matches TableLayout.daysOf
  // (to_date), which also resolves in session time
  private def dayOf(ts: Literal): Expression =
    Cast(ts, DateType, Some(conf.sessionLocalTimeZone))

  /** The day-column predicate implied by one timestamp conjunct, if any. */
  private def derive(c: Expression, pairs: Map[ExprId, Attribute]): Option[Expression] = c match {
    case GreaterThanOrEqual(a: Attribute, l @ Literal(_, TimestampType)) =>
      pairs.get(a.exprId).map(d => GreaterThanOrEqual(d, dayOf(l)))
    case GreaterThan(a: Attribute, l @ Literal(_, TimestampType)) =>
      pairs.get(a.exprId).map(d => GreaterThanOrEqual(d, dayOf(l)))
    case LessThanOrEqual(a: Attribute, l @ Literal(_, TimestampType)) =>
      pairs.get(a.exprId).map(d => LessThanOrEqual(d, dayOf(l)))
    case LessThan(a: Attribute, l @ Literal(_, TimestampType)) =>
      pairs.get(a.exprId).map(d => LessThanOrEqual(d, dayOf(l)))
    case EqualTo(a: Attribute, l @ Literal(_, TimestampType)) =>
      pairs.get(a.exprId).map(d => EqualTo(d, dayOf(l)))
    // literal-on-left mirrors
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), a: Attribute) =>
      pairs.get(a.exprId).map(d => LessThanOrEqual(d, dayOf(l)))
    case GreaterThan(l @ Literal(_, TimestampType), a: Attribute) =>
      pairs.get(a.exprId).map(d => LessThanOrEqual(d, dayOf(l)))
    case LessThanOrEqual(l @ Literal(_, TimestampType), a: Attribute) =>
      pairs.get(a.exprId).map(d => GreaterThanOrEqual(d, dayOf(l)))
    case LessThan(l @ Literal(_, TimestampType), a: Attribute) =>
      pairs.get(a.exprId).map(d => GreaterThanOrEqual(d, dayOf(l)))
    case EqualTo(l @ Literal(_, TimestampType), a: Attribute) =>
      pairs.get(a.exprId).map(d => EqualTo(d, dayOf(l)))
    case _ => None
  }
}
