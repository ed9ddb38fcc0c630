package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}

/** Hidden-partitioning predicate rewrite (SURVEY.md §4.1/§7.3) — the
  * engine-native analog of Iceberg's transform-aware pruning (reference
  * partitions bronze by `hours(event_timestamp)`, streaming_job.py:37, and
  * relies on time predicates pruning files,
  * design_doc/DataModel_SchemaDesign.md:111).
  *
  * Contract (established by `graft.table.TableLayout.daysPartition` /
  * `hoursPartition`): a DateType partition column named `<ts>_day` holds
  * exactly `to_date(<ts>)`, and a StringType partition column `<ts>_hour`
  * holds `date_format(<ts>, "yyyy-MM-dd-HH")` (fixed-width → lexicographic
  * order is time order), for the TimestampType column `<ts>` in the same
  * relation. Under that invariant, any range/equality predicate on `<ts>`
  * implies one on the derived column:
  *
  *   ts >= T  ⟹  ts_day >= date(T)      ts <  T  ⟹  ts_day <= date(T)
  *   ts =  T  ⟹  ts_day  = date(T)      (same for ts_hour at hour grain)
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

  private val DaySuffix  = "_day"
  private val HourSuffix = "_hour"
  private val HourFormat = "yyyy-MM-dd-HH" // TableLayout.hoursOf — fixed width,
                                           // so lexicographic order == time order
  private val EnabledKey = "spark.graft.hiddenPartitioning.enabled"

  /** Transform granularity for one derived partition column. */
  private sealed trait Gran
  private case object Day  extends Gran
  private case object Hour extends Gran

  /** Eligible PARTITION columns of file relations in the subtree, by name —
    * the rewrite only pairs against these, never against an ordinary data
    * column that merely shares the naming pattern (which could violate the
    * derivation contract and silently drop rows).
    */
  private def partitionCols(plan: LogicalPlan): Map[String, Gran] =
    plan.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.partitionSchema.flatMap { f =>
              if (f.dataType == DateType && f.name.endsWith(DaySuffix)) Some(f.name -> (Day: Gran))
              else if (f.dataType == StringType && f.name.endsWith(HourSuffix)) Some(f.name -> (Hour: Gran))
              else None
            }
          case _ => Nil
        }
    }.flatten.toMap

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transform {
    case f @ Filter(cond, child) =>
      // pair every timestamp attribute with its derived PARTITION column(s)
      val partCols = partitionCols(child)
      val byName = child.output.groupBy(_.name).view.mapValues(_.head)
      val pairs: Map[ExprId, Seq[(Attribute, Gran)]] = child.output.flatMap { a =>
        a.dataType match {
          case TimestampType =>
            val cands = Seq(a.name + DaySuffix, a.name + HourSuffix).flatMap { n =>
              partCols.get(n).flatMap(g => byName.get(n).map(_ -> g))
            }
            if (cands.nonEmpty) Some(a.exprId -> cands) else None
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

  /** The derived-column value for a timestamp literal at the granularity:
    * timestamp→date / date_format both resolve in the session zone,
    * matching TableLayout.daysOf / hoursOf at write time.
    */
  private def bucketOf(ts: Literal, g: Gran): Expression = g match {
    case Day  => Cast(ts, DateType, Some(conf.sessionLocalTimeZone))
    case Hour => DateFormatClass(ts, Literal(HourFormat), Some(conf.sessionLocalTimeZone))
  }

  /** Partition-column predicates implied by one timestamp conjunct.
    * Truncation makes strict bounds inclusive on the bucket (ts > T still
    * admits same-bucket later timestamps).
    */
  private def derive(c: Expression, pairs: Map[ExprId, Seq[(Attribute, Gran)]]): Seq[Expression] = {
    def ge(a: Attribute) = pairs.getOrElse(a.exprId, Nil)
    c match {
      case GreaterThanOrEqual(a: Attribute, l @ Literal(_, TimestampType)) =>
        ge(a).map { case (d, g) => GreaterThanOrEqual(d, bucketOf(l, g)) }
      case GreaterThan(a: Attribute, l @ Literal(_, TimestampType)) =>
        ge(a).map { case (d, g) => GreaterThanOrEqual(d, bucketOf(l, g)) }
      case LessThanOrEqual(a: Attribute, l @ Literal(_, TimestampType)) =>
        ge(a).map { case (d, g) => LessThanOrEqual(d, bucketOf(l, g)) }
      case LessThan(a: Attribute, l @ Literal(_, TimestampType)) =>
        ge(a).map { case (d, g) => LessThanOrEqual(d, bucketOf(l, g)) }
      case EqualTo(a: Attribute, l @ Literal(_, TimestampType)) =>
        ge(a).map { case (d, g) => EqualTo(d, bucketOf(l, g)) }
      // literal-on-left mirrors
      case GreaterThanOrEqual(l @ Literal(_, TimestampType), a: Attribute) =>
        ge(a).map { case (d, g) => LessThanOrEqual(d, bucketOf(l, g)) }
      case GreaterThan(l @ Literal(_, TimestampType), a: Attribute) =>
        ge(a).map { case (d, g) => LessThanOrEqual(d, bucketOf(l, g)) }
      case LessThanOrEqual(l @ Literal(_, TimestampType), a: Attribute) =>
        ge(a).map { case (d, g) => GreaterThanOrEqual(d, bucketOf(l, g)) }
      case LessThan(l @ Literal(_, TimestampType), a: Attribute) =>
        ge(a).map { case (d, g) => GreaterThanOrEqual(d, bucketOf(l, g)) }
      case EqualTo(l @ Literal(_, TimestampType), a: Attribute) =>
        ge(a).map { case (d, g) => EqualTo(d, bucketOf(l, g)) }
      case _ => Nil
    }
  }
}
