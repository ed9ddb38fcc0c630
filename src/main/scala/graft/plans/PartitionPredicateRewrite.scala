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

  /** (ts-attribute exprId → derived partition attributes) pairs, built
    * PER RELATION: a timestamp attribute is only ever paired with a
    * partition column of ITS OWN file relation — a same-named column from
    * another relation in the subtree (e.g. across a join) must never
    * contribute a predicate, and an ordinary data column that merely
    * shares the naming pattern never qualifies. Types are checked on the
    * actual output attribute.
    */
  private def relationPairs(plan: LogicalPlan): Map[ExprId, Seq[(Attribute, Gran)]] =
    plan.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            val partNames = fs.partitionSchema.map(_.name).toSet
            val byName    = lr.output.groupBy(_.name).view.mapValues(_.head)
            lr.output.flatMap { a =>
              a.dataType match {
                case TimestampType =>
                  val cands = Seq(
                    (a.name + DaySuffix, DateType, Day: Gran),
                    (a.name + HourSuffix, StringType, Hour: Gran)
                  ).flatMap { case (n, dt, g) =>
                    byName.get(n).collect {
                      case d if partNames.contains(n) && d.dataType == dt => d -> g
                    }
                  }
                  if (cands.nonEmpty) Some(a.exprId -> cands) else None
                case _ => None
              }
            }
          case _ => Nil
        }
    }.flatten.toMap

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transform {
    case f @ Filter(cond, child) =>
      // only pairs whose BOTH attributes survive to this filter's input
      val visible = AttributeSet(child.output)
      val pairs = relationPairs(child).flatMap { case (ts, cands) =>
        val kept = cands.filter { case (d, _) => visible.contains(d) }
        if (kept.nonEmpty) Some(ts -> kept) else None
      }
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
    * matching TableLayout.daysOf / hoursOf at write time. Evaluated
    * EAGERLY to a literal — otherwise ConstantFolding rewrites the added
    * conjunct and the semanticEquals dedup below stops recognizing it,
    * re-deriving the same predicate every optimizer iteration.
    */
  private def bucketOf(ts: Literal, g: Gran): Expression = {
    val e: Expression = g match {
      case Day  => Cast(ts, DateType, Some(conf.sessionLocalTimeZone))
      case Hour => DateFormatClass(ts, Literal(HourFormat), Some(conf.sessionLocalTimeZone))
    }
    Literal.create(e.eval(null), e.dataType)
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
