package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DataType

/** As-of join as a FIRST-CLASS logical operator (SURVEY.md §2.3 J3-J5;
  * custom-operator ladder rung (c): LogicalPlan + Rule registered through
  * SparkSessionExtensions).
  *
  * `AsOfJoinPlan(left, right, key, ts, tiebreak, rightVal, asofName)`
  * declares "left enriched with the latest right value at-or-before each
  * left row" without committing to a physical shape. `AsOfJoinRewrite`
  * (injected as an optimizer rule by [[GraftExtensions]]) expands it into
  * the single-shuffle merge-sweep plan — union of the two sides tagged
  * with a side discriminator, one window partitioned by key ordered by
  * (ts, side, tiebreak) carrying the last non-null right value, filter
  * back to left rows — i.e. exactly the shape of
  * `graft.operators.AsOf.asOfBackward`, but chosen by the optimizer
  * instead of hand-written at every call site. Downstream Catalyst rules
  * (column pruning, pushdown) then run over the expansion as usual.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    key: String, ts: String, tiebreak: String,
    rightVal: String, asofName: String,
    // constructor field (not a derived val): node copies during
    // optimization must keep the same exprId or parent references to the
    // as-of column would orphan.
    asofAttr: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr

  /** the as-of column is born here, not taken from a child. */
  override def producedAttributes: AttributeSet = AttributeSet(asofAttr)

  /** consume everything from both children so ColumnPruning doesn't strip
    * the columns the rewrite needs before it runs; pruning re-runs over
    * the expansion within the same fixed-point batch afterwards. */
  override def references: AttributeSet = AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  def apply(left: LogicalPlan, right: LogicalPlan,
      key: String, ts: String, tiebreak: String,
      rightVal: String, asofName: String): AsOfJoinPlan = {
    val rvType: DataType = right.output.find(_.name == rightVal)
      .map(_.dataType)
      .getOrElse(org.apache.spark.sql.types.DoubleType)
    AsOfJoinPlan(left, right, key, ts, tiebreak, rightVal, asofName,
      AttributeReference(asofName, rvType, nullable = true)())
  }
}

object AsOfJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node @ AsOfJoinPlan(left, right, key, ts, tiebreak, rightVal, _, _) =>
      def attrOf(p: LogicalPlan, name: String): Attribute =
        p.output.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(
            s"as-of join: column $name missing from ${p.output.map(_.name)}"))

      val rv = attrOf(right, rightVal)

      // left side: payload ++ (__side = 1, __rv = null)
      val sideL = Alias(Literal(1), "__side")()
      val rvL = Alias(Cast(Literal(null), rv.dataType), "__rv")()
      val l2 = Project(left.output.map(a => a: NamedExpression) :+ sideL :+ rvL, left)

      // right side, in l2's column order: key/ts/tiebreak from right,
      // every other left column null-padded, then (__side = 0, __rv).
      val joinCols = Set(key, ts, tiebreak)
      val rCols: Seq[NamedExpression] = left.output.map { a =>
        if (joinCols.contains(a.name))
          Alias(Cast(attrOf(right, a.name), a.dataType), a.name)()
        else Alias(Cast(Literal(null), a.dataType), a.name)()
      }
      val r2 = Project(
        rCols :+ Alias(Literal(0), "__side")() :+ Alias(rv, "__rv")(), right)

      val unioned = Union(Seq(l2, r2))
      val uOut = unioned.output
      def uAttr(name: String): Attribute = uOut.find(_.name == name).get

      val orderSpec = Seq(
        SortOrder(uAttr(ts), Ascending),
        SortOrder(uAttr("__side"), Ascending), // right rows first on ts ties
        SortOrder(uAttr(tiebreak), Ascending))
      val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1))
      val lastRv = WindowExpression(
        AggregateExpression(Last(uAttr("__rv"), ignoreNulls = true), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(uAttr(key)), orderSpec, frame))
      // reuse the node's advertised exprId so parents stay resolved
      val asofAlias = Alias(lastRv, node.asofName)(exprId = node.asofAttr.exprId)
      val win = Window(Seq(asofAlias), Seq(uAttr(key)), orderSpec, unioned)

      val filtered = Filter(EqualTo(uAttr("__side"), Literal(1)), win)
      // project back to the node's output: left payload (same exprIds
      // flow through the union's first branch) + the as-of alias attr
      val outCols: Seq[NamedExpression] =
        node.output.init.map(a =>
          uOut.find(_.exprId == a.exprId)
            .orElse(uOut.find(_.name == a.name)).get: NamedExpression) :+
          asofAlias.toAttribute
      Project(outCols, filtered)
  }
}
