package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualNullSafe, Expression, GreaterThan, If, IsNotNull, IsNull, Literal, Not, Or}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{BooleanType, DataType, StructField, StructType}

/** Hash-friendly `max_by` over a two-part selection key: returns the
  * payload of the row whose (key1, key2) pair is lexicographically largest
  * — exactly `max_by(struct(payloads…), struct(key1, key2))`, but with the
  * aggregation buffer FLATTENED to scalar slots (marker boolean, key1,
  * key2, one slot per payload field).
  *
  * Why it exists (guide §4 / optimization round 2): the built-in `MaxBy`
  * keeps the ordering STRUCT itself in its buffer, and a struct is not an
  * UnsafeRow-mutable type, so HashAggregateExec is ineligible and the
  * planner falls back to SortAggregate — a full local sort of the
  * aggregate's INPUT below the exchange and a second one above it. For a
  * corpus-scale argmax (LTTB's per-bucket triangle selection, OHLC's
  * open/close, latest-per-key rollups) that sort pair is the dominant
  * cost. With every buffer slot a mutable scalar (longs, doubles,
  * decimals — DecimalType is UnsafeRow-mutable at every precision) the
  * whole aggregate stays in whole-stage-codegen hash aggregation, spilling
  * through HashAggregateExec's own memory-based sort fallback only under
  * real pressure. (A TypedImperativeAggregate form was considered and
  * rejected: ObjectHashAggregateExec falls back to sort-based aggregation
  * past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` — 128
  * groups — which any corpus-scale bucket count exceeds immediately.)
  *
  * Semantics pinned to `max_by(struct(…), struct(key1, key2))`:
  *  - the ordering pair compares lexicographically with null fields FIRST
  *    (smallest), the struct comparator's rule — gt()/EqualNullSafe below
  *    spell that out per field;
  *  - the first row always enters the buffer (a struct ordering is never
  *    null, whatever its fields), hence the explicit `set` marker;
  *  - ties on the full pair keep the first value seen — deterministic
  *    only when the pair is unique per group, same contract as max_by;
  *  - an empty group evaluates to null.
  */
case class ArgMaxKey(
    key1: Expression,
    key2: Expression,
    payloads: Seq[Expression],
    fieldNames: Seq[String])
  extends DeclarativeAggregate {

  require(payloads.nonEmpty, "arg_max_key needs at least one payload")
  require(fieldNames.isEmpty || fieldNames.length == payloads.length,
    "arg_max_key: fieldNames must be empty (scalar) or name every payload")

  /** Empty fieldNames ⇒ single scalar payload; named ⇒ struct output. */
  private def structOut: Boolean = fieldNames.nonEmpty

  override def children: Seq[Expression] = Seq(key1, key2) ++ payloads

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxKey =
    copy(key1 = newChildren(0), key2 = newChildren(1),
      payloads = newChildren.drop(2).toSeq)

  override def checkInputDataTypes(): TypeCheckResult = {
    val k1 = TypeUtils.checkForOrderingExpr(key1.dataType, prettyName)
    if (k1 != TypeCheckResult.TypeCheckSuccess) k1
    else TypeUtils.checkForOrderingExpr(key2.dataType, prettyName)
  }

  override def dataType: DataType =
    if (structOut)
      StructType(fieldNames.zip(payloads).map { case (n, p) =>
        StructField(n, p.dataType, nullable = true)
      })
    else payloads.head.dataType

  override def nullable: Boolean = true
  override def prettyName: String = "arg_max_key"

  private lazy val bSet = AttributeReference("set", BooleanType, nullable = false)()
  private lazy val bK1 = AttributeReference("k1", key1.dataType)()
  private lazy val bK2 = AttributeReference("k2", key2.dataType)()
  private lazy val bPs = payloads.zipWithIndex.map { case (p, i) =>
    AttributeReference(s"p$i", p.dataType)()
  }

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bSet, bK1, bK2) ++ bPs

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(false), Literal.create(null, key1.dataType),
      Literal.create(null, key2.dataType)) ++
      payloads.map(p => Literal.create(null, p.dataType))

  /** a > b under the struct comparator's field rule: null sorts FIRST. */
  private def gt(a: Expression, b: Expression): Expression =
    Or(And(IsNotNull(a), IsNull(b)),
      And(And(IsNotNull(a), IsNotNull(b)), GreaterThan(a, b)))

  /** (nk1, nk2) strictly above the buffer pair, or the buffer is empty. */
  private def take(set: Expression, nk1: Expression, nk2: Expression,
      ok1: Expression, ok2: Expression): Expression =
    Or(Not(set),
      Or(gt(nk1, ok1), And(EqualNullSafe(nk1, ok1), gt(nk2, ok2))))

  override lazy val updateExpressions: Seq[Expression] = {
    val t = take(bSet, key1, key2, bK1, bK2)
    Seq(Literal(true), If(t, key1, bK1), If(t, key2, bK2)) ++
      payloads.zip(bPs).map { case (p, b) => If(t, p, b) }
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val t = And(bSet.right, take(bSet.left, bK1.right, bK2.right, bK1.left, bK2.left))
    Seq(Or(bSet.left, bSet.right),
      If(t, bK1.right, bK1.left), If(t, bK2.right, bK2.left)) ++
      bPs.map(b => If(t, b.right, b.left))
  }

  override lazy val evaluateExpression: Expression =
    if (structOut)
      If(bSet,
        CreateNamedStruct(fieldNames.zip(bPs).flatMap { case (n, b) =>
          Seq(Literal(n), b: Expression)
        }),
        Literal.create(null, dataType))
    else bPs.head // initialized null; stays null until the first row lands
}

object ArgMaxKey {
  import org.apache.spark.sql.{Column, graftbridge}

  /** `max_by(struct(fields…), struct(k1, k2))` — struct payload form. */
  def structOf(k1: Column, k2: Column, fields: (String, Column)*): Column =
    graftbridge.column(ArgMaxKey(
      graftbridge.expression(k1), graftbridge.expression(k2),
      fields.map(f => graftbridge.expression(f._2)).toSeq,
      fields.map(_._1).toSeq).toAggregateExpression())

  /** `max_by(payload, struct(k1, k2))` — scalar payload form. For an
    * argMIN, pass negated keys (every caller's keys are numeric). */
  def scalar(k1: Column, k2: Column, payload: Column): Column =
    graftbridge.column(ArgMaxKey(
      graftbridge.expression(k1), graftbridge.expression(k2),
      Seq(graftbridge.expression(payload)), Nil).toAggregateExpression())
}
