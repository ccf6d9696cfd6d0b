package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the k-function MinHash signature of an
  * in-row shingle-hash set.
  *
  * h_i(x) = (a_i * (x mod p) + b_i) mod p with p = 2^31-1 and a_i, b_i derived
  * from i by the splitmix64 finalizer — deterministic across
  * runs/partitions, pairwise independent across i (coefficients linear in
  * i would make every minimum depend on one argmin event and collapse the
  * banded-LSH false-negative bound from (1-J^r)^b to ~(1-J)).
  * The input hashes arrive as raw 64-bit values (word_shingle_hashes keeps
  * them raw so the downstream exact-Jaccard verification compares in a
  * 2^64 space); the permutation's mod-p reduction happens here, where the
  * algebra needs it. a_i, (x mod p) < 2^31 keeps the product < 2^62: no
  * long overflow.
  *
  * Computed in-row over the `word_shingle_hashes` array: together they
  * replace the explode + groupBy(aggregator) pass — the signature never
  * shuffles as raw shingles, only as one 1 KB array per document, and at
  * 100 TB not even that: banding projects it to 64 ints before any
  * exchange. An empty input array yields an empty signature (the operator
  * filters shingle-less docs out first).
  */
case class MinHashSig(child: Expression, numHashes: Int, prime: Long)
    extends UnaryExpression {

  require(numHashes > 0, s"minhash_sig k must be positive, got $numHashes")
  // the no-overflow argument (a_i, x mod p < p; product < p^2 <= 2^62)
  // needs p < 2^31 — a larger prime would wrap a_i * x in silence and
  // produce deterministic-garbage signatures
  require(prime > 1 && prime <= 0x7FFFFFFFL,
    s"minhash_sig prime must be in (1, 2^31-1], got $prime")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires an array<bigint> argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(xs: Any): Any =
    MinHashSig.compute(xs.asInstanceOf[ArrayData], numHashes, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $numHashes, ${prime}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** splitmix64 finalizer: high-quality 64-bit mix of the seed. */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // coefficient tables per (numHashes, prime) — tiny, computed once per JVM
  private val coeffs =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  private def coefficients(k: Int, p: Long): (Array[Long], Array[Long]) =
    // a in [1, p-1] (nonzero so h_i is a permutation), b in [0, p-1]
    coeffs.computeIfAbsent((k, p), _ =>
      (Array.tabulate(k)(i => (mix(2L * i + 1) & Long.MaxValue) % (p - 1) + 1),
        Array.tabulate(k)(i => (mix(2L * i + 2) & Long.MaxValue) % p)))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(xs: ArrayData, numHashes: Int, prime: Long): ArrayData = {
    val (as, bs) = coefficients(numHashes, prime)
    val n = xs.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = java.lang.Math.floorMod(xs.getLong(j), prime)
      var i = 0
      while (i < numHashes) {
        val h = (as(i) * x + bs(i)) % prime
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("minhash_sig")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSig].getCanonicalName,
    null,
    "minhash_sig",
    "_FUNC_(xs, k, p) - k-function MinHash signature of the hash set xs under prime p.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "minhash_sig expects exactly 3 arguments")
    def constLong(e: Expression, what: String): Long = {
      require(e.foldable, s"minhash_sig $what must be a constant, got ${e.sql}")
      e.eval() match {
        case v: java.lang.Number => v.longValue()
        case other => throw new IllegalArgumentException(
          s"minhash_sig $what must be an integer, got $other")
      }
    }
    val k = constLong(children(1), "k")
    // reject instead of truncating: k = 2^32+64 silently becoming 64
    // would compute a wrong-but-plausible signature with no error
    require(k >= 1 && k <= Int.MaxValue,
      s"minhash_sig k must be in [1, ${Int.MaxValue}], got $k")
    MinHashSig(
      children.head,
      k.toInt,
      constLong(children(2), "prime"))
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
