package graft.similarity

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Primitive loop kernels callable from generated code. */
object VecOps {
  /** Left-to-right double-accumulated dot product over float arrays —
    * the same fold order as `aggregate(zip_with(...))`, ~100× faster
    * (no per-element boxing, stays inside whole-stage codegen). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** float × double variant (embedding against a double-typed centroid). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** double × float variant. */
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  /** double × double variant. */
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** int × int variant (quantized vectors): exact integer products
    * accumulated in double — int8-range values can never overflow it. */
  def dotII(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toDouble * b.getInt(i).toDouble
      i += 1
    }
    acc
  }

  /** Fixed-point q12 squared euclidean distance over double arrays:
    * Σᵢ floor((aᵢ − bᵢ)²·10¹² + 0.5) as a long — BIT-IDENTICAL per
    * element to the column spelling
    * `floor((element_at(a,i) - element_at(b,i))² * 1e12 + 0.5)` summed
    * left-to-right ((long)Math.floor == Spark Floor-on-double; long
    * addition is exact so order is immaterial). This is the IVF
    * assignment metric: spelled as 64 separate element_at trees it
    * dominated the N × cells crossJoin at scale (the r14 sf10 decade
    * probe timed q_mutual_knn_ivf out at 900 s on exactly this), as a
    * primitive loop it is ~40× cheaper and the crossJoin is compute-
    * bound no more. */
  def q12SqDistDD(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += math.floor(d * d * 1e12 + 0.5).toLong
      i += 1
    }
    acc
  }
}

/** Deterministic random-hyperplane LSH (signed random projections).
  * Hyperplane weights are derived from `XXH64.hashInt(plane*1024+dim)` —
  * reproducible everywhere with no stored model. Unlike axis-aligned sign
  * bits (which only see `bits` of the 64 dimensions), every plane projects
  * the FULL vector, so bucket collisions track cosine similarity. */
object HyperplaneLsh {
  /** weight ∈ [-1, 1), deterministic per (plane, dim). Plane and dim are
    * mixed without aliasing (disjoint 32-bit halves), so planes stay
    * independent at any dimensionality — `plane*K + dim` schemes collide
    * for dim >= K and silently correlate adjacent planes. */
  private def w(plane: Int, dim: Int, seed: Long): Double =
    (XXH64.hashLong((plane.toLong << 32) | (dim.toLong & 0xffffffffL), seed)
      >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0

  /** Per-executor weight-matrix cache: a 64-plane × 64-dim signature would
    * otherwise pay 4096 hash derivations PER ROW. Keyed by (bits, dims,
    * seed); a full 64×64 matrix is 32 KB, and a pipeline uses a handful of
    * (bits, seed) combinations, so the cache is effectively a static
    * constant per executor. */
  private val wcache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Double]]()

  private def weights(bits: Int, dims: Int, seed: Long): Array[Double] =
    wcache.computeIfAbsent((bits, dims, seed),
      _ => Array.tabulate(bits * dims)(i => w(i / dims, i % dims, seed)))

  def bucket(v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    val ws = weights(bits, n, seed)
    var out = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      val off = j * n
      var d = 0
      while (d < n) {
        dot += v.getFloat(d).toDouble * ws(off + d)
        d += 1
      }
      if (dot > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

/** `hyperplane_bucket(emb, bits)` — random-hyperplane LSH bucket id. */
case class HyperplaneBucket(child: Expression, bits: Int, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneLsh.bucket(input.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.similarity.HyperplaneLsh.bucket($c, $bits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** `vec_dot(a, b)` — native codegen'd dot product over `array<float>` /
  * `array<double>` columns (any mix; the kernel variant is picked at plan
  * time). The hot kernel of the similarity-search operators: at 100 TB a
  * brute-force or LSH-bucketed scorer evaluates this O(pairs × dim) times,
  * so it must not fall out of codegen the way interpreted
  * `aggregate`/`zip_with` HOFs do. */
/** `q12_sqdist(a, b)` — the codegen'd [[VecOps.q12SqDistDD]] kernel as
  * an expression (the IVF trained-index assignment metric; cf.
  * reference `server.c`'s fixed work partitioning — here the work
  * partitioner is a trained index, and this is its hot loop). Double
  * arrays only: the assignment pipeline casts both sides to double
  * before quantizing, and a silent float widening here would shift
  * q12 values against the DuckDB replay. Null ELEMENTS are not
  * modeled (same contract as the dot kernels — corpus vectors are
  * dense). */
case class Q12SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "q12_sqdist"

  private def isD(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isD(left.dataType) && isD(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> operands, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.q12SqDistDD(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.similarity.VecOps.q12SqDistDD($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Q12SqDist =
    copy(left = newLeft, right = newRight)
}

case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isF(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def isD(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isI(t: DataType) = t match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
    case _ => false
  }

  /** Kernel name for this operand-type combination. */
  private def kernel: String =
    if (isI(left.dataType) && isI(right.dataType)) "dotII"
    else (isF(left.dataType), isF(right.dataType)) match {
      case (true, true) => "dot"
      case (true, false) => "dotFD"
      case (false, true) => "dotDF"
      case (false, false) => "dotDD"
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = isF(t) || isD(t)
    val bothInt = isI(left.dataType) && isI(right.dataType)
    if (bothInt || (ok(left.dataType) && ok(right.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> (or both array<int>) operands, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dot" => VecOps.dot(x, y)
      case "dotFD" => VecOps.dotFD(x, y)
      case "dotDF" => VecOps.dotDF(x, y)
      case "dotDD" => VecOps.dotDD(x, y)
      case "dotII" => VecOps.dotII(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.similarity.VecOps.$kernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}
