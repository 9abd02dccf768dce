package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** JVM kernel for the k-means E step; static so whole-stage codegen calls
  * it directly.
  */
object ClusterImpl {

  /** Argmin cluster id for one quantized vector against a packed centroid
    * matrix (row = [cluster_id, n, s_0..s_{dim-1}], rows sorted ascending
    * by cluster_id). Distance is [[graft.operators.Clustering]]'s exact
    * n²-scaled integer form `Σ_d (n·x_d − s_d)²` divided by `(n·n)` in
    * double — dimension order ascending, so every add/divide is
    * bit-identical to the DuckDB oracle's. Strict `<` over ascending ids
    * IS the lowest-id tie-break (first minimum wins).
    */
  def argmin(q: ArrayData, cents: Array[Array[Long]]): Long = {
    var bestC = 0L
    var bestD = Double.PositiveInfinity
    var ci = 0
    while (ci < cents.length) {
      val row = cents(ci)
      val n = row(1)
      val dim = row.length - 2
      var num = 0L
      var d = 0
      while (d < dim) {
        val t = n * q.getLong(d) - row(2 + d)
        num += t * t
        d += 1
      }
      val dist = num.toDouble / (n * n).toDouble
      if (dist < bestD) { bestD = dist; bestC = row(0) }
      ci += 1
    }
    bestC
  }
}

/** Nearest-centroid assignment: `array<long> -> long` against a constant
  * centroid matrix.
  *
  * The matrix rides the generated code as a REFERENCE OBJECT, not unrolled
  * literal expressions — generated code size is constant in k·dim (one
  * kernel call), so a k in the hundreds costs centroid-matrix bytes, not a
  * Janino blowup; the k×dim literal when-chain it replaced compiled
  * multi-second projections at k=8·dim=64 and was the codegen-budget
  * caveat in the Clustering doc.
  */
case class KMeansArgmin(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmeans_argmin"

  override def nullSafeEval(input: Any): Any =
    ClusterImpl.argmin(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("kmCents", cents, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ClusterImpl.argmin($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): KMeansArgmin =
    copy(child = newChild)
}

object Cluster {
  /** Column wrapper: nearest-centroid id for a quantized vector. */
  def kmeansArgmin(q: Column, cents: Array[Array[Long]]): Column =
    Bridge.column(KMeansArgmin(Bridge.expression(q), cents))
}
