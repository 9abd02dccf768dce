package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for the vector-math / shingling expressions; static so
  * whole-stage codegen calls them directly.
  */
object VectorTextImpl {

  /** Distinct k-word shingles of a space-tokenized string, first-occurrence
    * order. Tokenization matches `split(text, ' ')` with Java limit -1
    * (interior/trailing empty tokens kept) so results are bit-identical to
    * the column-expression formulation — and to the DuckDB oracle's
    * `string_split(text, ' ')`. One pass, one StringBuilder; replaces a
    * `transform(sequence)/slice/concat_ws` higher-order pipeline that
    * dominated the dedup queries (HOFs evaluate interpreted, ~11us per
    * shingle; this kernel runs inside whole-stage codegen).
    */
  def wordShingles(s: UTF8String, k: Int): ArrayData = {
    val parts = s.toString.split(" ", -1)
    if (parts.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](parts.length * 2)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i <= parts.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(parts(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new GenericArrayData(out)
  }

  /** Sequential left-to-right dot product of two double arrays — the exact
    * accumulation order DuckDB's `list_inner_product` on DOUBLE[] uses, so
    * cosine results stay bit-identical to the oracle (and run-to-run: no
    * partition-order dependence). Replaces the interpreted
    * `aggregate(zip_with(...))` pipeline in the similarity hot path.
    */
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Phrase-chain join of two ascending-sorted int position arrays: the
    * positions p in `a` with p + offset present in `b`, by linear merge.
    * Chained left-to-right it yields the START positions of a phrase —
    * starts("t0 t1 t2") = phraseJoin(phraseJoin(ps0, ps1, 1), ps2, 2) —
    * the positional-index verification kernel ([[sortedIntersectCount]]'s
    * analog for term positions). Occurrence lists may repeat positions
    * only if the inputs do; the index's per-(term, doc) lists are
    * distinct ascending by construction.
    */
  def phraseJoin(a: ArrayData, b: ArrayData, offset: Int): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val out = new Array[Int](math.min(na, nb))
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i) + offset; val y = b.getInt(j)
      if (x == y) { out(c) = a.getInt(i); c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, c))
  }

  /** Minimum |x - y| over two ascending-sorted int arrays by the classic
    * two-pointer walk — the proximity (NEAR/slop) kernel. Int.MaxValue
    * on an empty side (no pair exists).
    */
  def sortedMinGap(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var best = Int.MaxValue
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      val d = math.abs(x - y)
      if (d < best) best = d
      if (best == 0) return 0
      if (x < y) i += 1 else j += 1
    }
    best
  }

  /** Minimum cover span over n ascending-sorted int arrays: the smallest
    * max−min over tuples taking one position from each list — the n-ary
    * generalization of [[sortedMinGap]] (for n = 2 the two definitions
    * coincide: |x − y| = max − min). Classic n-pointer sweep: record the
    * span of the current frontier, advance the pointer holding the
    * frontier MINIMUM (any tuple replacing a non-minimum can only widen
    * or tie), until the minimum's list is exhausted — O(total positions ×
    * n) with n = query terms, a plan constant. Int.MaxValue when any
    * list is empty or the outer array is (no covering tuple exists).
    */
  def sortedMinCover(lists: ArrayData): Int = {
    val n = lists.numElements()
    if (n == 0) return Int.MaxValue
    val arrs = new Array[ArrayData](n)
    val idx = new Array[Int](n)
    var i = 0
    while (i < n) {
      arrs(i) = lists.getArray(i)
      if (arrs(i) == null || arrs(i).numElements() == 0) return Int.MaxValue
      i += 1
    }
    var best = Int.MaxValue
    while (true) {
      var mn = Int.MaxValue; var mx = Int.MinValue; var mnAt = 0
      var j = 0
      while (j < n) {
        val v = arrs(j).getInt(idx(j))
        if (v < mn) { mn = v; mnAt = j }
        if (v > mx) mx = v
        j += 1
      }
      if (mx - mn < best) best = mx - mn
      if (best == 0) return 0
      idx(mnAt) += 1
      if (idx(mnAt) >= arrs(mnAt).numElements()) return best
    }
    best
  }

  /** ADC (asymmetric-distance-computation) lookup sum: Σ_s lut(s)(codes(s))
    * — the IVF-PQ candidate-scoring kernel. `codes` is a vector's stored
    * per-subspace codewords, `lut` the probe's per-subspace lookup rows;
    * the higher-order `aggregate(zip_with(...))` formulation evaluates
    * interpreted at ~µs per candidate, which dominated the pqRoute tier
    * (ROUTEBENCH r14: not kept up at the ann ladder); this runs the m
    * lookups inside whole-stage codegen.
    */
  def adcSum(codes: ArrayData, lut: ArrayData): Double = {
    val m = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }

  /** Intersection SIZE of two ascending-sorted string arrays by linear
    * merge: no per-pair hash set, no materialized intersection array —
    * the count `size(array_intersect(...))` computes at several times
    * the cost. Inputs must be distinct-element arrays sorted by
    * UTF8String binary order (exactly `sort_array`'s string order), which
    * the dedup family's per-doc shingle arrays are by construction.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** Distinct k-word shingles: `string -> array<string>`. Native Catalyst
  * expression so the dedup shingling (the highest-volume transform in the
  * near-dup pipeline) stays inside whole-stage codegen.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    VectorTextImpl.wordShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorTextImpl.wordShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Sequential dot product: `(array<double>, array<double>) -> double`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorTextImpl.dotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorTextImpl.dotDD($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Phrase-chain join over sorted int position arrays:
  * `(array<int>, array<int>) -> array<int>` keeping left positions p with
  * p + offset in the right array. The positional retrieval family's
  * phrase kernel — a higher-order `filter(pa, p -> array_contains(pb,
  * p + off))` evaluates interpreted and rescans `pb` per element; this
  * runs the O(m + n) merge inside whole-stage codegen.
  */
case class PhraseJoin(left: Expression, right: Expression, offset: Int)
    extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phrase_join"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorTextImpl.phraseJoin(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorTextImpl.phraseJoin($a, $b, $offset)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhraseJoin =
    copy(left = newLeft, right = newRight)
}

/** Two-pointer minimum gap over sorted int position arrays:
  * `(array<int>, array<int>) -> int` (Int.MaxValue when either side is
  * empty) — the proximity (NEAR/slop) kernel of the positional family.
  */
case class SortedMinGap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_min_gap"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorTextImpl.sortedMinGap(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorTextImpl.sortedMinGap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedMinGap =
    copy(left = newLeft, right = newRight)
}

/** ADC lookup sum: `(array<int>, array<array<double>>) -> double` —
  * Σ_s lut(s)(codes(s)), the IVF-PQ candidate-scoring kernel (codegen'd).
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_sum"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorTextImpl.adcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorTextImpl.adcSum($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

/** n-ary minimum cover span over sorted int position lists:
  * `array<array<int>> -> int` (Int.MaxValue when any list is empty) —
  * the k-term window kernel of the positional family, generalizing
  * [[SortedMinGap]] to "all query terms within a span".
  */
case class SortedMinCover(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_min_cover"

  override def nullSafeEval(input: Any): Any =
    VectorTextImpl.sortedMinCover(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorTextImpl.sortedMinCover($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SortedMinCover =
    copy(child = newChild)
}

/** Sorted-merge intersection count:
  * `(array<string> sorted, array<string> sorted) -> int`. The candidate
  * VERIFICATION kernel of the exact route tier ([[graft.operators.Dedup
  * .jaccardRouteOnKept]]): verification cost there is per-candidate, so
  * the hash-set build + result-array allocation inside
  * `size(array_intersect(...))` was the route's dominant term.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorTextImpl.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorTextImpl.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
