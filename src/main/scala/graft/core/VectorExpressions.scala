package graft.core

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Dot product of two array<double> columns as a native codegen expression.
 *
 * Why custom: Spark's higher-order functions (`zip_with` + `aggregate`)
 * are CodegenFallback (interpreted closures per element), and unrolling
 * element_at chains explodes generated-code size for wide vectors. A tight
 * generated loop keeps the similarity kernels inside whole-stage codegen —
 * the preferred "custom Expression" tier for operators Spark lacks.
 *
 * Summation is strictly left-to-right in element order, so results are
 * bit-identical to any sequential implementation (e.g. the DuckDB oracle).
 * Both inputs must be non-null array<double> of equal length.
 */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.ArrayType

  // Declared input types: a non-array<double> operand (e.g. array<float>)
  // would otherwise reinterpret packed bytes as doubles — garbage sums
  // with no exception. acceptsType ignores nullability, so both cast and
  // literal arrays pass.
  override def inputTypes: Seq[interop.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // UnsafeArrayData.getDouble has no bounds check — a shorter right array
    // would silently read adjacent row memory. Fail loudly instead.
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"double_array_dot: length mismatch ${n} vs ${y.numElements()}")
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double ${ev.value}_sum = 0.0;
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "double_array_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

/**
 * Per-row kernel for IVF cell assignment/probing against a *broadcast*
 * centroid matrix. Called from both the interpreted and generated paths of
 * [[NearestCellsExpr]]; one tight loop, no per-centroid expression nodes.
 */
object NearestCellsKernel {

  /** The `nprobe` nearest cells of `vec`, ordered by (score asc, cell asc)
    * where score = |c|^2 - 2*(v . c) — squared L2 minus the per-row
    * constant |v|^2, which cannot change the ordering. Summation order
    * matches [[DoubleArrayDot]] (strict left-to-right), so results are
    * bit-identical to the literal-centroid formulation it replaces. */
  def topCells(
      vec: org.apache.spark.sql.catalyst.util.ArrayData,
      bc: org.apache.spark.broadcast.Broadcast[(Array[Array[Double]], Array[Double])],
      nprobe: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (cents, norms) = bc.value
    val k = cents.length
    val n = math.min(nprobe, k)
    val dim = vec.numElements()
    if (k > 0 && cents(0).length != dim)
      throw new IllegalArgumentException(
        s"nearest_cells: vector dim $dim != centroid dim ${cents(0).length}")
    val bestScore = new Array[Double](n)
    val bestCell = new Array[Int](n)
    var filled = 0
    var c = 0
    while (c < k) {
      val ctr = cents(c)
      var s = 0.0
      var i = 0
      while (i < dim) { s += vec.getDouble(i) * ctr(i); i += 1 }
      val score = norms(c) - 2.0 * s
      // Insertion into the sorted top-n. Cells are visited in ascending id
      // order and insertion is on strict <, so score ties keep the lower
      // cell id first — same order as sorting (score, cell) structs.
      if (filled < n || score < bestScore(filled - 1)) {
        var pos = if (filled < n) filled else n - 1
        while (pos > 0 && score < bestScore(pos - 1)) {
          bestScore(pos) = bestScore(pos - 1)
          bestCell(pos) = bestCell(pos - 1)
          pos -= 1
        }
        bestScore(pos) = score
        bestCell(pos) = c
        if (filled < n) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestCell, filled))
  }
}

/** Per-row kernel for hyperplane-LSH bucket assignment against a
  * broadcast plane tensor (tables x planes x dim). */
object HyperplaneBucketsKernel {

  /** One sign-bucket id per table: bit b of table t's bucket is set iff
    * vec . plane(t)(b) > 0 (strict, matching the `when(dot > 0, ...)`
    * formulation it replaces; dots sum left-to-right like
    * [[DoubleArrayDot]]). Returns array<long> of length tables. */
  def buckets(
      vec: org.apache.spark.sql.catalyst.util.ArrayData,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val planes = bc.value
    val dim = vec.numElements()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var bucket = 0L
      var b = 0
      while (b < table.length) {
        val plane = table(b)
        if (plane.length != dim)
          throw new IllegalArgumentException(
            s"lsh_buckets: vector dim $dim != plane dim ${plane.length}")
        var s = 0.0
        var i = 0
        while (i < dim) { s += vec.getDouble(i) * plane(i); i += 1 }
        if (s > 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * Hyperplane-LSH bucket ids of a vector (one long per table) under a
 * broadcast plane tensor.
 *
 * Why custom: the previous formulation built tables x planes literal-dot
 * expressions (`when(array_dot(vec, typedlit(plane)) > 0, 1<<b)...`) —
 * fine at 8x4, but recall tuning at corpus scale wants e.g. 64 tables x
 * 16 planes = 1024 inlined plane literals, the same plan-size ceiling the
 * IVF centroids had. The tensor rides one torrent broadcast and the
 * per-row work is one fused loop regardless of tables/planes.
 */
case class HyperplaneBucketsExpr(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def inputTypes: Seq[interop.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneBucketsKernel.buckets(v.asInstanceOf[ArrayData], bc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "planesBc", bc, classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.core.HyperplaneBucketsKernel.buckets($v, $bcRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}

/**
 * `nprobe` nearest IVF cells of a vector under a broadcast centroid
 * matrix, as array<int> ordered nearest-first.
 *
 * Why custom: the previous formulation inlined every centroid as a
 * `typedlit` and built one struct expression per cell — correct at
 * nlist=16, but the expression tree (and generated code) grows linearly
 * with nlist, capping it at a few hundred cells. A 100 TB corpus wants
 * nlist in the tens of thousands, so the matrix rides a torrent broadcast
 * (one copy per executor, a reference in the task binary) and the per-row
 * work is one fused argmin loop regardless of nlist.
 */
case class NearestCellsExpr(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[(Array[Array[Double]], Array[Double])],
    nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def inputTypes: Seq[interop.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(v: Any): Any =
    NearestCellsKernel.topCells(v.asInstanceOf[ArrayData], bc, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "centroidsBc", bc, classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.core.NearestCellsKernel.topCells($v, $bcRef, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

/** Per-row kernels for product quantization: encode a vector into one
  * code per subspace, and score a code array against a query's
  * precomputed distance lookup table (asymmetric distance computation). */
object PqKernels {

  /** codes(s) = argmin over codebook s of squared L2 between the
    * vector's s-th slice and the centroid (ties -> lower code, matching
    * every other argmin in this file). */
  def encode(
      vec: org.apache.spark.sql.catalyst.util.ArrayData,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val books = bc.value
    val m = books.length
    val dsub = books(0)(0).length
    if (vec.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${vec.numElements()} != m*dsub = ${m * dsub}")
    val codes = new Array[Short](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val base = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val ctr = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub) { val t = vec.getDouble(base + i) - ctr(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best.toShort
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** ADC score: sum over subspaces of the query's precomputed
    * ||q_sub - centroid(code)||^2 (lut is flattened m x ksub). */
  def adc(
      queryId: Long,
      codes: org.apache.spark.sql.catalyst.util.ArrayData,
      bc: org.apache.spark.broadcast.Broadcast[Map[Long, Array[Double]]],
      ksub: Int): Double = {
    val lut = bc.value.getOrElse(
      queryId,
      throw new IllegalArgumentException(s"pq_adc: no LUT for query id $queryId"))
    var s = 0.0
    var i = 0
    val m = codes.numElements()
    while (i < m) { s += lut(i * ksub + codes.getShort(i)); i += 1 }
    s
  }
}

/** PQ encoding of a vector: one code per subspace against broadcast
  * codebooks — array<short> of length m. The storage/shuffle win of the
  * IVF-PQ layout: candidates travel as m shorts instead of dim doubles. */
case class PqEncodeExpr(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, ShortType}

  override def inputTypes: Seq[interop.AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], bc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "pqBooksBc", bc, classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.core.PqKernels.encode($v, $bcRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** ADC score of a PQ code array under the query's broadcast lookup table
  * (requires long query ids — the LUT map is keyed by them). */
case class PqAdcExpr(
    left: Expression,
    right: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Map[Long, Array[Double]]],
    ksub: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, LongType, ShortType}

  override def inputTypes: Seq[interop.AbstractType] = Seq(LongType, ArrayType(ShortType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(qid: Any, codes: Any): Any =
    PqKernels.adc(qid.asInstanceOf[Long], codes.asInstanceOf[ArrayData], bc, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "pqLutBc", bc, classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.core.PqKernels.adc($q, $c, $bcRef, $ksub);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object BpeKernel {
  /** Tokenize every word of an array<string> row under a broadcast merge
    * table, flattened word-major — the distributed half of
    * [[graft.operators.Bpe]] (per-row imperative, like every kernel in
    * this file; the merge table rides ONE broadcast per plan). */
  def segment(
      words: org.apache.spark.sql.catalyst.util.ArrayData,
      bc: org.apache.spark.broadcast.Broadcast[graft.operators.Bpe.Merges])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val merges = bc.value
    val n = words.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      val toks = graft.operators.Bpe.tokenizeWord(w, merges)
      var j = 0
      while (j < toks.length) {
        out += org.apache.spark.unsafe.types.UTF8String.fromString(toks(j))
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}

/** BPE segmentation of a words array under a broadcast merge table —
  * flat array<string> of subword tokens, word-major order. */
case class BpeSegmentExpr(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[graft.operators.Bpe.Merges])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def inputTypes: Seq[interop.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  override protected def nullSafeEval(a: Any): Any =
    BpeKernel.segment(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "bpeMergesBc", bc, classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.core.BpeKernel.segment($a, $bcRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
}

object TopFreq {
  /** Count of the most frequent element in a string array (0 when empty):
    * one hash-map pass per row. */
  def topCount(arr: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val c = counts.merge(s, 1, (a: Integer, b: Integer) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }
}

/**
 * Count of the most frequent element of an array<string> column as a
 * native codegen expression — one hash-map pass per row. Replaces the
 * `array_max(transform(array_distinct(a), g -> size(filter(a, _ == g))))`
 * higher-order formulation, whose lambdas evaluate interpreted and cost
 * O(elements x distinct) per row (the text_repetition bench outlier).
 */
case class TopFreqExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  override def inputTypes: Seq[interop.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_freq"

  override protected def nullSafeEval(a: Any): Any =
    TopFreq.topCount(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.core.TopFreq.topCount($a)")

  override protected def withNewChildInternal(newChild: Expression): TopFreqExpr =
    copy(child = newChild)
}

object DenseScatter {
  /** Scatter (cell, w) entries into a dense double vector of length
    * `dim` — one O(nnz + dim) pass. Cells must be unique and in
    * [0, dim) (the feature-hash aggregation guarantees both); an
    * out-of-range cell fails loud naming the mismatch (it means the
    * sparse rows were built under a different `dim`). */
  def scatter(entries: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Double](dim)
    val n = entries.numElements()
    var i = 0
    while (i < n) {
      val row = entries.getStruct(i, 2)
      val cell = row.getInt(0)
      if (cell < 0 || cell >= dim)
        throw new IllegalArgumentException(
          s"dense_scatter: cell $cell outside [0, $dim) — the sparse rows " +
            "were hashed under a different dim than the dense assembly")
      out(cell) = row.getLong(1).toDouble
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/**
 * Dense assembly of feature-hashed (cell, w) entries: array<double> of
 * length `dim` with w at each entry's cell and 0 elsewhere.
 *
 * Why custom: the HOF formulation (`transform(sequence(0, dim-1),
 * i -> coalesce(m[i], 0))`) evaluates its lambda INTERPRETED per element
 * with a linear map probe per cell — O(dim x nnz) interpreted work per
 * document (the TopFreqExpr cost class). This is one codegen'd
 * O(nnz + dim) scatter.
 */
case class DenseScatterExpr(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def inputTypes: Seq[interop.AbstractType] =
    Seq(ArrayType(StructType(Seq(
      StructField("cell", IntegerType), StructField("w", LongType)))))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "dense_scatter"

  override protected def nullSafeEval(a: Any): Any =
    DenseScatter.scatter(a.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.core.DenseScatter.scatter($a, $dim)")

  override protected def withNewChildInternal(newChild: Expression): DenseScatterExpr =
    copy(child = newChild)
}

object Anchors {
  // the anchor constants live in the Spark-free AnchorMath (one home)

  /**
   * Content-defined anchor positions (1-based) for winnowing-style
   * fingerprinting: position i anchors iff the Rabin-Karp hash of the
   * `window`-char context starting there is ≡ 0 mod `modulus`. ONE O(len)
   * rolling pass per document — each step is a constant-time update
   * (subtract the outgoing char's `Base^(w-1)` term, shift, add the
   * incoming char), replacing the md5-per-character probe whose hashing
   * dominated the operator's 100 TB bill. The per-position value equals
   * the left-to-right fold `acc = (acc*Base + codepoint) mod Prime` over
   * the window, which a SQL oracle replays with a per-window list fold.
   *
   * Positions and window characters are UNICODE CODEPOINTS, not UTF-16
   * code units: the emitted positions index into Spark's `substring`,
   * and the oracle folds DuckDB's `unicode()` per character — both
   * codepoint-based. A charAt loop would silently shift every position
   * after the first non-BMP character and fingerprint different text on
   * the two sides.
   */
  def anchorPositions(s: org.apache.spark.unsafe.types.UTF8String, window: Int, modulus: Int): ArrayData =
    // the math lives in the Spark-free AnchorMath (ONE kernel definition,
    // shared with the serving-side OverlapReader probe)
    ArrayData.toArrayData(
      AnchorMath.positions(s.toString.codePoints().toArray, window, modulus))
}

/**
 * Anchor positions of a string under a rolling content-defined chunking
 * rule, as a native codegen expression (array<int>, 1-based) — the anchor
 * kernel of [[graft.operators.Dedup.sharedSubstringPairs]]. Exploding this
 * bounded array (≈ len/modulus entries) also removes the O(len)
 * per-position row explosion the sequence+filter formulation paid.
 */
case class AnchorPositionsExpr(child: Expression, window: Int, modulus: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  require(window >= 1, s"window must be >= 1, got $window")
  require(modulus >= 1, s"modulus must be >= 1, got $modulus")

  override def inputTypes: Seq[interop.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "anchor_positions"

  override protected def nullSafeEval(s: Any): Any =
    Anchors.anchorPositions(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.core.Anchors.anchorPositions($s, $window, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): AnchorPositionsExpr =
    copy(child = newChild)
}

object RollingHash {
  val Prime = 1000000007L

  /** acc = (acc*31 + codepoint) mod p over the string's UNICODE
    * CODEPOINTS — matching the SQL oracle's fold of `unicode(c)` over
    * per-character splits on any text, not just BMP (a charAt fold would
    * diverge from the oracle at the first astral character). */
  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    var acc = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      acc = (acc * 31 + it.nextInt()) % Prime
    }
    acc
  }
}

/**
 * Rolling polynomial hash of a string column (the document fingerprint) as
 * a native codegen expression. Replaces the `aggregate(filter(split(...)))`
 * higher-order pipeline, whose lambdas Spark evaluates interpreted per
 * character — this is a static call inside whole-stage codegen, one tight
 * loop per document.
 */
case class RollingHashExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{LongType, StringType}

  override def inputTypes: Seq[interop.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(s: Any): Any =
    RollingHash.hash(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.core.RollingHash.hash($s)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object SpanExcise {
  import org.apache.spark.unsafe.types.UTF8String

  /**
   * Excise every codepoint interval `[p, p + minLen)` (p 1-based, from the
   * SORTED-ascending `ps`) from `t` in ONE byte-level pass: walk the UTF-8
   * sequences once tracking the codepoint position, batch-copy each kept
   * run with arraycopy. O(bytes + |ps|) per document — the codepoint at
   * position c is excised iff some consumed p satisfies p <= c < p + minLen,
   * which for sorted ps reduces to c < max(consumed p + minLen), exactly
   * the left-to-right interval-coalescing fold semantics.
   *
   * Positions past the end of the string cut nothing (they are never
   * consumed); an unsorted input fails loud — silence there would excise
   * different text than the fold the oracle replays.
   */
  def excise(t: UTF8String, ps: ArrayData, minLen: Int): UTF8String = {
    val n = ps.numElements()
    if (n == 0) return t
    val bytes = t.getBytes
    val len = bytes.length
    val out = new Array[Byte](len)
    var outLen = 0
    var bi = 0        // byte index into the UTF-8 sequence
    var cp = 1        // 1-based codepoint position of bytes(bi)
    var k = 0         // next unconsumed cut site
    var lastP = Int.MinValue
    var skipUntil = 0 // codepoints before this position are excised
    var runStart = 0  // byte index where the current kept run began; -1 while skipping
    while (bi < len) {
      while (k < n && ps.getInt(k) <= cp) {
        val p = ps.getInt(k)
        if (p < lastP)
          throw new IllegalArgumentException(
            s"span_excise: cut positions must be sorted ascending (saw $p after $lastP)")
        lastP = p
        val e = p + minLen
        if (e > skipUntil) skipUntil = e
        k += 1
      }
      if (cp >= skipUntil) {
        if (runStart < 0) runStart = bi
      } else if (runStart >= 0) {
        System.arraycopy(bytes, runStart, out, outLen, bi - runStart)
        outLen += bi - runStart
        runStart = -1
      }
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      cp += 1
    }
    if (runStart >= 0) {
      System.arraycopy(bytes, runStart, out, outLen, len - runStart)
      outLen += len - runStart
    }
    UTF8String.fromBytes(out, 0, outLen)
  }
}

/**
 * Codepoint-exact span excision — remove `[p, p + minLen)` for every
 * (sorted) cut position in an array<int> column — as a native codegen
 * expression: the cut step of [[graft.operators.Dedup.removeSharedSpans]].
 *
 * Why custom: the `aggregate(ps, ...)` higher-order fold evaluates its
 * lambda INTERPRETED per cut site AND copies the accumulated output string
 * each step — O(sites × |doc|) churn in one task, and the operator's
 * 100×-scale inputs (big boilerplate-heavy documents) make sites ≈
 * len/modulus (the TopFreqExpr straggler class). This is one O(bytes)
 * arraycopy-batched pass, inside whole-stage codegen.
 */
case class SpanExciseExpr(left: Expression, right: Expression, minLen: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  import org.apache.spark.sql.graft.interop
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  require(minLen >= 1, s"minLen must be >= 1, got $minLen")

  override def inputTypes: Seq[interop.AbstractType] =
    Seq(StringType, ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def prettyName: String = "span_excise"

  override protected def nullSafeEval(t: Any, ps: Any): Any =
    SpanExcise.excise(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      ps.asInstanceOf[ArrayData], minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, ps) => s"graft.core.SpanExcise.excise($t, $ps, $minLen)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanExciseExpr =
    copy(left = newLeft, right = newRight)
}
