package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the embedding hot path: dot product
  * over two `array<float>` columns with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`? The built-in
  * higher-order functions materialize the intermediate product array
  * and drive a lambda interpreter per element. This expression compiles
  * to a tight primitive loop over the two ArrayData buffers — no
  * allocation, no virtual calls — which matters when scoring 10^9
  * candidate pairs at 100 TB scale.
  *
  * Registered as SQL function `dot_f32` via [[GraftExtensions]]
  * (SparkSessionExtensions) or [[GraftFunctions.register]].
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  private def checkFloatArrays: TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override def nullable: Boolean = true

  // HOF parity: zip_with pads mismatched lengths with null and a null
  // element poisons the sum, so both cases must yield NULL here too —
  // a silent common-prefix score would be a plausible wrong answer.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity over two `array<float>` columns, single fused
  * codegen'd pass (dot and both norms in one loop). Zero-norm inputs
  * yield 0.0 rather than NaN. */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  private def checkFloatArrays: TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_f32"

  override def nullable: Boolean = true

  // same null contract as DotProductF32 (HOF parity)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0d) 0.0d else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double xv = (double) $a.getFloat($i);
         |    double yv = (double) $b.getFloat($i);
         |    $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd random-hyperplane LSH signature — the bucketing
  * hot path of [[graft.operators.Similarity.lshTopK]] and
  * [[graft.operators.Similarity.nearDupPairs]].
  *
  * Bit p = sign(Σ_i v_i · coef(planeOffset + p, i)) with
  * coef(p, i) = xxhash64(p, i) / Long.MaxValue — EXACTLY the
  * arithmetic of the HOF reference [[graft.operators.Similarity
  * .lshSignature]] (same seed chain XXH64(i, XXH64(p, 42)), same
  * double fold order), so both paths produce bit-identical signatures
  * (spec-asserted). The HOF form drives a lambda interpreter with one
  * xxhash64 Expression eval per (plane × dim × row); this compiles to
  * a tight loop of static XXH64.hashLong calls with the per-plane seed
  * hoisted — the difference between interpreting ~2k expression nodes
  * per row and ~1k fused multiply-adds.
  *
  * Null contract: a null ELEMENT or an empty array yields signature 0
  * (HOF parity: null poisons every plane's sum, `when(null > 0)` is
  * false). A null ARRAY yields NULL (standard expression semantics;
  * the HOF form yields 0 there — callers drop null embeddings before
  * bucketing). Accepts array<float> and array<double>; float elements
  * widen exactly, so signatures agree across the two encodings. */
case class LshSignature(child: Expression, numPlanes: Int, planeOffset: Int)
    extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 62,
    s"numPlanes ($numPlanes) must be in [1, 62]")

  private val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sig"
  override def nullable: Boolean = child.nullable

  // per-plane outer hash of the xxhash64(p, i) chain, hoisted out of
  // the per-row loop (it only depends on the plane index)
  private lazy val planeSeeds: Array[Long] =
    Array.tabulate(numPlanes)(p => XXH64.hashLong((planeOffset + p).toLong, 42L))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0L; i += 1 }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      val seed = planeSeeds(p)
      var s = 0.0d
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * (XXH64.hashLong(i.toLong, seed).toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (s > 0.0d) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val seeds = ctx.addReferenceObj("planeSeeds", planeSeeds, "long[]")
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val poisoned = ctx.freshName("poisoned")
      val getter = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { $poisoned = true; break; }
         |}
         |if (!$poisoned) {
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $getter($i) *
         |        ((double) $xxh.hashLong((long) $i, $seeds[$p]) / 9.223372036854775807E18);
         |    }
         |    if ($s > 0.0) $sig |= 1L << $p;
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd minhash signature bank — the signature hot path of
  * [[graft.operators.Dedup.minHashLsh]].
  *
  * Input: the per-document array of (md5-derived, non-negative 60-bit)
  * shingle hashes. Output: `numHashes` minhashes
  * min_e (A_i · (e mod P) + B_i) mod P over the affine family
  * [[graft.operators.Dedup.affineA]]/[[affineB]] with P = 2³¹−1 —
  * EXACTLY the arithmetic the DuckDB oracle replays, so signatures
  * stay bit-identical cross-engine.
  *
  * One compiled pass over the array with `numHashes` running minima:
  * the HOF spelling (`array_min(transform(...))` × numHashes) walks
  * the array numHashes times through the lambda interpreter, and the
  * exploded-groupBy spelling pays a full (doc, shingle) shuffle just
  * to re-aggregate what the row already holds. Empty array → NULL
  * (no shingles ⇒ no signature); a null element → NULL. */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes ($numHashes) must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override def nullable: Boolean = true

  private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(graft.operators.Dedup.affineA)
  private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(graft.operators.Dedup.affineB)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      // floorMod, not %: a negative input (e.g. raw xxhash64 from an
      // SQL caller) must still land in [0, P) or the affine family's
      // documented range — and the oracle replay — silently breaks
      val m = java.lang.Math.floorMod(v.getLong(i), graft.operators.Dedup.P31)
      var h = 0
      while (h < numHashes) {
        val x = (as(h) * m + bs(h)) % graft.operators.Dedup.P31
        if (x < mins(h)) mins(h) = x
        h += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val aRef = ctx.addReferenceObj("affineA", as, "long[]")
      val bRef = ctx.addReferenceObj("affineB", bs, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val x = ctx.freshName("x")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $v.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $m = java.lang.Math.floorMod($v.getLong($i), 2147483647L);
         |    for (int $h = 0; $h < $numHashes; $h++) {
         |      long $x = ($aRef[$h] * $m + $bRef[$h]) % 2147483647L;
         |      if ($x < $mins[$h]) $mins[$h] = $x;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd k-shingle hash set — the document-side hot path of
  * [[graft.operators.Dedup.minHashLsh]].
  *
  * Input: the token array of one document. Output: the DISTINCT
  * (insertion-ordered) hashes of its word k-shingles, where each token
  * hashes to the first 60 bits of its md5 and a shingle is the rolling
  * polynomial of its tokens' hashes mod P = 2³¹−1:
  * acc_0 = 0, acc_j = (acc_{j−1}·1000003 + tokh_j mod P) mod P.
  * Every ingredient (md5, substr-equivalent bit slice, integer
  * arithmetic) is replayed verbatim by the DuckDB oracle, so the whole
  * minhash pipeline stays bit-identical cross-engine.
  *
  * One compiled pass per document: md5 per TOKEN (not per shingle — a
  * k-gram's joined string never materializes) and integer ops per
  * window, vs the HOF spelling's per-position lambda interpretation of
  * slice + concat_ws + md5 + hex-parse. 2³¹ shingle space only ever
  * feeds per-doc set ops (minhash, intersect), where the oracle replays
  * the same collisions, so narrower-than-60-bit keys cost nothing.
  *
  * Fewer than k tokens → empty array (no k-shingle exists); null
  * token or null array → NULL. */
/** Shared md5-prefix hashing for the native text expressions: first
  * 60 bits of md5 as a non-negative long ≡ parsing the first 15 hex
  * digits (the md5i60 contract the DuckDB oracles replay). */
private[functions] object Md5Prefix {
  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def i60(bytes: Array[Byte]): Long = {
    val d = md5.get().digest(bytes)
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}

case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k ($k) must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullable: Boolean = true

  /** Shared by eval and codegen; null ⇔ a null token was present. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return null
      th(i) = Md5Prefix.i60(input.getUTF8String(i).getBytes) % graft.operators.Dedup.P31
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - k) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 1000003L + th(i + j)) % graft.operators.Dedup.P31
        j += 1
      }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // the loop body lives in compiled Scala (compute); codegen just
      // dispatches, keeping the surrounding stage in whole-stage codegen
      val self = ctx.addReferenceObj("shingler", this, classOf[ShingleHashes].getName)
      s"""
         |${ev.value} = $self.compute($v);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native squared-L2 distance over two `array<long>` columns — the
  * assignment hot path of [[graft.operators.Clustering.kmeans]]
  * (micro-quantized coordinates; centroids enter as array literals).
  * The HOF spelling `aggregate(zip_with(q, c, (a,b) => (a−b)²), 0, +)`
  * interprets two lambdas per element per centroid — at k=16 over a
  * 64-dim corpus that is ~2 000 interpreted calls per ROW; this
  * expression is one fused primitive loop per centroid. Same integer
  * arithmetic, same left-to-right order, bit-identical sums (callers
  * keep inputs under the documented 2⁶³ bound).
  *
  * Null element or null array → NULL; mismatched lengths → NULL (a
  * quantized corpus row and a centroid always agree on dim). */
case class L2SqI64(left: Expression, right: Expression)
    extends BinaryExpression {

  private def checkLongArrays: TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def checkInputDataTypes(): TypeCheckResult = checkLongArrays
  override def dataType: DataType = LongType
  override def prettyName: String = "l2sq_i64"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  int $i = 0;
         |  boolean $anyNull = false;
         |  while ($i < $n) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |    $i++;
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[L2SqI64]] for `array<double>` operands — the IVF coarse-probe
  * distance (query vector vs centroid). Bit-identical to the HOF
  * spelling `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0d, _+_)`
  * (same element order, same double ops), but a fused primitive loop
  * instead of a lambda interpreter + intermediate array per pair —
  * the probe-selection pass evaluates it |Q|·nlist times, which under
  * √n-sized cells is n^1.5 evaluations for a self-join probe. */
case class L2SqF64(left: Expression, right: Expression)
    extends BinaryExpression {

  private def checkDoubleArrays: TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def checkInputDataTypes(): TypeCheckResult = checkDoubleArrays
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_f64"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0d;
         |  int $i = 0;
         |  boolean $anyNull = false;
         |  while ($i < $n) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |    $i++;
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment in ONE expression: the 0-based index of
  * the row of `right` (the centroid matrix, `array<array<bigint>>` —
  * a constant-folded literal in the kmeans plan) minimizing the exact
  * integer squared L2 distance to `left` (the quantized vector). Ties
  * break to the LOWEST index (strict `<` scan order), exactly
  * `array_position(dists, array_min(dists)) - 1` over the per-centroid
  * [[L2SqI64]] spelling — the DuckDB-replayable contract every kmeans
  * oracle (x56/x73/x329) pins.
  *
  * Why not k separate `l2sq_i64` calls in an `array(...)`? That plan
  * SHAPE is O(k) expression trees — at the auto-sized k ≈ √n a ×10
  * corpus pays k = 141 generated calls per row plus a k-element array
  * allocation, and the round-16 probe measured the assignment stage at
  * 24 s of a 35 s SemDeDup pass. One expression with an internal loop
  * keeps the generated code CONSTANT-SIZE in k and allocation-free —
  * the difference between a clustering pass that scales with √n and
  * one whose plan text does.
  *
  * NULL contract: null/absent inputs, an empty matrix, a null element
  * anywhere, or a dimension mismatch between the vector and ANY
  * centroid row → NULL (a malformed centroid is a caller bug surfaced
  * as a null cluster, never a crash). */
case class ArgminL2SqI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<array<bigint>>), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_l2sq_i64"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val k = cs.numElements()
    if (k == 0) return null
    val d = q.numElements()
    var best = -1
    var bestDist = Long.MaxValue
    var c = 0
    while (c < k) {
      if (cs.isNullAt(c)) return null
      val cv = cs.getArray(c)
      if (cv.numElements() != d) return null
      var acc = 0L
      var i = 0
      while (i < d) {
        if (q.isNullAt(i) || cv.isNullAt(i)) return null
        val t = q.getLong(i) - cv.getLong(i)
        acc += t * t
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val bad = ctx.freshName("bad")
      s"""
         |int $k = $b.numElements();
         |int $d = $a.numElements();
         |int $best = -1;
         |long $bestDist = Long.MAX_VALUE;
         |boolean $bad = ($k == 0);
         |for (int $c = 0; !$bad && $c < $k; $c++) {
         |  if ($b.isNullAt($c)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($c);
         |  if ($cv.numElements() != $d) { $bad = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($a.isNullAt($i) || $cv.isNullAt($i)) { $bad = true; break; }
         |    long $t = $a.getLong($i) - $cv.getLong($i);
         |    $acc += $t * $t;
         |  }
         |  if ($bad) break;
         |  if ($acc < $bestDist) { $bestDist = $acc; $best = $c; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** POSITIONAL k-gram rolling hashes — [[ShingleHashes]] without the
  * dedup: element `i` of the result is the hash of the token window
  * `[i, i+k)`, duplicates kept, order = position order. The span-level
  * operators ([[graft.operators.Dedup.sharedRuns]]) need WHERE a gram
  * occurs, not just the set of grams, so the distinct form cannot feed
  * them. Same arithmetic as ShingleHashes (md5-prefix token hash,
  * polynomial fold mod 2³¹−1), so the DuckDB oracle chain replays both
  * from one spelling.
  *
  * Fewer than k tokens → empty array; null token or null array → NULL. */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k ($k) must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"
  override def nullable: Boolean = true

  /** Shared by eval and codegen; null ⇔ a null token was present. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return null
      th(i) = Md5Prefix.i60(input.getUTF8String(i).getBytes) % graft.operators.Dedup.P31
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 1000003L + th(i + j)) % graft.operators.Dedup.P31
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("grammer", this, classOf[GramHashes].getName)
      s"""
         |${ev.value} = $self.compute($v);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd 60-bit SimHash signature — the signature hot path
  * of [[graft.operators.Dedup.simHashSignatures]].
  *
  * Input: a document's token array (duplicates count — each occurrence
  * votes). Each token hashes to the first 60 bits of its md5; bit b of
  * the signature is set iff the b-set tokens are a strict majority
  * (2·S_b > n) — EXACTLY the arithmetic of the exploded 61-agg groupBy
  * spelling and of the DuckDB oracle's brute-force replay, so
  * signatures are bit-identical cross-engine.
  *
  * One compiled pass per document with 60 running counters, zero
  * shuffles — the groupBy spelling pays a full (doc, token-hash)
  * shuffle (map-side-combined to 61 longs, but still a shuffle per
  * doc) just to tally what the row already holds. Empty array →
  * signature 0 (no majorities); null token or null array → NULL. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def nullable: Boolean = true

  /** Shared by eval and codegen; null ⇔ a null token was present. */
  def compute(input: ArrayData): Any = {
    val n = input.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return null
      val h = Md5Prefix.i60(input.getUTF8String(i).getBytes)
      var b = 0
      while (b < 60) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (2 * counts(b) > n) sig |= 1L << b; b += 1 }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("simhasher", this, classOf[SimHash60].getName)
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.compute($v);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count-min-sketch point query: `cms_estimate(tok, sketchBytes)`
  * returns the sketch's estimated count for the token. The sketch
  * rides in as a BINARY LITERAL (the serialized form of
  * `org.apache.spark.util.sketch.CountMinSketch`) so the expression
  * works through the plain function registry — it deserializes once
  * per task (transient lazy) and each row pays only the d hash+array
  * probes of a CMS lookup, inside whole-stage codegen.
  *
  * This is the scan-side half of the sketch heavy-hitters pattern
  * ([[graft.operators.TextAnalysis.heavyHittersCms]]): pass 1 folds
  * the corpus into the O(1/ε·ln 1/δ) sketch, pass 2 filters token
  * occurrences by estimated count BEFORE any shuffle — the vocabulary
  * never shuffles, only occurrences of (estimated-)heavy tokens do. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.BinaryType)
        if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName sketch argument must be foldable (a literal) — it is " +
            "deserialized once per task, not per row")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, binary), got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def nullable: Boolean = left.nullable

  @transient private lazy val sketch: org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  /** Shared by eval and codegen. `df.stat.countMinSketch` on a string
    * column adds java.lang.String items, so the probe must hash the
    * same representation. */
  def compute(tok: org.apache.spark.unsafe.types.UTF8String): Long =
    sketch.estimateCount(tok.toString)

  override def nullSafeEval(tok: Any, bytes: Any): Any =
    compute(tok.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val self = ctx.addReferenceObj("cms", this, classOf[CmsEstimate].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Function registration, two ways:
  *  - session extension: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *  - programmatic: `GraftFunctions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.AntiJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RedundantLeftJoinElimination)
    ext.injectOptimizerRule(_ => graft.plans.InnerUniqueJoinToSemi)
    ext.injectOptimizerRule(_ => graft.plans.MergeAggSelfJoin)
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (args: Seq[Expression]) => DotProductF32(args(0), args(1))),
    (FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineF32].getName, "cosine_f32"),
      (args: Seq[Expression]) => CosineF32(args(0), args(1))),
    (FunctionIdentifier("lsh_sig"),
      new ExpressionInfo(classOf[LshSignature].getName, "lsh_sig"),
      (args: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"lsh_sig $what must be an integer literal, got $other")
        }
        LshSignature(args(0), intLit(args(1), "numPlanes"), intLit(args(2), "planeOffset"))
      }),
    (FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (args: Seq[Expression]) => {
        val n = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sigs numHashes must be an integer literal, got $other")
        }
        MinHashSigs(args(0), n)
      }),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes k must be an integer literal, got $other")
        }
        ShingleHashes(args(0), k)
      }),
    (FunctionIdentifier("l2sq_i64"),
      new ExpressionInfo(classOf[L2SqI64].getName, "l2sq_i64"),
      (args: Seq[Expression]) => L2SqI64(args(0), args(1))),
    (FunctionIdentifier("argmin_l2sq_i64"),
      new ExpressionInfo(classOf[ArgminL2SqI64].getName, "argmin_l2sq_i64"),
      (args: Seq[Expression]) => ArgminL2SqI64(args(0), args(1))),
    (FunctionIdentifier("l2sq_f64"),
      new ExpressionInfo(classOf[L2SqF64].getName, "l2sq_f64"),
      (args: Seq[Expression]) => L2SqF64(args(0), args(1))),
    (FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"gram_hashes k must be an integer literal, got $other")
        }
        GramHashes(args(0), k)
      }),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => SimHash60(args(0))),
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (args: Seq[Expression]) => CmsEstimate(args(0), args(1))),
    (FunctionIdentifier("ngrams_gen"),
      new ExpressionInfo(classOf[NgramsGenerator].getName, "ngrams_gen"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"ngrams_gen k must be an integer literal, got $other")
        }
        NgramsGenerator(args(0), k)
      }),
    // Spark's own runtime-filter sketch pair, surfaced as callable
    // functions so operators can build/apply an explicit bloom prune
    // (see Dedup.newAgainstBaseBloom): bloom_build(xxhash64(k), items,
    // bits) aggregates a binary sketch; bloom_might_contain(sketch,
    // xxhash64(k)) is the codegen'd membership predicate.
    (FunctionIdentifier("bloom_build"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_build"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))),
    (FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (args: Seq[Expression]) => {
        val k = args(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_pairs k must be an integer literal, got $other")
        }
        TopKPairs(args(0), args(1), k)
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))))

  /** Idempotent programmatic registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
