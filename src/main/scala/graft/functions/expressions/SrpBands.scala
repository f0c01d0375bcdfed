package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Sign-random-projection (SRP) LSH banding parameters + the shared
  * deterministic weight matrix.
  *
  * Weights are Rademacher (+1/-1) draws from `java.util.Random(7)` —
  * the JDK generator's algorithm is fixed by its specification, so the
  * matrix is identical on every JVM, and the DuckDB oracle inlines the
  * SAME matrix as a SQL literal (generated from this object), making
  * signatures bit-identical across engines by construction. The sums
  * use the library's usual 1e6 fixed-point quantization, so the SIGN
  * of each projection (all that SRP keeps) is exact in both engines.
  *
  * Parameter choice (measured on the harness embeddings, see
  * `Dedup.qEmbedNearDupLsh` for the honest scale discussion):
  * 160 projections in 40 bands of 4 bits give full recall at
  * cosine >= 0.4 on sf0.001/0.01/0.1.
  */
object SrpLsh {
  val Bits = 160          // projections (signature bits) per vector
  val BandBits = 4        // bits per band
  val Bands: Int = Bits / BandBits
  val Dim = 64            // harness embedding dimensionality
  val Seed = 7L

  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()

  /** Flat row-major weight matrix for a seed: w(j, pos) =
    * flat(j * Dim + pos). Each seed is an INDEPENDENT hash family —
    * the textbook LSH amplification axis that rotation layouts
    * ([[graft.operators.Dedup.srpWideBands]]) cannot provide (only
    * `group` distinct rotations of one signature exist, and they are
    * correlated). Memoized per seed: the arrays are codegen reference
    * objects and must be stable across plan compilations. */
  def flatWeightsFor(seed: Long): Array[Long] =
    weightCache.computeIfAbsent(seed, s => {
      val rng = new java.util.Random(s)
      Array.fill(Bits * Dim)(if (rng.nextBoolean()) 1L else -1L)
    })

  /** The default-family matrix (seed [[Seed]]). */
  def flatWeights: Array[Long] = flatWeightsFor(Seed)
}

/** Catalyst expression: ARRAY<FLOAT> embedding -> ARRAY<INT> of
  * [[SrpLsh.Bands]] band values, each packing [[SrpLsh.BandBits]]
  * projection sign bits (bit k of band b = sign of projection
  * b*BandBits+k). One codegen'd primitive loop per row — the
  * signature never leaves whole-stage codegen, and per-vector output
  * is 40 ints regardless of dimensionality (the property that makes
  * the candidate generator's shuffle O(n), not O(n*dim)). */
case class SrpBands(child: Expression, seed: Long = SrpLsh.Seed)
    extends UnaryExpression {
  override def prettyName: String = "srp_bands"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  /** Fail fast at analysis time on a non-ARRAY<FLOAT> child: the eval
    * reads elements with getFloat, so an ARRAY<DOUBLE> argument (the
    * default SQL array literal type) would otherwise be silently
    * misread into garbage signatures that feed dedup decisions. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_bands requires ARRAY<FLOAT>, got ${other.simpleString}")
    }

  /** The weight matrix is sized for exactly [[SrpLsh.Dim]] dims; a
    * shorter/longer vector means the caller's embedding space doesn't
    * match the index — truncating silently would produce signatures
    * that diverge from the oracle with no error. */
  @inline private def requireDim(n: Int): Unit =
    if (n != SrpLsh.Dim) throw new IllegalArgumentException(
      s"srp_bands: expected ${SrpLsh.Dim}-dim embedding, got $n elements")

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    requireDim(x.numElements())
    val n = SrpLsh.Dim
    val w = SrpLsh.flatWeightsFor(seed)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = java.lang.Math.floor(x.getFloat(i).toDouble * 1.0e6 + 0.5).toLong
      i += 1
    }
    val bands = new Array[Int](SrpLsh.Bands)
    var j = 0
    while (j < SrpLsh.Bits) {
      var s = 0L
      i = 0
      while (i < n) { s += w(j * SrpLsh.Dim + i) * q(i); i += 1 }
      if (s >= 0L) bands(j / SrpLsh.BandBits) |= 1 << (j % SrpLsh.BandBits)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("srpWeights", SrpLsh.flatWeightsFor(seed), "long[]")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val bands = ctx.freshName("bands")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != ${SrpLsh.Dim}) {
         |  throw new IllegalArgumentException(
         |    "srp_bands: expected ${SrpLsh.Dim}-dim embedding, got " + $a.numElements() + " elements");
         |}
         |int $n = ${SrpLsh.Dim};
         |long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $q[$i] = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 1.0e6 + 0.5);
         |}
         |int[] $bands = new int[${SrpLsh.Bands}];
         |for (int $j = 0; $j < ${SrpLsh.Bits}; $j++) {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $w[$j * ${SrpLsh.Dim} + $i] * $q[$i];
         |  }
         |  if ($s >= 0L) $bands[$j / ${SrpLsh.BandBits}] |= 1 << ($j % ${SrpLsh.BandBits});
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($bands);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SrpBands {
  def srp_bands(e: Column): Column = Bridge.column(SrpBands(Bridge.expression(e)))
  /** Seeded form: an independent SRP hash family per seed. */
  def srp_bands(e: Column, seed: Long): Column =
    Bridge.column(SrpBands(Bridge.expression(e), seed))
}
