package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression fusing the streaming LSH index's whole
  * per-document pipeline — 5-gram shingles of the space-split text,
  * 32-bit md5 hash per shingle, 16-permutation MinHash, 4 packed band
  * keys — into ONE compiled pass per row (codegen emits a single call
  * into [[LshBandsText.compute]]; no CodegenFallback, no intermediate
  * shingle/hash arrays materialized per row).
  *
  * Replaces the HOF chain `array_distinct(transform(transform(
  * sequence...), md5...))` + 16 `array_min(transform(...))` columns:
  * higher-order functions evaluate their lambdas interpreted, and the
  * md5-per-shingle pass dominated q_stream_lsh_index's addBatch. Every
  * step reproduces the SQL semantics bit-for-bit — `split(text, ' ')`
  * keeps empty tokens (Java regex split, limit −1), shingles join with
  * a single space over exactly 5 tokens, the hash is the first 8 hex
  * chars of md5 over the UTF-8 bytes (0..2³²−1, so the permutation
  * arithmetic never overflows), and minima/band packing are the exact
  * integer recurrence of `graft.ops.Dedup.minhashAggs` — so the DuckDB bands CTE
  * (Dedup.bandsCteSql) still hash-matches. NULL when the text has
  * fewer than 5 tokens (the `size(hs) > 0` filter's semantics). */
case class LshBandsText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands_text expects STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    LshBandsText.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val out = ctx.freshName("bands")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.LshBandsText.compute($s);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LshBandsText = copy(child = newChild)
}

object LshBandsText {
  // MD5 digest per executor thread, reset per shingle — allocating one
  // per row put getInstance on the exact hot path this expression
  // exists to flatten.
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The whole fused pipeline; static so generated code can call it.
    * Returns null when fewer than 5 tokens. */
  def compute(text: UTF8String): ArrayData = {
    // identical token semantics to split(text, ' '): Java regex split
    // with limit -1 (single-space pattern needs no regex machinery)
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 5) return null
    val md = digests.get()
    val m = Array.fill(16)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + 4 < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2)).append(' ').append(toks(i + 3)).append(' ')
        .append(toks(i + 4))
      md.reset()
      val dig = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars = the top 4 digest bytes, unsigned
      val x = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      var k = 0
      while (k < 16) {
        val h = ((2 * k + 1) * x + (7 * k + 3)) % 2147483647L
        if (h < m(k)) m(k) = h
        k += 1
      }
      i += 1
    }
    val bands = new Array[Long](4)
    var b = 0
    while (b < 4) {
      bands(b) = m(4 * b) + 31L * m(4 * b + 1) +
        961L * m(4 * b + 2) + 29791L * m(4 * b + 3)
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** Arity-checked builder shared by the registry hooks: a zero-arg or
    * multi-arg `lsh_bands_text(...)` call must fail analysis cleanly,
    * not throw NoSuchElementException / silently drop arguments. */
  def build(exprs: Seq[Expression]): LshBandsText = {
    if (exprs.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "lsh_bands_text",
          "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString,
          "docroot" -> ""))
    LshBandsText(exprs.head)
  }

  /** Register `lsh_bands_text` in the session's function registry
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bands_text", build, "scala_udf")
}
