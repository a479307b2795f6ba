package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's bytes:
  *
  *   h_0 = 0;  h_i = (h_{i-1} * 131 + byte_i) mod (2^31 - 1)
  *
  * A native Catalyst `Expression` with full whole-stage-codegen support
  * (`doGenCode` emits a tight byte loop) — the document-fingerprinting
  * primitive for the training-data pipeline extensions, deliberately NOT
  * a Scala UDF so it stays inside the codegen'd stage.
  *
  * Engine-portability: for ASCII input the DuckDB twin is
  * `list_reduce(list_prepend(0, list_transform(range(1, length(t)+1),
  *   i -> ascii(substr(t, i, 1)))), (a, b) -> (a*131 + b) % 2147483647)`
  * (bytes == codepoints for ASCII; mod 2^31-1 keeps `h*131 + b` < 2^38,
  * overflow-free in both engines).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  private final val Base = 131L
  private final val Mod = 2147483647L // 2^31 - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${Base}L + ($bytes[$i] & 0xff)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
