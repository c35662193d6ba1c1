package graft.synth

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen shim for the synth-world publish-day lookup: fused
  * [[Synth.idOf]] + [[Synth.publishDay]] operating directly on the
  * UTF8String bytes (no String materialization, no Option). Semantics
  * are exactly idOf's: the tail after the LAST '-' must be 8 ASCII
  * digits — '-' (0x2D) cannot be a UTF-8 continuation byte, so the
  * byte test equals the char test on any ASCII-digit input. (Synth ids
  * are printed %08d, so non-ASCII Unicode digits — which String.toLong
  * would accept — are outside the synthetic domain by construction.) */
object SynthCodegen {
  def publishDayOfNorm(seed: Long, nowDay: Int, recencyDays: Int,
                       u: UTF8String): Int = {
    val n = u.numBytes()
    if (n < 9 || u.getByte(n - 9) != '-'.toByte) return -1
    var id = 0L
    var i = n - 8
    while (i < n) {
      val b = u.getByte(i)
      if (b < '0'.toByte || b > '9'.toByte) return -1
      id = id * 10L + (b - '0'.toByte)
      i += 1
    }
    Synth.publishDay(seed, nowDay, recencyDays, id)
  }
}

/** `publish_day(norm_url)` for the synthetic world — the one remaining
  * per-row Scala UDF on the discovery hot path, re-expressed as a
  * native expression so the F-chain projection stays in one
  * whole-stage-codegen span (round-4 verdict Wrong #4). Config
  * constants are baked in as literals at plan time, so the generated
  * code is wave-invariant (codegen cache hit across waves). */
case class PublishDay(child: Expression, seed: Long, nowDay: Int,
                      recencyDays: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    SynthCodegen.publishDayOfNorm(seed, nowDay, recencyDays,
      v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.synth.SynthCodegen$$.MODULE$$.publishDayOfNorm(" +
        s"${seed}L, $nowDay, $recencyDays, $c)")
  override protected def withNewChildInternal(c: Expression): PublishDay =
    copy(child = c)
}

object SynthFunctions {
  def publish_day(c: Column, cfg: Synth.Config): Column =
    ExpressionUtils.column(PublishDay(ExpressionUtils.expression(c),
      cfg.seed, cfg.nowDay, cfg.recencyDays))
}
