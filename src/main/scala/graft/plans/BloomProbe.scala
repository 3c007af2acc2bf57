package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] against a long key.
  *
  * The scale pattern this enables (reference: the n-gram decontamination
  * check, `bytehub`-style eval hygiene generalized to corpus scale): when
  * the SMALL side of a semi-join is too big to broadcast raw (tens of
  * millions of eval grams = GBs of digests) but its *bloom* is a few MB,
  * build the filter once with `df.stat.bloomFilter` (a distributed
  * aggregate), then prune the 100 TB side with this expression BEFORE
  * any exchange. The probe runs inside whole-stage codegen next to the
  * scan, so pruned rows never leave the scan stage — shuffle volume
  * drops from all-corpus-grams to (true matches + fpp x corpus grams).
  * False positives are harmless by construction: survivors still flow
  * into the exact join, so the final result is bit-identical to the
  * un-pruned plan (asserted by the `txt_decontam_bloom` oracle gate,
  * which shares `txt_contamination`'s SQL).
  *
  * The filter rides the expression tree as a task-serialized reference
  * object (`BloomFilterImpl` is `Serializable` — the same way Spark's
  * own injected runtime bloom filters travel), registered in generated
  * code via `addReferenceObj`, so evaluation is one virtual call and
  * two hash probes per row with zero allocation.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key (hash the value first), got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point: probe `bloom` with a long key column. */
  def probe(key: Column, bloom: BloomFilter): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloom))
  }
}
