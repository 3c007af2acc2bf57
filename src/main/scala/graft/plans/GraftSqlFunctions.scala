package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{QuantileSketch, SimilarityOps, TextOps}
import graft.ops.ZOrder

/** SQL registration of the engine's Column-composition primitives, so
  * a pure-SQL user gets the similarity/text toolkit without touching
  * the Scala API: `SELECT jaccard(a.sh, b.sh) FROM ...`,
  * `minhash_sig(sh, 12)`, `lsh_band_key(sig, 1, 2)`, `simhash16(toks)`,
  * `hamming(x, y)`, `word_shingles(toks, 3)`, `token_count(text)`,
  * `lang_id(toks)`, `alpha_ratio(text)`, `doc_fingerprint(toks)`,
  * `qsketch_bucket(cents, 7)`, `zorder_key(a, b, 16)`.
  *
  * Each builder re-expresses the registered call as the SAME Column
  * composition the Scala API produces (one shared implementation — the
  * SQL spelling can never drift from the library's), then hands the
  * underlying expression tree back to the analyzer; everything stays
  * codegen'd built-ins, no UDFs. Sizing arguments (k, band bounds)
  * must be literals — they parameterize the expression SHAPE, exactly
  * like the Scala signatures taking Int.
  *
  * Installed by [[GraftExtensions]] (`spark.sql.extensions`) or
  * [[GraftSqlFunctions.register]] on a live session.
  */
object GraftSqlFunctions {

  private def c(e: Expression): Column = ColumnBridge.column(e)

  private def intLit(e: Expression, fn: String, pos: Int): Int = {
    require(e.foldable, s"$fn: argument $pos must be a literal integer")
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long    => l.toInt
      case s: java.lang.Short   => s.toInt
      case b: java.lang.Byte    => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument $pos must be a literal integer, got $other")
    }
  }

  /** (name, arity, Column-composition builder). */
  private val fns: Seq[(String, Int, Seq[Expression] => Column)] = Seq(
    ("jaccard", 2, es => SimilarityOps.jaccard(c(es(0)), c(es(1)))),
    ("minhash_sig", 2,
      es => SimilarityOps.minhashSig(c(es(0)), intLit(es(1), "minhash_sig", 2))),
    ("lsh_band_key", 3, es => SimilarityOps.bandKey(c(es(0)),
      intLit(es(1), "lsh_band_key", 2), intLit(es(2), "lsh_band_key", 3))),
    ("simhash16", 1, es => SimilarityOps.simhash16(c(es(0)))),
    ("hamming", 2, es => SimilarityOps.hamming(c(es(0)), c(es(1)))),
    ("word_shingles", 2,
      es => TextOps.wordShingles(c(es(0)), intLit(es(1), "word_shingles", 2))),
    ("token_count", 1, es => TextOps.tokenCount(c(es(0)))),
    ("lang_id", 1, es => TextOps.langId(c(es(0)))),
    ("alpha_ratio", 1, es => TextOps.alphaRatio(c(es(0)))),
    ("doc_fingerprint", 1, es => TextOps.fingerprint(c(es(0)))),
    // quantile-sketch bucket of an integer-scaled value (s bits)
    ("qsketch_bucket", 2,
      es => QuantileSketch.bucketKey(c(es(0)), intLit(es(1), "qsketch_bucket", 2))),
    // 2-dim Morton key for OPTIMIZE ZORDER-style layouts
    ("zorder_key", 3, es => ZOrder.interleave(
      Seq(c(es(0)), c(es(1))), intLit(es(2), "zorder_key", 3))),
    // native length(bin(x)) — the sketch suite's bit-length primitive
    ("bin_len", 1, es => BinLength.binLen(c(es(0)))))

  private def builder(name: String, arity: Int, b: Seq[Expression] => Column)
      : Seq[Expression] => Expression = { es =>
    require(es.length == arity, s"$name takes $arity arguments, got ${es.length}")
    // eager node→expression conversion: the lazy wrapper resolves
    // through the Dataset API but not through the function registry
    ColumnBridge.analyzableExpression(b(es))
  }

  /** `spark.sql.extensions` path — used by [[GraftExtensions]]. */
  def inject(ext: SparkSessionExtensions): Unit = fns.foreach { case (n, k, b) =>
    ext.injectFunction((new FunctionIdentifier(n),
      new ExpressionInfo(GraftSqlFunctions.getClass.getName, n), builder(n, k, b)))
  }

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit = fns.foreach { case (n, k, b) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(n, builder(n, k, b), "built-in")
  }
}
