package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BinLengthSpec extends SparkSpec {
  import spark.implicits._

  private val edgeCases: Seq[Long] = Seq(
    0L, 1L, 2L, 3L, 7L, 8L, 255L, 256L, 65535L, 65536L,
    (1L << 20) - 1, 1L << 20, (1L << 52) + 17, Long.MaxValue,
    -1L, -42L, Long.MinValue)

  test("bin_len == length(bin(x)) for every long shape") {
    val df = (edgeCases ++ (1 to 2000).map(i => i * 2654435761L)).toDF("x")
    val mismatches = df.select(col("x"),
        BinLength.binLen(col("x")).as("fast"),
        length(bin(col("x"))).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .collect()
    assert(mismatches.isEmpty, mismatches.mkString(", "))
  }

  test("interpreted eval matches codegen") {
    for (v <- edgeCases) {
      val interp = BinLength(org.apache.spark.sql.catalyst.expressions.Literal(v))
        .eval(null).asInstanceOf[Int]
      val viaDf = Seq(v).toDF("x").select(BinLength.binLen(col("x"))).head.getInt(0)
      assert(interp === viaDf, s"v=$v")
    }
  }

  test("null in, null out; non-long input is cast") {
    val r = Seq((java.lang.Long.valueOf(5L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("x", "tag").select(BinLength.binLen(col("x")).as("l"), col("tag"))
      .collect().map(row => (row.getAs[Any]("l"), row.getString(1))).toMap.map(_.swap)
    assert(r("a") === 3)
    assert(r("b") == null)
    // int input casts to long under binLen's own cast
    assert(Seq(12).toDF("x").select(BinLength.binLen(col("x"))).head.getInt(0) === 4)
  }
}
