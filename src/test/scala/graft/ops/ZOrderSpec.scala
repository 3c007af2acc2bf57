package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def morton(dims: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = dims.size
    for ((v, d) <- dims.zipWithIndex; j <- 0 until bits)
      z |= ((v >> j) & 1L) << (j * n + d)
    z
  }

  test("interleave matches the reference bit layout") {
    val rows = for (i <- 1 to 500) yield (i.toLong * 2654435761L % 1024, i.toLong * 40503L % 1024)
    val df = rows.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        ZOrder.interleave(Seq(col("a"), col("b")), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    for ((a, b, z) <- got) assert(z === morton(Seq(a, b), 10), s"a=$a b=$b")
    // 3-dim, asymmetric values
    val d3 = Seq((5L, 9L, 3L)).toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 4))
      .as[Long].head()
    assert(d3 === morton(Seq(5L, 9L, 3L), 4))
  }

  test("z-clustered layout prunes files on EVERY dimension; linear sort on one") {
    // 40k points uniform on a 1024x1024 grid — java.util.Random's LCG
    // is pinned by its spec, so the layout is identical on every JVM
    // (two independent draws per point; a pair of linear congruences
    // in i would be affinely CORRELATED mod 1024 and skew the tiles)
    val rnd = new java.util.Random(42)
    val pts = (0 until 40000).map { _ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
    }
    val df = pts.toDF("x", "y")
    val files = 64

    /** Per-"file" min/max stats after a layout, as (minx,maxx,miny,maxy). */
    def stats(layout: org.apache.spark.sql.DataFrame) = layout
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .as[(Int, Long, Long, Long, Long)].collect()

    /** Files a [lo,hi] predicate on dim (extractors) cannot skip. */
    def hit(st: Seq[(Int, Long, Long, Long, Long)], onX: Boolean, lo: Long, hi: Long) =
      st.count { case (_, x0, x1, y0, y1) =>
        if (onX) x1 >= lo && x0 <= hi else y1 >= lo && y0 <= hi
      }

    val zst = stats(ZOrder.cluster(df, Seq(col("x"), col("y")), bits = 10, numFiles = files))
    val lst = stats(df.repartitionByRange(files, col("x")).sortWithinPartitions("x"))
    assert(zst.length === files && lst.length === files)

    // a 64-wide slice = 1/16 of either axis
    val zx = hit(zst.toSeq, onX = true, 256, 319)
    val zy = hit(zst.toSeq, onX = false, 256, 319)
    val lx = hit(lst.toSeq, onX = true, 256, 319)
    val ly = hit(lst.toSeq, onX = false, 256, 319)
    // linear: perfect on its sort column, useless on the other
    assert(lx <= files / 8, s"linear layout should prune hard on x, hit $lx")
    assert(ly >= files * 9 / 10, s"linear layout can't prune on y, hit $ly")
    // z-order: strong (not perfect) pruning on BOTH dimensions
    assert(zx <= files / 2, s"z layout should prune on x, hit $zx")
    assert(zy <= files / 2, s"z layout should prune on y, hit $zy")
  }

  test("cluster preserves rows exactly and drops the key") {
    val df = (1 to 999).map(i => (i.toLong % 32, i.toLong % 17, s"p$i")).toDF("x", "y", "v")
    val out = ZOrder.cluster(df, Seq(col("x"), col("y")), bits = 5, numFiles = 8)
    assert(out.columns.toSeq === Seq("x", "y", "v"))
    assert(out.count() === 999)
    assert(out.select(sum(col("x") * 31 + col("y"))).as[Long].head() ===
      df.select(sum(col("x") * 31 + col("y"))).as[Long].head())
  }
}
