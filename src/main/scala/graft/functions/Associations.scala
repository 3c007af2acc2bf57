package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: pairwise co-occurrence with
  * support/confidence/lift — the "frequently bought together" rules an
  * analytics engine derives from an order-lines fact table.
  */
object Associations {

  /** Pairwise co-occurrence rules over (basket, item) lines. One
    * distinct pass dedups repeated lines (the same item twice in a
    * basket is ONE occurrence), then a self-join on the basket key
    * pairs items within each basket — candidate volume is
    * Σ_b |b|·(|b|−1)/2, linear in baskets for the bounded
    * items-per-basket of any real fact table, and the (a, b) pair
    * counts combine map-side before the one pair-keyed shuffle. The
    * `minCo` support prune (apriori's downward-closure cut applied at
    * the pair level) keeps the rule table result-sized. Item totals
    * join back item-dictionary-sized; the 1-row basket count broadcasts.
    *
    * Determinism: support/counts are exact integers (products ride
    * decimal(38,0) so a 100 TB basket count cannot wrap a long);
    * confidence = co ⁄ count(a) and lift = co·N ⁄ (count(a)·count(b))
    * each close with ONE IEEE division, rounded at 6.
    */
  def coOccurrence(
      lines: DataFrame,
      basketCol: String,
      itemCol: String,
      minCo: Long): DataFrame = {
    require(minCo >= 1, s"minCo must be >= 1, got $minCo")
    val li = lines.select(col(basketCol).as("__bk"), col(itemCol).as("__it")).distinct()
    val n = li.agg(countDistinct(col("__bk")).as("__n"))
    val cnt = li.groupBy(col("__it")).agg(count(lit(1)).as("__cnt"))
    val co = li.as("a").join(li.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("item_a"), col("b.__it").as("item_b"))
      .agg(count(lit(1)).as("co_count"))
      .filter(col("co_count") >= minCo)
    co.join(cnt.select(col("__it").as("item_a"), col("__cnt").as("count_a")), Seq("item_a"))
      .join(cnt.select(col("__it").as("item_b"), col("__cnt").as("count_b")), Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("co_count"),
        col("count_a"), col("count_b"),
        round(col("co_count").cast("double") / col("count_a").cast("double"), 6)
          .as("confidence"),
        round((col("co_count").cast("decimal(38,0)") * col("__n")).cast("double") /
          (col("count_a").cast("decimal(38,0)") * col("count_b")).cast("double"), 6)
          .as("lift"))
  }
}
