package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining over a (basket, item) stream —
  * the co-selection lens the token-collocation miner
  * ([[TfIdf.cooccurTopPairs]]) applies to text, here applied to
  * transactional baskets: which items appear together more often
  * than their popularity predicts. Support, directed confidence,
  * and lift all come from exact integer counts; each emitted score
  * is one fixed IEEE operation over integer products, so rank and
  * value pin bitwise cross-engine.
  *
  * Scale shape: baskets bound the quadratic — the pair generator is
  * a self-equi-join on basket id, so fan-out is per-basket C(m, 2),
  * NOT corpus². The loud `maxBasketItems` contract keeps a
  * degenerate mega-basket (the retail analog of boilerplate) from
  * detonating a task; real pipelines cap or split such baskets
  * upstream, and this operator refuses to guess.
  */
object Basket {

  /** All item pairs co-occurring in at least `minSupport` baskets,
    * with per-item basket frequencies, both directed confidences,
    * and lift = n_xy·N / (df_a·df_b).
    *
    * Output: (item_a, item_b, n_xy, df_a, df_b, conf_ab, conf_ba,
    * lift), item_a < item_b.
    *
    * Shape: one (basket, item) distinct, one narrow max-basket-size
    * guard, one self-equi-join on basket, one pair partial agg, two
    * frequency joins, N by broadcast from a count agg. */
  def associationPairs(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L,
      maxBasketItems: Int = 10000): DataFrame = {
    require(minSupport >= 1L,
      s"minSupport must be >= 1, got $minSupport")
    require(maxBasketItems >= 2,
      s"maxBasketItems must be >= 2, got $maxBasketItems")
    val items = guardedItems(df, basketCol, itemCol, maxBasketItems)
    val dfreq = items.groupBy(col("_it").as("item"))
      .agg(count(lit(1)).as("df"))
    val nB = items.select("_bk").distinct()
      .agg(count(lit(1)).as("_N"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a._bk") === col("b._bk") && col("a._it") < col("b._it"))
      .groupBy(col("a._it").as("item_a"), col("b._it").as("item_b"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minSupport)
    pairs
      .join(dfreq.select(col("item").as("item_a"), col("df").as("df_a")),
        "item_a")
      .join(dfreq.select(col("item").as("item_b"), col("df").as("df_b")),
        "item_b")
      .crossJoin(broadcast(nB))
      .withColumn("conf_ab",
        col("n_xy").cast("double") / col("df_a").cast("double"))
      .withColumn("conf_ba",
        col("n_xy").cast("double") / col("df_b").cast("double"))
      .withColumn("lift",
        (col("n_xy") * col("_N")).cast("double")
          / (col("df_a") * col("df_b")).cast("double"))
      .select(col("item_a"), col("item_b"), col("n_xy"),
        col("df_a"), col("df_b"), col("conf_ab"), col("conf_ba"),
        col("lift"))
  }

  /** Distinct unordered co-occurrence pairs from a (basket, item)
    * stream — the guarded pair generator [[associationPairs]] builds
    * on, exposed for graph analytics over the co-occurrence
    * structure (q199's assortativity edges): pairs deduplicate
    * ACROSS baskets, and the same loud mega-basket contract bounds
    * the per-basket fan-out before the self-join runs.
    *
    * Output: (item_a, item_b), item_a < item_b, one row per pair. */
  def coPairs(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketItems: Int = 10000): DataFrame = {
    require(maxBasketItems >= 2,
      s"maxBasketItems must be >= 2, got $maxBasketItems")
    val items = guardedItems(df, basketCol, itemCol, maxBasketItems)
    items.as("a")
      .join(items.as("b"),
        col("a._bk") === col("b._bk") && col("a._it") < col("b._it"))
      .select(col("a._it").as("item_a"), col("b._it").as("item_b"))
      .distinct()
  }

  /** Distinct (basket, item) rows with the loud quadratic-fan-out
    * guard — one narrow max-basket-size pass before any self-join. */
  private def guardedItems(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketItems: Int): DataFrame = {
    val items = df
      .select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      .filter(col("_bk").isNotNull && col("_it").isNotNull)
      .distinct()
    val worst = items.groupBy("_bk").agg(count(lit(1)).as("_m"))
      .agg(max("_m")).head().getAs[Any](0)
    worst match {
      case m: Long => require(m <= maxBasketItems,
        s"a basket holds $m distinct items — beyond " +
          s"maxBasketItems=$maxBasketItems; cap or split mega-baskets " +
          "upstream (their pair fan-out is quadratic)")
      case _ => // empty input
    }
    items
  }
}
