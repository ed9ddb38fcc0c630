package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket affinity operators — association rules (Agrawal &
  * Srikant, VLDB 1994's support/confidence frame plus lift) and
  * item-item co-occurrence neighbors (the classic "customers who bought
  * X also bought Y" item-based collaborative filter, Sarwar et al. WWW
  * 2001) — over (basket, item) membership pairs.
  *
  * Scale shape: the corpus pays ONE distinct + ONE per-basket aggregate;
  * in-basket pairs explode from each basket's SORTED item list via
  * stacked generators (the q247 wedge-list trick — no basket-keyed
  * self-join, no row ever wider than one basket), and every per-item
  * statistic joins back BROADCAST (the item dimension is bounded).
  * Oversized baskets — the quadratic hazard: one "everything" basket at
  * 100 TB yields |basket|² pairs — are DROPPED by `maxBasket` before the
  * pair explode, the same hub guard as Adamic-Adar's `maxDeg`; the cap
  * and its trade are part of the contract, and the count of dropped
  * baskets is cheap to audit separately (one HAVING).
  *
  * All metrics are exact integers: support/confidence in basis points by
  * BIGINT floor division, lift in milli with the single-division
  * numerator `n_both·n_baskets·1000` (≤ ~4·10¹³ at any realistic basket
  * count — far inside signed 64 bits), cosine via the suite's sim_bp
  * convention (`round(x·10⁴/√(n_a·n_b))` on exact integer counts).
  */
object Affinity {

  /** Per-basket item lists after the distinct + size guard: (__bk, __is)
    * with `__is` sorted ascending so pair enumeration is canonical
    * (a < b) without a post-filter.
    */
  private def basketLists(df: DataFrame, basketCol: String, itemCol: String,
                          maxBasket: Int): DataFrame =
    df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
      .groupBy(col("__bk"))
      .agg(sort_array(collect_list(col("__it"))).as("__is"))
      .filter(size(col("__is")).between(2, maxBasket))

  /** The stacked-generator in-basket pair column over a SORTED item-list
    * column: one struct('a','b') element per unordered pair, a < b by the
    * list's sort order. Pair mass is |basket|²-bounded by the caller's
    * basket guard, never a join blow-up. Shared by the batch operators
    * and the streaming window-close projection.
    *
    * Degenerate lists guard themselves: below size 2 the generator's
    * `sequence(1, size-1)` would DESCEND ([1, 0] on a singleton) and
    * emit out-of-range garbage pairs, so the expression short-circuits
    * to the empty pair list — an unguarded future caller gets the
    * correct "no pairs" instead of silent corruption.
    */
  private[graft] def pairsOf(listCol: String): Column = expr(
    s"""CASE WHEN size($listCol) >= 2
       |  THEN flatten(transform(sequence(1, size($listCol) - 1),
       |    i -> transform(sequence(i + 1, size($listCol)),
       |      j -> named_struct('a', $listCol[i-1], 'b', $listCol[j-1]))))
       |  ELSE array() END""".stripMargin)

  /** Canonical (a < b) in-basket pair counts via stacked generators over
    * the sorted item list — pair mass is Σ|basket|² bounded by
    * `maxBasket`·Σ|basket|, never a join blow-up.
    */
  private[graft] def pairCounts(df: DataFrame, basketCol: String, itemCol: String,
                                maxBasket: Int): DataFrame =
    basketLists(df, basketCol, itemCol, maxBasket)
      .select(explode(pairsOf("__is")).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(count(lit(1)).as("n_both"))

  /** Per-item basket counts and the 1-row basket total, both restricted
    * to the SAME capped basket population the pairs come from (so
    * support/confidence denominators are consistent).
    */
  private def itemCounts(lists: DataFrame): (DataFrame, DataFrame) = {
    val items = lists.select(col("__bk"), explode(col("__is")).as("__it"))
    (items.groupBy(col("__it")).agg(count(lit(1)).as("__ni")),
      lists.agg(count(lit(1)).as("__nb")))
  }

  /** Top-`topK` association rules by lift: one row per DIRECTED rule
    * antecedent → consequent (each unordered pair yields both directions
    * — same lift, different confidence). `minBoth` is the absolute
    * min-support floor applied BEFORE the per-item joins.
    *
    * Output: (antecedent, consequent, n_ante, n_cons, n_both,
    * support_bp, confidence_bp, lift_milli), ordered by (lift desc,
    * confidence desc, antecedent, consequent) — a total order, fused to
    * one TakeOrdered.
    */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
                  minBoth: Long = 2L, maxBasket: Int = 64,
                  topK: Int = 30): DataFrame = {
    require(maxBasket >= 2, "maxBasket must be >= 2")
    require(topK > 0, "topK must be positive")
    val lists = basketLists(df, basketCol, itemCol, maxBasket)
    val (ni, nb) = itemCounts(lists)
    val pairs = pairCounts(df, basketCol, itemCol, maxBasket)
      .filter(col("n_both") >= minBoth)
    val directed = pairs.select(col("a").as("antecedent"), col("b").as("consequent"), col("n_both"))
      .unionByName(pairs.select(col("b").as("antecedent"), col("a").as("consequent"), col("n_both")))
    directed
      .join(broadcast(ni.select(col("__it").as("antecedent"), col("__ni").as("n_ante"))), Seq("antecedent"))
      .join(broadcast(ni.select(col("__it").as("consequent"), col("__ni").as("n_cons"))), Seq("consequent"))
      .crossJoin(broadcast(nb))
      .select(col("antecedent"), col("consequent"), col("n_ante"), col("n_cons"), col("n_both"),
        expr("n_both * 10000 div __nb").as("support_bp"),
        expr("n_both * 10000 div n_ante").as("confidence_bp"),
        // lift numerator n_both·n_baskets·1000 wraps signed 64-bit when
        // n_both·n_baskets > 9.2·10¹⁵ (a near-ubiquitous pair at ~10⁸+
        // baskets), and the divisor wraps at n_ante,n_cons > 3·10⁹ — so
        // both stage through the selfJoinSizeAudit convention: exact
        // BIGINT inside the checked bound, single-rounded saturating
        // double beyond it (neither engine wraps or errors; the oracle
        // replays the identical branch)
        expr("""CASE WHEN n_both <= 9200000000000000L div __nb
          |   AND n_ante <= 3000000000L AND n_cons <= 3000000000L
          | THEN n_both * __nb * 1000 div (n_ante * n_cons)
          | ELSE CAST(least(round(CAST(n_both AS DOUBLE) * __nb * 1000.0
          |   / (CAST(n_ante AS DOUBLE) * n_cons)), 9.2e18) AS BIGINT)
          | END""".stripMargin).as("lift_milli"))
      .orderBy(col("lift_milli").desc, col("confidence_bp").desc,
        col("antecedent"), col("consequent"))
      .limit(topK)
  }

  /** Item-item co-occurrence neighbors: for every item its top-`k`
    * most-similar items by the cosine of basket-membership vectors —
    * `n_both / √(n_a·n_b)` in the suite's exact sim_bp convention. The
    * item-based collaborative-filtering model table (Sarwar et al. 2001):
    * at serving time "also bought" reads one row group per item.
    *
    * Output: (item, nbr, n_item, n_nbr, n_both, cosine_bp, rnk ≤ k).
    */
  def itemNeighbors(df: DataFrame, basketCol: String, itemCol: String,
                    minBoth: Long = 2L, maxBasket: Int = 64,
                    k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val lists = basketLists(df, basketCol, itemCol, maxBasket)
    val (ni, _) = itemCounts(lists)
    val pairs = pairCounts(df, basketCol, itemCol, maxBasket)
      .filter(col("n_both") >= minBoth)
    val directed = pairs.select(col("a").as("item"), col("b").as("nbr"), col("n_both"))
      .unionByName(pairs.select(col("b").as("item"), col("a").as("nbr"), col("n_both")))
    val scored = directed
      .join(broadcast(ni.select(col("__it").as("item"), col("__ni").as("n_item"))), Seq("item"))
      .join(broadcast(ni.select(col("__it").as("nbr"), col("__ni").as("n_nbr"))), Seq("nbr"))
      .select(col("item"), col("nbr"), col("n_item"), col("n_nbr"), col("n_both"),
        round(col("n_both") * lit(10000.0) /
          sqrt(col("n_item").cast("double") * col("n_nbr").cast("double")))
          .cast("long").as("cosine_bp"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("item"))
          .orderBy(col("cosine_bp").desc, col("nbr"))).cast("long"))
      .filter(col("rnk") <= k)
  }
}
