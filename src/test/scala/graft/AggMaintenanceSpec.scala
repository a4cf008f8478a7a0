package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** Semantic laws for the grouping-sets grid and incremental aggregate
  * maintenance (the DuckDB oracle already pins incremental == full
  * single-pass; these pin the properties the oracle can't see). */
class AggMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("cube levels are consistent: every aggregation level sums to the grand total") {
    val rows = AnalyticsQueries.all("q_grouping_sets")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getLong(4)))
    val byGid = rows.groupBy(_._1)
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L))
    val grand = byGid(3L).head
    for (gid <- Seq(0L, 1L, 2L)) {
      assert(byGid(gid).map(_._3).sum === grand._3,
        s"gid=$gid n_items disagrees with the grand total")
      assert(math.abs(byGid(gid).map(_._2).sum - grand._2) < 0.05,
        s"gid=$gid sum_price disagrees with the grand total")
    }
  }

  test("incremental state merge is split-invariant: a 3-way hash split folds to the same result") {
    // the query entry splits by ship date; re-derive with an unrelated
    // 3-way split (orderkey mod 3) — ANY partition of the fact table
    // must fold to the identical aggregate, or the state is not a
    // commutative monoid and incremental maintenance would drift
    val li = Tables.load(spark, sfDir, "lineitem")
    def state(df: DataFrame): DataFrame =
      df.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum(round($"l_quantity" * 100).cast("long")).as("qty_cents"),
          sum(round($"l_extendedprice" * 100).cast("long")).as("price_cents"),
          count(lit(1)).as("n_rows"))
    val threeWay = (0 to 2).map(i => state(li.filter($"l_orderkey" % 3 === i)))
      .reduce(_ unionByName _)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"qty_cents").as("qty_cents"),
        sum($"price_cents").as("price_cents"),
        sum($"n_rows").as("n_rows"))
      .select($"l_returnflag", $"l_linestatus",
        round($"qty_cents" / 100.0, 2).as("sum_qty"),
        round($"price_cents" / 100.0, 2).as("sum_price"),
        $"n_rows",
        round(($"price_cents" / 100.0) / $"n_rows", 4).as("avg_price"))
      .orderBy($"l_returnflag", $"l_linestatus")
      .collect().toSeq
    val entry = AnalyticsQueries.all("q_incremental_agg")(spark, sfDir)
      .collect().toSeq
    assert(threeWay === entry)
  }
}
