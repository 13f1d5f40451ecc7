package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

/** The scale utilities must be result-identical to the plain operators
  * they replace, and bucketed tables must join without an exchange. */
class ScaleSpec extends SparkSuite {

  test("salted join equals plain inner join") {
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "value")
    val users = Tables.load(spark, sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_total"))
    val plain = events.join(users, Seq("user_id"), "inner")
    val salted = Scale.saltedJoin(events, users, "user_id", 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted two-phase aggregation equals plain groupBy") {
    val events = Tables.load(spark, sfDir, "events")
    val plain = events.groupBy(col("user_id"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val salted = Scale.saltedSumCount(events, "user_id", "value", 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(salted.keySet == plain.keySet)
    // double sums may differ in fold order across the extra phase —
    // compare within float tolerance, counts exactly
    salted.foreach { case (k, (s, n)) =>
      assert(n == plain(k)._2)
      assert(math.abs(s - plain(k)._1) < 1e-9 * math.max(1.0, math.abs(s)))
    }
  }

  test("bucketed tables join with zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val joined = spark.conf.get("spark.sql.autoBroadcastJoinThreshold") match {
        case _ =>
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.table("b_orders").join(spark.table("b_lineitem"),
            col("o_orderkey") === col("l_orderkey"))
      }
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        Tables.load(spark, sfDir, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
