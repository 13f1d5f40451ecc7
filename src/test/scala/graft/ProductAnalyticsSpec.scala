package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 product-analytics and CDF gates that the
  * oracle hash can't articulate: retention identities, funnel ordering
  * invariants, and change-feed classification. */
class ProductAnalyticsSpec extends SparkSuite {

  test("q105 retention: offset 0 is the full cohort and sizes partition users") {
    val r = ops.Analytics.retentionCohorts(spark, sfDir).collect()
    val day0 = r.filter(_.getAs[Int]("day_offset") == 0)
    assert(day0.nonEmpty)
    day0.foreach { row =>
      assert(row.getAs[Long]("active_users") == row.getAs[Long]("cohort_size"),
        s"cohort ${row.getAs[String]("cohort_day")} not fully active on day 0")
      assert(row.getAs[Double]("retention_rate") == 1.0)
    }
    val totalUsers = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(day0.map(_.getAs[Long]("cohort_size")).sum == totalUsers,
      "cohort sizes must partition the user base")
    // retention never exceeds 1 and active_users never exceeds size
    r.foreach(row => assert(
      row.getAs[Long]("active_users") <= row.getAs[Long]("cohort_size")))
  }

  test("q107 funnel: stage times are strictly ordered inside their windows") {
    val rows = ops.Analytics.funnelStages(spark, sfDir).collect()
    val clickW = ops.Analytics.FunnelClickWindowHours * 3600L * 1000000L
    val buyW = ops.Analytics.FunnelPurchaseWindowHours * 3600L * 1000000L
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Int]("funnel_stage")
      def us(c: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
      (us("signup_us"), us("click_us"), us("purchase_us")) match {
        case (Some(s), Some(c), Some(p)) =>
          assert(stage == 3 && s < c && c <= s + clickW && c < p && p <= c + buyW)
        case (Some(s), Some(c), None) =>
          assert(stage == 2 && s < c && c <= s + clickW)
        case (Some(_), None, None) => assert(stage == 1)
        case (None, None, None)    => assert(stage == 0)
        case other => fail(s"non-prefix funnel state $other at stage $stage")
      }
    }
  }

  test("funnel equals a brute-force replay on random event streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val types = Vector("signup", "click", "purchase", "view", "error")
    val base = 1700000000000000L // µs epoch, arbitrary
    val events = (0 until 8).flatMap { u =>
      (0 until 40).map { i =>
        val us = base + rnd.nextInt(5 * 24 * 3600) * 1000000L + i // unique
        (u * 40 + i.toLong, new java.sql.Timestamp(us / 1000),
          u.toLong, types(rnd.nextInt(types.size)), 1.0, "{}")
      }
    }
    val tmp = java.nio.file.Files.createTempDirectory("funnelprop").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val clickW = ops.Analytics.FunnelClickWindowHours * 3600L * 1000000L
    val buyW = ops.Analytics.FunnelPurchaseWindowHours * 3600L * 1000000L
    // brute force: replay each user's stream in time order. The
    // java.sql.Timestamp constructor floors to millis here (the
    // generated µs are ms-aligned plus the uniqueness counter), so
    // re-derive the expected micros from what parquet actually stores
    val stored = spark.read.parquet(s"$tmp/events.parquet")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = stored.groupBy(_._1).map { case (u, evs) =>
      val sorted = evs.sortBy(_._3)
      val s1 = sorted.collectFirst { case (_, "signup", t) => t }
      val s2 = s1.flatMap(s => sorted.collectFirst {
        case (_, "click", t) if t > s && t <= s + clickW => t })
      val s3 = s2.flatMap(c => sorted.collectFirst {
        case (_, "purchase", t) if t > c && t <= c + buyW => t })
      u -> (s1, s2, s3)
    }
    val got = ops.Analytics.funnelStages(spark, tmp).collect().map { r =>
      def us(c: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
      r.getAs[Long]("user_id") ->
        (us("signup_us"), us("click_us"), us("purchase_us"))
    }.toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (u, want) =>
      assert(got(u) == want, s"user $u: got ${got(u)}, want $want")
    }
  }

  test("q106 change feed classifies inserts/updates/deletes against the states") {
    val changes = cdc.Cdc.changeDataFeed(spark, sfDir).collect()
    assert(changes.nonEmpty)
    // one row per changed key
    assert(changes.map(_.getAs[Long]("user_id")).distinct.length == changes.length)
    val allowed = Set("insert", "update_postimage", "delete")
    assert(changes.forall(r => allowed(r.getAs[String]("_change_type"))))
    // re-derive the two states independently and check classification
    val e = Tables.load(spark, sfDir, "events")
    def state(src: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
      cdc.Cdc.latestPerKey(src, Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .filter(col("event_type") =!= "error")
        .select("user_id", "event_id", "event_type", "value").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val pre = state(e.filter(
      col("ts") < lit(cdc.Cdc.CdfCutoff).cast("timestamp")))
    val post = state(e)
    changes.foreach { r =>
      val u = r.getAs[Long]("user_id")
      r.getAs[String]("_change_type") match {
        case "insert" =>
          assert(!pre.contains(u) && post.contains(u))
          assert(r.getAs[Long]("event_id") == post(u)._1, s"user $u post-image")
        case "delete" =>
          assert(pre.contains(u) && !post.contains(u))
          assert(r.getAs[Long]("event_id") == pre(u)._1, s"user $u pre-image")
        case "update_postimage" =>
          assert(pre.contains(u) && post.contains(u) && pre(u) != post(u))
          assert(r.getAs[Long]("event_id") == post(u)._1, s"user $u post-image")
      }
    }
    // completeness: every differing key appears exactly once
    val expected = (pre.keySet ++ post.keySet)
      .filter(u => pre.get(u) != post.get(u))
    assert(changes.map(_.getAs[Long]("user_id")).toSet == expected)
  }
}
