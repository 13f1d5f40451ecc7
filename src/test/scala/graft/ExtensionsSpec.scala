package graft

import org.apache.spark.sql.functions._

import graft.extensions.GraftExtensions

/** The SparkSessionExtensions surface: every native expression must be
  * callable from plain SQL with semantics identical to its Column
  * wrapper. The suite session was not built with the extensions
  * config, so the spec registers the EXACT triples the extension class
  * injects (GraftExtensions.functions is the single source of truth
  * for both paths) and drives them through spark.sql. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  GraftExtensions.functions.foreach { case (id, inf, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
  }

  test("the extension class injects all four functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders resolve
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("pair_combinations", "shingles", "top_k_min", "vec_dot"))
  }

  test("SQL vec_dot equals the declarative fold on real embeddings") {
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .createOrReplaceTempView("ext_emb")
    val bad = spark.sql(
      """SELECT vec_id FROM ext_emb
        |WHERE vec_dot(emb, emb) <>
        |  aggregate(zip_with(emb, emb, (x, y) -> x * y), 0.0d, (s, v) -> s + v)
        |""".stripMargin)
    assert(bad.count() == 0)
  }

  test("SQL shingles matches the Column wrapper bit-for-bit") {
    Tables.load(spark, sfDir, "documents").limit(50)
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql("SELECT doc_id, shingles(text, 3) AS s FROM ext_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaCol = Tables.load(spark, sfDir, "documents").limit(50)
      .select(col("doc_id"),
        graft.functions.TextExprs.shingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("SQL pair_combinations generates every ordered pair") {
    val pairs = spark.sql(
      "SELECT pair_combinations(array(1L, 5L, 9L)) AS (a, b)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 5L), (1L, 9L), (5L, 9L)))
  }

  test("SQL top_k_min ranks groups like the window spelling") {
    Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (1L, 12L, 2.0),
        (2L, 20L, 5.0), (2L, 21L, 4.0))
      .toDF("g", "id", "score").createOrReplaceTempView("ext_scores")
    val out = spark.sql(
      """SELECT g, tk.id AS id, tk.score AS score
        |FROM (SELECT g, top_k_min(score, id, 2) AS tks FROM ext_scores GROUP BY g)
        |LATERAL VIEW explode(tks) AS tk
        |ORDER BY g, score""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 11L, 1.0), (1L, 12L, 2.0),
      (2L, 21L, 4.0), (2L, 20L, 5.0)))
  }

  test("non-literal k/n arguments fail with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_min(1.0d, 1L, CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("delta_scan / iceberg_scan table functions in plain SQL") {
    import spark.implicits._
    graft.extensions.GraftExtensions.registerTableFunctions(spark)
    val dd = java.nio.file.Files.createTempDirectory("tvfd").toString + "/t"
    sources.DeltaLog.commitOverwrite(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dd)
    sources.DeltaLog.commitOverwrite(Seq((3L, "c")).toDF("k", "s"), dd)
    assert(spark.sql(s"SELECT k FROM delta_scan('$dd') ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // time travel through the SQL argument
    assert(spark.sql(s"SELECT k FROM delta_scan('$dd', 0) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val di = java.nio.file.Files.createTempDirectory("tvfi").toString + "/t"
    sources.Iceberg.commitOverwrite(Seq((7L, "x")).toDF("k", "s"), di)
    sources.Iceberg.commitAppend(Seq((8L, "y")).toDF("k", "s"), di)
    assert(spark.sql(s"SELECT k FROM iceberg_scan('$di') ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(7L, 8L))
    assert(spark.sql(s"SELECT k FROM iceberg_scan('$di', 1) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // the TVF composes with ordinary SQL (joins, predicates)
    val joined = spark.sql(
      s"""SELECT d.k FROM delta_scan('$dd', 0) d
         |JOIN iceberg_scan('$di') i ON d.k + 6 = i.k
         |ORDER BY d.k""".stripMargin)
    assert(joined.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // a non-literal path refuses with a clear message
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM delta_scan(concat('$dd', ''))").collect()
    }
    assert(e.getMessage.contains("string literal"))
  }

  test("file-stats metadata tables time-travel through the SQL argument") {
    import spark.implicits._
    graft.extensions.GraftExtensions.registerTableFunctions(spark)
    val dd = java.nio.file.Files.createTempDirectory("tvfs").toString + "/t"
    sources.DeltaLog.commitOverwrite(
      (1L to 20L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartition(4), dd)
    sources.DeltaLog.compact(spark, dd, targetFiles = 1)
    // latest layout: the compacted single file; v0: the four originals
    assert(spark.sql(s"SELECT count(*) FROM delta_file_stats('$dd')")
      .head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT count(*) FROM delta_file_stats('$dd', 0)")
      .head().getLong(0) == 4L)
    // records survive the pin: both layouts hold all 20 rows
    assert(spark.sql(
      s"SELECT sum(records) FROM delta_file_stats('$dd', 0)")
      .head().getLong(0) == 20L)
    val di = java.nio.file.Files.createTempDirectory("tvfsi").toString + "/t"
    sources.Iceberg.commitAppend(
      (1L to 10L).map(i => (i, s"s$i")).toDF("k", "s").coalesce(1), di)
    sources.Iceberg.commitAppend(
      (11L to 20L).map(i => (i, s"s$i")).toDF("k", "s").coalesce(1), di)
    assert(spark.sql(
      s"SELECT sum(records) FROM iceberg_files('$di') WHERE content = 0")
      .head().getLong(0) == 20L)
    assert(spark.sql(
      s"SELECT sum(records) FROM iceberg_files('$di', 1) WHERE content = 0")
      .head().getLong(0) == 10L)
  }

  test("delta_changes / iceberg_appends: the CDF SQL face (round 17)") {
    import spark.implicits._
    graft.extensions.GraftExtensions.registerTableFunctions(spark)
    val dd = java.nio.file.Files.createTempDirectory("tvfc").toString + "/t"
    sources.DeltaLog.createTable(dd,
      new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("s", "string"),
      Seq.empty, Map("delta.enableChangeDataFeed" -> "true"))
    sources.DeltaLog.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dd)         // v1
    sources.DeltaLog.deleteWhere(spark, dd,
      org.apache.spark.sql.functions.col("k") === 1L)       // v2
    val got = spark.sql(
      s"""SELECT k, _change_type, _commit_version
         |FROM delta_changes('$dd', 1) ORDER BY _commit_version, k"""
        .stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "insert", 1L), (2L, "insert", 1L),
      (1L, "delete", 2L)).sortBy(t => (t._3, t._1)))
    // explicit to_version bounds the read
    assert(spark.sql(s"SELECT count(*) FROM delta_changes('$dd', 1, 1)")
      .head().getLong(0) == 2L)
    val di = java.nio.file.Files.createTempDirectory("tvfci").toString + "/t"
    sources.Iceberg.commitAppend(Seq((1L, "a")).toDF("k", "s"), di)
    sources.Iceberg.commitAppend(Seq((2L, "b")).toDF("k", "s"), di)
    sources.Iceberg.commitAppend(Seq((3L, "c")).toDF("k", "s"), di)
    assert(spark.sql(
      s"""SELECT k FROM iceberg_appends('$di', 1) ORDER BY k""")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(spark.sql(
      s"""SELECT k, _snapshot_id FROM iceberg_appends('$di', 1, 2)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 2L)))
  }
}
