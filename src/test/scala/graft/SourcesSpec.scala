package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Source/sink surface not exercised by the parquet-based oracle gate:
  * CSV ingest with header + rename map (SURVEY S8), idempotent
  * insert-if-absent (S8's ON CONFLICT DO NOTHING analog), and parquet
  * schema drift on append (T7 mergeSchema). */
class SourcesSpec extends SparkSuite {

  test("CSV round trip with header and column-rename map (S8)") {
    val base = Files.createTempDirectory("csv").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars").limit(200)
    docs.write.option("header", "true").csv(s"$base/out")
    // the reference renames Kaggle CSV headers via a per-table map
    // (scripts/load_kaggle_data.py:27-115); same pattern here
    // explicit schema, as the reference does with per-table column
    // maps (no inference relied on — SURVEY §1.3)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val renames = Map("doc_id" -> "document_id", "lang" -> "language")
    val back = renames.foldLeft(
      spark.read.option("header", "true").schema(schema)
        .csv(s"$base/out")) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    assert(back.columns.toSet == Set("document_id", "language", "n_chars"))
    assert(back.count() == docs.count())
    assert(back.schema("document_id").dataType == LongType)
  }

  test("insert-if-absent: dedup-then-append equals ON CONFLICT DO NOTHING (S8)") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "CHANGED"), (3L, "c")).toDF("id", "v")
    // idempotent insert = append only the keys not already present
    val inserted = incoming.join(existing, Seq("id"), "left_anti")
    val result = existing.unionByName(inserted)
    val m = result.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "a", 2L -> "b", 3L -> "c")) // 2 kept, not changed
  }

  test("q150 gate shape: CSV insert-if-absent keeps markers, adds only absent keys") {
    val got = sources.Csv.csvInsertIfAbsent(spark, sfDir)
    val cust = Tables.load(spark, sfDir, "customer")
    assert(got.count() == cust.count(),
      "every key exactly once: no duplicates (naive append), no drops")
    val markers = got.filter(col("c_mktsegment") === "EXISTING").count()
    assert(markers == cust.filter(col("c_custkey") % 2 === 0).count(),
      "existing rows must keep their marker — insert, never update")
  }

  test("JSON-lines source: explicit schema, typed reads, corrupt-line capture") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      ("""{"id": 1, "name": "a", "score": 0.5}""" + "\n" +
       """{"id": 2, "name": "b"}""" + "\n" +
       """{"id": broken""" + "\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("_corrupt_record", StringType)))
    // explicit schema (never inferred — an inference pass over 100 TB
    // is a full extra scan) + PERMISSIVE corrupt capture
    val rows = spark.read.schema(schema).json(dir).collect()
    assert(rows.length == 3)
    val good = rows.filter(_.getAs[String]("_corrupt_record") == null)
    assert(good.map(_.getAs[Long]("id")).sorted.sameElements(Array(1L, 2L)))
    assert(good.find(_.getAs[Long]("id") == 2L).get.isNullAt(2)) // absent field
    assert(rows.count(_.getAs[String]("_corrupt_record") != null) == 1)
  }

  test("malformed JSON degrades to null under from_json, loudly under _corrupt_record") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val rows = Seq((1L, """{"k": 7}"""), (2L, """{"k": """), (3L, "not json"))
      .toDF("id", "props")
    // PERMISSIVE scalar path: bad documents → null, good ones parse —
    // the behavior a 100 TB ingest needs (quarantine by isNull, don't
    // fail the job on one bad producer)
    val parsed = rows.select(col("id"),
      from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .as("p"))
      .select(col("id"), col("p.k").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(parsed == Map(1L -> Some(7L), 2L -> None, 3L -> None))
    // corrupt-record capture: the quarantine column holds the raw text
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("_corrupt_record", StringType)))
    val captured = rows.select(col("id"),
      from_json(col("props"), schema).as("p")).select("id", "p._corrupt_record")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(captured(1L).isEmpty)
    assert(captured(2L).nonEmpty && captured(3L).nonEmpty)
  }

  test("JSONL export: size-targeted shards, lossless round trip") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("jsonl").toString
    // small target to force multiple shards at test scale
    val n = graft.sources.Export.writeJsonlShards(docs, out, 64L * 1024)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.length == n && n > 1, s"expected $n shards")
    // size-targeted: every shard within target + slack for row skew
    files.foreach(f => assert(f.length < 3 * 64L * 1024,
      s"${f.getName} is ${f.length} bytes"))
    // round trip: schema'd re-read returns exactly the same rows
    val back = spark.read.schema(docs.schema).json(out)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JDBC sink + partitioned scan: stripes cover everything, filters push (S6/S9)") {
    val src = gold.Summaries.dailySalesSummary(spark, sfDir)
    val back = sources.Jdbc.jdbcRoundtrip(spark, sfDir)
    // the scan really fans out over ScanPartitions concurrent queries
    // (asserted on the relation: the trailing sort may later coalesce)
    assert(back.queryExecution.executedPlan.toString
        .contains(s"numPartitions=${sources.Jdbc.ScanPartitions}"),
      back.queryExecution.executedPlan.toString)
    // stripes partition the table: no row lost or doubled, values
    // (including doubles through Derby's DOUBLE) survive bit-exact
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // predicates push into the warehouse query instead of filtering
    // rows Spark-side after a full extract
    val filtered = spark.read
      .jdbc(sources.Jdbc.Url, "daily_sales", sources.Jdbc.props)
      .filter(org.apache.spark.sql.functions.col("total_orders") > 5)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("total_orders"),
      s"JDBC filter not pushed:\n$plan")
    // the yyyymmdd stripe key spreads rows over EVERY stripe — the
    // parallelism the partitioned scan exists for (a clustered key
    // like total_orders left stripes empty at some scale factors)
    val b = spark.read.jdbc(sources.Jdbc.Url, "daily_sales", sources.Jdbc.props)
      .agg(org.apache.spark.sql.functions.min("date_key"),
        org.apache.spark.sql.functions.max("date_key")).head()
    val striped = spark.read
      .option("partitionColumn", "date_key")
      .option("lowerBound", b.getInt(0).toString)
      // same lo < hi guard as the product code: a single-date summary
      // must degrade the test's read, not crash it
      .option("upperBound",
        math.max(b.getInt(1).toLong, b.getInt(0).toLong + 1).toString)
      .option("numPartitions", sources.Jdbc.ScanPartitions.toString)
      .jdbc(sources.Jdbc.Url, "daily_sales", sources.Jdbc.props)
    val perStripe = striped.rdd
      .mapPartitions(it => Iterator(it.size)).collect()
    assert(perStripe.length == sources.Jdbc.ScanPartitions,
      s"expected ${sources.Jdbc.ScanPartitions} stripes: ${perStripe.toSeq}")
    assert(perStripe.forall(_ > 0),
      s"empty stripe in ${perStripe.toSeq} — the stripe key is skewed")
  }


  test("parquet append with evolving schema reads merged (T7)") {
    val base = Files.createTempDirectory("drift").toString
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "v").write.mode("append").parquet(base)
    Seq((2L, "y", 9.5)).toDF("id", "v", "extra")
      .write.mode("append").parquet(base)
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet == Set("id", "v", "extra"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("extra")) ||
      byId(1L).getAs[Any]("extra") == null)
    assert(byId(2L).getAs[Double]("extra") == 9.5)
  }
}
