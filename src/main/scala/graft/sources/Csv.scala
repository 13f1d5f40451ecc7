package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType}

/** CSV entry path (SURVEY S8): headered CSV read with an EXPLICIT
  * schema (inference over 100 TB is a full extra scan — never relied
  * on), a per-table header rename map (the reference's Kaggle-CSV
  * loader pattern, scripts/load_kaggle_data.py:27-115), and the
  * idempotent INSERT-IF-ABSENT append (`ON CONFLICT DO NOTHING`,
  * reference scripts/load_kaggle_data.py upsert guard): append only
  * the keys not already present, never update an existing row. */
object Csv {

  /** External-header → canonical column map for the staged customer
    * CSV (the shape a Kaggle dump would carry). */
  private val renames = Map(
    "customer_id" -> "c_custkey", "full_name" -> "c_name",
    "nation_id" -> "c_nationkey", "segment" -> "c_mktsegment",
    "balance" -> "c_acctbal")

  private val csvSchema = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("full_name", StringType),
    StructField("nation_id", LongType),
    StructField("segment", StringType),
    StructField("balance", DoubleType)))

  /** q150 — CSV INGEST + INSERT-IF-ABSENT, gated end-to-end: the
    * customer dim is staged as headered CSV under external column
    * names, read back with the explicit schema + rename map, then
    * idempotently inserted into an "existing" table holding the even
    * keys with a marker segment. The left-anti join appends ONLY the
    * odd (absent) keys; the oracle's CASE proves both directions —
    * a naive append would duplicate the even keys (row-count
    * mismatch), an upsert would overwrite the marker (hash mismatch).
    * Doubles survive the text round trip bit-exactly
    * (Double.toString is shortest-round-trip by contract — the
    * float-discipline reason the gate can hash c_acctbal).
    *
    * Scale: the anti join is the scalable spelling of ON CONFLICT DO
    * NOTHING — both sides shuffle on the key once, no driver
    * membership set; at 100 TB the existing side would be a bucketed
    * table and the join exchange-free (q110's layout). */
  def csvInsertIfAbsent(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey",
        "c_mktsegment", "c_acctbal")
    val work = Files.createTempDirectory("graft_q150").toString
    try {
      // stage as the external shape: renamed headers, text encoding
      renames.map(_.swap).foldLeft(cust) { case (df, (from, to)) =>
        df.withColumnRenamed(from, to)
      }.write.option("header", "true").csv(s"$work/stage")
      val incoming = renames.foldLeft(
        spark.read.option("header", "true").schema(csvSchema)
          .csv(s"$work/stage")) { case (df, (from, to)) =>
        df.withColumnRenamed(from, to)
      }
      val existing = cust
        .filter(pmod(col("c_custkey"), lit(2)) === 0)
        .withColumn("c_mktsegment", lit("EXISTING"))
      val inserted = incoming.join(existing, Seq("c_custkey"), "left_anti")
      // pin rows before the staged CSV is deleted
      existing.unionByName(inserted
          .select(existing.columns.map(col).toIndexedSeq: _*))
        .localCheckpoint()
        .orderBy(col("c_custkey"))
    } finally
      graft.util.Fs.deleteRecursively(new java.io.File(work))
  }

  val csvInsertIfAbsentSql: String =
    """SELECT c_custkey, c_name, c_nationkey,
      |  CASE WHEN c_custkey % 2 = 0 THEN 'EXISTING'
      |       ELSE c_mktsegment END AS c_mktsegment,
      |  c_acctbal
      |FROM customer ORDER BY c_custkey""".stripMargin
}
