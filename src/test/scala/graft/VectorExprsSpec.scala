package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** The custom codegen expression must agree exactly with the built-in
  * fold it replaces, handle nulls, and work from SQL. */
class VectorExprsSpec extends SparkSuite {
  import spark.implicits._

  test("vec_dot equals the built-in aggregate/zip_with fold bit-for-bit") {
    val v = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val both = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        VectorExprs.vecDot(col("a.e"), col("b.e")).as("fast"),
        aggregate(zip_with(col("a.e"), col("b.e"), (x, y) => x * y),
          lit(0.0d), (acc, x) => acc + x).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("vec_dot: known value, null propagation, empty arrays") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
      .select(VectorExprs.vecDot(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("vec_dot raises on ragged arrays instead of truncating") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)))
      .toDF("a", "b")
      .select(VectorExprs.vecDot(col("a"), col("b")).as("d"))
    val e = intercept[Exception] { df.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("length mismatch")), e.toString)
  }

  test("vec_dot is callable from SQL after registration") {
    VectorExprs.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0)
    assert(r == 11.0)
  }

  test("shingles is callable from SQL, with and without explicit n") {
    VectorExprs.register(spark)
    val r3 = spark.sql("SELECT shingles('a b c d') AS s")
      .head.getSeq[String](0)
    assert(r3 == Seq("a b c", "b c d"))
    val r2 = spark.sql("SELECT shingles('a b c d', 2) AS s")
      .head.getSeq[String](0)
    assert(r2 == Seq("a b", "b c", "c d"))
  }

  test("pair_combinations emits exactly the i<j pairs, in order") {
    val df = Seq(Seq(1L, 2L, 3L, 4L), Seq(7L), Seq.empty[Long])
      .toDF("ds")
      .select(graft.functions.GeneratorExprs.pairCombinations(col("ds")))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
  }

  test("vec_dot stays inside WholeStageCodegen") {
    val v = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
    val plan = v.select(VectorExprs.vecDot(col("e"), col("e")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_dot"), plan)
  }
}
