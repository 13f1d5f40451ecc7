package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.cdc.Cdc

/** Property-based invariants (SURVEY §5.3): CDC compaction is
  * arrival-order-independent and idempotent; aggregation partials are
  * consistent with totals. Generators are ScalaCheck `Gen`s driven by
  * fixed seeds (reproducible; one Spark job per case) and adversarial:
  * duplicate keys, colliding sequence numbers, skewed distributions. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val logGen: Gen[List[(String, Long, String)]] =
    Gen.chooseNum(1, 80).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.frequency(4 -> Gen.const("hot"),
          1 -> Gen.oneOf("a", "b", "c", "d"))
        seq <- Gen.chooseNum(0L, 30L) // deliberate seq collisions
        v <- Gen.oneOf("u", "v", "w", "x", "y", "z")
      } yield (k, seq, v))
    }

  /** Reproducible sample stream: fixed base seed, one per case. */
  private def cases(n: Int): Seq[List[(String, Long, String)]] =
    (1 to n).flatMap(i =>
      logGen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val ord = Seq(col("seq").desc, col("v").desc) // total tie-break

  test("CDC compaction: any arrival order converges to the same state") {
    cases(8).foreach { entries =>
      val shuffled = new scala.util.Random(7).shuffle(entries)
      val sa = Cdc.latestPerKey(entries.toDF("k", "seq", "v"), Seq("k"), ord)
        .select("k", "seq", "v").collect().toSet
      val sb = Cdc.latestPerKey(shuffled.toDF("k", "seq", "v"), Seq("k"), ord)
        .select("k", "seq", "v").collect().toSet
      assert(sa == sb, s"order-dependent compaction on $entries")
    }
  }

  test("CDC compaction is idempotent on generated logs") {
    cases(8).foreach { entries =>
      val once = Cdc.latestPerKey(entries.toDF("k", "seq", "v"), Seq("k"), ord)
      val twice = Cdc.latestPerKey(once, Seq("k"), ord)
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("splitting a log and merging halves equals one-shot compaction") {
    cases(8).zipWithIndex.foreach { case (entries, i) =>
      val cut = entries.size * (i + 1) / 10
      val (first, second) = entries.splitAt(cut)
      val oneShot = Cdc.latestPerKey(entries.toDF("k", "seq", "v"),
        Seq("k"), ord).select("k", "seq", "v").collect().toSet
      // MERGE semantics: compact the first half (prior silver state),
      // union the raw second half (new CDC batch), recompact
      val target =
        if (first.isEmpty) second.toDF("k", "seq", "v")
        else Cdc.latestPerKey(first.toDF("k", "seq", "v"), Seq("k"), ord)
          .unionByName(second.toDF("k", "seq", "v"))
      val merged = Cdc.latestPerKey(target, Seq("k"), ord)
        .select("k", "seq", "v").collect().toSet
      assert(merged == oneShot, s"merge divergence at cut=$cut")
    }
  }

  test("sum of per-group counts equals total count") {
    cases(8).foreach { entries =>
      val df = entries.toDF("k", "seq", "v")
      val perGroup = df.groupBy("k").count().agg(sum("count")).head.getLong(0)
      assert(perGroup == df.count())
    }
  }
}
