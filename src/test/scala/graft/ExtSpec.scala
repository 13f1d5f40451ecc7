package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TextAnalysis}

/** Semantic tests for the §7.5 extension operators beyond what the
  * DuckDB oracle gate checks: sketch behavior on planted near-dups,
  * language-ID on genuinely multilingual snippets, plan-shape claims,
  * and the block-partitioned all-pairs rewrite. */
class ExtSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup pairs every doc with its planted copy (n_dups = 2)") {
    val out = Dedup.exactDedup(spark, sfDir).collect()
    assert(out.nonEmpty)
    // the query unions an id-shifted copy, so every fingerprint group
    // holds at least the original + copy
    assert(out.forall(_.getAs[Long]("n_dups") >= 2))
    // and keep_id is always an original (un-shifted) id
    assert(out.forall(_.getAs[Long]("keep_id") < 1000000L))
  }

  test("minhash LSH: near-identical docs collide in at least one band") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "CHANGED" else s"tok$i")
      .mkString(" ")
    val distinctDoc = (1 to 40).map(i => s"other$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("minhash").toString
    docs(1L -> base, 2L -> nearDup, 3L -> distinctDoc)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val bands = Dedup.minhashBands(spark, tmp)
    val pairs = Dedup.minhashCandidatePairs(bands).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missed: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"false candidate with unrelated doc: $pairs")
  }

  test("simhash: hamming(near-dup) < hamming(unrelated)") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 60).map(i => if (i % 30 == 0) "x" else s"w$i").mkString(" ")
    val far = (1 to 60).map(i => s"z$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("simhash").toString
    docs(1L -> base, 2L -> near, 3L -> far)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sh = Dedup.simhash(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      s"near=${ham(sh(1L), sh(2L))} far=${ham(sh(1L), sh(3L))}")
  }

  test("langId classifies obvious language snippets") {
    val tmp = java.nio.file.Files.createTempDirectory("langid").toString
    docs(
      1L -> "the cat is on a mat and the dog is in the yard",
      2L -> "der hund und die katze das ist gut und der tag ist schön",
      3L -> "el perro y la casa que los gatos de la ciudad",
      4L -> "qwerty zxcvb 12345")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.langId(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "es")
    assert(out(4L) == "und")
  }

  test("dedup clusters merge chains: a~b and b~c puts a,b,c together") {
    // doc1 ~ doc2 (share a run), doc2 ~ doc3 (share a different run),
    // doc1 and doc3 share nothing directly; doc4 is isolated
    val mk = (a: Int, b: Int) =>
      ((a to a + 9) ++ (b to b + 9)).map(i => s"w$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("cc").toString
    docs(1L -> mk(0, 100), 2L -> mk(100, 200), 3L -> mk(200, 300),
      4L -> mk(500, 600))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val cl = Dedup.dedupClusters(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == 1L && cl(2L) == 1L && cl(3L) == 1L,
      s"chain not merged: $cl")
    assert(cl(4L) == 4L, s"isolated doc joined a cluster: $cl")
  }

  test("native shingles expression equals the declarative HOF spelling") {
    // bit parity over the real corpus INCLUDING edge shapes: short
    // texts, repeated shingles, leading/trailing/multi whitespace
    val corpus = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val edge = Seq(501L -> "a b", 502L -> "x y z", 503L -> "  p q r  ",
      504L -> "t t t t t", 505L -> "").toDF("doc_id", "text")
    val df = corpus.unionByName(edge).select(
      col("doc_id"),
      graft.functions.TextExprs.shingles(col("text"), 3).as("fast"),
      Dedup.shinglesDeclarative(col("text")).as("ref"))
    assert(df.filter(not(col("fast") <=> col("ref"))).count() == 0)
  }

  test("driver union-find CC equals the distributed label propagation") {
    // the adaptive size switch must be invisible in the result: force
    // both paths over the same pair table and compare labels exactly
    val (viaDriver, viaLoop) = Dedup.ccBothPaths(spark, sfDir)
    val a = viaDriver.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaLoop.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty && a == b)
    // and at least one real multi-doc cluster exists in the testdata
    assert(a.exists { case (d, c) => d != c })
  }

  test("block-partitioned near-dup equals the naive all-pairs join") {
    // the ring partitioning must cover every unordered pair exactly
    // once — compare against the BroadcastNestedLoopJoin reference
    // spelling it replaced (q36's oracle re-checks this vs DuckDB)
    val fast = Dedup.embeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = Dedup.embeddingNearDupBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fast.nonEmpty)
    assert(fast.toSeq == brute.toSeq)
  }

  test("training-mix sampler: deterministic, rate-accurate, en kept whole") {
    val docs = Tables.load(spark, sfDir, "documents")
    val s1 = graft.ext.Curation.trainingMixSample(spark, sfDir)
    val ids1 = s1.collect().map(_.getLong(0)).toSet
    // rerun = identical sample (hash-based, no state, no rng)
    val ids2 = graft.ext.Curation.trainingMixSample(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // en rate is 1.0: every en doc survives
    val en = docs.filter(col("lang") === "en").count()
    assert(s1.filter(col("lang") === "en").count() == en)
    // 0.5-rate strata land near half (binomial tolerance)
    val de = docs.filter(col("lang") === "de").count().toDouble
    if (de >= 20) {
      val kept = s1.filter(col("lang") === "de").count().toDouble
      assert(kept / de > 0.25 && kept / de < 0.75,
        s"de keep ratio ${kept / de} far from 0.5")
    }
  }

  test("simhash band join finds EVERY pair within the hamming radius") {
    // the q89 pigeonhole claim: the (band, key) equi-join must equal
    // the brute all-pairs hamming filter — completeness, not recall
    val sk = Dedup.simhash(spark, sfDir)
      .select("doc_id", "simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sk; (idb, sb) <- sk
      if ida < idb &&
        java.lang.Long.bitCount(sa ^ sb) <= Dedup.SimhashHammingMax
    } yield (ida, idb)).toSet
    val viaBands = Dedup.simhashNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBands == brute,
      s"pigeonhole join lost/invented pairs: ${viaBands.diff(brute)} / ${brute.diff(viaBands)}")
    assert(brute.nonEmpty, "corpus should contain at least one near-dup pair")
  }

  test("minhash jaccard estimate is consistent with its signatures") {
    val est = Dedup.minhashJaccardEst(spark, sfDir).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (m, e) = (r.getLong(2), r.getDouble(3))
      assert(m >= 1 && m <= Dedup.MinhashK) // candidates share ≥1 band
      assert(e == m.toDouble / Dedup.MinhashK)
    }
  }

  test("minhash cluster chain recovers the exact near-dup pairs (q94 recall)") {
    // ground truth: q33's exact pairs at the chain's own Jaccard bar
    // (estimated >= MinhashKeepMatches/16 targets true J >= 0.5)
    val exact = Dedup.ngramJaccardPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2).toDouble / r.getLong(3)))
      .filter(_._3 >= Dedup.MinhashKeepMatches.toDouble / Dedup.MinhashK)
      .map(p => (p._1, p._2))
    assert(exact.nonEmpty, "corpus should contain true pairs at J >= 0.5")
    val labels = Dedup.minhashDedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recalled = exact.count { case (a, b) => labels(a) == labels(b) }
    val recall = recalled.toDouble / exact.length
    assert(recall >= 0.8,
      s"sketch chain recall $recall over ${exact.length} exact pairs")
    // and the chain must not weld everything: clusters stay granular
    assert(labels.values.toSet.size > labels.size / 2,
      "minhash clustering collapsed the corpus")
  }

  test("semdedup prunes exactly per its any-lower-id-in-cell rule (q96)") {
    // independent re-derivation of the keep/prune decision from the
    // raw embeddings + the q39 assignment, compared row-for-row
    val emb = Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val out = Dedup.semDedupCells(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == emb.size) // every vector present, with a decision
    val cells = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, cell, kept) =>
      val dupBelow = cells.exists { case (o, c) =>
        c == cell && o < id && cos(emb(o), emb(id)) >= Dedup.SemDedupThreshold
      }
      assert(kept == (if (dupBelow) 0 else 1),
        s"vec $id in cell $cell: kept=$kept but dupBelow=$dupBelow")
    }
    // non-vacuous on this corpus: at least one prune and one keep
    assert(out.exists(_._3 == 0) && out.exists(_._3 == 1))
  }

  test("bigram familiarity ranks templated text above gibberish (q97)") {
    val tmp = java.nio.file.Files.createTempDirectory("bigram").toString
    docs(
      1L -> "the cat sat here",   // shares "the cat" with doc 2
      2L -> "the cat ran home",
      3L -> "zq xv jk wp qm",     // gibberish: every bigram unique
      4L -> "one")                // <2 tokens: no bigrams
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.ext.TextAnalysis.bigramFamiliarity(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    // docs 1/2 each hold one corpus-count-2 bigram ("the cat") among
    // three: familiarity (2+1+1)/3 > doc 3's all-singleton 1.0
    assert(out(3L).getAs[Double]("familiarity") == 1.0)
    assert(out(1L).getAs[Double]("familiarity") > 1.0)
    assert(out(2L).getAs[Double]("familiarity") > 1.0)
    assert(out(4L).getAs[Long]("n_bigrams") == 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("familiarity")))
  }

  test("stratified split: exact 80/10/10 quotas per stratum, rerun-stable (q98)") {
    val s1 = graft.ext.Curation.stratifiedSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val s2 = graft.ext.Curation.stratifiedSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(s1.toSeq == s2.toSeq) // deterministic, seedless
    // complete partition of the corpus
    assert(s1.length == Tables.load(spark, sfDir, "documents").count())
    // exact integer quotas inside every language stratum
    s1.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      val by = rows.groupBy(_._3).view.mapValues(_.length).toMap
      assert(by.getOrElse("train", 0) == n * 8 / 10, s"$lang train")
      assert(by.getOrElse("val", 0) == n * 9 / 10 - n * 8 / 10, s"$lang val")
      assert(by.getOrElse("test", 0) == n - n * 9 / 10, s"$lang test")
    }
  }

  test("top-k per customer equals the row_number window spelling (q99)") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = graft.ops.Relational.topOrdersPerCustomer(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3)))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price").desc, col("o_orderkey"))
    val viaWindow = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= graft.ops.Relational.TopPerGroup)
      .orderBy(col("o_custkey"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3),
        r.getDouble(2)))
    assert(viaAgg.nonEmpty)
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("sequence packing: budget respected up to one overflow doc (q103)") {
    val out = graft.ext.TextAnalysis.sequencePacking(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // complete and unique: every document packed exactly once
    assert(out.length == Tables.load(spark, sfDir, "documents").count())
    assert(out.map(_._1).distinct.length == out.length)
    // per (stream, example): tokens minus its LAST doc fit the budget
    // (the floor-of-running-sum relaxation — overflow ≤ 1 document),
    // and examples are non-empty contiguous ids within each stream
    out.groupBy(t => (t._2, t._4)).foreach { case ((s, e), docs) =>
      val total = docs.map(_._3).sum
      val largestLast = docs.maxBy(_._1)._3
      assert(total - largestLast < graft.ext.TextAnalysis.PackTokenBudget,
        s"stream $s example $e: ${total}tok exceeds budget before its last doc")
    }
    out.groupBy(_._2).foreach { case (s, docs) =>
      val ids = docs.map(_._4).distinct.sorted.toSeq
      assert(ids == (ids.head to ids.last).toSeq,
        s"stream $s has gaps in example ids: $ids")
    }
    // deterministic rerun
    val again = graft.ext.TextAnalysis.sequencePacking(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("char diversity: planted extremes land at the metric bounds") {
    val tmp = java.nio.file.Files.createTempDirectory("chardiv").toString
    Seq((1L, "aaaaaaaa"), (2L, "abcdefgh"), (3L, "x y x y x y"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.charDiversity(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("char_collision") == 1.0) // one char only
    assert(out(2L).getAs[Double]("char_collision") == 0.0) // all distinct
    assert(out(1L).getAs[Double]("ttr") == 1.0)            // one token, one type
    assert(out(3L).getAs[Double]("ttr") == 2.0 / 6.0)      // x,y over 6 tokens
  }

  test("ivf diversity sample respects the per-cell quota and determinism") {
    val s1 = Similarity.ivfDiversitySample(spark, sfDir).collect()
    val s2 = Similarity.ivfDiversitySample(spark, sfDir).collect()
    assert(s1.map(_.toString).sameElements(s2.map(_.toString)))
    val perCell = s1.groupBy(_.getLong(1)).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= Similarity.DiversityPerCell))
    assert(perCell.nonEmpty)
  }

  test("doc chunks tile the token stream exactly as specified") {
    val texts = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TextAnalysis.docChunks(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == texts.keySet)
    texts.take(50).foreach { case (id, text) =>
      val toks = text.split("\\s+")
      val cs = chunks(id).sortBy(_.getInt(1))
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.getInt(1) == i) // contiguous 0-based chunk numbers
        val want = toks.slice(i * TextAnalysis.ChunkStride,
          i * TextAnalysis.ChunkStride + TextAnalysis.ChunkTokens)
        assert(c.getString(3) == want.mkString(" "))
        assert(c.getLong(2) == want.length)
      }
      // coverage: the final chunk reaches the end of the token stream
      val lastEnd = (cs.length - 1) * TextAnalysis.ChunkStride +
        cs.last.getLong(2)
      assert(lastEnd >= toks.length)
    }
  }

  test("repeated spans: planted shared runs yield exact merged coverage (q108)") {
    import spark.implicits._
    // doc 1 and doc 2 share a 10-token run -> windows at starts 0..2
    // (3 spans), merged coverage = 10 tokens; doc 3 shares an 8-token
    // run with doc 1's tail? no — keep doc 3 fully unique (0 spans);
    // docs 4/5 share TWO disjoint 8-token runs separated by unique
    // tokens -> 2 spans each, coverage 16, intervals must NOT merge
    val shared10 = (1 to 10).map(i => s"s$i").mkString(" ")
    val runA = (1 to 8).map(i => s"a$i").mkString(" ")
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared10 u1a u1b u1c"),
      (2L, s"u2a $shared10 u2b"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      (4L, s"$runA g1 g2 g3 $runB"),
      (5L, s"$runA h1 h2 h3 h4 $runB"))
    val tmp = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.ext.Dedup.repeatedSpans(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getAs[Double]("dup_frac"))).toMap
    assert(out(1L) == ((3L, 10L, 10.0 / 13)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((3L, 10L, 10.0 / 12)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0.0)), s"doc3: ${out(3L)}")
    assert(out(4L) == ((2L, 16L, 16.0 / 19)), s"doc4: ${out(4L)}")
    assert(out(5L) == ((2L, 16L, 16.0 / 20)), s"doc5: ${out(5L)}")
  }

  test("an in-process table rewrite evicts and unpersists its superseded cache") {
    // corpusCellAssignment persist()s under a (session, dir, mtime,
    // kind) key; rewriting the table must unpersist the stale entry
    // instead of leaving it pinned in the block manager forever
    val tmp = java.nio.file.Files.createTempDirectory("cacheevict").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"),
      java.nio.file.Paths.get(s"$tmp/embeddings.parquet"))
    def persisted = spark.sparkContext.getPersistentRDDs.size
    graft.ext.Similarity.ivfDiversitySample(spark, tmp).count()
    val afterFirst = persisted
    // "rewrite" = same bytes, new mtime (the invalidation key)
    val f = new java.io.File(s"$tmp/embeddings.parquet")
    assert(f.setLastModified(f.lastModified() + 5000))
    graft.ext.Similarity.ivfDiversitySample(spark, tmp).count()
    // <= not ==: the claim is "no accumulation"; the absolute count is
    // session-global and concurrent suites' localCheckpoint frames get
    // async-unpersisted by the ContextCleaner, so it can legitimately
    // DROP while this test runs (observed under the full parallel
    // suite) — only growth would indicate the leak this test guards
    assert(persisted <= afterFirst,
      "superseded cell assignment must be unpersisted, not accumulated")
  }

  test("extension queries shuffle only where the algorithm requires") {
    // token stats / fingerprint are pure scans: no Exchange in the plan
    Seq(TextAnalysis.tokenStats _, TextAnalysis.docFingerprint _,
      TextAnalysis.qualityScore _, TextAnalysis.langId _).foreach { q =>
      val plan = q(spark, sfDir).queryExecution.executedPlan.toString
      // the trailing orderBy is a sort (range exchange) — strip the
      // top-level sort by checking the pre-sort stages have no hash
      // aggregate exchanges
      assert(!plan.contains("hashpartitioning"),
        s"unexpected hash shuffle in scan-only query:\n$plan")
    }
  }
}
