package graft

import java.nio.file.{Files, Paths}

/** The session-cached stream staging (q101/q123's landing zones). */
class StagingSpec extends SparkSuite {

  test("staged builds once, rebuilds only on source fingerprint change") {
    val src = Files.createTempDirectory("stagesrc").toString
    Files.write(Paths.get(src, "part-0.parquet"), Array[Byte](1, 2, 3))
    var builds = 0
    def build(d: String): Unit = {
      builds += 1
      Files.write(Paths.get(d, "marker"), "x".getBytes)
    }
    val a = streaming.Staging.staged(spark, "spec", src)(build)
    val b = streaming.Staging.staged(spark, "spec", src)(build)
    assert(a == b && builds == 1, "second call must reuse the cache")
    assert(new java.io.File(a, "marker").isFile)
    // a source rewrite (part-file stamp change) evicts: new dir, old
    // one reclaimed
    val part = new java.io.File(src, "part-0.parquet")
    assert(part.setLastModified(part.lastModified + 10000))
    val c = streaming.Staging.staged(spark, "spec", src)(build)
    assert(c != a && builds == 2, "superseded staging must rebuild")
    assert(!new java.io.File(a).exists, "evicted staging dir must be reclaimed")
    // distinct tags never collide on the same source
    val d = streaming.Staging.staged(spark, "spec2", src)(build)
    assert(d != c && builds == 3)
  }

  test("linkInto links all files once and no-ops on an existing sink") {
    val from = Files.createTempDirectory("linkfrom").toString
    Files.write(Paths.get(from, "a"), "aa".getBytes)
    Files.write(Paths.get(from, "_SUCCESS"), Array.empty[Byte])
    val to = Files.createTempDirectory("linkto").toString + "/dest"
    streaming.Staging.linkInto(from, to)
    assert(new java.io.File(to, "a").isFile &&
      new java.io.File(to, "_SUCCESS").isFile)
    // the no-op contract: an existing dest (a restarted stream's own
    // seed) is left untouched
    Files.write(Paths.get(to, "b"), "bb".getBytes)
    streaming.Staging.linkInto(from, to)
    assert(new java.io.File(to, "b").isFile)
    // hard link, not copy: same inode content (mutating the source
    // shows through) — or, on a copy-fallback FS, at least equal bytes
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(to, "a")), "aa".getBytes))
  }
}
