package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: attributes one gated query's wall time across the Spark
  * JOBS it launches (fixture writes, DML commits, stream micro-batches,
  * the final action) plus the driver-side gaps between them — the
  * attribution SliceProbe's build/plan/exec split is too coarse for.
  * Prints one line per job (start offset, duration, #tasks, call site)
  * and the total job-covered vs gap time. Not part of the gated
  * surface. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Job(id: Int, start: Long, var end: Long, tasks: Int,
                   site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val tasks = js.stageInfos.map(_.numTasks).sum
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        jobs.put(js.jobId, Job(js.jobId, js.time, -1L, tasks, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    })
    // session warmup as the bench does
    try graft.gold.Enrich.ordersEnriched(spark, sfDir).count()
    catch { case _: Throwable => () }
    // in-process driver-thread sampler: every 10 ms grab the main
    // thread's stack and count the topmost frame inside org.apache.spark
    // / graft (skipping pure waits) — attributes the inter-job gaps.
    // all-thread stack sampling is itself heavy (safepoints at 100 Hz
    // distort concurrent runs) — keep it opt-in
    val sampleOn = sys.env.get("SPARK_GRAFT_SAMPLE").forall(_ == "1")
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val stackDumps = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val frame = st.find { e =>
            val c = e.getClassName
            (c.startsWith("org.apache.spark") || c.startsWith("graft") ||
              c.startsWith("org.apache.parquet") || c.startsWith("org.apache.hadoop")) &&
              !c.contains("ThreadUtils")
          }.map(e => s"${e.getClassName}.${e.getMethodName}")
            .getOrElse(st.headOption.map(e => s"${e.getClassName}.${e.getMethodName}").getOrElse("?"))
          samples.merge("driver: " + frame, 1, (a: Integer, b: Integer) => a + b)
          // executor task threads: topmost frame that is NOT scheduler
          // plumbing — where task compute actually goes
          import scala.jdk.CollectionConverters._
          for ((t, est) <- Thread.getAllStackTraces.asScala
               if t.getName.startsWith("Executor task launch worker")) {
            est.find { e =>
              val c = e.getClassName
              c.startsWith("org.apache.parquet") || c.startsWith("graft") ||
                c.startsWith("org.apache.hadoop") ||
                (c.startsWith("org.apache.spark") &&
                  !c.startsWith("org.apache.spark.executor") &&
                  !c.startsWith("org.apache.spark.scheduler"))
            }.foreach { e =>
              samples.merge(s"exec: ${e.getClassName}.${e.getMethodName}", 1,
                (a: Integer, b: Integer) => a + b)
            }
          }
          // full-stack capture for the filesystem plumbing suspects
          for ((t, est) <- Thread.getAllStackTraces.asScala) {
            val top = est.take(40)
            if (top.exists(e => e.getClassName.endsWith("util.Shell") ||
                e.getMethodName == "copyFileStreamNIO")) {
              val sig = top.take(22).map(e =>
                s"${e.getClassName}.${e.getMethodName}").mkString(" <- ")
              if (stackDumps.add(sig))
                println(s"  FULLSTACK [${t.getName}] $sig")
            }
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    for (name <- args; rep <- 1 to 2) {
      jobs.clear()
      samples.clear()
      sampling = sampleOn
      val t0 = System.currentTimeMillis()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val t1 = System.currentTimeMillis()
      sampling = false
      // settle async listener delivery before reading
      Thread.sleep(300)
      val js = jobs.values.toArray(Array.empty[Job]).sortBy(_.start)
      println(s"==== $name #$rep wall ${t1 - t0} ms rows $n jobs ${js.length}")
      var covered = 0L
      var cursor = t0
      for (j <- js if j.end > 0) {
        val gap = j.start - cursor
        if (gap > 25)
          println(f"  GAP   ${cursor - t0}%6d +$gap%5d ms (driver)")
        println(f"  JOB ${j.id}%4d ${j.start - t0}%6d +${j.end - j.start}%5d ms tasks ${j.tasks}%4d  ${j.site}")
        covered += j.end - j.start
        cursor = math.max(cursor, j.end)
      }
      if (t1 - cursor > 25)
        println(f"  GAP   ${cursor - t0}%6d +${t1 - cursor}%5d ms (driver tail)")
      println(f"  SUMMARY wall ${t1 - t0}%6d ms, job-covered $covered%6d ms, jobs ${js.length}")
      import scala.jdk.CollectionConverters._
      val top = samples.asScala.toSeq.sortBy(-_._2).take(24)
      top.foreach { case (f, c) => println(f"  DRIVERSAMPLE $c%4d  $f") }
    }
    spark.stop()
  }
}
