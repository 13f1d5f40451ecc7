package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission

/** The NIO local-FS backend (round 17): `file://` resolves to
  * [[graft.util.GraftLocalFileSystem]] via core-site.xml, permissions
  * apply without a fork/exec, no `.crc` sidecars double the
  * file-create count, and the FileContext registry (the streaming
  * checkpoint manager's path) resolves the NIO twin. */
class LocalFsSpec extends SparkSuite {

  test("core-site registers the NIO local FS for file://") {
    val fs = FileSystem.get(
      java.net.URI.create("file:///"), new Configuration())
    assert(fs.isInstanceOf[graft.util.GraftLocalFileSystem],
      s"fs.file.impl did not take: got ${fs.getClass.getName}")
  }

  test("writes create no .crc sidecars and apply permissions via NIO") {
    val dir = Files.createTempDirectory("localfs_spec")
    val fs = FileSystem.get(
      java.net.URI.create("file:///"), new Configuration())
    val p = new Path(s"$dir/data.bin")
    val out = fs.create(p)
    out.write(Array[Byte](1, 2, 3)); out.close()
    assert(Files.exists(Paths.get(s"$dir/data.bin")))
    assert(!Files.exists(Paths.get(s"$dir/.data.bin.crc")),
      "checksum sidecar written — GraftLocalFileSystem must disable it")
    fs.setPermission(p, new FsPermission("600"))
    val perms = Files.getPosixFilePermissions(Paths.get(s"$dir/data.bin"))
    import java.nio.file.attribute.PosixFilePermission._
    assert(perms.contains(OWNER_READ) && perms.contains(OWNER_WRITE)
      && perms.size == 2, s"NIO setPermission wrote $perms for 600")
    // read back through the same fs (no checksum verification path)
    val in = fs.open(p)
    val buf = new Array[Byte](3); in.readFully(0, buf); in.close()
    assert(buf.toSeq == Seq[Byte](1, 2, 3))
    util.Fs.deleteRecursively(dir.toFile)
  }

  test("FileContext (streaming checkpoint path) resolves the NIO twin") {
    val fc = FileContext.getFileContext(
      java.net.URI.create("file:///"), new Configuration())
    val dir = Files.createTempDirectory("localfs_fc")
    val p = new Path(s"$dir/ckpt")
    fc.mkdir(p, FsPermission.getDirDefault, true)
    assert(Files.isDirectory(Paths.get(s"$dir/ckpt")))
    // the AbstractFileSystem impl must be ours (delegating, no shell)
    val afs = fc.getDefaultFileSystem
    assert(afs.isInstanceOf[graft.util.GraftLocalFs],
      s"fs.AbstractFileSystem.file.impl did not take: ${afs.getClass}")
    util.Fs.deleteRecursively(dir.toFile)
  }

  test("a streaming checkpoint round-trips on the NIO FileContext") {
    import org.apache.spark.sql.functions._
    val work = Files.createTempDirectory("localfs_stream").toString
    spark.range(4).selectExpr("id", "CAST(id AS STRING) AS s")
      .write.parquet(s"$work/src")
    val df = spark.readStream.schema(
      spark.read.parquet(s"$work/src").schema)
      .parquet(s"$work/src")
    val q = df.withColumn("tag", lit("x"))
      .writeStream.format("parquet")
      .option("path", s"$work/sink")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$work/sink").count() == 4)
    util.Fs.deleteRecursively(new java.io.File(work))
  }
}
