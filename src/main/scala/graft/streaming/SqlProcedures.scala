package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{DeltaLog, Iceberg}

/** One SQL-callable MAINTENANCE procedure
  * (`CALL <catalog>.system.<name>(...)`): declared IN parameters,
  * a fixed result schema, and a driver-side body. `run` receives the
  * decoded argument values in parameter order and returns result
  * rows. */
private[streaming] case class GraftProcedure(
    pname: String, describe: String,
    params: Seq[(String, DataType)],
    resultSchema: StructType,
    run: Seq[Any] => Seq[Seq[Any]]) {

  def unbound: UnboundProcedure = new UnboundProcedure {
    override def name(): String = pname
    override def description(): String = describe
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = pname
        override def description(): String = describe
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] =
          params.map { case (n, dt) =>
            ProcedureParameter.in(n, dt).build()
          }.toArray
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val args: Seq[Any] = params.zipWithIndex.map {
            case ((n, dt), i) =>
              require(!input.isNullAt(i),
                s"$pname: parameter $n must not be NULL")
              dt match {
                case StringType => input.getUTF8String(i).toString
                case LongType => input.getLong(i)
                case IntegerType => input.getInt(i)
                case other => throw new IllegalArgumentException(
                  s"$pname: unsupported parameter type $other")
              }
          }
          val out: Array[InternalRow] = run(args).map(vals =>
            new GenericInternalRow(vals.map {
              case s: String => UTF8String.fromString(s)
              case other => other
            }.toArray): InternalRow).toArray
          java.util.List.of[Scan](new Scan with LocalScan {
            override def readSchema(): StructType = resultSchema
            override def rows(): Array[InternalRow] = out
            override def description(): String = s"$pname result"
          }).iterator()
        }
      }
  }
}

/** The two catalogs' procedure sets — the maintenance surface a
  * lakehouse needs at scale, callable from plain SQL:
  *
  * {{{
  * CALL graft.system.optimize(table => 'db.orders')
  * CALL graft.system.vacuum(table => 'db.orders', keep_versions => 3)
  * CALL graft.system.restore(table => 'db.orders', version => 4)
  * CALL ice.system.expire_snapshots(table => 'db.t', keep_last => 2)
  * CALL ice.system.rewrite_data_files(table => 'db.t')
  * CALL ice.system.rollback_to_snapshot(table => 'db.t',
  *                                      snapshot_id => 3)
  * }}}
  *
  * Each routes to the library's own maintenance op (small-file
  * compaction, version/snapshot retention, time-travel restore,
  * branch fast-forward) and returns its outcome as rows — the
  * `CALL`-procedure shape real Iceberg ships and real Delta spells
  * as OPTIMIZE/VACUUM statements. `resolve` maps the `table`
  * argument ('ns.name' within the SAME catalog) to its directory. */
private[streaming] object GraftProcedures {

  private def one(v: Any*): Seq[Seq[Any]] = Seq(v.toSeq)

  def delta(resolve: String => String): Map[String, GraftProcedure] =
    Map(
      "optimize" -> GraftProcedure("optimize",
        "compact small files (partitioned tables compact per " +
          "partition); returns the committed version and file counts",
        Seq("table" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("files_before", LongType),
          StructField("files_after", LongType))),
        { case Seq(t: String) =>
          val dir = resolve(t)
          val spark = SparkSession.active
          val before =
            DeltaLog.replay(dir, DeltaLog.versions(dir).last).adds.size
          val v =
            if (DeltaLog.replay(dir, DeltaLog.versions(dir).last)
                .partitionColumns.nonEmpty)
              DeltaLog.compactPartitioned(spark, dir)
            else DeltaLog.compact(spark, dir)
          val after =
            DeltaLog.replay(dir, DeltaLog.versions(dir).last).adds.size
          one(v, before.toLong, after.toLong)
        }),
      "optimize_zorder" -> GraftProcedure("optimize_zorder",
        "re-cluster the table on a Morton (Z-order) interleave of " +
          "the named columns — one dataChange=false commit with " +
          "fresh stats, blooms backfilled on the new layout (real " +
          "Delta's OPTIMIZE ... ZORDER BY)",
        Seq("table" -> StringType, "columns" -> StringType,
          "target_files" -> IntegerType),
        StructType(Seq(StructField("version", LongType),
          StructField("files_before", LongType),
          StructField("files_after", LongType),
          StructField("files_bloomed", LongType))),
        { case Seq(t: String, cols: String, target: Int) =>
          val dir = resolve(t)
          val spark = SparkSession.active
          val before =
            DeltaLog.replay(dir, DeltaLog.versions(dir).last).adds.size
          val v = DeltaLog.compactZorder(spark, dir,
            cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
            target)
          val after =
            DeltaLog.replay(dir, DeltaLog.versions(dir).last).adds.size
          val bloomed = DeltaLog.bloomBackfill(spark, dir)
          one(v, before.toLong, after.toLong, bloomed.toLong)
        }),
      "vacuum" -> GraftProcedure("vacuum",
        "delete unreferenced data files beyond the retained versions",
        Seq("table" -> StringType, "keep_versions" -> IntegerType),
        StructType(Seq(StructField("deleted_files", LongType))),
        { case Seq(t: String, keep: Int) =>
          one(DeltaLog.vacuum(resolve(t), keep).size.toLong) }),
      "restore" -> GraftProcedure("restore",
        "restore the table to a historical version (a new commit — " +
          "history is preserved)",
        Seq("table" -> StringType, "version" -> LongType),
        StructType(Seq(StructField("restored_to", LongType),
          StructField("committed_version", LongType))),
        { case Seq(t: String, v: Long) =>
          one(v, DeltaLog.restore(resolve(t), v)) }),
      "bloom_backfill" -> GraftProcedure("bloom_backfill",
        "write bloom sidecar rows for live files lacking them",
        Seq("table" -> StringType),
        StructType(Seq(StructField("files_bloomed", LongType))),
        { case Seq(t: String) =>
          one(DeltaLog.bloomBackfill(SparkSession.active,
            resolve(t)).toLong) }))

  def iceberg(resolve: String => String): Map[String, GraftProcedure] =
    Map(
      "rewrite_data_files" -> GraftProcedure("rewrite_data_files",
        "compact data files into a new snapshot",
        Seq("table" -> StringType),
        StructType(Seq(StructField("snapshot_id", LongType))),
        { case Seq(t: String) =>
          one(Iceberg.rewriteDataFiles(SparkSession.active,
            resolve(t))) }),
      "optimize_zorder" -> GraftProcedure("optimize_zorder",
        "re-cluster the table on a Morton (Z-order) interleave of " +
          "the named columns into one overwrite snapshot with fresh " +
          "manifest bounds (real Iceberg's rewrite_data_files with " +
          "a zorder sort_order)",
        Seq("table" -> StringType, "columns" -> StringType,
          "target_files" -> IntegerType),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("files_before", LongType),
          StructField("files_after", LongType))),
        { case Seq(t: String, cols: String, target: Int) =>
          val dir = resolve(t)
          val spark = SparkSession.active
          def liveFiles: Long =
            Iceberg.batchPlan(dir, Iceberg.mainSnapshotId(dir))
              .files.size.toLong
          val before = liveFiles
          val sid = Iceberg.rewriteZorder(spark, dir,
            cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
            target)
          one(sid, before, liveFiles)
        }),
      "expire_snapshots" -> GraftProcedure("expire_snapshots",
        "drop history beyond the newest keep_last snapshots and " +
          "delete their unreferenced files",
        Seq("table" -> StringType, "keep_last" -> IntegerType),
        StructType(Seq(StructField("deleted_files", LongType))),
        { case Seq(t: String, keep: Int) =>
          one(Iceberg.expireSnapshots(resolve(t), keep).size.toLong) }),
      "rollback_to_snapshot" -> GraftProcedure("rollback_to_snapshot",
        "point the table back at a historical snapshot",
        Seq("table" -> StringType, "snapshot_id" -> LongType),
        StructType(Seq(StructField("metadata_version", LongType))),
        { case Seq(t: String, snap: Long) =>
          one(Iceberg.rollbackTo(resolve(t), snap).toLong) }),
      "fast_forward" -> GraftProcedure("fast_forward",
        "fast-forward main to a branch head (write-audit-publish)",
        Seq("table" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("metadata_version", LongType))),
        { case Seq(t: String, b: String) =>
          one(Iceberg.fastForward(resolve(t), b).toLong) }))

  /** Catalog-generic procedures. `remove_orphan_homes` is the GC
    * half of the pointer-entry lifecycle: a crashed CTAS driver, a
    * lost CREATE race, or a data-plane straggler task re-creating a
    * deleted staging directory each leave a hidden `.tbl-` home no
    * pointer references — invisible to every listing and load, but
    * occupying storage. The sweep deletes exactly the unreferenced
    * homes older than the caller's horizon (set it beyond your
    * longest-running CTAS: an in-flight staged home is unreferenced
    * BY DESIGN until its commit claims the pointer). `resolveNs`
    * maps a namespace argument to its warehouse directory. */
  def common(resolveNs: String => String,
             adopt: String => String): Map[String, GraftProcedure] =
    Map(
      "adopt_table" -> GraftProcedure("adopt_table",
        "convert an ADOPTED directory table into the pointer-entry " +
          "lifecycle: one create-if-absent claim of a hidden " +
          ".ptr-<name> entry referencing the existing directory as " +
          "its home — metadata-only, no data moves; RTAS and RENAME " +
          "then work under any LogStore (object-store-safe)",
        Seq("table" -> StringType),
        StructType(Seq(StructField("result", StringType))),
        { case Seq(t: String) => one(adopt(t)) }),
      "remove_orphan_homes" -> GraftProcedure("remove_orphan_homes",
        "delete hidden .tbl- table homes no pointer entry references " +
          "(crashed CTAS, lost CREATE races, straggler tasks) and " +
          "DEAD pointer entries whose target lost its table state",
        Seq("namespace" -> StringType, "older_than_ms" -> LongType),
        StructType(Seq(StructField("deleted_homes", LongType),
          StructField("deleted_entries", LongType))),
        { case Seq(ns: String, olderThan: Long) =>
          val d = new java.io.File(resolveNs(ns))
          val entries = Option(d.listFiles()).getOrElse(Array.empty)
          val cutoff = System.currentTimeMillis() - olderThan
          // dead pointers first: their targets are not tables, so
          // nothing they reference counts as live below
          def isTable(dir: String): Boolean = {
            val t = new java.io.File(dir)
            new java.io.File(t, "_delta_log").isDirectory ||
              graft.sources.Iceberg.versions(dir).nonEmpty ||
              new java.io.File(t, IcebergSqlTables.Marker).isFile
          }
          val dead = entries.filter(f => f.lastModified() < cutoff &&
            TablePointer.read(f.toPath).exists(p => !isTable(p._1)))
          dead.foreach(f =>
            java.nio.file.Files.delete(f.toPath))
          val referenced = entries.filterNot(dead.contains)
            .flatMap(f => TablePointer.read(f.toPath).map(_._1)).toSet
          val orphans = entries.filter(f =>
            f.isDirectory && f.getName.startsWith(".tbl-") &&
              !referenced.contains(f.getPath) &&
              f.lastModified() < cutoff)
          orphans.foreach(graft.util.Fs.deleteRecursively)
          one(orphans.length.toLong, dead.length.toLong)
        }))

  /** Shared ProcedureCatalog plumbing for [[GraftDirCatalog]]. */
  def load(procs: Map[String, GraftProcedure], catalogName: String,
           ident: Identifier): UnboundProcedure = {
    require(ident.namespace.toSeq == Seq("system"),
      s"$catalogName: procedures live in the 'system' namespace " +
        s"(CALL $catalogName.system.<name>), got " +
        ident.namespace.mkString("."))
    procs.getOrElse(ident.name,
      throw new IllegalArgumentException(
        s"$catalogName: unknown procedure ${ident.name} — " +
          s"available: ${procs.keys.toSeq.sorted.mkString(", ")}"))
      .unbound
  }
}
