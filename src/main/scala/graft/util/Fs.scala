package graft.util

/** Shared local-filesystem helpers for the temp-dir lifecycle the
  * always-cold gates manage (pipeline runs, snapshot tables, staged
  * streams) — one definition instead of a copy per module. */
object Fs {

  /** Best-effort recursive delete; missing paths are a no-op. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
