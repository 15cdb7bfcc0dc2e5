package graft.core

/** Local-filesystem helpers shared by the snapshot sink and the
  * managed-table layout utilities (one recursive delete, not two
  * drifting private copies). */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
