package graft

/** The ONE recursive-delete helper (previously hand-rolled in four
  * places — each copy a chance for the non-recursive-delete-leaves-
  * `_temporary` bug StreamOps documents). */
object Fs {
  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
  def deleteRec(p: java.nio.file.Path): Unit = deleteRec(p.toFile)
}
