package graft.util

/** Tiny local-filesystem helper shared by queries/specs that stage
  * temp data (checkpoint chunks, streaming copies, persisted filter
  * tables): one recursive delete instead of per-call-site copies. */
object GraftFiles {
  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
      ()
    }
    rm(new java.io.File(path))
  }
}
