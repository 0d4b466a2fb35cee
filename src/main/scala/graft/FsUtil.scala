package graft

/** Shared filesystem helpers for the artifact-staging pattern the
  * streamed-ingest lanes and index builds use: stage a scratch copy of
  * an immutable durable artifact by HARDLINK (metadata cost only — the
  * shared artifact is never written through; deleting the workspace
  * unlinks), with a byte-copy fallback for filesystems without link
  * support, and tear a tree down recursively. One definition instead
  * of the seven call-site copies the round-15 review counted — a
  * change to the fallback semantics now lands everywhere. */
private[graft] object FsUtil {

  /** Hardlink every regular file under `src` whose src-relative path
    * passes `keep` into the same relative location under `dst`,
    * creating parent directories as needed; falls back to a byte copy
    * per file when linking fails (cross-device, unsupported FS,
    * permissions). With `replace` an existing destination file is
    * removed first (the generation-fold REPLACE semantics). */
  def linkTree(src0: String, dst0: String,
               keep: String => Boolean = _ => true,
               replace: Boolean = false): Unit = {
    val src = java.nio.file.Paths.get(src0)
    val dst = java.nio.file.Paths.get(dst0)
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val rel = src.relativize(p).toString
        if (keep(rel)) {
          val out = dst.resolve(rel)
          java.nio.file.Files.createDirectories(out.getParent)
          if (replace) java.nio.file.Files.deleteIfExists(out)
          try java.nio.file.Files.createLink(out, p)
          catch { case _: Exception =>
            if (replace)
              java.nio.file.Files.copy(p, out,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            else java.nio.file.Files.copy(p, out)
          }
        }
      }
    } finally walk.close()
  }

  /** Recursive delete; tolerates a vanished tree. */
  def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete()
  }
}
