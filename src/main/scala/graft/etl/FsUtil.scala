package graft.etl

import java.nio.file.{Files, Path}

/** Shared filesystem helpers for the table formats. */
object FsUtil {

  /** Recursive delete, no-op when absent; the walk stream is closed
    * and deletion tolerates entries a concurrent cleaner already
    * removed. The single implementation behind every table format's
    * debris rollback / clean path.
    */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally w.close()
    }
}
