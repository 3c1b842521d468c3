package graft.etl

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Filesystem lock provider shared by the table-format mutators
  * (Hudi's `FileSystemBasedLockProvider`: exclusive-create of a lock
  * file plus stale-lock expiry — the coordination primitive that works
  * on any shared filesystem with no external service).
  *
  * Two concurrent mutators of the same table would each compute a
  * manifest/snapshot from the same base and the second swap would
  * silently DROP the first writer's commit — lost updates. Mutators
  * therefore hold the lock for the duration of their critical section;
  * a second writer fails loudly with `ConcurrentModificationException`
  * (retry after the holder finishes) instead of corrupting the table.
  * A crashed holder's lock is stolen after [[LockExpiryMs]]; the steal
  * itself races through exclusive-create, so exactly one stealer wins.
  */
object FsLock {

  /** Stale-lock expiry: a mutator that died holding `_lock` blocks
    * writers only this long.
    */
  val LockExpiryMs: Long = 10 * 60 * 1000L

  def withTableLock[T](tablePath: String)(body: => T): T = {
    Files.createDirectories(Paths.get(tablePath))
    val lock = Paths.get(tablePath, "_lock")
    def tryAcquire(): Boolean =
      try {
        Files.writeString(lock, System.currentTimeMillis().toString,
          StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    val acquired = tryAcquire() || {
      val age =
        try System.currentTimeMillis() - Files.readString(lock).trim.toLong
        catch { case _: Exception => Long.MaxValue }
      age > LockExpiryMs && {
        Files.deleteIfExists(lock)
        tryAcquire()
      }
    }
    if (!acquired)
      throw new java.util.ConcurrentModificationException(
        s"another writer holds $lock — retry after it commits " +
          s"(or after ${LockExpiryMs / 1000}s if it died)")
    try body finally Files.deleteIfExists(lock)
  }
}
