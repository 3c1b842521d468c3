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

  /** Queue-behind-the-holder wait bound for short critical sections
    * (OCC validate-and-swing, MOR log appends): long enough that a
    * live holder always finishes first and a dead one expires and is
    * stolen inside the wait.
    */
  val QueueWaitMs: Long = LockExpiryMs + 60 * 1000L

  /** Acquire `tablePath/_lock`, run `body`, release. With the default
    * `waitMs = 0` a held lock fails IMMEDIATELY with
    * `ConcurrentModificationException` (fail-fast mutators — the
    * caller owns the retry policy); with a positive `waitMs` the
    * writer polls until the holder releases, a stale lock expires and
    * is stolen, or the wait bound passes (queueing writers — lock
    * contention is ordinary sequencing, not an error).
    */
  def withTableLock[T](tablePath: String, waitMs: Long = 0L)(body: => T): T = {
    Files.createDirectories(Paths.get(tablePath))
    val lock = Paths.get(tablePath, "_lock")
    def tryAcquire(): Boolean =
      try {
        Files.writeString(lock, System.currentTimeMillis().toString,
          StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    def tryOnce(): Boolean = tryAcquire() || {
      val age =
        try System.currentTimeMillis() - Files.readString(lock).trim.toLong
        catch { case _: Exception => Long.MaxValue }
      age > LockExpiryMs && {
        Files.deleteIfExists(lock)
        tryAcquire()
      }
    }
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = tryOnce()
    while (!acquired && System.currentTimeMillis() < deadline) {
      Thread.sleep(25)
      acquired = tryOnce()
    }
    if (!acquired)
      throw new java.util.ConcurrentModificationException(
        s"another writer holds $lock — retry after it commits " +
          s"(or after ${LockExpiryMs / 1000}s if it died)")
    try body finally Files.deleteIfExists(lock)
  }
}
