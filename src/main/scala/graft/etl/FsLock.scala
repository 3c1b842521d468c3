package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}

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
  * A crashed holder's lock is stolen after [[LockExpiryMs]].
  *
  * Correctness notes, each one a bug class this implementation closed
  * (FsLockSpec hammers the exclusion; MorConcurrencyStress hits the
  * integration path):
  *   - Staleness is judged by the lock FILE's mtime — set atomically
  *     with creation — never by reading back written content: a
  *     content probe has an unavoidable window (creator between create
  *     and write, or holder releasing between the prober's exists-check
  *     and read) where the read fails, and mapping that failure to
  *     "infinitely stale" steals a LIVE holder's lock. An unreadable
  *     or vanished lock probes as FRESH (-1): the prober just retries.
  *   - A steal first CLAIMS the stale lock by atomically renaming it
  *     to a unique name; only the single winner of the rename deletes
  *     it and contends for a fresh acquire. Delete-then-create stealing
  *     lets a second stealer delete the first stealer's brand-new lock.
  *   - Release deletes the lock only if it still carries this
  *     acquisition's token — a holder that overran [[LockExpiryMs]]
  *     and was stolen from must not evict the stealer.
  *  The residual TOCTOU (a lock going stale and being re-created in
  *  the instruction gap between a stealer's age re-probe and its
  *  rename) needs a 10-minute-stale lock plus a microsecond
  *  coincidence — the same exposure Hudi's FS lock provider accepts.
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
    val token = s"${ProcessHandle.current().pid()}-" +
      s"${Thread.currentThread().getId}-${System.nanoTime()}"
    def tryAcquire(): Boolean =
      try {
        Files.createFile(lock) // atomic create; mtime IS the birth time
        // token written after the fact is fine: probers judge by mtime,
        // the token only guards release ownership
        Files.writeString(lock, token)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    def ageMs(): Long =
      try System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis
      catch { case _: Exception => -1L } // gone/unreadable = fresh; retry
    def steal(): Boolean = {
      // re-probe immediately before the claim so a just-created lock
      // is never renamed away
      ageMs() > LockExpiryMs && {
        val claim = Paths.get(tablePath, s"_lock.stale.$token")
        val won =
          try { Files.move(lock, claim, StandardCopyOption.ATOMIC_MOVE); true }
          catch { case _: Exception => false }
        if (won) Files.deleteIfExists(claim)
        won && tryAcquire()
      }
    }
    def tryOnce(): Boolean = tryAcquire() || steal()
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
    try body
    finally {
      val owned =
        try Files.readString(lock) == token
        catch { case _: Exception => false }
      if (owned) Files.deleteIfExists(lock)
    }
  }
}
