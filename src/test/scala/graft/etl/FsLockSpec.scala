package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Mutual-exclusion proof for the filesystem lock every table mutator
  * relies on: N threads hammering one table's lock must never overlap
  * their critical sections, and each queued writer must eventually get
  * its turn. Pure JVM test (no Spark) so it can run hot — thousands of
  * acquisitions — and catch windows a 4-writer integration test hits
  * once in a hundred runs.
  */
class FsLockSpec extends AnyFunSuite {

  test("withTableLock excludes: no two critical sections overlap") {
    val dir = Files.createTempDirectory("fslock").toString
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val count = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        (1 to 250).foreach { _ =>
          FsLock.withTableLock(dir, FsLock.QueueWaitMs) {
            val now = inside.incrementAndGet()
            maxInside.updateAndGet(m => math.max(m, now))
            count.incrementAndGet()
            inside.decrementAndGet()
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(10 * 60 * 1000L))
    assert(count.get() == 8 * 250, s"lost acquisitions: ${count.get()}")
    assert(maxInside.get() == 1,
      s"critical sections overlapped: ${maxInside.get()} threads inside")
  }

  /** Liveness: under repeatedly FORCED stale locks (a crashed holder's
    * orphan, simulated by backdating the lock file past expiry), every
    * contender still acquires within its wait bound — the steal path's
    * rename-claim discipline must let exactly one contender claim each
    * orphan and the rest queue normally, never livelock on each other's
    * claims. Regression net beyond FsLockSpec's exclusion proof.
    */
  test("every contender acquires within the wait bound despite forced stale locks") {
    val dir = Files.createTempDirectory("fslockl").toString
    val lock = java.nio.file.Paths.get(dir, "_lock")
    def plantOrphan(): Unit = {
      Files.writeString(lock, "crashed-holder")
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - FsLock.LockExpiryMs - 60000L))
    }
    val acquired = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 20).foreach { _ =>
      plantOrphan()
      val threads = (1 to 4).map { _ =>
        new Thread(() => {
          try FsLock.withTableLock(dir, waitMs = 30000L) {
            acquired.incrementAndGet(); ()
          } catch { case t: Throwable => failures.add(t); () }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000L))
    }
    assert(failures.isEmpty,
      s"contenders starved under forced stale locks: ${failures.peek()}")
    assert(acquired.get() == 20 * 4)
    assert(!Files.exists(lock), "the last release must leave no lock behind")
  }

  /** An overrun holder (stolen from after expiry) must not evict the
    * stealer on its late release — the token check is the guard.
    */
  test("a stolen-from holder's late release never evicts the stealer") {
    val dir = Files.createTempDirectory("fslocks").toString
    val lock = java.nio.file.Paths.get(dir, "_lock")
    val holderInside = new java.util.concurrent.CountDownLatch(1)
    val stealerHolds = new java.util.concurrent.CountDownLatch(1)
    val holderMayExit = new java.util.concurrent.CountDownLatch(1)
    val stealerMayExit = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      FsLock.withTableLock(dir) {
        holderInside.countDown()
        holderMayExit.await() // overruns while the stealer moves in
      }
    })
    val stealer = new Thread(() => {
      FsLock.withTableLock(dir, waitMs = 30000L) {
        stealerHolds.countDown()
        stealerMayExit.await()
      }
    })
    holder.start()
    holderInside.await()
    // force the holder's lock past expiry: the stealer may now claim it
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - FsLock.LockExpiryMs - 60000L))
    stealer.start()
    stealerHolds.await()
    // the overrun holder releases LATE — token mismatch, no eviction
    holderMayExit.countDown()
    holder.join(30000L)
    assert(Files.exists(lock), "late release evicted the stealer's lock")
    intercept[java.util.ConcurrentModificationException] {
      FsLock.withTableLock(dir)(())
    }
    stealerMayExit.countDown()
    stealer.join(30000L)
    assert(!Files.exists(lock))
  }
}
