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
}
