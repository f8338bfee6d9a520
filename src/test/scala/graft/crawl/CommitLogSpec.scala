package graft.crawl

import java.nio.channels.FileChannel
import java.nio.file.{Files, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** T2 commit-log semantics + the single-driver lock (the reference's ZK
  * crawler gate, NutchConstant.java:648-830, collapsed to an OS flock:
  * second process fails fast, crash releases automatically).
  */
class CommitLogSpec extends AnyFunSuite {

  test("driver lock: held at the OS level while a CommitLog exists; " +
    "same-JVM logs share; release frees it") {
    val root = Files.createTempDirectory("commitlock").toString
    val log = new CommitLog(root)
    log.append(Commit(0L, "b1", "inject", "complete", "p", 1L,
      Map("0" -> 1L), Map.empty, 0L))

    // an independent channel (what a second driver process would open)
    // sees the lock as HELD: same-JVM prohe throws Overlapping, a real
    // second process would get null from tryLock — either way, denied
    val probe = FileChannel.open(
      new java.io.File(new java.io.File(root, "_commits"),
        "_driver.lock").toPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    intercept[java.nio.channels.OverlappingFileLockException] {
      probe.tryLock()
    }

    // a SECOND CommitLog in the same JVM (resume path, multiple pipeline
    // objects over one root) shares the process lock instead of failing
    val log2 = new CommitLog(root)
    assert(log2.last().map(_.batchId).contains("b1"))

    // after release the probe channel can take the lock — proving the
    // original hold was a real OS lock, not just registry state
    CommitLog.releaseProcessLock(root)
    val taken = probe.tryLock()
    assert(taken != null)
    taken.release(); probe.close()
  }
}
