package graft.crawl

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Atomic per-batch commit log — the Iceberg snapshot contract, emulated
  * (SURVEY.md §7.1: no Iceberg jar ships in this sandbox; the layout +
  * commit protocol mirror Iceberg's snapshot/manifest semantics so a real
  * catalog is a drop-in in production).
  *
  * One JSON file per commit, written temp-then-rename (atomic on POSIX).
  * A commit records `(seq, batchId, stage, status, rowCounts, snapshot
  * paths, per-partition lineage, metrics)` — the reference's ZooKeeper step
  * gate (reference: crawl/NutchConstant.java:648-830 preparStartJob,
  * :1007-1076 preparEndJob) collapses into "read the last committed stage".
  * Resume = scan commits, find the last complete batch, continue from its
  * snapshot (north rule: resumes exactly from checkpoint with
  * per-partition lineage + metrics).
  */
final case class Commit(
    seq: Long,
    batchId: String,
    stage: String, // inject | generate | fetch | parse | updatedb | ...
    status: String, // complete (only complete commits are ever written)
    frontierPath: String, // BASE snapshot dir this stage produced/read
    rowCount: Long,
    partitionCounts: Map[String, Long], // per-bucket lineage
    metrics: Map[String, Double],
    virtualTime: Long,
    // merge-on-read lineage (Iceberg MoR contract): the frontier state is
    // base ∖ delta-keys ∪ deltas (latest delta wins per key). Empty for
    // full snapshots; bounded by the compaction interval otherwise.
    deltaPaths: Seq[String] = Nil,
    // URL-seen bloom sidecars (per-bucket filters as (bucket, bytes)
    // parquet): the chain of bloom files covering every key in this
    // state. Maintained INCREMENTALLY — inject writes the first file,
    // each updatedb appends a delta-sized file for its new rows, and
    // compaction rebuilds a single fresh file — so no stage ever
    // re-scans the full frontier just to build filters.
    bloomPaths: Seq[String] = Nil) {
  def deltas: Seq[String] = Option(deltaPaths).getOrElse(Nil)
  def blooms: Seq[String] = Option(bloomPaths).getOrElse(Nil)
}

final class CommitLog(root: String) {
  private val dir = new File(root, "_commits")
  dir.mkdirs()
  // single-driver guard (the reference arbitrates concurrent crawlers
  // through a ZooKeeper gate with stale-lock takeover,
  // crawl/NutchConstant.java:648-830; nextSeq()+rename here assumes one
  // driver per root — two drivers would race the sequence). An OS file
  // lock makes that assumption ENFORCED: a second driver PROCESS on the
  // same root fails fast instead of corrupting the log, and a crashed
  // driver's lock releases automatically with its process (the flock
  // analog of ZK session-expiry takeover). CommitLogs within one JVM
  // share the lock — one driver, many pipeline objects, is the
  // supported shape (tests, resume).
  CommitLog.acquireProcessLock(dir)
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  def commits(): Seq[Commit] =
    Option(dir.listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json"))
      .sortBy(_.getName)
      .map(f => mapper.readValue(f, classOf[Commit]))
      .toSeq

  def last(): Option[Commit] = commits().lastOption

  def lastOf(stage: String): Option[Commit] =
    commits().filter(_.stage == stage).lastOption

  def nextSeq(): Long = last().map(_.seq + 1).getOrElse(0L)

  /** Atomic append: write temp file, fsync-free rename into place. */
  def append(c: Commit): Commit = {
    val tmp = Files.createTempFile(dir.toPath, s"commit-${c.seq}", ".tmp")
    mapper.writerWithDefaultPrettyPrinter().writeValue(tmp.toFile, c)
    Files.move(tmp, Paths.get(dir.getPath, f"${c.seq}%06d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    c
  }
}

object CommitLog {
  // one OS lock per commit root per JVM, shared by every CommitLog on
  // that root (a second lock attempt in the same JVM would throw
  // OverlappingFileLockException — same-process sharing is intended)
  private val processLocks =
    scala.collection.mutable.Map[String, java.nio.channels.FileLock]()

  private def acquireProcessLock(dir: File): Unit = {
    val key = dir.getCanonicalPath
    processLocks.synchronized {
      if (!processLocks.contains(key)) {
        val ch = java.nio.channels.FileChannel.open(
          new File(dir, "_driver.lock").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = ch.tryLock()
        if (lock == null) {
          ch.close()
          throw new IllegalStateException(
            s"another driver process holds the commit log at $key — " +
              "one driver per crawl root (reference: ZK crawler gate)")
        }
        processLocks(key) = lock
      }
    }
  }

  /** Release this process's lock on a crawl root (tests / multi-root
    * tools; a normal driver just holds it for the process lifetime, and
    * the OS releases it on exit or crash).
    */
  def releaseProcessLock(root: String): Unit = {
    val key = new File(root, "_commits").getCanonicalPath
    processLocks.synchronized {
      processLocks.remove(key).foreach { l =>
        l.release(); l.channel().close()
      }
    }
  }
}
