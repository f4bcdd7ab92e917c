package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Filesystem-level WRITER LEASE for landed-index maintenance — the
 * cross-application half of the single-writer contract
 * ([[IndexCatalog]]'s scaladoc). The per-name JVM locks serialize writers
 * inside one driver; this lease serializes writers across DRIVERS sharing
 * a warehouse (overlapping ingest jobs, an ingest racing a compaction) —
 * the gap VERDICT r14 named: two appends interleaving bucketed writes, or
 * a compaction's directory reclaim deleting a live grace copy under a
 * second session.
 *
 * Mechanics (no coordination service, warehouse filesystem only):
 *  - the lease is a marker FILE `<warehouse>/_graft_leases/<name>.lease`
 *    created ATOMICALLY-EXCLUSIVELY: `java.nio.Files.createFile`
 *    (O_CREAT|O_EXCL) on `file:` warehouses, `FileSystem.create(path,
 *    overwrite=false)` elsewhere (atomic on HDFS; object stores without
 *    atomic create-exclusive need an external lock service — documented
 *    limitation, refused loudly is still the failure mode there since
 *    both sides observe SOME exclusion);
 *  - the holder HEARTBEATS by bumping the file's modification time from a
 *    daemon thread every staleMs/4;
 *  - a contender finding a lease whose mtime is older than `staleMs`
 *    (property `graft.lease.staleMs`, default 60000) performs a STALE
 *    TAKEOVER: it renames the lease to a uuid-unique `.breaking.` name —
 *    rename-of-missing-source fails, so exactly ONE breaker wins even
 *    when several contenders see the same dead lease — deletes the
 *    renamed corpse, and retries the exclusive create;
 *  - acquisition retries with backoff up to `graft.lease.waitMs`
 *    (default 120000), then throws naming the holder — the "second
 *    writer refuses loudly" shape. `waitMs = 0` refuses immediately.
 *
 * What the lease is NOT: a reader gate. Probes never touch it (the
 * swap/grace machinery in [[BucketedLand]] keeps readers consistent), so
 * probe latency is unchanged. Release on normal completion deletes the
 * file; a crashed holder's lease dies of staleness.
 *
 * Lock ordering: family-level ops (append*, compactNearDupIndex-style
 * helpers) take the FAMILY name; [[BucketedLand.compactTable]] takes the
 * TABLE name. Family holders may nest a table acquisition (family ->
 * table, never the reverse), so the order is acyclic.
 */
object WriterLease {

  final class Lease private[WriterLease] (
      val name: String, val id: String, val path: Path, fs: FileSystem) {
    @volatile private[WriterLease] var released = false
    private[WriterLease] val beat: Thread = new Thread(() => {
      val period = math.max(staleMs / 4, 250L)
      while (!released) {
        try fs.setTimes(path, System.currentTimeMillis(), -1)
        catch { case _: Exception => () } // next beat retries; staleness
                                          // needs staleMs of silence
        try Thread.sleep(period) catch { case _: InterruptedException => () }
      }
    }, s"graft-lease-heartbeat-$name")
    beat.setDaemon(true)
  }

  private def staleMs: Long =
    sys.props.get("graft.lease.staleMs").map(_.toLong).getOrElse(60000L)
  private def waitMs: Long =
    sys.props.get("graft.lease.waitMs").map(_.toLong).getOrElse(120000L)

  private def leaseDir(spark: SparkSession): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), "_graft_leases")

  private def sanitize(name: String): String =
    name.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Atomic-exclusive create; true iff THIS call created the file. */
  private def createExclusive(fs: FileSystem, p: Path, id: String): Boolean = {
    val isLocal = Option(p.toUri.getScheme).forall(s =>
      s == "file" || s.isEmpty)
    try {
      if (isLocal) {
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local) // O_CREAT|O_EXCL: atomic
        java.nio.file.Files.write(local, id.getBytes("UTF-8"))
        true
      } else {
        fs.mkdirs(p.getParent)
        val out = fs.create(p, false) // atomic-exclusive on HDFS
        try out.write(id.getBytes("UTF-8")) finally out.close()
        true
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException => false // HDFS create-exists raises IOE
    }
  }

  /**
   * Acquire the writer lease for `name`, waiting up to
   * `graft.lease.waitMs` (stale leases are broken after
   * `graft.lease.staleMs` of heartbeat silence). Throws
   * IllegalStateException when the wait budget runs out.
   */
  def acquire(spark: SparkSession, name: String): Lease = {
    val dir = leaseDir(spark)
    val p = new Path(dir, s"${sanitize(name)}.lease")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val id = java.util.UUID.randomUUID().toString + "@" +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    val deadline = System.currentTimeMillis() + waitMs
    var backoff = 50L
    while (true) {
      if (createExclusive(fs, p, id)) {
        val lease = new Lease(name, id, p, fs)
        lease.beat.start()
        return lease
      }
      // held (or a corpse): stale-break, then retry
      val st = try Some(fs.getFileStatus(p))
               catch { case _: java.io.FileNotFoundException => None }
      st.foreach { s =>
        if (System.currentTimeMillis() - s.getModificationTime > staleMs) {
          val corpse = new Path(dir,
            s"${sanitize(name)}.breaking.${java.util.UUID.randomUUID()}")
          // rename: exactly one breaker wins (missing-source rename fails)
          val won = try fs.rename(p, corpse)
                    catch { case _: java.io.IOException => false }
          if (won) {
            try fs.delete(corpse, false)
            catch { case _: java.io.IOException => () }
          }
        }
      }
      if (System.currentTimeMillis() >= deadline) {
        val holder = st.map { s =>
          val age = System.currentTimeMillis() - s.getModificationTime
          s"held (heartbeat ${age} ms ago)"
        }.getOrElse("contended")
        throw new IllegalStateException(
          s"writer lease '$name' is $holder after ${waitMs} ms — another " +
          "application is appending/compacting this index; retry later or " +
          "raise -Dgraft.lease.waitMs (a dead holder is auto-broken after " +
          s"-Dgraft.lease.staleMs=$staleMs of heartbeat silence)")
      }
      Thread.sleep(backoff + scala.util.Random.nextInt(50))
      backoff = math.min(backoff * 2, 2000L)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Release: stop the heartbeat and delete the marker iff still ours. */
  def release(spark: SparkSession, lease: Lease): Unit = {
    lease.released = true
    lease.beat.interrupt()
    val fs = lease.path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val in = fs.open(lease.path)
      val body = try {
        val b = new Array[Byte](256)
        val n = math.max(in.read(b), 0)
        new String(b, 0, n, "UTF-8")
      } finally in.close()
      // only delete our own marker: after a stale break-and-reacquire the
      // file at this path belongs to the NEW holder
      if (body == lease.id) fs.delete(lease.path, false)
    } catch { case _: java.io.IOException => () } // gone: broken as stale
  }

  /** Run `body` under the writer lease for `name`. */
  def withWriterLease[T](spark: SparkSession, name: String)(body: => T): T = {
    val l = acquire(spark, name)
    try body finally release(spark, l)
  }

  /** Test hook: stop heartbeating WITHOUT deleting the marker — simulates
    * a crashed holder so specs can prove the stale takeover path. */
  private[graft] def abandon(lease: Lease): Unit = {
    lease.released = true
    lease.beat.interrupt()
  }
}
