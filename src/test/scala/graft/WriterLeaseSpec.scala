package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Cross-application writer concurrency (VERDICT r14 #2). In-process tests
 * pin the lease primitive (exclusion, loud refusal, stale takeover,
 * release-only-own-marker); the two-JVM tests fork [[LeaseRace]] twice —
 * REAL separate drivers sharing only a warehouse filesystem — and audit
 * the shared state for lost updates and mixed on-disk layouts.
 */
class WriterLeaseSpec extends SparkTestBase {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def fork(role: String, warehouse: String, share: String)
      : (Process, java.io.File) = {
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dderby.system.home=" + share + "/derby_" + role,
      "-cp", sys.props("java.class.path"),
      "graft.LeaseRace", role, warehouse, share)
    val outFile = java.io.File.createTempFile(s"lease_race_$role", ".log")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(outFile).start()
    (p, outFile)
  }

  private def await(p: Process, f: java.io.File, minutes: Int,
                    tag: String): String = {
    val ok = p.waitFor(minutes.toLong, java.util.concurrent.TimeUnit.MINUTES)
    if (!ok) p.destroyForcibly()
    val out = java.nio.file.Files.readString(f.toPath)
    f.delete()
    assert(ok, s"$tag timed out:\n${out.takeRight(2000)}")
    assert(p.exitValue() == 0,
      s"$tag failed rc=${p.exitValue()}:\n${out.takeRight(3000)}")
    out
  }

  private def freshDirs(): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_lease_race").toString
    val w = s"$base/warehouse"; val s = s"$base/share"
    new java.io.File(w).mkdirs(); new java.io.File(s).mkdirs()
    (w, s)
  }

  test("in-process: exclusion, loud refusal at waitMs, stale takeover, " +
       "and release leaves a reacquired marker alone") {
    val S = graft.sources.WriterLease
    val prevWait = sys.props.get("graft.lease.waitMs")
    val prevStale = sys.props.get("graft.lease.staleMs")
    try {
      sys.props("graft.lease.waitMs") = "400"
      sys.props("graft.lease.staleMs") = "60000"
      val l1 = S.acquire(spark, "spec_lease")
      // loud refusal while held (heartbeat fresh)
      val e = intercept[IllegalStateException](S.acquire(spark, "spec_lease"))
      assert(e.getMessage.contains("spec_lease"), e.getMessage)
      // stale takeover: abandon (heartbeat stops, marker stays), shrink
      // staleness, and a new acquire must break the corpse and win
      S.abandon(l1)
      sys.props("graft.lease.staleMs") = "300"
      sys.props("graft.lease.waitMs") = "10000"
      Thread.sleep(400) // let the abandoned heartbeat go stale
      val l2 = S.acquire(spark, "spec_lease")
      // the dead holder's release must NOT delete the new holder's marker
      S.release(spark, l1)
      val e2 = intercept[IllegalStateException] {
        sys.props("graft.lease.waitMs") = "300"
        S.acquire(spark, "spec_lease")
      }
      assert(e2.getMessage.contains("spec_lease"))
      S.release(spark, l2)
      // released: immediate reacquire succeeds
      val l3 = S.acquire(spark, "spec_lease")
      S.release(spark, l3)
    } finally {
      prevWait match {
        case Some(v) => sys.props("graft.lease.waitMs") = v
        case None    => sys.props -= "graft.lease.waitMs"
      }
      prevStale match {
        case Some(v) => sys.props("graft.lease.staleMs") = v
        case None    => sys.props -= "graft.lease.staleMs"
      }
    }
  }

  test("two real JVMs: lease-guarded read-modify-write loses no update " +
       "and hold intervals never overlap") {
    val (w, s) = freshDirs()
    val (p1, f1) = fork("mutex", w, s)
    val (p2, f2) = fork("mutex", w, s)
    await(p1, f1, 8, "mutex JVM 1")
    await(p2, f2, 8, "mutex JVM 2")
    val counter = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s, "counter.txt")), "UTF-8").trim.toLong
    assert(counter == 60L,
      s"lost updates: counter $counter != 60 (2 JVMs x 30 increments)")
    // overlap audit over the logged [start, end] hold intervals
    val intervals = new java.io.File(s).listFiles()
      .filter(_.getName.endsWith(".intervals"))
      .flatMap { f =>
        val owner = f.getName
        java.nio.file.Files.readString(f.toPath).linesIterator
          .filter(_.nonEmpty).map { ln =>
            val Array(a, b) = ln.split(" "); (a.toLong, b.toLong, owner)
          }.toSeq
      }.sortBy(_._1)
    assert(intervals.length == 60, s"expected 60 intervals, ${intervals.length}")
    intervals.sliding(2).foreach {
      case Array((_, e1, o1), (s2, _, o2)) if o1 != o2 =>
        assert(s2 >= e1, s"cross-JVM hold overlap: $o1 ended $e1, $o2 " +
          s"started $s2")
      case _ => ()
    }
  }

  test("two real JVMs: appends race compactions on one external index " +
       "with no lost update and no mixed on-disk state") {
    val (w, s) = freshDirs()
    val (pa, fa) = fork("appender", w, s)
    val (pc, fc) = fork("compactor", w, s)
    await(pa, fa, 12, "appender")
    await(pc, fc, 12, "compactor")
    val compactions = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s, "b_done")), "UTF-8").trim.toInt
    assert(compactions >= 2, s"compactor only ran $compactions swaps — " +
      "the race never exercised append-vs-compaction")
    // audit the SHARED on-disk state directly (fresh read, no catalog)
    val sh = spark.read.parquet(s"$s/idx_shingles")
    val bd = spark.read.parquet(s"$s/idx_bands")
    val expectedDocs = 40L + 12L * 20L
    assert(sh.count() == expectedDocs,
      s"shingle rows ${sh.count()} != $expectedDocs — an append vanished " +
      "under a compaction swap (lost update)")
    assert(sh.select("__ref_id").distinct().count() == expectedDocs,
      "duplicate shingle rows — a swap served a mixed old+new state")
    assert(bd.count() == expectedDocs * 16L,
      s"band rows ${bd.count()} != ${expectedDocs * 16L}")
    assert(bd.select("__ref_id").distinct().count() == expectedDocs,
      "bands cover a different doc set than shingles")
  }
}
