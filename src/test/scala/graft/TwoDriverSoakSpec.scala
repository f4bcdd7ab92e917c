package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Two checkpointed `dedupAgainstIndexBatch` streams in two REAL driver
 * JVMs against ONE persisted near-dup index (VERDICT r14 #8): a writer
 * ingest stream (appends + periodic compactions) races a probe-only
 * reader stream for 50+ micro-batches. Forks [[TwoDriverSoak]] twice and
 * audits the reader's per-batch accept/reject timeline for the
 * consistency contract (see the main's scaladoc).
 */
class TwoDriverSoakSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def fork(role: String, share: String, n: Int)
      : (Process, java.io.File) = {
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.TwoDriverSoak", role, share, n.toString)
    val f = java.io.File.createTempFile(s"tds_$role", ".log")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(f).start()
    (p, f)
  }

  test("writer ingest stream vs probe-only reader stream, 50+ batches: " +
       "no lost detection, no flicker, marker-ordered visibility, " +
       "zero state, bounded files") {
    val share = java.nio.file.Files
      .createTempDirectory("graft_two_driver_soak").toString
    val nWriter = 50
    val (pw, fw) = fork("writer", share, nWriter)
    val (pr, fr) = fork("reader", share, nWriter)
    def await(p: Process, f: java.io.File, tag: String): String = {
      val ok = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
      if (!ok) p.destroyForcibly()
      val out = java.nio.file.Files.readString(f.toPath)
      f.delete()
      assert(ok, s"$tag timed out:\n${out.takeRight(2000)}")
      assert(p.exitValue() == 0,
        s"$tag failed rc=${p.exitValue()}:\n${out.takeRight(3000)}")
      out
    }
    val wOut = await(pw, fw, "writer")
    val rOut = await(pr, fr, "reader")
    assert(wOut.contains("\"metric\":\"two_driver_soak_writer\"") &&
      wOut.contains("\"ok\":true"), s"writer bounds:\n${wOut.takeRight(1500)}")
    assert(rOut.contains("\"metric\":\"two_driver_soak_reader\"") &&
      rOut.contains("\"ok\":true"), s"reader bounds:\n${rOut.takeRight(1500)}")

    // ---- audit the reader's per-batch timeline -------------------------
    val lines = java.nio.file.Files.readString(
        java.nio.file.Paths.get(share, "reader_results.tsv"))
      .linesIterator.filter(_.nonEmpty).toSeq
    assert(lines.length >= 50, s"only ${lines.length} reader batches")
    final case class B(id: Long, markers: Int, accepted: Set[Long])
    val batches = lines.map { ln =>
      val parts = ln.split("\t", -1)
      B(parts(0).toLong, parts(1).toInt,
        if (parts.length < 3 || parts(2).isEmpty) Set.empty[Long]
        else parts(2).split(",").map(_.toLong).toSet)
    }.sortBy(_.id)

    batches.foreach { b =>
      // seed dups (5,000,000-range): rejected in EVERY batch
      assert(!b.accepted.exists(id => id >= 5000000L && id < 6000000L),
        s"batch ${b.id}: a PRE-LANDED duplicate was accepted — lost " +
        s"detection: ${b.accepted.filter(_ < 6000000L).take(5)}")
      // fresh probes (6,000,000-range): all 10 accepted in EVERY batch
      val fresh = b.accepted.count(id => id >= 6000000L && id < 7000000L)
      assert(fresh == 10,
        s"batch ${b.id}: $fresh/10 fresh probes accepted — the index " +
        "served phantom duplicates (a mixed or corrupt view)")
      // marker rule: writer batches whose w_done marker existed BEFORE
      // this reader batch refreshed must already read as duplicates
      (0 until b.markers).foreach { w =>
        val ids = Set(7000000L + w * 10L, 7000000L + w * 10L + 1L)
        assert((b.accepted & ids).isEmpty,
          s"batch ${b.id}: writer batch $w committed before refresh " +
          s"(markers=${b.markers}) but its probes were accepted — a " +
          "stale view was served as current")
      }
    }
    // per-doc monotonicity: once a writer-batch probe reads as duplicate
    // it must never read accepted again (no flicker through compactions)
    val wIds = batches.flatMap(_.accepted).filter(_ >= 7000000L).distinct
    wIds.foreach { id =>
      val timeline = batches.map(b => b.accepted.contains(id))
      val firstRejected = timeline.indexOf(false)
      if (firstRejected >= 0)
        assert(!timeline.drop(firstRejected).contains(true),
          s"probe $id flickered rejected -> accepted (batch " +
          s"${batches(firstRejected).id} onward)")
    }
    // eventual completeness: the final batch (all markers present)
    // rejects every writer probe
    val last = batches.last
    assert(last.markers == nWriter, "reader finished before the writer?")
    assert(!last.accepted.exists(_ >= 7000000L),
      s"final batch still accepts appended dups: " +
      s"${last.accepted.filter(_ >= 7000000L).take(5)}")
  }
}
