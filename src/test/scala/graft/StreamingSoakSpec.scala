package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Short forked run of [[StreamSoak]] (30 micro-batches per composite —
 * one-and-a-half compaction cycles): the sustained-ingest bounds
 * (files-per-bucket under periodic compaction, zero state-store bytes,
 * oracle-green final index) asserted in CI time. The full 100-batch soak
 * is the same code path: `sbt "runMain graft.StreamSoak"`.
 */
class StreamingSoakSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("30-batch ingest soak holds the file, state, and oracle bounds") {
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpens ++ Seq(
      "-Xmx6g",
      "-cp", sys.props("java.class.path"),
      "graft.StreamSoak", "30")
    val outFile = java.io.File.createTempFile("stream_soak", ".log")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(outFile)
    val p = pb.start()
    val finished = p.waitFor(12, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    val out = java.nio.file.Files.readString(outFile.toPath)
    outFile.delete()
    assert(finished, s"StreamSoak timed out:\n${out.takeRight(2000)}")
    val json = out.linesIterator
      .find(_.contains("\"metric\":\"stream_soak\"")).getOrElse("")
    assert(p.exitValue() == 0 && json.contains("\"all_ok\":true"),
      s"soak bounds failed (rc=${p.exitValue()}):\n" +
        (if (json.nonEmpty) json else out.takeRight(3000)))
  }
}
