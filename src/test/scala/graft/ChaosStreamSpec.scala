package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Forks [[ChaosStream]] into its own JVM (it owns a local-cluster
 * SparkContext): a transformWithState streaming query (RocksDB state)
 * killed mid-micro-batch by a REAL executor SIGKILL, restarted from the
 * same checkpoint, must equal an uninterrupted run — the stateful-
 * stream sibling of ChaosClusterSpec's batch append protocol.
 */
class ChaosStreamSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("streamingTransitions output after an executor kill mid-batch + " +
       "checkpoint restart equals an uninterrupted run") {
    assume(new java.io.File(sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
      .isDirectory, "no Spark distribution for local-cluster workers")
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpens ++ Seq(
      "-Xmx6g",
      "-cp", sys.props("java.class.path"),
      "graft.ChaosStream")
    val outFile = java.io.File.createTempFile("chaos_stream", ".log")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(outFile)
    val p = pb.start()
    val finished = p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    val out = java.nio.file.Files.readString(outFile.toPath)
    outFile.delete()
    assert(finished, s"ChaosStream timed out:\n${out.takeRight(2000)}")
    val json = out.linesIterator
      .find(_.contains("\"metric\":\"chaos_stream\"")).getOrElse("")
    assert(p.exitValue() == 0 && json.contains("\"injected\":true") &&
      json.contains("\"converged\":true"),
      s"chaos-stream failed (rc=${p.exitValue()}):\n" +
        (if (json.nonEmpty) json else out.takeRight(3000)))
  }
}
