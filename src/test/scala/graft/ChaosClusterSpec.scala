package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Forks [[ChaosCluster]] into its own JVM (it owns a local-cluster
 * SparkContext that cannot share this suite's session): the near-dup
 * append protocol under a REAL executor-JVM kill mid-write — the
 * strongest form of the ChaosSpec crash window, with the abort crossing
 * an actual process boundary and the retry running on relaunched
 * executors.
 */
class ChaosClusterSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("near-dup append converges after a real executor kill mid-write " +
       "under local-cluster") {
    assume(new java.io.File(sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
      .isDirectory, "no Spark distribution for local-cluster workers")
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpens ++ Seq(
      "-Xmx6g",
      "-cp", sys.props("java.class.path"),
      "graft.ChaosCluster")
    val outFile = java.io.File.createTempFile("chaos_cluster", ".log")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(outFile)
    val p = pb.start()
    val finished = p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    val out = java.nio.file.Files.readString(outFile.toPath)
    outFile.delete()
    assert(finished, s"ChaosCluster timed out:\n${out.takeRight(2000)}")
    val json = out.linesIterator
      .find(_.contains("\"metric\":\"chaos_cluster\"")).getOrElse("")
    assert(p.exitValue() == 0 && json.contains("\"injected\":true") &&
      json.contains("\"converged\":true"),
      s"chaos-cluster failed (rc=${p.exitValue()}):\n" +
        (if (json.nonEmpty) json else out.takeRight(3000)))
  }
}
