package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Cross-JVM execution smoke (VERDICT r11 task #1): forks
 * [[ClusterSmoke]] into its own JVM (it owns two sequential
 * SparkContexts — `local-cluster[2,2,2048]` with real separate executor
 * processes, then `local[4]` — which cannot share this suite's session)
 * and asserts every family's row-set hash matches across the two masters.
 *
 * This is the one place task serialization actually crosses a process
 * boundary: codegen reference objects (classifier weights, IVF codebooks,
 * blocklist InSets), kryo-encoded kernel comparators, and the DSv2
 * reader's closures all ride the wire here and nowhere else in the suite.
 */
class ClusterModeSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("every operator family is hash-identical between local-cluster " +
       "(separate executor JVMs) and local mode") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata unavailable")
    assume(new java.io.File(sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
      .isDirectory, "no Spark distribution for local-cluster workers")
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpens ++ Seq(
      "-Xmx8g",
      "-cp", sys.props("java.class.path"),
      "graft.ClusterSmoke", "/root/testdata/sf0.001")
    // output goes to a file, not a pipe: Spark logs would fill the pipe
    // buffer and deadlock a waitFor that reads afterwards
    val outFile = java.io.File.createTempFile("cluster_smoke", ".log")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(outFile)
    val p = pb.start()
    val finished = p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    val out = java.nio.file.Files.readString(outFile.toPath)
    outFile.delete()
    assert(finished, s"ClusterSmoke timed out:\n${out.takeRight(2000)}")
    val json = out.linesIterator
      .find(_.contains("\"metric\":\"cluster_smoke\"")).getOrElse("")
    assert(p.exitValue() == 0 && json.contains("\"all_match\":true"),
      s"cross-JVM mismatch (rc=${p.exitValue()}):\n" +
      (if (json.nonEmpty) json else out.takeRight(3000)))
    // and it actually exercised every family
    ClusterSmoke.Queries.foreach(q =>
      assert(json.contains(s""""$q":{"match":true"""), s"$q missing: $json"))
  }
}
