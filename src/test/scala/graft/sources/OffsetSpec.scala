package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.connector.read.streaming.Offset
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the micro-batch offset contract: JSON round-trip
  * (including hostile filenames) and the fail-loudly prefix checks that the
  * end-to-end streaming test cannot reach (they require adversarial
  * directory mutations between batches). */
class OffsetSpec extends AnyFunSuite {

  private def mkStream(dir: String): CtdMicroBatchStream = {
    val conf = CtdDataSource.Conf("cnv", "data", Seq.empty, Seq(dir))
    new CtdMicroBatchStream(conf, org.apache.spark.sql.types.StructType(Nil), Array.empty,
      Files.createTempDirectory("graft-off-ckpt").toString)
  }

  private def drop(dir: java.nio.file.Path, name: String): Unit =
    Files.copy(Paths.get("src/test/resources/ctd-data/CTD_with_sigma_e00.cnv"),
      dir.resolve(name))

  test("offset json round-trips, including quotes/backslashes/newlines in names") {
    val dir = Files.createTempDirectory("graft-off")
    drop(dir, "a.cnv")
    val s = mkStream(dir.toString)
    val o1 = s.latestOffset()
    val back = s.deserializeOffset(o1.json())
    assert(back == o1, s"round-trip mismatch: ${o1.json()} vs ${back.json()}")
    // hostile name: the escaper must keep the checkpoint entry one line
    val hostile = """{"n":2,"last":"we\"ird\\name
.cnv","ph":42}"""
    val parsed = s.deserializeOffset(hostile)
    assert(!parsed.json().contains("\n"), parsed.json())
    assert(s.deserializeOffset(parsed.json()) == parsed)
  }

  test("deleting a committed file fails the next batch loudly") {
    val dir = Files.createTempDirectory("graft-off")
    drop(dir, "a.cnv"); drop(dir, "b.cnv")
    val s = mkStream(dir.toString)
    val end = s.latestOffset()
    Files.delete(dir.resolve("a.cnv"))
    val e = intercept[IllegalStateException] {
      s.planInputPartitions(s.initialOffset(), end)
    }
    assert(e.getMessage.contains("deleted"), e.getMessage)
  }

  test("compensating delete+insert inside the committed prefix is detected") {
    val dir = Files.createTempDirectory("graft-off")
    drop(dir, "b.cnv"); drop(dir, "d.cnv")
    val s = mkStream(dir.toString)
    val end = s.latestOffset() // commits [b, d]
    // same listing length, same boundary name 'd' — only the prefix hash
    // can catch this mutation
    Files.delete(dir.resolve("b.cnv"))
    drop(dir, "c.cnv")
    val e = intercept[IllegalStateException] {
      s.planInputPartitions(s.initialOffset(), end)
    }
    assert(e.getMessage.contains("no longer match"), e.getMessage)
  }

  test("late arrival sorting before committed names fails loudly") {
    val dir = Files.createTempDirectory("graft-off")
    drop(dir, "m.cnv")
    val s = mkStream(dir.toString)
    val end = s.latestOffset() // commits [m]
    drop(dir, "a.cnv") // sorts before m
    val e = intercept[IllegalStateException] {
      s.planInputPartitions(s.initialOffset(), end)
    }
    assert(e.getMessage.contains("monotonic") || e.getMessage.contains("no longer match"),
      e.getMessage)
  }

  test("append-only growth between offset capture and planning is fine") {
    val dir = Files.createTempDirectory("graft-off")
    drop(dir, "a.cnv")
    val s = mkStream(dir.toString)
    val end = s.latestOffset()
    drop(dir, "z.cnv") // arrives AFTER the committed boundary — legal
    val parts = s.planInputPartitions(s.initialOffset(), end)
    assert(parts.length == 1)
    assert(parts(0).asInstanceOf[CtdInputPartition].path.endsWith("a.cnv"))
  }
}
