package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/**
 * Pin for the r16 scale-adaptive closure in DedupOps.canonicalMapping:
 * when the verified edge set fits the driver (localPairLimit), a single
 * collect + local min-union-find replaces the distributed min-label
 * rounds. The (id, canonical_id) SET must be identical on both paths —
 * min-union locally and min-label closure distributed both label every
 * member of a component with the component's minimum id. The distributed
 * path is forced with localPairLimit = 0 (any non-empty edge set
 * overflows it).
 */
class CanonicalMappingLocalSpec extends SparkTestBase {

  private def corpus() = {
    import spark.implicits._
    // planted clusters: 3 exact-ish triangles + a chain + singletons
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again!",
      3L -> "the quick brown fox jumps over the lazy dog again and again?",
      10L -> "completely different content about spark optimization rounds",
      11L -> "completely different content about spark optimization rounds x",
      20L -> "a third family of documents discussing integer lloyd kernels",
      21L -> "a third family of documents discussing integer lloyd kernels y",
      22L -> "a third family of documents discussing integer lloyd kernels z",
      30L -> "an unrelated singleton that matches nothing else in the set",
      31L -> "another standalone row with its own vocabulary entirely apart")
    texts.toDF("doc_id", "text")
  }

  private def mappingSet(localPairLimit: Int): Set[(Long, Long)] =
    DedupOps.canonicalMapping(corpus(), "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.5,
        localPairLimit = localPairLimit)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("local union-find mapping equals the distributed min-label " +
      "mapping, row set and schema") {
    val local = mappingSet(localPairLimit = 1 << 20)
    val dist = mappingSet(localPairLimit = 0)
    assert(local == dist, s"local $local != distributed $dist")
    assert(local.nonEmpty, "planted clusters must produce a mapping")
    // canonical = component minimum, canonicals map to themselves
    local.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.map(_._1).min == canon,
        s"canonical $canon is not the component minimum")
      assert(members.contains((canon, canon)),
        s"canonical $canon does not map to itself")
    }
    // schema parity between the two paths
    val sLocal = DedupOps.canonicalMapping(corpus(), "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5).schema
    val sDist = DedupOps.canonicalMapping(corpus(), "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5,
      localPairLimit = 0).schema
    assert(sLocal.map(f => (f.name, f.dataType)) ==
      sDist.map(f => (f.name, f.dataType)))
  }
}
