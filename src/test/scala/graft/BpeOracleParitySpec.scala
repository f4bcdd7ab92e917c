package graft

import org.apache.spark.sql.functions._

/** q86b's oracle replays BPE segmentation as a rank-ordered chain of
  * left-to-right `replace()` passes over paren-wrapped symbols. That is
  * only equal to the kernel's repeated-lowest-rank greedy when the merge
  * list is WELL-FORMED (components are single code points, `</w>`, or
  * earlier products; products distinct) — this spec pins the equivalence
  * on the actual q86b list and on randomly GENERATED well-formed lists,
  * so the oracle's validity is a tested property, not an argument in a
  * comment. */
class BpeOracleParitySpec extends SparkTestBase {

  /** The oracle's exact algorithm, in Scala: wrap each code point,
    * apply each merge once in rank order via literal left-to-right
    * replace (Java String.replace == DuckDB replace: non-overlapping,
    * scanning resumes after the replacement), unwrap. */
  private def oracleSegment(word: String,
                            merges: Seq[(String, String)]): Seq[String] = {
    val sb = new StringBuilder
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      sb.append('(').append(word.substring(i, i + cc)).append(')')
      i += cc
    }
    sb.append("(</w>)")
    var state = sb.toString
    merges.foreach { case (l, r) =>
      state = state.replace(s"($l)($r)", s"($l$r)")
    }
    state.substring(1, state.length - 1).split("\\)\\(").toSeq
  }

  private def kernelSegment(words: Seq[String],
                            merges: Seq[(String, String)]): Seq[Seq[String]] = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions
    words.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "word")
      .select(col("i"),
        TextKernelExpressions.bpeEncode(array(col("word")), merges).as("seg"))
      .collect().sortBy(_.getInt(0)).map(_.getSeq[String](1).toSeq).toSeq
  }

  private def randomWords(rnd: scala.util.Random, n: Int): Seq[String] = {
    // biased toward the merge-list alphabet so merges actually fire,
    // including chain-prone shapes (repeats, th/the/ing clusters)
    val frags = Seq("t", "h", "e", "i", "n", "g", "a", "d", "o", "r", "s",
      "0", "1", "2", "l", "th", "the", "ing", "and", "to", "es", "00", "ll")
    (0 until n).map { _ =>
      val k = 1 + rnd.nextInt(6)
      (0 until k).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }
  }

  test("q86b list: kernel repeated-min greedy == oracle in-order replace " +
       "chain on random and adversarial words") {
    val rnd = new scala.util.Random(86)
    val words = (randomWords(rnd, 2000) ++ Seq(
      "the", "thethe", "aaa", "0000", "100", "2000", "tototo", "ingesting",
      "understanding", "q", "qu", "stress", "llll", "ororor", "eee",
      "andand", "theses")).distinct
    val kern = kernelSegment(words, SparkEntry.q86bMerges)
    words.zip(kern).foreach { case (w, got) =>
      val want = oracleSegment(w, SparkEntry.q86bMerges)
      assert(got == want, s"word '$w': kernel $got != oracle $want")
      // segmentation is a partition of the word + terminal
      assert(got.mkString == w + "</w>", s"word '$w': not a partition: $got")
    }
  }

  test("equivalence holds for randomly GENERATED well-formed merge lists " +
       "(the property the q86b oracle rests on)") {
    val rnd = new scala.util.Random(4242)
    (0 until 5).foreach { trial =>
      // grow a well-formed list: each merge pairs two existing symbols
      // (chars, </w>, or earlier products), products kept distinct
      val chars = "abc01".map(_.toString)
      val symbols = scala.collection.mutable.ArrayBuffer[String](chars: _*)
      symbols += "</w>"
      val products = scala.collection.mutable.Set[String]()
      val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (merges.length < 30) {
        val l = symbols(rnd.nextInt(symbols.length))
        val r = symbols(rnd.nextInt(symbols.length))
        val p = l + r
        // </w> can only terminate: as a LEFT component it could glue two
        // words' symbols in theory; the kernel never sees that (</w> is
        // terminal) so exclude it from the generator too
        if (l != "</w>" && !products.contains(p)) {
          products += p; merges += ((l, r)); symbols += p
        }
      }
      val words = (0 until 400).map { _ =>
        val k = 1 + rnd.nextInt(10)
        (0 until k).map(_ => chars(rnd.nextInt(chars.length))).mkString
      }.distinct
      val kern = kernelSegment(words, merges.toSeq)
      words.zip(kern).foreach { case (w, got) =>
        val want = oracleSegment(w, merges.toSeq)
        assert(got == want,
          s"trial $trial word '$w' merges ${merges.toSeq}: $got != $want")
      }
    }
  }

  test("r16 int-id table: memoized repeats, unknown symbols, and astral " +
       "code points segment like the oracle") {
    // repeated words exercise the BpeTable memo (same plan, same rows);
    // 'q'/emoji exercise symbols outside the merge universe (can never
    // merge, emitted verbatim — astral chars are one CODE POINT, two
    // UTF-16 units, the off-by-one a char-indexed rewrite would hit)
    val words = Seq("the", "the", "the", "qqq", "q0q", "a🎉b",
      "🎉", "thethe", "the")
    val kern = kernelSegment(words, SparkEntry.q86bMerges)
    words.zip(kern).foreach { case (w, got) =>
      val want = oracleSegment(w, SparkEntry.q86bMerges)
      assert(got == want, s"word '$w': kernel $got != oracle $want")
    }
    // identical word -> identical segmentation across occurrences
    assert(kern(0) == kern(1) && kern(1) == kern(2) && kern(2) == kern(8))
  }

  /** An obviously-correct O(rounds x corpus-symbols) reference trainer:
    * recount EVERY pair from scratch each round, pick max count with
    * ties to the lexicographically smallest (left, right), merge all
    * occurrences left-to-right. No heap, no incremental updates — the
    * structure the incremental trainer must agree with. */
  private def naiveTrain(words: Seq[(String, Long)],
                         numMerges: Int): Seq[(String, String)] = {
    var vocab: Seq[(Seq[String], Long)] = words.map { case (w, c) =>
      (w.map(_.toString).toSeq :+ "</w>", c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var p = 0
          while (p < syms.length) {
            if (p < syms.length - 1 && syms(p) == best._1 &&
                syms(p + 1) == best._2) { out += syms(p) + syms(p + 1); p += 2 }
            else { out += syms(p); p += 1 }
          }
          (out.toSeq, c)
        }
      }
    }
    merges.toSeq
  }

  test("incremental heap trainer == naive recount-everything trainer on " +
       "random corpora and on real sf0.001 documents") {
    import spark.implicits._
    import graft.ops.TextOps
    val rnd = new scala.util.Random(99)
    // random ASCII-word corpora with heavy repetition so merges chain deep
    (0 until 3).foreach { trial =>
      val frags = Seq("th", "the", "ing", "and", "ab", "ba", "x", "0", "10")
      val words = (0 until 120).map { _ =>
        (0 until (1 + rnd.nextInt(4)))
          .map(_ => frags(rnd.nextInt(frags.length))).mkString
      }
      val weighted = words.groupBy(identity).toSeq
        .map { case (w, g) => (w, g.size.toLong * (1 + rnd.nextInt(5))) }
      val corpus = weighted.flatMap { case (w, c) =>
        Seq.fill(c.toInt)(w)
      }.mkString(" ")
      val got = TextOps.trainBpeMerges(Seq(corpus).toDF("text"), "text",
        numMerges = 60)
      // the engine tokenizer lowercases + splits [a-z0-9]+: our corpus is
      // already in that alphabet, so word counts match the naive input
      val want = naiveTrain(weighted, 60)
      assert(got == want, s"trial $trial:\n got $got\nwant $want")
    }
    // the real corpus: merge lists agree on actual document text
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(120)
    val words = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = TextOps.trainBpeMerges(docs, "text", numMerges = 120)
    val want = naiveTrain(words, 120)
    assert(got == want,
      s"real-corpus divergence at ${got.zip(want).indexWhere(p => p._1 != p._2)}")
  }

  test("a NON-well-formed list is rejected by construction checks and " +
       "does diverge (the guard is not vacuous)") {
    // merges = [(ab,c), (a,b)]: rank 0's left component is rank 1's
    // product — kernel merges (a,b) first then (ab,c); the in-order
    // chain misses (ab,c) entirely
    val bad = Seq("ab" -> "c", "a" -> "b")
    val kern = kernelSegment(Seq("abc"), bad).head
    val fold = oracleSegment("abc", bad)
    assert(kern == Seq("abc", "</w>"))
    assert(fold == Seq("ab", "c", "</w>"))
    assert(kern != fold)
    // and the q86b validator would refuse it
    val products = scala.collection.mutable.Set[String]()
    val wellFormed = bad.forall { case (l, r) =>
      val ok = Seq(l, r).forall(c =>
        c == "</w>" || c.codePointCount(0, c.length) == 1 || products.contains(c))
      products += (l + r); ok
    }
    assert(!wellFormed)
  }
}
