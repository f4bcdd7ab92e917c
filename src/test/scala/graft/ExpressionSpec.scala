package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions.{col, concat_ws, lit}

import org.apache.spark.sql.catalyst.expressions.graftgsw.GswExpressions
import graft.gsw.Gsw

class ExpressionSpec extends SparkTestBase {

  test("native expressions register and evaluate through SQL (codegen path)") {
    GswExpressions.registerInto(spark)
    val r = spark.sql(
      """SELECT gsw_sigma0(34.7118, 28.8099) AS s0,
        |       gsw_z_from_p(1000.0, 4.0) AS z,
        |       gsw_p_from_z(-992.0919060719987, 4.0) AS p,
        |       gsw_distance(0.0, 0.0, 0.0, 1.0) AS d""".stripMargin).collect()(0)
    assert(r.getDouble(0) == Gsw.sigma0(34.7118, 28.8099))
    assert(r.getDouble(1) == Gsw.zFromP(1000.0, 4.0))
    assert(math.abs(r.getDouble(2) - 1000.0) < 1e-6)
    assert(r.getDouble(3) == Gsw.distance(0.0, 0.0, 0.0, 1.0))
  }

  test("expressions run inside whole-stage codegen over a table") {
    GswExpressions.registerInto(spark)
    // range source so the projection survives to runtime (a LocalRelation of
    // literals gets constant-folded at plan time)
    spark.range(1, 101)
      .selectExpr("cast(id as double) * 10 as p", "cast(4.0 as double) as lat")
      .createOrReplaceTempView("ptab")
    val q = spark.sql("SELECT p, gsw_z_from_p(p, lat) AS z FROM ptab")
    // plan check: the '*(n)' prefix marks operators inside a
    // WholeStageCodegen span — the projection with gsw_z_from_p carries it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("gsw_z_from_p") && l.trim.startsWith("*(")),
      s"gsw projection not inside a codegen span:\n$plan")
    val rows = q.collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == Gsw.zFromP(r.getDouble(0), 4.0))
    }
  }

  test("null intolerance: null input -> null output") {
    GswExpressions.registerInto(spark)
    val r = spark.sql("SELECT gsw_sigma0(CAST(NULL AS DOUBLE), 20.0) AS s").collect()(0)
    assert(r.isNullAt(0))
  }

  test("GraftExtensions injects every native function family") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws if the builder shapes are wrong
    assert(GswExpressions.all.map(_._1.funcName).sorted ==
      Seq("gsw_distance", "gsw_p_from_z", "gsw_sigma0", "gsw_z_from_p"))
    val injected = (
      GswExpressions.all ++
      org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions.all ++
      org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions.all ++
      org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions.all
    ).map(_._1.funcName).toSet
    // one representative per family + the newer kernels must be present
    // minhash_sig is Column-API-only (its permutation-constant arguments
    // don't fit SQL literal builders), so it's deliberately absent here
    Seq("gsw_sigma0", "array_dot", "simhash64", "word_shingles",
        "lsh_band_keys", "md5_hash31", "max_token_freq", "hashing_tf",
        "hashing_tf_sparse", "ascii_class_counts", "nfc_normalize",
        "deflate_ratio").foreach { f =>
      assert(injected.contains(f), s"$f missing from injected functions: $injected")
    }
  }

  test("array_dot == interpreted aggregate/zip_with fold == plain Scala fold") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val rows = (0 until 50).map { i =>
      val n = 1 + rng.nextInt(96)
      (i.toLong, Array.fill(n)(rng.nextFloat() * 4 - 2), Array.fill(n)(rng.nextFloat() * 4 - 2))
    }
    val df = rows.toDF("id", "a", "b")
    val interp = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val got = df.select(col("id"), graft.ops.SimOps.dot(col("a"), col("b")), interp)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val expected = rows.map { case (id, a, b) =>
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      (id, acc)
    }.toMap
    got.foreach { case (id, native, interpreted) =>
      assert(native == interpreted, s"row $id: native $native != interpreted $interpreted")
      assert(native == expected(id), s"row $id: native $native != scala ${expected(id)}")
    }
    // null semantics: mismatched lengths and null elements -> null
    val edge = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(graft.ops.SimOps.dot(col("a"), col("b"))).collect()(0)
    assert(edge.isNullAt(0))
  }

  test("array_dot / ivf_cell compile under CODEGEN_ONLY over NON-NULLABLE " +
       "array inputs (r6 regression: undeclared isNull broke janino)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions
    // non-nullable array<double> columns — the shape a collected-codebook
    // LocalTableScan produces, which drove nullSafeCodeGen into its
    // non-nullable branch where `ev.isNull` was never declared
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("b", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = (0 until 8).map { i =>
      org.apache.spark.sql.Row(i.toLong,
        Seq(1.0 + i, 2.0, 3.0), Seq(0.5, 1.5, 2.5 + i))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // CODEGEN_ONLY turns the silent interpreted fallback into a hard error
    val restore = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val dots = df.select(col("id"), ArrayMathExpressions.dot(col("a"), col("b")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0 until 8).foreach { i =>
        val exp = (1.0 + i) * 0.5 + 2.0 * 1.5 + 3.0 * (2.5 + i)
        assert(dots(i.toLong) == exp)
      }
      val cents = Seq(10L -> Array(1.0, 0.0, 0.0), 20L -> Array(0.0, 0.0, 1.0))
      val cells = df.select(col("id"), ArrayMathExpressions.ivfCell(col("a"), cents).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cells.values.toSet.subsetOf(Set(10L, 20L)))
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("mat_project: per-row dot fold matches array_dot, null element and " +
       "dim mismatch -> null, compiles under CODEGEN_ONLY") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions
    val m = Seq(Array(1.0, 2.0, 3.0), Array(-0.5, 0.25, 4.0))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = (0 until 4).map { i =>
      org.apache.spark.sql.Row(i.toLong, Seq(1.0 + i, -2.0, 0.5 * i))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val restore = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = df.select(col("id"),
          ArrayMathExpressions.matProject(col("v"), m).as("p"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      (0 until 4).foreach { i =>
        val v = Array(1.0 + i, -2.0, 0.5 * i)
        val exp = m.map { row =>
          var d = 0.0; var j = 0
          while (j < 3) { d += v(j) * row(j); j += 1 }; d
        }
        assert(got(i.toLong) == exp, s"row $i")
      }
      // parity with array_dot per output element (the shared fold contract)
      val viaDot = df.select(col("id"),
          ArrayMathExpressions.dot(col("v"),
            array(m.head.map(lit).toIndexedSeq: _*)).as("d0"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0 until 4).foreach(i => assert(got(i.toLong).head == viaDot(i.toLong)))
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // null element / dim mismatch -> null output (nullable path)
    import spark.implicits._
    val odd = Seq(
      (0L, Seq[java.lang.Double](1.0, null, 2.0)),
      (1L, Seq[java.lang.Double](1.0, 2.0)),        // dim 2 != 3
      (2L, Seq[java.lang.Double](1.0, 2.0, 3.0))
    ).toDF("id", "v")
    val outs = odd.select(col("id"),
        ArrayMathExpressions.matProject(col("v"), m).as("p"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(outs(0L) && outs(1L) && !outs(2L))
  }

  test("deflate_ratio: repetitive text compresses far below prose, empty " +
       "-> 1.0, null -> null, matches the reference JVM call, SQL-registered") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.grafttext.GraftTextKernels
    import spark.implicits._
    org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions
      .registerInto(spark)
    val boiler = "click here to subscribe " * 100
    val prose = "The pressure sensor drifted nine dbar during the second " +
      "upcast, which the lag correction only partially absorbed; we flag " +
      "casts twelve through fifteen for manual review and rerun binning."
    val docs = Seq((0L, Option(boiler)), (1L, Option(prose)),
      (2L, Option("")), (3L, Option.empty[String])).toDF("id", "text")
    val got = docs.select(col("id"),
        graft.ops.TextOps.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0L).exists(_ < 0.1), s"boilerplate ratio ${got(0L)}")
    assert(got(1L).exists(r => r > 0.4 && r < 1.0), s"prose ratio ${got(1L)}")
    assert(got(2L).contains(1.0), "empty -> 1.0 by convention")
    assert(got(3L).isEmpty, "null text -> null ratio")
    // parity with the reference kernel call (the deterministic contract —
    // golden bytes would overfit a zlib build)
    Seq(boiler, prose).foreach { t =>
      val direct = GraftTextKernels.deflateRatio(UTF8String.fromString(t))
      val viaDf = docs.filter(col("text") === t)
        .select(graft.ops.TextOps.compressionRatio(col("text")))
        .head().getDouble(0)
      assert(viaDf == direct)
    }
    // SQL registration round-trip
    val sqlVal = spark.sql("SELECT deflate_ratio('aaaaaaaaaaaaaaaaaaaa')")
      .head().getDouble(0)
    assert(sqlVal ==
      GraftTextKernels.deflateRatio(UTF8String.fromString("a" * 20)))
  }

  test("nfc_normalize: composes combining marks, compat singletons, " +
       "zero-copy ASCII; normalizeText strips control chars") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.grafttext.GraftTextKernels
    val decomposed = "cafe\u0301" // e + combining acute
    val composed   = "caf\u00e9"
    // kernel-level: ASCII fast path returns the SAME object (zero-copy)
    val ascii = UTF8String.fromString("plain ascii only")
    assert(GraftTextKernels.nfcNormalize(ascii) eq ascii)
    // combining mark composes; compat singleton Angstrom -> A-with-ring
    assert(GraftTextKernels.nfcNormalize(
      UTF8String.fromString(decomposed)).toString == composed)
    assert(GraftTextKernels.nfcNormalize(
      UTF8String.fromString("\u212B")).toString == "\u00c5")
    // already-NFC non-ASCII returns the same object too
    val nfc = UTF8String.fromString(composed)
    assert(GraftTextKernels.nfcNormalize(nfc) eq nfc)
    // through SQL with nulls and codegen
    org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions
      .registerInto(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS a, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS b")
      .collect()(0)
    assert(r.getString(0) == composed && r.isNullAt(1))
    // normalizeText: control chars out, then NFC
    import spark.implicits._
    val got = Seq("ab " + decomposed + " \u0007").toDF("t")
      .select(graft.ops.TextOps.normalizeText(col("t"))).collect()(0).getString(0)
    assert(got == "ab " + composed + " ")
  }

  test("hashing_tf: counts by md5-31 bucket, width honored, empty -> zeros") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val exprs = org.apache.spark.sql.catalyst.expressions.graftdedup
      .HashSketchExpressions
    val d = Seq(
      (0L, Seq("spark", "spark", "window")),
      (1L, Seq.empty[String])
    ).toDF("id", "tok")
    val rows = d.select(col("id"), exprs.hashingTf(col("tok"), 8).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(0L).length == 8 && rows(1L) == Seq.fill(8)(0L))
    assert(rows(0L).sum == 3)
    // bucket placement matches the driver-side md5-31 reference
    def bucket(t: String) = (org.apache.spark.sql.catalyst.expressions.graftdedup
      .GraftHashKernels.md5Hash31(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) % 8).toInt
    assert(rows(0L)(bucket("spark")) >= 2)
    assert(rows(0L)(bucket("window")) >= 1)
    // SQL surface
    exprs.registerInto(spark)
    val viaSql = spark.sql(
      "SELECT hashing_tf(array('a','b','a'), 4) AS v").collect()(0).getSeq[Long](0)
    assert(viaSql.sum == 3 && viaSql.length == 4)
  }

  test("hashing_tf_sparse: exactly the dense kernel's non-zero entries, " +
       "sorted by bucket; codegen-only; SQL surface") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val exprs = org.apache.spark.sql.catalyst.expressions.graftdedup
      .HashSketchExpressions
    val rng = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "spark", "window",
      "the", "a", "of", "x1", "2y", "zz9")
    val rows = (0L until 40L).map { i =>
      (i, Seq.fill(rng.nextInt(30))(words(rng.nextInt(words.length))))
    } :+ (99L, Seq.empty[String])
    val d = rows.toDF("id", "tok")
    // interpreted fallback would hide a codegen bug — force hard failure
    val restore = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      for (dim <- Seq(4, 64, 1 << 20)) {
        val got = d.select(col("id"), exprs.hashingTfSparse(col("tok"), dim).as("v"))
          .collect().map { r =>
            r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
              .map(s => s.getLong(0) -> s.getLong(1))
          }.toMap
        rows.foreach { case (id, toks) =>
          val exp = toks.groupBy(t =>
              (org.apache.spark.sql.catalyst.expressions.graftdedup.GraftHashKernels
                .md5Hash31(org.apache.spark.unsafe.types.UTF8String.fromString(t))
                % dim))
            .map { case (b, ts) => b -> ts.size.toLong }.toSeq.sortBy(_._1)
          assert(got(id) == exp, s"id $id dim $dim")
          assert(got(id).map(_._1) == got(id).map(_._1).sorted, s"id $id sorted")
        }
      }
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // SQL surface + null propagation
    exprs.registerInto(spark)
    val viaSql = spark.sql(
      "SELECT hashing_tf_sparse(array('a','b','a'), 4) AS v, " +
        "hashing_tf_sparse(CAST(NULL AS ARRAY<STRING>), 4) AS nv").collect()(0)
    val sqlPairs = viaSql.getSeq[org.apache.spark.sql.Row](0)
      .map(s => s.getLong(0) -> s.getLong(1))
    // 'a' and 'b' may share a bucket at dim=4 — only the total is stable
    assert(sqlPairs.map(_._2).sum == 3 && sqlPairs.nonEmpty && sqlPairs.size <= 2)
    assert(viaSql.isNullAt(1))
  }

  test("linear_score: sigmoid(w . tf + bias) per the driver reference; " +
       "empty -> sigmoid(bias); null -> null; codegen-only") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val exprs = org.apache.spark.sql.catalyst.expressions.graftdedup
      .HashSketchExpressions
    val K = org.apache.spark.sql.catalyst.expressions.graftdedup.GraftHashKernels
    val dim = 32
    val rng = new scala.util.Random(11)
    val w = Array.fill(dim)(rng.nextDouble() * 2 - 1)
    val bias = -0.375
    val words = Array("spark", "scala", "window", "agg", "join", "shuffle")
    val rows = (0L until 25L).map { i =>
      (i, Seq.fill(rng.nextInt(20))(words(rng.nextInt(words.length))))
    } :+ (98L, Seq.empty[String])
    val d = rows.toDF("id", "tok")
      .union(Seq((99L, null.asInstanceOf[Seq[String]])).toDF("id", "tok"))
    val restore = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = d.select(col("id"),
          exprs.linearScore(col("tok"),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(w), bias).as("s"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      rows.foreach { case (id, toks) =>
        var acc = bias
        toks.foreach { t =>
          acc += w((K.md5Hash31(
            org.apache.spark.unsafe.types.UTF8String.fromString(t)) % dim).toInt)
        }
        assert(got(id).contains(1.0 / (1.0 + math.exp(-acc))), s"id $id")
      }
      assert(got(98L).contains(1.0 / (1.0 + math.exp(-bias))), "empty doc")
      assert(got(99L).isEmpty, "null tokens must score null")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("tokenize_with_offsets: tokens match tokens(), offsets substring " +
       "back to original spellings, non-ASCII counts code points") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val X = org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions
    val texts = Seq(
      "The quick brown fox! Over 42 lazy-dogs.",
      "  leading space, trailing!  ",
      "no_Punct42mix",
      "",
      "!!! ???",
      "café brûle 7 € teas", // non-ASCII letters + symbol
      "世界 hello 99") // CJK (not [a-z0-9]) around ASCII tokens
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), X.tokenizeWithOffsets(col("t")).as("o"),
        graft.ops.TextOps.tokens(col("t")).as("ref"))
      .collect().map { r =>
        val o = r.getStruct(1)
        (r.getLong(0), o.getSeq[String](0), o.getSeq[Int](1), o.getSeq[Int](2),
          r.getSeq[String](2))
      }
    got.foreach { case (id, toks, starts, ends, ref) =>
      val text = texts(id.toInt)
      assert(toks == ref, s"id $id: kernel tokens $toks != tokens() $ref")
      assert(starts.length == toks.length && ends.length == toks.length)
      toks.indices.foreach { i =>
        // offsets are 1-based inclusive CODE-POINT positions: substring of
        // the original lowercased == the token
        val cps = text.codePoints().toArray
        val span = new String(cps, starts(i) - 1, ends(i) - starts(i) + 1)
        assert(span.toLowerCase == toks(i),
          s"id $id token $i: span '$span' != '${toks(i)}' (start ${starts(i)} end ${ends(i)})")
      }
    }
    // non-ASCII path: 'café' is a 4-char token at positions 1-4 ('é'
    // lowercases to itself, not to ASCII, so it IS part of the token per
    // Character.toLowerCase... verify against the actual kernel contract
    val cafe = got.find(_._1 == 5L).get
    assert(cafe._2.head.startsWith("caf"), s"got ${cafe._2}")
  }

  test("int8_quantize: round-trip error <= scale/2, cosine preserved, " +
       "zero vector / null element semantics, codegen-only") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions
    import spark.implicits._
    val rng = new scala.util.Random(53)
    val rows = (0L until 40L).map { i =>
      (i, Array.fill(64)((rng.nextFloat() * 4 - 2)))
    } :+ (98L, Array.fill(8)(0.0f))
    val d = rows.toDF("id", "v")
      .union(Seq((99L, null.asInstanceOf[Array[Float]])).toDF("id", "v"))
    val restore = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = d.select(col("id"), ArrayMathExpressions.int8Quantize(col("v")).as("qs"))
        .collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(1)) None else {
            val s = r.getStruct(1)
            Some((s.getDouble(0), s.getSeq[Byte](1)))
          })
        }.toMap
      rows.foreach { case (id, v) =>
        val Some((scale, q)) = got(id)
        val m = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
        assert(scale == m / 127.0, s"id $id scale")
        assert(q.length == v.length)
        v.indices.foreach { i =>
          // reference rounding, and the error contract
          if (m > 0)
            assert(q(i) == math.floor(v(i).toDouble / m * 127.0 + 0.5).toByte)
          else assert(q(i) == 0)
          assert(math.abs(v(i).toDouble - q(i) * scale) <= scale / 2 + 1e-12,
            s"id $id dim $i error beyond scale/2")
        }
      }
      assert(got(98L).exists { case (s, q) => s == 0.0 && q.forall(_ == 0) })
      assert(got(99L).isEmpty, "null vector must quantize to null")
      // cosine ordering survives quantization: dequantized dot products
      // track the originals within int8 resolution
      val a = rows.head._2.map(_.toDouble)
      rows.tail.take(10).foreach { case (id, v) =>
        val Some((scale, q)) = got(id)
        val Some((scaleA, qA)) = got(0L)
        def cos(x: Array[Double], y: Array[Double]) = {
          val dot = x.zip(y).map { case (p, r) => p * r }.sum
          dot / (math.sqrt(x.map(t => t * t).sum) * math.sqrt(y.map(t => t * t).sum))
        }
        val orig = cos(a, v.map(_.toDouble))
        val deq = cos(qA.map(_ * scaleA).toArray, q.map(_ * scale).toArray)
        assert(math.abs(orig - deq) < 0.02, s"id $id cosine drift: $orig vs $deq")
      }
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // SQL surface
    ArrayMathExpressions.registerInto(spark)
    val viaSql = spark.sql(
      "SELECT int8_quantize(array(CAST(1.0 AS DOUBLE), -0.5, 0.25)).q AS q")
      .collect()(0).getSeq[Byte](0)
    assert(viaSql == Seq[Byte](127, -63, 32), s"got $viaSql")
  }

  test("l2_normalize: unit norm, dot-after == cosine, zero vector and " +
       "null element semantics") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions
    import spark.implicits._
    val d = Seq(
      (0L, Array(3.0f, 4.0f)),
      (1L, Array(0.0f, 0.0f)),       // zero norm: passes through
      (2L, Array(1.0f, -2.0f, 2.0f))
    ).toDF("id", "v")
    val out = d.select(col("id"), ArrayMathExpressions.l2Normalize(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(0L) == Seq(0.6, 0.8))
    assert(out(1L) == Seq(0.0, 0.0))
    val n2 = out(2L)
    assert(math.abs(n2.map(x => x * x).sum - 1.0) < 1e-12)
    // dot of two normalized copies of the same vector is exactly cosine 1
    val selfCos = d.filter(col("id") === 2L)
      .select(ArrayMathExpressions.dot(
        ArrayMathExpressions.l2Normalize(col("v")),
        ArrayMathExpressions.l2Normalize(col("v"))))
      .collect()(0).getDouble(0)
    assert(math.abs(selfCos - 1.0) < 1e-12)
    // null element -> null vector
    val withNull = Seq(Tuple1(Array[java.lang.Float](1.0f, null))).toDF("v")
      .select(ArrayMathExpressions.l2Normalize(col("v"))).collect()(0)
    assert(withNull.isNullAt(0))
    // overflow/underflow guard: huge and tiny doubles keep their direction
    val extreme = Seq((0L, Array(1e200, 1e200)), (1L, Array(1e-200, 0.0)))
      .toDF("id", "v")
      .select(col("id"), ArrayMathExpressions.l2Normalize(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(math.abs(extreme(0L).map(x => x * x).sum - 1.0) < 1e-12,
      s"1e200 vector lost its direction: ${extreme(0L)}")
    assert(extreme(1L) == Seq(1.0, 0.0),
      s"1e-200 vector treated as zero-norm: ${extreme(1L)}")
    // SQL surface (same registry path as array_dot)
    org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions
      .registerInto(spark)
    val viaSql = spark.sql(
      "SELECT l2_normalize(array(cast(3.0 as double), cast(4.0 as double))) AS n")
      .collect()(0).getSeq[Double](0)
    assert(viaSql == Seq(0.6, 0.8))
  }

  test("randomized: native kernels equal reference Scala over unicode tokens") {
    import spark.implicits._
    // vocabulary stresses multi-byte UTF-8: the native kernels hash/concat
    // raw bytes, the reference path goes through java.lang.String
    val vocab = Vector("the", "fox", "café", "naïve", "中文", "🦊", "a", "", "b1")
    val rng = new scala.util.Random(0xC0FFEE)
    val rows = (0L until 200L).map { i =>
      val n = rng.nextInt(12)
      (i, Vector.fill(n)(vocab(rng.nextInt(vocab.length))))
    }
    val df = rows.toDF("id", "toks")
    val X = org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions
    val perms = graft.ops.DedupOps.permConstants(16)
    val got = df.select(col("id"),
        graft.ops.DedupOps.shinglesFromTokens(col("toks"), 3).as("sh"),
        X.simhash64(col("toks")).as("sim"),
        X.maxTokenFreq(col("toks")).as("mtf"),
        X.md5Hash31(concat_ws(":", lit("graft"), col("id").cast("string"))).as("h31"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1).toList, r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (md(i) & 0xffL))
    }
    rows.foreach { case (id, toks) =>
      // shingles reference (old UDF semantics)
      val expSh =
        if (toks.length < 3) List(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toList.distinct
      // simhash reference
      val votes = new Array[Long](64)
      toks.foreach { t =>
        val h = h64(t)
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      val expSim = (0 until 64).foldLeft(0L)((a, b) => if (votes(b) > 0) a | (1L << b) else a)
      val expMtf = if (toks.isEmpty) 0L else toks.groupBy(identity).values.map(_.size).max.toLong
      val expH31 = h64(s"graft:$id") & 0x7fffffffL
      val (gSh, gSim, gMtf, gH31) = got(id)
      assert(gSh == expSh, s"id $id shingles: $gSh != $expSh (toks=$toks)")
      assert(gSim == expSim, s"id $id simhash")
      assert(gMtf == expMtf, s"id $id maxTokenFreq")
      assert(gH31 == expH31, s"id $id md5Hash31")
    }
    // minhash over the same rows via the expression vs driver-side math
    val sigGot = df.select(col("id"),
        graft.ops.DedupOps.minHashFromShingles(
          graft.ops.DedupOps.shinglesFromTokens(col("toks"), 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    rows.foreach { case (id, toks) =>
      val sh = if (toks.length < 3) List(toks.mkString(" "))
               else toks.sliding(3).map(_.mkString(" ")).toList.distinct
      val expSig = perms.map { case (a, b) =>
        if (sh.isEmpty) Long.MaxValue
        else sh.map(s => (a * (h64(s) & 0x7fffffffL) + b) % 2147483647L).min
      }.toList
      assert(sigGot(id) == expSig, s"id $id minhash sig")
    }
  }

  test("shingles expression: distinct n-grams, first-occurrence order, short arrays") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b c d a b c"),    // repeats: "a b c" appears twice -> distinct
      (1L, "x y"),              // shorter than n=3 -> single joined shingle
      (2L, "")                  // no tokens -> [""]
    ).toDF("id", "text")
    val out = d.select(col("id"),
        graft.ops.DedupOps.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(out(0L) == List("a b c", "b c d", "c d a", "d a b"))
    assert(out(1L) == List("x y"))
    assert(out(2L) == List(""))
  }

  test("simhash64/minhash_sig expressions match reference Scala computations") {
    import spark.implicits._
    val text = "the quick brown fox the quick"
    val toks = text.split(" ").toSeq
    // reference simhash computed directly from the kernel's hash
    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (md(i) & 0xffL))
    }
    val votes = new Array[Long](64)
    toks.foreach { t =>
      val h = h64(t)
      (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
    }
    val expected = (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    val d = Seq((0L, text)).toDF("id", "text")
    val got = d.select(graft.ops.DedupOps.simHash64(graft.ops.TextOps.tokens(col("text"))))
      .first().getLong(0)
    assert(got == expected)
    // SQL surface via GraftExtensions-style registration
    org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions
      .registerInto(spark)
    d.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      "SELECT simhash64(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) FROM sh_docs")
      .first().getLong(0)
    assert(viaSql == expected)
    // minhash signature: min over shingle hashes of each affine permutation
    val perms = graft.ops.DedupOps.permConstants(8)
    val shing = List("the quick brown", "quick brown fox", "brown fox the", "fox the quick")
    val expSig = perms.map { case (a, b) =>
      shing.map(s => (a * (h64(s) & 0x7fffffffL) + b) % 2147483647L).min
    }.toList
    val gotSig = d.select(graft.ops.DedupOps.minHashSignature(col("text"), numHashes = 8))
      .first().getSeq[Long](0).toList
    assert(gotSig == expSig)
  }

  test("shingle_hash_set: sorted distinct md5-31 hashes, codegen-only, " +
       "SQL surface") {
    import spark.implicits._
    def h31(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (md(i) & 0xffL)) & 0x7fffffffL
    }
    val K = org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions
    val d = Seq(
      (0L, Seq("a b c", "b c d", "a b c")), // repeat -> one hash
      (1L, Seq.empty[String])
    ).toDF("id", "sh")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = d.select(col("id"), K.shingleHashSet(col("sh")).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      assert(out(0L) == List("a b c", "b c d").map(h31).distinct.sorted)
      assert(out(1L) == Nil)
      K.registerInto(spark)
      d.createOrReplaceTempView("shs_docs")
      val viaSql = spark.sql(
        "SELECT shingle_hash_set(sh) FROM shs_docs WHERE id = 0")
        .first().getSeq[Long](0).toList
      assert(viaSql == List("a b c", "b c d").map(h31).distinct.sorted)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("segments_not_in_hash/text: parity with the interpreted lambda " +
       "rebuild they replace; codegen-only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{filter, xxhash64}
    val exprs = org.apache.spark.sql.catalyst.expressions.graftdedup
      .HashSketchExpressions
    // empty strings, whitespace, multi-byte UTF-8 — the shapes split() emits
    val vocab = Array("SUBSCRIBE NOW", "the quick fox", "", " ", "café 中文",
      "b1", "x", "rare line")
    val rng = new scala.util.Random(52)
    val rows = (0L until 60L).map { i =>
      (i, Seq.fill(rng.nextInt(9))(vocab(rng.nextInt(vocab.length))))
    } :+ (99L, Seq.empty[String])
    val d = rows.toDF("id", "segs")
    val blockedTexts = Seq("SUBSCRIBE NOW", "café 中文", "never-present")
    // blocklist hashes via Spark's own xxhash64, so seeds agree by
    // construction with the kernel's XXH64.hashUTF8String(_, 42)
    val blockedHashes = blockedTexts.toDF("s")
      .select(xxhash64(col("s"))).collect().map(_.getLong(0)).toSeq
    val restore = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = d.select(col("id"),
          exprs.segmentsNotInHash(col("segs"), blockedHashes).as("h"),
          exprs.segmentsNotInText(col("segs"), blockedTexts).as("t"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[String](2)))
        .toMap
      rows.foreach { case (id, segs) =>
        val exp = segs.filterNot(blockedTexts.contains)
        assert(got(id)._1 == exp, s"hash path, id $id")
        assert(got(id)._2 == exp, s"text path, id $id")
      }
      // bit-parity with the interpreted higher-order composition replaced
      // in DedupOps.lineDedupImpl
      val viaLambda = d.select(col("id"),
          filter(col("segs"),
            s => !xxhash64(s).isInCollection(blockedHashes)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      rows.foreach { case (id, _) =>
        assert(got(id)._1 == viaLambda(id), s"lambda parity, id $id")
      }
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("drop_segments_by_index: positional filter parity with a driver " +
       "replay; out-of-range indices ignored; codegen-only; SQL surface") {
    import spark.implicits._
    val exprs = org.apache.spark.sql.catalyst.expressions.graftdedup
      .HashSketchExpressions
    val rng = new scala.util.Random(71)
    val vocab = Array("a", "", " ", "café 中文", "long segment text")
    val rows = (0L until 50L).map { i =>
      val segs = Seq.fill(rng.nextInt(8))(vocab(rng.nextInt(vocab.length)))
      val drops = (0 until segs.length + 2)
        .filter(_ => rng.nextBoolean()).sorted // may include out-of-range
      (i, segs, drops)
    } :+ (99L, Seq.empty[String], Seq(0, 1))
    val d = rows.toDF("id", "segs", "drops")
    val restore = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = d.select(col("id"),
          exprs.dropSegmentsByIndex(col("segs"), col("drops")).as("kept"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      rows.foreach { case (id, segs, drops) =>
        val exp = segs.zipWithIndex.collect {
          case (s, i) if !drops.contains(i) => s
        }
        assert(got(id) == exp, s"id $id: got ${got(id)}, want $exp")
      }
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // SQL registration
    exprs.registerInto(spark)
    val viaSql = spark.sql(
      "SELECT drop_segments_by_index(array('x', 'y', 'z'), array(1))")
      .collect().head.getSeq[String](0)
    assert(viaSql == Seq("x", "z"))
  }

  test("kll_* SQL surface: sketch-agg, merge-agg, and quantile compose " +
       "through real SQL; empty sketch reads null") {
    import spark.implicits._
    org.apache.spark.sql.catalyst.expressions.graftsketch.KllExpressions
      .registerInto(spark)
    (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_in")
    val row = spark.sql(
      """SELECT g, kll_quantile(kll_sketch_agg(v, 200), 0.5d) AS p50
        |FROM kll_in GROUP BY g""".stripMargin).collect().head
    assert(row.getString(0) == "a" &&
      row.getDouble(1) > 40 && row.getDouble(1) < 60, row.toString)
    // merge path + empty sketch -> null quantile
    val merged = spark.sql(
      """WITH s AS (
        |  SELECT v < 51 AS half, kll_sketch_agg(v, 200) AS sk
        |  FROM kll_in GROUP BY 1
        |)
        |SELECT kll_quantile(kll_merge_agg(sk), 0.5d) AS p50 FROM s""".stripMargin)
      .collect().head.getDouble(0)
    assert(merged > 40 && merged < 60, s"merged p50 = $merged")
    val empty = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(v, 200), 0.5d) " +
      "FROM kll_in WHERE v < 0").collect().head
    assert(empty.isNullAt(0), "empty sketch must read null")
  }

  test("ivf_cells on a non-finite vector degrades to a valid probe list " +
       "(codebook order) and agrees with ivf_cell at probe 0 — no " +
       "taken(-1) task kill") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions
    val cents = Seq(
      10L -> Array(1.0, 0.0, 0.0),
      20L -> Array(0.0, 1.0, 0.0),
      30L -> Array(0.0, 0.0, 1.0))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false)))
    // row 0: an Inf component NaNs the cosine for EVERY centroid
    // (d = Inf, norm = Inf, Inf/Inf = NaN); row 1: a plain vector as the
    // sanity anchor that ordinary scoring still wins over the degradation
    val rows = Seq(
      org.apache.spark.sql.Row(0L, Seq(Double.PositiveInfinity, 1.0, 0.0)),
      org.apache.spark.sql.Row(1L, Seq(0.1, 0.2, 5.0)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = df.select(col("id"),
        ArrayMathExpressions.ivfCell(col("v"), cents).as("cell"),
        ArrayMathExpressions.ivfCells(col("v"), cents, 2).as("cells"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2)))
      .toMap
    // non-finite vector: both ops pick codebook order, probe 0 == ivf_cell
    assert(got(0L)._1 == 10L, s"ivf_cell on Inf vector: ${got(0L)._1}")
    assert(got(0L)._2 == Seq(10L, 20L), s"ivf_cells on Inf vector: ${got(0L)._2}")
    // normal vector: argmax centroid first, runner-up second
    assert(got(1L)._1 == 30L && got(1L)._2.head == 30L && got(1L)._2.size == 2)
  }
}
