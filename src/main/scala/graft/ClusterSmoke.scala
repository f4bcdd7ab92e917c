package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Cross-JVM execution smoke (VERDICT r11 task #1): every green result to
 * date ran `local[n]` — one JVM, where closure capture and the codegen
 * "reference objects" the engine leans on (classifier weights in
 * `LinearScoreExpr`, IVF codebooks in `graftarray`, blocklist InSets,
 * kryo-encoded kernel comparators) never cross a process boundary. This
 * main runs a representative query per operator family TWICE — under
 * `local-cluster[2,2,2048]` (a real standalone master + 2 separate
 * executor JVMs, tasks serialized over the wire) and under `local[4]` —
 * and compares row-set hashes. A serialization-boundary bug shows up as a
 * crash or a hash mismatch in the cluster pass.
 *
 * The queries come straight from [[SparkEntry.queries]] (the driver's
 * correctness contract), so the code under test is exactly the oracle-
 * checked code. Families: sequential despike kernel, DSv2 instrument
 * reader, IIR dsp kernel, MinHash-LSH near-dup, linear classifier scoring
 * (weight reference objects), quantized ANN (codebooks), persisted
 * near-dup index land+probe, landed IVF probe, landed BM25 probe,
 * streaming foreachBatch replay, blocklist InSet gate.
 *
 * Prints one JSON line: {"metric":"cluster_smoke","all_match":bool,...}.
 * Run: sbt "runMain graft.ClusterSmoke [sfDir]"; ClusterModeSpec forks it.
 *
 * Launch with an ENUMERATED classpath (sbt runMain, or the spec's fork of
 * the test JVM's java.class.path). A `-cp dir:/opt/spark/jars/STAR`
 * wildcard launch passes the literal wildcard through to
 * spark.executor.extraClassPath, and the executor then holds the
 * distribution jars twice at different classloader positions — lambdas
 * deserialize against the wrong scala-library and every task dies with
 * "cannot assign instance of java.lang.invoke.SerializedLambda"
 * (measured; the same queries pass with the enumerated classpath).
 */
object ClusterSmoke {

  val Queries: Seq[String] = Seq(
    "q09_despike",
    "q16_cnv_read",
    "q22_lp_filter",
    "q25_near_dup_pairs",
    "q68_score_linear",
    "q71_ann_quantized",
    "q75_near_dedup_indexed",
    "q76_ann_ivf_indexed",
    "q99_bm25_indexed",
    "q143_stream_ingest_replay",
    "q174_blocklist_gate",
    // round-12 widening: TypedImperativeAggregate buffers (CMS,
    // Misra-Gries) serialize across the wire here; PageRank exercises the
    // iterative Snapshots.truncateLineage path; multimodal runs the JDK
    // codec kernels inside executor JVMs; DSIR ships its ratio model as a
    // codegen reference object
    "q111_cms_heavy_hitters",
    "q127_heavy_hitters",
    "q112_pagerank",
    "q34_multimodal",
    "q161_dsir_scores")

  /** Canonical row-set digest: every column stringified, rows sorted —
    * both passes collect() into THIS driver JVM, so string rendering is
    * identical and any difference is a value difference. */
  private def canon(df: DataFrame): (Long, String) = {
    // Map values render with unspecified entry order — sort entries so a
    // MapType column can never produce a spurious cross-pass mismatch.
    def render(v: Any): String = v match {
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => s"${render(k)}->${render(x)}" }.toSeq.sorted
          .mkString("{", ",", "}")
      case s: scala.collection.Seq[_] =>
        s.map(render).mkString("[", ",", "]")
      case a: Array[_] => a.map(render).mkString("[", ",", "]")
      case other => String.valueOf(other)
    }
    val rows = df.collect()
    val strs = rows.map { r =>
      (0 until r.length).map(i => render(r.get(i))).mkString("|")
    }.sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    strs.foreach(s => md.update((s + "\n").getBytes("UTF-8")))
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  private def runPass(master: String, tag: String, sfDir: String)
      : Map[String, Either[String, (Long, String)]] = {
    val builder = SparkSession.builder()
      .master(master)
      .appName(s"graft-cluster-smoke-$tag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // isolated catalogs: the landed-index queries use steady names; the
      // two passes must each land fresh instead of tripping over the
      // other's catalog
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_cluster_smoke/wh_$tag")
      // executor JVMs need the engine classes + spark jars: hand them the
      // driver's own classpath (local-cluster workers inherit SPARK_HOME
      // jars, but NOT target/scala-2.13/classes)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      // LocalSparkCluster marks its workers SPARK_TESTING, which sends the
      // executor launcher down the dev-build classpath probe ("Cannot find
      // any build directories"); pinning the scala version short-circuits
      // that probe and the distribution jars resolve normally
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
    val extraOpts = sys.props.getOrElse("graft.smoke.addOpens", "")
    val spark = (if (extraOpts.nonEmpty)
      builder.config("spark.executor.extraJavaOptions", extraOpts)
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = Queries.map { name =>
      name -> (try Right(canon(SparkEntry.queries(name)(spark, sfDir)))
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      })
    }.toMap
    out.collect { case (n, Left(err)) =>
      System.err.println(s"[cluster-smoke:$tag] $n FAILED: $err") }
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cluster = runPass("local-cluster[2,2,2048]", "cluster", sfDir)
    val local = runPass("local[4]", "local", sfDir)
    // full JSON string escape — exception messages carry newlines and
    // backslashes (multi-line AnalysisException), and the spec's
    // single-line metric contract must survive them
    def jq(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val per = Queries.map { q =>
      (cluster(q), local(q)) match {
        case (Right((cr, ch)), Right((lr, lh))) =>
          q -> (if (cr == lr && ch == lh) s"""{"match":true,"rows":$cr}"""
                else s"""{"match":false,"cluster_rows":$cr,"local_rows":$lr}""")
        case (Left(e), _) => q -> s"""{"match":false,"cluster_err":${jq(e)}}"""
        case (_, Left(e)) => q -> s"""{"match":false,"local_err":${jq(e)}}"""
      }
    }
    val allMatch = per.forall(_._2.startsWith("""{"match":true"""))
    println(s"""{"metric":"cluster_smoke","all_match":$allMatch,""" +
      s""""queries":{${per.map { case (q, j) => s""""$q":$j""" }.mkString(",")}}}""")
    if (!allMatch) sys.exit(1)
  }
}
