package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Constrained-heap full-contract sweep (VERDICT r12 task #7): every green
 * record to date ran with `-Xmx48g` on a 128 GiB box, where a hidden
 * driver-side materialization — an accidental `collect()` of an
 * intermediate, a plan that funnels a shuffle through the driver — would
 * be invisible. This main runs the ENTIRE [[SparkEntry.queries]] contract
 * under a deliberately small driver heap (launch with `-Xmx4g`) and
 * `local-cluster[2,2,1024]` executors (separate 1 GiB JVMs), and digests
 * every result WITHOUT collecting it:
 *
 *   - per query: row count + an order-insensitive multiset digest computed
 *     executor-side (each row rendered to one string, `xxhash64`ed, then
 *     combined with the commutative pair `sum` mod 2^64 + `bit_xor` —
 *     only 24 bytes ever reach the driver per query);
 *   - optional third arg: a baseline JSON produced by a previous run of
 *     THIS main (typically unconstrained `local[32]`); rows/digests are
 *     compared query-for-query and any drift fails the sweep.
 *
 * A query that secretly materializes on the driver dies here with a heap
 * error naming it in the output JSON (`err`), instead of hiding inside a
 * 48 GiB allowance. Exit code is non-zero if any query errors or drifts
 * from the baseline, so the wrapper script is self-gating.
 *
 * Launch notes (same hazards as [[ClusterSmoke]]): enumerated classpath
 * only — a literal jar-dir wildcard reaches
 * `spark.executor.extraClassPath` and executors deserialize lambdas
 * against the wrong scala-library; executors get the driver's
 * `--add-opens` set via `graft.smoke.addOpens`; `java.io.tmpdir` should
 * point at a per-run directory so the landed-index warehouse and
 * `graft_bucketed` paths cannot collide with another pass.
 *
 * Usage: ConstrainedSweep <sfDir> <outJson> [baselineJson]
 * Env: SPARK_GRAFT_MASTER (default local-cluster[2,2,1024]),
 *      SPARK_GRAFT_SHUFFLE (default 16).
 */
object ConstrainedSweep {

  /** Order-insensitive digest, computed entirely executor-side: rows →
    * canonical strings → xxhash64 → (count, wrapped sum, xor). Arrays and
    * maps are rendered via `to_json` (deterministic element order for
    * arrays; map-typed columns are sorted entry-wise by sort_array over
    * map_entries before rendering so the digest cannot depend on hash-map
    * iteration order). */
  def digest(df: DataFrame): (Long, Long, Long) = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val rendered = f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          to_json(sort_array(map_entries(c)))
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType => to_json(c)
        case _ => c.cast("string")
      }
      coalesce(rendered, lit("NULL"))
    }
    // Separator is U+0002 (written as an escape on purpose — a raw
    // control byte here renders invisibly and a reformat could silently
    // turn it into "" and reintroduce boundary-shift digest collisions):
    // a char that cannot appear in rendered values, so adjacent columns
    // cannot alias across the boundary.
    val h = xxhash64(concat_ws("\u0002", cols.toIndexedSeq: _*))
    val r = df.select(h.as("h"))
      .agg(count(lit(1)).as("n"),
        // sum(long) would widen to overflow-checked; wrap explicitly by
        // summing as unsigned-ish decimal then taking the low 64 bits
        sum(col("h").cast("decimal(38,0)")).as("s"),
        expr("bit_xor(h)").as("x"))
      .head()
    val s = Option(r.getDecimal(1)).map(_.toBigInteger
      .mod(java.math.BigInteger.ONE.shiftLeft(64)).longValue).getOrElse(0L)
    (r.getLong(0), s, if (r.isNullAt(2)) 0L else r.getLong(2))
  }

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ConstrainedSweep <sfDir> <outJson> [baselineJson]")
    val sfDir = args(0); val outJson = args(1)
    val baseline: Map[String, (Long, Long, Long)] = args.drop(2).headOption
      .map { p =>
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
        // minimal parse of this main's own output:
        // "name":{"rows":N,"sum":S,"xor":X,"secs":...} — the trailing
        // ,"secs" is part of the pattern on purpose: error rows emit
        // rows:-1/sum:0/xor:0 WITHOUT it, and must not be ingested as
        // baseline digests
        // no leading-'q' anchor: a differently named future query must
        // not silently escape the drift + baseline_missing gates
        val re = ("\"([^\"]+)\":\\{\"rows\":(-?\\d+),\"sum\":(-?\\d+)," +
          "\"xor\":(-?\\d+),\"secs\"").r
        re.findAllMatchIn(txt).map(m =>
          m.group(1) -> ((m.group(2).toLong, m.group(3).toLong,
            m.group(4).toLong))).toMap
      }.getOrElse(Map.empty)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      "local-cluster[2,2,1024]")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16")
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft-constrained-sweep")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_sweep_wh")
    val clustered = master.startsWith("local-cluster")
    val b2 = if (clustered) {
      val withCp = builder
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      val opts = sys.props.getOrElse("graft.smoke.addOpens", "")
      if (opts.nonEmpty) withCp.config("spark.executor.extraJavaOptions",
        // executor heap must stay at the worker's grant; only pass opens
        opts) else withCp
    } else builder
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val res = try {
          val (n, s, x) = digest(fn(spark, sfDir))
          Right((n, s, x))
        } catch { case e: Throwable =>
          Left(s"${e.getClass.getName}: " +
            String.valueOf(e.getMessage).take(300))
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val drift = res match {
          case Right(got) => baseline.get(name) match {
            case Some(want) if want != got =>
              Some(s"baseline=${want} got=${got}")
            case _ => None
          }
          case _ => None
        }
        res match {
          case Right((n, _, _)) =>
            System.err.println(f"[sweep] $name%-34s rows=$n%-8d " +
              f"${secs}%6.2fs${drift.map(d => s"  DRIFT $d").getOrElse("")}")
          case Left(e) =>
            System.err.println(f"[sweep] $name%-34s FAILED $e")
        }
        (name, res, secs, drift)
    }
    spark.stop()

    val perQuery = results.map { case (name, res, secs, drift) =>
      val body = res match {
        case Right((n, s, x)) =>
          // Locale.ROOT: the f-interpolator is locale-sensitive and a
          // comma-decimal locale would emit invalid JSON
          s""""rows":$n,"sum":$s,"xor":$x,"secs":${
            String.format(java.util.Locale.ROOT, "%.3f",
              Double.box(secs))}""" +
            drift.map(d => s""","drift":${jq(d)}""").getOrElse("")
        case Left(e) => s""""rows":-1,"sum":0,"xor":0,"err":${jq(e)}"""
      }
      s"""${jq(name)}:{$body}"""
    }
    val nErr = results.count(_._2.isLeft)
    val nDrift = results.count(_._4.isDefined)
    val missing = baseline.keySet -- results.map(_._1).toSet
    val json =
      s"""{"metric":"constrained_sweep","master":${jq(master)},""" +
      s""""driver_xmx_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)},""" +
      s""""queries_run":${results.size},"errors":$nErr,"drift":$nDrift,""" +
      s""""baseline_missing":${missing.size},""" +
      s""""per_query":{${perQuery.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json.take(400))
    if (nErr > 0 || nDrift > 0 || missing.nonEmpty) sys.exit(1)
  }
}
