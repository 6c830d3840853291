package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — times the headline query set on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver. Each query is forced through the
  * `noop` sink: unlike `count()`, noop materializes every output column, so
  * Catalyst cannot prune the projections being measured.
  */
object Bench {

  /** Captures every ERROR-level log event the run emits, with full
    * stacks — the bench's own stderr record. The driver's stdout/stderr
    * capture keeps only a ~2 KB tail, which in round 6 truncated an
    * ERROR stack mid-frame and left it unadjudicable; persisting from
    * inside the process makes the complete record part of the bench
    * artifact (BENCH_STDERR.log + an error_log_count field in the JSON).
    */
  private final class ErrorCapture extends
      org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-bench-errors", null,
        org.apache.logging.log4j.core.layout.PatternLayout.newBuilder()
          .withPattern("%d{HH:mm:ss} %p %c{1}: %m%n%ex").build(),
        false, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
      events.add(new String(getLayout.asInstanceOf[
        org.apache.logging.log4j.core.layout.PatternLayout].toByteArray(e)))
  }

  private def installErrorCapture(): ErrorCapture = {
    import org.apache.logging.log4j.{Level, LogManager}
    val ctx = LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val app = new ErrorCapture
    app.start()
    ctx.getConfiguration.getRootLogger.addAppender(app, Level.ERROR, null)
    ctx.updateLoggers()
    app
  }

  def main(args: Array[String]): Unit = {
    val errorLog = installErrorCapture()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    // SPARK_GRAFT_BENCH_ONLY=q161_pretrain_pipeline,q89_copurchase_pairs —
    // restrict the run to a named subset for isolation work (rep-stability
    // hunts, A/B plan adjudication) without touching the headline list
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(s) => SparkEntry.headline.filter(s.contains)
      case None => SparkEntry.headline
    }
    // Warm-up pass over the whole headline set (SPARK_GRAFT_WARMUP=0 to
    // skip): whole-stage-codegen compilation, JIT, and file-listing caches
    // are per-JVM constants that at n=1 would otherwise account for ~half
    // of every measured time (0.4–1.0 s/query, measured via graft.Profile
    // rep-1 vs rep-3). The timed pass below then measures steady-state
    // query latency — the quantity that actually scales with data size.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      selected.foreach { name =>
        try queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        Checkpoints.release()
      }
    // Median of `reps` timed runs per query: single-shot times on a busy
    // host swing ±20% (measured across Bench invocations); the median is
    // the stable steady-state latency. All reps are also emitted per
    // query (`reps` field, run order) so a one-off host stall is
    // attributable from the JSON instead of reading as a plan regression
    // (round 2 burned a 3.3x phantom on exactly that).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val results = selected.map { name =>
      var err: Option[String] = None
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          err = Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120))
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // free the rep's tracked localCheckpoints (outside the timed
        // region): each rep builds from scratch, so leaving blocks
        // behind only contaminates later queries' timings
        Checkpoints.release()
        // also outside the timed region: force the driver GC so
        // ContextCleaner sweeps dead broadcasts/shuffles NOW instead of
        // lazily inside a later rep's measurement — the 47-query warm-up
        // pass leaves hundreds of dead broadcast refs whose deferred
        // cleanup otherwise lands on whichever early query is being
        // timed when the driver heap fills (observed: q07 reps growing
        // 0.75→3.2 s in a full run while flat at 0.6 s in isolation)
        if (sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "1") != "0") System.gc()
        elapsed
      }
      // per-query progress line, printed as results land — the summary
      // JSON is also printed last, but a tail-truncated capture still
      // keeps every per-query row this way
      err match {
        case Some(m) =>
          println(s"""{"bench_query":"$name","err":"$m"}""")
        case None =>
          println(f"""{"bench_query":"$name","median_sec":${times.sorted.apply(times.size / 2)}%.3f,"reps":${times.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
      }
      (name, times, err)
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) =>
      "\"" + k + f"\":${v.sorted.apply(v.size / 2)}%.3f"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + m + "\"" }.mkString("{", ",", "}")
    val total = ok.map { case (_, v, _) => v.sorted.apply(v.size / 2) }.sum
    val sf = sfDir.split("/").reverseIterator
      .collectFirst { case s if s.startsWith("sf") => s.drop(2) }.getOrElse("?")
    // summary LAST and without the per-rep arrays (those are on the
    // per-query lines above): a driver `tail` capture keeps the whole
    // record, and a failing query is a visible "errors" entry, never a
    // silently-meaningless elapsed time
    println(f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":$sf}""")
    // Persist the COMPLETE record (all per-query rep arrays + medians +
    // errors) to a repo-local file: the driver's stdout capture keeps only
    // a tail (round 5 lost 45/47 rep arrays that way), and rep-over-rep
    // stability is exactly what the per-rep arrays exist to witness.
    val full = results.map { case (k, v, e) =>
      val repsJson = v.map(t => f"$t%.3f").mkString("[", ",", "]")
      val median = f"${v.sorted.apply(v.size / 2)}%.3f"
      val errJson = e.map(m => "\"" + m + "\"").getOrElse("null")
      s"""  "$k": {"median_sec": $median, "reps": $repsJson, "err": $errJson}"""
    }.mkString("{\n", ",\n", "\n}")
    // ERROR-level log events captured across the whole run, with stacks:
    // BENCH_STDERR.log is the complete record (written even when empty,
    // so "zero errors" is a positive statement, not a missing file), and
    // the JSON carries the count so a nonzero run is visible at a glance.
    val errEvents = errorLog.events.toArray(Array.empty[String])
    // the one adjudicated-benign signature (SCALE.md round 7b): a late
    // task-completion event updating SQL-metric accumulators of a stage
    // whose checkpoint blocks were already released and GC'd — display
    // metrics for a discarded plan, results consumed before release
    val benign = errEvents.count(_.contains("non-existent accumulator"))
    val stderrPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STDERR", "BENCH_STDERR.log"))
    val stderrHeader =
      s"# graft.Bench ERROR-level log events: ${errEvents.length} " +
        s"(known-benign accumulator-after-release: $benign — adjudicated " +
        s"SCALE.md round 7b; unexplained: ${errEvents.length - benign})"
    java.nio.file.Files.write(stderrPath,
      (stderrHeader +: errEvents.toSeq).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    java.nio.file.Files.write(outPath, java.util.Arrays.asList(
      f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","sf":"$sf","reps_per_query":$reps,""",
      s""" "error_log_count":${errEvents.length},""",
      s""" "queries":""", full, "}"),
      java.nio.charset.StandardCharsets.UTF_8)
    spark.stop()
  }
}
