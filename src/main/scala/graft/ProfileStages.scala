package graft

import org.apache.spark.sql.functions._

/** Scratch stage-breakdown main (not part of the driver contract):
  * decomposes the expensive headline queries into their stages for
  * SCALE.md bench adjudication.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("stage-profile")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[stage] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val which = if (args.nonEmpty) args.toSet else Set("q102", "q139")
    if (which("q102")) {
      SparkEntry.queries("q102_curation_pipeline")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Checkpoints.release()
      for (_ <- 1 to 3) {
        time("q102 clean_stage_only")(
          graft.queries.CurationQueries.q102CleanStage(spark, dir).count())
        Checkpoints.release()
        time("q102 full")(
          SparkEntry.queries("q102_curation_pipeline")(spark, dir)
            .write.format("noop").mode("overwrite").save())
        Checkpoints.release()
      }
    }
    if (which("q161")) {
      import graft.operators.Curation
      import org.apache.spark.sql.functions._
      SparkEntry.queries("q161_pretrain_pipeline")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Checkpoints.release()
      for (_ <- 1 to 3) {
        val d = Engine.table(spark, dir, "documents")
        var passed: org.apache.spark.sql.DataFrame = null
        time("q161 gate (count)") {
          passed = Checkpoints.cp(
            d.where(Curation.gopherRules(col("text")).getField("pass")))
          passed.count()
        }
        var cleaned: org.apache.spark.sql.DataFrame = null
        time("q161 boilerplate (count)") {
          cleaned = Curation.removeBoilerplate(passed, col("text"),
              col("doc_id"), w = 8, minDocs = 3)
            .where(col("n_kept") > 0)
            .join(passed.select(col("doc_id"), col("lang"), col("n_chars")),
              Seq("doc_id"))
          println(s"[stage]   cleaned=${cleaned.count()}")
        }
        time("q161 full") {
          SparkEntry.queries("q161_pretrain_pipeline")(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        Checkpoints.release()
      }
    }
    if (which("q331")) {
      import org.apache.spark.sql.streaming.Trigger
      SparkEntry.queries("q331_stream_shard_sink")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Checkpoints.release()
      for (_ <- 1 to 3) {
        val d = Engine.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        var root: String = null
        try {
        time("q331 land x2") {
          val dv = new java.io.File(
            java.nio.file.Files.createTempDirectory("q331prof").toString)
          root = dv.toString
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(root, "drop"))
          def land(df: org.apache.spark.sql.DataFrame, name: String,
                   mtime: Long): Unit = {
            val tmp = s"$root/$name.stage"
            df.coalesce(1).write.parquet(tmp)
            val part = new java.io.File(tmp).listFiles()
              .filter(_.getName.endsWith(".parquet")).head.toPath
            val dst = java.nio.file.Paths.get(root, "drop", s"$name.parquet")
            java.nio.file.Files.move(part, dst)
            java.nio.file.Files.setLastModifiedTime(dst,
              java.nio.file.attribute.FileTime.fromMillis(mtime))
          }
          land(d.filter(col("doc_id") % 2 === 0), "a", 1000000000000L)
          land(d.filter(col("doc_id") % 2 === 1), "b", 1000000060000L)
        }
        val out = s"$root/out"; val chk = s"$root/chk"
        def drain(): Unit = {
          val stream = spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$root/drop")
          graft.streaming.ShardSink.shardStream(stream, out, chk,
            binWidth = 128L, trigger = Some(Trigger.AvailableNow()))
            .awaitTermination()
        }
        time("q331 drain 1")(drain())
        time("q331 drain 2 (replay)")(drain())
        time("q331 full (readback = full - land - drains)") {
          SparkEntry.queries("q331_stream_shard_sink")(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        Checkpoints.release()
        } finally {
          // the per-iteration q331prof scratch tree (landed parquet +
          // out/ + chk/) is profile debris — delete it or three
          // iterations leak three corpus-sized temp dirs per run
          if (root != null) {
            import scala.jdk.CollectionConverters._
            val p = java.nio.file.Paths.get(root)
            if (java.nio.file.Files.exists(p))
              java.nio.file.Files.walk(p).sorted(
                  java.util.Comparator.reverseOrder[java.nio.file.Path]())
                .iterator().asScala.foreach(java.nio.file.Files.delete)
          }
        }
      }
    }
    if (which("q184")) {
      // how much of q184 is the string-extremum winner agg (VERDICT r18
      // item 2 "measure first")? Reconstruct the query's url/rules
      // surface verbatim, time everything up to `matched` (canonicalize
      // + parse + checkpointed rules + the broadcast join + rule
      // matching) vs the registered query (adds the max(struct) winner
      // pick + allowed-filter + frontier count).
      import graft.operators.Robots
      SparkEntry.queries("q184_crawl_frontier")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Checkpoints.release()
      for (_ <- 1 to 3) {
        val id = col("doc_id")
        val hn = (id % 12).as("host")
        val hostStr = concat(lit("h"), (id % 12).cast("string"),
          lit(".example.com"))
        val hostMessy = when(id % 2 === 0,
          concat(lit("H"), (id % 12).cast("string"), lit(".Example.COM")))
          .otherwise(hostStr)
        val path = element_at(array(lit("/private/ok/x"), lit("/private/x"),
          lit("/tmp3/a"), lit("/public/p"), lit("/bot0/z"),
          lit("/bot0/pub/q"), lit("/")), (id % 7 + 1).cast("int"))
        val qparams = element_at(array(
          concat(lit("id="), (id % 50).cast("string"), lit("&utm_source=m")),
          concat(lit("utm_campaign=x&id="), (id % 50).cast("string")),
          concat(lit("id="), (id % 50).cast("string"), lit("&fbclid=f"),
            id.cast("string")),
          concat(lit("gclid=g"), id.cast("string"), lit("&id="),
            (id % 50).cast("string"))), (id % 4 + 1).cast("int"))
        val frag = when(id % 5 === 0, lit("#top")).otherwise(lit(""))
        val canonical = graft.functions.canonical_url(
          concat(lit("https://"), hostMessy, path, lit("?"), qparams, frag))
        val docs = Engine.table(spark, dir, "documents")
          .select(id, hn, path.as("path"), canonical.as("canonical_url"))
        val h = col("host")
        val body = concat(
          lit("# corpus robots\nUser-agent: * # catch-all\n"),
          lit("Disallow: /private\n"),
          when(h % 2 === 0, lit("Allow: /private/ok\n")).otherwise(lit("")),
          lit("Disallow: /tmp"), (h % 5).cast("string"), lit("\n"),
          lit("Crawl-delay: 5\n\n"),
          when(h % 3 === 0, concat(
            lit("User-agent: helper\nUser-agent: graftbot\n"),
            lit("Disallow: /bot"), (h % 4).cast("string"), lit("\n"),
            lit("Allow: /bot"), (h % 4).cast("string"), lit("/pub\n")))
            .otherwise(lit("")),
          lit("Disallow:\n"))
        val bodies = docs.select(h).distinct().select(h, body.as("body"))
        time("q184 up-to-matched (no winner agg)") {
          // evaluate() minus its final groupBy: same join + hit + pri
          // projection, materialized through noop
          val rules = Robots.parseRules(bodies)
          val token = "graftbot"
          import org.apache.spark.sql.expressions.Window
          val hasSpecific = max((lower(col("agent")) === token).cast("int"))
            .over(Window.partitionBy("host")) === 1
          val chosen = rules.withColumn("has_specific", hasSpecific)
            .filter(when(col("has_specific"), lower(col("agent")) === token)
              .otherwise(col("agent") === "*"))
            .select(col("host"), col("rule_type"), col("rule_path"))
          val chosenM = Checkpoints.cp(chosen)
          val isPlain = !col("rule_path").contains("*") &&
            !col("rule_path").endsWith("$")
          val matched = docs.join(broadcast(chosenM), Seq("host"), "left")
            .withColumn("hit", col("rule_path").isNotNull &&
              when(isPlain, col("path").startsWith(col("rule_path")))
                .otherwise(regexp_like(col("path"),
                  Robots.rulePattern(col("rule_path")))))
            .withColumn("pri_len",
              when(col("hit"), length(col("rule_path"))).otherwise(lit(-1)))
          matched.write.format("noop").mode("overwrite").save()
        }
        Checkpoints.release()
        time("q184 full") {
          SparkEntry.queries("q184_crawl_frontier")(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        Checkpoints.release()
      }
    }
    if (which("q139")) {
      SparkEntry.queries("q139_cc_star_contraction")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Checkpoints.release()
      for (_ <- 1 to 3) {
        val d = Engine.fanOut(Engine.table(spark, dir, "documents"))
        var pairs: org.apache.spark.sql.DataFrame = null
        time("q139 lsh_pairs (cp)") {
          pairs = Checkpoints.cp(graft.operators.Dedup.minHashLshPairs(
            d, col("text"), col("doc_id"), k = 16, bands = 4, w = 3))
          println(s"[stage]   n_pairs=${pairs.count()}")
        }
        time("q139 cc_loop") {
          graft.operators.Dedup.dupClustersAlternating(pairs)
            .write.format("noop").mode("overwrite").save()
        }
        Checkpoints.release()
      }
    }
    spark.stop()
  }
}
