package graft.streaming

import graft.Checkpoints.TrackedCheckpointOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The streaming TRAINING-SHARD SINK on the engine's OWN parquet
  * writer — the write path a 100 TB pipeline runs all day, with zero
  * foreign code between the curated rows and the bytes on disk.
  *
  * Every micro-batch lands one shard file per RANGE BIN
  * (`doc_id / binWidth` — fixed-width bins, so the layout needs no
  * global max and each file covers one contiguous id range; footer
  * Statistics are TIGHT and a stats-driven scan can prune whole
  * shards, q266's lesson applied to the sink itself). The file is
  * built entirely inside the bin's `flatMapGroups` task by
  * [[graft.sources.ParquetWrite.writeFile]]: the q310 corpus schema
  * (REQUIRED INT64 doc_id, REQUIRED UTF8 text, OPTIONAL dictionary-
  * encoded lang, OPTIONAL INT64 score) plus a `toks` LIST<INT64>
  * column in the standard 3-level layout the engine's own reader
  * walks (q255) — per-token ids from the engine's hash60 tokenizer
  * hash, the dataloader-ready form.
  *
  * Exactly-once discipline (the q203/q209 house law): every artifact
  * of batch N lives under a `batch=N` path and is written tmp +
  * ATOMIC_MOVE, so a crashed-and-replayed micro-batch — or a
  * speculatively re-run task — rewrites the SAME paths with the SAME
  * deterministic bytes; replay adds zero shards. The per-batch
  * MANIFEST (bin, n_docs, n_tokens, min_id, max_id, file_bytes — its
  * own small own-written parquet) is the commit record: a reader
  * that plans from manifests alone never sees a half-landed batch,
  * because the manifest lands only after every shard of the batch
  * has.
  *
  * Scale notes: per-bin work is a linear walk over the bin's rows —
  * no driver state, no collect; the manifest fold sees one row per
  * bin (KB-scale metadata). On an object store, swap the
  * `java.nio` lands for the Hadoop FileSystem create-then-rename
  * pair; the layout and the replay law are unchanged.
  */
object ShardSink {

  /** GPT-2-ish vocab modulus for the hash-tokenizer ids. */
  val VocabSize = 50257L

  /** Top 60 bits of md5("tok:" + token) mod [[VocabSize]] — the JVM
    * twin of `graft.functions.hash60(lit("tok"), col)` applied
    * per-token inside the writer task.
    */
  def tokenId(tok: String): Long =
    // first 15 hex chars of md5 = top 60 bits = BE64(digest[0..7]) >>> 4
    // (Md5Hashes' pinned identity) — computed arithmetically on a
    // thread-local digest instead of per-token getInstance + per-byte
    // "%02x" format + base-16 reparse; same value, ~10x less per-token
    // work in the shard writer's hot loop (ShardSinkSpec pins equality
    // with the hex-parse spelling)
    graft.expressions.Md5Hashes.hash60Bytes(
      ("tok:" + tok).getBytes("UTF-8")) % VocabSize

  /** One shard file's bytes: rows (doc_id, text, lang, n_chars)
    * sorted by doc_id, q310 corpus schema + the toks LIST column.
    * Null-injection rules ride doc_id (%7 lang, %11==3 score) so the
    * same ids always produce the same bytes — the replay law's
    * determinism leg. score = n_chars (the curation metric a real
    * sink carries through).
    */
  def shardFileBytes(docs: Array[(Long, String, String, Long)])
      : Array[Byte] = {
    require(docs.nonEmpty, "empty shard")
    val sorted = docs.sortBy(_._1)
    val n = sorted.length
    val W = graft.sources.ParquetWrite
    def utf8(s: String) = s.getBytes("UTF-8")
    val ids = sorted.map(_._1)
    val txts = sorted.map(r => utf8(r._2))
    val langDefs = sorted.map(r => if (r._1 % 7 == 0) 0 else 1)
    val langs = sorted.withFilter(_._1 % 7 != 0).map(r => utf8(r._3))
    val scoreDefs = sorted.map(r => if (r._1 % 11 == 3) 0 else 1)
    val scores = sorted.withFilter(_._1 % 11 != 3).map(_._4)
    // toks: split matches Spark's split(text, " ") limit -1 (trailing
    // empties kept) and DuckDB's string_split — always >= 1 element,
    // so every list is present and non-empty (defs all maxDef = 2)
    val tokLists = sorted.map(r => r._2.split(" ", -1).map(tokenId))
    val nSlots = tokLists.iterator.map(_.length).sum
    val tokDefs = Array.fill(nSlots)(2)
    val tokReps = new Array[Int](nSlots)
    val tokVals = new Array[Long](nSlots)
    var at = 0
    tokLists.foreach { ts =>
      var j = 0
      while (j < ts.length) {
        tokReps(at) = if (j == 0) 0 else 1
        tokVals(at) = ts(j)
        at += 1; j += 1
      }
    }
    val fields = Seq(
      W.Leaf("doc_id", 0, 2),
      W.Leaf("text", 0, 6, convertedType = 0),
      W.Leaf("lang", 1, 6, convertedType = 0),
      W.Leaf("score", 1, 2),
      W.Group("toks", 1, Seq(
        W.Group("list", 2, Seq(W.Leaf("element", 0, 2)))),
        convertedType = 3)) // LIST
    W.writeFile(fields, Seq(
      W.LeafData(Array.fill(n)(0), null, longs = ids),
      W.LeafData(Array.fill(n)(0), null, bins = txts),
      W.LeafData(langDefs, null, bins = langs, dict = true),
      W.LeafData(scoreDefs, null, longs = scores),
      W.LeafData(tokDefs, tokReps, longs = tokVals)),
      withStats = true)
  }

  /** Land `bytes` at `dir/name` atomically (tmp + ATOMIC_MOVE): a
    * replayed batch or re-run task overwrites the same path; a
    * concurrent reader never sees a torn file.
    */
  private def landAtomic(dir: String, name: String,
                         bytes: Array[Byte]): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val tmp = d.resolve(s".$name.${java.util.UUID.randomUUID}.tmp")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, d.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** One micro-batch of [[shardStream]] — public so the replay law is
    * directly testable: calling it twice with the SAME batchId must
    * leave the shard set byte-identical (the second call is exactly
    * what a crash-and-replay executes). Expects columns
    * (doc_id, text, lang, n_chars).
    */
  def shardBatch(batch: DataFrame, batchId: Long, outPath: String,
                 binWidth: Long): Unit = {
    require(binWidth >= 1, s"binWidth $binWidth")
    val spark = batch.sparkSession
    import spark.implicits._
    val shardDir = s"$outPath/shards/batch=$batchId"
    val stats = batch
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .groupByKey(_._1 / binWidth)
      .flatMapGroups { (bin, it) =>
        val docs = it.toArray
        val bytes = shardFileBytes(docs)
        landAtomic(shardDir, s"bin=$bin.parquet", bytes)
        // split(" ", -1).length == #spaces + 1; count characters instead
        // of re-splitting the text a second time (shardFileBytes already
        // tokenized it once for the toks column)
        val nTok = docs.iterator.map { d =>
          val t = d._2
          var c = 1L; var i = 0
          while (i < t.length) { if (t.charAt(i) == ' ') c += 1; i += 1 }
          c
        }.sum
        val ids = docs.map(_._1)
        Iterator.single((bin, docs.length.toLong, nTok,
          ids.min, ids.max, bytes.length.toLong))
      }
    // manifest fold: one row per bin (bounded metadata), one task —
    // lands ONLY after every shard task of this batch has finished
    // (it consumes their output), so the manifest IS the batch commit
    val committed = stats.groupByKey(_ => 0L).mapGroups { (_, it) =>
      val entries = it.toArray.sortBy(_._1)
      val bytes = graft.sources.ParquetWrite.writeInt64(
        Seq("bin", "n_docs", "n_tokens", "min_id", "max_id",
          "file_bytes"),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          entries.map(e => Array(e._1, e._2, e._3, e._4, e._5, e._6))),
        withStats = true)
      landAtomic(s"$outPath/manifest", s"batch=$batchId.parquet", bytes)
      entries.length.toLong
    }
    committed.count() // the one action driving both stages
    ()
  }

  /** Decode one own-written shard back to its (doc_id, text, lang,
    * score) rows through the engine's own reader — null lang/score
    * slots come back as placeholders, which is lossless here because
    * [[shardFileBytes]] re-nulls exactly those rows (the %7/%11 laws
    * ride doc_id). None on any malformed byte.
    */
  def decodeShard(bytes: Array[Byte])
      : Option[Array[(Long, String, String, Long)]] = {
    val P = graft.sources.Parquet
    P.parseFooter(bytes).flatMap { fm =>
      if (fm.rowGroups.length != 1) None
      else {
        val cs = fm.rowGroups.head.cols
        def cells(p: String) =
          fm.leafLevels.get(p).flatMap { case (dl, rl) =>
            cs.find(_.path == p)
              .flatMap(c => P.readChunkCells(bytes, c, dl, rl))
          }
        for {
          ic <- cells("doc_id")
          tc <- cells("text")
          lc <- cells("lang")
          sc <- cells("score")
          if tc.bins.length == ic.longs.length &&
            lc.defs.length == ic.longs.length &&
            sc.defs.length == ic.longs.length
        } yield {
          val n = ic.longs.length
          var lp = 0
          var sp = 0
          Array.tabulate(n) { i =>
            val lang =
              if (lc.defs(i) == 1) {
                val v = new String(lc.bins(lp),
                  java.nio.charset.StandardCharsets.UTF_8)
                lp += 1; v
              } else ""
            val score =
              if (sc.defs(i) == 1) { val v = sc.longs(sp); sp += 1; v }
              else 0L
            (ic.longs(i),
              new String(tc.bins(i),
                java.nio.charset.StandardCharsets.UTF_8),
              lang, score)
          }
        }
      }
    }
  }

  /** The COMPACTION maintenance pass — the answer to the small-files
    * problem every micro-batched sink manufactures (N batches × M
    * bins files; a 100 TB table's listing alone becomes the
    * bottleneck). Per bin, in the bin's own task: decode every batch
    * shard through [[decodeShard]], merge last-batch-wins by doc_id,
    * rewrite ONE compacted shard with the SAME writer (so the
    * stats-pruning story is unchanged), land it atomically under
    * `shards/compacted=<cid>/`, and commit a compaction manifest
    * after every bin has landed. Deterministic: same inputs, same
    * bytes — re-running the pass (a crashed maintenance job) rewrites
    * identical files. Returns per-bin (bin, n_inputs, n_docs, md5).
    */
  def compactBatches(spark: org.apache.spark.sql.SparkSession,
                     outPath: String, cid: Long): DataFrame = {
    import spark.implicits._
    val perBin = spark.read.format("binaryFile")
      .load(outPath + "/shards/batch=*/bin=*.parquet")
      .select(regexp_extract(col("path"), "bin=(\\d+)", 1)
        .cast("long").as("bin"),
        regexp_extract(col("path"), "batch=(\\d+)", 1)
          .cast("long").as("batch"), col("content"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (bin, it) =>
        val files = it.toSeq.sortBy(_._2)
        val merged = scala.collection.mutable.LinkedHashMap
          .empty[Long, (Long, String, String, Long)]
        var ok = true
        files.foreach { case (_, _, bytes) =>
          decodeShard(bytes) match {
            case Some(docs) => docs.foreach(d => merged(d._1) = d)
            case None => ok = false
          }
        }
        if (!ok) (bin, -1L, -1L, "")
        else {
          val bytes = shardFileBytes(merged.values.toArray)
          landAtomic(s"$outPath/shards/compacted=$cid",
            s"bin=$bin.parquet", bytes)
          val md5 = graft.expressions.Md5Hashes.md5Hex(bytes)
          (bin, files.length.toLong, merged.size.toLong, md5)
        }
      }
      .toDF("bin", "n_inputs", "n_docs", "shard_md5")
      // the mapGroups above embeds the landAtomic WRITES: checkpoint
      // eagerly so the pass executes exactly once per invocation — a
      // later action must replay the materialized rows, never the
      // write pass (a batch landing between manifest commit and a
      // re-evaluation could otherwise diverge from the manifest)
      .trackedCheckpoint()
    // compaction manifest: lands only after every bin has (it folds
    // the per-bin rows) — the commit record, as in shardBatch
    val committed = perBin
      .as[(Long, Long, Long, String)]
      .groupByKey(_ => 0L).mapGroups { (_, it) =>
        val entries = it.toArray.sortBy(_._1)
        if (entries.exists(_._2 < 0)) -1L
        else {
          val bytes = graft.sources.ParquetWrite.writeInt64(
            Seq("bin", "n_inputs", "n_docs"),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              entries.map(e => Array(e._1, e._2, e._3))),
            withStats = true)
          landAtomic(s"$outPath/manifest", s"compacted=$cid.parquet",
            bytes)
          entries.length.toLong
        }
      }
    committed.count()
    perBin
  }

  /** The streaming sink: curated docs in, own-written range-binned
    * shard files + per-batch manifests out.
    */
  def shardStream(docs: DataFrame, outPath: String, checkpoint: String,
                  binWidth: Long,
                  trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        shardBatch(batch, batchId, outPath, binWidth)
      }
    trigger.fold(writer)(writer.trigger).start()
  }
}
