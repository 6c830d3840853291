package graft

import graft.sources.{DeltaWrite, Parquet}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Delta OPTIMIZE write path (q339): log replay to the live
  * set, bin-packed compaction through the own parquet writer, the
  * dataChange=false commit discipline, and the fixed-point /
  * preservation laws.
  */
class DeltaMaintSpec extends AnyFunSuite {

  private val ids = (0L until 90L).toSeq

  test("optimize: live set collapses, rows preserved and sorted, " +
    "commit is dataChange=false only, second optimize is stable") {
    val files = DeltaWrite.writeTable("t-1", ids)
    val (livePre, maxV) = DeltaWrite.replayLive(files)
      .getOrElse(fail("replay"))
    assert(livePre == Seq("part-A.parquet", "part-C.parquet") &&
      maxV == 1L)
    val res = DeltaWrite.optimize(files).getOrElse(fail("optimize"))
    assert(res.commitName == "_delta_log/00000000000000000002.json")
    assert(res.removed == livePre)
    val after = files + (res.commitName -> res.commit) +
      (res.compactedName -> res.compacted)
    val (livePost, _) = DeltaWrite.replayLive(after)
      .getOrElse(fail("post replay"))
    assert(livePost == Seq(res.compactedName))
    // rows: exactly the live (B-removed) set, sorted by rec_id
    val want = ids.filter(d => (d / 6) % 3 != 1)
    val rs = Parquet.columnLongs(res.compacted, "rec_id")
      .getOrElse(fail("rec_id")).toSeq
    val vs = Parquet.columnLongs(res.compacted, "val")
      .getOrElse(fail("val")).toSeq
    assert(rs == want.sorted)
    assert(vs == want.sorted.map(d => (d * 11) % 1000))
    // every action in the optimize commit carries dataChange: false
    val lines = new String(res.commit, "UTF-8").split("\n")
      .filter(_.nonEmpty)
    assert(lines.length == 3)
    assert(lines.forall(_.contains("\"dataChange\": false")))
    // a second optimize compacts the single file to the same rows
    val res2 = DeltaWrite.optimize(after).getOrElse(fail("opt2"))
    assert(res2.rows == res.rows)
    assert(java.util.Arrays.equals(
      Parquet.columnLongs(res2.compacted, "rec_id").get,
      Parquet.columnLongs(res.compacted, "rec_id").get))
  }

  test("optimize: malformed tables close as None") {
    val files = DeltaWrite.writeTable("t-2", ids)
    // a live data file missing from the bundle
    assert(DeltaWrite.optimize(files - "part-A.parquet").isEmpty)
    // a corrupt commit line
    val bad = files + ("_delta_log/00000000000000000001.json" ->
      "{nope\n".getBytes("UTF-8"))
    assert(DeltaWrite.optimize(bad).isEmpty)
    // no log at all
    assert(DeltaWrite.optimize(files.filterNot(
      _._1.startsWith("_delta_log/"))).isEmpty)
    // a table whose replay leaves nothing live cannot be compacted
    val allGone = files + ("_delta_log/00000000000000000002.json" ->
      (DeltaWrite.removeActionDc("part-A.parquet", dataChange = true) +
        "\n" +
        DeltaWrite.removeActionDc("part-C.parquet", dataChange = true) +
        "\n").getBytes("UTF-8"))
    assert(DeltaWrite.optimize(allGone).isEmpty)
  }

  test("mergeCdf: touched-only rewrite, cdc file carries the exact " +
    "change rows, fold over pre-state lands on post-state") {
    val files = DeltaWrite.writeCdfTable("t-3", ids)
    // CDF flag present at v0
    assert(new String(
      files("_delta_log/00000000000000000000.json"), "UTF-8")
      .contains("\"delta.enableChangeDataFeed\": \"true\""))
    // updates hit ONLY part 0 rows, so parts 1/2 stay untouched
    val updKeys = ids.filter(d => (d / 6) % 3 == 0 && (d / 6) % 2 == 0)
    val updates = updKeys.map(d => (d, d + 5000L)).toMap
    val inserts = Seq((900001L, 7L), (900002L, 8L))
    val res = DeltaWrite
      .mergeCdf(files, updates, Set.empty, inserts)
      .getOrElse(fail("merge"))
    assert(res.nTouched == 1L && res.removed == Seq("part-0.parquet"))
    assert(res.files.keySet.exists(_.startsWith("_change_data/")))
    // untouched parts are NOT rewritten
    assert(!res.files.contains("part-1.parquet") &&
      !res.files.contains("part-2.parquet"))
    val after = files ++ res.files + (res.commitName -> res.commit)
    // cdc decode: 2 rows per update + 1 per insert
    val cdc = res.files(res.cdcName)
    val ct = Parquet.columnStrings(cdc, "_change_type")
      .getOrElse(fail("ct")).toSeq
    assert(ct.count(_ == "update_preimage") == updKeys.length)
    assert(ct.count(_ == "update_postimage") == updKeys.length)
    assert(ct.count(_ == "insert") == 2)
    // fold law: pre + feed == post
    def state(fs: Map[String, Array[Byte]]): Map[Long, Long] = {
      val (live, _) = DeltaWrite.replayLive(fs).getOrElse(fail("rl"))
      live.flatMap { p =>
        val rs = Parquet.columnLongs(fs(p), "rec_id").get
        val vs = Parquet.columnLongs(fs(p), "val").get
        rs.zip(vs)
      }.toMap
    }
    val post = state(after)
    val want = ids.map(d =>
      (d, updates.getOrElse(d, (d * 11) % 1000))).toMap ++ inserts
    assert(post == want)
    // the cdc file itself is never in the live set
    assert(!DeltaWrite.replayLive(after).get._1
      .exists(_.startsWith("_change_data/")))
  }

  test("mergeCdf: precondition violations close as None") {
    val files = DeltaWrite.writeCdfTable("t-4", ids)
    // update key absent from the base
    assert(DeltaWrite
      .mergeCdf(files, Map(777777L -> 1L), Set.empty, Nil).isEmpty)
    // delete key absent
    assert(DeltaWrite
      .mergeCdf(files, Map.empty, Set(777777L), Nil).isEmpty)
    // insert key already present
    assert(DeltaWrite
      .mergeCdf(files, Map.empty, Set.empty, Seq((ids.head, 1L)))
      .isEmpty)
    // update and delete overlap
    assert(DeltaWrite.mergeCdf(files, Map(ids.head -> 1L),
      Set(ids.head), Nil).isEmpty)
    // a live data file missing from the bundle
    assert(DeltaWrite.mergeCdf(files - "part-0.parquet",
      Map(ids.head -> 1L), Set.empty, Nil).isEmpty)
  }

  test("writeColMapTable: physical-name files (logical reads find " +
    "nothing), derived names, metaData-only rename commit") {
    val files = DeltaWrite.writeColMapTable("t-5", ids)
    val p0 = files("part-0.parquet")
    assert(Parquet.columnLongs(p0, "rec_id").isEmpty &&
      Parquet.columnLongs(p0, "record_id").isEmpty)
    val ph0 = DeltaWrite.physName("t-5", 0)
    assert(ph0 != DeltaWrite.physName("t-6", 0)) // table-keyed
    val rs = Parquet.columnLongs(p0, ph0).getOrElse(fail("phys read"))
    assert(rs.toSeq == ids.filter(d => (d / 6) % 3 == 0))
    // v1 = rename only: a single metaData line, schema renamed
    val c1 = new String(
      files("_delta_log/00000000000000000001.json"), "UTF-8")
    assert(c1.trim.split("\n").length == 1 &&
      c1.contains("\"metaData\"") && c1.contains("record_id") &&
      !c1.contains("\"add\"") && !c1.contains("\"remove\""))
    // physical names survive the rename (zero-rewrite contract)
    assert(c1.contains(ph0))
  }

  test("v2 checkpoints (q370): manifest + sidecars resolve the " +
    "vacuumed state, the JSON tail replays on top, and a " +
    "classic-only reader fails CLOSED on the feature gate") {
    val ids = (0L until 64L).map(_ * 6 + 2)
    val files = DeltaWrite.writeTableWithV2Checkpoint("spec-v2", ids)
    // no classic <v>.checkpoint.parquet exists on this layout
    assert(!files.contains(
      "_delta_log/00000000000000000001.checkpoint.parquet"))
    val st = DeltaWrite.readStateV2(files, 3L, Set("v2Checkpoint"))
      .getOrElse(fail("v2 read"))
    assert(st.metaId == "spec-v2" && st.nSidecars == 2)
    // live = {C from sidecar (partition preserved), D from the tail}
    assert(st.liveAdds.map(_._1) ==
      Seq("part-2.parquet", "part-3.parquet"))
    assert(st.liveAdds.map(_._3) == Seq("2", "3"))
    st.liveAdds.foreach { case (p, sz, _) =>
      assert(files(p).length.toLong == sz)
    }
    // feature gate: insufficient reader version OR missing feature
    assert(DeltaWrite.readStateV2(files, 1L, Set("v2Checkpoint"))
      .isEmpty, "classic-only reader version must fail closed")
    assert(DeltaWrite.readStateV2(files, 3L, Set.empty).isEmpty,
      "reader without the v2Checkpoint feature must fail closed")
    // sidecar integrity: a missing or size-mismatched sidecar closes
    val scName = files.keys.find(_.startsWith("_delta_log/_sidecars/"))
      .get
    assert(DeltaWrite.readStateV2(files - scName, 3L,
      Set("v2Checkpoint")).isEmpty)
    val truncated = files + (scName -> files(scName).dropRight(1))
    assert(DeltaWrite.readStateV2(truncated, 3L,
      Set("v2Checkpoint")).isEmpty)
    // self-describing version: a manifest claiming another version
    // is refused
    val manName = files.keys.find(_.contains(".checkpoint.")).get
    val badMan = DeltaWrite.writeV2Manifest(Seq(
      DeltaWrite.V2ManAct(minReader = 3L,
        readerFeaturesJson = """["v2Checkpoint"]"""),
      DeltaWrite.V2ManAct(metaId = "spec-v2"),
      DeltaWrite.V2ManAct(ckptVersion = 2L),
      DeltaWrite.V2ManAct(sidecarPath = scName.split("/").last,
        sidecarSize = files(scName).length.toLong)))
    assert(DeltaWrite.readStateV2(files + (manName -> badMan), 3L,
      Set("v2Checkpoint")).isEmpty)
    // tail replay is fail-CLOSED (r16 ADVICE): a non-JSON line, an
    // add missing path/size, and a malformed remove each refuse the
    // whole state instead of silently dropping the action
    val tailName = "_delta_log/00000000000000000002.json"
    val tail = new String(files(tailName), "UTF-8")
    def withTail(t: String) = files + (tailName -> t.getBytes("UTF-8"))
    assert(DeltaWrite.readStateV2(withTail(tail + "not json\n"), 3L,
      Set("v2Checkpoint")).isEmpty, "garbage tail line must close")
    assert(DeltaWrite.readStateV2(
      withTail(tail + """{"add": {"path": "x.parquet"}}""" + "\n"),
      3L, Set("v2Checkpoint")).isEmpty, "add without size must close")
    assert(DeltaWrite.readStateV2(
      withTail(tail + """{"remove": {"deletionTimestamp": 1}}""" +
        "\n"), 3L, Set("v2Checkpoint")).isEmpty,
      "remove without path must close")
    // other action types on the tail stay valid no-ops
    assert(DeltaWrite.readStateV2(
      withTail(tail + """{"commitInfo": {"operation": "TEST"}}""" +
        "\n"), 3L, Set("v2Checkpoint")).isDefined)
  }

  test("version checksum (q377): per-commit crc matches an " +
    "independent replay, tableSizeBytes is the live-add sum, and a " +
    "tampered log (lost remove) trips validation") {
    val ids = (0L until 60L).map(_ * 6 + 3)
    val files = DeltaWrite.writeTable("spec-crc", ids)
    val (n0, c0) = DeltaWrite.writeCrc(files, 0L).getOrElse(fail("v0"))
    val (n1, c1) = DeltaWrite.writeCrc(files, 1L).getOrElse(fail("v1"))
    assert(n0 == "_delta_log/00000000000000000000.crc")
    val t = files + (n0 -> c0) + (n1 -> c1)
    val v0 = DeltaWrite.validateCrc(t, 0L).getOrElse(fail("val0"))
    val v1 = DeltaWrite.validateCrc(t, 1L).getOrElse(fail("val1"))
    assert(v0.ok && v0.crcFiles == 2L) // A + B
    assert(v1.ok && v1.crcFiles == 2L) // A + C
    // tableSizeBytes == sum of the live files' ACTUAL bytes
    assert(v1.crcSize == files("part-A.parquet").length.toLong +
      files("part-C.parquet").length.toLong)
    // tamper: commit 1 loses its remove action — replay now claims
    // 3 live files; the stored crc trips
    val addOnly = new String(files(
      "_delta_log/00000000000000000001.json"), "UTF-8")
      .split("\n").filter(_.contains("\"add\"")).mkString("", "\n", "\n")
    val tampered = t + ("_delta_log/00000000000000000001.json" ->
      addOnly.getBytes("UTF-8"))
    val bad = DeltaWrite.validateCrc(tampered, 1L).getOrElse(fail("bad"))
    assert(!bad.ok && bad.replayFiles == 3L && bad.crcFiles == 2L)
    // absent crc / unknown version fail closed
    assert(DeltaWrite.validateCrc(files, 1L).isEmpty)
    assert(DeltaWrite.writeCrc(files, 9L).isEmpty)
  }

  test("row tracking (q393): baseRowId + position assignment, the " +
    "high-water mark domain, ids byte-stable across a materializing " +
    "ZORDER rewrite and a shallow clone, classic writer refused, " +
    "missing ids / low mark fail closed") {
    val W = DeltaWrite
    val files = W.writeRowTrackingTable("rt-spec", ids)
    val n = ids.length.toLong
    val st = W.replayRowTracking(files).getOrElse(fail("replay"))
    assert(st.rows.length.toLong == n &&
      st.highWaterMark == n - 1L)
    val parts = (0 to 2).map(x =>
      ids.filter(d => (d / 6) % 3 == x).sorted)
    val offs = Seq(0L, parts(0).length.toLong,
      (parts(0).length + parts(1).length).toLong)
    (0 to 2).foreach(g => parts(g).zipWithIndex.foreach {
      case (d, i) =>
        assert(st.rows.contains((offs(g) + i, d, (d * 31) % 1009)))
    })
    // ZORDER: materialized ids, triples stable, fresh block claimed
    val z = W.optimizeZOrderRt(files, 2).getOrElse(fail("zorder"))
    val zt = files + (z.commitName -> z.commit) ++ z.newFiles
    val st2 = W.replayRowTracking(zt).getOrElse(fail("replay z"))
    assert(st2.rows.toSet == st.rows.toSet, "ids survive the rewrite")
    assert(st2.highWaterMark == 2L * n - 1L, "block claimed, unused")
    assert(!new String(z.commit, "UTF-8")
      .contains("\"dataChange\": true"))
    // every rewritten file really carries _row_id
    z.newFiles.values.foreach { b =>
      assert(graft.sources.Parquet.columnLongs(b, "_row_id")
        .isDefined)
    }
    // clone: independent replay assigns the source's exact ids
    val cl = W.shallowCloneRt(files, "rt-clone")
      .getOrElse(fail("clone"))
    val ct = cl ++ files.filterNot(_._1.startsWith("_delta_log/"))
    val st3 = W.replayRowTracking(ct).getOrElse(fail("replay c"))
    assert(st3.rows.toSet == st.rows.toSet &&
      st3.highWaterMark == st.highWaterMark)
    // writer gate: classic writer refused on the rt table, passes
    // on a featureless one
    assert(W.writerGate(files, Set.empty).isEmpty)
    assert(W.writerGate(files,
      Set("rowTracking", "domainMetadata")).isDefined)
    assert(W.writerGate(W.writeTable("plain", ids),
      Set.empty).isDefined)
    // fail closed: classic table serves no lineage; idless add
    // refuses; a mark below the max id trips
    assert(W.replayRowTracking(W.writeTable("plain", ids)).isEmpty)
    val orphan = graft.sources.ParquetWrite.writeInt64(
      Seq("rec_id", "x", "y", "val"), Seq(Array(999999L, 1L, 1L, 1L)))
    assert(W.replayRowTracking(files +
      ("_delta_log/00000000000000000002.json" ->
        (W.addAction("noid.parquet", orphan.length.toLong) + "\n")
          .getBytes("UTF-8")) +
      ("noid.parquet" -> orphan)).isEmpty)
    assert(W.replayRowTracking(files +
      ("_delta_log/00000000000000000002.json" ->
        (W.rowIdHighWaterMarkAction(0L) + "\n")
          .getBytes("UTF-8"))).isEmpty)
  }

  test("row-tracking checkpoint (q401): gate, mark, and id blocks " +
    "survive checkpointing; checkpoint + tail == full log; the " +
    "read survives vacuuming every pre-checkpoint commit; classic " +
    "or truncated checkpoints fail closed") {
    val W = DeltaWrite
    val base = W.writeRowTrackingTable("rtc", ids)
    val ck = W.checkpointRt(base, 1L).getOrElse(fail("ckpt"))
    // the checkpoint rows round-trip through parseRt
    val rows = graft.sources.DeltaCheckpoint.parseRt(ck._2)
      .getOrElse(fail("parseRt"))
    assert(rows.exists(r => r.writerFeaturesJson != null &&
      r.writerFeaturesJson.contains("rowTracking")))
    assert(rows.exists(r =>
      r.domain == W.RowTrackingDomain &&
        r.domainConfig.contains("rowIdHighWaterMark")))
    assert(rows.count(_.addPath != null) == 3)
    assert(rows.filter(_.addPath != null).forall(_.baseRowId >= 0))
    // zorder lands as the JSON tail on top of the checkpoint
    val z = W.optimizeZOrderRt(base, 2).get
    val files = base + (z.commitName -> z.commit) ++ z.newFiles
    val withCk = files + (ck._1 -> ck._2) +
      ("_delta_log/_last_checkpoint" ->
        (ck._3 + "\n").getBytes("UTF-8"))
    val full = W.replayRowTracking(files).get
    val fromCk = W.replayRowTrackingCkpt(withCk).get
    assert(fromCk.rows == full.rows &&
      fromCk.highWaterMark == full.highWaterMark)
    // vacuum: every pre-checkpoint JSON gone, the read still exact
    val vacuumed = withCk -
      "_delta_log/00000000000000000000.json" -
      "_delta_log/00000000000000000001.json"
    val fromVac = W.replayRowTrackingCkpt(vacuumed).get
    assert(fromVac.rows == full.rows)
    assert(W.replayRowTracking(vacuumed).isEmpty,
      "the JSON-from-zero replay must die post-vacuum")
    // fail closed: truncated bytes; classic-shape checkpoint
    assert(W.replayRowTrackingCkpt(withCk +
      (ck._1 -> ck._2.dropRight(1))).isEmpty)
    assert(W.replayRowTrackingCkpt(withCk + (ck._1 ->
      W.writeCheckpoint(Seq(W.CkptAct(minReader = 1L),
        W.CkptAct(metaId = "rtc"))))).isEmpty,
      "a checkpoint without rt columns serves no lineage")
  }

  test("row tracking x deletion vectors (q407): survivors keep " +
    "their exact ids (assigned before the positional filter), the " +
    "mark does not move, DV-blind operations refuse, cardinality " +
    "lies close the replay") {
    val W = DeltaWrite
    val base = W.writeRowTrackingTable("rtd", ids)
    val files = W.writeRtDvTable("rtd", ids)
    val st0 = W.replayRowTracking(base).get
    val st = W.replayRowTracking(files).getOrElse(fail("replay"))
    val a = ids.filter(d => (d / 6) % 3 == 0).sorted
    val killed = a.zipWithIndex.collect {
      case (d, i) if d % 5 == 0 => i.toLong }.toSet
    assert(st.rows == st0.rows.filterNot(r => killed(r._1)),
      "survivors keep their exact triples")
    assert(st.highWaterMark == st0.highWaterMark,
      "a DV claims no ids")
    assert(st0.rows.map(_._1).toSet -- st.rows.map(_._1).toSet ==
      killed, "the row-id diff IS the DV")
    // DV-blind operations refuse rather than resurrect dead rows
    assert(W.checkpointRt(files, 2L).isEmpty)
    assert(W.shallowCloneRt(files, "x").isEmpty)
    assert(W.optimizeZOrderRt(files, 2).isEmpty)
    // the non-DV table still checkpoints and clones fine
    assert(W.checkpointRt(base, 1L).isDefined)
    assert(W.shallowCloneRt(base, "y").isDefined)
    // a descriptor lying about its cardinality closes the replay
    val lied = new String(
      files("_delta_log/00000000000000000002.json"), "UTF-8")
      .replaceFirst("\"cardinality\": (\\d+)",
        "\"cardinality\": 999999")
    assert(W.replayRowTracking(files +
      ("_delta_log/00000000000000000002.json" ->
        lied.getBytes("UTF-8"))).isEmpty)
  }

  test("liquid clustering (q412): columns come from the domain " +
    "(last wins), rewrite preserves rows and row ids with a fresh " +
    "block, 2-D pruning win vs the striped layout, classic writer " +
    "refused, domainless / nested / DV'd tables refuse") {
    val W = DeltaWrite
    val files = W.writeClusteredTable("lc", ids)
    assert(W.declaredWriterFeatures(files)
      .contains("clusteredTable"))
    assert(W.parseClusteringColumns(files)
      .contains(Seq("x", "y")))
    // classic writer refused; a clustering-aware one passes
    assert(W.writerGate(files, Set("rowTracking",
      "domainMetadata")).isEmpty)
    assert(W.writerGate(files, Set("rowTracking", "domainMetadata",
      "clusteredTable")).isDefined)
    val st0 = W.replayRowTracking(files).getOrElse(fail("replay"))
    val z = W.optimizeCluster(files, 3).getOrElse(fail("cluster"))
    val table = files + (z.commitName -> z.commit) ++ z.newFiles
    val st1 = W.replayRowTracking(table).getOrElse(fail("replay2"))
    assert(st1.rows.toSet == st0.rows.toSet,
      "ids byte-stable across the clustering rewrite")
    assert(st1.highWaterMark ==
      st0.highWaterMark + st0.rows.length.toLong,
      "fresh block claimed, unused")
    assert(!new String(z.commit, "UTF-8")
      .contains("\"dataChange\": true"))
    // the win: per-file (x, y) boxes tighten vs the striped layout
    def boxHits(t: Map[String, Array[Byte]], live: Seq[String]) = {
      val P = graft.sources.Parquet
      live.count { p =>
        val b = t(p)
        val xs = P.columnLongs(b, "x").get
        val ys = P.columnLongs(b, "y").get
        xs.nonEmpty && xs.min <= 95 && xs.max >= 64 &&
          ys.min <= 95 && ys.max >= 64
      }
    }
    val before = boxHits(files, W.replayLive(files).get._1)
    val after = boxHits(table, W.replayLive(table).get._1)
    assert(after < before, s"clustering must prune: $after/$before")
    // column change is metadata-only: recluster by val alone
    val files2 = table +
      ("_delta_log/00000000000000000003.json" ->
        (W.clusteringDomainAction(Seq("val")) + "\n")
          .getBytes("UTF-8"))
    assert(W.parseClusteringColumns(files2)
      .contains(Seq("val")))
    val z2 = W.optimizeCluster(files2, 3).getOrElse(fail("recl"))
    val valsPerFile = z2.newFiles.values.toSeq.map { b =>
      graft.sources.Parquet.columnLongs(b, "val").get.toSeq }
    assert(valsPerFile.flatten.sorted ==
      ids.map(d => (d * 31) % 1009).sorted)
    assert(valsPerFile.forall(v => v == v.sorted),
      "single-column clustering is a plain sort")
    // refusals: domainless rt table, nested path, DV'd live set
    assert(W.optimizeCluster(W.writeRowTrackingTable("plain", ids),
      3).isEmpty, "no clusteredTable feature -> refuse")
    val domainless = files + (files.keys.find(
      _.endsWith("00000000000000000000.json")).get ->
      new String(files("_delta_log/00000000000000000000.json"),
        "UTF-8").split("\n")
        .filterNot(_.contains("delta.clustering"))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(W.optimizeCluster(domainless, 3).isEmpty,
      "feature without domain -> refuse (never guess)")
    val nested = files +
      ("_delta_log/00000000000000000003.json" ->
        (W.domainMetadataAction(W.ClusteringDomain,
          """{"clusteringColumns": [["a", "b"]]}""") + "\n")
          .getBytes("UTF-8"))
    assert(W.optimizeCluster(nested, 3).isEmpty)
    val V = graft.sources.DeletionVectorsWrite
    val dvb = V.serializeBitmap(Seq(0L))
    val desc = V.descriptorJson("i", V.z85Encode(dvb), None,
      dvb.length.toLong, 1L)
    val zn = z.newFiles.keys.head
    val dvd = table + ("_delta_log/00000000000000000003.json" ->
      (Seq(W.removeAction(zn), W.addActionRtDv(zn,
        table(zn).length.toLong, 0L, 3L, desc))
        .mkString("\n") + "\n").getBytes("UTF-8"))
    assert(W.optimizeCluster(dvd, 3).isEmpty,
      "DV'd live set -> refuse, never resurrect")
  }

  test("rt zorder refusal closes BOTH branches (r17 advice): a DV " +
    "on an all-materialized live set refuses; duplicate rec_ids " +
    "refuse rec-keyed id recovery; a sizeless checkpoint add row " +
    "still tiles") {
    val W = DeltaWrite
    val base = W.writeRowTrackingTable("rtz", ids)
    // zorder once: every live file now carries materialized _row_id
    val z = W.optimizeZOrderRt(base, 2).getOrElse(fail("z0"))
    val zt = base + (z.commitName -> z.commit) ++ z.newFiles
    // land a DV killing position 0 of one REWRITTEN file: the
    // replay stays sound, but a second zorder would decode the
    // parquet straight (all-materialized branch) — it must refuse
    val zn = z.newFiles.keys.head
    val V = graft.sources.DeletionVectorsWrite
    val dvb = V.serializeBitmap(Seq(0L))
    val zdesc = V.descriptorJson("i", V.z85Encode(dvb), None,
      dvb.length.toLong, 1L)
    val c3 = Seq(W.removeAction(zn),
      W.addActionRtDv(zn, zt(zn).length.toLong, 0L, 3L, zdesc))
      .mkString("\n") + "\n"
    val ztd = zt + ("_delta_log/00000000000000000003.json" ->
      c3.getBytes("UTF-8"))
    val std = W.replayRowTracking(ztd).getOrElse(fail("replay dv"))
    val stz = W.replayRowTracking(zt).get
    assert(std.rows.length == stz.rows.length - 1,
      "the replay itself applies the DV")
    assert(W.optimizeZOrderRt(ztd, 2).isEmpty,
      "zorder after zorder+DV must refuse, not resurrect")
    // duplicate rec_ids: replay is fine (row ids stay unique) but
    // rec-keyed recovery in the fallback branch is unsound — refuse
    val n = ids.length.toLong
    val dupPq = graft.sources.ParquetWrite.writeInt64(
      Seq("rec_id", "x", "y", "val"),
      Seq(Array(ids.head, 1L, 2L, 3L)))
    val cdup = Seq(
      W.addActionRt("dup.parquet", dupPq.length.toLong, n, 2L,
        dataChange = true),
      W.rowIdHighWaterMarkAction(n)).mkString("\n") + "\n"
    val dupT = base + ("_delta_log/00000000000000000002.json" ->
      cdup.getBytes("UTF-8")) + ("dup.parquet" -> dupPq)
    assert(W.replayRowTracking(dupT).isDefined)
    assert(W.optimizeZOrderRt(dupT, 2).isEmpty,
      "duplicate rec_ids make rec-keyed id recovery unsound")
    // checkpoint writer: an externally built add row WITHOUT a size
    // must still produce a readable file (values tile def-levels)
    val acts = Seq(
      W.CkptActRt(minReader = 1L, minWriter = 7L,
        writerFeaturesJson = """["domainMetadata", "rowTracking"]"""),
      W.CkptActRt(metaId = "rtz"),
      W.CkptActRt(addPath = "a.parquet", addSize = 10L,
        baseRowId = 0L, drcv = 0L),
      W.CkptActRt(addPath = "b.parquet"))
    val rows = graft.sources.DeltaCheckpoint
      .parseRt(W.writeCheckpointRt(acts))
      .getOrElse(fail("sizeless add row must still parse"))
    assert(rows.count(_.addPath != null) == 2)
    assert(rows.find(_.addPath == "a.parquet").get.addSize == 10L)
  }
}
