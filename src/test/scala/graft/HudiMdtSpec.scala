package graft

import graft.sources.{HudiLog, HudiMdt, HudiWrite}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Hudi metadata table's files partition (q368): bootstrap
  * sync from the timeline, MDT-planned ≡ listing-planned, orphan
  * invisibility, CLEAN tombstones, and the append-is-prefix law on
  * the log bytes.
  */
class HudiMdtSpec extends AnyFunSuite {

  private val ids = (0L until 48L).map(_ * 6 + 1) // spread file groups

  test("bootstrap sync: MDT listing carries exactly the committed " +
    "files with true sizes; the inflight slice is absent; " +
    "MDT-planned file set == listing-planned set") {
    val files = HudiWrite.writeTable(ids)
    val mdt = HudiMdt.sync(files).getOrElse(fail("sync"))
    val table = files ++ mdt
    val listing = HudiMdt.listing(table).getOrElse(fail("listing"))
    val p = listing("p")
    val committed = files.keys.filter(k =>
      k.startsWith("p/") && !k.contains("00000000000003")).toSeq
    assert(p.map("p/" + _._1).sorted == committed.sorted)
    p.foreach { case (name, size) =>
      assert(size == files("p/" + name).length.toLong)
    }
    // the inflight t3 slice exists on disk but not in the MDT
    assert(!p.exists(_._1.contains("00000000000003")))
    val planM = HudiMdt.planFromMdt(table).getOrElse(fail("plan"))
    val planL = HudiMdt.planFromListing(table)
    assert(planM == planL)
    assert(planM == Seq("p/fg0_0-0-0_00000000000002.parquet",
      "p/fg1_0-0-0_00000000000001.parquet"))
  }

  test("orphan invisibility: a base file on disk with a COMPLETED " +
    "instant name but no commit record fools the listing plan, " +
    "never the MDT plan") {
    val files = HudiWrite.writeTable(ids)
    val mdt = HudiMdt.sync(files).getOrElse(fail("sync"))
    val clean = files ++ mdt
    val orphan = "p/fg9_0-0-0_00000000000001.parquet"
    val withOrphan = clean + (orphan ->
      graft.sources.ParquetWrite.writeInt64(Seq("rec_id", "val"),
        Seq(Array(999L, 999L))))
    val planM = HudiMdt.planFromMdt(withOrphan).getOrElse(fail("plan"))
    val planL = HudiMdt.planFromListing(withOrphan)
    assert(planL.contains(orphan),
      "the raw listing plan MUST see the orphan (that is the bug " +
        "the MDT exists to fix)")
    assert(!planM.contains(orphan))
    assert(planM == HudiMdt.planFromMdt(clean).get)
  }

  test("CLEAN sync: tombstones drop reclaimed files from the MDT, " +
    "plans stay equal, and the appended log is byte-prefixed by the " +
    "pre-clean log (append == rebuild discipline)") {
    val files = HudiWrite.writeTable(ids)
    val mdt = HudiMdt.sync(files).getOrElse(fail("sync"))
    val t4 = "00000000000004"
    val cr = HudiWrite.clean(files, t4).getOrElse(fail("clean"))
    assert(cr.deleted == Seq("p/fg0_0-0-0_00000000000001.parquet"))
    val mdt2 = HudiMdt.appendClean(mdt, t4, cr.deleted)
      .getOrElse(fail("appendClean"))
    val oldLog = mdt(HudiMdt.LogPath)
    val newLog = mdt2(HudiMdt.LogPath)
    assert(newLog.length > oldLog.length &&
      newLog.take(oldLog.length).sameElements(oldLog))
    assert(HudiLog.parse(newLog).get.length ==
      HudiLog.parse(oldLog).get.length + 1)
    val table = (files -- cr.deleted) ++ mdt ++ mdt2 +
      (cr.timelineName -> cr.timeline)
    val listing = HudiMdt.listing(table).getOrElse(fail("listing"))
    assert(!listing("p").exists(_._1 ==
      "fg0_0-0-0_00000000000001.parquet"))
    val planM = HudiMdt.planFromMdt(table).getOrElse(fail("plan"))
    assert(planM == HudiMdt.planFromListing(table))
    // the clean replaced nothing LIVE: the plan is unchanged
    assert(planM == Seq("p/fg0_0-0-0_00000000000002.parquet",
      "p/fg1_0-0-0_00000000000001.parquet"))
  }

  test("MOR table: log files are tracked in the MDT too; an " +
    "UNCOMMITTED tombstone block (no MDT deltacommit) is ignored " +
    "by the replay") {
    val files = HudiWrite.writeMorTable(ids)
    val mdt = HudiMdt.sync(files).getOrElse(fail("sync"))
    val table = files ++ mdt
    val listing = HudiMdt.listing(table).getOrElse(fail("listing"))
    val names = listing("p").map(_._1)
    assert(names.exists(_.startsWith(".fg0_")),
      "deltacommits track log files")
    assert(HudiMdt.planFromMdt(table).get ==
      HudiMdt.planFromListing(table))
    // append a tombstone block WITHOUT its MDT timeline entry: the
    // listing must not change (completed-only replay)
    val rogueLog = mdt(HudiMdt.LogPath) ++
      HudiMdt.appendClean(mdt, "00000000000009",
        Seq("p/fg0_0-0-0_00000000000001.parquet")).get(HudiMdt.LogPath)
        .drop(mdt(HudiMdt.LogPath).length)
    val rogue = table + (HudiMdt.LogPath -> rogueLog)
    assert(HudiMdt.listing(rogue).get == listing)
  }

  test("totality: a commit whose stats path has no bytes fails sync " +
    "closed (a sync must never record a size it cannot prove)") {
    val files = HudiWrite.writeTable(ids)
    val broken = files - "p/fg0_0-0-0_00000000000002.parquet"
    assert(HudiMdt.sync(broken).isEmpty)
  }

  /** A three-file table whose files hold disjoint val ranges —
    * the shape column-stats pruning exists for.
    */
  private def rangedTable(): (Map[String, Array[Byte]],
      Seq[(Long, Long)]) = {
    val rows = (0L until 120L).map(d => (d, (d * 13) % 1200))
    val t1 = "00000000000001"
    val parts = (0 to 2).map(b => rows.filter(_._2 / 400 == b))
    val names = (0 to 2).map(b => s"p/r$b-0-0_0-0-0_$t1.parquet")
    val data = parts.map(p => graft.sources.ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(r => Array(r._1, r._2))))
    val commit = HudiWrite.commitJson((0 to 2).map(b =>
      (s"r$b-0-0", names(b), parts(b).length.toLong)))
    val files = Map(s".hoodie/$t1.commit" -> commit.getBytes("UTF-8")) ++
      (0 to 2).map(b => names(b) -> data(b))
    (files, rows)
  }

  test("column_stats (q374): proven per-file min/max in the MDT, " +
    "pruning keeps exactly the intersecting files, conservative on " +
    "absent stats, and pruned+filter == full+filter") {
    val (files, rows) = rangedTable()
    val mdt = HudiMdt.sync(files).getOrElse(fail("sync"))
    val cs = HudiMdt.syncColumnStats(files, Seq("rec_id", "val"))
      .getOrElse(fail("colstats"))
    val table = files ++ mdt ++ cs
    val stats = HudiMdt.colStatsListing(table).getOrElse(fail("list"))
    // stats are PROVEN: re-derive from the data
    (0 to 2).foreach { b =>
      val vals = rows.filter(_._2 / 400 == b).map(_._2)
      val (mn, mx, cnt) = stats(
        (s"p/r$b-0-0_0-0-0_00000000000001.parquet", "val"))
      assert(mn == vals.min && mx == vals.max &&
        cnt == vals.length.toLong)
    }
    // predicate val in [100, 250] hits only bucket 0
    val pruned = HudiMdt.prunePlan(table, "val", 100L, 250L).get
    assert(pruned == Seq("p/r0-0-0_0-0-0_00000000000001.parquet"))
    // pruned + filter == full + filter (never a wrong skip)
    def scan(plan: Seq[String]): Seq[(Long, Long)] = plan.flatMap { p =>
      val b = table(p)
      val rs = graft.sources.Parquet.columnLongs(b, "rec_id").get
      val vs = graft.sources.Parquet.columnLongs(b, "val").get
      rs.zip(vs).filter(r => r._2 >= 100 && r._2 <= 250)
    }.sortBy(_._1)
    val full = HudiMdt.planFromMdt(table).get
    assert(scan(pruned) == scan(full))
    assert(scan(pruned) ==
      rows.filter(r => r._2 >= 100 && r._2 <= 250).sortBy(_._1))
    // a column with no stats prunes NOTHING (conservative)
    assert(HudiMdt.prunePlan(table, "nope", 100L, 250L).get == full)
    // an uncommitted stats block is invisible to pruning decisions
    val rogue = table + (HudiMdt.ColStatsLogPath ->
      table(HudiMdt.ColStatsLogPath).dropRight(1))
    assert(HudiMdt.colStatsListing(rogue).isEmpty,
      "truncated stats log must fail closed")
  }

  test("rollback (q382): pending-instant artifacts die (all-target " +
    "log deleted, mixed log gets a command block, inflight base + " +
    "marker deleted), replay is unchanged, completed instants are " +
    "REFUSED, and a second rollback is a no-op") {
    val files0 = HudiWrite.writeMorTable(ids)
    // add a second pending instant t5 whose block shares fg0's log
    val t5 = "00000000000005"
    val log0Name = "p/.fg0_00000000000001.log.1_0-0-0"
    val extra = HudiLog.writeBlock(HudiLog.TypeAvroData,
      Seq(HudiLog.HdrInstantTime -> t5,
        HudiLog.HdrSchema -> HudiWrite.LogRecSchema),
      HudiLog.dataContent(Seq(HudiWrite.avroRec(999L, 999L))))
    val files = files0 +
      (log0Name -> (files0(log0Name) ++ extra)) +
      (s".hoodie/$t5.deltacommit.inflight" -> "{}".getBytes("UTF-8"))
    val before = HudiWrite.replay(files).getOrElse(fail("replay"))
    // roll back t5: fg0's log is MIXED (t2, t3 completed) -> command
    val r1 = HudiWrite.rollback(files, t5, "00000000000006")
      .getOrElse(fail("rb t5"))
    assert(r1.deleted == Seq(s".hoodie/$t5.deltacommit.inflight"))
    assert(r1.appendedLogs.keySet == Set(log0Name))
    val f1 = (files -- r1.deleted) ++ r1.appendedLogs +
      (r1.timelineName -> r1.timeline)
    val blocks = HudiLog.parse(f1(log0Name)).get
    assert(blocks.last.blockType == HudiLog.TypeCommand &&
      blocks.last.target == t5)
    // roll back t4: fg1's log is ALL-t4 -> the file dies, plus marker
    val t4 = "00000000000004"
    val log1Name = "p/.fg1_00000000000001.log.1_0-0-0"
    val r2 = HudiWrite.rollback(f1, t4, "00000000000007")
      .getOrElse(fail("rb t4"))
    assert(r2.deleted.toSet ==
      Set(log1Name, s".hoodie/$t4.deltacommit.inflight"))
    assert(r2.appendedLogs.isEmpty)
    val f2 = (f1 -- r2.deleted) ++ r2.appendedLogs +
      (r2.timelineName -> r2.timeline)
    // replay unchanged across both rollbacks (pending never applied)
    assert(HudiWrite.replay(f1).get.map(f => (f.fileId, f.rows)) ==
      before.map(f => (f.fileId, f.rows)))
    assert(HudiWrite.replay(f2).get.map(f => (f.fileId, f.rows)) ==
      before.map(f => (f.fileId, f.rows)))
    // idempotent: rolling t5 back again deletes/appends nothing
    val r3 = HudiWrite.rollback(f2, t5, "00000000000008")
      .getOrElse(fail("rb again"))
    assert(r3.deleted.isEmpty && r3.appendedLogs.isEmpty)
    // completed instants are refused
    assert(HudiWrite.rollback(f2, "00000000000002", "9".padTo(14, '0')
      .reverse).isEmpty)
    // COW inflight base file: writeTable's t3 slice dies with marker
    val cow = HudiWrite.writeTable(ids)
    val rc = HudiWrite.rollback(cow, "00000000000003",
      "00000000000004").getOrElse(fail("rb cow"))
    assert(rc.deleted.toSet == Set(
      "p/fg1_0-0-0_00000000000003.parquet",
      ".hoodie/00000000000003.inflight"))
  }

  test("record-level index (q391): RLI tagging == full-scan replay " +
    "tagging; updates keep their file group; delete blocks " +
    "tombstone; the inflight poison never enters; orphan records " +
    "invisible; append == rebuild byte-exact across compaction") {
    val files = HudiWrite.writeMorTable(ids)
    val rli = HudiMdt.syncRecordIndex(files).getOrElse(fail("sync"))
    val table = files ++ rli
    val idx = HudiMdt.recordIndexListing(table)
      .getOrElse(fail("listing"))
    // baseline: the merged replay's live keys per file group
    val scan = HudiWrite.replay(files).get.flatMap(f =>
      f.rows.map(r => r._1 -> ("p", f.fileId))).toMap
    assert(idx == scan, "index lookup must equal full-scan tagging")
    // deleted keys (fg0, d%5==0) are ABSENT — insert path in both
    val fg0 = ids.filter(d => (d / 6) % 2 == 0)
    fg0.filter(_ % 5 == 0).foreach(d => assert(!idx.contains(d)))
    fg0.filter(_ % 5 != 0).foreach(d =>
      assert(idx(d) == (("p", "fg0"))))
    // the poisoned inflight t4 (fg1's log) never entered: fg1 keys
    // map to fg1 exactly when the BASE carried them
    ids.filter(d => (d / 6) % 2 == 1).foreach(d =>
      assert(idx(d) == (("p", "fg1"))))
    // orphan records fool the scan, never the index
    val orphan = "p/fg9_0-0-0_00000000000001.parquet"
    val withOrphan = table + (orphan ->
      graft.sources.ParquetWrite.writeInt64(Seq("rec_id", "val"),
        Seq(Array(999999L, 1L))))
    assert(HudiWrite.replay(withOrphan).get
      .exists(_.rows.exists(_._1 == 999999L)))
    assert(!HudiMdt.recordIndexListing(withOrphan).get
      .contains(999999L))
    // compaction: locations preserved; append == rebuild byte-exact
    val t5 = "00000000000005"
    val cf = HudiWrite.compact(files, t5).getOrElse(fail("compact"))
    val compacted = table ++ cf
    val rli2 = HudiMdt.appendRecordIndex(rli, compacted, t5,
      "commit").getOrElse(fail("append"))
    val idx2 = HudiMdt.recordIndexListing(compacted ++ rli2).get
    assert(idx2 == idx, "fileIds survive compaction")
    val rebuilt = HudiMdt.syncRecordIndex(compacted).get
    assert(java.util.Arrays.equals(
      rebuilt(HudiMdt.RecordIndexLogPath),
      rli2(HudiMdt.RecordIndexLogPath)), "append == rebuild")
    // and the append is byte-prefixed by the original log
    val a = rli(HudiMdt.RecordIndexLogPath)
    val b = rli2(HudiMdt.RecordIndexLogPath)
    assert(b.length > a.length &&
      java.util.Arrays.equals(b.take(a.length), a))
  }

  test("bloom_filters partition (q397): SBBF per base file from " +
    "proven keys — no false negatives, no wrong skips, clean " +
    "tombstones, inflight absent, append == rebuild byte-exact") {
    val files = HudiWrite.writeTable(ids)
    val mdt = HudiMdt.syncBloomFilters(files).getOrElse(fail("sync"))
    val blooms = HudiMdt.bloomListing(files ++ mdt)
      .getOrElse(fail("listing"))
    // t1 wrote fg0+fg1, t2 rewrote fg0; the inflight t3 slice absent
    assert(blooms.keySet == Set(
      "p/fg0_0-0-0_00000000000001.parquet",
      "p/fg1_0-0-0_00000000000001.parquet",
      "p/fg0_0-0-0_00000000000002.parquet"))
    // no false negatives over every (file, key) actually present
    blooms.keys.foreach { p =>
      val ks = graft.sources.Parquet.columnLongs(files(p), "rec_id")
        .get
      ks.foreach(k => assert(blooms(p).mightContainLong(k),
        s"false negative on $p key $k"))
    }
    // no wrong skips: a NO from the filter is a proven absence
    val allKeys = ids.toSet
    blooms.keys.foreach { p =>
      val ks = graft.sources.Parquet.columnLongs(files(p), "rec_id")
        .get.toSet
      allKeys.foreach { k =>
        if (!blooms(p).mightContainLong(k))
          assert(!ks.contains(k), s"wrong skip on $p key $k")
      }
    }
    // clean tombstones the reclaimed slice's filter
    val cr = HudiWrite.clean(files, "00000000000004").get
    val withClean = files + (cr.timelineName -> cr.timeline)
    val mdt2 = HudiMdt.appendBloomFilters(mdt, withClean,
      "00000000000004", "clean").getOrElse(fail("append"))
    val blooms2 = HudiMdt.bloomListing(
      (withClean -- cr.deleted) ++ mdt ++ mdt2).get
    assert(blooms2.keySet == blooms.keySet -
      "p/fg0_0-0-0_00000000000001.parquet")
    // append == rebuild byte-exact
    val rebuilt = HudiMdt.syncBloomFilters(withClean).get
    assert(java.util.Arrays.equals(rebuilt(HudiMdt.BloomLogPath),
      mdt2(HudiMdt.BloomLogPath)))
  }

  test("clustering sync (q404): the replacecommit lands in the MDT " +
    "as adds + tombstones for every replaced-group file; plans stay " +
    "equal and dark; the RLI moves every key to its clustered group") {
    val files = HudiWrite.writeMorTable(ids)
    val mdt = HudiMdt.sync(files).get
    val rli = HudiMdt.syncRecordIndex(files).get
    val cf = HudiWrite.cluster(files, "00000000000005", 2).get
    val clustered = files ++ cf.newFiles +
      (cf.timelineName -> cf.timeline)
    val mdt2 = HudiMdt.sync(clustered).get
    val rli2 = HudiMdt.syncRecordIndex(clustered).get
    val plan = HudiMdt.planFromMdt(clustered ++ mdt2).get
    assert(plan == Seq("p/cl0_0-0-0_00000000000005.parquet",
      "p/cl1_0-0-0_00000000000005.parquet"))
    assert(plan == HudiMdt.planFromListing(clustered))
    // the files partition listing no longer carries fg files
    val listing = HudiMdt.listing(clustered ++ mdt2).get
    assert(listing("p").forall(!_._1.contains("fg")))
    // the RLI moved every live key to its clustered group
    val idx = HudiMdt.recordIndexListing(clustered ++ rli2).get
    val scan = HudiWrite.replay(clustered).get
    assert(idx == scan.flatMap(f =>
      f.rows.map(r => r._1 -> ("p", f.fileId))).toMap)
    assert(idx.values.forall(_._2.startsWith("cl")))
    // rebuilds are byte-prefixed by the pre-cluster logs
    def prefix(a: Array[Byte], b: Array[Byte]) =
      b.length > a.length &&
        java.util.Arrays.equals(b.take(a.length), a)
    assert(prefix(mdt(HudiMdt.LogPath), mdt2(HudiMdt.LogPath)))
    assert(prefix(rli(HudiMdt.RecordIndexLogPath),
      rli2(HudiMdt.RecordIndexLogPath)))
    // a nameless replacecommit fails the sync closed
    val anon = clustered + (cf.timelineName ->
      """{"operation": "CLUSTER", "partitionToWriteStats": {"p": []}}"""
        .getBytes("UTF-8"))
    assert(HudiMdt.sync(anon).isEmpty)
  }

  test("secondary index (q411): composite-key escaping vectors, " +
    "listing == inverted merged scan, value changes tombstone the " +
    "old mapping, clustering contributes ZERO changes, two-hop " +
    "lookup == full-scan filter reading only the named groups, " +
    "append == rebuild, unknown-key delete fails closed") {
    val M = HudiMdt
    // escaping: the separator is unforgeable from part content
    assert(M.secondaryKey("a$b", "k\\1") == "a\\$b$k\\\\1")
    assert(M.splitSecondaryKey("a\\$b$k\\\\1")
      .contains(("a$b", "k\\1")))
    assert(M.splitSecondaryKey("nosep").isEmpty)
    assert(M.splitSecondaryKey("a$b$c").isEmpty)
    assert(M.splitSecondaryKey("a$b\\").isEmpty)
    assert(M.splitSecondaryKey("a\\x$b").isEmpty)
    val files = HudiWrite.writeMorTable(ids)
    val mdt = M.syncSecondaryIndex(files).getOrElse(fail("sync"))
    val rli = M.syncRecordIndex(files).getOrElse(fail("rli"))
    val table = files ++ mdt ++ rli
    val sl = M.secondaryIndexListing(table).getOrElse(fail("listing"))
    // the listing IS the inverted merged scan
    val scan = HudiWrite.replay(files).get.flatMap(_.rows)
    val inverted = scan.groupBy(_._2)
      .map { case (v, rs) => v -> rs.map(_._1).toSet }
    assert(sl == inverted)
    // an updated key (fg0, d%3==0 -> val+7) lives under its NEW
    // value; a deleted key (d%5==0) under none
    val fg0 = ids.filter(d => (d / 6) % 2 == 0)
    def v(d: Long): Long = (d * 13) % 991
    fg0.filter(d => d % 3 == 0 && d % 5 != 0).foreach { d =>
      assert(sl.getOrElse(v(d) + 7, Set.empty).contains(d))
      assert(!sl.getOrElse(v(d), Set.empty).contains(d))
    }
    fg0.filter(_ % 5 == 0).foreach { d =>
      assert(!sl.values.exists(_.contains(d)))
    }
    // two-hop lookup == full-scan filter, and only the named file
    // groups are decoded (absent values read nothing)
    (scan.map(_._2).distinct :+ 999983L).foreach { target =>
      val (fids, rows) = M.secondaryLookup(table, target)
        .getOrElse(fail(s"lookup $target"))
      assert(rows == scan.filter(_._2 == target).sortBy(_._1))
      val trueFids = scan.filter(_._2 == target).map(_._1)
        .flatMap(k => M.recordIndexListing(table).get.get(k))
        .map(_._2).distinct.sorted
      assert(fids == trueFids)
      if (target == 999983L) assert(fids.isEmpty && rows.isEmpty)
    }
    // clustering contributes ZERO secondary changes: the rebuilt
    // log is byte-identical, and append appends nothing
    val t5 = "00000000000005"
    val cf = HudiWrite.cluster(files, t5, 2).getOrElse(fail("cl"))
    val clustered = files ++ cf.newFiles +
      (cf.timelineName -> cf.timeline)
    val rebuilt = M.syncSecondaryIndex(clustered).get
    assert(java.util.Arrays.equals(
      rebuilt(M.SecondaryIndexLogPath),
      mdt(M.SecondaryIndexLogPath)),
      "clustering must not touch the secondary index log")
    val app = M.appendSecondaryIndex(mdt ++ rli, clustered, t5,
      "replacecommit").getOrElse(fail("append"))
    assert(java.util.Arrays.equals(app(M.SecondaryIndexLogPath),
      mdt(M.SecondaryIndexLogPath)))
    // post-clustering lookup still equals the scan (locations moved
    // to cl* groups through the RECORD index, q404's business)
    val rli2 = M.syncRecordIndex(clustered).get
    val table2 = clustered ++ rebuilt ++ rli2 ++
      M.sync(clustered).get
    val scan2 = HudiWrite.replay(clustered).get.flatMap(_.rows)
    scan2.map(_._2).distinct.take(5).foreach { target =>
      val (fids2, rows2) = M.secondaryLookup(table2, target).get
      assert(rows2 == scan2.filter(_._2 == target).sortBy(_._1))
      assert(fids2.forall(_.startsWith("cl")))
    }
    // append == rebuild byte-exact across a real data instant: a
    // t6 deltacommit updating one key's value
    val t6 = "00000000000006"
    val k6 = fg0.find(d => d % 3 != 0 && d % 5 != 0).get
    val lname6 = s"p/.fg0_$t6.log.1_0-0-0"
    val log6 = HudiLog.writeBlock(HudiLog.TypeAvroData,
      Seq(HudiLog.HdrInstantTime -> t6,
        HudiLog.HdrSchema -> HudiWrite.LogRecSchema),
      HudiLog.dataContent(Seq(HudiWrite.avroRec(k6, 777L))))
    val files6 = files +
      (s".hoodie/$t6.deltacommit" -> HudiWrite.commitJson(
        Seq(("fg0", lname6, 1L))).getBytes("UTF-8")) +
      (lname6 -> log6)
    val app6 = M.appendSecondaryIndex(mdt, files6, t6,
      "deltacommit").getOrElse(fail("append6"))
    val rebuilt6 = M.syncSecondaryIndex(files6).get
    assert(java.util.Arrays.equals(
      app6(M.SecondaryIndexLogPath),
      rebuilt6(M.SecondaryIndexLogPath)), "append == rebuild")
    val sl6 = M.secondaryIndexListing(files6 ++ app6).get
    assert(sl6.getOrElse(777L, Set.empty).contains(k6))
    assert(!sl6.getOrElse(v(k6), Set.empty).contains(k6))
    // a delete of a never-written key fails the sync closed
    val t7 = "00000000000007"
    val lname7 = s"p/.fg0_$t7.log.1_0-0-0"
    val log7 = HudiLog.writeBlock(HudiLog.TypeDelete,
      Seq(HudiLog.HdrInstantTime -> t7),
      HudiLog.deleteContent(Seq("999999")))
    val files7 = files +
      (s".hoodie/$t7.deltacommit" -> HudiWrite.commitJson(
        Seq(("fg0", lname7, 1L))).getBytes("UTF-8")) +
      (lname7 -> log7)
    assert(M.syncSecondaryIndex(files7).isEmpty,
      "a sync must never tombstone a mapping it cannot name")
  }

  test("record-index totality: a commit naming a base file with no " +
    "bytes, or an undecodable log, fails sync CLOSED") {
    val files = HudiWrite.writeMorTable(ids)
    val noBytes = files -
      "p/fg0_0-0-0_00000000000001.parquet"
    assert(HudiMdt.syncRecordIndex(noBytes).isEmpty,
      "a sync must never index a location it cannot prove")
    val log0 = "p/.fg0_00000000000001.log.1_0-0-0"
    val garbled = files + (log0 -> files(log0).take(7))
    assert(HudiMdt.syncRecordIndex(garbled).isEmpty)
  }
}
