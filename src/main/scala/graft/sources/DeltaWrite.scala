package graft.sources

/** Compose a complete Delta table from first principles: data files
  * through the engine's own parquet writer ([[ParquetWrite]]) and a
  * `_delta_log` of CANONICAL JSON commits — sorted keys, ", " / ": "
  * separators — the exact byte form `json.dumps(sort_keys=True)`
  * emits, so the independent Python twin
  * (scripts/make_delta_write_oracle.py) reproduces the whole bundle
  * byte for byte and q299's md5 join pins every byte of table, log,
  * and escaping.
  *
  * Spec source: delta-io/delta PROTOCOL.md (action shapes); the
  * commit layout mirrors what delta writers emit — protocol +
  * metaData + adds in commit 0, remove + add in commit 1.
  */
object DeltaWrite {

  /** The table schema as delta's schemaString (canonical JSON). */
  val SchemaString: String =
    """{"fields": [{"metadata": {}, "name": "rec_id", "nullable": false, "type": "long"}, {"metadata": {}, "name": "val", "nullable": false, "type": "long"}], "type": "struct"}"""

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def addAction(path: String, size: Long): String =
    s"""{"add": {"dataChange": true, "modificationTime": 1700000000000, "partitionValues": {}, "path": "$path", "size": $size}}"""

  /** An add carrying one partition value (canonical key order). */
  def addActionPart(path: String, size: Long, part: String): String =
    s"""{"add": {"dataChange": true, "modificationTime": 1700000000000, "partitionValues": {"part": "$part"}, "path": "$path", "size": $size}}"""

  def removeAction(path: String): String =
    s"""{"remove": {"dataChange": true, "deletionTimestamp": 1700000001000, "path": "$path"}}"""

  val protocolAction: String =
    """{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}"""

  def metaDataAction(id: String): String =
    s"""{"metaData": {"configuration": {}, "createdTime": 1700000000000, "format": {"options": {}, "provider": "parquet"}, "id": "$id", "partitionColumns": [], "schemaString": "${esc(SchemaString)}"}}"""

  /** The q299 table bundle: three data files split by (d/6) % 3,
    * commit 0 adds A+B, commit 1 removes B and adds C (the q254
    * replay shape). Returns rel_path -> bytes.
    */
  def writeTable(id: String,
                 ids: Seq[Long]): Map[String, Array[Byte]] = {
    val parts = (0 to 2).map(x => ids.filter(d => (d / 6) % 3 == x))
    val names = Seq("part-A.parquet", "part-B.parquet",
      "part-C.parquet")
    val data = parts.map(p => ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(d => Array(d, (d * 11) % 1000))))
    val c0 = Seq(protocolAction, metaDataAction(id),
      addAction(names(0), data(0).length.toLong),
      addAction(names(1), data(1).length.toLong)).mkString("\n") + "\n"
    val c1 = Seq(removeAction(names(1)),
      addAction(names(2), data(2).length.toLong)).mkString("\n") + "\n"
    Map(
      "_delta_log/00000000000000000000.json" ->
        c0.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      "_delta_log/00000000000000000001.json" ->
        c1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      names(0) -> data(0), names(1) -> data(1), names(2) -> data(2))
  }

  // ---- checkpoint WRITE (q314) -------------------------------------------

  /** One checkpoint action row — exactly one group populated, exactly
    * the shape [[DeltaCheckpoint.parse]] reads back. Adds carry one
    * partition entry ("part" -> addPart).
    */
  final case class CkptAct(addPath: String = null, addSize: Long = -1L,
                           addPart: String = null,
                           removePath: String = null,
                           metaId: String = null, minReader: Long = -1L)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Serialize checkpoint rows as `<version>.checkpoint.parquet`
    * through the engine's own nested parquet writer
    * ([[ParquetWrite.writeFile]]): one OPTIONAL group per action kind
    * whose leaves carry v1 def-level sections, and `add.
    * partitionValues` as the 3-level MAP layout (REPEATED key_value
    * under an OPTIONAL MAP-annotated group, REQUIRED key + OPTIONAL
    * value) — the exact Dremel striping the checkpoint READER
    * ([[DeltaCheckpoint.parse]]) reassembles. Deterministic layout;
    * the independent Python twin
    * (scripts/make_delta_ckpt_write_oracle.py) reproduces the bytes
    * md5-exact and re-reads them with pyarrow.
    *
    * Spec source: delta-io/delta PROTOCOL.md "Checkpoints" (one row
    * per action, columns named after the JSON action fields).
    */
  def writeCheckpoint(acts: Seq[CkptAct]): Array[Byte] = {
    require(acts.nonEmpty && acts.length <= (1 << 16))
    acts.foreach(a => require(a.addPath == null || a.addPart != null,
      "adds must carry a partition value"))
    val W = ParquetWrite
    val n = acts.length
    val fields = Seq(
      W.Group("protocol", 1,
        Seq(W.Leaf("minReaderVersion", 1, 2))),
      W.Group("metaData", 1,
        Seq(W.Leaf("id", 1, 6, convertedType = 0))),
      W.Group("add", 1, Seq(
        W.Leaf("path", 1, 6, convertedType = 0),
        W.Group("partitionValues", 1, Seq(
          W.Group("key_value", 2, Seq(
            W.Leaf("key", 0, 6, convertedType = 0),
            W.Leaf("value", 1, 6, convertedType = 0)),
            convertedType = 2)), convertedType = 1),
        W.Leaf("size", 1, 2))),
      W.Group("remove", 1,
        Seq(W.Leaf("path", 1, 6, convertedType = 0))))
    val isAdd = acts.map(_.addPath != null)
    val zeroReps = Array.fill(n)(0)
    W.writeFile(fields, Seq(
      W.LeafData(acts.map(a => if (a.minReader >= 0) 2 else 0).toArray,
        null, longs = acts.filter(_.minReader >= 0)
          .map(_.minReader).toArray),
      W.LeafData(acts.map(a => if (a.metaId != null) 2 else 0).toArray,
        null, bins = acts.collect {
          case a if a.metaId != null => a.metaId.getBytes(Utf8)
        }.toArray),
      W.LeafData(isAdd.map(b => if (b) 2 else 0).toArray, null,
        bins = acts.collect {
          case a if a.addPath != null => a.addPath.getBytes(Utf8)
        }.toArray),
      W.LeafData(isAdd.map(b => if (b) 3 else 0).toArray, zeroReps,
        bins = acts.collect {
          case a if a.addPath != null => "part".getBytes(Utf8)
        }.toArray),
      W.LeafData(isAdd.map(b => if (b) 4 else 0).toArray, zeroReps,
        bins = acts.collect {
          case a if a.addPath != null => a.addPart.getBytes(Utf8)
        }.toArray),
      W.LeafData(isAdd.map(b => if (b) 2 else 0).toArray, null,
        longs = acts.collect {
          case a if a.addPath != null => a.addSize
        }.toArray),
      W.LeafData(acts.map(a => if (a.removePath != null) 2 else 0)
        .toArray, null, bins = acts.collect {
          case a if a.removePath != null => a.removePath.getBytes(Utf8)
        }.toArray)))
  }

  /** `_delta_log/_last_checkpoint` body (canonical key order). */
  def lastCheckpointJson(version: Long, size: Long): String =
    s"""{"size": $size, "version": $version}"""

  /** Multi-part form: `"parts": N` names the split. */
  def lastCheckpointJsonParts(version: Long, size: Long,
                              parts: Long): String =
    s"""{"parts": $parts, "size": $size, "version": $version}"""

  /** The q314 bundle: a Delta table whose pre-checkpoint JSON has
    * been VACUUMED — commits 0-1 survive only as the engine-written
    * `00000000000000000001.checkpoint.parquet` (protocol, metaData,
    * adds for A+C, the remove-B tombstone) named by
    * `_last_checkpoint`, plus a surviving JSON tail (commit 2:
    * remove A, add D). Live view = {C, D}; C's partition value is
    * recoverable ONLY from the checkpoint's map column, so a
    * JSON-only replay both misses C and has no partition for it.
    * Data files split by (d/6) % 4; val = (d*13) % 991.
    */
  def writeTableWithCheckpoint(id: String,
                               ids: Seq[Long]): Map[String, Array[Byte]] = {
    val parts = (0 to 3).map(x => ids.filter(d => (d / 6) % 4 == x))
    val names = (0 to 3).map(x => s"part-$x.parquet")
    val data = parts.map(p => ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(d => Array(d, (d * 13) % 991))))
    val ckpt = writeCheckpoint(Seq(
      CkptAct(minReader = 1L),
      CkptAct(metaId = id),
      CkptAct(addPath = names(0), addSize = data(0).length.toLong,
        addPart = "0"),
      CkptAct(addPath = names(2), addSize = data(2).length.toLong,
        addPart = "2"),
      CkptAct(removePath = names(1))))
    val c2 = Seq(removeAction(names(0)),
      addActionPart(names(3), data(3).length.toLong, "3"))
      .mkString("\n") + "\n"
    Map(
      "_delta_log/00000000000000000001.checkpoint.parquet" -> ckpt,
      "_delta_log/_last_checkpoint" ->
        (lastCheckpointJson(1L, 5L) + "\n").getBytes(Utf8),
      "_delta_log/00000000000000000002.json" -> c2.getBytes(Utf8),
      names(0) -> data(0), names(1) -> data(1),
      names(2) -> data(2), names(3) -> data(3))
  }

  /** The q323 bundle: the q314 table with its checkpoint SPLIT into
    * two parts per PROTOCOL.md's multi-part naming
    * (`<v>.checkpoint.<part>.<parts>.parquet`, 10-digit indices) —
    * part 1 carries protocol + metaData + add A, part 2 add C + the
    * remove-B tombstone — and `_last_checkpoint` claiming
    * `"parts": 2`. Pre-checkpoint JSON fully vacuumed: a single-name
    * checkpoint reader finds NOTHING on this table.
    */
  def writeTableWithMultipartCheckpoint(id: String, ids: Seq[Long])
      : Map[String, Array[Byte]] = {
    val parts = (0 to 3).map(x => ids.filter(d => (d / 6) % 4 == x))
    val names = (0 to 3).map(x => s"part-$x.parquet")
    val data = parts.map(p => ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(d => Array(d, (d * 13) % 991))))
    val part1 = writeCheckpoint(Seq(
      CkptAct(minReader = 1L),
      CkptAct(metaId = id),
      CkptAct(addPath = names(0), addSize = data(0).length.toLong,
        addPart = "0")))
    val part2 = writeCheckpoint(Seq(
      CkptAct(addPath = names(2), addSize = data(2).length.toLong,
        addPart = "2"),
      CkptAct(removePath = names(1))))
    val c2 = Seq(removeAction(names(0)),
      addActionPart(names(3), data(3).length.toLong, "3"))
      .mkString("\n") + "\n"
    def pname(i: Int) =
      f"_delta_log/${1}%020d.checkpoint.$i%010d.${2}%010d.parquet"
    Map(
      pname(1) -> part1,
      pname(2) -> part2,
      "_delta_log/_last_checkpoint" ->
        (lastCheckpointJsonParts(1L, 5L, 2L) + "\n").getBytes(Utf8),
      "_delta_log/00000000000000000002.json" -> c2.getBytes(Utf8),
      names(0) -> data(0), names(1) -> data(1),
      names(2) -> data(2), names(3) -> data(3))
  }

  // ---- v2 checkpoints: manifest + sidecars (q370) ---------------------------

  /** One v2-manifest action row for [[writeV2Manifest]] — exactly one
    * group populated, the shape [[DeltaCheckpoint.parseV2Manifest]]
    * reads back.
    */
  final case class V2ManAct(minReader: Long = -1L,
                            readerFeaturesJson: String = null,
                            metaId: String = null,
                            ckptVersion: Long = -1L,
                            sidecarPath: String = null,
                            sidecarSize: Long = -1L)

  /** Serialize a v2 checkpoint MANIFEST (PROTOCOL.md "V2
    * Checkpoints"): protocol (minReaderVersion + the reader features
    * the table gates on), metaData, checkpointMetadata (the
    * manifest's own version — self-describing integrity), and one
    * sidecar row per `_delta_log/_sidecars/` file, each carrying the
    * byte size a reader must verify. Same nested-OPTIONAL-group
    * layout discipline as [[writeCheckpoint]].
    */
  def writeV2Manifest(acts: Seq[V2ManAct]): Array[Byte] = {
    require(acts.nonEmpty && acts.length <= (1 << 16))
    val W = ParquetWrite
    val fields = Seq(
      W.Group("protocol", 1, Seq(
        W.Leaf("minReaderVersion", 1, 2),
        W.Leaf("readerFeaturesJson", 1, 6, convertedType = 0))),
      W.Group("metaData", 1,
        Seq(W.Leaf("id", 1, 6, convertedType = 0))),
      W.Group("checkpointMetadata", 1,
        Seq(W.Leaf("version", 1, 2))),
      W.Group("sidecar", 1, Seq(
        W.Leaf("path", 1, 6, convertedType = 0),
        W.Leaf("sizeInBytes", 1, 2))))
    W.writeFile(fields, Seq(
      W.LeafData(acts.map(a => if (a.minReader >= 0) 2 else 0).toArray,
        null, longs = acts.filter(_.minReader >= 0)
          .map(_.minReader).toArray),
      W.LeafData(acts.map(a =>
        if (a.readerFeaturesJson != null) 2 else 0).toArray,
        null, bins = acts.collect {
          case a if a.readerFeaturesJson != null =>
            a.readerFeaturesJson.getBytes(Utf8)
        }.toArray),
      W.LeafData(acts.map(a => if (a.metaId != null) 2 else 0).toArray,
        null, bins = acts.collect {
          case a if a.metaId != null => a.metaId.getBytes(Utf8)
        }.toArray),
      W.LeafData(acts.map(a => if (a.ckptVersion >= 0) 2 else 0)
        .toArray, null, longs = acts.filter(_.ckptVersion >= 0)
        .map(_.ckptVersion).toArray),
      W.LeafData(acts.map(a => if (a.sidecarPath != null) 2 else 0)
        .toArray, null, bins = acts.collect {
          case a if a.sidecarPath != null =>
            a.sidecarPath.getBytes(Utf8)
        }.toArray),
      W.LeafData(acts.map(a => if (a.sidecarPath != null) 2 else 0)
        .toArray, null, longs = acts.filter(_.sidecarPath != null)
        .map(_.sidecarSize).toArray)))
  }

  /** Deterministic pseudo-UUID (md5-derived, 8-4-4-4-12) for v2
    * checkpoint / sidecar names — the UUID-named form the protocol
    * prescribes, reproducible for the fixture discipline.
    */
  def uuidFor(seed: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes(Utf8)).map("%02x".format(_)).mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${
      h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}"
  }

  /** The q370 bundle: the q314 table re-laid as a V2 CHECKPOINT —
    * pre-checkpoint JSON fully vacuumed, state at version 1 held by
    * a UUID-named manifest + two sidecars under
    * `_delta_log/_sidecars/` (adds incl. partition values in one,
    * the remove-B tombstone in the other), protocol gated on the
    * v2Checkpoint reader feature, plus the surviving JSON tail
    * (commit 2: remove A, add D). A classic-only reader must fail
    * CLOSED on the gate; live view = {C, D}.
    */
  def writeTableWithV2Checkpoint(id: String, ids: Seq[Long])
      : Map[String, Array[Byte]] = {
    val parts = (0 to 3).map(x => ids.filter(d => (d / 6) % 4 == x))
    val names = (0 to 3).map(x => s"part-$x.parquet")
    val data = parts.map(p => ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(d => Array(d, (d * 13) % 991))))
    val sc1 = writeCheckpoint(Seq(
      CkptAct(addPath = names(0), addSize = data(0).length.toLong,
        addPart = "0"),
      CkptAct(addPath = names(2), addSize = data(2).length.toLong,
        addPart = "2")))
    val sc2 = writeCheckpoint(Seq(CkptAct(removePath = names(1))))
    val sc1Name = s"${uuidFor(s"$id-sc1")}.parquet"
    val sc2Name = s"${uuidFor(s"$id-sc2")}.parquet"
    val man = writeV2Manifest(Seq(
      V2ManAct(minReader = 3L,
        readerFeaturesJson = """["v2Checkpoint"]"""),
      V2ManAct(metaId = id),
      V2ManAct(ckptVersion = 1L),
      V2ManAct(sidecarPath = sc1Name,
        sidecarSize = sc1.length.toLong),
      V2ManAct(sidecarPath = sc2Name,
        sidecarSize = sc2.length.toLong)))
    val c2 = Seq(removeAction(names(0)),
      addActionPart(names(3), data(3).length.toLong, "3"))
      .mkString("\n") + "\n"
    Map(
      f"_delta_log/${1L}%020d.checkpoint.${uuidFor(id)}.parquet" ->
        man,
      s"_delta_log/_sidecars/$sc1Name" -> sc1,
      s"_delta_log/_sidecars/$sc2Name" -> sc2,
      "_delta_log/_last_checkpoint" ->
        (lastCheckpointJson(1L, 5L) + "\n").getBytes(Utf8),
      "_delta_log/00000000000000000002.json" -> c2.getBytes(Utf8),
      names(0) -> data(0), names(1) -> data(1),
      names(2) -> data(2), names(3) -> data(3))
  }

  final case class V2State(liveAdds: Seq[(String, Long, String)],
                           metaId: String, nSidecars: Int)

  private val V2CkptRe =
    "^_delta_log/(\\d{20})\\.checkpoint\\.[0-9a-f-]{36}\\.parquet$".r

  /** Resolve table state from a V2 checkpoint: `_last_checkpoint` ->
    * the UUID-named manifest at that version -> FEATURE GATE
    * (protocol.minReaderVersion and readerFeatures must both be
    * supported — a classic-only reader fails CLOSED here) ->
    * checkpointMetadata.version must equal the named version ->
    * sidecars (size-verified, then [[DeltaCheckpoint.parse]]) fold
    * into base state -> JSON commits AFTER the checkpoint replay on
    * top. Live adds as (path, size, partition). None on any gate,
    * size, version, or byte failure.
    */
  def readStateV2(files: Map[String, Array[Byte]],
                  maxReaderVersion: Long,
                  features: Set[String]): Option[V2State] = {
    import Json.{JArray, JLong, JObject, JString}
    for {
      lc <- files.get("_delta_log/_last_checkpoint")
      j <- Json.parse(new String(lc, Utf8).trim)
      o <- j match { case x: JObject => Some(x); case _ => None }
      ver <- o.get("version").collect { case JLong(x) => x }
      manName <- files.keys.toSeq.sorted.find {
        case V2CkptRe(v) => v.toLong == ver
        case _ => false
      }
      man <- files.get(manName)
      acts <- DeltaCheckpoint.parseV2Manifest(man)
      proto <- acts.find(_.minReader >= 0)
      // the feature gate: both the version number and every named
      // reader feature must be supported
      if proto.minReader <= maxReaderVersion
      featNames <- proto.readerFeaturesJson match {
        case null => Some(Nil)
        case fj => Json.parse(fj).collect {
          case JArray(xs) => xs.collect { case JString(x) => x }
        }
      }
      if featNames.forall(features.contains)
      ckptVer <- acts.find(_.ckptVersion >= 0).map(_.ckptVersion)
      if ckptVer == ver
      metaId <- acts.find(_.metaId != null).map(_.metaId)
      base <- {
        val sidecars = acts.filter(_.sidecarPath != null)
        val per = sidecars.map { sc =>
          for {
            b <- files.get(s"_delta_log/_sidecars/${sc.sidecarPath}")
            if b.length.toLong == sc.sidecarSize
            rows <- DeltaCheckpoint.parse(b)
          } yield rows
        }
        if (per.exists(_.isEmpty) || sidecars.isEmpty) None
        else Some((sidecars.length, per.flatMap(_.get)))
      }
      live <- {
        val (_, rows) = base
        val lv = scala.collection.mutable.LinkedHashMap
          .empty[String, (Long, String)]
        rows.foreach { a =>
          if (a.addPath != null)
            lv(a.addPath) =
              (a.addSize, a.addParts.getOrElse("part", null))
          else if (a.removePath != null) lv.remove(a.removePath)
        }
        // JSON tail strictly after the checkpoint version — fail
        // CLOSED (None) on any non-JSON line, add missing path/size,
        // or malformed remove, matching replayLive's ok=false posture
        var ok = true
        files.keys.toSeq.collect {
          case p @ CommitRe(v) if v.toLong > ver => (v.toLong, p)
        }.sortBy(_._1).foreach { case (_, p) =>
          new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
            .foreach { line =>
              Json.parse(line) match {
                case Some(ob: JObject) =>
                  (ob.get("add"), ob.get("remove")) match {
                    case (Some(a: JObject), _) =>
                      (a.get("path").collect { case JString(x) => x },
                        a.get("size").collect {
                          case JLong(x) => x }) match {
                        case (Some(pa), Some(sz)) =>
                          val part =
                            a.get("partitionValues").collect {
                              case pv: JObject =>
                                pv.get("part").collect {
                                  case JString(x) => x }
                            }.flatten.orNull
                          lv(pa) = (sz, part)
                        case _ => ok = false
                      }
                    case (Some(_), _) => ok = false
                    case (None, Some(r: JObject)) =>
                      r.get("path") match {
                        case Some(JString(x)) => lv.remove(x)
                        case _ => ok = false
                      }
                    case (None, Some(_)) => ok = false
                    // other action types (commitInfo, metaData,
                    // protocol, txn) are valid no-ops here
                    case (None, None) => ()
                  }
                case _ => ok = false
              }
            }
        }
        if (ok) Some(lv) else None
      }
    } yield {
      val (nSidecars, _) = base
      V2State(live.toSeq.map { case (p, (sz, part)) =>
        (p, sz, part) }.sortBy(_._1), metaId, nSidecars)
    }
  }

  // ---- deletion-vector write (q340) ----------------------------------------

  /** Protocol action gated on the deletionVectors reader feature
    * (minReaderVersion 3 / minWriterVersion 7 per PROTOCOL.md).
    */
  val protocolActionDv: String =
    """{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["deletionVectors"], "writerFeatures": ["deletionVectors"]}}"""

  /** An add carrying a deletionVector descriptor (canonical key
    * order).
    */
  def addActionDv(path: String, size: Long, dvJson: String): String =
    s"""{"add": {"dataChange": true, "deletionVector": $dvJson, "modificationTime": 1700000000000, "partitionValues": {}, "path": "$path", "size": $size}}"""

  /** The q340 table: three data files (own parquet writer,
    * val = (d*23) % 997), then ONE commit that re-adds each with a
    * deletion vector — part 0's INLINE (Z85 in the log, d%7==2
    * dead), parts 1 and 2 sharing a `u`-storage `.bin` DV FILE at
    * two offsets (d%5==3 and d%11==4 dead) — every byte through the
    * engine's own writers ([[DeletionVectorsWrite]]). Returns
    * rel_path -> bytes.
    */
  def writeDvTable(id: String, t: Long,
                   ids: Seq[Long]): Map[String, Array[Byte]] = {
    val V = DeletionVectorsWrite
    val parts = (0 to 2).map(x =>
      ids.filter(d => (d / 6) % 3 == x).toIndexedSeq)
    val names = (0 to 2).map(x => s"part-$x.parquet")
    val data = parts.map(p => ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(d => Array(d, (d * 23) % 997))))
    def deadPos(x: Int, cond: Long => Boolean): Seq[Long] =
      parts(x).zipWithIndex.collect {
        case (d, i) if cond(d) => i.toLong }
    val dv0 = V.serializeBitmap(deadPos(0, _ % 7 == 2))
    val dv1 = V.serializeBitmap(deadPos(1, _ % 5 == 3))
    val dv2 = V.serializeBitmap(deadPos(2, _ % 11 == 4))
    val (bin, offs) = V.dvFile(Seq(dv1, dv2))
    val uuid = new java.util.UUID(0xAAAA0000L + t, 0xBB.toLong)
    val binName = s"deletion_vector_$uuid.bin"
    val d0 = V.descriptorJson("i", V.z85Encode(dv0), None,
      dv0.length.toLong, deadPos(0, _ % 7 == 2).length.toLong)
    val d1 = V.descriptorJson("u", V.uuidPathEncode(uuid),
      Some(offs(0)._1), offs(0)._2,
      deadPos(1, _ % 5 == 3).length.toLong)
    val d2 = V.descriptorJson("u", V.uuidPathEncode(uuid),
      Some(offs(1)._1), offs(1)._2,
      deadPos(2, _ % 11 == 4).length.toLong)
    val c0 = (Seq(protocolActionDv, metaDataAction(id)) ++
      (0 to 2).map(x => addAction(names(x), data(x).length.toLong)))
      .mkString("\n") + "\n"
    val c1 = Seq(
      removeAction(names(0)),
      addActionDv(names(0), data(0).length.toLong, d0),
      removeAction(names(1)),
      addActionDv(names(1), data(1).length.toLong, d1),
      removeAction(names(2)),
      addActionDv(names(2), data(2).length.toLong, d2))
      .mkString("\n") + "\n"
    Map(
      "_delta_log/00000000000000000000.json" -> c0.getBytes(Utf8),
      "_delta_log/00000000000000000001.json" -> c1.getBytes(Utf8),
      binName -> bin,
      names(0) -> data(0), names(1) -> data(1), names(2) -> data(2))
  }

  // ---- OPTIMIZE write (q339) ----------------------------------------------

  /** add/remove with an explicit dataChange — OPTIMIZE commits MUST
    * carry false (delta PROTOCOL.md: compaction rearranges existing
    * data; a changes-only reader skips it).
    */
  def addActionDc(path: String, size: Long, dataChange: Boolean)
      : String =
    s"""{"add": {"dataChange": $dataChange, "modificationTime": 1700000000000, "partitionValues": {}, "path": "$path", "size": $size}}"""

  def removeActionDc(path: String, dataChange: Boolean): String =
    s"""{"remove": {"dataChange": $dataChange, "deletionTimestamp": 1700000001000, "path": "$path"}}"""

  private val CommitRe = "^_delta_log/(\\d{20})\\.json$".r

  /** Replay the JSON commits in version order to (liveAdds sorted,
    * maxVersion). None on any malformed byte. JSON-only tables (the
    * writeTable shape); checkpoint replay is [[DeltaCheckpoint]]'s
    * job.
    */
  def replayLive(files: Map[String, Array[Byte]])
      : Option[(Seq[String], Long)] = {
    import Json.{JObject, JString}
    val commits = files.keys.toSeq.collect {
      case p @ CommitRe(v) => (v.toLong, p)
    }.sortBy(_._1)
    if (commits.isEmpty) return None
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    var ok = true
    commits.foreach { case (_, p) =>
      new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
        .foreach { line =>
          Json.parse(line) match {
            case Some(o: JObject) =>
              o.get("add") match {
                case Some(a: JObject) => a.get("path") match {
                  case Some(JString(x)) => live += x
                  case _ => ok = false
                }
                case _ => o.get("remove") match {
                  case Some(r: JObject) => r.get("path") match {
                    case Some(JString(x)) => live -= x
                    case _ => ok = false
                  }
                  case _ => () // protocol / metaData
                }
              }
            case _ => ok = false
          }
        }
    }
    if (ok) Some((live.toSeq.sorted, commits.last._1)) else None
  }

  // ---- version checksum files (q377) ----------------------------------------

  /** Replay the JSON commits through `version` (inclusive) to the
    * live (path -> declared size) state. None on malformed bytes or
    * an unknown version.
    */
  def replayLiveSized(files: Map[String, Array[Byte]],
                      version: Long): Option[Map[String, Long]] = {
    import Json.{JLong, JObject, JString}
    val commits = files.keys.toSeq.collect {
      case p @ CommitRe(v) if v.toLong <= version => (v.toLong, p)
    }.sortBy(_._1)
    if (commits.isEmpty || commits.last._1 != version) return None
    val live = scala.collection.mutable.LinkedHashMap
      .empty[String, Long]
    var ok = true
    commits.foreach { case (_, p) =>
      new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
        .foreach { line =>
          Json.parse(line) match {
            case Some(o: JObject) =>
              o.get("add") match {
                case Some(a: JObject) =>
                  (a.get("path"), a.get("size")) match {
                    case (Some(JString(x)), Some(JLong(sz))) =>
                      live(x) = sz
                    case _ => ok = false
                  }
                case _ => o.get("remove") match {
                  case Some(r: JObject) => r.get("path") match {
                    case Some(JString(x)) => live.remove(x)
                    case _ => ok = false
                  }
                  case _ => () // protocol / metaData
                }
              }
            case _ => ok = false
          }
        }
    }
    if (ok) Some(live.toMap) else None
  }

  /** `<version>.crc` — the per-commit VERSION CHECKSUM delta-spark
    * records (public delta repo, VersionChecksum): a summary of the
    * post-commit state {numFiles, numMetadata, numProtocol,
    * tableSizeBytes} a reader validates its replay against without
    * re-listing data. Canonical key order, derived from the engine's
    * own replay.
    */
  def writeCrc(files: Map[String, Array[Byte]],
               version: Long): Option[(String, Array[Byte])] =
    replayLiveSized(files, version).map { live =>
      val body =
        s"""{"numFiles": ${live.size}, "numMetadata": 1, "numProtocol": 1, "tableSizeBytes": ${live.values.sum}}"""
      (f"_delta_log/$version%020d.crc", body.getBytes(Utf8))
    }

  final case class CrcCheck(ok: Boolean, crcFiles: Long,
                            crcSize: Long, replayFiles: Long,
                            replaySize: Long)

  /** Validate the stored `<version>.crc` against an INDEPENDENT
    * replay of the log — the cheap corruption tripwire a reader runs
    * before trusting a table (a lost action, a truncated commit, a
    * re-written add all move numFiles/tableSizeBytes). None when the
    * crc file is absent or unparseable; `ok=false` carries both
    * sides for diagnosis.
    */
  def validateCrc(files: Map[String, Array[Byte]],
                  version: Long): Option[CrcCheck] = {
    import Json.{JLong, JObject}
    for {
      crcBytes <- files.get(f"_delta_log/$version%020d.crc")
      j <- Json.parse(new String(crcBytes, Utf8).trim)
      o <- j match { case x: JObject => Some(x); case _ => None }
      nf <- o.get("numFiles").collect { case JLong(x) => x }
      ts <- o.get("tableSizeBytes").collect { case JLong(x) => x }
      live <- replayLiveSized(files, version)
    } yield CrcCheck(
      nf == live.size.toLong && ts == live.values.sum,
      nf, ts, live.size.toLong, live.values.sum)
  }

  final case class OptimizeResult(commitName: String,
                                  commit: Array[Byte],
                                  compactedName: String,
                                  compacted: Array[Byte],
                                  removed: Seq[String], rows: Long)

  /** OPTIMIZE (bin-packing compaction) as a WRITE operation: replay
    * the log to the live file set, decode every live parquet through
    * the engine's own reader, write ONE compacted file (rows sorted
    * by rec_id) through the own parquet writer, and commit
    * remove(live)+add(compacted) with dataChange=false throughout —
    * so the post-OPTIMIZE replay answers identically while a
    * changes-only (CDF-style) reader sees zero new rows. None on any
    * malformed byte.
    */
  def optimize(files: Map[String, Array[Byte]])
      : Option[OptimizeResult] =
    replayLive(files).flatMap { case (live, maxV) =>
      if (live.isEmpty) None
      else {
        val decoded = live.map { p =>
          for {
            b <- files.get(p)
            rs <- Parquet.columnLongs(b, "rec_id")
            vs <- Parquet.columnLongs(b, "val")
            if rs.length == vs.length
          } yield rs.toSeq.zip(vs.toSeq)
        }
        if (decoded.exists(_.isEmpty)) None
        else {
          val rows = decoded.flatMap(_.get).sortBy(_._1)
          val compactedName = f"part-opt-${maxV + 1}%05d.parquet"
          val compacted = ParquetWrite.writeInt64(
            Seq("rec_id", "val"), rows.map(r => Array(r._1, r._2)))
          val commit = (live.map(removeActionDc(_, dataChange = false))
            :+ addActionDc(compactedName, compacted.length.toLong,
              dataChange = false)).mkString("\n") + "\n"
          Some(OptimizeResult(
            f"_delta_log/${maxV + 1}%020d.json",
            commit.getBytes(Utf8), compactedName, compacted, live,
            rows.length.toLong))
        }
      }
    }

  // ---- SHALLOW CLONE (q386) -----------------------------------------------------

  /** SHALLOW CLONE: a NEW table whose commit 0 re-declares the
    * source's live files BY PATH — zero data bytes copied, the
    * dev/test-fork primitive at 100 TB (a deep copy would move the
    * lake). The clone's log is its own: source commits after the
    * clone do not reach it, clone commits do not reach the source.
    * The documented trade rides along: the clone borrows the
    * source's DATA files, so a source vacuum that reclaims one
    * breaks the clone (fail closed at read, never silent). None on
    * an unknown version or malformed log.
    */
  def shallowClone(source: Map[String, Array[Byte]],
                   atVersion: Long,
                   cloneId: String): Option[Map[String, Array[Byte]]] =
    replayLiveSized(source, atVersion).map { live =>
      val c0 = (Seq(protocolAction, metaDataAction(cloneId)) ++
        live.toSeq.sortBy(_._1).map { case (p, sz) =>
          addAction(p, sz) }).mkString("\n") + "\n"
      Map("_delta_log/00000000000000000000.json" -> c0.getBytes(Utf8))
    }

  // ---- RESTORE (q383) ---------------------------------------------------------

  final case class RestoreResult(commitName: String,
                                 commit: Array[Byte],
                                 adds: Seq[String],
                                 removes: Seq[String])

  /** RESTORE TABLE ... TO VERSION AS OF v — time travel as a WRITE:
    * a NEW commit re-adds the target version's files that are no
    * longer live and removes the current files the target lacks, so
    * history is preserved (nothing is rewound, the restore is itself
    * a commit) and the post-restore replay equals the target's.
    * Actions carry dataChange=true — a RESTORE is a data change and
    * CDF consumers must see it (the inverse of OPTIMIZE's false).
    * Fails CLOSED when a to-be-re-added file's bytes are gone (the
    * vacuum horizon: you cannot restore data that was reclaimed).
    * Restoring the CURRENT version yields zero actions (no-op).
    */
  def restore(files: Map[String, Array[Byte]],
              toVersion: Long): Option[RestoreResult] = {
    val maxV = files.keys.collect {
      case CommitRe(v) => v.toLong }.maxOption.getOrElse(return None)
    for {
      target <- replayLiveSized(files, toVersion)
      current <- replayLiveSized(files, maxV)
      // vacuum horizon: every file the restore re-adds must still
      // physically exist
      if target.keys.forall(files.contains)
    } yield {
      val adds = (target.keySet -- current.keySet).toSeq.sorted
      val removes = (current.keySet -- target.keySet).toSeq.sorted
      val commit = (removes.map(removeActionDc(_, dataChange = true))
        ++ adds.map(p => addActionDc(p, target(p),
          dataChange = true)))
        .mkString("", "\n", if (adds.isEmpty && removes.isEmpty) ""
        else "\n")
      RestoreResult(f"_delta_log/${maxV + 1}%020d.json",
        commit.getBytes(Utf8), adds, removes)
    }
  }

  // ---- OPTIMIZE ZORDER (q381) ------------------------------------------------

  /** Morton interleave of two `bits`-bit values: z-order's locality
    * key — close (x, y) points get close z values, so sorting by z
    * clusters BOTH dimensions into files at once (one sort column
    * can only cluster one).
    */
  def zInterleave(x: Long, y: Long, bits: Int = 8): Long = {
    require(bits >= 1 && bits <= 31)
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  final case class ZOrderResult(commitName: String,
                                commit: Array[Byte],
                                newFiles: Map[String, Array[Byte]],
                                removed: Seq[String], rows: Long)

  /** OPTIMIZE ZORDER BY (x, y) as a WRITE operation: replay the log
    * to the live set, decode every live file through the own parquet
    * reader (columns rec_id, x, y, val), SORT by the Morton
    * interleave of (x, y), re-split into `nFiles` equal runs, and
    * commit remove(live)+add(zfiles) with dataChange=false (a
    * clustering rewrite rearranges, never changes, data — q339's
    * discipline). The point at 100 TB: per-file (x, y) bounds become
    * TIGHT BOXES instead of full-range stripes, so a 2-D box
    * predicate prunes most files — the q381 law measures exactly
    * that against the unclustered layout. None on any malformed
    * byte.
    */
  def optimizeZOrder(files: Map[String, Array[Byte]],
                     nFiles: Int): Option[ZOrderResult] =
    replayLive(files).flatMap { case (live, maxV) =>
      if (live.isEmpty || nFiles < 1) None
      else {
        val decoded = live.map { p =>
          for {
            b <- files.get(p)
            rs <- Parquet.columnLongs(b, "rec_id")
            xs <- Parquet.columnLongs(b, "x")
            ys <- Parquet.columnLongs(b, "y")
            vs <- Parquet.columnLongs(b, "val")
            if rs.length == xs.length && rs.length == ys.length &&
              rs.length == vs.length
          } yield (0 until rs.length).map(i =>
            (rs(i), xs(i), ys(i), vs(i)))
        }
        if (decoded.exists(_.isEmpty)) None
        else {
          val rows = decoded.flatMap(_.get)
            .sortBy(r => (zInterleave(r._2, r._3), r._1))
          val per = math.max(1, (rows.length + nFiles - 1) / nFiles)
          val parts = rows.grouped(per).toSeq
          val names = parts.indices.map(i =>
            f"part-z$i%03d-${maxV + 1}%05d.parquet")
          val data = parts.map(p => ParquetWrite.writeInt64(
            Seq("rec_id", "x", "y", "val"),
            p.map(r => Array(r._1, r._2, r._3, r._4))))
          val commit = (live.map(removeActionDc(_, dataChange = false))
            ++ names.zip(data).map { case (n, d) =>
              addActionDc(n, d.length.toLong, dataChange = false) })
            .mkString("\n") + "\n"
          Some(ZOrderResult(
            f"_delta_log/${maxV + 1}%020d.json",
            commit.getBytes(Utf8),
            names.zip(data).toMap, live, rows.length.toLong))
        }
      }
    }

  // ---- ROW TRACKING (q393) ---------------------------------------------------

  /** Row tracking's protocol gate (PROTOCOL.md): writer feature
    * `rowTracking` + `domainMetadata` at minWriterVersion 7 — a
    * classic writer MUST refuse to commit (it would assign no ids
    * and break lineage); readers stay compatible (minReaderVersion
    * 1: the data is still just parquet).
    */
  val protocolActionRowTracking: String =
    """{"protocol": {"minReaderVersion": 1, "minWriterVersion": 7, "writerFeatures": ["domainMetadata", "rowTracking"]}}"""

  /** A `domainMetadata` action (canonical key order); configuration
    * is a JSON STRING per the spec.
    */
  def domainMetadataAction(domain: String, config: String): String =
    s"""{"domainMetadata": {"configuration": "${esc(config)}", "domain": "$domain", "removed": false}}"""

  /** The row-tracking high-water mark domain. */
  val RowTrackingDomain = "delta.rowTracking"

  def rowIdHighWaterMarkAction(hwm: Long): String =
    domainMetadataAction(RowTrackingDomain,
      s"""{"rowIdHighWaterMark": $hwm}""")

  /** An add carrying `baseRowId` + `defaultRowCommitVersion`
    * (canonical key order).
    */
  def addActionRt(path: String, size: Long, baseRowId: Long,
                  defaultRowCommitVersion: Long,
                  dataChange: Boolean): String =
    s"""{"add": {"baseRowId": $baseRowId, "dataChange": $dataChange, "defaultRowCommitVersion": $defaultRowCommitVersion, "modificationTime": 1700000000000, "partitionValues": {}, "path": "$path", "size": $size}}"""

  /** The q393 ROW-TRACKING table: v0 declares the feature and adds
    * A + B with inherited id blocks (baseRowId 0 and |A|) plus the
    * high-water mark domain; v1 appends C from the advanced mark.
    * Columns (rec_id, x, y, val) so the ZORDER rewrite (q381) can
    * exercise id stability. val = (d*31) % 1009, x = (d*7) % 256,
    * y = (d*13) % 256.
    */
  def writeRowTrackingTable(id: String,
                            ids: Seq[Long]): Map[String, Array[Byte]] = {
    val parts = (0 to 2).map(x =>
      ids.filter(d => (d / 6) % 3 == x).sorted)
    val names = Seq("part-rtA.parquet", "part-rtB.parquet",
      "part-rtC.parquet")
    def pq(p: Seq[Long]): Array[Byte] =
      ParquetWrite.writeInt64(Seq("rec_id", "x", "y", "val"),
        p.map(d => Array(d, (d * 7) % 256, (d * 13) % 256,
          (d * 31) % 1009)))
    val data = parts.map(pq)
    val na = parts(0).length.toLong; val nb = parts(1).length.toLong
    val nc = parts(2).length.toLong
    val c0 = Seq(protocolActionRowTracking, metaDataAction(id),
      addActionRt(names(0), data(0).length.toLong, 0L, 0L,
        dataChange = true),
      addActionRt(names(1), data(1).length.toLong, na, 0L,
        dataChange = true),
      rowIdHighWaterMarkAction(na + nb - 1L)).mkString("\n") + "\n"
    val c1 = Seq(
      addActionRt(names(2), data(2).length.toLong, na + nb, 1L,
        dataChange = true),
      rowIdHighWaterMarkAction(na + nb + nc - 1L))
      .mkString("\n") + "\n"
    Map(
      "_delta_log/00000000000000000000.json" -> c0.getBytes(Utf8),
      "_delta_log/00000000000000000001.json" -> c1.getBytes(Utf8),
      names(0) -> data(0), names(1) -> data(1), names(2) -> data(2))
  }

  /** An add carrying baseRowId AND a deletion vector (canonical key
    * order) — rows die by POSITION, ids assign before the filter.
    */
  def addActionRtDv(path: String, size: Long, baseRowId: Long,
                    drcv: Long, dvJson: String): String =
    s"""{"add": {"baseRowId": $baseRowId, "dataChange": true, "defaultRowCommitVersion": $drcv, "deletionVector": $dvJson, "modificationTime": 1700000000000, "partitionValues": {}, "path": "$path", "size": $size}}"""

  /** The q407 table: the row-tracking table plus v2 re-adding
    * part-rtA with an INLINE deletion vector killing its d%5==0
    * positions. The mark does not move — a DV claims no ids.
    */
  def writeRtDvTable(id: String,
                     ids: Seq[Long]): Map[String, Array[Byte]] = {
    val base = writeRowTrackingTable(id, ids)
    val a = ids.filter(d => (d / 6) % 3 == 0).sorted
    val deadPos = a.zipWithIndex.collect {
      case (d, i) if d % 5 == 0 => i.toLong }
    val V = DeletionVectorsWrite
    val dv = V.serializeBitmap(deadPos)
    val desc = V.descriptorJson("i", V.z85Encode(dv), None,
      dv.length.toLong, deadPos.length.toLong)
    val sizeA = base("part-rtA.parquet").length.toLong
    val c2 = Seq(removeAction("part-rtA.parquet"),
      addActionRtDv("part-rtA.parquet", sizeA, 0L, 2L, desc))
      .mkString("\n") + "\n"
    base + ("_delta_log/00000000000000000002.json" ->
      c2.getBytes(Utf8))
  }

  /** The WRITER gate: None (refuse to write) when the table's
    * protocol demands writer features this writer does not support —
    * the q370 fail-closed pattern on the write side. A table with no
    * writerFeatures passes for every writer.
    */
  def writerGate(files: Map[String, Array[Byte]],
                 supported: Set[String]): Option[Unit] = {
    import Json.{JArray, JObject, JString}
    val commits = files.keys.toSeq.collect {
      case p @ CommitRe(v) => (v.toLong, p) }.sortBy(_._1)
    if (commits.isEmpty) return None
    var feats = Set.empty[String]
    var ok = true
    commits.foreach { case (_, p) =>
      new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
        .foreach { line =>
          Json.parse(line) match {
            case Some(o: JObject) => o.get("protocol").foreach {
              case pr: JObject => pr.get("writerFeatures").foreach {
                case JArray(xs) =>
                  feats = xs.collect { case JString(x) => x }.toSet
                case _ => ok = false
              }
              case _ => ok = false
            }
            case _ => ok = false
          }
        }
    }
    if (ok && feats.subsetOf(supported)) Some(()) else None
  }

  final case class RtState(rows: Seq[(Long, Long, Long)],
                           highWaterMark: Long, maxVersion: Long)

  /** Mutable row-tracking replay state: the feature gate, the
    * high-water mark, and the live path -> (baseRowId, deletion
    * vector descriptor) map.
    */
  private final class RtAccum {
    var hasFeature = false
    var hwm = -1L
    val live = scala.collection.mutable.LinkedHashMap
      .empty[String, (Option[Long], Option[Json.JObject])]
    var ok = true
  }

  /** Apply one JSON commit line to the accumulator (the single rule
    * both the full-log replay and the checkpoint-tail replay share).
    */
  private def applyRtLine(line: String, acc: RtAccum): Unit = {
    import Json.{JArray, JLong, JObject, JString}
    Json.parse(line) match {
      case Some(o: JObject) =>
        o.get("protocol").foreach {
          case pr: JObject => pr.get("writerFeatures").foreach {
            case JArray(xs) => acc.hasFeature = xs.exists {
              case JString("rowTracking") => true
              case _ => false
            }
            case _ => acc.ok = false
          }
          case _ => acc.ok = false
        }
        o.get("domainMetadata").foreach {
          case dm: JObject =>
            (dm.get("domain"), dm.get("configuration")) match {
              case (Some(JString(RowTrackingDomain)),
                Some(JString(cfg))) =>
                Json.parse(cfg) match {
                  case Some(co: JObject) =>
                    co.get("rowIdHighWaterMark") match {
                      case Some(JLong(x)) => acc.hwm = x
                      case _ => acc.ok = false
                    }
                  case _ => acc.ok = false
                }
              case (Some(JString(_)), Some(JString(_))) => ()
              case _ => acc.ok = false
            }
          case _ => acc.ok = false
        }
        o.get("add").foreach {
          case a: JObject => a.get("path") match {
            case Some(JString(x)) =>
              acc.live(x) = (a.get("baseRowId").collect {
                case JLong(b) => b },
                a.get("deletionVector").collect {
                  case d: JObject => d })
            case _ => acc.ok = false
          }
          case _ => acc.ok = false
        }
        o.get("remove").foreach {
          case r: JObject => r.get("path") match {
            case Some(JString(x)) => acc.live.remove(x)
            case _ => acc.ok = false
          }
          case _ => acc.ok = false
        }
      case _ => acc.ok = false
    }
  }

  /** Resolve one add's deletion-vector descriptor to its dead
    * positions (inline z85 or `u`-storage file slice — the q340
    * shapes). None on any malformed descriptor or byte.
    */
  private def rtDeadPositions(files: Map[String, Array[Byte]],
                              d: Json.JObject): Option[Set[Long]] = {
    import Json.{JLong, JString}
    val D = DeletionVectors
    def js(k: String) = d.get(k).collect { case JString(v) => v }
    def jl(k: String) = d.get(k).collect { case JLong(v) => v }
    for {
      st <- js("storageType")
      pod <- js("pathOrInlineDv")
      size <- jl("sizeInBytes")
      card <- jl("cardinality")
      vals <- st match {
        case "i" => D.inlineBitmap(pod, size, card)
        case "u" =>
          for {
            off <- jl("offset")
            name <- D.uuidPath(pod)
            fb <- files.get(name)
            data <- D.fileSlice(fb, off, size)
            bs <- D.bitmap(data)
            if bs.length.toLong == card
          } yield bs
        case _ => None
      }
    } yield vals.toSet
  }

  /** True when any LIVE add of the replayed log still carries a
    * deletionVector descriptor — rewrites that cannot represent the
    * DV (zorder, checkpoint, clone) refuse on this rather than
    * resurrect dead rows.
    */
  private def rtLiveHasDv(files: Map[String, Array[Byte]]): Boolean = {
    val acc = new RtAccum
    files.keys.toSeq.collect {
      case p @ CommitRe(v) => (v.toLong, p) }.sortBy(_._1)
      .foreach { case (_, p) =>
        new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
          .foreach(applyRtLine(_, acc))
      }
    acc.live.values.exists(_._2.isDefined)
  }

  /** Materialize + validate row-tracking state: decode every live
    * file (materialized `_row_id` wins, else baseRowId + position),
    * then the lineage laws — feature declared, mark known, every id
    * unique and <= the mark.
    */
  private def materializeRt(files: Map[String, Array[Byte]],
                            acc: RtAccum,
                            maxV: Long): Option[RtState] = {
    if (!acc.ok || !acc.hasFeature || acc.hwm < 0) return None
    val per = acc.live.toSeq.map { case (p, (base, dv)) =>
      for {
        b <- files.get(p)
        rs <- Parquet.columnLongs(b, "rec_id")
        vs <- Parquet.columnLongs(b, "val")
        if rs.length == vs.length
        rids <- Parquet.columnLongs(b, "_row_id") match {
          case Some(m) if m.length == rs.length => Some(m.toSeq)
          case Some(_) => None
          case None => base.map(f => rs.indices.map(f + _.toLong))
        }
        // a DV kills by POSITION; surviving ids are untouched —
        // positions (and so ids) are assigned BEFORE the filter
        dead <- dv match {
          case Some(d) => rtDeadPositions(files, d)
          case None => Some(Set.empty[Long])
        }
      } yield rids.indices.collect {
        case i if !dead.contains(i.toLong) =>
          (rids(i), rs(i), vs(i))
      }
    }
    if (per.exists(_.isEmpty)) return None
    val rows = per.flatMap(_.get)
    if (rows.map(_._1).distinct.length != rows.length) return None
    if (rows.exists(_._1 > acc.hwm)) return None
    Some(RtState(rows.sortBy(_._1), acc.hwm, maxV))
  }

  /** Replay a row-tracking table to (row_id, rec_id, val) triples:
    * live adds assign row_id = baseRowId + position, unless the file
    * carries a MATERIALIZED `_row_id` column (a dataChange=false
    * rewrite), which wins per the spec. The high-water mark is the
    * last `delta.rowTracking` domainMetadata. Fails CLOSED when the
    * table does not declare the rowTracking feature (there is no
    * lineage to serve), an add has neither baseRowId nor
    * materialized ids, any id exceeds the mark, or any id
    * duplicates.
    */
  def replayRowTracking(files: Map[String, Array[Byte]])
      : Option[RtState] = {
    val commits = files.keys.toSeq.collect {
      case p @ CommitRe(v) => (v.toLong, p) }.sortBy(_._1)
    if (commits.isEmpty) return None
    val acc = new RtAccum
    commits.foreach { case (_, p) =>
      new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
        .foreach(applyRtLine(_, acc))
    }
    materializeRt(files, acc, commits.last._1)
  }

  final case class ZOrderRtResult(commitName: String,
                                  commit: Array[Byte],
                                  newFiles: Map[String, Array[Byte]],
                                  removed: Seq[String], rows: Long,
                                  newHwm: Long)

  /** OPTIMIZE ZORDER on a row-tracking table: the q381 clustering
    * rewrite, but every rewritten file MATERIALIZES `_row_id` (a
    * single baseRowId cannot represent the interleave — the spec's
    * rewrite rule), so every surviving id is byte-stable. The new
    * adds still claim a fresh id block (baseRowId above the mark,
    * advanced by a new domainMetadata): row ids are NEVER reused,
    * even by rewrites that assign none. All actions
    * dataChange=false.
    */
  def optimizeZOrderRt(files: Map[String, Array[Byte]],
                       nFiles: Int): Option[ZOrderRtResult] =
    rtClusterRewrite(files, nFiles, "zrt",
      (x, y, _) => zInterleave(x, y))

  /** The shared rt-materializing clustering-rewrite core (ZORDER
    * q381/q393 and liquid clustering q412 differ only in the sort
    * key): decode the live set, sort by `sortKey(x, y, val)` (rec_id
    * tie-break), re-split, materialize `_row_id`, claim a fresh id
    * block, commit remove+add all dataChange=false. Refuses DV-
    * carrying live adds and duplicate rec_ids (see optimizeZOrderRt
    * docs for the laws).
    */
  private def rtClusterRewrite(files: Map[String, Array[Byte]],
                               nFiles: Int, tag: String,
                               sortKey: (Long, Long, Long) => Long)
      : Option[ZOrderRtResult] =
    for {
      st <- replayRowTracking(files)
      if nFiles >= 1 && st.rows.nonEmpty
      // a live add still carrying a deletionVector refuses the
      // rewrite outright (the checkpointRt/shallowCloneRt posture):
      // re-decoding its parquet without the DV would resurrect dead
      // rows into a committed zorder layout
      if !rtLiveHasDv(files)
      (liveAdds, maxV) <- replayLive(files)
      decoded <- {
        val per = liveAdds.map { p =>
          for {
            b <- files.get(p)
            rs <- Parquet.columnLongs(b, "rec_id")
            xs <- Parquet.columnLongs(b, "x")
            ys <- Parquet.columnLongs(b, "y")
            vs <- Parquet.columnLongs(b, "val")
            if rs.length == xs.length && rs.length == ys.length &&
              rs.length == vs.length
            rids <- Parquet.columnLongs(b, "_row_id") match {
              case Some(m) if m.length == rs.length => Some(m.toSeq)
              case Some(_) => None
              case None => None // resolved below via st
            }
          } yield rs.indices.map(i =>
            (rids(i), rs(i), xs(i), ys(i), vs(i)))
        }
        // files without materialized ids: join through the replay
        if (per.forall(_.isDefined)) Some(per.flatMap(_.get))
        // rec_id-keyed recovery is only sound when rec_ids are
        // table-wide unique; duplicates would assign wrong ids
        else if (st.rows.map(_._2).distinct.length !=
          st.rows.length) None
        else {
          val byRec = st.rows.map(r => r._2 -> r._1).toMap
          val per2 = liveAdds.map { p =>
            for {
              b <- files.get(p)
              rs <- Parquet.columnLongs(b, "rec_id")
              xs <- Parquet.columnLongs(b, "x")
              ys <- Parquet.columnLongs(b, "y")
              vs <- Parquet.columnLongs(b, "val")
              if rs.length == xs.length && rs.length == ys.length &&
                rs.length == vs.length
              if rs.forall(byRec.contains)
            } yield rs.indices.map(i =>
              (byRec(rs(i)), rs(i), xs(i), ys(i), vs(i)))
          }
          if (per2.exists(_.isEmpty)) None
          else Some(per2.flatMap(_.get))
        }
      }
    } yield {
      val rows = decoded.sortBy(r =>
        (sortKey(r._3, r._4, r._5), r._2))
      val per = math.max(1, (rows.length + nFiles - 1) / nFiles)
      val parts = rows.grouped(per).toSeq
      val names = parts.indices.map(i =>
        f"part-$tag$i%03d-${maxV + 1}%05d.parquet")
      val data = parts.map(p => ParquetWrite.writeInt64(
        Seq("_row_id", "rec_id", "x", "y", "val"),
        p.map(r => Array(r._1, r._2, r._3, r._4, r._5))))
      // fresh (unused) id block for the rewrites: never reuse
      var base = st.highWaterMark + 1L
      val adds = names.zip(data).zip(parts).map {
        case ((n, d), p) =>
          val a = addActionRt(n, d.length.toLong, base, maxV + 1L,
            dataChange = false)
          base += p.length.toLong
          a
      }
      val newHwm = base - 1L
      val commit = (liveAdds.map(removeActionDc(_,
        dataChange = false)) ++ adds :+
        rowIdHighWaterMarkAction(newHwm)).mkString("\n") + "\n"
      ZOrderRtResult(f"_delta_log/${maxV + 1}%020d.json",
        commit.getBytes(Utf8), names.zip(data).toMap, liveAdds,
        rows.length.toLong, newHwm)
    }

  /** SHALLOW CLONE of a row-tracking table: the q386 zero-copy fork,
    * but the clone's commit 0 re-declares every live add WITH its
    * baseRowId (ids are table-independent facts about the rows) and
    * carries the source's protocol gate and high-water mark — an
    * independent replay of the clone assigns EXACTLY the source's
    * ids. None on a source that is not row-tracking or a malformed
    * log.
    */
  def shallowCloneRt(source: Map[String, Array[Byte]],
                     cloneId: String): Option[Map[String, Array[Byte]]] =
    for {
      st <- replayRowTracking(source)
      (liveAdds, _) <- replayLive(source)
      sized <- replayLiveSized(source, st.maxVersion)
      bases <- {
        import Json.{JLong, JObject, JString}
        // recover each live add's declared baseRowId from the log;
        // a live add carrying a DELETION VECTOR refuses the clone —
        // re-declaring it without the DV would resurrect dead rows
        val m = scala.collection.mutable.Map
          .empty[String, (Option[Long], Boolean)]
        var ok = true
        source.keys.toSeq.collect {
          case p @ CommitRe(v) => (v.toLong, p) }.sortBy(_._1)
          .foreach { case (_, p) =>
            new String(source(p), Utf8).split("\n")
              .filter(_.nonEmpty).foreach { line =>
                Json.parse(line) match {
                  case Some(o: JObject) => o.get("add").foreach {
                    case a: JObject => a.get("path") match {
                      case Some(JString(x)) =>
                        m(x) = (a.get("baseRowId").collect {
                          case JLong(b) => b },
                          a.get("deletionVector").isDefined)
                      case _ => ok = false
                    }
                    case _ => ok = false
                  }
                  case _ => ()
                }
              }
          }
        if (ok && !liveAdds.exists(p => m.get(p).exists(_._2)))
          Some(m.view.mapValues(_._1).toMap)
        else None
      }
    } yield {
      val adds = liveAdds.sorted.map { p =>
        bases.getOrElse(p, None) match {
          case Some(b) => addActionRt(p, sized(p), b,
            0L, dataChange = true)
          case None => addAction(p, sized(p))
        }
      }
      val c0 = (Seq(protocolActionRowTracking,
        metaDataAction(cloneId)) ++ adds :+
        rowIdHighWaterMarkAction(st.highWaterMark))
        .mkString("\n") + "\n"
      Map("_delta_log/00000000000000000000.json" -> c0.getBytes(Utf8))
    }

  // ---- liquid clustering (q412) --------------------------------------------

  /** Liquid clustering's protocol gate: writer feature
    * `clusteredTable` on top of the row-tracking pair — a classic
    * writer MUST refuse (appends that ignore the clustering domain
    * would silently degrade the layout); readers stay classic
    * (minReaderVersion 1 — the data is still just parquet).
    */
  val protocolActionClustered: String =
    """{"protocol": {"minReaderVersion": 1, "minWriterVersion": 7, "writerFeatures": ["clusteredTable", "domainMetadata", "rowTracking"]}}"""

  /** The clustering domain: its configuration carries the
    * clustering column PATHS (`[["x"], ["y"]]` — each path an array
    * of name parts; this writer supports depth-1 paths).
    */
  val ClusteringDomain = "delta.clustering"

  def clusteringDomainAction(cols: Seq[String]): String =
    domainMetadataAction(ClusteringDomain,
      s"""{"clusteringColumns": [${
        cols.map(c => s"""["$c"]""").mkString(", ")}]}""")

  /** The writer features the table's protocol (last wins) declares;
    * empty when it declares none or the log is malformed.
    */
  def declaredWriterFeatures(files: Map[String, Array[Byte]])
      : Set[String] = {
    import Json.{JArray, JObject, JString}
    var feats = Set.empty[String]
    files.keys.toSeq.collect {
      case p @ CommitRe(v) => (v.toLong, p) }.sortBy(_._1)
      .foreach { case (_, p) =>
        new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
          .foreach { line =>
            Json.parse(line) match {
              case Some(o: JObject) => o.get("protocol").foreach {
                case pr: JObject =>
                  pr.get("writerFeatures").foreach {
                    case JArray(xs) =>
                      feats = xs.collect {
                        case JString(x) => x }.toSet
                    case _ => ()
                  }
                case _ => ()
              }
              case _ => ()
            }
          }
      }
    feats
  }

  /** The clustering columns the table currently declares (the LAST
    * `delta.clustering` domainMetadata wins — changing them is a
    * metadata-only commit). None when the domain is absent, a path
    * is nested, or the configuration is malformed — a rewrite must
    * never guess what to cluster by.
    */
  def parseClusteringColumns(files: Map[String, Array[Byte]])
      : Option[Seq[String]] = {
    import Json.{JArray, JObject, JString}
    var cols: Option[Seq[String]] = None
    var ok = true
    files.keys.toSeq.collect {
      case p @ CommitRe(v) => (v.toLong, p) }.sortBy(_._1)
      .foreach { case (_, p) =>
        new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
          .foreach { line =>
            Json.parse(line) match {
              case Some(o: JObject) =>
                o.get("domainMetadata").foreach {
                  case dm: JObject =>
                    (dm.get("domain"), dm.get("configuration"))
                      match {
                      case (Some(JString(ClusteringDomain)),
                        Some(JString(cfg))) =>
                        Json.parse(cfg) match {
                          case Some(co: JObject) =>
                            co.get("clusteringColumns") match {
                              case Some(JArray(xs)) =>
                                val parsed = xs.map {
                                  case JArray(ys)
                                    if ys.length == 1 =>
                                    ys.head match {
                                      case JString(c) => Some(c)
                                      case _ => None
                                    }
                                  case _ => None
                                }
                                if (parsed.exists(_.isEmpty))
                                  ok = false
                                else cols = Some(parsed.flatten)
                              case _ => ok = false
                            }
                          case _ => ok = false
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          }
      }
    if (ok) cols else None
  }

  /** The q412 table: the row-tracking table (q393) upgraded to a
    * CLUSTERED table — commit 0 swaps in the clusteredTable
    * protocol and declares the clustering domain on (x, y). The
    * initial layout is deliberately UNclustered ((d/6)-striped, so
    * per-file x/y bounds are full-range stripes) — the win is what
    * [[optimizeCluster]] must then measure.
    */
  def writeClusteredTable(id: String,
                          ids: Seq[Long]): Map[String, Array[Byte]] = {
    val base = writeRowTrackingTable(id, ids)
    val c0p = "_delta_log/00000000000000000000.json"
    val lines = new String(base(c0p), Utf8).split("\n").toSeq
    val upgraded = (protocolActionClustered +:
      clusteringDomainAction(Seq("x", "y")) +:
      lines.filterNot(_.contains("\"protocol\"")))
      .mkString("\n") + "\n"
    base + (c0p -> upgraded.getBytes(Utf8))
  }

  /** OPTIMIZE on a liquid-clustered table: the clustering columns
    * come from the DOMAIN (never a caller argument — the table owns
    * its layout declaration); one column sorts directly, two
    * interleave (Morton), deeper is refused in this writer. The
    * rewrite is the rt-materializing core shared with ZORDER: ids
    * byte-stable, fresh block claimed, dataChange=false throughout,
    * DV-carrying or duplicate-rec live sets refused. None when the
    * table does not declare `clusteredTable` or the domain is
    * absent/malformed.
    */
  def optimizeCluster(files: Map[String, Array[Byte]],
                      nFiles: Int): Option[ZOrderRtResult] = {
    val feats = declaredWriterFeatures(files)
    if (!feats.contains("clusteredTable")) return None
    parseClusteringColumns(files).flatMap { cols =>
      if (cols.isEmpty || cols.length > 2 ||
        !cols.forall(Set("x", "y", "val"))) None
      else {
        def dim(c: String, x: Long, y: Long, v: Long): Long =
          c match { case "x" => x; case "y" => y; case _ => v }
        val key: (Long, Long, Long) => Long =
          if (cols.length == 1)
            (x, y, v) => dim(cols.head, x, y, v)
          else
            (x, y, v) => zInterleave(dim(cols(0), x, y, v),
              dim(cols(1), x, y, v))
        rtClusterRewrite(files, nFiles, "lc", key)
      }
    }
  }

  // ---- row-tracking CHECKPOINT (q401) --------------------------------------

  final case class CkptActRt(addPath: String = null,
                             addSize: Long = -1L,
                             baseRowId: Long = -1L, drcv: Long = -1L,
                             removePath: String = null,
                             metaId: String = null,
                             minReader: Long = -1L,
                             minWriter: Long = -1L,
                             writerFeaturesJson: String = null,
                             domain: String = null,
                             domainConfig: String = null)

  /** Serialize ROW-TRACKING checkpoint rows: the classic kinds plus
    * add.baseRowId / add.defaultRowCommitVersion, the protocol's
    * writerFeatures (the gate must survive checkpointing), and the
    * domainMetadata action carrying the high-water mark — without
    * it a post-vacuum reader has no mark and lineage dies with the
    * JSON. Read back by [[DeltaCheckpoint.parseRt]].
    */
  def writeCheckpointRt(acts: Seq[CkptActRt]): Array[Byte] = {
    require(acts.nonEmpty && acts.length <= (1 << 16))
    val W = ParquetWrite
    val fields = Seq(
      W.Group("protocol", 1, Seq(
        W.Leaf("minReaderVersion", 1, 2),
        W.Leaf("minWriterVersion", 1, 2),
        W.Leaf("writerFeaturesJson", 1, 6, convertedType = 0))),
      W.Group("metaData", 1,
        Seq(W.Leaf("id", 1, 6, convertedType = 0))),
      W.Group("add", 1, Seq(
        W.Leaf("path", 1, 6, convertedType = 0),
        W.Leaf("size", 1, 2),
        W.Leaf("baseRowId", 1, 2),
        W.Leaf("defaultRowCommitVersion", 1, 2))),
      W.Group("remove", 1,
        Seq(W.Leaf("path", 1, 6, convertedType = 0))),
      W.Group("domainMetadata", 1, Seq(
        W.Leaf("domain", 1, 6, convertedType = 0),
        W.Leaf("configuration", 1, 6, convertedType = 0))))
    def defs(present: CkptActRt => Boolean,
             has: CkptActRt => Boolean): Array[Int] =
      acts.map(a => if (!present(a)) 0
      else if (has(a)) 2 else 1).toArray
    val isProto = (a: CkptActRt) => a.minReader >= 0
    val isAdd = (a: CkptActRt) => a.addPath != null
    val isDm = (a: CkptActRt) => a.domain != null
    W.writeFile(fields, Seq(
      W.LeafData(defs(isProto, _.minReader >= 0), null,
        longs = acts.filter(isProto).map(_.minReader).toArray),
      W.LeafData(defs(isProto, _.minWriter >= 0), null,
        longs = acts.filter(a => isProto(a) && a.minWriter >= 0)
          .map(_.minWriter).toArray),
      W.LeafData(defs(isProto, _.writerFeaturesJson != null), null,
        bins = acts.collect {
          case a if isProto(a) && a.writerFeaturesJson != null =>
            a.writerFeaturesJson.getBytes(Utf8)
        }.toArray),
      W.LeafData(acts.map(a => if (a.metaId != null) 2 else 0)
        .toArray, null, bins = acts.collect {
          case a if a.metaId != null => a.metaId.getBytes(Utf8)
        }.toArray),
      W.LeafData(defs(isAdd, _.addPath != null), null,
        bins = acts.filter(isAdd)
          .map(_.addPath.getBytes(Utf8)).toArray),
      W.LeafData(defs(isAdd, _.addSize >= 0), null,
        longs = acts.filter(a => isAdd(a) && a.addSize >= 0)
          .map(_.addSize).toArray),
      W.LeafData(defs(isAdd, _.baseRowId >= 0), null,
        longs = acts.filter(a => isAdd(a) && a.baseRowId >= 0)
          .map(_.baseRowId).toArray),
      W.LeafData(defs(isAdd, _.drcv >= 0), null,
        longs = acts.filter(a => isAdd(a) && a.drcv >= 0)
          .map(_.drcv).toArray),
      W.LeafData(acts.map(a => if (a.removePath != null) 2 else 0)
        .toArray, null, bins = acts.collect {
          case a if a.removePath != null =>
            a.removePath.getBytes(Utf8)
        }.toArray),
      W.LeafData(defs(isDm, _.domain != null), null,
        bins = acts.filter(isDm)
          .map(_.domain.getBytes(Utf8)).toArray),
      W.LeafData(defs(isDm, _.domainConfig != null), null,
        bins = acts.collect {
          case a if isDm(a) && a.domainConfig != null =>
            a.domainConfig.getBytes(Utf8)
        }.toArray)))
  }

  /** CHECKPOINT a row-tracking table at `version`: collapse the log
    * into checkpoint rows — protocol (feature gate preserved),
    * metaData, one add per live file WITH its declared baseRowId and
    * defaultRowCommitVersion, and the high-water-mark domain action.
    * Returns (checkpointName, bytes, lastCheckpointBody). None when
    * the table is not row-tracking or the log is malformed.
    */
  def checkpointRt(files: Map[String, Array[Byte]], version: Long)
      : Option[(String, Array[Byte], String)] = {
    import Json.{JLong, JObject, JString}
    val commits = files.keys.toSeq.collect {
      case p @ CommitRe(v) if v.toLong <= version => (v.toLong, p)
    }.sortBy(_._1)
    if (commits.isEmpty || commits.last._1 != version) return None
    val acc = new RtAccum
    var metaId: String = null
    val sized = scala.collection.mutable.LinkedHashMap
      .empty[String, Long]
    val drcvs = scala.collection.mutable.Map.empty[String, Long]
    commits.foreach { case (_, p) =>
      new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
        .foreach { line =>
          applyRtLine(line, acc)
          Json.parse(line).foreach {
            case o: JObject =>
              o.get("metaData").foreach {
                case m: JObject => m.get("id").foreach {
                  case JString(x) => metaId = x
                  case _ => acc.ok = false
                }
                case _ => acc.ok = false
              }
              o.get("add").foreach {
                case a: JObject =>
                  (a.get("path"), a.get("size")) match {
                    case (Some(JString(x)), Some(JLong(sz))) =>
                      sized(x) = sz
                      a.get("defaultRowCommitVersion").foreach {
                        case JLong(v) => drcvs(x) = v
                        case _ => acc.ok = false
                      }
                    case _ => acc.ok = false
                  }
                case _ => acc.ok = false
              }
            case _ => ()
          }
        }
    }
    if (!acc.ok || !acc.hasFeature || acc.hwm < 0 ||
      metaId == null) return None
    val acts = Seq(
      CkptActRt(minReader = 1L, minWriter = 7L,
        writerFeaturesJson =
          """["domainMetadata", "rowTracking"]"""),
      CkptActRt(metaId = metaId),
      CkptActRt(domain = RowTrackingDomain,
        domainConfig =
          s"""{"rowIdHighWaterMark": ${acc.hwm}}""")) ++
      acc.live.toSeq.sortBy(_._1).map { case (p, (base, dv)) =>
        // the rt checkpoint shape carries no DV struct: refuse to
        // checkpoint a DV-carrying live set rather than silently
        // resurrect its dead rows (fail closed)
        if (dv.isDefined) return None
        CkptActRt(addPath = p, addSize = sized(p),
          baseRowId = base.getOrElse(-1L),
          drcv = drcvs.getOrElse(p, -1L))
      }
    val ckpt = writeCheckpointRt(acts)
    Some((f"_delta_log/$version%020d.checkpoint.parquet", ckpt,
      lastCheckpointJson(version, acts.length.toLong)))
  }

  /** Replay row tracking FROM THE CHECKPOINT + JSON tail — the read
    * a post-vacuum table gets: `_last_checkpoint` names the version,
    * [[DeltaCheckpoint.parseRt]] seeds the state (feature gate,
    * high-water mark, live adds with their id blocks), JSON commits
    * AFTER it replay on top, and the same lineage laws validate.
    * Must equal [[replayRowTracking]] of the full log — and still
    * work when every pre-checkpoint JSON commit is GONE. Fails
    * CLOSED when the checkpoint lacks the mark or the gate.
    */
  def replayRowTrackingCkpt(files: Map[String, Array[Byte]])
      : Option[RtState] = {
    import Json.{JLong, JObject}
    for {
      lc <- files.get("_delta_log/_last_checkpoint")
      j <- Json.parse(new String(lc, Utf8).trim)
      o <- j match { case x: JObject => Some(x); case _ => None }
      ver <- o.get("version").collect { case JLong(x) => x }
      ckpt <- files.get(f"_delta_log/$ver%020d.checkpoint.parquet")
      rows <- DeltaCheckpoint.parseRt(ckpt)
      acc <- {
        val a = new RtAccum
        rows.foreach { r =>
          if (r.writerFeaturesJson != null &&
            r.writerFeaturesJson.contains("\"rowTracking\""))
            a.hasFeature = true
          if (r.domain == RowTrackingDomain &&
            r.domainConfig != null) {
            Json.parse(r.domainConfig) match {
              case Some(co: JObject) =>
                co.get("rowIdHighWaterMark") match {
                  case Some(JLong(x)) => a.hwm = x
                  case _ => a.ok = false
                }
              case _ => a.ok = false
            }
          }
          if (r.addPath != null)
            a.live(r.addPath) =
              (if (r.baseRowId >= 0) Some(r.baseRowId) else None,
                None)
          if (r.removePath != null) a.live.remove(r.removePath)
        }
        if (a.ok) Some(a) else None
      }
      maxV <- {
        val tail = files.keys.toSeq.collect {
          case p @ CommitRe(v) if v.toLong > ver => (v.toLong, p)
        }.sortBy(_._1)
        tail.foreach { case (_, p) =>
          new String(files(p), Utf8).split("\n").filter(_.nonEmpty)
            .foreach(applyRtLine(_, acc))
        }
        Some(tail.lastOption.map(_._1).getOrElse(ver))
      }
      st <- materializeRt(files, acc, maxV)
    } yield st
  }

  // ---- column mapping write (q360) -----------------------------------------

  /** Deterministic physical name for logical field `i` of table `id`
    * — derived, never hardcodable (q280's fixture discipline).
    */
  def physName(id: String, i: Int): String =
    "col-" + java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$i".getBytes(Utf8))
      .map("%02x".format(_)).mkString.substring(0, 12)

  /** Column-mapping protocol: reader 2 / writer 5 (PROTOCOL.md
    * "Column Mapping").
    */
  val protocolActionColMap: String =
    """{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}"""

  /** metaData with delta.columnMapping.mode=name: every field carries
    * its columnMapping id + physicalName in the schemaString
    * metadata; data files use the PHYSICAL names.
    */
  def metaDataActionColMap(id: String,
                           logical: Seq[String]): String = {
    val fields = logical.zipWithIndex.map { case (ln, i) =>
      s"""{"metadata": {"delta.columnMapping.id": ${i + 1}, "delta.columnMapping.physicalName": "${physName(id, i)}"}, "name": "$ln", "nullable": false, "type": "long"}"""
    }.mkString(", ")
    val schema = s"""{"fields": [$fields], "type": "struct"}"""
    s"""{"metaData": {"configuration": {"delta.columnMapping.maxColumnId": "${logical.length}", "delta.columnMapping.mode": "name"}, "createdTime": 1700000000000, "format": {"options": {}, "provider": "parquet"}, "id": "$id", "partitionColumns": [], "schemaString": "${esc(schema)}"}}"""
  }

  /** The q360 table: three data files split by (d/6) % 3, columns
    * WRITTEN UNDER PHYSICAL NAMES (a logical-name parquet read finds
    * nothing — the failure mode column mapping creates), val =
    * (d*43) % 1009. Commit 1 RENAMES the first logical column
    * (rec_id -> record_id) by re-issuing metaData ONLY — zero data
    * files touched, the rename-without-rewrite the feature exists
    * for.
    */
  def writeColMapTable(id: String,
                       ids: Seq[Long]): Map[String, Array[Byte]] = {
    val parts = (0 to 2).map(x => ids.filter(d => (d / 6) % 3 == x))
    val names = (0 to 2).map(x => s"part-$x.parquet")
    val phys = Seq(physName(id, 0), physName(id, 1))
    val data = parts.map(p => ParquetWrite.writeInt64(
      phys, p.map(d => Array(d, (d * 43) % 1009))))
    val c0 = (Seq(protocolActionColMap,
      metaDataActionColMap(id, Seq("rec_id", "val"))) ++
      (0 to 2).map(x => addAction(names(x), data(x).length.toLong)))
      .mkString("\n") + "\n"
    val c1 = metaDataActionColMap(id, Seq("record_id", "val")) + "\n"
    Map(
      "_delta_log/00000000000000000000.json" -> c0.getBytes(Utf8),
      "_delta_log/00000000000000000001.json" -> c1.getBytes(Utf8)) ++
      names.zip(data)
  }

  // ---- row-level MERGE write with CDF emission (q352) ----------------------

  /** metaData carrying `delta.enableChangeDataFeed=true` — the gate
    * the CDF reader (q282) checks before synthesizing any feed.
    */
  def metaDataActionCdf(id: String): String =
    s"""{"metaData": {"configuration": {"delta.enableChangeDataFeed": "true"}, "createdTime": 1700000000000, "format": {"options": {}, "provider": "parquet"}, "id": "$id", "partitionColumns": [], "schemaString": "${esc(SchemaString)}"}}"""

  /** AddCDCFile (delta PROTOCOL.md "Add CDC File"): dataChange MUST
    * be false — CDF readers select cdc files by PRESENCE in a commit,
    * never by the dataChange flag of the rewritten adds.
    */
  def cdcAction(path: String, size: Long): String =
    s"""{"cdc": {"dataChange": false, "partitionValues": {}, "path": "$path", "size": $size}}"""

  /** The q352 base table: CDF enabled from v0, three data files split
    * by (d/6) % 3, val = (d*11) % 1000 (q299's formula), every byte
    * through the engine's own parquet writer.
    */
  def writeCdfTable(id: String,
                    ids: Seq[Long]): Map[String, Array[Byte]] = {
    val parts = (0 to 2).map(x => ids.filter(d => (d / 6) % 3 == x))
    val names = (0 to 2).map(x => s"part-$x.parquet")
    val data = parts.map(p => ParquetWrite.writeInt64(
      Seq("rec_id", "val"), p.map(d => Array(d, (d * 11) % 1000))))
    val c0 = (Seq(protocolAction, metaDataActionCdf(id)) ++
      (0 to 2).map(x => addAction(names(x), data(x).length.toLong)))
      .mkString("\n") + "\n"
    Map("_delta_log/00000000000000000000.json" ->
      c0.getBytes(Utf8)) ++ names.zip(data)
  }

  /** One cdc parquet — (rec_id, val, _change_type) through the own
    * writer; the change-type column is BYTE_ARRAY/UTF8,
    * dictionary-encoded (≤4 distinct values by construction).
    */
  def writeCdcParquet(rows: Seq[(Long, Long, String)]): Array[Byte] = {
    val W = ParquetWrite
    val n = rows.length
    W.writeFile(
      Seq(W.Leaf("rec_id", 0, 2), W.Leaf("val", 0, 2),
        W.Leaf("_change_type", 0, 6, convertedType = 0)),
      Seq(
        W.LeafData(Array.fill(n)(0), null,
          longs = rows.map(_._1).toArray),
        W.LeafData(Array.fill(n)(0), null,
          longs = rows.map(_._2).toArray),
        W.LeafData(Array.fill(n)(0), null,
          bins = rows.map(_._3.getBytes(Utf8)).toArray, dict = true)))
  }

  final case class MergeResult(commitName: String,
                               commit: Array[Byte],
                               files: Map[String, Array[Byte]],
                               removed: Seq[String], cdcName: String,
                               nUpd: Long, nDel: Long, nIns: Long,
                               nTouched: Long)

  /** Row-level MERGE as a WRITE operation — the lakehouse twin of the
    * reference's SCD price upsert (database_utils.py:260-280): replay
    * the log to the live set, rewrite ONLY the files containing a
    * matched key (remove + add, dataChange=true), land inserts in one
    * new file, and emit the change rows as a `_change_data/` cdc
    * parquet (insert / update_preimage / update_postimage / delete)
    * referenced by an AddCDCFile action in the SAME commit — so a CDF
    * reader replays exactly the merge delta while a snapshot reader
    * never double-counts the rewrites. None on malformed bytes or a
    * violated MERGE precondition (update/delete key absent, insert
    * key present, update ∩ delete nonempty).
    */
  def mergeCdf(files: Map[String, Array[Byte]],
               updates: Map[Long, Long], deletes: Set[Long],
               inserts: Seq[(Long, Long)]): Option[MergeResult] =
    replayLive(files).flatMap { case (live, maxV) =>
      val v = maxV + 1
      val decoded = live.map { p =>
        for {
          b <- files.get(p)
          rs <- Parquet.columnLongs(b, "rec_id")
          vs <- Parquet.columnLongs(b, "val")
          if rs.length == vs.length
        } yield rs.toSeq.zip(vs.toSeq)
      }
      if (decoded.exists(_.isEmpty)) None
      else {
        val withRows = live.zip(decoded.map(_.get))
        val baseKeys = withRows.flatMap(_._2.map(_._1)).toSet
        if (updates.keySet.exists(!baseKeys(_)) ||
          deletes.exists(!baseKeys(_)) ||
          inserts.exists(i => baseKeys(i._1)) ||
          (updates.keySet & deletes).nonEmpty) None
        else {
          val touched = withRows.filter { case (_, rows) =>
            rows.exists(r => updates.contains(r._1) || deletes(r._1))
          }
          val cdc =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
          var idx = 0
          val rewritten = touched.flatMap { case (_, rows) =>
            val kept = rows.flatMap { case (k, old) =>
              if (deletes(k)) { cdc += ((k, old, "delete")); None }
              else updates.get(k) match {
                case Some(nv) =>
                  cdc += ((k, old, "update_preimage"))
                  cdc += ((k, nv, "update_postimage"))
                  Some((k, nv))
                case None => Some((k, old))
              }
            }
            idx += 1
            if (kept.isEmpty) None
            else Some((f"part-m$v%05d-${idx - 1}.parquet",
              ParquetWrite.writeInt64(Seq("rec_id", "val"),
                kept.map(r => Array(r._1, r._2)))))
          }
          val insSorted = inserts.sortBy(_._1)
          insSorted.foreach { case (k, nv) => cdc += ((k, nv, "insert")) }
          val insFile =
            if (insSorted.isEmpty) None
            else Some((f"part-m$v%05d-ins.parquet",
              ParquetWrite.writeInt64(Seq("rec_id", "val"),
                insSorted.map(r => Array(r._1, r._2)))))
          val cdcName = f"_change_data/cdc-$v%05d.parquet"
          val cdcBytes = writeCdcParquet(cdc.toSeq)
          val commit = (touched.map(t => removeAction(t._1)) ++
            rewritten.map { case (n2, b) =>
              addAction(n2, b.length.toLong) } ++
            insFile.map { case (n2, b) =>
              addAction(n2, b.length.toLong) } ++
            Seq(cdcAction(cdcName, cdcBytes.length.toLong)))
            .mkString("\n") + "\n"
          Some(MergeResult(f"_delta_log/$v%020d.json",
            commit.getBytes(Utf8),
            rewritten.toMap ++ insFile.toMap + (cdcName -> cdcBytes),
            touched.map(_._1), cdcName,
            updates.size.toLong, deletes.size.toLong,
            insSorted.length.toLong, touched.length.toLong))
        }
      }
    }
}
