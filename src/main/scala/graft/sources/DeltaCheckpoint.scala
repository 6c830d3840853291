package graft.sources

/** Delta-Lake checkpoint parquet assembly (public PROTOCOL.md,
  * github.com/delta-io/delta, "Checkpoints"): every N commits the
  * writer collapses the JSON log into `<version>.checkpoint.parquet` —
  * one row per live action (protocol / metaData / add / remove
  * tombstone) — and points `_delta_log/_last_checkpoint` at it. Old
  * JSON is then vacuumed, so a reader that replays JSON from version 0
  * (q254's shape) breaks on any table old enough to have been cleaned;
  * the correct read starts from the checkpoint state and applies only
  * JSON commits after it (q261).
  *
  * This module turns checkpoint bytes into action rows using the
  * engine's own byte-level parquet reader ([[Parquet.readChunkCells]]):
  * nested-STRUCT leaves (`add.path`, `add.size`, `remove.path`,
  * `metaData.id`, `protocol.minReaderVersion`) are flat chunks at
  * maxDef > 1, and `add.partitionValues` is the 3-level MAP layout —
  * key/value leaves under one repeated group, reassembled per row from
  * repetition levels (rep == 0 starts a record; Dremel striping per
  * the parquet format spec). Cross-leaf row counts must agree — the
  * same slot-accounting law the flat reader holds.
  *
  * Totality law (the house posture): any malformation — a leaf
  * missing from the footer, slot counts disagreeing with the row
  * group's numRows, a key slot without its entry, leftover present
  * values — yields None, never a throw and never partial garbage.
  */
object DeltaCheckpoint {

  /** One checkpoint row. Exactly one of the action groups is non-null
    * in a well-formed checkpoint; fields of absent groups are
    * null / -1.
    */
  final case class Act(addPath: String, addSize: Long,
                       addParts: Map[String, String],
                       removePath: String, metaId: String,
                       minReader: Long)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val MaxRows = 1 << 20 // checkpoints are metadata-sized

  /** Decode a complete checkpoint file into its action rows, in row
    * order across row groups.
    */
  def parse(b: Array[Byte]): Option[Vector[Act]] = {
    val fm = Parquet.parseFooter(b).getOrElse(return None)
    val levels = fm.leafLevels
    val out = Vector.newBuilder[Act]
    for (rg <- fm.rowGroups) {
      if (rg.numRows < 0 || rg.numRows > MaxRows) return None
      val n = rg.numRows.toInt

      def cells(path: String): Option[(Parquet.ChunkCells, Int)] =
        for {
          c <- rg.cols.find(_.path == path)
          dr <- levels.get(path)
          cc <- Parquet.readChunkCells(b, c, dr._1, dr._2)
        } yield (cc, dr._1)

      def strCol(path: String): Option[Array[String]] =
        cells(path).flatMap { case (cc, d) => scalarStrings(cc, d, n) }
      def longCol(path: String): Option[Array[Long]] =
        cells(path).flatMap { case (cc, d) => scalarLongs(cc, d, n) }

      val addPath = strCol("add.path").getOrElse(return None)
      val addSize = longCol("add.size").getOrElse(return None)
      val remPath = strCol("remove.path").getOrElse(return None)
      val metaId = strCol("metaData.id").getOrElse(return None)
      val minReader = longCol("protocol.minReaderVersion")
        .getOrElse(return None)
      val parts = (for {
        (kc, kDef) <- cells("add.partitionValues.key_value.key")
        (vc, vDef) <- cells("add.partitionValues.key_value.value")
        m <- mapRows(kc, vc, kDef, vDef, n)
      } yield m).getOrElse(return None)

      var i = 0
      while (i < n) {
        out += Act(
          addPath(i),
          if (addPath(i) != null) addSize(i) else -1L,
          if (addPath(i) != null) parts(i) else null,
          remPath(i), metaId(i), minReader(i))
        i += 1
      }
    }
    Some(out.result())
  }

  /** One v2 checkpoint-MANIFEST row (PROTOCOL.md "V2 Checkpoints"):
    * exactly one group populated — protocol (with the reader
    * features the table gates on), metaData, checkpointMetadata
    * (the manifest's self-describing version), or one sidecar
    * reference. Fields of absent groups are null / -1.
    */
  final case class V2Act(minReader: Long, readerFeaturesJson: String,
                         metaId: String, ckptVersion: Long,
                         sidecarPath: String, sidecarSize: Long)

  /** Decode a v2 checkpoint manifest into its action rows. Same
    * byte-level walk and totality posture as [[parse]].
    */
  def parseV2Manifest(b: Array[Byte]): Option[Vector[V2Act]] = {
    val fm = Parquet.parseFooter(b).getOrElse(return None)
    val levels = fm.leafLevels
    val out = Vector.newBuilder[V2Act]
    for (rg <- fm.rowGroups) {
      if (rg.numRows < 0 || rg.numRows > MaxRows) return None
      val n = rg.numRows.toInt
      def cells(path: String): Option[(Parquet.ChunkCells, Int)] =
        for {
          c <- rg.cols.find(_.path == path)
          dr <- levels.get(path)
          cc <- Parquet.readChunkCells(b, c, dr._1, dr._2)
        } yield (cc, dr._1)
      def strCol(path: String): Option[Array[String]] =
        cells(path).flatMap { case (cc, d) => scalarStrings(cc, d, n) }
      def longCol(path: String): Option[Array[Long]] =
        cells(path).flatMap { case (cc, d) => scalarLongs(cc, d, n) }
      val minReader = longCol("protocol.minReaderVersion")
        .getOrElse(return None)
      val features = strCol("protocol.readerFeaturesJson")
        .getOrElse(return None)
      val metaId = strCol("metaData.id").getOrElse(return None)
      val ckptVer = longCol("checkpointMetadata.version")
        .getOrElse(return None)
      val scPath = strCol("sidecar.path").getOrElse(return None)
      val scSize = longCol("sidecar.sizeInBytes")
        .getOrElse(return None)
      var i = 0
      while (i < n) {
        out += V2Act(minReader(i), features(i), metaId(i),
          ckptVer(i), scPath(i),
          if (scPath(i) != null) scSize(i) else -1L)
        i += 1
      }
    }
    Some(out.result())
  }

  /** One ROW-TRACKING checkpoint row (q401): the classic action
    * kinds plus `add.baseRowId` / `add.defaultRowCommitVersion` and
    * the `domainMetadata` action the high-water mark rides —
    * exactly the state a reader needs once the pre-checkpoint JSON
    * is vacuumed. Fields of absent groups are null / -1; an add
    * without a declared baseRowId reads -1 (its file must carry
    * materialized ids).
    */
  final case class RtAct(addPath: String, addSize: Long,
                         baseRowId: Long, drcv: Long,
                         removePath: String, metaId: String,
                         minReader: Long, minWriter: Long,
                         writerFeaturesJson: String,
                         domain: String, domainConfig: String)

  /** Decode a row-tracking checkpoint into its action rows. Same
    * byte-level walk and totality posture as [[parse]].
    */
  def parseRt(b: Array[Byte]): Option[Vector[RtAct]] = {
    val fm = Parquet.parseFooter(b).getOrElse(return None)
    val levels = fm.leafLevels
    val out = Vector.newBuilder[RtAct]
    for (rg <- fm.rowGroups) {
      if (rg.numRows < 0 || rg.numRows > MaxRows) return None
      val n = rg.numRows.toInt
      def cells(path: String): Option[(Parquet.ChunkCells, Int)] =
        for {
          c <- rg.cols.find(_.path == path)
          dr <- levels.get(path)
          cc <- Parquet.readChunkCells(b, c, dr._1, dr._2)
        } yield (cc, dr._1)
      def strCol(path: String): Option[Array[String]] =
        cells(path).flatMap { case (cc, d) => scalarStrings(cc, d, n) }
      def longCol(path: String): Option[Array[Long]] =
        cells(path).flatMap { case (cc, d) => scalarLongs(cc, d, n) }
      val addPath = strCol("add.path").getOrElse(return None)
      val addSize = longCol("add.size").getOrElse(return None)
      val baseRowId = longCol("add.baseRowId").getOrElse(return None)
      val drcv = longCol("add.defaultRowCommitVersion")
        .getOrElse(return None)
      val remPath = strCol("remove.path").getOrElse(return None)
      val metaId = strCol("metaData.id").getOrElse(return None)
      val minReader = longCol("protocol.minReaderVersion")
        .getOrElse(return None)
      val minWriter = longCol("protocol.minWriterVersion")
        .getOrElse(return None)
      val feats = strCol("protocol.writerFeaturesJson")
        .getOrElse(return None)
      val domain = strCol("domainMetadata.domain")
        .getOrElse(return None)
      val config = strCol("domainMetadata.configuration")
        .getOrElse(return None)
      var i = 0
      while (i < n) {
        out += RtAct(addPath(i),
          if (addPath(i) != null) addSize(i) else -1L,
          baseRowId(i), drcv(i), remPath(i), metaId(i),
          minReader(i), minWriter(i), feats(i), domain(i),
          config(i))
        i += 1
      }
    }
    Some(out.result())
  }

  /** One slot per row (rep must be 0 throughout); value where the
    * definition level reaches maxDef, null elsewhere. Present-value
    * accounting must tile exactly.
    */
  private def scalarStrings(cc: Parquet.ChunkCells, maxDef: Int,
                            n: Int): Option[Array[String]] = {
    if (cc.numSlots != n) return None
    val out = new Array[String](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (cc.reps(i) != 0) return None
      if (cc.defs(i) == maxDef) {
        if (k >= cc.bins.length) return None
        out(i) = new String(cc.bins(k), Utf8)
        k += 1
      }
      i += 1
    }
    if (k != cc.bins.length) return None
    Some(out)
  }

  /** Numeric twin of [[scalarStrings]]; absent slots read -1 with the
    * caller gating on its group's presence column.
    */
  private def scalarLongs(cc: Parquet.ChunkCells, maxDef: Int,
                          n: Int): Option[Array[Long]] = {
    if (cc.numSlots != n) return None
    val out = Array.fill(n)(-1L)
    var i = 0
    var k = 0
    while (i < n) {
      if (cc.reps(i) != 0) return None
      if (cc.defs(i) == maxDef) {
        if (k >= cc.longs.length) return None
        out(i) = cc.longs(k)
        k += 1
      }
      i += 1
    }
    if (k != cc.longs.length) return None
    Some(out)
  }

  /** Reassemble a string->string MAP column from its key and value
    * leaves: both stripe identically (same rep structure, one slot
    * per entry, one slot per entry-less row), keys are REQUIRED
    * inside an entry (def == kDef exactly when an entry exists) and
    * values OPTIONAL (vDef == kDef + 1; def == kDef means entry with
    * null value). Rows with no map (group null or empty) get an empty
    * map — the replay treats both the same, as Delta does.
    */
  private def mapRows(kc: Parquet.ChunkCells, vc: Parquet.ChunkCells,
                      kDef: Int, vDef: Int,
                      n: Int): Option[Array[Map[String, String]]] = {
    if (kc.numSlots != vc.numSlots) return None
    if (vDef != kDef + 1) return None
    val out = new Array[Map[String, String]](n)
    var row = -1
    var cur = Map.empty[String, String]
    var i = 0
    var ki = 0
    var vi = 0
    while (i < kc.numSlots) {
      if (kc.reps(i) != vc.reps(i)) return None
      if (kc.reps(i) == 0) {
        if (row >= 0) out(row) = cur
        row += 1
        if (row >= n) return None
        cur = Map.empty
      }
      if (kc.defs(i) == kDef) { // an entry exists
        if (vc.defs(i) < kDef) return None // value leaf must agree
        if (ki >= kc.bins.length) return None
        val key = new String(kc.bins(ki), Utf8)
        ki += 1
        val v =
          if (vc.defs(i) == vDef) {
            if (vi >= vc.bins.length) return None
            val s = new String(vc.bins(vi), Utf8)
            vi += 1
            s
          } else null
        cur += (key -> v)
      } else if (vc.defs(i) != kc.defs(i)) return None
      i += 1
    }
    if (row >= 0) out(row) = cur
    if (row != n - 1) return None
    if (ki != kc.bins.length || vi != vc.bins.length) return None
    Some(out)
  }
}
