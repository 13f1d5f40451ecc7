package graft.sources

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.CRC32

import scala.jdk.CollectionConverters._

import org.roaringbitmap.RoaringBitmap

/** The Delta protocol's DELETION VECTOR storage format (protocol
  * reader version 3, table feature `deletionVectors`): per-file
  * bitmaps of deleted row indexes, stored OUTSIDE the data files so a
  * DELETE touches kilobytes of bitmap instead of rewriting gigabytes
  * of parquet — the Delta spelling of merge-on-read (the
  * [[Iceberg.deleteWhere]] position-delete twin).
  *
  * Everything here is the PUBLIC spec's wire format:
  *
  *  - descriptor (in `add.deletionVector`): `storageType` "u"
  *    (UUID-named file in the table dir, pathOrInlineDv = Z85 of the
  *    16 UUID bytes, offset into the shared file), "p" (absolute
  *    path), or "i" (inline, pathOrInlineDv = Z85 of the data);
  *    `sizeInBytes` = serialized bitmap size; `cardinality` = deleted
  *    row count.
  *  - DV file: 1-byte format version (1), then per DV
  *    [size: 4B big-endian][data][CRC-32 of data: 4B big-endian];
  *    a descriptor's `offset` points at its size field.
  *  - bitmap data: "portable" RoaringBitmapArray — magic 1681511377
  *    (4B little-endian), bitmap count (8B LE), then per 32-bit
  *    bucket its key (4B LE) + the standard portable RoaringBitmap
  *    serialization. A 64-bit row index splits into bucket key (high
  *    32) and member (low 32).
  *  - Z85 (the base85 variant the spec names) for UUIDs/inline data.
  *
  * Scale: deleted rows live as COMPRESSED BITMAPS ([[Bitmap64]])
  * everywhere — built executor-side by the
  * [[graft.functions.RowPosBitmap]] aggregate during a DELETE
  * (driver sees one bitmap row per file, never a position list),
  * unioned/diffed in bitmap space for stacked deletes and CDF, and
  * applied at read time as a broadcast-bitmap `contains` filter on
  * (file, row_index) inside the scan stage
  * ([[graft.functions.DvRowDeleted]]).
  */
private[graft] object DeletionVectors {

  /** `add.deletionVector`, as the log spells it. */
  case class Descriptor(storageType: String, pathOrInlineDv: String,
                        offset: Option[Int], sizeInBytes: Int,
                        cardinality: Long) {
    /** Absolute path of the on-disk DV file ("u"/"p"). */
    def resolvePath(tableDir: String): String = storageType match {
      case "p" => pathOrInlineDv
      case "u" =>
        // last 20 chars are the Z85 UUID; anything before is the
        // spec's optional random prefix (a directory)
        val (prefix, enc) = pathOrInlineDv.splitAt(
          pathOrInlineDv.length - 20)
        val bytes = z85Decode(enc)
        val bb = ByteBuffer.wrap(bytes)
        val uuid = new java.util.UUID(bb.getLong, bb.getLong)
        val name = s"deletion_vector_$uuid.bin"
        if (prefix.isEmpty) s"$tableDir/$name"
        else s"$tableDir/$prefix/$name"
      case other => throw new IllegalArgumentException(
        s"deletion vector storageType '$other' has no file path")
    }
  }

  // ---------------------------------------------------------------
  // Z85 (ZeroMQ base85): 4 bytes <-> 5 chars, big-endian
  // ---------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "Z85 encodes 4-byte groups")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, "Z85 decodes 5-char groups")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Rev(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d; j += 1
      }
      require(v <= 0xffffffffL,
        s"invalid Z85 group '${s.substring(i, i + 5)}': value exceeds " +
          "32 bits — refusing to truncate malformed input")
      var k = 3
      while (k >= 0) {
        out(i / 5 * 4 + (3 - k)) = ((v >>> (k * 8)) & 0xff).toByte
        k -= 1
      }
      i += 5
    }
    out
  }

  // ---------------------------------------------------------------
  // Portable RoaringBitmapArray <-> 64-bit row indexes
  // ---------------------------------------------------------------

  private val PortableMagic = 1681511377

  /** A 64-bit roaring bitmap in the spec's bucketed shape: row index
    * = (bucket key: high 32 bits, member: low 32 bits). This is the
    * working representation EVERYWHERE deleted rows move — building a
    * DV in an executor task, merging partial aggregates, unioning a
    * stacked delete, probing at read time — so memory stays
    * O(compressed bitmap), kilobytes per file, never O(positions) as
    * a materialized `Seq[Long]` would be. Java-serializable
    * (RoaringBitmap is Externalizable), so it rides aggregation
    * buffers and broadcast variables directly. */
  final class Bitmap64 extends Serializable {
    private val buckets =
      new java.util.TreeMap[Integer, RoaringBitmap]()

    def add(pos: Long): Unit = {
      require(pos >= 0, s"negative row index $pos")
      val key = (pos >>> 32).toInt
      var rb = buckets.get(key)
      if (rb == null) { rb = new RoaringBitmap(); buckets.put(key, rb) }
      rb.add((pos & 0xffffffffL).toInt)
    }

    /** In-place union — O(compressed bitmap), the merge step of both
      * the partial aggregate and a stacked DELETE. */
    def or(other: Bitmap64): Unit =
      other.buckets.forEach { (key, rb) =>
        val mine = buckets.get(key)
        if (mine == null) buckets.put(key, rb.clone())
        else mine.or(rb)
      }

    /** New bitmap = this \ other — the row-level CDF delta of a
      * grown DV, computed in bitmap space. */
    def andNot(other: Bitmap64): Bitmap64 = {
      val out = new Bitmap64
      buckets.forEach { (key, rb) =>
        val o = other.buckets.get(key)
        val diff =
          if (o == null) rb.clone() else RoaringBitmap.andNot(rb, o)
        if (!diff.isEmpty) out.buckets.put(key, diff)
      }
      out
    }

    def contains(pos: Long): Boolean = {
      if (pos < 0) return false
      val rb = buckets.get((pos >>> 32).toInt)
      rb != null && rb.contains((pos & 0xffffffffL).toInt)
    }

    def cardinality: Long =
      buckets.values.asScala.map(_.getLongCardinality).sum

    def isEmpty: Boolean = cardinality == 0L

    /** Sorted 64-bit row indexes — tests and the per-file CDF delta
      * path (O(delta) by construction) only; the scan/delete paths
      * never materialize this. */
    def toPositions: Seq[Long] = {
      val out = Seq.newBuilder[Long]
      buckets.forEach { (key, rb) =>
        rb.forEach(new org.roaringbitmap.IntConsumer {
          override def accept(v: Int): Unit =
            out += (key.toLong << 32) | (v.toLong & 0xffffffffL)
        })
      }
      out.result()
    }

    /** The spec's portable RoaringBitmapArray bytes. */
    def serializePortable: Array[Byte] = {
      val maps = buckets.entrySet().asScala.toSeq.map { e =>
        val rb = e.getValue.clone(); rb.runOptimize()
        (e.getKey.intValue(), rb)
      }
      val size = 4 + 8 + maps.map(4 + _._2.serializedSizeInBytes()).sum
      val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(PortableMagic)
      bb.putLong(maps.size.toLong)
      maps.foreach { case (key, rb) =>
        bb.putInt(key)
        val p0 = bb.position()
        rb.serialize(bb)
        // serialize(ByteBuffer) implementations differ on whether the
        // position advances — normalize so the next bucket lands right
        if (bb.position() == p0)
          bb.position(p0 + rb.serializedSizeInBytes())
      }
      require(bb.remaining() == 0, "bitmap size accounting broke")
      bb.array()
    }
  }

  object Bitmap64 {
    def fromPositions(positions: Seq[Long]): Bitmap64 = {
      val bm = new Bitmap64
      positions.foreach(bm.add)
      bm
    }

    /** Decode portable RoaringBitmapArray bytes. */
    def fromPortable(data: Array[Byte]): Bitmap64 = {
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      val magic = bb.getInt
      require(magic == PortableMagic,
        s"deletion-vector bitmap magic $magic is not the portable " +
          s"format ($PortableMagic) — refusing to guess")
      val n = bb.getLong
      require(n >= 0 && n <= Int.MaxValue,
        s"bitmap count $n out of range")
      val bm = new Bitmap64
      var i = 0L
      while (i < n) {
        val key = bb.getInt
        val rb = new RoaringBitmap()
        rb.deserialize(bb)
        // deserialize(ByteBuffer) does not advance the buffer — step
        // past the bitmap's serialized form explicitly
        bb.position(bb.position() + rb.serializedSizeInBytes())
        bm.buckets.put(key, rb)
        i += 1
      }
      bm
    }
  }

  /** Serialize sorted 64-bit row indexes into the spec's portable
    * RoaringBitmapArray bytes. */
  def serializeBitmap(positions: Seq[Long]): Array[Byte] = {
    require(positions.nonEmpty, "a deletion vector must delete rows")
    Bitmap64.fromPositions(positions).serializePortable
  }

  /** Decode portable RoaringBitmapArray bytes into sorted row
    * indexes. */
  def deserializeBitmap(data: Array[Byte]): Seq[Long] =
    Bitmap64.fromPortable(data).toPositions

  // ---------------------------------------------------------------
  // DV file write/read (the shared-file framing)
  // ---------------------------------------------------------------

  /** Write ONE DV file holding one bitmap per entry of `dvs`
    * (data-file path → its deleted-row bitmap) and return the
    * descriptors, keyed back by data-file path. Bitmap-level all the
    * way: the caller hands over [[Bitmap64]]s built executor-side, so
    * no position list is ever materialized on the driver. */
  def writeDvFile(tableDir: String,
                  dvs: Seq[(String, Bitmap64)]): Map[String, Descriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val enc = z85Encode(ub.array())
    val path = Paths.get(tableDir, s"deletion_vector_$uuid.bin")
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // format version
    val descs = dvs.map { case (dataFile, bm) =>
      require(!bm.isEmpty, s"a deletion vector must delete rows " +
        s"(empty bitmap for $dataFile)")
      val offset = out.size()
      val data = bm.serializePortable
      val frame = ByteBuffer.allocate(4 + data.length + 4)
        .order(ByteOrder.BIG_ENDIAN)
      frame.putInt(data.length)
      frame.put(data)
      val crc = new CRC32(); crc.update(data)
      frame.putInt(crc.getValue.toInt)
      out.write(frame.array())
      dataFile -> Descriptor("u", enc, Some(offset), data.length,
        bm.cardinality)
    }.toMap
    Files.write(path, out.toByteArray)
    descs
  }

  /** Read one DV as a [[Bitmap64]] through its descriptor, verifying
    * the frame's size, CRC, and cardinality — a truncated or
    * corrupted bitmap must fail, not silently resurrect rows. */
  def readBitmap(tableDir: String, d: Descriptor): Bitmap64 = {
    val bm = d.storageType match {
      case "i" =>
        // Z85 transports 4-byte groups, so inline data is zero-padded
        // at encode time; the descriptor's sizeInBytes names the true
        // frame length (the spec's inline contract)
        val raw = z85Decode(d.pathOrInlineDv)
        require(raw.length >= d.sizeInBytes,
          s"inline DV decodes ${raw.length} bytes < declared " +
            s"sizeInBytes ${d.sizeInBytes}")
        Bitmap64.fromPortable(
          java.util.Arrays.copyOf(raw, d.sizeInBytes))
      case "u" | "p" =>
        val path = d.resolvePath(tableDir)
        val all = Files.readAllBytes(Paths.get(path))
        require(all.length > 0 && all(0) == 1,
          s"DV file $path has unsupported format version " +
            s"${if (all.length > 0) all(0) else "<empty>"}")
        val off = d.offset.getOrElse(throw new IllegalArgumentException(
          s"on-disk DV descriptor for $path lacks an offset"))
        val bb = ByteBuffer.wrap(all).order(ByteOrder.BIG_ENDIAN)
        bb.position(off)
        val size = bb.getInt
        require(size == d.sizeInBytes,
          s"DV frame size $size != descriptor sizeInBytes " +
            s"${d.sizeInBytes} in $path")
        val data = new Array[Byte](size)
        bb.get(data)
        val stored = bb.getInt
        val crc = new CRC32(); crc.update(data)
        require(stored == crc.getValue.toInt,
          s"DV checksum mismatch in $path at offset $off")
        Bitmap64.fromPortable(data)
      case other => throw new IllegalArgumentException(
        s"unsupported deletion vector storageType '$other'")
    }
    require(bm.cardinality == d.cardinality,
      s"DV cardinality ${bm.cardinality} != descriptor ${d.cardinality}")
    bm
  }

  /** [[readBitmap]], materialized as sorted row indexes — tests and
    * small per-file deltas only. */
  def readPositions(tableDir: String, d: Descriptor): Seq[Long] =
    readBitmap(tableDir, d).toPositions

  /** Relative path (under the table root) of a "u"-typed DV file —
    * what [[DeltaLog.vacuum]] needs to treat live DVs as
    * referenced. */
  def relativePath(tableDir: String, d: Descriptor): Option[String] =
    d.storageType match {
      case "u" =>
        Some(Paths.get(tableDir).toAbsolutePath.relativize(
          Paths.get(d.resolvePath(tableDir)).toAbsolutePath).toString)
      case _ => None
    }

  private[graft] def dvFiles(tableDir: String): Seq[File] =
    Option(new File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("deletion_vector_") &&
        f.getName.endsWith(".bin")).toSeq
}
