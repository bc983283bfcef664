package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

/**
 * GeoPackage (.gpkg) reader — a from-scratch, read-only SQLite 3 B-tree
 * parser plus the GeoPackage geometry-blob and metadata-table conventions.
 * The reference imports GeoPackage via the @ngageoint/geopackage library
 * (`/root/reference/src/geopackage/`); this implementation uses only the
 * PUBLIC file-format specs: sqlite.org/fileformat2.html (header, table
 * b-trees, record serial types, overflow chains) and the OGC GeoPackage
 * spec (gpkg_contents / gpkg_geometry_columns, `GP` geometry blob header,
 * ISO WKB payload).
 */
object GeoPackage {

  // ----------------------------------------------------------- SQLite core

  final class SqliteDb(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
      "not a SQLite file")
    private val pageSizeRaw = buf.getShort(16) & 0xffff
    val pageSize: Int = if (pageSizeRaw == 1) 65536 else pageSizeRaw
    private val reserved = bytes(20) & 0xff
    private val usable = pageSize - reserved

    private def pageStart(page: Int): Int = (page - 1) * pageSize

    /** Read a big-endian varint at pos; returns (value, bytesRead). */
    private def varint(pos: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(pos + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (bytes(pos + 8) & 0xff), 9)
    }

    /** Payload of a table-leaf cell, following overflow chains. */
    private def cellPayload(pos0: Int): (Long, Array[Byte]) = {
      var pos = pos0
      val (payloadLen, n1) = varint(pos); pos += n1
      val (rowid, n2) = varint(pos); pos += n2
      val x = usable - 35
      val inline =
        if (payloadLen <= x) payloadLen.toInt
        else {
          val m = (usable - 12) * 32 / 255 - 23
          val k = m + ((payloadLen - m) % (usable - 4)).toInt
          if (k <= x) k else m
        }
      val out = new Array[Byte](payloadLen.toInt)
      System.arraycopy(bytes, pos, out, 0, inline)
      var copied = inline
      if (copied < payloadLen) {
        var ovfl = buf.getInt(pos + inline)
        while (ovfl != 0 && copied < payloadLen) {
          val ps = pageStart(ovfl)
          val chunk = math.min(usable - 4, payloadLen.toInt - copied)
          System.arraycopy(bytes, ps + 4, out, copied, chunk)
          copied += chunk
          ovfl = buf.getInt(ps)
        }
      }
      (rowid, out)
    }

    /** Walk a table b-tree, yielding (rowid, record payload). */
    def walkTable(rootPage: Int): Seq[(Long, Array[Byte])] = {
      val out = mutable.ArrayBuffer.empty[(Long, Array[Byte])]
      def walk(page: Int): Unit = {
        val ps = pageStart(page)
        val hdrOff = if (page == 1) ps + 100 else ps
        val pType = bytes(hdrOff) & 0xff
        val nCells = buf.getShort(hdrOff + 3) & 0xffff
        pType match {
          case 13 => // table leaf
            val ptrs = hdrOff + 8
            var i = 0
            while (i < nCells) {
              val cell = ps + (buf.getShort(ptrs + i * 2) & 0xffff)
              out += cellPayload(cell)
              i += 1
            }
          case 5 => // table interior
            val ptrs = hdrOff + 12
            var i = 0
            while (i < nCells) {
              val cell = ps + (buf.getShort(ptrs + i * 2) & 0xffff)
              walk(buf.getInt(cell))
              i += 1
            }
            walk(buf.getInt(hdrOff + 8)) // right-most child
          case _ => () // index pages not needed
        }
      }
      walk(rootPage)
      out.toSeq
    }

    /** Decode a record payload into column values (serial-type format). */
    def decodeRecord(payload: Array[Byte]): Seq[Any] = {
      val pb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      def vint(pos: Int): (Long, Int) = {
        var v = 0L
        var i = 0
        while (i < 8) {
          val b = payload(pos + i) & 0xff
          v = (v << 7) | (b & 0x7f)
          if ((b & 0x80) == 0) return (v, i + 1)
          i += 1
        }
        ((v << 8) | (payload(pos + 8) & 0xff), 9)
      }
      val (hdrLen, n0) = vint(0)
      val types = mutable.ArrayBuffer.empty[Long]
      var p = n0
      while (p < hdrLen) {
        val (t, n) = vint(p)
        types += t
        p += n
      }
      var dp = hdrLen.toInt
      types.map { t =>
        t match {
          case 0 => null
          case 1 => val v = payload(dp).toLong; dp += 1; v
          case 2 => val v = pb.getShort(dp).toLong; dp += 2; v
          case 3 =>
            val v = ((payload(dp).toLong << 16) | ((payload(dp + 1) & 0xffL) << 8) |
              (payload(dp + 2) & 0xffL)); dp += 3; v
          case 4 => val v = pb.getInt(dp).toLong; dp += 4; v
          case 5 =>
            val v = ((pb.getShort(dp).toLong << 32) | (pb.getInt(dp + 2) & 0xffffffffL))
            dp += 6; v
          case 6 => val v = pb.getLong(dp); dp += 8; v
          case 7 => val v = pb.getDouble(dp); dp += 8; v
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new String(payload, dp, len, StandardCharsets.UTF_8); dp += len; s
          case n if n >= 12 =>
            val len = ((n - 12) / 2).toInt
            val b = java.util.Arrays.copyOfRange(payload, dp, dp + len); dp += len; b
          case _ => null
        }
      }.toSeq
    }

    /** sqlite_master: (type, name, tbl_name, rootpage, sql). */
    lazy val master: Seq[(String, String, String, Int, String)] =
      walkTable(1).map { case (_, payload) =>
        val r = decodeRecord(payload)
        (r(0).asInstanceOf[String], r(1).asInstanceOf[String], r(2).asInstanceOf[String],
          r(3) match { case l: Long => l.toInt; case _ => 0 },
          r(4) match { case s: String => s; case _ => "" })
      }

    /** Column names parsed from the CREATE TABLE statement. */
    def columnNames(createSql: String): Seq[String] = {
      val open = createSql.indexOf('(')
      val body = createSql.substring(open + 1, createSql.lastIndexOf(')'))
      val cols = mutable.ArrayBuffer.empty[String]
      var depth = 0
      val cur = new StringBuilder
      body.foreach {
        case '(' => depth += 1; cur.append('(')
        case ')' => depth -= 1; cur.append(')')
        case ',' if depth == 0 => cols += cur.toString; cur.clear()
        case c => cur.append(c)
      }
      if (cur.nonEmpty) cols += cur.toString
      cols.toSeq.map(_.trim)
        .filterNot(c => Seq("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
          .exists(k => c.toUpperCase.startsWith(k + " ") || c.toUpperCase.startsWith(k + "(")))
        .map { c =>
          val t = c.trim
          if (t.startsWith("\"")) t.substring(1, t.indexOf('"', 1))
          else if (t.startsWith("`")) t.substring(1, t.indexOf('`', 1))
          else if (t.startsWith("[")) t.substring(1, t.indexOf(']'))
          else t.takeWhile(ch => !ch.isWhitespace)
        }
    }

    /** Read a table into (columns, rows). INTEGER PRIMARY KEY nulls are
     * replaced by the rowid (SQLite stores the alias as NULL). */
    def readTable(name: String): (Seq[String], Seq[Seq[Any]]) = {
      val entry = master.find(m => m._1 == "table" && m._2 == name)
        .getOrElse(throw new NoSuchElementException(s"table $name"))
      val cols = columnNames(entry._5)
      val rows = walkTable(entry._4).map { case (rowid, payload) =>
        val r = decodeRecord(payload)
        r.zipWithIndex.map { case (v, i) =>
          if (v == null && i == 0 && entry._5.toUpperCase.contains("INTEGER PRIMARY KEY")) rowid
          else v
        }
      }
      (cols, rows)
    }
  }

  // ------------------------------------------------------- GeoPackage layer

  final case class GpkgFeature(fid: Long, parts: Seq[Array[Double]], geomType: Int,
                               props: Map[String, Any])

  final case class GpkgLayer(table: String, geometryColumn: String, srsId: Int,
                             columns: Seq[String], features: Seq[GpkgFeature])

  def open(path: String): SqliteDb =
    new SqliteDb(Files.readAllBytes(Paths.get(path)))

  /** Names of the feature tables declared in gpkg_contents. */
  def featureTables(db: SqliteDb): Seq[String] = {
    val (cols, rows) = db.readTable("gpkg_contents")
    val ti = cols.indexOf("table_name")
    val di = cols.indexOf("data_type")
    rows.filter(r => r(di) == "features").map(_(ti).asInstanceOf[String])
  }

  /** Read one feature table: geometry blobs decoded to flat xy parts. */
  def readFeatures(db: SqliteDb, table: String): GpkgLayer = {
    val (gcCols, gcRows) = db.readTable("gpkg_geometry_columns")
    val tni = gcCols.indexOf("table_name")
    val cni = gcCols.indexOf("column_name")
    val sri = gcCols.indexOf("srs_id")
    val gc = gcRows.find(_(tni) == table)
      .getOrElse(throw new NoSuchElementException(s"no geometry column for $table"))
    val geomCol = gc(cni).asInstanceOf[String]
    val srs = gc(sri) match { case l: Long => l.toInt; case _ => 0 }

    val (cols, rows) = db.readTable(table)
    val gi = cols.indexOf(geomCol)
    val features = rows.zipWithIndex.map { case (r, idx) =>
      val fid = r.head match { case l: Long => l; case _ => idx.toLong }
      val (gt, parts) = r(gi) match {
        case b: Array[Byte] => parseGpkgGeometry(b)
        case _ => (0, Seq.empty[Array[Double]])
      }
      val props = cols.zip(r).filterNot(_._1 == geomCol).toMap
      GpkgFeature(fid, parts, gt, props)
    }
    GpkgLayer(table, geomCol, srs, cols, features)
  }

  /** GeoPackage geometry blob: GP magic, version, flags, srs, envelope, WKB. */
  def parseGpkgGeometry(blob: Array[Byte]): (Int, Seq[Array[Double]]) = {
    require(blob.length > 8 && blob(0) == 'G' && blob(1) == 'P', "not a GPKG geometry")
    val flags = blob(3) & 0xff
    val envCode = (flags >> 1) & 0x7
    val envBytes = envCode match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => 0
    }
    parseWkb(blob, 8 + envBytes)
  }

  /** ISO WKB: Point/LineString/Polygon/Multi* → flat xy parts. Z/M
   * ordinates (types 1001/2001/3001 etc.) are parsed with the correct
   * per-point stride and dropped — only x,y are kept. */
  def parseWkb(bytes: Array[Byte], off0: Int): (Int, Seq[Array[Double]]) = {
    val parts = mutable.ArrayBuffer.empty[Array[Double]]
    var topType = 0

    def parseOne(off: Int): Int = {
      val le = bytes(off) == 1
      val bb = ByteBuffer.wrap(bytes)
        .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val gtypeRaw = bb.getInt(off + 1)
      val gtype = gtypeRaw % 1000 // 1001 = PointZ, 2002 = LineStringM, 3003 = PolygonZM…
      val dims = 2 + (gtypeRaw / 1000 match {
        case 0 => 0; case 1 | 2 => 1; case 3 => 2
        case f => throw new IllegalArgumentException(s"unsupported WKB dim flag $f")
      })
      if (topType == 0) topType = gtype

      // read n points of `dims` doubles starting at p; keep x,y only
      def readPoints(p: Int, n: Int): Array[Double] = {
        val flat = new Array[Double](n * 2)
        var i = 0
        while (i < n) {
          flat(i * 2) = bb.getDouble(p + i * dims * 8)
          flat(i * 2 + 1) = bb.getDouble(p + i * dims * 8 + 8)
          i += 1
        }
        flat
      }

      gtype match {
        case 1 =>
          parts += readPoints(off + 5, 1)
          off + 5 + dims * 8
        case 2 =>
          val n = bb.getInt(off + 5)
          parts += readPoints(off + 9, n)
          off + 9 + n * dims * 8
        case 3 =>
          val nRings = bb.getInt(off + 5)
          var p = off + 9
          var r = 0
          while (r < nRings) {
            val n = bb.getInt(p)
            parts += readPoints(p + 4, n)
            p += 4 + n * dims * 8
            r += 1
          }
          p
        case 4 | 5 | 6 | 7 =>
          val n = bb.getInt(off + 5)
          var p = off + 9
          var i = 0
          while (i < n) { p = parseOne(p); i += 1 }
          p
        case other =>
          throw new IllegalArgumentException(s"unsupported WKB type $other")
      }
    }
    parseOne(off0)
    (topType, parts.toSeq)
  }
}
