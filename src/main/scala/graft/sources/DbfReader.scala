package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Minimal dBASE III/IV (.dbf) attribute-table reader — the reference's
 * shapefile attribute side (`/root/reference/src/shapefile/dbf-reader.mjs`,
 * 450 LoC). Implemented from the public dBASE layout: 32-byte header,
 * 32-byte field descriptors terminated by 0x0D, then fixed-width records
 * (first byte = deletion flag).
 *
 * Field types mapped: C→String, N/F→Double (or null), L→Boolean, D→String
 * (yyyymmdd). Record index aligns with the .shp record index, so
 * `ShpReader.readPolygons(...).shapeKeys` join directly.
 */
object DbfReader {

  final case class Field(name: String, fieldType: Char, length: Int)

  final case class Table(fields: Seq[Field], rows: Seq[Map[String, Any]])

  def read(path: String, charset: String = "UTF-8"): Table = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff

    // field descriptors: from byte 32 until terminator 0x0D
    val fields = Seq.newBuilder[Field]
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0d) {
      val nameEnd = {
        var e = off
        while (e < off + 11 && bytes(e) != 0) e += 1
        e
      }
      val name = new String(bytes, off, nameEnd - off, StandardCharsets.US_ASCII)
      val ftype = bytes(off + 11).toChar
      val flen = bytes(off + 16) & 0xff
      fields += Field(name, ftype, flen)
      off += 32
    }
    val fs = fields.result()

    val cs = java.nio.charset.Charset.forName(charset)
    val rows = Seq.newBuilder[Map[String, Any]]
    var r = 0
    while (r < nRecords) {
      val base = headerSize + r * recordSize
      if (base + recordSize <= bytes.length && bytes(base) != '*') { // not deleted
        var pos = base + 1
        val row = Map.newBuilder[String, Any]
        fs.foreach { f =>
          val raw = new String(bytes, pos, f.length, cs).trim
          val v: Any = f.fieldType match {
            case 'N' | 'F' =>
              if (raw.isEmpty) null
              else try java.lang.Double.valueOf(raw) catch { case _: NumberFormatException => null }
            case 'L' =>
              raw.toUpperCase match {
                case "T" | "Y" => java.lang.Boolean.TRUE
                case "F" | "N" => java.lang.Boolean.FALSE
                case _         => null
              }
            case _ => raw
          }
          row += (f.name -> v)
          pos += f.length
        }
        rows += row.result()
      }
      r += 1
    }
    Table(fs, rows.result())
  }
}
