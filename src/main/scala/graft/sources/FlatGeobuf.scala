package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * FlatGeobuf (.fgb) reader — the format the reference imports via the
 * flatgeobuf npm library (`/root/reference/src/flatgeobuf/mapshaper-flatgeobuf.mjs`).
 * Implemented from the PUBLIC specs only: the FlatGeobuf layout
 * (flatgeobuf.org: magic, size-prefixed header, packed Hilbert R-tree,
 * size-prefixed features) and the FlatBuffers binary format
 * (google.github.io/flatbuffers: root offset → vtable → fields).
 *
 * Supports Point / LineString / Polygon / MultiPolygon geometries (2D) and
 * Bool/Int/Long/Double/String properties — the slice mapshaper's own
 * importer maps to its dataset model.
 */
object FlatGeobuf {

  final case class Column(name: String, colType: Int)

  final case class Feature(
      geometryType: Int,
      parts: Seq[Array[Double]],       // rings / paths / single point, flat xy
      props: Map[String, Any])

  final case class Layer(
      geometryType: Int,
      envelope: Array[Double],
      columns: Seq[Column],
      features: Seq[Feature],
      crsWkt: Option[String] = None)

  // GeometryType enum (spec)
  final val GPoint = 1
  final val GLineString = 2
  final val GPolygon = 3
  final val GMultiPolygon = 6

  // --------------------------------------------------------------- writing

  /** Minimal FlatBuffers builder: objects are created children-first and laid
   * out in REVERSE creation order (parents at lower addresses), so all
   * references are forward u32 offsets per the wire format. Each chunk
   * carries an alignment requirement honored during layout. */
  private final class FbBuilder {
    final case class Chunk(bytes: Array[Byte], align: Int, alignOffset: Int,
                           refs: Seq[(Int, Int)], // (bytePosInChunk, targetChunkIdx)
                           refDelta: Int = 0)     // references point at chunkPos + refDelta
    private val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]

    def doubleVector(vs: Array[Double]): Int = {
      val b = ByteBuffer.allocate(4 + vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(vs.length)
      vs.foreach(b.putDouble)
      chunks += Chunk(b.array(), 8, 4, Nil) // data at +4 must be 8-aligned
      chunks.length - 1
    }

    def uintVector(vs: Array[Int]): Int = {
      val b = ByteBuffer.allocate(4 + vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(vs.length)
      vs.foreach(b.putInt)
      chunks += Chunk(b.array(), 4, 0, Nil)
      chunks.length - 1
    }

    def byteVector(vs: Array[Byte]): Int = {
      val b = ByteBuffer.allocate(4 + vs.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(vs.length)
      b.put(vs)
      chunks += Chunk(b.array(), 4, 0, Nil)
      chunks.length - 1
    }

    def string(s: String): Int = {
      val sb = s.getBytes(StandardCharsets.UTF_8)
      val b = ByteBuffer.allocate(4 + sb.length + 1).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(sb.length)
      b.put(sb) // + implicit NUL
      chunks += Chunk(b.array(), 4, 0, Nil)
      chunks.length - 1
    }

    /** Vector of table references. */
    def tableVector(ids: Seq[Int]): Int = {
      val b = ByteBuffer.allocate(4 + ids.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(ids.length)
      chunks += Chunk(b.array(), 4, 0, ids.zipWithIndex.map { case (t, i) => (4 + i * 4, t) })
      chunks.length - 1
    }

    sealed trait Field
    final case class U8(id: Int, v: Int) extends Field
    final case class U16(id: Int, v: Int) extends Field
    final case class U64(id: Int, v: Long) extends Field
    final case class Ref(id: Int, target: Int) extends Field

    /** Table from fields (vtable inline before the table). */
    def table(fields: Seq[Field]): Int = {
      val maxId = if (fields.isEmpty) -1 else fields.map {
        case U8(i, _) => i; case U16(i, _) => i; case U64(i, _) => i; case Ref(i, _) => i
      }.max
      val vtSlots = maxId + 1
      val vtLen = 4 + vtSlots * 2
      // lay out table data: soffset(4) then fields in order with alignment
      var tblLen = 4
      val fieldOffsets = new Array[Int](vtSlots)
      val ordered = fields.sortBy {
        case U8(i, _) => i; case U16(i, _) => i; case U64(i, _) => i; case Ref(i, _) => i
      }
      val placements = ordered.map { f =>
        val (sz, al) = f match {
          case _: U8 => (1, 1); case _: U16 => (2, 2)
          case _: U64 => (8, 8); case _: Ref => (4, 4)
        }
        val pad = (al - (tblLen % al)) % al
        tblLen += pad
        val pos = tblLen
        tblLen += sz
        val id = f match {
          case U8(i, _) => i; case U16(i, _) => i; case U64(i, _) => i; case Ref(i, _) => i
        }
        fieldOffsets(id) = pos
        (f, pos)
      }
      val b = ByteBuffer.allocate(vtLen + tblLen).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0, vtLen.toShort)
      b.putShort(2, tblLen.toShort)
      (0 until vtSlots).foreach(i => b.putShort(4 + i * 2, fieldOffsets(i).toShort))
      b.putInt(vtLen, vtLen) // soffset: vtable sits vtLen bytes before the table
      val refs = Seq.newBuilder[(Int, Int)]
      placements.foreach {
        case (U8(_, v), pos) => b.put(vtLen + pos, v.toByte)
        case (U16(_, v), pos) => b.putShort(vtLen + pos, v.toShort)
        case (U64(_, v), pos) => b.putLong(vtLen + pos, v)
        case (Ref(_, t), pos) => refs += ((vtLen + pos, t))
      }
      chunks += Chunk(b.array(), 8, vtLen, refs.result(), refDelta = vtLen) // table start 8-aligned
      chunks.length - 1
    }

    /** Finish one flatbuffer with `root` as the root table; returns bytes
     * (u32 root offset + payload). */
    def finish(root: Int): Array[Byte] = {
      // layout: root-offset word, then chunks in REVERSE creation order
      val order = chunks.indices.reverse
      val pos = new Array[Int](chunks.length)
      var cursor = 4
      order.foreach { ci =>
        val c = chunks(ci)
        val pad = ((c.align - ((cursor + c.alignOffset) % c.align)) % c.align)
        cursor += pad
        pos(ci) = cursor
        cursor += c.bytes.length
      }
      val out = ByteBuffer.allocate(cursor).order(ByteOrder.LITTLE_ENDIAN)
      chunks.indices.foreach { ci =>
        val c = chunks(ci)
        var i = 0
        while (i < c.bytes.length) { out.put(pos(ci) + i, c.bytes(i)); i += 1 }
        c.refs.foreach { case (at, target) =>
          val t = chunks(target)
          out.putInt(pos(ci) + at, (pos(target) + t.refDelta) - (pos(ci) + at))
        }
      }
      // root offset: u32 RELATIVE offset from position 0 to the root table
      val rootChunk = chunks(root)
      out.putInt(0, pos(root) + rootChunk.refDelta)
      out.array()
    }
  }

  /** Write a single-geometry-type FGB layer (no spatial index). Geometry per
   * feature: flat xy parts (rings/paths); properties limited to the column
   * types the reader handles. */
  def write(layer: Layer, name: String = "layer"): Array[Byte] = {
    // flat-ring encoding (one ends vector, no sub-geometry `parts` tables)
    // would misrepresent a >1-polygon MultiPolygon to spec-compliant readers;
    // split such features into Polygon features before writing
    require(layer.geometryType != 6,
      "FlatGeobuf writer does not support MultiPolygon: explode into Polygon features first")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'g', 'b', 3, 'f', 'g', 'b', 0))

    // header flatbuffer
    val hb = new FbBuilder
    val nameOff = hb.string(name)
    val envOff = if (layer.envelope.nonEmpty) Some(hb.doubleVector(layer.envelope)) else None
    val colOffs = layer.columns.map { c =>
      val n = hb.string(c.name)
      hb.table(Seq(hb.Ref(0, n), hb.U8(1, c.colType)))
    }
    val colsVec = if (colOffs.nonEmpty) Some(hb.tableVector(colOffs)) else None
    val hdrFields = Seq(hb.Ref(0, nameOff)) ++
      envOff.map(o => hb.Ref(1, o)) ++
      Seq(hb.U8(2, layer.geometryType)) ++
      colsVec.map(o => hb.Ref(7, o)) ++
      Seq(hb.U64(8, layer.features.length.toLong), hb.U16(9, 0)) // no index
    val hdr = hb.finish(hb.table(hdrFields))
    val lenBuf = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(hdr.length)
    out.write(lenBuf.array()); out.write(hdr)

    // features
    layer.features.foreach { f =>
      val fb = new FbBuilder
      val xy = f.parts.flatMap(_.toSeq).toArray
      val ends = {
        var acc = 0
        f.parts.map { p => acc += p.length / 2; acc }.toArray
      }
      val xyOff = fb.doubleVector(xy)
      val endsOff = if (f.parts.length > 1) Some(fb.uintVector(ends)) else None
      val geom = fb.table(
        endsOff.map(o => fb.Ref(0, o)).toSeq ++ Seq(fb.Ref(1, xyOff)))
      val propBytes = encodeProps(f.props, layer.columns)
      val featFields = Seq(fb.Ref(0, geom)) ++
        (if (propBytes.nonEmpty) Seq(fb.Ref(1, fb.byteVector(propBytes))) else Nil)
      val feat = fb.finish(fb.table(featFields))
      val fl = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(feat.length)
      out.write(fl.array()); out.write(feat)
    }
    out.toByteArray
  }

  /** Column types this writer can encode (Bool, Long/ULong, Double, String). */
  private val SupportedColTypes = Set(2, 7, 8, 10, 11)

  private def encodeProps(props: Map[String, Any], columns: Seq[Column]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    columns.zipWithIndex.foreach { case (c, ci) =>
      props.get(c.name).foreach { v =>
        // throw BEFORE emitting the column index: a dangling index with no
        // value would corrupt the properties blob for all following columns
        if (!SupportedColTypes.contains(c.colType))
          throw new IllegalArgumentException(
            s"unsupported FGB column type ${c.colType} for column '${c.name}'")
        bb.clear(); bb.putShort(ci.toShort)
        b.write(bb.array(), 0, 2)
        c.colType match {
          case 7 | 8 =>
            bb.clear(); bb.putLong(v match { case l: Long => l; case i: Int => i.toLong case _ => 0L })
            b.write(bb.array(), 0, 8)
          case 10 =>
            bb.clear(); bb.putDouble(v.asInstanceOf[Double])
            b.write(bb.array(), 0, 8)
          case 11 =>
            val sb = v.toString.getBytes(StandardCharsets.UTF_8)
            bb.clear(); bb.putInt(sb.length)
            b.write(bb.array(), 0, 4)
            b.write(sb)
          case 2 =>
            b.write(if (v.asInstanceOf[Boolean]) 1 else 0)
          case _ => ()
        }
      }
    }
    b.toByteArray
  }

  /** Minimal FlatBuffers table accessor. */
  private final class FB(val buf: ByteBuffer) {
    def root(start: Int): Int = start + buf.getInt(start)
    /** absolute position of field `id` in `table`, or 0 if absent */
    def field(table: Int, id: Int): Int = {
      val vtable = table - buf.getInt(table)
      val vtSize = buf.getShort(vtable) & 0xffff
      val slot = 4 + id * 2
      if (slot + 1 >= vtSize) 0
      else {
        val off = buf.getShort(vtable + slot) & 0xffff
        if (off == 0) 0 else table + off
      }
    }
    def indirect(pos: Int): Int = pos + buf.getInt(pos)
    def vecLen(pos: Int): Int = buf.getInt(indirect(pos))
    def vecData(pos: Int): Int = indirect(pos) + 4
    def string(pos: Int): String = {
      val v = indirect(pos)
      val len = buf.getInt(v)
      val b = new Array[Byte](len)
      var i = 0
      while (i < len) { b(i) = buf.get(v + 4 + i); i += 1 }
      new String(b, StandardCharsets.UTF_8)
    }
  }

  def read(path: String): Layer = readBytes(Files.readAllBytes(Paths.get(path)))

  def readBytes(bytes: Array[Byte]): Layer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 &&
      bytes(0) == 'f' && bytes(1) == 'g' && bytes(2) == 'b' &&
      bytes(4) == 'f' && bytes(5) == 'g' && bytes(6) == 'b',
      "not a FlatGeobuf file")
    val headerLen = buf.getInt(8)
    val fb = new FB(buf)
    val hdr = fb.root(12)

    val envelope = {
      val f = fb.field(hdr, 1)
      if (f == 0) Array.emptyDoubleArray
      else {
        val n = fb.vecLen(f); val d = fb.vecData(f)
        Array.tabulate(n)(i => buf.getDouble(d + i * 8))
      }
    }
    val geometryType = {
      val f = fb.field(hdr, 2)
      if (f == 0) 0 else buf.get(f) & 0xff
    }
    val columns: Seq[Column] = {
      val f = fb.field(hdr, 7)
      if (f == 0) Seq.empty
      else {
        val n = fb.vecLen(f); val d = fb.vecData(f)
        (0 until n).map { i =>
          val t = fb.indirect(d + i * 4)
          val nameF = fb.field(t, 0)
          val typeF = fb.field(t, 1)
          Column(if (nameF == 0) "" else fb.string(nameF),
            if (typeF == 0) 0 else buf.get(typeF) & 0xff)
        }
      }
    }
    val featuresCount = {
      val f = fb.field(hdr, 8)
      if (f == 0) 0L else buf.getLong(f)
    }
    val indexNodeSize = {
      val f = fb.field(hdr, 9)
      if (f == 0) 16 else buf.getShort(f) & 0xffff
    }

    // header Crs table (field 10), wkt string (Crs field 4) — WKT2 per spec
    val crsWkt: Option[String] = {
      val f = fb.field(hdr, 10)
      if (f == 0) None
      else {
        val t = fb.indirect(f)
        val wktF = fb.field(t, 4)
        if (wktF == 0) None else Some(fb.string(wktF))
      }
    }

    // skip the packed Hilbert R-tree: level sizes bottom-up, 40 bytes/node
    var pos = 12 + headerLen
    if (indexNodeSize > 0 && featuresCount > 0) {
      var n = featuresCount
      var total = n
      while (n != 1) {
        n = (n + indexNodeSize - 1) / indexNodeSize
        total += n
      }
      pos += (total * 40).toInt
    }

    val features = Seq.newBuilder[Feature]
    while (pos + 4 <= bytes.length) {
      val size = buf.getInt(pos)
      if (size <= 0 || pos + 4 + size > bytes.length) {
        pos = bytes.length
      } else {
        val froot = fb.root(pos + 4)
        val geomF = fb.field(froot, 0)
        val (gType, parts) =
          if (geomF == 0) (geometryType, Seq.empty[Array[Double]])
          else parseGeometry(fb, fb.indirect(geomF), geometryType)
        val props = {
          val pf = fb.field(froot, 1)
          if (pf == 0) Map.empty[String, Any]
          else parseProps(buf, fb.vecData(pf), fb.vecLen(pf), columns)
        }
        features += Feature(gType, parts, props)
        pos += 4 + size
      }
    }
    Layer(geometryType, envelope, columns, features.result(), crsWkt)
  }

  /** Geometry table → flat xy parts (ends split the xy vector into rings). */
  private def parseGeometry(fb: FB, g: Int, defaultType: Int): (Int, Seq[Array[Double]]) = {
    val buf = fb.buf
    val typeF = fb.field(g, 6)
    val gType = if (typeF == 0) defaultType else buf.get(typeF) & 0xff
    val partsF = fb.field(g, 7)
    if (partsF != 0) {
      // multi-part geometry: recurse into sub-geometries
      val n = fb.vecLen(partsF); val d = fb.vecData(partsF)
      val all = (0 until n).flatMap { i =>
        parseGeometry(fb, fb.indirect(d + i * 4), gType)._2
      }
      return (gType, all)
    }
    val xyF = fb.field(g, 1)
    if (xyF == 0) return (gType, Seq.empty)
    val xyN = fb.vecLen(xyF); val xyD = fb.vecData(xyF)
    val xy = Array.tabulate(xyN)(i => buf.getDouble(xyD + i * 8))
    val endsF = fb.field(g, 0)
    if (endsF == 0) (gType, Seq(xy))
    else {
      val en = fb.vecLen(endsF); val ed = fb.vecData(endsF)
      val ends = Array.tabulate(en)(i => buf.getInt(ed + i * 4))
      var start = 0
      val parts = ends.map { e =>
        val flat = java.util.Arrays.copyOfRange(xy, start * 2, e * 2)
        start = e
        flat
      }.toSeq
      (gType, parts)
    }
  }

  /** Properties blob: repeated (ushort column index, value per column type). */
  private def parseProps(buf: ByteBuffer, data: Int, len: Int,
                         columns: Seq[Column]): Map[String, Any] = {
    val out = Map.newBuilder[String, Any]
    var p = data
    val end = data + len
    while (p + 2 <= end) {
      val ci = buf.getShort(p) & 0xffff
      p += 2
      if (ci >= columns.length) { p = end }
      else {
        val c = columns(ci)
        c.colType match {
          case 0 | 1 => out += (c.name -> buf.get(p)); p += 1        // byte
          case 2 => out += (c.name -> (buf.get(p) != 0)); p += 1     // bool
          case 3 | 4 => out += (c.name -> buf.getShort(p)); p += 2   // short
          case 5 | 6 => out += (c.name -> buf.getInt(p)); p += 4     // int
          case 7 | 8 => out += (c.name -> buf.getLong(p)); p += 8    // long
          case 9 => out += (c.name -> buf.getFloat(p)); p += 4       // float
          case 10 => out += (c.name -> buf.getDouble(p)); p += 8     // double
          case 11 | 12 =>                                            // string/json
            val n = buf.getInt(p); p += 4
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = buf.get(p + i); i += 1 }
            out += (c.name -> new String(b, StandardCharsets.UTF_8))
            p += n
          case 13 =>                                                 // datetime
            val n = buf.getInt(p); p += 4 + n
          case 14 =>                                                 // binary
            val n = buf.getInt(p); p += 4 + n
          case _ => p = end
        }
      }
    }
    out.result()
  }
}
