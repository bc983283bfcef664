package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.Raster

/**
 * Minimal GeoTIFF reader/writer — baseline TIFF (single strip-set,
 * uncompressed) with the GeoTIFF georeferencing tags the reference's importer
 * reads (`/root/reference/src/geotiff/mapshaper-geotiff-import.mjs`, which
 * delegates to the geotiff.js library):
 *
 *   ModelPixelScaleTag  (33550): [cellSizeX, cellSizeY, 0]
 *   ModelTiepointTag    (33922): [0, 0, 0, x0, y1, 0]  (raster origin = top-left)
 *
 * Parses the IFD directly (TIFF 6.0 spec, public) — no plugin dependency, so
 * the byte layout is fully deterministic for round-trip tests. Supports
 * 32-bit float and 8-bit gray samples, little-endian.
 */
object GeoTiff {

  private final val TW = 256   // ImageWidth
  private final val TH = 257   // ImageLength
  private final val BPS = 258  // BitsPerSample
  private final val SF = 339   // SampleFormat (3 = IEEE float)
  private final val SO = 273   // StripOffsets
  private final val SBC = 279  // StripByteCounts
  private final val SPP = 277  // SamplesPerPixel
  private final val PSCALE = 33550
  private final val TIEPT = 33922

  /** Write a single-band float32 GeoTIFF (little-endian, one strip). */
  def write(grid: Raster.Grid): Array[Byte] = {
    val w = grid.w; val h = grid.h
    val dataBytes = w * h * 4
    val nEntries = 9
    // layout: 8 header | data | IFD | external tag values
    val dataOff = 8
    val ifdOff = dataOff + dataBytes
    val extOff = ifdOff + 2 + nEntries * 12 + 4
    val pscaleOff = extOff           // 3 doubles
    val tieptOff = extOff + 24       // 6 doubles
    val total = tieptOff + 48
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    var i = 0
    while (i < w * h) { buf.putFloat(grid.values(i).toFloat); i += 1 }
    // IFD
    buf.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    }
    entry(TW, 3, 1, w)
    entry(TH, 3, 1, h)
    entry(BPS, 3, 1, 32)
    entry(SO, 4, 1, dataOff)
    entry(SPP, 3, 1, 1)
    entry(SBC, 4, 1, dataBytes)
    entry(SF, 3, 1, 3)
    entry(PSCALE, 12, 3, pscaleOff)
    entry(TIEPT, 12, 6, tieptOff)
    buf.putInt(0) // next IFD
    buf.putDouble(grid.georef.cellSize).putDouble(grid.georef.cellSize).putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      .putDouble(grid.georef.x0).putDouble(grid.georef.y1).putDouble(0.0)
    buf.array()
  }

  /** Read a baseline single-band GeoTIFF (float32 or uint8, LE or BE). */
  def read(bytes: Array[Byte]): Raster.Grid = {
    val bb0 = ByteBuffer.wrap(bytes)
    val order = bytes(0) match {
      case 'I' => ByteOrder.LITTLE_ENDIAN
      case 'M' => ByteOrder.BIG_ENDIAN
      case b => throw new IllegalArgumentException(s"not a TIFF (lead byte $b)")
    }
    val bb = bb0.order(order)
    require(bb.getShort(2) == 42, "bad TIFF magic")
    val ifdOff = bb.getInt(4)
    val n = bb.getShort(ifdOff) & 0xffff
    var w = 0; var h = 0; var bits = 32; var fmt = 1; var spp = 1
    var stripOffsets = Array.emptyIntArray
    var stripCounts = Array.emptyIntArray
    var cellSize = 1.0; var x0 = 0.0; var y1 = 0.0
    var i = 0
    while (i < n) {
      val e = ifdOff + 2 + i * 12
      val tag = bb.getShort(e) & 0xffff
      val typ = bb.getShort(e + 2) & 0xffff
      val count = bb.getInt(e + 4)
      def typeSize(t: Int): Int = t match {
        case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4; case 5 | 10 | 12 => 8
        case _ => 1
      }
      val inline = typeSize(typ) * count <= 4
      val valOff = if (inline) e + 8 else bb.getInt(e + 8)
      def intAt(idx: Int): Int = typ match {
        case 3 => bb.getShort(valOff + idx * 2) & 0xffff
        case 4 => bb.getInt(valOff + idx * 4)
        case _ => bb.getInt(valOff + idx * 4)
      }
      def dblAt(idx: Int): Double = bb.getDouble(valOff + idx * 8)
      tag match {
        case TW => w = intAt(0)
        case TH => h = intAt(0)
        case BPS => bits = intAt(0)
        case SF => fmt = intAt(0)
        case SPP => spp = intAt(0)
        case SO => stripOffsets = Array.tabulate(count)(intAt)
        case SBC => stripCounts = Array.tabulate(count)(intAt)
        case PSCALE => cellSize = dblAt(0)
        case TIEPT => if (count >= 6) { x0 = dblAt(3); y1 = dblAt(4) }
        case _ => ()
      }
      i += 1
    }
    require(w > 0 && h > 0 && stripOffsets.nonEmpty, "missing required TIFF tags")
    require(spp == 1, s"only single-band rasters supported (spp=$spp)")
    val values = new Array[Double](w * h)
    var vi = 0
    stripOffsets.indices.foreach { s =>
      var p = stripOffsets(s)
      val end = p + stripCounts(s)
      while (p < end && vi < values.length) {
        if (bits == 32 && fmt == 3) { values(vi) = bb.getFloat(p); p += 4 }
        else if (bits == 8) { values(vi) = (bb.get(p) & 0xff).toDouble; p += 1 }
        else if (bits == 16) { values(vi) = (bb.getShort(p) & 0xffff).toDouble; p += 2 }
        else throw new IllegalArgumentException(s"unsupported sample: $bits-bit fmt $fmt")
        vi += 1
      }
    }
    Raster.Grid(w, h, values, Raster.Georef(x0, y1, cellSize))
  }
}
