package graft.geom

/**
 * Minimal WKT1 (ESRI .prj) reader — the reference converts .prj files to
 * proj strings via its bundled mproj WKT converter
 * (`/root/reference/src/crs/mapshaper-projections.mjs:336-358`, used by the
 * shapefile importer). This covers the PROJCS/GEOGCS surface that actually
 * appears in shapefile sidecars, mapped onto the typed [[Crs]] catalog.
 *
 * Datum note: the catalog projects on WGS84; a .prj carrying a different
 * SPHEROID is accepted and projected with WGS84 constants (the reference
 * reprojects datums through PROJ — out of this engine's charter, and the
 * difference is meters-scale for the historic datums in the fixtures).
 */
object Wkt {

  /** One WKT node: `KIND["name", v1, v2, NESTED[...], ...]`. */
  final case class Node(kind: String, values: Seq[Any]) {
    def strings: Seq[String] = values.collect { case s: String => s }
    def numbers: Seq[Double] = values.collect { case d: Double => d }
    def children: Seq[Node] = values.collect { case n: Node => n }
    def find(kind: String): Option[Node] = {
      val k = kind.toUpperCase
      if (this.kind.equalsIgnoreCase(k)) return Some(this)
      children.iterator.map(_.find(k)).collectFirst { case Some(n) => n }
    }
    def findAll(kind: String): Seq[Node] = {
      val own = if (this.kind.equalsIgnoreCase(kind)) Seq(this) else Nil
      own ++ children.flatMap(_.findAll(kind))
    }
  }

  /** Parse a WKT1 string into its node tree. */
  def parse(wkt: String): Node = {
    var i = 0
    // trim() only strips chars <= 0x20 — a UTF-8 BOM (U+FEFF, common from
    // Windows GIS tooling) must go too or the root kind is corrupted
    val s = wkt.stripPrefix("\uFEFF").trim

    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1

    def parseNode(): Node = {
      skipWs()
      val start = i
      while (i < s.length && s(i) != '[') i += 1
      val kind = s.substring(start, i).trim
      require(i < s.length && s(i) == '[', s"expected '[' after $kind")
      i += 1 // consume [
      val values = scala.collection.mutable.ArrayBuffer.empty[Any]
      var done = false
      while (!done) {
        skipWs()
        if (i >= s.length) throw new IllegalArgumentException("unterminated WKT")
        s(i) match {
          case ']' => i += 1; done = true
          case ',' => i += 1
          case '"' =>
            i += 1
            val st = i
            while (i < s.length && s(i) != '"') i += 1
            values += s.substring(st, i)
            i += 1 // closing quote
          case c if c.isDigit || c == '-' || c == '+' || c == '.' =>
            val st = i
            while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
            values += s.substring(st, i).toDouble
          case _ =>
            // bare token: a nested node if followed by '[' (WKT1 and WKT2),
            // else a bare keyword atom (WKT2: CS[Cartesian,2], AXIS[...,east])
            val st = i
            while (i < s.length && s(i) != '[' && s(i) != ',' && s(i) != ']') i += 1
            if (i < s.length && s(i) == '[') { i = st; values += parseNode() }
            else values += s.substring(st, i).trim
        }
      }
      Node(kind.toUpperCase, values.toSeq)
    }

    parseNode()
  }

  /** .prj content → catalog projection. Accepts both WKT1 (ESRI .prj,
   * PROJCS/GEOGCS) and WKT2 (PROJCRS/GEOGCRS with CONVERSION/METHOD, as
   * FlatGeobuf headers carry). Throws with the offending method name when
   * a projection is not in the catalog. */
  def toProj(wkt: String): Crs.Proj = {
    val root = parse(wkt)
    root.kind match {
      case "GEOGCS" | "GEOGCRS" | "GEODCRS" => Crs.Longlat
      case "PROJCRS" => wkt2Proj(root)
      case "PROJCS" =>
        val method = root.find("PROJECTION")
          .flatMap(_.strings.headOption)
          .getOrElse(throw new IllegalArgumentException("PROJCS without PROJECTION"))
        val params = paramsOf(root)
        def d(k: String, dflt: Double): Double = params.getOrElse(k, dflt)
        // ESRI writes *_Of_Center for azimuthal/centered projections and
        // *_Of_Origin elsewhere — accept both rather than silently
        // defaulting to 0 (a real-world World_Orthographic .prj uses Center)
        def lat0(dflt: Double): Double =
          d("latitude_of_origin", d("latitude_of_center", dflt))
        def lon0(dflt: Double): Double =
          d("central_meridian", d("longitude_of_center", dflt))
        // the catalog carries false easting/northing only on Tmerc — a
        // nonzero offset elsewhere must fail loudly, not shift silently
        def noFalseOffsets(): Unit = {
          val fe = d("false_easting", 0); val fn = d("false_northing", 0)
          if (fe != 0 || fn != 0) throw new IllegalArgumentException(
            s"unsupported nonzero False_Easting/False_Northing ($fe, $fn) for $method")
        }
        method.toLowerCase match {
          case "transverse_mercator" | "gauss_kruger" =>
            Crs.Tmerc(lat0(0), lon0(0),
              d("scale_factor", 1.0), d("false_easting", 0), d("false_northing", 0))
          case "lambert_conformal_conic" | "lambert_conformal_conic_2sp" =>
            noFalseOffsets()
            Crs.Lcc(d("standard_parallel_1", 33), d("standard_parallel_2", 45),
              lat0(0), lon0(0))
          case "albers" | "albers_conic_equal_area" =>
            noFalseOffsets()
            Crs.Albers(d("standard_parallel_1", 29.5), d("standard_parallel_2", 45.5),
              lat0(0), lon0(0))
          case "mercator" | "mercator_auxiliary_sphere" =>
            noFalseOffsets()
            Crs.Mercator(lon0(0))
          case "robinson" => noFalseOffsets(); Crs.Robinson(lon0(0))
          case "sinusoidal" => noFalseOffsets(); Crs.Sinusoidal(lon0(0))
          case "mollweide" => noFalseOffsets(); Crs.Mollweide(lon0(0))
          case "winkel_tripel" => noFalseOffsets(); Crs.WinkelTripel(lon0(0))
          case "lambert_azimuthal_equal_area" =>
            noFalseOffsets(); Crs.Laea(lat0(0), lon0(0))
          case "orthographic" =>
            noFalseOffsets(); Crs.Orthographic(lat0(0), lon0(0))
          case "stereographic" =>
            noFalseOffsets(); Crs.Stereographic(lat0(90), lon0(0))
          case "equidistant_cylindrical" | "plate_carree" =>
            noFalseOffsets()
            Crs.Equirectangular(d("standard_parallel_1", 0), lon0(0))
          case other =>
            throw new IllegalArgumentException(s"unsupported PROJECTION[$other]")
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported WKT root: $other")
    }
  }

  /** Catalog projection → ESRI WKT1 for a .prj sidecar (the reference's
   * `exportPrjFile`/`crsToPrj` path on shapefile export). Round-trips
   * through [[toProj]] for every supported case; throws by class name for
   * projections with no WKT1 method (the polyhedral family). */
  def fromProj(proj: Crs.Proj): String = {
    val geogcs = "GEOGCS[\"GCS_WGS_1984\",DATUM[\"D_WGS_1984\"," +
      "SPHEROID[\"WGS_1984\",6378137.0,298.257223563]]," +
      "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]"
    def projcs(name: String, method: String, params: Seq[(String, Double)]): String = {
      val ps = params.map { case (k, v) => s"""PARAMETER["$k",$v]""" }.mkString(",")
      s"""PROJCS["$name",$geogcs,PROJECTION["$method"],$ps,UNIT["Meter",1.0]]"""
    }
    proj match {
      case Crs.Longlat => geogcs
      case t: Crs.Tmerc => projcs("Transverse_Mercator", "Transverse_Mercator", Seq(
        "False_Easting" -> t.falseE, "False_Northing" -> t.falseN,
        "Central_Meridian" -> t.lon0Deg, "Scale_Factor" -> t.k0,
        "Latitude_Of_Origin" -> t.lat0Deg))
      case l: Crs.Lcc => projcs("Lambert_Conformal_Conic", "Lambert_Conformal_Conic_2SP", Seq(
        "Standard_Parallel_1" -> l.lat1Deg, "Standard_Parallel_2" -> l.lat2Deg,
        "Latitude_Of_Origin" -> l.lat0Deg, "Central_Meridian" -> l.lon0Deg))
      case a: Crs.Albers => projcs("Albers", "Albers", Seq(
        "Standard_Parallel_1" -> a.lat1Deg, "Standard_Parallel_2" -> a.lat2Deg,
        "Latitude_Of_Origin" -> a.lat0Deg, "Central_Meridian" -> a.lon0Deg))
      case m: Crs.Mercator => projcs("Mercator", "Mercator",
        Seq("Central_Meridian" -> m.lon0Deg))
      case r: Crs.Robinson => projcs("Robinson", "Robinson",
        Seq("Central_Meridian" -> r.lon0Deg))
      case s0: Crs.Sinusoidal => projcs("Sinusoidal", "Sinusoidal",
        Seq("Central_Meridian" -> s0.lon0Deg))
      case m: Crs.Mollweide => projcs("Mollweide", "Mollweide",
        Seq("Central_Meridian" -> m.lon0Deg))
      case w: Crs.WinkelTripel => projcs("Winkel_Tripel", "Winkel_Tripel",
        Seq("Central_Meridian" -> w.lon0Deg))
      case l: Crs.Laea => projcs("Lambert_Azimuthal_Equal_Area",
        "Lambert_Azimuthal_Equal_Area", Seq(
          "Latitude_Of_Origin" -> l.lat0Deg, "Central_Meridian" -> l.lon0Deg))
      case o: Crs.Orthographic => projcs("Orthographic", "Orthographic", Seq(
        "Latitude_Of_Origin" -> o.lat0Deg, "Central_Meridian" -> o.lon0Deg))
      case s1: Crs.Stereographic => projcs("Stereographic", "Stereographic", Seq(
        "Latitude_Of_Origin" -> s1.lat0Deg, "Central_Meridian" -> s1.lon0Deg))
      case e: Crs.Equirectangular => projcs("Equidistant_Cylindrical",
        "Equidistant_Cylindrical", Seq(
          "Standard_Parallel_1" -> e.latTsDeg, "Central_Meridian" -> e.lon0Deg))
      case other => throw new IllegalArgumentException(
        s"no WKT1 representation for ${other.getClass.getSimpleName}")
    }
  }

  /** All PARAMETER nodes of a CRS tree as a lowercase name → value map
   * (shared by the WKT1 and WKT2 branches). */
  private def paramsOf(root: Node): Map[String, Double] =
    root.findAll("PARAMETER").flatMap { p =>
      for (n <- p.strings.headOption; v <- p.numbers.headOption)
        yield n.toLowerCase -> v
    }.toMap

  /** WKT2 PROJCRS: CONVERSION/METHOD + EPSG parameter names → catalog. */
  private def wkt2Proj(root: Node): Crs.Proj = {
    val method = root.find("METHOD").flatMap(_.strings.headOption)
      .getOrElse(throw new IllegalArgumentException("PROJCRS without METHOD"))
    val params = paramsOf(root)
    def d(k: String, dflt: Double): Double = params.getOrElse(k, dflt)
    val lat0 = d("latitude of natural origin", d("latitude of origin", 0))
    val lon0 = d("longitude of natural origin", d("longitude of origin", 0))
    val m = method.toLowerCase
    if (m.contains("transverse mercator"))
      Crs.Tmerc(lat0, lon0, d("scale factor at natural origin", 1.0),
        d("false easting", 0), d("false northing", 0))
    else if (m.contains("mercator")) Crs.Mercator(lon0)
    else if (m.contains("lambert conic conformal"))
      Crs.Lcc(d("latitude of 1st standard parallel", 33),
        d("latitude of 2nd standard parallel", 45),
        d("latitude of false origin", lat0), d("longitude of false origin", lon0))
    else if (m.contains("albers"))
      Crs.Albers(d("latitude of 1st standard parallel", 29.5),
        d("latitude of 2nd standard parallel", 45.5),
        d("latitude of false origin", lat0), d("longitude of false origin", lon0))
    else if (m.contains("lambert azimuthal")) Crs.Laea(lat0, lon0)
    else if (m.contains("orthographic")) Crs.Orthographic(lat0, lon0)
    else if (m.contains("stereographic")) Crs.Stereographic(lat0, lon0)
    else if (m.contains("equidistant cylindrical") || m.contains("plate carr"))
      Crs.Equirectangular(d("latitude of 1st standard parallel", 0), lon0)
    else if (m.contains("robinson")) Crs.Robinson(lon0)
    else if (m.contains("sinusoidal")) Crs.Sinusoidal(lon0)
    else if (m.contains("mollweide")) Crs.Mollweide(lon0)
    else if (m.contains("winkel")) Crs.WinkelTripel(lon0)
    else throw new IllegalArgumentException(s"unsupported METHOD[$method]")
  }
}
