package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delimited-text import with the reference's type-adjustment semantics
 * (ref: src/text/mapshaper-delim-import.mjs:12-218,
 * src/utils/mapshaper-utils.mjs:1000-1023 parseNumber/parseIntlNumber).
 *
 * Spark-first shape: the file is scanned once as all-strings (native CSV
 * source — header, quoting and splitting stay in the codegen'd reader),
 * numeric-field DETECTION is one distributed aggregate pass (per column:
 * "every value parses or is missing" AND "at least one parses" — the
 * reference's tryNumericField rule, mapshaper-delim-import.mjs:182-201),
 * and the CONVERSION is a plain projection of codegen-friendly Column
 * expressions. No per-row driver work; both passes are full-scan parallel,
 * so the importer holds at any input size.
 *
 * Reference semantics mirrored exactly:
 *  - delimiter guess: first of `| \t , ; space` appearing before the first
 *    line break (mapshaper-delim-import.mjs:81-99);
 *  - `field-types=` hints `name:str|:num` (any prefix s/n, case-blind),
 *    d3-style `+name`, `*` = all fields; invalid hints are skipped
 *    (getFieldTypeHints, :102-127);
 *  - `string-fields=` list or `*` (:105-109);
 *  - numeric parse = JS `Number()` on the trimmed string with
 *    comma-thousands groups removed when a comma appears past position 0
 *    (cleanNumericString): decimal/exponent grammar, hex/octal/binary
 *    prefixes, `Infinity`; unparseable -> null;
 *  - `decimal-comma`: `[ .]ddd` group separators dropped, first comma
 *    becomes the decimal point (convertIntlNumber);
 *  - missing values tolerated in numeric columns: blank after trim, `NA`,
 *    `NaN` -> null without disqualifying the column; a column with ONLY
 *    missing values stays string (count>0 rule, :201);
 *  - empty / all-whitespace header names dropped
 *    (mapshaper-data-utils.mjs:98-101).
 */
object DelimImport {

  /** mapshaper-delim-import.mjs:81 — candidate order is significant. */
  val supportedDelimiters: Seq[String] = Seq("|", "\t", ",", ";", " ")

  /** First supported delimiter that occurs before the first line break —
   * the reference's regex `^[^\n\r]+<delim>` needs at least one character
   * before the delimiter, so a line-leading candidate doesn't count. */
  def guessDelimiter(content: String): String = {
    val firstLine = content.takeWhile(c => c != '\n' && c != '\r')
    supportedDelimiters.find(d => firstLine.indexOf(d, 1) > 0).getOrElse(",")
  }

  final case class Options(
      fieldTypes: Seq[String] = Nil,    // field-types=
      stringFields: Seq[String] = Nil,  // string-fields=
      decimalComma: Boolean = false,    // decimal-comma
      csvFields: Seq[String] = Nil,     // csv-fields= (column filter)
      // quoted fields may contain record separators. The reference always
      // allows this; here it is opt-in for FILE reads because Spark's
      // multiLine mode gives up input-split parallelism (each file becomes
      // one task) — at scale, prefer newline-free data. readString always
      // honors embedded newlines.
      multiline: Boolean = false)

  /** getFieldTypeHints (mapshaper-delim-import.mjs:102-127): later valid
   * hints overwrite earlier ones; malformed hints are skipped. */
  def typeHints(opts: Options): Map[String, String] = {
    var hints = Map.empty[String, String]
    opts.stringFields.foreach(f => hints += f -> "string")
    opts.fieldTypes.foreach { raw =>
      if (raw.contains(":")) {
        val Array(name, hint) = raw.split(":", 2)
        val t = hint.toLowerCase
        if (t.startsWith("n")) hints += name -> "number"
        else if (t.startsWith("s")) hints += name -> "string"
        // else: invalid hint, skipped (reference logs a message)
      } else if (raw.startsWith("+")) hints += raw.drop(1) -> "number"
      // bare name with no hint: skipped
    }
    hints
  }

  /** JS String.prototype.trim's whitespace class: Java's \s is ASCII-only,
   * so the Unicode spaces (NBSP, Zs block, LS/PS, ZWNBSP) are added — an
   * NBSP-padded Excel number must still parse. */
  private val JsWs =
    "[\\s\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000\\uFEFF]"
  private val JsTrim = s"^$JsWs+|$JsWs+$$"

  /** JS `Number(clean(trim(s)))` as a Column expression; null when NaN.
   * Stays inside whole-stage codegen (regexps + casts, no UDF). */
  def parseNumberExpr(c: Column, decimalComma: Boolean): Column = {
    val t = regexp_replace(c, JsTrim, "")
    val cleaned =
      if (decimalComma) {
        // convertIntlNumString: drop `[ .]ddd` group separators (global),
        // then the FIRST comma becomes the decimal point
        val noGroups = regexp_replace(t, "[ .]([0-9]{3})", "$1")
        val p = instr(noGroups, ",")
        when(p > 0,
          concat(noGroups.substr(lit(1), p - 1), lit("."),
            noGroups.substr(p + 1, length(noGroups))))
          .otherwise(noGroups)
      } else {
        // cleanNumericString: only when a comma appears past position 0
        when(instr(t, ",") > 1, regexp_replace(t, ",([0-9]{3})", "$1"))
          .otherwise(t)
      }
    jsNumber(cleaned)
  }

  /** JS Number() grammar on an already-cleaned string. */
  private def jsNumber(s: Column): Column = {
    when(s.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
      s.cast("double"))
      .when(s.rlike("^0[xX][0-9a-fA-F]+$"),
        conv(substring(s, 3, 1000000), 16, 10).cast("double"))
      .when(s.rlike("^0[bB][01]+$"),
        conv(substring(s, 3, 1000000), 2, 10).cast("double"))
      .when(s.rlike("^0[oO][0-7]+$"),
        conv(substring(s, 3, 1000000), 8, 10).cast("double"))
      .when(s.isin("Infinity", "+Infinity"), lit(Double.PositiveInfinity))
      .when(s === "-Infinity", lit(Double.NegativeInfinity))
      .otherwise(lit(null).cast("double"))
  }

  /** Missing-in-a-numeric-column test (tryNumericField:188-195): null/blank
   * after trim, or the R-style NA / NaN markers. */
  private def isMissingExpr(c: Column): Column = {
    val t = regexp_replace(c, JsTrim, "")
    c.isNull || t === "" || t === "NA" || t === "NaN"
  }

  /** Quote-aware split of the header line (Spark's own header handling
   * renames duplicates and empty names, so the ORIGINAL field names are
   * re-parsed here and applied positionally). */
  private[sources] def splitHeaderLine(line: String, delim: String): Seq[String] = {
    val d = delim.head
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQ) {
        if (ch == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (ch == '"') inQ = false
        else cur += ch
      } else if (ch == '"' && cur.isEmpty) inQ = true
      else if (ch == d) { out += cur.result(); cur.clear() }
      else cur += ch
      i += 1
    }
    out += cur.result()
    out.toSeq
  }

  /** BOM sniff (mapshaper-encoding-detection.mjs:5-14). */
  def detectEncodingFromBOM(bytes: Array[Byte]): String = {
    val b = bytes.map(_ & 0xff)
    if (b.length >= 2 && b(0) == 0xFE && b(1) == 0xFF) "utf16be"
    else if (b.length >= 2 && b(0) == 0xFF && b(1) == 0xFE) "utf16le"
    else if (b.length >= 3 && b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF) "utf8"
    else ""
  }

  /** Read a delimited FILE: BOM-sniffed encoding (importDelim2,
   * mapshaper-delim-import.mjs:47-59 — UTF-16 files are decoded to a string
   * first; ascii-compatible files stream through the distributed scan),
   * delimiter guessed from the first bytes, then the all-string scan + type
   * adjustment. */
  def read(spark: SparkSession, path: String, opts: Options = Options()): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    // delimiter guess keeps the reference's 2000-char sample; the header
    // line itself is then read in FULL (a wide header must not silently
    // fall back to Spark's mangled names)
    val headBytes = readUpTo(p, 2000)
    detectEncodingFromBOM(headBytes) match {
      case "utf16be" | "utf16le" =>
        // not ascii-compatible: decode whole file (BOM consumed by UTF-16
        // charset) and parse the string — matches the reference, which also
        // gives up on streaming for these
        val text = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_16)
        readString(spark, text, opts)
      case _ =>
        // utf8 BOM or none: ascii-compatible, keep the distributed scan; a
        // UTF-8 BOM only pollutes the first header name — strip it there
        val head = new String(headBytes, java.nio.charset.StandardCharsets.UTF_8)
          .stripPrefix("\uFEFF")
        val delim = guessDelimiter(head)
        if (delim == " ") readFixedWidth(spark, p, opts)
        else {
          val firstLine = fullFirstLine(p, head)
          adjustTypes(rawScan(spark, delim, opts.multiline).csv(path), opts,
            Some(splitHeaderLine(firstLine, delim)))
        }
    }
  }

  private def readUpTo(p: java.nio.file.Path, n: Int): Array[Byte] = {
    val in = java.nio.file.Files.newInputStream(p)
    try {
      val buf = new Array[Byte](n)
      var off = 0
      var r = 0
      while (off < n && { r = in.read(buf, off, n - off); r > 0 }) off += r
      java.util.Arrays.copyOf(buf, off)
    } finally in.close()
  }

  /** Complete first line: extend past the 2000-byte sample when the sample
   * holds no line break (capped at 1 MiB). */
  private def fullFirstLine(p: java.nio.file.Path, head: String): String =
    if (head.exists(c => c == '\n' || c == '\r'))
      head.takeWhile(c => c != '\n' && c != '\r')
    else
      new String(readUpTo(p, 1 << 20), java.nio.charset.StandardCharsets.UTF_8)
        .stripPrefix("\uFEFF")
        .takeWhile(c => c != '\n' && c != '\r')

  /** Import from an in-memory string (the reference's importDelim). The
   * content is staged to a driver-local temp file so the quote-aware CSV
   * parser sees the raw text (embedded newlines in quoted fields survive —
   * the reference's parseDelimText semantics). */
  def readString(spark: SparkSession, content: String, opts: Options = Options()): DataFrame = {
    if (guessDelimiter(content) == " ")
      return fixedWidthFromString(spark, content, opts)
    val tmp = java.nio.file.Files.createTempFile("graft_delim", ".csv")
    java.nio.file.Files.write(tmp, content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    tmp.toFile.deleteOnExit()
    read(spark, tmp.toString, opts.copy(multiline = true))
  }

  private def rawScan(spark: SparkSession, delimiter: String, multiline: Boolean) =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      // keep empty strings as "" (reference records hold '' not null);
      // the NUL sentinel never appears in text, so nothing maps to null
      .option("nullValue", "\u0000")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("multiLine", multiline.toString)
      .option("inferSchema", "false")

  // ---------------------------------------------------------- fixed-width

  /** A space "delimiter" means a fixed-width table in the reference
   * (mapshaper-delim-reader.mjs:16 -> mapshaper-fixed-width.mjs:56-111):
   * column boundaries are inferred from a 2000-char sample (a column starts
   * where a header char follows a space, and every line must be blank in
   * the position before a header start), then each field is
   * `line.substring(start, end).trim()`. Boundary inference runs on the
   * driver sample; the slicing is a distributed substring projection over
   * spark.read.text, so the scan parallelizes like any text source. */
  final case class FwField(name: String, start: Int, end: Option[Int])

  def parseFixedWidthInfo(sample: String): Seq[FwField] = {
    val lines0 = sample.split("\r\n|\r|\n", -1).toSeq
    val lines = if (lines0.length > 2) lines0.dropRight(1) else lines0
    if (lines.isEmpty) return Nil
    val headerLine = lines.head
    val n = lines.map(_.length).max
    def contentChar(str: String, i: Int): Boolean = i < str.length && str.charAt(i) != ' '
    def emptyCol(i: Int): Boolean = !lines.exists(l => contentChar(l, i))
    val out = scala.collection.mutable.ArrayBuffer.empty[FwField]
    var colStart = 0
    var inContent = false
    var inHeader = false
    var i = 0
    while (i <= n) {
      val isHeaderChar = contentChar(headerLine, i)
      val isContentChar = !emptyCol(i)
      val isColStart = isHeaderChar && !inHeader
      if (isColStart && inContent) return Nil // data spans a header boundary
      if (i == n || (i > 0 && isColStart)) {
        val colEnd = if (i == n) None else Some(i - 1)
        out += FwField(substrTrim(headerLine, colStart, colEnd), colStart, colEnd)
        colStart = i
      }
      inContent = isContentChar
      inHeader = isHeaderChar
      i += 1
    }
    out.toSeq
  }

  private def substrTrim(line: String, start: Int, end: Option[Int]): String = {
    val e = math.min(end.getOrElse(line.length), line.length)
    if (start >= e) "" else line.substring(start, e).trim
  }

  private def fixedWidthDf(spark: SparkSession, lines: DataFrame,
                           fields: Seq[FwField], headerLine: String,
                           opts: Options): DataFrame = {
    // drop header occurrences by exact line match (a data line identical to
    // the header would be a degenerate table)
    val data = lines.filter(col("value") =!= headerLine)
    val cols = fields.filter(_.name.trim.nonEmpty).map { f =>
      val len = f.end.map(_ - f.start).getOrElse(Int.MaxValue - f.start - 1)
      regexp_replace(substring(col("value"), f.start + 1, len), JsTrim, "").as(f.name)
    }
    adjustTypes(data.select(cols: _*), opts)
  }

  def readFixedWidth(spark: SparkSession, p: java.nio.file.Path,
                     opts: Options): DataFrame = {
    val sample = new String(readUpTo(p, 2000), java.nio.charset.StandardCharsets.UTF_8)
    val fields = parseFixedWidthInfo(sample)
    require(fields.nonEmpty, s"cannot infer fixed-width columns from $p")
    val header = sample.takeWhile(c => c != '\n' && c != '\r')
    fixedWidthDf(spark, spark.read.text(p.toString), fields, header, opts)
  }

  def fixedWidthFromString(spark: SparkSession, content: String,
                           opts: Options): DataFrame = {
    import spark.implicits._
    val fields = parseFixedWidthInfo(content.substring(0, math.min(2000, content.length)))
    require(fields.nonEmpty, "cannot infer fixed-width columns")
    val lines = content.split("\r\n|\r|\n", -1).toSeq.filter(_.nonEmpty)
    fixedWidthDf(spark, spark.createDataset(lines).toDF("value"),
      fields, lines.head, opts)
  }

  /** adjustRecordTypes (mapshaper-delim-import.mjs:133-166) on a DataFrame
   * of all-string columns. One aggregate pass decides detection; one
   * projection converts. `origNames`, when given and position-aligned,
   * overrides Spark's header mangling (duplicate/empty names get renamed by
   * the CSV source) so invalid-name dropping uses the REAL field names. */
  def adjustTypes(raw: DataFrame, opts: Options,
                  origNames: Option[Seq[String]] = None): DataFrame = {
    // (sparkName, realName) per position
    val pairs: Seq[(String, String)] = origNames match {
      case Some(names) if names.length == raw.columns.length =>
        raw.columns.toSeq.zip(names)
      case _ => raw.columns.toSeq.map(n => (n, n))
    }
    // drop invalid (empty / all-whitespace) names; on a duplicate real name
    // the first occurrence wins (the reference renames dups on EXPORT, but
    // a DataFrame needs resolvable names now)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val valid = pairs.filter { case (_, o) => o.trim.nonEmpty && seen.add(o) }
    val picked0 =
      if (opts.csvFields.nonEmpty) valid.filter(p => opts.csvFields.contains(p._2))
      else valid
    val picked = picked0.map(_._2)
    val df = raw.select(picked0.map { case (s, o) => raw(s).as(o) }: _*)

    val hints = typeHints(opts)
    val allString = opts.stringFields.contains("*") || hints.get("*").contains("string")
    val allNumber = hints.get("*").contains("number")

    // adjustRecordTypes precedence (mapshaper-delim-import.mjs:146-151):
    // `typeHint == 'number' || singleType == 'number'` is tested FIRST, so
    // a number hint anywhere (per-field OR '*') beats a string hint
    def hintOf(name: String): Option[String] = {
      val h = hints.get(name)
      if (h.contains("number") || allNumber) Some("number")
      else if (h.contains("string") || allString) Some("string")
      else None
    }

    val candidates = picked.filter(n => hintOf(n).isEmpty)
    val detected: Set[String] =
      if (candidates.isEmpty) Set.empty
      else {
        // single aggregate row: per column, (forall parses-or-missing, exists parses)
        val aggs = candidates.flatMap { n =>
          val parsed = parseNumberExpr(col(n), opts.decimalComma)
          Seq(
            min(when(parsed.isNotNull || isMissingExpr(col(n)), 1).otherwise(0)).as(s"ok_$n"),
            max(when(parsed.isNotNull, 1).otherwise(0)).as(s"any_$n"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        candidates.zipWithIndex.collect {
          // empty input -> null aggregates -> column stays string
          case (n, i) if !row.isNullAt(2 * i) &&
            row.getInt(2 * i) == 1 && row.getInt(2 * i + 1) == 1 => n
        }.toSet
      }

    val projected = picked.map { n =>
      val numeric = hintOf(n).contains("number") || detected.contains(n)
      if (numeric) parseNumberExpr(col(n), opts.decimalComma).as(n)
      // string fields: missing/trailing-empty cells are '' in the reference's
      // records (readDelimRecords), never null
      else coalesce(col(n), lit("")).as(n)
    }
    df.select(projected: _*)
  }
}
