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

  /** First supported delimiter that occurs before the first line break
   * (the reference assumes header names contain no alternate delimiters). */
  def guessDelimiter(content: String): String = {
    val firstLine = content.takeWhile(c => c != '\n' && c != '\r')
    supportedDelimiters.find(d => firstLine.contains(d)).getOrElse(",")
  }

  final case class Options(
      fieldTypes: Seq[String] = Nil,    // field-types=
      stringFields: Seq[String] = Nil,  // string-fields=
      decimalComma: Boolean = false,    // decimal-comma
      csvFields: Seq[String] = Nil)     // csv-fields= (column filter)

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

  /** JS `Number(clean(trim(s)))` as a Column expression; null when NaN.
   * Stays inside whole-stage codegen (regexps + casts, no UDF). */
  def parseNumberExpr(c: Column, decimalComma: Boolean): Column = {
    // JS String.prototype.trim removes all whitespace incl. tabs/newlines
    val t = regexp_replace(c, "^\\s+|\\s+$", "")
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
    val t = regexp_replace(c, "^\\s+|\\s+$", "")
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
    val headBytes = {
      val in = java.nio.file.Files.newInputStream(p)
      try {
        val buf = new Array[Byte](2000)
        val n = math.max(in.read(buf), 0)
        java.util.Arrays.copyOf(buf, n)
      } finally in.close()
    }
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
        val firstLine = head.takeWhile(c => c != '\n' && c != '\r')
        adjustTypes(rawScan(spark, delim).csv(path), opts,
          Some(splitHeaderLine(firstLine, delim)))
    }
  }

  /** Import from an in-memory string (the reference's importDelim). */
  def readString(spark: SparkSession, content: String, opts: Options = Options()): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(content.split("\r\n|\r|\n", -1).toSeq)
    val delim = guessDelimiter(content)
    val firstLine = content.takeWhile(c => c != '\n' && c != '\r')
    adjustTypes(rawScan(spark, delim).csv(ds), opts,
      Some(splitHeaderLine(firstLine, delim)))
  }

  private def rawScan(spark: SparkSession, delimiter: String) =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      // keep empty strings as "" (reference records hold '' not null)
      .option("nullValue", "\u0000")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("inferSchema", "false")

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

    def hintOf(name: String): Option[String] =
      if (allString) Some("string")
      else if (allNumber) Some("number")
      else hints.get(name)

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
