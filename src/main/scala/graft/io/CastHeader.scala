package graft.io

import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Locale

/** Parsed Seabird header metadata — the reference's `_metadata` dict
  * (ctd/read.py:207-218). */
final case class CastHeader(
    name: String,               // FileName stem or "unknown"
    header: String,             // '*' lines joined
    config: String,             // '#' lines joined
    names: Vector[String],      // column names (deduped)
    skiprows: Int,              // first data line index
    time: Option[Timestamp],    // NMEA UTC
    lon: Option[Double],
    lat: Option[Double],
    badFlag: Option[Double] = None) // '# bad_flag = X' sentinel

/**
 * Line-state-machine port of `_parse_seabird` (ctd/read.py:122-219) plus the
 * shared helpers: `_normalize_names` (read.py:30-33), duplicate-column rename
 * (read.py:95-119), NMEA coordinate parse (read.py:153-174) and header
 * timestamp parse (read.py:175-181).
 */
object CastHeader {

  /** strip whitespace then surrounding '*' — `_normalize_names`. */
  def normalizeName(s: String): String = {
    val t = s.trim
    t.replaceAll("^\\*+|\\*+$", "")
  }

  /** Duplicate names: >2 of a kind is an error; the second occurrence gets a
    * trailing underscore — `_remane_duplicate_columns` (read.py:95-119). */
  def renameDuplicates(names: Vector[String]): Vector[String] = {
    val counts = names.groupBy(identity).view.mapValues(_.size)
    counts.find(_._2 > 2).foreach { case (n, c) =>
      throw new IllegalArgumentException(
        s"Cannot handle more than two duplicated columns. Found $c for $n.")
    }
    val dup = counts.filter(_._2 > 1).keys.toSet
    if (dup.isEmpty) names
    else {
      val out = names.toArray
      dup.foreach { d =>
        val lastIdx = names.lastIndexOf(d)
        out(lastIdx) = d + "_"
      }
      out.toVector
    }
  }

  /** `"39 16.23" + hemisphere` -> signed decimal degrees. Returns None when
    * unparsable (the EDF readers tolerate missing positions). */
  def nmeaDegrees(body: String, hemisphere: Char): Option[Double] = {
    val parts = body.trim.split("\\s+").filter(_.nonEmpty)
    if (parts.length < 2) return None
    try {
      val deg = parts(0).toDouble
      val min = parts(1).toDouble
      hemisphere match {
        case 'N' | 'E' => Some(deg + min / 60.0)
        case 'S' | 'W' => Some(-(deg + min / 60.0))
        case _         => None
      }
    } catch { case _: NumberFormatException => None }
  }

  private val HeaderTimeFmt =
    DateTimeFormatter.ofPattern("MMM d yyyy H:mm:ss", Locale.ENGLISH)

  /** `"Jul 12 2013  12:59:28"` (whitespace-flexible like strptime) -> UTC. */
  def parseHeaderTime(s: String): Option[Timestamp] = {
    val norm = s.trim.replaceAll("\\s+", " ")
    try Some(Timestamp.from(
      LocalDateTime.parse(norm, HeaderTimeFmt).toInstant(ZoneOffset.UTC)))
    catch { case _: Exception => None }
  }

  private val SbeoxFix = "(\\S)Sbeox".r

  /** Port of `_parse_seabird(lines, ftype)`; ftype is "cnv" or "btl". */
  def parse(lines: Array[String], ftype: String): CastHeader = {
    var fname: Option[String] = None
    var skiprows              = 0
    var time: Option[Timestamp] = None
    var lon: Option[Double]     = None
    var lat: Option[Double]     = None
    var badFlag: Option[Double] = None
    val header = Vector.newBuilder[String]
    val config = Vector.newBuilder[String]
    var names  = Vector.empty[String]

    var k = 0
    var done = false
    while (k < lines.length && !done) {
      val line = lines(k).trim

      if (ftype == "cnv" && line.contains("# name")) {
        // "# name 3 = c0S/m: Conductivity [S/m]" -> name left of first ':'
        val afterEq = line.split("=", 2)(1)
        val nameUnit = afterEq.split(":", 2)
        names = names :+ normalizeName(nameUnit(0))
      }

      if (line.startsWith("*")) {
        header += line
        if (line.contains("FileName")) {
          val filePath = line.split("=").last.trim
          // Path stem of a Windows-style path: strip dirs (both separators)
          // and extension.
          val base = filePath.substring(
            math.max(filePath.lastIndexOf('\\'), filePath.lastIndexOf('/')) + 1)
          val dot = base.lastIndexOf('.')
          fname = Some(if (dot > 0) base.substring(0, dot) else base)
        }
      }
      if (line.startsWith("#")) {
        config += line
        // '# bad_flag = -9.990e-29': SBE's missing-value sentinel
        if (line.contains("bad_flag")) {
          val tok = line.split("=", 2).last.trim
          try badFlag = Some(tok.toDouble) catch { case _: NumberFormatException => }
        }
      }

      if (line.contains("NMEA Latitude") && line.nonEmpty) {
        val hemi = line.last
        lat = nmeaDegrees(line.dropRight(1).split("=", 2).last, hemi)
        if (lat.isEmpty)
          throw new IllegalArgumentException(s"Latitude not recognized: $line")
      }
      if (line.contains("NMEA Longitude") && line.nonEmpty) {
        val hemi = line.last
        lon = nmeaDegrees(line.dropRight(1).split("=", 2).last, hemi)
        if (lon.isEmpty)
          throw new IllegalArgumentException(s"Longitude not recognized: $line")
      }
      if (line.contains("NMEA UTC (Time)"))
        time = parseHeaderTime(line.split("=").last)

      if (ftype == "cnv") {
        if (line == "*END*") { skiprows = k + 1; done = true }
      } else {
        // btl: data-header row = first non-empty line that is neither '*' nor
        // '#'; the physical row after it ("Position Time") is also skipped.
        if (line.nonEmpty && !line.startsWith("*") && !line.startsWith("#")) {
          val fixed = SbeoxFix.replaceAllIn(line, "$1 Sbeox")
          names = fixed.split("\\s+").filter(_.nonEmpty).toVector
          skiprows = k + 2
          done = true
        }
      }
      k += 1
    }
    if (ftype == "btl") names = names :+ "Statistic"
    CastHeader(
      name = fname.getOrElse("unknown"),
      header = header.result().mkString("\n"),
      config = config.result().mkString("\n"),
      names = renameDuplicates(names),
      skiprows = skiprows,
      time = time, lon = lon, lat = lat, badFlag = badFlag)
  }
}
