package graft.io

import java.io.{BufferedInputStream, ByteArrayOutputStream, FileInputStream, InputStream}
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.zip.GZIPInputStream

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream

/**
 * Whole-file ingestion: decompress + charset-sniff + split to lines.
 * Mirrors the reference's `_read_file` / `_open_compressed`
 * (ctd/read.py:36-92): gzip/gz/bz2/zip accepted (zip: FIRST entry only,
 * read.py:51-59), decoding is chardet-with-replacement there — here a strict
 * UTF-8 attempt falling back to windows-1252 (covers every fixture incl. the
 * cp1252 `alt_bottletest.BTL`), undecodable bytes replaced.
 */
object RawFile {

  val CompressedExts: Set[String] = Set("gzip", "gz", "bz2", "zip")
  val PlainExts: Set[String]      = Set("cnv", "edf", "txt", "ros", "btl", "bl", "csv")

  /** Lowercased extension without the dot ("" if none). */
  def ext(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val i    = base.lastIndexOf('.')
    if (i < 0) "" else base.substring(i + 1).toLowerCase
  }

  /** File stem minus one recognized compression extension, minus its own
    * extension — the reference's `_basename(fname)[1]` applied to the
    * decompressed name (e.g. "CTD-spiked-filtered.cnv.bz2" -> "CTD-spiked-filtered"). */
  def stem(path: String): String = {
    var base = path.substring(path.lastIndexOf('/') + 1)
    if (CompressedExts.contains(ext(base))) base = base.substring(0, base.lastIndexOf('.'))
    val i = base.lastIndexOf('.')
    if (i <= 0) base else base.substring(0, i)
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Raw decompressed bytes of a local file. */
  def bytes(path: String): Array[Byte] = {
    val e = ext(path)
    if (e == "gz" || e == "gzip") {
      val in = new GZIPInputStream(new BufferedInputStream(new FileInputStream(path)))
      try readAll(in) finally in.close()
    } else if (e == "bz2") {
      val in = new BZip2CompressorInputStream(new BufferedInputStream(new FileInputStream(path)))
      try readAll(in) finally in.close()
    } else if (e == "zip") {
      val zf = new java.util.zip.ZipFile(path)
      try {
        val entries = zf.entries()
        if (!entries.hasMoreElements)
          throw new IllegalArgumentException(s"Empty zip archive: $path")
        val in = zf.getInputStream(entries.nextElement()) // first entry only
        try readAll(in) finally in.close()
      } finally zf.close()
    } else if (PlainExts.contains(e)) {
      val in = new BufferedInputStream(new FileInputStream(path))
      try readAll(in) finally in.close()
    } else {
      throw new IllegalArgumentException(
        s"Unrecognized file extension .$e — expected one of " +
          (CompressedExts ++ PlainExts).toSeq.sorted.mkString(", "))
    }
  }

  /** Decode bytes: strict UTF-8, falling back to windows-1252. */
  def decode(raw: Array[Byte]): String = {
    val utf8 = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try utf8.decode(java.nio.ByteBuffer.wrap(raw)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(raw, Charset.forName("windows-1252"))
    }
  }

  /** Decompressed, decoded, split to lines (any of \r\n, \n, \r). */
  def lines(path: String): Array[String] = toLines(decode(bytes(path)))

  def toLines(text: String): Array[String] = text.split("\r\n|\n|\r", -1)
}
