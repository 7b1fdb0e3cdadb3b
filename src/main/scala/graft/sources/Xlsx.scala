package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** S3: Excel (.xlsx) source with no new dependencies — an xlsx is a
  * zip of XML parts, so the JDK's ZipInputStream + StAX cover the
  * reference's Excel ingest entry
  * (/root/reference/utils/importer/importer_etl.py:31,
  * automapper.py:27) that SURVEY §2.1 previously declared
  * out-of-scope ("pre-convert to CSV").
  *
  * Supported: the first worksheet, shared strings (with formatting
  * runs), inline strings, raw number/boolean/formula-string values,
  * sparse cells (absent cells read as null). Every column is a
  * string, exactly like the CSV path — the importer's repair
  * functions own typing on both.
  *
  * Plan shape: files arrive through the distributed binaryFile
  * source and each workbook parses INSIDE its executor task; only
  * the first file's header row is read driver-side to fix the
  * schema (config-sized, like the mapping CSV). A directory of
  * workbooks scales file-parallel; one giant workbook does not split
  * (xlsx is not a splittable format) — convert to parquet/CSV at
  * that point, as any engine would.
  */
object Xlsx {

  /** Parse the first worksheet of one workbook: rows of cell strings,
    * `width`-padded (absent cells null). `width` <= 0 means natural
    * row widths (used for the header probe). */
  private[sources] def parseSheet(bytes: Array[Byte],
      width: Int): Seq[Array[String]] = {
    var sheetXml: Array[Byte] = null
    var sstXml: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/sharedStrings.xml") sstXml = readAll(zin)
        // first sheet only — the reference importer reads sheet 1
        else if (e.getName == "xl/worksheets/sheet1.xml")
          sheetXml = readAll(zin)
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetXml != null, "xlsx: xl/worksheets/sheet1.xml missing")
    val shared = if (sstXml == null) IndexedSeq.empty[String]
      else parseSharedStrings(sstXml)
    parseRows(sheetXml, shared, width)
  }

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** <si> entries; formatting runs (<r><t>..</t></r>) concatenate. */
  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    val r = newReader(xml)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear()
            case "t" => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += sb.toString
            case _ => ()
          }
        case _ => ()
      }
    }
    out.toIndexedSeq
  }

  private def parseRows(xml: Array[Byte], shared: IndexedSeq[String],
      width: Int): Seq[Array[String]] = {
    val rows = ArrayBuffer.empty[Array[String]]
    val cells = ArrayBuffer.empty[(Int, String)]
    var colIdx = 0 // next sequential index when r= is absent
    var cellRef: String = null
    var cellType: String = null
    val sb = new StringBuilder
    var inV = false
    val r = newReader(xml)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells.clear(); colIdx = 0
            case "c" =>
              cellRef = r.getAttributeValue(null, "r")
              cellType = r.getAttributeValue(null, "t")
              sb.clear()
            case "v" | "t" => inV = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => inV = false
            case "c" =>
              val i = if (cellRef != null) colOf(cellRef) else colIdx
              colIdx = i + 1
              val raw = sb.toString
              val v = cellType match {
                case "s" => shared(raw.trim.toInt)
                case _ => raw // inlineStr text, numbers, b, str
              }
              if (v.nonEmpty) cells += ((i, v))
            case "row" =>
              val w = if (width > 0) width
                else cells.lastOption.map(_._1 + 1).getOrElse(0)
              val arr = new Array[String](w)
              cells.foreach { case (i, v) => if (i < w) arr(i) = v }
              rows += arr
            case _ => ()
          }
        case _ => ()
      }
    }
    rows.toSeq
  }

  /** "BC12" → 0-based column index 54. */
  private def colOf(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def newReader(xml: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // parse data, never fetch: xlsx parts carry DTD-free XML, and an
    // untrusted workbook must not make the executor touch the network
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
  }

  /** Read every .xlsx under `dir` into one DataFrame (first sheet,
    * all-string columns). With `header`, the first row of the
    * lexicographically-first file names the columns and each file's
    * first row is dropped; otherwise columns are c1..cn. */
  def xlsx(spark: SparkSession, dir: String,
      header: Boolean = true): DataFrame = {
    import spark.implicits._
    val files = Sources.binaryFiles(spark, dir, "*.xlsx")
    // header probe: one workbook, driver-side — config-sized, the
    // same allowance as the mapping CSV (schema must exist at plan
    // time; per-file parsing below stays in the executors)
    val probe = files.orderBy("path").select("content")
      .as[Array[Byte]].head()
    val head = parseSheet(probe, 0).headOption
      .getOrElse(Array.empty[String])
    val names =
      if (header) head.zipWithIndex.map { case (h, i) =>
        if (h == null || h.isEmpty) s"c${i + 1}" else h }
      else head.indices.map(i => s"c${i + 1}").toArray
    val w = names.length
    val drop = if (header) 1 else 0
    val parsed = files.select("content").as[Array[Byte]]
      .flatMap(b => parseSheet(b, w).drop(drop))
    parsed.select(names.zipWithIndex.map { case (nm, i) =>
      col("value").getItem(i).as(nm) }.toSeq: _*)
  }
}
