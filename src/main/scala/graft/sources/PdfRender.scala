package graft.sources

import scala.collection.mutable.ArrayBuffer

/** S12: HTML → paginated PDF, with no rendering dependency — the
  * reference shells out to headless Chromium / pdfkit per row
  * (/root/reference/utils/html_to_pdf/pupeeter.py:25-54,
  * html_to_pdf_printer.py:26-43); neither exists on a Spark executor,
  * so the engine renders the text layer itself: strip the HTML to
  * block-level lines, wrap, paginate onto A4 pages, and emit a
  * well-formed PDF 1.4 (catalog → pages → page + content stream per
  * page, base-14 Helvetica, exact xref offsets).
  *
  * Fidelity contract (documented, deliberate): this is a TEXT
  * rendering — images, CSS and scripts are dropped, and characters
  * outside Latin-1 print as '?' (base-14 fonts are WinAnsi; CJK would
  * need font embedding, which belongs in a real render farm, not an
  * analytics engine). What the engine owns is the distributed part:
  * per-row rendering inside executor tasks and a durable manifest —
  * the reference's driver-side for-loop becomes data-parallel.
  */
object PdfRender {

  /** A4 portrait in PostScript points. */
  val PageW = 595
  val PageH = 842
  val Margin = 40
  val FontSize = 10
  val Leading = 12

  /** Lines that fit one page at the fixed leading. */
  val LinesPerPage: Int = (PageH - 2 * Margin) / Leading // 63

  private val BlockEnd =
    "(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|section|article)>|<br\\s*/?>"

  /** HTML → wrapped text lines: scripts/styles dropped, block ends
    * become newlines, tags stripped, entities decoded, words wrapped
    * at `wrapCols`. Pure + deterministic (runs per-row in tasks). */
  def htmlToLines(html: String, wrapCols: Int = 95): Seq[String] = {
    val noScript = html
      .replaceAll("(?is)<script.*?</script>", " ")
      .replaceAll("(?is)<style.*?</style>", " ")
      .replaceAll("(?is)<!--.*?-->", " ")
    val blocks = noScript.replaceAll(BlockEnd, "\n")
    val noTags = blocks.replaceAll("(?s)<[^>]*>", " ")
    val decoded = decodeEntities(noTags)
    decoded.split('\n').toSeq
      .map(_.replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim)
      .filter(_.nonEmpty)
      .flatMap(wrap(_, wrapCols))
  }

  private def decodeEntities(s: String): String = {
    val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
      "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")
    val m = java.util.regex.Pattern
      .compile("&(#x?[0-9a-fA-F]+|[a-zA-Z]+);").matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val e = m.group(1)
      val rep =
        if (e.startsWith("#x") || e.startsWith("#X"))
          safeCp(Integer.parseInt(e.drop(2), 16))
        else if (e.startsWith("#")) safeCp(Integer.parseInt(e.drop(1)))
        else named.getOrElse(e, m.group(0))
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  private def safeCp(cp: Int): String =
    if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
    else "?"

  private def wrap(line: String, cols: Int): Seq[String] =
    if (line.length <= cols) Seq(line)
    else {
      val out = ArrayBuffer.empty[String]
      var rest = line
      while (rest.length > cols) {
        val cut = rest.lastIndexOf(' ', cols) match {
          case i if i > 0 => i
          case _ => cols // one unbreakable run: hard cut
        }
        out += rest.substring(0, cut).trim
        rest = rest.substring(cut).trim
      }
      if (rest.nonEmpty) out += rest
      out.toSeq
    }

  /** PDF string escape: Latin-1 printable bytes pass (parens and
    * backslash escaped, 160–255 as octal), everything else '?'. */
  private[sources] def pdfEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      if (c == '(' || c == ')' || c == '\\') { sb += '\\'; sb += c }
      else if (c >= 32 && c <= 126) sb += c
      else if (c >= 160 && c <= 255)
        sb.append(f"\\${c.toInt}%03o")
      else sb += '?'
    }
    sb.toString
  }

  /** Assemble one PDF from pre-paginated pages of text lines. Every
    * byte offset in the xref is exact; objects are
    * 1=Catalog 2=Pages 3=Font, then (page, stream) pairs. */
  def pdfBytes(pages: Seq[Seq[String]]): Array[Byte] = {
    val pageList = if (pages.isEmpty) Seq(Seq.empty[String]) else pages
    val n = pageList.length
    val pageObj = (i: Int) => 4 + 2 * i     // page i's object id
    val streamObj = (i: Int) => 5 + 2 * i
    val objs = ArrayBuffer.empty[String]
    objs += s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    objs += ("2 0 obj\n<< /Type /Pages /Kids [" +
      (0 until n).map(i => s"${pageObj(i)} 0 R").mkString(" ") +
      s"] /Count $n >>\nendobj\n")
    objs += ("3 0 obj\n<< /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n")
    pageList.zipWithIndex.foreach { case (lines, i) =>
      objs += (s"${pageObj(i)} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $PageW $PageH] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents ${streamObj(i)} 0 R >>\nendobj\n")
      val body = new StringBuilder
      body.append(s"BT\n/F1 $FontSize Tf\n$Leading TL\n")
      body.append(s"$Margin ${PageH - Margin - FontSize} Td\n")
      lines.foreach(l => body.append(s"(${pdfEscape(l)}) Tj\nT*\n"))
      body.append("ET\n")
      val stream = body.toString
      objs += (s"${streamObj(i)} 0 obj\n<< /Length ${stream.length} " +
        s">>\nstream\n${stream}endstream\nendobj\n")
    }
    val header = "%PDF-1.4\n"
    val offsets = ArrayBuffer.empty[Int]
    var pos = header.length
    objs.foreach { o => offsets += pos; pos += o.length }
    val xrefPos = pos
    val xref = new StringBuilder
    xref.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => xref.append(f"$o%010d 00000 n \n"))
    xref.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R " +
      s">>\nstartxref\n$xrefPos\n%%EOF\n")
    (header + objs.mkString + xref.toString)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** One document end-to-end: html → lines → pages → pdf bytes. */
  def render(html: String, wrapCols: Int = 95): (Array[Byte], Int) = {
    val lines = htmlToLines(html, wrapCols)
    val pages = lines.grouped(LinesPerPage).toSeq
    (pdfBytes(pages), math.max(1, pages.length))
  }

  /** The reference's clean_filename
    * (html_to_pdf_printer.py:18-19): forbidden chars → '_',
    * trimmed, capped at 100. */
  def cleanName(name: String): String =
    name.trim.replaceAll("[\\\\/*?:\"<>|]", "_").take(100)
}
