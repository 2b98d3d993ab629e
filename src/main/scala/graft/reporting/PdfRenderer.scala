package graft.reporting

/** Markdown → PDF renderer for the report sinks (K9; reference analog:
  * `reference/reporting/utils.py:10-50` converts the Markdown report to
  * PDF before mailing it). Pure JVM, no dependencies: emits PDF 1.4
  * with the base-14 fonts (Helvetica/-Bold for prose, Courier for
  * tables — no font embedding required by the spec) and uncompressed
  * content streams, so output bytes are deterministic and the spec's
  * independent mini-parser can walk the xref table and extract text.
  *
  * Markdown subset — exactly what [[graft.pos.Reports]] emits:
  * `#`/`##`/`###` headings, `|`-tables (rendered in Courier so columns
  * align), blank-line paragraph breaks, `**bold**`/`*italic*`/backtick
  * markers (stripped — layout, not typography, is the contract).
  */
object PdfRenderer {

  private val PageW = 612 // US Letter, 1/72 in units
  private val PageH = 792
  private val Margin = 72

  private final case class Run(text: String, font: String, size: Int, gapAfter: Int)

  /** Render markdown to PDF bytes. */
  def render(markdown: String): Array[Byte] = {
    val runs = markdown.linesIterator.map(layout).toVector
    val pages = paginate(runs)
    assemble(pages)
  }

  /** Convenience: render and write. */
  def renderToFile(markdown: String, path: java.nio.file.Path): Unit =
    java.nio.file.Files.write(path, render(markdown))

  private def strip(s: String): String =
    s.replaceAll("\\*\\*([^*]*)\\*\\*", "$1")
      .replaceAll("\\*([^*]*)\\*", "$1")
      .replaceAll("`([^`]*)`", "$1")

  private def layout(line: String): Run = line match {
    case h if h.startsWith("### ") => Run(strip(h.drop(4)), "F2", 12, 6)
    case h if h.startsWith("## ") => Run(strip(h.drop(3)), "F2", 13, 8)
    case h if h.startsWith("# ") => Run(strip(h.drop(2)), "F2", 16, 10)
    case t if t.startsWith("|") => Run(t, "F3", 8, 2)
    case "" => Run("", "F1", 10, 0)
    case p => Run(strip(p), "F1", 10, 2)
  }

  /** Greedy top-down fill; a run that would cross the bottom margin
    * starts the next page.
    */
  private def paginate(runs: Vector[Run]): Vector[Vector[(Run, Int)]] = {
    val pages = Vector.newBuilder[Vector[(Run, Int)]]
    var page = Vector.newBuilder[(Run, Int)]
    var y = PageH - Margin
    var emptyPage = true
    runs.foreach { r =>
      val advance = r.size + r.gapAfter + 2
      if (y - advance < Margin && !emptyPage) {
        pages += page.result()
        page = Vector.newBuilder[(Run, Int)]
        y = PageH - Margin
      }
      y -= advance
      page += ((r, y))
      emptyPage = false
    }
    val last = page.result()
    if (last.nonEmpty) pages += last
    val out = pages.result()
    if (out.isEmpty) Vector(Vector.empty) else out
  }

  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c >= 32 && c < 127 => c.toString
      case c if c < 256 => f"\\${c.toInt}%03o" // WinAnsi-ish latin-1
      case _ => "?" // outside the base-font range
    }

  private def contentStream(page: Vector[(Run, Int)]): String = {
    val sb = new StringBuilder("BT\n")
    page.foreach { case (r, y) =>
      if (r.text.nonEmpty)
        sb.append(s"/${r.font} ${r.size} Tf 1 0 0 1 $Margin $y Tm (${esc(r.text)}) Tj\n")
    }
    sb.append("ET\n")
    sb.toString
  }

  /** Objects: 1 catalog, 2 pages, 3..5 fonts, then per page
    * (page object, content stream) pairs; xref offsets computed over
    * the serialized byte stream (the part a hand-rolled writer gets
    * wrong first — the spec re-walks them).
    */
  private def assemble(pages: Vector[Vector[(Run, Int)]]): Array[Byte] = {
    val n = pages.length
    val pageObjIds = (0 until n).map(6 + 2 * _)
    val objects = Vector.newBuilder[(Int, String)]
    objects += 1 -> "<< /Type /Catalog /Pages 2 0 R >>"
    objects += 2 ->
      s"<< /Type /Pages /Kids [${pageObjIds.map(i => s"$i 0 R").mkString(" ")}] /Count $n >>"
    objects += 3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objects += 4 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>"
    objects += 5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    pages.zipWithIndex.foreach { case (p, i) =>
      val pid = 6 + 2 * i
      objects += pid ->
        (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
          s"/Resources << /Font << /F1 3 0 R /F2 4 0 R /F3 5 0 R >> >> " +
          s"/Contents ${pid + 1} 0 R >>")
      val cs = contentStream(p)
      objects += (pid + 1) ->
        s"<< /Length ${cs.getBytes("ISO-8859-1").length} >>\nstream\n${cs}endstream"
    }
    val objs = objects.result()
    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = scala.collection.mutable.Map[Int, Int]()
    objs.foreach { case (id, body) =>
      offsets(id) = out.length
      out.append(s"$id 0 obj\n$body\nendobj\n")
    }
    val xrefOff = out.length
    val size = objs.map(_._1).max + 1
    out.append(s"xref\n0 $size\n")
    out.append("0000000000 65535 f \n")
    (1 until size).foreach { id =>
      out.append(f"${offsets(id)}%010d 00000 n \n")
    }
    out.append(s"trailer\n<< /Size $size /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toString.getBytes("ISO-8859-1")
  }
}
