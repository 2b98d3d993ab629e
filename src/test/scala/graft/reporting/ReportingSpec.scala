package graft.reporting

import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

/** K9: PDF render verified by an independent mini-parser (xref walk +
  * content-stream text extraction), SMTP delivery verified against a
  * real in-test SMTP server socket — the same stub pattern PipelineSpec
  * uses for the POS HTTP API.
  */
class ReportingSpec extends AnyFunSuite {

  private val sampleMd =
    """# Cumulative Sales Report
      |
      |## KPIs
      |
      |Total Revenue: **$1,234.56** over `42` receipts (50% growth).
      |
      || product | qty |
      ||---|---|
      || Burger (classic) | 10 |
      || Fries | 5 |
      |""".stripMargin

  // ---- independent mini PDF parser (spec-side; shares no renderer code)

  private def parsePdf(bytes: Array[Byte]): (Int, Seq[String]) = {
    val s = new String(bytes, "ISO-8859-1")
    assert(s.startsWith("%PDF-1.4\n"), "bad header")
    assert(s.endsWith("%%EOF\n"), "bad trailer")
    // startxref points at the xref table
    val xrefOff = s.substring(s.lastIndexOf("startxref")).split("\n")(1).trim.toInt
    assert(s.startsWith("xref", xrefOff), s"startxref $xrefOff does not hit the xref table")
    val size = s.substring(xrefOff).split("\n")(1).split(" ")(1).toInt
    // every declared object offset must land exactly on "N 0 obj"
    val entries = s.substring(xrefOff).split("\n").slice(3, 2 + size)
    entries.zipWithIndex.foreach { case (e, i) =>
      val off = e.split(" ")(0).toInt
      assert(s.startsWith(s"${i + 1} 0 obj", off), s"object ${i + 1} not at declared offset $off")
    }
    val pageCount = "/Count (\\d+)".r.findFirstMatchIn(s).get.group(1).toInt
    // extract text: (...) Tj runs, unescaped
    val texts = "\\((?:[^()\\\\]|\\\\.)*\\) Tj".r.findAllIn(s).map { t =>
      t.stripSuffix(") Tj").stripPrefix("(")
        .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
    }.toSeq
    (pageCount, texts)
  }

  test("PdfRenderer: xref offsets exact; headings/tables/markers render as text") {
    val (pages, texts) = parsePdf(PdfRenderer.render(sampleMd))
    assert(pages === 1)
    assert(texts.contains("Cumulative Sales Report"))
    assert(texts.contains("KPIs"))
    // inline markers stripped, money/parens escaped round trip
    assert(texts.contains("Total Revenue: $1,234.56 over 42 receipts (50% growth)."))
    assert(texts.exists(_.contains("| Burger (classic) | 10 |")))
  }

  test("PdfRenderer: long reports paginate; every page object has a content stream") {
    val long = "# Long\n" + (1 to 200).map(i => s"line $i\n\n").mkString
    val bytes = PdfRenderer.render(long)
    val (pages, texts) = parsePdf(bytes)
    assert(pages > 1, "200 paragraphs must overflow one US-Letter page")
    assert(texts.contains("line 1") && texts.contains("line 200"), "text lost across page break")
    val s = new String(bytes, "ISO-8859-1")
    assert("/Contents \\d+ 0 R".r.findAllIn(s).size === pages)
  }

  // ---- in-test SMTP server

  /** Minimal RFC 5321 server: multiline EHLO reply, AUTH LOGIN, DATA
    * capture up to the dot terminator. Records the raw DATA payload and
    * the auth exchange.
    */
  private def startSmtpStub(): (ServerSocket, () => (String, Seq[String])) = {
    val server = new ServerSocket(0)
    @volatile var data = ""
    @volatile var log = Vector.empty[String]
    val t = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      def reply(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
      reply("220 stub ESMTP")
      var line = in.readLine()
      while (line != null) {
        log :+= line
        val upper = line.toUpperCase
        if (upper.startsWith("EHLO")) { reply("250-stub greets you"); reply("250 AUTH LOGIN") }
        else if (upper.startsWith("AUTH LOGIN")) {
          reply("334 VXNlcm5hbWU6")
          log :+= in.readLine() // base64 username
          reply("334 UGFzc3dvcmQ6")
          log :+= in.readLine() // base64 password
          reply("235 authed")
        }
        else if (upper.startsWith("MAIL FROM")) reply("250 sender ok")
        else if (upper.startsWith("RCPT TO")) reply("250 recipient ok")
        else if (upper.startsWith("DATA")) {
          reply("354 go ahead")
          val sb = new StringBuilder
          var l = in.readLine()
          while (l != null && l != ".") { sb.append(l).append("\r\n"); l = in.readLine() }
          data = sb.toString
          reply("250 OK queued as 42")
        }
        else if (upper.startsWith("QUIT")) { reply("221 bye"); sock.close(); line = null }
        else reply("250 ok")
        if (line != null) line = in.readLine()
      }
    })
    t.setDaemon(true)
    t.start()
    (server, () => (data, log))
  }

  test("Emailer: full SMTP session; MIME parses back to exact PDF bytes") {
    val (server, captured) = startSmtpStub()
    try {
      val pdf = PdfRenderer.render(sampleMd)
      val msg = Emailer.reportMessage(
        "pipeline@example.com", "owner@example.com",
        "2025-07", "monthly", "monthly_2025-07.pdf", pdf)
      assert(msg.subject === "Monthly Sales Report: 2025-07")
      val reply = Emailer.send(
        Emailer.SmtpConfig("localhost", server.getLocalPort,
          user = Some("u"), password = Some("p")),
        msg)
      assert(reply.startsWith("250"))
      val (data, log) = captured()
      assert(log.exists(_ == "MAIL FROM:<pipeline@example.com>"))
      assert(log.exists(_ == "RCPT TO:<owner@example.com>"))
      // headers
      assert(data.contains("Subject: Monthly Sales Report: 2025-07"))
      assert(data.contains("Attached monthly sales report for 2025-07."))
      assert(data.contains("""Content-Disposition: attachment; filename="monthly_2025-07.pdf""""))
      // attachment round trip: base64 block between the last boundary pair
      val b64 = data.split("\r\n")
        .dropWhile(!_.startsWith("Content-Disposition: attachment")).drop(2)
        .takeWhile(l => l.nonEmpty && !l.startsWith("--"))
        .mkString
      assert(java.util.Base64.getMimeDecoder.decode(b64).toSeq === pdf.toSeq,
        "PDF bytes corrupted in MIME transit")
    } finally server.close()
  }

  test("Emailer: dot-stuffing survives transit") {
    val (server, captured) = startSmtpStub()
    try {
      val msg = Emailer.Message(
        "a@x", "b@y", "subj", ".leading dot line\nnormal", "f.bin", Array[Byte](1, 2, 3))
      Emailer.send(Emailer.SmtpConfig("localhost", server.getLocalPort), msg)
      val (data, _) = captured()
      // the server's capture keeps the stuffed form; un-stuffing yields the original
      assert(data.contains("\r\n..leading dot line"))
    } finally server.close()
  }
}
