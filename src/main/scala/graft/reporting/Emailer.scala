package graft.reporting

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Report delivery over real SMTP (K9; reference analog:
  * `reference/reporting/utils.py:52-96` mails the PDF report as a MIME
  * attachment). Pure JVM: builds the RFC 5322 multipart/mixed message
  * (plain-text body + base64 PDF attachment) and speaks RFC 5321 SMTP
  * over a socket — EHLO, optional STARTTLS upgrade, optional AUTH
  * LOGIN, MAIL FROM / RCPT TO / DATA with dot-stuffing. The spec
  * drives it against an in-test SMTP server the same way PipelineSpec
  * stubs the POS HTTP API.
  */
object Emailer {

  final case class SmtpConfig(
      host: String,
      port: Int,
      user: Option[String] = None,
      password: Option[String] = None,
      startTls: Boolean = false)

  final case class Message(
      from: String,
      to: String,
      subject: String,
      body: String,
      attachmentName: String,
      attachment: Array[Byte])

  /** The reference's message shape: subject "{Frequency} Sales Report:
    * {tag}", body "Attached {frequency} sales report for {tag}.".
    */
  def reportMessage(
      from: String,
      to: String,
      fileTag: String,
      frequency: String,
      pdfName: String,
      pdf: Array[Byte]): Message =
    Message(
      from, to,
      s"${frequency.capitalize} Sales Report: $fileTag",
      s"Attached $frequency sales report for $fileTag.",
      pdfName, pdf)

  private val Boundary = "=_graft_report_boundary"

  /** RFC 5322 + MIME serialization (CRLF line ends, 76-col base64). */
  def mime(msg: Message): String = {
    val b64 = Base64.getMimeEncoder(76, Array('\r', '\n'))
      .encodeToString(msg.attachment)
    Seq(
      s"From: ${msg.from}",
      s"To: ${msg.to}",
      s"Subject: ${msg.subject}",
      "MIME-Version: 1.0",
      s"""Content-Type: multipart/mixed; boundary="$Boundary"""",
      "",
      s"--$Boundary",
      "Content-Type: text/plain; charset=utf-8",
      "",
      msg.body,
      s"--$Boundary",
      "Content-Type: application/pdf",
      "Content-Transfer-Encoding: base64",
      s"""Content-Disposition: attachment; filename="${msg.attachmentName}"""",
      "",
      b64,
      s"--$Boundary--",
      "").mkString("\r\n")
  }

  /** Send over SMTP. Returns the server's final reply to DATA (e.g.
    * "250 OK queued") — callers log it; protocol errors throw with the
    * offending reply, and the watermark-style rule applies upstream:
    * report state only advances on success.
    */
  def send(cfg: SmtpConfig, msg: Message): String = {
    val plain = new Socket(cfg.host, cfg.port)
    var socket: Socket = plain
    try {
      var in = new BufferedReader(new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      var out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)

      def readReply(): String = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        var line = in.readLine()
        val first = line
        while (line != null && line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        if (line == null) throw new java.io.IOException("SMTP connection closed")
        if (first == null) throw new java.io.IOException("SMTP connection closed")
        line
      }
      def cmd(s: String, expect: Int): String = {
        out.write(s + "\r\n"); out.flush()
        val r = readReply()
        if (!r.startsWith(expect.toString))
          throw new java.io.IOException(s"SMTP: '$s' -> '$r' (expected $expect)")
        r
      }

      readReply() // 220 greeting
      cmd("EHLO graft", 250)
      if (cfg.startTls) {
        cmd("STARTTLS", 220)
        val tls = javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(socket, cfg.host, cfg.port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        tls.startHandshake()
        socket = tls
        in = new BufferedReader(new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
        out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)
        cmd("EHLO graft", 250) // state resets after TLS
      }
      (cfg.user, cfg.password) match {
        case (Some(u), Some(p)) =>
          cmd("AUTH LOGIN", 334)
          cmd(Base64.getEncoder.encodeToString(u.getBytes(StandardCharsets.UTF_8)), 334)
          cmd(Base64.getEncoder.encodeToString(p.getBytes(StandardCharsets.UTF_8)), 235)
        case _ => ()
      }
      cmd(s"MAIL FROM:<${msg.from}>", 250)
      cmd(s"RCPT TO:<${msg.to}>", 250)
      cmd("DATA", 354)
      // dot-stuffing: a leading '.' on any line must be doubled
      val stuffed = mime(msg).split("\r\n", -1)
        .map(l => if (l.startsWith(".")) "." + l else l)
        .mkString("\r\n")
      out.write(stuffed)
      if (!stuffed.endsWith("\r\n")) out.write("\r\n")
      out.write(".\r\n")
      out.flush()
      val reply = readReply()
      if (!reply.startsWith("250"))
        throw new java.io.IOException(s"SMTP: DATA rejected: '$reply'")
      cmd("QUIT", 221)
      reply
    } finally socket.close()
  }
}
