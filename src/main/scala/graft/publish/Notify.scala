package graft.publish

import java.nio.charset.StandardCharsets
import java.util.Base64

/** K7: the notification client — the engine-side twin of the
  * reference's `Sendemail.sendemail` (Sendemail.py:9-45): an
  * EmailMessage with an HTML alternative body plus MIME attachments,
  * delivered over SMTP. Here the MESSAGE is built deterministically
  * (RFC 5322 headers + multipart MIME, fixed boundaries so tests can
  * assert the exact bytes) and the delivery is an injected transport —
  * the same seam as the K4 REST sink (Sinks.postPayloads) and the K10
  * blob adapter, so air-gapped tests drive the full path without a
  * network. A production deployment injects an SMTP client; nothing
  * engine-side changes.
  */
object Notify {

  /** MIME type by file extension — the engine's needs are the
    * reference's artifact set (mimetypes.guess_type, Sendemail.py:30). */
  def mimeType(filename: String): String = {
    val ext = filename.reverse.takeWhile(_ != '.').reverse.toLowerCase
    ext match {
      case "png" => "image/png"
      case "jpg" | "jpeg" => "image/jpeg"
      case "gif" => "image/gif"
      case "csv" => "text/csv"
      case "json" => "application/json"
      case "txt" => "text/plain"
      case "html" => "text/html"
      case "pdf" => "application/pdf"
      case _ => "application/octet-stream"
    }
  }

  private def b64Wrapped(bytes: Array[Byte]): String =
    Base64.getEncoder.encodeToString(bytes).grouped(76).mkString("\r\n")

  /** Header-safe value: CR/LF can never reach a header line (header
    * injection), and non-ASCII values are RFC 2047 B-encoded so the
    * message stays 7-bit-clean. */
  private[publish] def headerValue(raw: String): String = {
    val clean = raw.replaceAll("[\r\n]+", " ")
    if (clean.forall(c => c >= 32 && c < 127)) clean
    else "=?utf-8?B?" +
      Base64.getEncoder.encodeToString(clean.getBytes(StandardCharsets.UTF_8)) +
      "?="
  }

  /** Attachment-filename-safe value: drops quotes and CR/LF (the
    * characters that would escape the quoted parameter). */
  private[publish] def filenameValue(raw: String): String =
    raw.replaceAll("[\"\r\n]", "")

  /** Build the full RFC 5322 message text: multipart/mixed carrying a
    * multipart/alternative (the HTML body — the structure
    * `EmailMessage.add_alternative` + `add_attachment` produces,
    * Sendemail.py:25-36) followed by base64 attachment parts. Fixed
    * boundaries keep the output a pure function of its inputs. */
  def buildEmail(subject: String, from: String, to: Seq[String],
                 cc: Seq[String], messageHtml: String,
                 attachments: Seq[(String, Array[Byte])] = Seq.empty,
                 mixedBoundary: String = "graft-mixed",
                 altBoundary: String = "graft-alt"): String = {
    require(to.nonEmpty, "email needs at least one recipient")
    val sb = new StringBuilder
    def line(s: String): Unit = { sb.append(s); sb.append("\r\n") }
    line(s"Subject: ${headerValue(subject)}")
    line(s"From: ${headerValue(from)}")
    line(s"To: ${headerValue(to.mkString(", "))}")
    if (cc.nonEmpty) line(s"CC: ${headerValue(cc.mkString(", "))}")
    line("MIME-Version: 1.0")
    line(s"""Content-Type: multipart/mixed; boundary="$mixedBoundary"""")
    line("")
    line(s"--$mixedBoundary")
    line(s"""Content-Type: multipart/alternative; boundary="$altBoundary"""")
    line("")
    line(s"--$altBoundary")
    line("""Content-Type: text/html; charset="utf-8"""")
    line("Content-Transfer-Encoding: base64")
    line("")
    line(b64Wrapped(messageHtml.getBytes(StandardCharsets.UTF_8)))
    line(s"--$altBoundary--")
    attachments.foreach { case (name, bytes) =>
      val safeName = filenameValue(name)
      line(s"--$mixedBoundary")
      line(s"""Content-Type: ${mimeType(name)}; name="$safeName"""")
      line("Content-Transfer-Encoding: base64")
      line(s"""Content-Disposition: attachment; filename="$safeName"""")
      line("")
      line(b64Wrapped(bytes))
    }
    line(s"--$mixedBoundary--")
    sb.toString
  }

  /** Build + deliver via the injected transport with the K4 retry
    * policy. `transport` receives (recipients, rendered message) —
    * `smtplib.SMTP.sendmail`'s surface (Sendemail.py:42-45). */
  def sendEmail(transport: (Seq[String], String) => Unit,
                subject: String, from: String, to: Seq[String],
                cc: Seq[String], messageHtml: String,
                attachments: Seq[(String, Array[Byte])] = Seq.empty,
                maxAttempts: Int = 3, baseDelayMs: Long = 500): Unit = {
    val msg = buildEmail(subject, from, to, cc, messageHtml, attachments)
    graft.util.Retry.withLinearBackoff(maxAttempts, baseDelayMs)(_ =>
      transport(to ++ cc, msg))
  }
}
