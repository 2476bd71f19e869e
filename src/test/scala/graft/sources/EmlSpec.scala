package graft.sources

import graft.SparkTestBase

class EmlSpec extends SparkTestBase {
  import spark.implicits._

  private val crlf = "\r\n"

  private def msg(lines: String*): Array[Byte] = lines.mkString(crlf).getBytes("ISO-8859-1")

  test("simple message: header unfolding, implicit text/plain, 7bit body") {
    val m = msg(
      "From: Alice <alice@example.com>",
      "To: bob@example.com",
      "Subject: a folded",
      "\tsubject line",
      "Date: Fri, 15 Aug 2026 12:00:00 +0000",
      "",
      "Hello Bob.",
      "Second line.")
    val ds = Seq(Eml.EmlFile(1, m)).toDS()
    val parts = Eml.parts(ds).collect()
    assert(parts.length == 1)
    assert(parts(0).mime == "text/plain" && parts(0).part == "1")
    assert(parts(0).text == "Hello Bob." + crlf + "Second line.")
    val env = Eml.envelopes(ds).collect().head
    assert(env.subject == "a folded subject line")
    assert(env.from == "Alice <alice@example.com>")
  }

  test("quoted-printable: =XX, soft breaks, trailing transport padding, literal = fallback") {
    assert(new String(Eml.decodeQuotedPrintable("caf=C3=A9"), "UTF-8") == "café")
    assert(new String(Eml.decodeQuotedPrintable("a=\r\nb"), "US-ASCII") == "ab") // soft break
    assert(new String(Eml.decodeQuotedPrintable("x \r\ny"), "US-ASCII") == "x\r\ny")
    assert(new String(Eml.decodeQuotedPrintable("1 =ZZ 2"), "US-ASCII") == "1 =ZZ 2")
  }

  test("RFC 2047 encoded words: B and Q forms, adjacent joining, underscore space") {
    assert(Eml.decodeEncodedWords("=?UTF-8?B?Y2Fmw6k=?=") == "café")
    assert(Eml.decodeEncodedWords("=?utf-8?q?caf=C3=A9_x?=") == "café x")
    assert(Eml.decodeEncodedWords("=?utf-8?q?one_?= =?utf-8?q?two?=") == "one two")
    assert(Eml.decodeEncodedWords("plain =?utf-8?q?mid?= tail") == "plain mid tail")
  }

  test("nested multipart: alternative inside mixed, dotted paths, attachment metadata") {
    val inner = Seq(
      "Content-Type: multipart/alternative; boundary=\"inner\"",
      "",
      "preamble ignored",
      "--inner",
      "Content-Type: text/plain; charset=utf-8",
      "Content-Transfer-Encoding: quoted-printable",
      "",
      "plain caf=C3=A9",
      "--inner",
      "Content-Type: text/html; charset=us-ascii",
      "",
      "<p>html</p>",
      "--inner--")
    val m = msg(Seq(
      "From: x@example.com",
      "Subject: s",
      "Content-Type: multipart/mixed; boundary=outer",
      "",
      "--outer") ++ inner ++ Seq(
      "--outer",
      "Content-Type: application/pdf; name=\"doc.pdf\"",
      "Content-Disposition: attachment; filename=\"doc.pdf\"",
      "Content-Transfer-Encoding: base64",
      "",
      java.util.Base64.getEncoder.encodeToString("PDFBYTES".getBytes),
      "--outer--",
      "epilogue ignored"): _*)
    val parts = Eml.parts(Seq(Eml.EmlFile(1, m)).toDS()).collect().sortBy(_.part)
    assert(parts.map(_.part).toSeq == Seq("1.1", "1.2", "2"))
    assert(parts(0).text == "plain café")
    assert(parts(1).mime == "text/html" && parts(1).text == "<p>html</p>")
    assert(parts(2).mime == "application/pdf" && parts(2).filename == "doc.pdf" &&
      parts(2).n_bytes == 8 && parts(2).text == null)
  }

  test("boundary-like token inside a body does not split (delimiter must be a line)") {
    val m = msg(
      "Content-Type: multipart/mixed; boundary=bnd",
      "",
      "--bnd",
      "Content-Type: text/plain",
      "",
      "mentions --bnd inline but not at line start? no: this IS line content --bndX",
      "--bnd--")
    val parts = Eml.parts(Seq(Eml.EmlFile(1, m)).toDS()).collect()
    assert(parts.length == 1 && parts(0).text.contains("--bndX"))
  }

  test("mbox split; unknown charset quarantines loudly") {
    val m1 = "From alice Fri Aug 15 12:00:00 2026" + crlf +
      "Subject: first" + crlf + crlf + "body one" + crlf
    val m2 = "From bob Fri Aug 15 12:01:00 2026" + crlf +
      "Subject: second" + crlf + "Content-Type: text/plain; charset=koi8-r" + crlf +
      crlf + "body two" + crlf
    val mbox = (m1 + m2).getBytes("ISO-8859-1")
    val parts = Eml.parts(Seq(Eml.EmlFile(1, mbox)).toDS(), keepCorrupt = true).collect()
    assert(parts.length == 2)
    val envs = Eml.envelopes(Seq(Eml.EmlFile(1, mbox)).toDS(), keepCorrupt = true)
      .collect().sortBy(_.msg)
    assert(envs.map(_.subject).toSeq == Seq("first", "second"))
    intercept[org.apache.spark.SparkException](
      Eml.parts(Seq(Eml.EmlFile(1, mbox)).toDS(), keepCorrupt = false).collect())
    val plan = Eml.parts(Seq(Eml.EmlFile(1, mbox)).toDS()).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"eml extraction must stay map-only:\n$plan")
  }
}
