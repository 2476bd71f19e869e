package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class CharsetsSpec extends AnyFunSuite {

  private def enc(s: String, cs: String): Array[Byte] = {
    val e = java.nio.charset.Charset.forName(cs).newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val bb = e.encode(java.nio.CharBuffer.wrap(s))
    val out = new Array[Byte](bb.remaining()); bb.get(out); out
  }

  test("BOMs win over everything and strip") {
    val t = "bom text — ünïcode"
    val utf8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ t.getBytes("UTF-8")
    // a lying meta tag must lose to the BOM
    val lying = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      s"""<meta charset="koi8-r">$t""".getBytes("UTF-8")
    assert(Charsets.sniff(utf8, null) == (("utf-8-bom", t, null)))
    assert(Charsets.sniff(lying, null)._1 == "utf-8-bom")
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++ t.getBytes("UTF-16LE")
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++ t.getBytes("UTF-16BE")
    assert(Charsets.sniff(le, null) == (("utf-16le", t, null)))
    assert(Charsets.sniff(be, null) == (("utf-16be", t, null)))
  }

  test("header charset param, then meta prescan, decode the legacy families exactly") {
    val cases = Seq(
      ("windows-1251", "русский текст в кодировке"),
      ("koi8-r", "русский в КОИ-8"),
      ("shift_jis", "日本語のテキスト"),
      ("euc-kr", "한국어 텍스트"),
      ("big5", "中文測試文字"),
      ("gbk", "简体中文测试"),
      ("iso-8859-15", "café naïve €"),
      ("windows-1250", "żółć łódź"))
    cases.foreach { case (label, suffix) =>
      val jdk = Charsets.resolve(label).get
      val text = s"<html><body>plain ascii then: $suffix</body></html>"
      // via transport header
      val viaHeader = Charsets.sniff(text.getBytes(jdk), s"text/html; charset=$label")
      assert(viaHeader == ((label, text, null)), s"$label header")
      // via meta tag (tag itself is ASCII-safe in all these charsets)
      val metaText = s"""<html><head><meta charset="$label"></head><body>$suffix</body></html>"""
      val viaMeta = Charsets.sniff(metaText.getBytes(jdk), "text/html")
      assert(viaMeta == ((label, metaText, null)), s"$label meta")
      // via http-equiv form
      val heText = s"""<html><head><meta http-equiv="Content-Type" content="text/html; charset=$label"></head><body>$suffix</body></html>"""
      val viaHe = Charsets.sniff(heText.getBytes(jdk), null)
      assert(viaHe == ((label, heText, null)), s"$label http-equiv")
    }
  }

  test("undeclared pages: valid UTF-8 passes, invalid quarantines loudly") {
    val t = "undeclared but fine — даже юникод"
    assert(Charsets.sniff(t.getBytes("UTF-8"), "text/html") == (("utf-8", t, null)))
    val bad = "ascii prefix ".getBytes("UTF-8") ++ Array[Byte](0xfe.toByte, 0xff.toByte, 0xff.toByte)
    val (cs, text, err) = Charsets.sniff(bad, "text/html")
    assert(cs == null && text == null && err != null && err.startsWith("charset:"))
  }

  test("unknown labels and lying declarations quarantine, never guess") {
    val t = "some text"
    val (_, _, e1) = Charsets.sniff(t.getBytes("UTF-8"), "text/html; charset=klingon-9")
    assert(e1 != null && e1.contains("unknown label 'klingon-9'"))
    // declared shift_jis but the bytes are broken under it
    val broken = s"""<meta charset="shift_jis">x""".getBytes("UTF-8") ++
      Array[Byte](0x81.toByte, 0x20) // 0x81 lead byte + invalid trail
    val (_, _, e2) = Charsets.sniff(broken, null)
    assert(e2 != null && e2.startsWith("charset: bytes invalid"))
  }

  test("WHATWG folding: latin1 labels decode as windows-1252") {
    // 0x92 is a curly apostrophe in cp1252, undefined in real ISO-8859-1;
    // browsers decode latin1-labeled pages as cp1252 — so do we
    val b = "it".getBytes("US-ASCII") ++ Array[Byte](0x92.toByte) ++ "s".getBytes("US-ASCII")
    val (cs, text, err) = Charsets.sniff(b, "text/html; charset=iso-8859-1")
    assert(err == null && cs == "iso-8859-1" && text == "it’s")
  }

  test("prescan window is 1024 bytes: a meta tag beyond it does not bind") {
    val pad = "p" * 1100
    val t = s"<html><body>$pad<meta charset=\"koi8-r\">tail</body></html>"
    val (cs, _, _) = Charsets.sniff(t.getBytes("UTF-8"), null)
    assert(cs == "utf-8") // fell through to UTF-8 validation
  }
}
