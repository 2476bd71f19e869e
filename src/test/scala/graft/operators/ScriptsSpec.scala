package graft.operators

import graft.SparkTestBase

class ScriptsSpec extends SparkTestBase {
  import spark.implicits._

  private def detect(s: String): (String, Int) = {
    val r = Scripts.detect(Seq((1L, s)).toDF("id", "text"), "id", "text").head()
    (r.getAs[String]("script"), r.getAs[Int]("n_letters"))
  }

  test("dominant scripts, majority rule, mixed, none") {
    assert(detect("plain english words here")._1 == "latin")
    assert(detect("Привет мир это кириллица")._1 == "cyrillic")
    assert(detect("αλφα βητα γαμμα δελτα")._1 == "greek")
    assert(detect("مرحبا بالعالم هذا نص عربي")._1 == "arabic")
    assert(detect("שלום עולם זה טקסט")._1 == "hebrew")
    assert(detect("नमस्ते दुनिया यह पाठ है")._1 == "devanagari")
    assert(detect("北京大学中文系汉字文本处理")._1 == "han")
    assert(detect("ひらがなとカタカナのテキスト")._1 == "kana")
    assert(detect("안녕하세요 세계 한국어 텍스트")._1 == "hangul")
    // exactly half latin half cyrillic -> no strict majority -> mixed
    assert(detect("abcd авгд")._1 == "mixed")
    assert(detect("1234 !?")._1 == "none")
    assert(detect("")._1 == "none")
  }

  test("latin includes the supplement/extended accents; counts are per code point") {
    val (s, n) = detect("café naïve Łódź")
    assert(s == "latin" && n == 13)
  }
}
