package graft.sources

import graft.SparkTestBase

class SubtitlesSpec extends SparkTestBase {
  import spark.implicits._

  test("SRT round-trip; tag stripping; multi-line cues") {
    val cs = Seq((0L, 1500L, "First line"), (90061002L, 90061999L, "Two\nlines here"))
    assert(Subtitles.cues(Subtitles.encodeSrt(cs)) == cs)
    val tagged = "1\n00:00:00,000 --> 00:00:01,000\n<i>italic</i> and <font color=\"red\">red</font>\n"
    assert(Subtitles.cues(tagged.getBytes("UTF-8")) == Seq((0L, 1000L, "italic and red")))
  }

  test("WebVTT: header, NOTE blocks, cue ids, settings tail, dot separator, hourless times") {
    val cs = Seq((500L, 2000L, "vtt cue one"), (3600000L, 3601000L, "vtt cue two"))
    assert(Subtitles.cues(Subtitles.encodeVtt(cs)) == cs)
    val hourless = "WEBVTT\n\n01:02.345 --> 01:03.456\nshort form\n"
    assert(Subtitles.cues(hourless.getBytes("UTF-8")) == Seq((62345L, 63456L, "short form")))
    val voiced = "WEBVTT\n\n00:00:01.000 --> 00:00:02.000 line:0 align:middle\n<v Fred>Hi there</v>\n"
    assert(Subtitles.cues(voiced.getBytes("UTF-8")) == Seq((1000L, 2000L, "Hi there")))
  }

  test("malformed timecodes refuse; Spark tier quarantines; map-only plan") {
    val bad = "1\n00:00:xx,000 --> 00:00:01,000\noops\n".getBytes("UTF-8")
    intercept[RuntimeException](Subtitles.cues(bad))
    val backwards = "1\n00:00:05,000 --> 00:00:01,000\noops\n".getBytes("UTF-8")
    intercept[IllegalArgumentException](Subtitles.cues(backwards))
    val ds = Seq(
      Subtitles.SubFile(1, Subtitles.encodeSrt(Seq((0L, 100L, "ok")))),
      Subtitles.SubFile(2, bad)).toDS()
    val rows = Subtitles.cues(ds, keepCorrupt = true).collect().sortBy(_.id)
    assert(rows(0).text == "ok" && rows(0).error == null)
    assert(rows(1).cue == -1 && rows(1).error != null)
    val plan = Subtitles.cues(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"subtitle extraction must stay map-only:\n$plan")
  }
}
