package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("tokenCount / bpeTokenCount") {
    assert(one("a b  c", TextFunctions.tokenCount(col("text"))) == 3L)
    assert(one("", TextFunctions.tokenCount(col("text"))) == 0L)
    // "don't stop!" -> don, ', t, stop, !
    assert(one("don't stop!", TextFunctions.bpeTokenCount(col("text"))) == 5L)
  }

  test("meanWordLen") {
    assert(one("ab cdef", TextFunctions.meanWordLen(col("text"))) == 3.0)
    assert(one("", TextFunctions.meanWordLen(col("text"))) == 0.0)
  }

  test("repetitionRatio: repeated-token fraction") {
    assert(one("a b c d", TextFunctions.repetitionRatio(col("text"))) == 0.0)
    assert(one("a a a a", TextFunctions.repetitionRatio(col("text"))) == 0.75)
    assert(one("", TextFunctions.repetitionRatio(col("text"))) == 0.0)
  }

  test("stopwordRatio counts occurrences, not distinct") {
    assert(one("the cat the dog", TextFunctions.stopwordRatio(col("text"))) == 0.5)
  }

  test("langId: markers, CJK, undetermined") {
    assert(one("the cat is on the mat", TextFunctions.langId(col("text"))) == "en")
    assert(one("der hund und die katze ist nicht da",
      TextFunctions.langId(col("text"))) == "de")
    assert(one("le chat est dans la maison pour que",
      TextFunctions.langId(col("text"))) == "fr")
    assert(one("el perro y una casa en por para",
      TextFunctions.langId(col("text"))) == "es")
    assert(one("你好世界", TextFunctions.langId(col("text"))) == "zh")
    assert(one("qwrt zxcv", TextFunctions.langId(col("text"))) == "und")
  }

  test("wordNgrams guards short docs; fingerprint is stable") {
    assert(one("a b", TextFunctions.wordNgrams(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[_]].isEmpty)
    val g = one("a b c d", TextFunctions.wordNgrams(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(g.toSeq == Seq("a b c", "b c d"))
    val fp1 = one("a b c d", TextFunctions.fingerprint(col("text")))
    val fp2 = one("a b c d", TextFunctions.fingerprint(col("text")))
    assert(fp1 == fp2 && fp1.asInstanceOf[String].length == 32)
    // short doc falls back to md5 of the whole text
    assert(one("a b", TextFunctions.fingerprint(col("text"))) ==
      one("a b", md5(col("text"))))
  }

  test("scrubPii redacts URLs, emails, IPv4s; counts agree with matches") {
    import spark.implicits._
    val rows = Seq(
      ("mail bob@x.org and https://a.b/c?d=1 and 10.0.0.1 done",
        "mail <EMAIL> and <URL> and <IP> done", 1L, 1L, 1L),
      // scrub: email/IP inside a URL are swallowed whole by the URL
      // redaction (URL runs first); audit counts run on the RAW text,
      // so they still see the embedded email and quad
      ("see https://u:p@host.com/10.0.0.1/x rest",
        "see <URL> rest", 1L, 1L, 1L),
      ("no pii here at all", "no pii here at all", 0L, 0L, 0L),
      ("two mails a@b.cc c@d.ee and 192.168.1.255",
        "two mails <EMAIL> <EMAIL> and <IP>", 0L, 2L, 1L)
    ).toDF("text", "want", "wantUrls", "wantEmails", "wantIps")
    val got = rows.select(
      TextFunctions.scrubPii(col("text")).as("clean"),
      col("want"), TextFunctions.urlCount(col("text")).as("u"),
      col("wantUrls"), TextFunctions.emailCount(col("text")).as("e"),
      col("wantEmails"), TextFunctions.ipCount(col("text")).as("i"),
      col("wantIps")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1), r.getString(1))
      assert(r.getLong(2) == r.getLong(3), "urls")
      assert(r.getLong(4) == r.getLong(5), "emails")
      assert(r.getLong(6) == r.getLong(7), "ips")
    }
    // null-safe like every other column function
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.scrubPii(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("qualityScore in [0,1] over the fixture") {
    val bad = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0.0 || col("q") > 1.0)
      .count()
    assert(bad == 0)
  }
}
