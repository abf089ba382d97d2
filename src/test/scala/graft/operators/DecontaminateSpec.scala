package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val heldout = Seq(
    (100L, "the quick brown fox jumps"),
    (101L, "entirely unrelated benchmark prose here")
  ).toDF("doc_id", "text")

  private val train = Seq(
    (1L, "the quick brown fox sleeps"),    // shares "the quick brown", "quick brown fox"
    (2L, "completely clean training text"),
    (3L, "fox jumps the quick brown fox jumps again"), // 3 shared grams
    (4L, "too short"),                     // < n words -> no grams
    (5L, "unrelated benchmark prose here too") // shares 2 grams with 101
  ).toDF("doc_id", "text")

  test("contaminationReport: exact distinct-gram hit counts, one row per train doc") {
    val got = Decontaminate.contaminationReport(
      train, "doc_id", "text", heldout, "text", n = 3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 5)
    assert(got(1L) == ((2L, true)))
    assert(got(2L) == ((0L, false)))
    // doc 3 grams: "fox jumps the","jumps the quick","the quick brown",
    // "quick brown fox","brown fox jumps","fox jumps again";
    // test grams of 100: "the quick brown","quick brown fox","brown fox jumps"
    assert(got(3L) == ((3L, true)))
    assert(got(4L) == ((0L, false)))
    // doc 5: "unrelated benchmark prose","benchmark prose here" match 101
    assert(got(5L) == ((2L, true)))
  }

  test("removeContaminated keeps exactly the clean docs") {
    val kept = Decontaminate.removeContaminated(
      train, "doc_id", "text", heldout, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("report and removal agree on the documents fixture") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val tr = docs.filter(col("doc_id") % 10 =!= 0)
    val te = docs.filter(col("doc_id") % 10 === 0)
    val cleanPerReport = Decontaminate.contaminationReport(
      tr, "doc_id", "text", te, "text", n = 3)
      .filter(!col("contaminated")).select(col("id")).as[Long].collect().toSet
    val kept = Decontaminate.removeContaminated(tr, "doc_id", "text", te, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == cleanPerReport)
    // fixture plants exact duplicates, so contamination is nonempty
    assert(kept.size < tr.count())
  }

  test("bloom pre-pass is bitwise the exact path, at any fpp") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val tr = docs.filter(col("doc_id") % 10 =!= 0)
    val te = docs.filter(col("doc_id") % 10 === 0)
    val exact = Decontaminate.contaminationReport(
      tr, "doc_id", "text", te, "text", n = 3)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // fpp only moves the candidate volume between the sketch and the
    // verify join — never the answer (no false negatives; false
    // positives die in the verify)
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom = Decontaminate.contaminationReportBloom(
        tr, "doc_id", "text", te, "text", n = 3, fpp = fpp)
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(bloom == exact, s"bloom(fpp=$fpp) diverged from exact")
    }
    val keptExact = Decontaminate.removeContaminated(
      tr, "doc_id", "text", te, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val keptBloom = Decontaminate.removeContaminatedBloom(
      tr, "doc_id", "text", te, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(keptBloom == keptExact)
  }
}
