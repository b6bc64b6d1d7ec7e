package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // 100 "good" docs (long, diverse, wordy) vs 100 junk docs (one token
  // stuttered) — separable in every default feature
  private def planted: DataFrame = {
    val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val good = (0L until 100L).map { i =>
      val words = (0 until 60).map(j => vocab(((i + j) % vocab.size).toInt))
      (i, words.mkString(" "), 1)
    }
    val junk = (100L until 200L).map(i => (i, Seq.fill(8)("zz").mkString(" "), 0))
    (good ++ junk).toDF("doc_id", "text", "label")
  }

  test("separable corpus: the fitted classifier recovers the planted labels") {
    val labeled = QualityModel.qualityFeatures(planted)
      .join(planted.select("doc_id", "label"), Seq("doc_id"))
    val model = QualityModel.fit(labeled)
    val out = QualityModel.classify(planted, model)
      .join(planted.select("doc_id", "label"), Seq("doc_id"))
    val acc = out.filter((col("keep") && col("label") === 1) ||
      (!col("keep") && col("label") === 0)).count() / 200.0
    assert(acc >= 0.95, s"accuracy $acc on separable data")
    // calibration direction: mean p(keep) clearly separated by class
    val Array(pGood, pJunk) = out.groupBy("label").agg(avg("p_keep").as("p"))
      .orderBy(col("label").desc).collect().map(_.getDouble(1))
    assert(pGood > 0.9 && pJunk < 0.1, s"poorly calibrated: good=$pGood junk=$pJunk")
  }

  test("fit is deterministic and partitioning-independent") {
    val labeled = QualityModel.qualityFeatures(planted)
      .join(planted.select("doc_id", "label"), Seq("doc_id"))
    val a = QualityModel.fit(labeled.repartition(3))
    val b = QualityModel.fit(labeled.repartition(7))
    assert(a.weights.toSeq === b.weights.toSeq)
    assert(a.bias === b.bias)
  }

  test("single-class training sample fails fast") {
    val labeled = QualityModel.qualityFeatures(planted)
      .withColumn("label", lit(1))
    val e = intercept[IllegalArgumentException](QualityModel.fit(labeled))
    assert(e.getMessage.contains("single-class"))
  }

  test("p_keep is a probability and keep thresholds it") {
    val labeled = QualityModel.qualityFeatures(planted)
      .join(planted.select("doc_id", "label"), Seq("doc_id"))
    val model = QualityModel.fit(labeled)
    val rows = QualityModel.classify(planted, model, threshold = 0.7).collect()
    rows.foreach { r =>
      val p = r.getDouble(1)
      assert(p >= 0.0 && p <= 1.0)
      // keep thresholds the 6-dp-rounded probability (the oracle-parity
      // recipe) — compare against the same rounding here
      assert(r.getBoolean(2) === (graft.operators.CrossRound.rD(p, 6) >= 0.7))
    }
  }

  test("degenerate docs take defined 0.0 features; threshold 0 keeps everything") {
    // zero-token and null text must NOT null-propagate through the ratio
    // features: p_keep stays defined and threshold 0.0 keeps every doc —
    // the pipeline-identity invariant Curation documents
    val docs = Seq(
      (1L, Option("several ordinary words appear here")),
      (2L, Option("")),
      (3L, Option.empty[String])
    ).toDF("doc_id", "text")
    val feats = QualityModel.qualityFeatures(docs).collect()
    feats.foreach { r =>
      (1 until r.length).foreach(i => assert(!r.isNullAt(i), s"null feature at $r"))
    }
    val labeled = QualityModel.qualityFeatures(planted)
      .join(planted.select("doc_id", "label"), Seq("doc_id"))
    val model = QualityModel.fit(labeled)
    val out = QualityModel.classify(docs, model, threshold = 0.0).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"null p_keep/keep at $r")
      assert(r.getBoolean(2), "threshold 0.0 must keep every doc")
    }
  }

  test("agreement with the weak-label rule on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val weak = graft.operators.TextOps.qualityScore(docs)
      .withColumn("label", (col("quality_score") >= 0.65).cast("int"))
    val labeled = QualityModel.qualityFeatures(docs).join(weak, Seq("doc_id"))
    val model = QualityModel.fit(labeled)
    val out = QualityModel.classify(docs, model).join(weak, Seq("doc_id"))
    val n = out.count().toDouble
    val agree = out.filter((col("keep") && col("label") === 1) ||
      (!col("keep") && col("label") === 0)).count() / n
    assert(agree >= 0.85, s"classifier agrees with its weak label only $agree")
  }
}
