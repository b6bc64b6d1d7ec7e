package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Golden-value tests for the PII scrub pass on planted payloads (the
  * driver testdata is synthetic word soup with no PII, so redaction gets
  * its real verification here; x22 verifies the regex dialect parity
  * contamination path against DuckDB on real data).
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val planted = Seq(
    (1L, "contact alice.smith+x@example.co.uk or visit https://example.com/a?b=c today"),
    (2L, "call +1 (555) 123-4567 now"),
    (3L, "no pii here at all"),
    (4L, "two mails a@b.io c@d.org and http://x.y/z"))
    .toDF("doc_id", "text")

  test("piiStats counts urls, emails, phones") {
    val m = TextOps.piiStats(planted).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(1L) === ((1L, 1L, 0L)))
    assert(m(2L) === ((0L, 0L, 1L)))
    assert(m(3L) === ((0L, 0L, 0L)))
    assert(m(4L) === ((1L, 2L, 0L)))
  }

  test("redactPii replaces each class with its placeholder, leaves clean text alone") {
    val m = TextOps.redactPii(planted).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "contact [EMAIL] or visit [URL] today")
    assert(m(2L) === "call [PHONE] now")
    assert(m(3L) === "no pii here at all")
    assert(m(4L) === "two mails [EMAIL] [EMAIL] and [URL]")
  }

  test("redactText: rules apply in bank order, counts reflect the ORIGINAL text") {
    val docs = Seq(
      (1L, "send stuff to sam at sam.smith@corp.io the same day"),
      (2L, "a plain short row"))
      .toDF("doc_id", "text")
    val rules = Seq(
      ("email", TextOps.EmailRe, "<EMAIL>"),
      ("s_word", "\\bs[a-z.@]+", "<S>"))
    val out = TextOps.redactText(docs, rules).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // email masks FIRST: the s_word rule would otherwise eat "sam.smith@..."
    // from its first letter and split the address before masking
    assert(out(1L)._3 === "<S> <S> to <S> at <EMAIL> the <S> day")
    assert(out(1L)._1 === 1L) // n_email on the original text
    // n_s_word counts the ORIGINAL text — 5 matches including the raw
    // email itself (send, stuff, sam, sam.smith@corp.io, same), while
    // the redacted text only ever masked 4: the audit contract
    assert(out(1L)._2 === 5L)
    assert(out(2L) === ((0L, 1L, "a plain <S> row")))
  }

  test("redactText refuses replacements with engine-specific group syntax") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      TextOps.redactText(docs, Seq(("bad", "x", "$1"))).collect())
    assert(e.getMessage.contains("replacement must not contain"))
    val e2 = intercept[IllegalArgumentException](
      TextOps.redactText(docs, Seq(("bad", "x", "\\1"))).collect())
    assert(e2.getMessage.contains("replacement must not contain"))
  }

  test("contamination flags docs sharing shingles with the banned set") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over dogs"), // banned
      (2L, "the quick brown fox sleeps"), // shares 2 shingles with banned
      (3L, "quick brown cat naps quietly"), // shares 0 complete 3-grams
      (4L, "ab cd")) // too short to shingle
      .toDF("doc_id", "text")
    val out = TextOps.contamination(docs, docs.filter($"doc_id" === 1L), minShared = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L)._2) // banned doc is trivially contaminated with itself
    assert(out(2L) === ((2L, true))) // "the quick brown", "quick brown fox"
    assert(out(3L) === ((0L, false)))
    assert(out(4L) === ((0L, false)))
  }

  test("bloom decontamination: superset of exact flags, counts never undercount") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val banned = docs.filter($"doc_id" < 20)
    val exact = TextOps.contamination(docs, banned, minShared = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val bloom = TextOps.contaminationBloom(docs, banned, minShared = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(bloom.keySet === exact.keySet)
    // no false negatives: bloom membership contains every true member, so
    // per-doc counts dominate the exact counts and flags are a superset
    exact.foreach { case (id, (n, flagged)) =>
      assert(bloom(id)._1 >= n, s"doc $id: bloom ${bloom(id)._1} < exact $n")
      if (flagged) assert(bloom(id)._2, s"doc $id: exact-contaminated but bloom missed it")
    }
    // false positives exist but are bounded: at fpp=0.01 the flagged set
    // stays close to the exact one (generous 10x slack on the FP budget —
    // the assertion is about ORDER, not the precise rate)
    val exactFlagged = exact.count(_._2._2)
    val bloomFlagged = bloom.count(_._2._2)
    val fpBudget = math.max(5, (docs.count() * 0.01 * 10).toInt)
    assert(bloomFlagged - exactFlagged <= fpBudget,
      s"bloom flagged $bloomFlagged vs exact $exactFlagged — FP rate out of bounds")
  }
}
