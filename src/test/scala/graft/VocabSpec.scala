package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vocab

/** Vocabulary induction + integer encoding: id assignment (count desc,
  * token asc), the UNK path past the cap, token-order reassembly, and
  * the empty-document contract.
  */
class VocabSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a b c"),
    (2L, "b a d"),
    (3L, "   ")).toDF("doc_id", "text")

  test("vocabTable: ids follow count desc then token asc; cap truncates") {
    val v = Vocab.vocabTable(docs, maxVocab = 3).collect()
      .map(r => r.getAs[String]("token") -> (r.getAs[Long]("n"), r.getAs[Long]("id")))
      .toMap
    // a=3, b=2, then the c/d tie (1 each) breaks on the token string:
    // c takes id 3, d falls past the cap
    assert(v === Map("a" -> (3L, 1L), "b" -> (2L, 2L), "c" -> (1L, 3L)))
  }

  test("encodeDocs: ids in original token order, OOV becomes 0, empty docs vanish") {
    val enc = Vocab.encodeDocs(docs, Vocab.vocabTable(docs, maxVocab = 3))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk"), r.getAs[String]("ids"))))
      .toMap
    assert(enc(1L) === ((4L, 0L, "1 1 2 3")))
    assert(enc(2L) === ((3L, 1L, "2 1 0")))
    // a document with no tokens has no occurrence rows — no output row,
    // same as the oracle's grouped occurrence stream
    assert(!enc.contains(3L))
  }

  test("mergeCounts: a two-slice fold equals the one-shot count table") {
    import org.apache.spark.sql.functions.col
    val oneShot = Vocab.tokenCounts(docs).orderBy("token").collect().toSeq
    val folded = Vocab.mergeCounts(Seq(
      Vocab.tokenCounts(docs.filter(col("doc_id") < 2L)),
      Vocab.tokenCounts(docs.filter(col("doc_id") >= 2L))))
      .orderBy("token").collect().toSeq
    assert(folded === oneShot)
  }

  test("encodeDocs is invariant to the input partitioning") {
    val full = Vocab.vocabTable(docs, maxVocab = 10)
    val one = Vocab.encodeDocs(docs.coalesce(1), full).orderBy("doc_id").collect().toSeq
    val many = Vocab.encodeDocs(docs.repartition(7), full).orderBy("doc_id").collect().toSeq
    assert(one === many)
  }
}
