package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary induction + integer encoding — the label-indexing step
  * every pretraining pipeline runs between tokenization and packing:
  * rank the corpus vocabulary by frequency, assign contiguous ids
  * (1..V, most-frequent first; 0 = UNK for everything past the cap),
  * and re-express each document as its id sequence.
  *
  * The reference has no tokenizer-side vocabulary at all; this is the
  * extension-surface sibling of the BPE trainer (x42/x43) for the
  * word-level models and for any loader that wants fixed-width integer
  * token streams instead of strings.
  *
  * Scale shapes:
  *  - [[vocabTable]] is ONE corpus scan → a token-cardinality groupBy →
  *    a rank over the vocabulary (NOT the corpus). The rank window is
  *    unpartitioned, but it runs over post-aggregation vocabulary rows
  *    (millions, not trillions — Heaps' law keeps vocabulary sublinear
  *    in corpus size), and the `maxVocab` cap means a WindowGroupLimit
  *    prunes each partition to its top-V before the single-partition
  *    rank shuffle — the same x17/x21 top-k shape.
  *  - [[encodeDocs]] joins the occurrence stream against the BOUNDED
  *    (≤ maxVocab rows) vocab with an explicit broadcast — the corpus
  *    never shuffles for the lookup; the only corpus shuffle is the
  *    per-doc reassembly groupBy on doc_id.
  *
  * Determinism: ties in frequency break on the token string ascending.
  * Both engines compare ASCII/BMP strings identically (UTF-8 byte order
  * and UTF-16 code-unit order agree up to U+FFFF); supplementary-plane
  * tokens would diverge exactly like the x42 BPE tie-break — documented
  * there, pinned by the same class of spec test here.
  */
object Vocab {

  /** Corpus token frequencies: (token, n) — the partial state the
    * vocabulary ranks over. Exposed separately because counts are
    * LINEAR: two slices' count tables fold by token-wise sum into
    * exactly the one-shot table (the x84/x92 incremental-maintenance
    * convention), so a nightly vocab refresh re-counts only the new
    * batch. Fold with [[mergeCounts]], rank with [[rankVocab]].
    */
  def tokenCounts(docs: DataFrame): DataFrame = docs
    .select(explode(TextOps.tokens(col("text"))).as("token"))
    .filter(length(col("token")) > 0)
    .groupBy("token")
    .agg(count(lit(1)).as("n"))

  /** Token-wise fold of count tables — linearity makes the merged
    * table equal the one-shot count of the concatenated corpora.
    */
  def mergeCounts(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "mergeCounts needs at least one table")
    tables.reduce(_ unionByName _).groupBy("token").agg(sum(col("n")).as("n"))
  }

  /** Rank a count table into vocabulary ids 1..maxVocab by
    * (count desc, token asc). The rank window is global, which the
    * optimizer compiles to TakeOrderedAndProject(limit=maxVocab) BELOW
    * the window — per-partition top-V then one V-row merge, so the
    * single-partition window only ever sees maxVocab rows (PLANS.md
    * round-10 note).
    */
  def rankVocab(counts: DataFrame, maxVocab: Int): DataFrame = {
    require(maxVocab > 0, s"maxVocab must be positive: $maxVocab")
    counts
      .withColumn(
        "id",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
      .filter(col("id") <= maxVocab)
  }

  /** Frequency-ranked vocabulary: (token, n, id) with id = 1..maxVocab
    * assigned by (count desc, token asc) — [[tokenCounts]] + [[rankVocab]]
    * in one call. One scan, one vocab-grain shuffle.
    */
  def vocabTable(docs: DataFrame, maxVocab: Int): DataFrame =
    rankVocab(tokenCounts(docs), maxVocab)

  /** Documents → integer id sequences under `vocab` (a [[vocabTable]]
    * frame): per doc the token count, the out-of-vocabulary count, and
    * the space-joined id string in original token order (0 = UNK). The
    * id string is the hash-gate-friendly rendering of the id array —
    * byte-identical across engines, no array-comparison semantics in
    * play.
    *
    * posexplode carries the original position through the broadcast
    * lookup; reassembly sorts (pos, id) structs inside one collect_list
    * aggregate — ONE corpus shuffle on doc_id, the join itself
    * exchange-free.
    */
  def encodeDocs(
      docs: DataFrame, vocab: DataFrame, carryCols: Seq[String] = Nil): DataFrame = {
    // `carryCols` (round 15, the packSequences convention): doc-level
    // columns that ride the explode and come back through first() — a
    // caller that needs them attached (x104's lang) would otherwise pay
    // a corpus-scale doc_id join against a THIRD corpus scan. Every row
    // of a doc carries the same value, so first() is deterministic.
    val occ = docs
      .select(
        (col("doc_id") +: carryCols.map(col)) :+
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token")): _*)
      .filter(length(col("token")) > 0)
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("n_tokens"),
      sum(when(col("id") === 0L, 1L).otherwise(0L)).as("n_unk"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id").cast("string")),
        " ").as("ids")) ++
      carryCols.map(c => first(col(c)).as(c))
    occ
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .withColumn("id", coalesce(col("id"), lit(0L)))
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
  }
}
