package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.sources.Tables

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("skipgramPairs: golden pairs at keep-all, doc isolation, deterministic subsampling") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    // t = 1: sqrt(1/f) >= 1 for every f <= 1, so everything survives
    val all = TextOps.skipgramPairs(docs, window = 2, subsampleT = 1.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 1 (window 2): (a,b),(a,c),(b,c) + reverses; doc 2: (d,e)+(e,d)
    assert(all === Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L, ("a", "c") -> 1L, ("c", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "b") -> 1L, ("d", "e") -> 1L, ("e", "d") -> 1L))
    // no pair ever crosses a document boundary
    assert(!all.contains(("c", "d")) && !all.contains(("d", "c")))
    // subsampling drops SOME pairs on a skewed corpus, deterministically
    val skew = Seq.tabulate(40)(i => (i.toLong, "x x x y z")).toDF("doc_id", "text")
    val s1 = TextOps.skipgramPairs(skew, 2, subsampleT = 0.05)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val s2 = TextOps.skipgramPairs(skew.repartition(7), 2, subsampleT = 0.05)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(s1 === s2) // pure function of the data, not the partitioning
    val keepAll = TextOps.skipgramPairs(skew, 2, subsampleT = 1.0)
      .agg(sum("n")).collect().head.getLong(0)
    val sampled = s1.toSeq.map(_._3).sum
    assert(sampled < keepAll, s"subsampling removed nothing ($sampled vs $keepAll)")
    assert(sampled > 0)
  }

  test("phraseOccurrences: adjacency, overlaps, repeated phrase tokens, boundaries") {
    import spark.implicits._
    val docs = Seq(
      (1L, "new york city new york"),       // two matches of "new york"
      (2L, "york new"),                     // reversed — no match
      (3L, "new and york"),                 // non-adjacent — no match
      (4L, "a a a a"),                      // overlapping matches of "a a"
      (5L, "the cat the dog"),              // repeated-token phrase target
      (6L, "new")                           // shorter than the phrase
    ).toDF("doc_id", "text")
    def res(phrase: String*) =
      TextOps.phraseOccurrences(docs, phrase)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ny = res("new", "york")
    assert(ny === Map(1L -> (2L, 0L)))      // anchors 0 and 3; first at 0
    val aa = res("a", "a")
    assert(aa === Map(4L -> (3L, 0L)))      // anchors 0,1,2 — overlaps all count
    val tct = res("the", "cat", "the")
    assert(tct === Map(5L -> (1L, 0L)))     // one occurrence serves indexes 0 AND 2
    // a phrase starting mid-document reports its true 0-based position
    val cd = res("cat", "the", "dog")
    assert(cd === Map(5L -> (1L, 1L)))
    assert(res("absent", "tokens").isEmpty)
  }

  test("tfidfTopTerms: VersionedTable path is row-identical to the checkpoint path") {
    val docs = Tables.documents(spark, sf)
    val viaCheckpoint = TextOps.tfidfTopTerms(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val sink = graft.sources.VersionedTable(
      java.nio.file.Files.createTempDirectory("graft_tfidf_vt_").toString)
    val viaTable = TextOps.tfidfTopTerms(docs, 3, materialize = Some(sink))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaTable === viaCheckpoint)
    assert(viaTable.nonEmpty)
    assert(sink.latestVersion().contains(0L)) // tf really landed as a snapshot
  }

  test("mixWeights: weights normalize to 1, alpha flattens toward uniform") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // skewed corpus: 80 / 15 / 5 docs
    val docs = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 95).map(i => (i.toLong, "mid")) ++
      (96 to 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    def weights(alpha: Double): Map[String, Double] =
      TextOps.mixWeights(docs, alpha).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val natural = weights(1.0)
    assert(math.abs(natural.values.sum - 1.0) < 1e-6)
    assert(math.abs(natural("big") - 0.80) < 1e-6) // alpha=1 = natural share
    val flat = weights(0.3)
    assert(math.abs(flat.values.sum - 1.0) < 2e-6)
    // temperature flattens: the head loses mass, the tail gains
    assert(flat("big") < natural("big") && flat("small") > natural("small"))
    // alpha=0 is exactly uniform
    val uniform = weights(0.0)
    uniform.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
    // upsample factor: tail > 1 (oversampled), head < 1 at alpha<1
    val fac = TextOps.mixWeights(docs, 0.3).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(fac("small") > 1.0 && fac("big") < 1.0)
  }

  test("resampleByTemperature: volumes track the weights, deterministic, null-source kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 440).map(i => (i.toLong, "small")) ++
      (441 to 460).map(i => (i.toLong, null: String)))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    // alpha=1 is the identity mix: every doc exactly once, copy_id 1
    val nat = TextOps.resampleByTemperature(docs, 1.0)
    assert(nat.count() === 460)
    assert(nat.filter(col("copy_id") =!= 1).count() === 0)
    // alpha<1 upsamples the tail: per-source volume lands in
    // [n*floor(f), n*ceil(f)] and near n*f (binomial concentration)
    val mixed = TextOps.resampleByTemperature(docs, 0.3).cache()
    val fac = TextOps.mixWeights(docs, 0.3).collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(3)).toMap
    val vol = mixed.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    Seq(Option("big") -> 400, Option("small") -> 40, (None: Option[String]) -> 20)
      .foreach { case (src, n) =>
        val f = fac(src)
        val v = vol.getOrElse(src, 0L).toDouble
        assert(v >= n * math.floor(f) && v <= n * math.ceil(f), s"$src: $v vs f=$f")
        val sd = math.sqrt(n * (f - math.floor(f)) * (1 - (f - math.floor(f)))) + 1e-9
        assert(math.abs(v - n * f) <= 4 * sd + 1, s"$src: volume $v far from ${n * f}")
      }
    // null-source docs must survive the weight join (null-safe equality)
    assert(vol.contains(None))
    // pure function of the keys: partitioning cannot change the sample —
    // compare SORTED FULL ROWS, not a set (a set would mask duplicate
    // rows or a corrupted source column)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2)))
        .sortBy(t => (t._2.getOrElse(""), t._1, t._3)).toSeq
    assert(rowsOf(TextOps.resampleByTemperature(docs.repartition(11), 0.3)) === rowsOf(mixed))
  }

  test("sourceVocabOverlap: exact Jaccard on known vocabularies, disjoint pairs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "x w"),     // vocab(a) = {x,y,z,w}
      (3L, "b", "x y"), (4L, "b", "y q"),       // vocab(b) = {x,y,q}
      (5L, "c", "m n"))                          // vocab(c) = {m,n} — disjoint
      .toDF("doc_id", "source", "text")
    val got = TextOps.sourceVocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // |a ∩ b| = {x,y} = 2; J = 2 / (4 + 3 - 2) = 0.4
    assert(got(("a", "b")) === ((4L, 3L, 2L, 0.4)))
    // c shares nothing — the pairs (a,c) and (b,c) must be ABSENT
    assert(got.size === 1)
  }

  test("capPerSource: exact cap, deterministic, partitioning-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1 to 300).map(i => (i.toLong, s"s${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val capped = TextOps.capPerSource(docs, "doc_id", maxDocs = 10)
    val bySource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource === Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    // a source under the cap is untouched
    val small = TextOps.capPerSource(docs.filter(col("doc_id") <= 5), "doc_id", 10)
    assert(small.count() === 5)
    // retention is a pure function of the keys
    val once = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val again = TextOps.capPerSource(docs.repartition(13), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === once)
  }

  test("chunkDocs: full coverage, stable ids, no suffix chunks") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "short doc"), // 2 tokens -> one chunk
      (3L, (1 to 4).map(i => s"u$i").mkString(" "))) // exactly one window
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkDocs(docs, chunkTokens = 4, overlap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // doc 1, stride 3: starts 1,4,7 (10 dropped: its fresh region starts
    // past the end) -> three 4-token chunks covering t1..t10
    assert(chunks.keys.count(_._1 == 1L) === 3)
    assert(chunks((1L, 0L)).getAs[String]("chunk_text") === "t1 t2 t3 t4")
    assert(chunks((1L, 1L)).getAs[String]("chunk_text") === "t4 t5 t6 t7")
    assert(chunks((1L, 2L)).getAs[String]("chunk_text") === "t7 t8 t9 t10")
    // doc 2: single short chunk
    assert(chunks((2L, 0L)).getAs[String]("chunk_text") === "short doc")
    assert(chunks((2L, 0L)).getAs[Long]("n_chunk_tokens") === 2L)
    // doc 3: exactly one full window, no degenerate second chunk
    assert(chunks.keys.count(_._1 == 3L) === 1)
    // coverage: concatenating fresh regions reconstructs every token
    val all = (0L to 2L).flatMap { cid =>
      val txt = chunks((1L, cid)).getAs[String]("chunk_text").split(" ")
      if (cid == 0) txt else txt.drop(1) // drop the 1-token overlap
    }
    assert(all === (1 to 10).map(i => s"t$i"))
  }

  test("repetitionStats: golden fractions for looping, clean, and tiny documents") {
    import spark.implicits._
    val docs = Seq(
      // 4 lines, 2 distinct -> dup_line_frac 0.5; bigrams of "spam ham
      // spam ham spam ham spam ham": 7 total, "spam ham" x4 -> 4/7
      (1L, "spam ham spam ham\nx\nspam ham spam ham\nx"),
      // all-distinct prose: no dup lines, every bigram unique -> 1/6
      (2L, "seven distinct words in one clean line"),
      // one token: no bigrams -> 0.0; one line -> 0.0
      (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_lines") === 4L)
    assert(got(1L).getAs[Double]("dup_line_frac") === 0.5)
    // "spam ham spam ham\nx\nspam..." whitespace-tokenizes across newlines:
    // tokens = spam ham spam ham x spam ham spam ham x (10) -> 9 bigrams,
    // modal "spam ham" appears 4 times
    assert(math.abs(got(1L).getAs[Double]("top_bigram_frac") - 4.0 / 9.0) < 1e-12)
    assert(got(2L).getAs[Double]("dup_line_frac") === 0.0)
    assert(math.abs(got(2L).getAs[Double]("top_bigram_frac") - 1.0 / 6.0) < 1e-12)
    assert(got(3L).getAs[Double]("top_bigram_frac") === 0.0)
    assert(got(3L).getAs[Double]("dup_line_frac") === 0.0)
  }

  test("corpusCardinality: a source whose docs are all token-less still appears") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("alpha beta"), "en", "web", 10L),
      (2L, None: Option[String], "en", "scan", 0L), // null text -> no token rows
      (3L, None: Option[String], "de", "scan", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.corpusCardinality(docs)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("vocabulary"))).toMap
    assert(out("web") === (1L, 2L))
    assert(out("scan") === (2L, 0L), "token-less source must report vocabulary 0, not vanish")
  }

  test("corpusCardinality: HLL sketch tracks exact distinct counts within 5%") {
    val docs = Tables.documents(spark, sf)
    def byShape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
          r.getAs[Long]("total_chars"), r.getAs[Long]("vocabulary"))).toMap
    val exact = byShape(TextOps.corpusCardinality(docs))
    val approx = byShape(TextOps.corpusCardinality(docs, approx = true))
    assert(exact.nonEmpty && exact.keySet === approx.keySet)
    exact.foreach { case (src, (nDocs, nLangs, chars, vocab)) =>
      val (aDocs, aLangs, aChars, aVocab) = approx(src)
      assert(aDocs === nDocs && aChars === chars, src) // non-sketch columns identical
      assert(math.abs(aLangs - nLangs) <= math.max(1L, (0.05 * nLangs).toLong), src)
      assert(math.abs(aVocab - vocab) <= math.max(1L, (0.05 * vocab).toLong),
        s"$src: HLL vocabulary $aVocab vs exact $vocab drifted past 5%")
    }
  }

  test("approx token distribution tracks the exact one within 5% (the 100 TB path)") {
    val docs = Tables.documents(spark, sf)
    val exact = TextOps.tokenDistribution(docs).head()
    val approx = TextOps.tokenDistributionApprox(docs).head()
    assert(approx.getAs[Long]("n_docs") === exact.getAs[Long]("n_docs"))
    assert(approx.getAs[Long]("min_tokens") === exact.getAs[Long]("min_tokens"))
    assert(approx.getAs[Long]("max_tokens") === exact.getAs[Long]("max_tokens"))
    Seq("p25", "p50", "p75", "p95").foreach { q =>
      val e = exact.getAs[Double](q)
      val a = approx.getAs[Number](q).doubleValue()
      assert(math.abs(a - e) <= math.max(1.0, 0.05 * e),
        s"$q: approx $a vs exact $e drifted past 5%")
    }
  }

  test("bpeMerges: matches an independent reference implementation") {
    import spark.implicits._
    // the Sennrich-paper-style corpus: shared subwords across frequencies
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "newest newest newest newest widest widest widest")).toDF("doc_id", "text")
    // reference BPE in plain Scala: same greedy-leftmost merge, same
    // (count desc, pair asc) tie-break
    def refBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
      var vocab = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      var out = Vector.empty[(String, String, Long)]
      var done = false
      while (out.size < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
            case _ =>
          }
        }
        val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
        best match {
          case Some(((a, b), n)) if n >= 2 =>
            out :+= (a, b, n)
            vocab = vocab.map { case (syms, f) =>
              val merged = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
                if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
                else acc :+ x
              }
              (merged, f)
            }
          case _ => done = true
        }
      }
      out
    }
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val expected = refBpe(words, 10)
    val got = TextOps.bpeMerges(docs, 10).map(m => (m.left, m.right, m.count))
    assert(got === expected)
    assert(got.nonEmpty)
    // the famous first merges on this corpus: 'es' then 'est'
    assert(got.head._1 === "e" && got.head._2 === "s")
    assert(got(1)._1 === "es" && got(1)._2 === "t")
  }

  test("bpeSegments: golden segmentations, fully-merged invariant, open vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "newest newest newest newest widest widest widest")).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(docs, 10)
    val pairs = merges.map(m => (m.left, m.right)).toSet
    // segment the training corpus PLUS unseen words (open vocabulary)
    val probe = Seq((9L, "lowest slowest low xyz")).toDF("doc_id", "text")
    val segs = TextOps.bpeSegments(docs.union(probe), merges)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getSeq[String](3)))
    // every word reassembles exactly from its subwords
    segs.foreach { case (_, _, w, sub) => assert(sub.mkString("") === w) }
    // fully merged: no adjacent subword pair is still in the merge table
    segs.foreach { case (_, _, w, sub) =>
      sub.sliding(2).foreach {
        case Seq(a, b) => assert(!pairs((a, b)), s"$w: mergeable pair ($a,$b) survived")
        case _ =>
      }
    }
    // the classic corpus fully coalesces its own words
    val byWord = segs.filter(_._1 < 9L).map(s => s._3 -> s._4).toMap
    assert(byWord("newest") === Seq("newest"))
    assert(byWord("low") === Seq("low"))
    // unseen word built from trained subwords: "lowest" = low + est
    val lowest = segs.find(s => s._3 == "lowest").get._4
    assert(lowest.head === "low", s"'lowest' segmented as $lowest")
    assert(lowest.contains("est") || lowest.contains("lowest") === false)
    // gibberish with no trained merges stays (mostly) characters
    val xyz = segs.find(s => s._3 == "xyz").get._4
    assert(xyz === Seq("x", "y", "z"))
  }

  test("bpe: supplementary-plane characters stay whole through training and segmentation") {
    import spark.implicits._
    // U+1F600 is two Java chars; char-grain splitting would cut it into
    // lone surrogates that re-encode as replacement bytes
    val smile = new String(Character.toChars(0x1F600))
    val word = s"ab$smile"
    val docs = (1L to 5L).map(i => (i, s"$word $word")).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(docs, 5)
    val segs = TextOps.bpeSegments(docs, merges).limit(1)
      .select("word", "subwords").collect()
    val (w, sub) = (segs(0).getString(0), segs(0).getSeq[String](1))
    assert(sub.mkString("") === w, s"subwords $sub do not reassemble $w")
    assert(w.contains(smile))
  }

  test("bpeMerges: supplementary-vs-BMP frequency tie breaks in code-point order") {
    import spark.implicits._
    // U+1D11E (surrogate pair D834 DD1E) vs U+FB01 (single char FB01):
    // UTF-16 code-unit order sorts the surrogate FIRST (0xD834 < 0xFB01),
    // code-point / UTF-8 byte order sorts it LAST (0x1D11E > 0xFB01). A
    // frequency tie between pairs led by these symbols is exactly where a
    // Java-String tie-break would diverge from the x42 oracle's DuckDB
    // struct sort — this pin keeps the engine on the code-point side.
    val clef = new String(Character.toChars(0x1D11E))
    val fi = "\uFB01" // LATIN SMALL LIGATURE FI, BMP above the surrogate range
    val docs = Seq((1L, s"${clef}x ${fi}x"), (2L, s"${clef}x ${fi}x"))
      .toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(docs, 1)
    assert(merges.nonEmpty)
    assert(merges.head.left === fi && merges.head.right === "x",
      s"tie must resolve to the code-point-smaller pair, got ${merges.head}")
  }

  test("bpeMerges: deterministic across partition widths; early-stops when exhausted") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"alpha beta gamma delta")).toDF("doc_id", "text")
    val a = TextOps.bpeMerges(docs, 50)
    val b = TextOps.bpeMerges(docs.repartition(13), 50)
    assert(a === b)
    // four distinct words of <= 5 chars: merges exhaust well before 50
    assert(a.size < 50)
    assert(a.size >= 4) // at least one full word coalesces
  }

  test("perplexityBuckets: thirds by LM score, order respected, width-deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val out = TextOps.perplexityBuckets(docs).cache()
    val byBucket = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = out.count()
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // thirds up to ties at the cuts
    byBucket.values.foreach(c => assert(math.abs(c - n / 3.0) <= n * 0.1, byBucket.toString))
    // every head doc scores at least every tail doc
    val minHead = out.filter(col("bucket") === "head").agg(min("logprob")).head().getDouble(0)
    val maxTail = out.filter(col("bucket") === "tail").agg(max("logprob")).head().getDouble(0)
    assert(minHead >= maxTail)
    val a = out.collect().map(r => (r.getLong(0), r.getString(3))).toMap
    out.unpersist()
    val b = TextOps.perplexityBuckets(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert(a === b)
  }

  test("unigramLogProb: golden values on a hand-computed corpus") {
    import spark.implicits._
    // freq: a=2, b=2, c=1; total=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expected1 = (2 * math.log(2.0 / 5) + math.log(2.0 / 5)) / 3
    val expected2 = (math.log(2.0 / 5) + math.log(1.0 / 5)) / 2
    assert(out(1L)._1 === 3L)
    assert(out(2L)._1 === 2L)
    assert(math.abs(out(1L)._2 - expected1) < 1e-12)
    assert(math.abs(out(2L)._2 - expected2) < 1e-12)
  }

  test("unigramLogProb: common-token docs outscore rare-token docs; deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 docs of the same common words + 1 doc of singleton tokens
    val common = (1L to 20L).map(i => (i, "the quick brown fox"))
    val rare = Seq((99L, "zxqv wvut kjhg plmn"))
    val docs = (common ++ rare).toDF("doc_id", "text")
    val scores = TextOps.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(99L),
      s"common-vocab doc ${scores(1L)} should outscore rare-vocab doc ${scores(99L)}")
    val wide = TextOps.unigramLogProb(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // partition-order FP drift is below the query edge's ra(4) rounding;
    // raw doubles here agree to 1e-9 already on this tiny corpus
    scores.foreach { case (id, v) => assert(math.abs(wide(id) - v) < 1e-9) }
  }

  // ---------------------------------------------------------------
  // Gopher rules + normalization (round 7)
  // ---------------------------------------------------------------

  test("gopherRules: each published A1.1 rule trips on its crafted violator") {
    import spark.implicits._
    val good = (("the data and processing that systems have with scale " * 4).trim)
    val docs = Seq(
      (1L, good), // passes every rule at minWords=20
      (2L, "short text with the and of that"), // < 20 words
      (3L, ("a " * 40).trim + " the be to"), // mean word len < 3
      (4L, good + " " + ("#" * 20)), // symbol ratio >= 0.1
      (5L, (1 to 10).map(i => "- bullet item " + i).mkString("\n") +
        "\nthe be to of and that have with words go here now ok"), // bullets >= 0.9 of lines
      (6L, (1 to 10).map(i => "line number " + i + " trails off...").mkString("\n") +
        "\nthe be to of and with more words to fill out the doc"), // ellipsis lines >= 0.3
      (7L, (1 to 30).map(_.toString).mkString(" ") + " the be with"), // alpha frac <= 0.8
      (8L, ("data processing scale systems compute memory storage " * 4).trim)) // < 2 stopwords
      .toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, minWords = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"), s"doc 1 should pass: ${out(1L)}")
    assert(!out(2L).getAs[Boolean]("pass") && out(2L).getAs[Long]("n_words") < 20)
    assert(!out(3L).getAs[Boolean]("pass") && out(3L).getAs[Double]("mean_word_len") < 3.0)
    assert(!out(4L).getAs[Boolean]("pass") && out(4L).getAs[Double]("symbol_ratio") >= 0.1)
    assert(!out(5L).getAs[Boolean]("pass") && out(5L).getAs[Double]("bullet_line_frac") >= 0.9)
    assert(!out(6L).getAs[Boolean]("pass") && out(6L).getAs[Double]("ellipsis_line_frac") >= 0.3)
    assert(!out(7L).getAs[Boolean]("pass") && out(7L).getAs[Double]("alpha_word_frac") <= 0.8)
    assert(!out(8L).getAs[Boolean]("pass") && out(8L).getAs[Long]("stopword_hits") < 2)
  }

  test("gopherRules: stopword hits count distinct members, case-insensitively") {
    import spark.implicits._
    val docs = Seq((1L, "The THE the of OF")).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs).collect().head
    assert(out.getAs[Long]("stopword_hits") === 2L) // {the, of}, not 5
  }

  test("normalizeText: NFC composes, controls stripped, whitespace collapsed") {
    import spark.implicits._
    // "e" + combining acute (U+0301) must compose to U+00E9
    val decomposed = "caf" + "e\u0301"
    val docs = Seq(
      (1L, decomposed),
      (2L, "a\u0001b\u000bc"), // control chars stripped (not \n/\t)
      (3L, "  spaced\t\tout   text  "),
      (4L, "line1\nline2")) // newline preserved
      .toDF("doc_id", "text")
    val out = TextOps.normalizeText(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("norm_text") === "caf\u00e9")
    assert(out(1L).getAs[Long]("n_chars_raw") === 5L)
    assert(out(1L).getAs[Long]("n_chars_norm") === 4L)
    assert(out(2L).getAs[String]("norm_text") === "abc")
    assert(out(3L).getAs[String]("norm_text") === "spaced out text")
    assert(out(4L).getAs[String]("norm_text") === "line1\nline2")
  }

  test("NormalizeExpr: NFKC folds compatibility forms; interpreted matches codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ligature fi (U+FB01) and fullwidth A (U+FF21) fold only under NFKC
    val df = Seq((1L, "\ufb01le \uff21")).toDF("id", "text")
    val nfkc = df.select(
      graft.functions.NormalizeExpr.unicodeNormalize(col("text"), "NFKC").as("t"))
      .collect().head.getString(0)
    assert(nfkc === "file A")
    val nfc = df.select(
      graft.functions.NormalizeExpr.unicodeNormalize(col("text"), "NFC").as("t"))
      .collect().head.getString(0)
    assert(nfc === "\ufb01le \uff21") // NFC leaves compatibility forms alone
    // interpreted eval path (no codegen context) agrees with the df path
    val e = graft.functions.NormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("\ufb01le \uff21")), "NFKC")
    assert(e.eval(null).toString === "file A")
    // nulls stay null; bad form names fail fast
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    assert(withNull.select(
      graft.functions.NormalizeExpr.unicodeNormalize(col("text")).as("t"))
      .collect().head.isNullAt(0))
    intercept[IllegalArgumentException] {
      graft.functions.NormalizeExpr.unicodeNormalize(col("text"), "NFX")
    }
  }

  test("lengthBuckets: docs land in the smallest fitting bucket; overflow reports 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def doc(id: Long, words: Int) = (id, (1 to words).map(_ => "w").mkString(" "))
    val docs = Seq(doc(1, 3), doc(2, 8), doc(3, 9), doc(4, 16), doc(5, 40))
      .toDF("doc_id", "text")
    val out = TextOps.lengthBuckets(docs, buckets = Seq(8, 16, 32)).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out(8L).getAs[Long]("n_docs") === 2L) // 3 and 8 words
    assert(out(8L).getAs[Long]("total_tokens") === 11L)
    assert(out(8L).getAs[Long]("padded_tokens") === 16L)
    assert(out(8L).getAs[Double]("waste_frac") === 0.3125)
    assert(out(16L).getAs[Long]("n_docs") === 2L) // 9 and 16
    assert(out(0L).getAs[Long]("n_docs") === 1L) // 40 > 32: overflow
    assert(out(0L).getAs[Double]("waste_frac") === 0.0)
  }

  test("stripMarkup: tags, script/style content, comments, and entities") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<html><body><p>Hello <b>world</b></p></body></html>"),
      (2L, "before<script type=\"x\">var a = 1 < 2;</script>after"),
      (3L, "a<style>p { color: red }</style>b<!-- hidden -->c"),
      (4L, "x &lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39; &nbsp;y"),
      (5L, "a<br>b<BR/>c"), // tags become word boundaries, case-insensitive markup
      (6L, "no markup at all"))
      .toDF("doc_id", "text")
    val out = TextOps.stripMarkup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out(1L) === "Hello world")
    assert(out(2L) === "before after") // script CONTENT removed too
    assert(out(3L) === "a b c")
    // &amp; decodes LAST: &amp;amp; -> &amp; (single decode, HTML-correct)
    assert(out(4L) === "x <tag> &amp; \"q\" 's' y")
    assert(out(5L) === "a b c")
    assert(out(6L) === "no markup at all")
  }

  test("bm25TopK: planted relevant doc ranks first; scores hand-check; deterministic") {
    import spark.implicits._
    // 1 is saturated with the query terms, 2 mentions one, 3-6 are noise
    // padding so idf is meaningful. Doc 7 matches as often as 2 but is
    // LONGER — length normalization must rank it below 2.
    val docs = Seq(
      (1L, "spark spark merge spark merge"),
      (2L, "merge alpha beta gamma delta"),
      (7L, "merge alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "beta gamma delta epsilon zeta"),
      (5L, "gamma delta epsilon zeta eta"),
      (6L, "delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, Seq("spark", "merge"), topK = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 7L))
    // hand-computed: N=7, avgdl=40/7; spark df=1, merge df=3
    val n = 7.0; val avgdl = 40.0 / 7.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, df: Double, dl: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val exp1 = term(3, 1, 5) + term(2, 3, 5)
    assert(math.abs(got.head._2 - exp1) < 1e-4)
    val exp2 = term(1, 3, 5)
    assert(math.abs(got(1)._2 - exp2) < 1e-4)
    // shorter doc with identical tf outranks the longer one
    assert(got(1)._2 > got(2)._2)
    // partition-layout invariance (the sweep contract)
    val re = TextOps.bm25TopK(docs.repartition(7), Seq("spark", "merge"), topK = 3)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(re.toSeq === Seq(1L, 2L, 7L))
  }

  test("hashedNgramEmbedding: shape, dense/sparse agreement, near-dup utility, determinism") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely different content about spark aggregation engines"),
      (4L, "ab")) // shorter than n=3: the zero vector (no cells)
      .toDF("doc_id", "text")
    val sparse = TextOps.hashedNgramEmbedding(docs, n = 3, dim = 16)
    val rows = sparse.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, b, v) => b >= 0 && b < 16 && v != 0 })
    assert(!rows.exists(_._1 == 4L), "sub-n doc must have no cells")
    // dense form agrees cell-for-cell with the sparse grain
    val dense = TextOps.hashedNgramEmbeddingDense(docs, n = 3, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for ((d, b, v) <- rows) assert(dense(d)(b.toInt) === v.toFloat)
    assert(dense(1L).map(math.abs).sum ===
      rows.filter(_._1 == 1L).map(_._3.toFloat.abs).sum)
    // the sketch preserves similarity: near-dup pair far above unrelated
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos(dense(1L), dense(2L)) > 0.8)
    assert(cos(dense(1L), dense(2L)) > cos(dense(1L), dense(3L)) + 0.3)
    // partition-layout invariance (the sweep contract)
    val re = TextOps.hashedNgramEmbedding(docs.repartition(5), n = 3, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re === rows.toSet)
  }

  test("bigramLogProb: seen, backed-off, OOV and degenerate docs hand-check") {
    import spark.implicits._
    // LM corpus: "a b a b" -> bigram counts (a,b)=2, (b,a)=1;
    // unigrams a=2, b=2 -> N=4, V=2
    val lm = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "a b a b"),
      (10L, "a b"),   // seen bigram: S = 2/2 = 1 -> ln 1 = 0
      (11L, "b b"),   // unseen bigram, seen word: S = 0.4*(2+1)/(4+2)
      (12L, "z q"),   // unseen everything: S = 0.4*(0+1)/(4+2)
      (13L, "solo"))  // single token: total row, 0 bigrams, null score
      .toDF("doc_id", "text")
    val got = TextOps.bigramLogProb(docs, lm).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(10L) === ((1L, Some(0.0))))
    assert(math.abs(got(11L)._2.get - math.log(0.4 * 3 / 6)) < 1e-12)
    assert(math.abs(got(12L)._2.get - math.log(0.4 * 1 / 6)) < 1e-12)
    assert(got(13L) === ((0L, None)))
    // self-scored LM doc: 3 positions, (a,b) twice at ln(2/2)=0 and
    // (b,a) once at ln(1/2) -> mean = ln(.5)/3
    assert(math.abs(got(0L)._2.get - math.log(0.5) / 3) < 1e-12)
    // fluency ordering: seen context beats backoff beats OOV
    assert(got(10L)._2.get > got(11L)._2.get && got(11L)._2.get > got(12L)._2.get)
  }

  test("bm25TopKIndexed: agrees with the direct path; query reads only its terms' buckets") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_").toString + "/idx"
    TextOps.bm25SaveIndex(docs, "bm25_spec_idx", root, buckets = 8)
    try {
      val postings = graft.sources.Bucketed.table(spark, "bm25_spec_idx")
      val stats = TextOps.bm25Stats(postings)
      val q = Seq("spark", "hash", "merge")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("doc_id"),
          math.rint(r.getAs[Double]("score") * 1e6) / 1e6)).toSeq
      val indexed = TextOps.bm25TopKIndexed(postings, stats, q, topK = 10)
      // layout invariance: identical ranking and (6-dp) scores
      assert(rows(indexed) === rows(TextOps.bm25TopK(docs, q, topK = 10)))
      // the serving contract: wherever the plan exploits the token
      // layout (the df-per-term window does; a filter-only scan gets
      // its bucketed read auto-disabled as useless), the scan is
      // bucket-PRUNED to the query terms — other tokens' buckets never
      // open — and the window runs exchange-free on the stored layout
      val dfW = postings.filter(col("token").isin(q: _*))
        .withColumn("dfreq", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("token")))
      val winPlan = dfW.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(winPlan).map(_.group(1).toInt)
      assert(sel.exists(_ < 8), s"expected a bucket-pruned scan:\n${winPlan.take(1200)}")
      val nExch = "Exchange hashpartitioning".r.findAllIn(winPlan).length
      assert(nExch === 0, "df-per-term should window exchange-free on the bucketed layout")
    } finally spark.sql("DROP TABLE IF EXISTS bm25_spec_idx")
  }

  test("bm25AppendIndex: incremental commits equal a fresh full build") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_bm25a_").toString + "/idx"
    TextOps.bm25SaveIndex(docs.filter(col("doc_id") < 300), "bm25_spec_app", root, 8)
    TextOps.bm25AppendIndex(docs.filter(col("doc_id") >= 300), "bm25_spec_app", 8)
    try {
      val q = Seq("spark", "hash", "merge")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("doc_id"),
          math.rint(r.getAs[Double]("score") * 1e6) / 1e6)).toSeq
      val table = graft.sources.Bucketed.table(spark, "bm25_spec_app")
      val appended = TextOps.bm25TopKIndexed(
        table, TextOps.bm25Stats(table), q, topK = 10)
      // build-then-append serves the same ranking as one full build
      assert(rows(appended) === rows(TextOps.bm25TopK(docs, q, topK = 10)))
      // the appended files joined the same bucket layout: pruning holds
      val winPlan = graft.sources.Bucketed.table(spark, "bm25_spec_app")
        .filter(col("token").isin(q: _*))
        .withColumn("dfreq", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("token")))
        .queryExecution.executedPlan.toString
      assert("SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(winPlan).exists(_.group(1).toInt < 8))
    } finally spark.sql("DROP TABLE IF EXISTS bm25_spec_app")
  }

  test("pmiCollocations: a planted fixed phrase tops the chart; the support floor holds; deterministic") {
    import spark.implicits._
    // "alpha beta" always co-occur (20x); "noise" words pair freely;
    // "rare gem" appears only 3 times — below the floor of 5
    val rnd = new scala.util.Random(11)
    val noise = (1 to 60).map(_ => s"n${rnd.nextInt(8)} m${rnd.nextInt(8)}")
    val docs = ((1 to 20).map(i => s"alpha beta ${noise(i)} ") ++
      (1 to 3).map(_ => "rare gem plus filler words here and more"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val top = TextOps.pmiCollocations(docs, minCount = 5L, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(top.nonEmpty)
    assert(top.head._1 === "alpha" && top.head._2 === "beta" && top.head._3 === 20L,
      s"planted collocation should rank first, got ${top.head}")
    // below-floor pairs never surface regardless of PMI
    assert(!top.exists(t => t._1 == "rare" && t._2 == "gem"))
    // PMI of a pair that ALWAYS co-occurs with exclusive slots:
    // c12 = cl = cr -> pmi = ln(N / c12)
    val n = TextOps.pmiCollocations(docs, minCount = 1L, topK = 10000).count() // sanity: runs
    assert(n >= 1)
    val a = TextOps.pmiCollocations(docs, 5L, 5).collect().map(_.toString).toSeq
    val b = TextOps.pmiCollocations(docs.repartition(7), 5L, 5).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("tokenEntropy: uniform tokens maximize, repetition collapses, hand-check ln values") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),        // uniform over 4 -> H = ln 4
      (2L, "a a a a"),        // single token -> H = 0
      (3L, "a a b b"),        // uniform over 2 -> H = ln 2
      (4L, "a a a b")         // skewed -> ln 4 - (3 ln 3)/4
    ).toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 4L)
    assert(math.abs(got(1L)._2 - math.log(4)) < 1e-12)
    assert(got(2L)._2 === 0.0)
    assert(math.abs(got(3L)._2 - math.log(2)) < 1e-12)
    assert(math.abs(got(4L)._2 - (math.log(4) - 3 * math.log(3) / 4)) < 1e-12)
    // the boilerplate-cycling page scores BELOW natural prose of the
    // same length — the signal the operator exists for
    val cycling = Seq((1L, "buy now click here buy now click here buy now click here")).toDF("doc_id", "text")
    val prose = Seq((1L, "the quick brown fox jumps over a lazy dog near the river bank")).toDF("doc_id", "text")
    val hc = TextOps.tokenEntropy(cycling).collect().head.getDouble(2)
    val hp = TextOps.tokenEntropy(prose).collect().head.getDouble(2)
    assert(hc < hp)
  }

  test("bm25 index stats commit WITH the postings (atomic); empty-corpus build appends cleanly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_bm25e_").toString + "/idx"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // round-9 ADVICE NPE: building from an EMPTY corpus stored a null
    // avgdl that the first append unboxed; the ledger design stores
    // (0, 0.0) and derives stats with explicit zero guards instead
    TextOps.bm25SaveIndex(empty, "bm25_spec_empty", root, 4)
    try {
      val t0 = graft.sources.Bucketed.table(spark, "bm25_spec_empty")
      val s0 = TextOps.bm25Stats(t0).head()
      assert(s0.getDouble(0) === 0.0 && s0.getDouble(1) === 0.0)
      TextOps.bm25AppendIndex(
        Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text"), "bm25_spec_empty", 4)
      val t1 = graft.sources.Bucketed.table(spark, "bm25_spec_empty")
      val s1 = TextOps.bm25Stats(t1).head()
      assert(s1.getDouble(0) === 2.0 && s1.getDouble(1) === 2.5)
      // atomicity by construction: the stats live as ledger rows of the
      // SAME table the postings committed to — one ledger row per commit,
      // and no side file exists for a crash to leave behind
      assert(t1.filter(col("token") === TextOps.Bm25StatsToken).count() === 2L)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root + "/stats")))
      // ledger rows never leak into retrieval
      val got = TextOps.bm25TopKIndexed(t1, TextOps.bm25Stats(t1), Seq("a"), topK = 10)
      assert(got.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
    } finally spark.sql("DROP TABLE IF EXISTS bm25_spec_empty")
  }

  test("patternCounts: hand-counted matches, non-overlap semantics, null text, bad inputs refused") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at a.b@example.com or x@y.org today"),
      (2L, "aaaa"), // non-overlap: [aa] counts 2, not 3
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.patternCounts(docs, Seq(
      "n_emails" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "n_aa" -> "aa"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) === ((Some(2L), Some(0L))))
    assert(got(2L) === ((Some(0L), Some(2L)))) // leftmost non-overlapping
    assert(got(3L) === ((None, None))) // null text → null counts, no crash
    intercept[IllegalArgumentException](TextOps.patternCounts(docs, Nil))
    intercept[IllegalArgumentException](
      TextOps.patternCounts(docs, Seq("a" -> "x", "a" -> "y")))
  }
}
