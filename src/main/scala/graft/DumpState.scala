package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Builder-side tool: dump the deterministic ANN model state (k-means
  * centroids, IVF sample centroids, PQ codebooks, LSH hyperplanes) for a
  * testdata dir as JSON — the exact values the x-query registrations run
  * with, captured for oracle-SQL prototyping outside Spark. Not part of
  * the engine (the ExplainOne / TimeX41 class of tooling).
  */
object DumpState {
  private def fArr(a: Array[Float]): String = a.mkString("[", ",", "]")
  private def dArr(a: Array[Double]): String = a.mkString("[", ",", "]")
  private def fArr2(a: Array[Array[Float]]): String = a.map(fArr).mkString("[", ",", "]")
  private def fArr3(a: Array[Array[Array[Float]]]): String = a.map(fArr2).mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/ann_state.json"
    val spark = GraftSession.getOrCreate("local[8]")
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val kmeans = Similarity.kmeansCentroidArrays(emb, 16, 2)
    val ivf = Similarity.trainingSample(emb, 16)
    val pq = Similarity.pqCodebooks(emb, 8, 16, iters = 1)
    val (ivfpqCents, ivfpqCb) = Similarity.ivfPqModel(emb, 16, 8, 16, iters = 1)
    val planes10 = Similarity.hyperplanes(4, 8, 64)
    val planes15 = Similarity.hyperplanes(4, 10, 64)
    def planes(p: Seq[Seq[Array[Double]]]): String =
      p.map(t => t.map(dArr).mkString("[", ",", "]")).mkString("[", ",", "]")
    val json =
      s"""{
         |"kmeans": ${fArr2(kmeans)},
         |"ivf": ${fArr2(ivf)},
         |"pq": ${fArr3(pq)},
         |"ivfpq_cents": ${fArr2(ivfpqCents)},
         |"ivfpq_cb": ${fArr3(ivfpqCb)},
         |"planes10": ${planes(planes10)},
         |"planes15": ${planes(planes15)}
         |}""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[dump] wrote $out")
    spark.stop()
  }
}
