package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DedupCluster, Ivf, Similarity}

/** Chain semantics of near-dup clustering (A≈B≈C without A≈C must collapse to
  * one cluster) and multi-probe ANN recall vs single-probe.
  */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components collapse chains to the min label") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val cc = DedupCluster.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("pointer doubling collapses a 30-node chain within the default round budget") {
    // plain neighbor propagation needs ~29 rounds here; doubling needs ~6
    val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = DedupCluster.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(cc.length === 30)
    assert(cc.forall(_._2 === 0L), s"non-converged labels: ${cc.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("non-convergence within maxIter throws instead of under-merging silently") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    intercept[IllegalStateException] {
      DedupCluster.connectedComponents(pairs, maxIter = 1)
    }
  }

  test("dedupVerdict: chained near-dups share a cluster, one canonical each") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      (10L, base),
      (11L, base.replace("gamma", "g1")),            // ≈ 10
      (12L, base.replace("gamma", "g1").replace("omega", "o2")), // ≈ 11, maybe not ≈ 10
      (30L, "unrelated words entirely different content about query engines and lakes at large scale"))
      .toDF("doc_id", "text")
    val verdict = DedupCluster.dedupVerdict(docs, thresh = 0.4)
      .select("doc_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(verdict(10L)._2 === 10L && verdict(10L)._3)
    assert(verdict(11L)._2 === 10L && !verdict(11L)._3)
    assert(verdict(12L)._2 === 10L && !verdict(12L)._3) // via the 11-chain
    assert(verdict(30L)._2 === 30L && verdict(30L)._3)
  }

  test("IVF: identical vectors share a cell and are recalled at rank 1") {
    val emb = Tables.embeddings(spark, sf)
    val centroids = Ivf.trainCentroids(emb, k = 8, iters = 2)
    assert(centroids.size === 8 && centroids.forall(_.length === 64))
    // plant an exact duplicate of vec 0 and query for it
    val dup = emb.where(col("vec_id") === 0)
      .withColumn("vec_id", lit(9999L)).select("vec_id", "embedding", "label")
    val corpus = emb.select("vec_id", "embedding", "label").unionByName(dup)
    val top = Ivf.ivfTopK(corpus, corpus.where(col("vec_id") === 9999L), k = 1, centroids)
      .select("cid", "score").as[(Long, Double)].collect()
    assert(top.nonEmpty && top.head._1 === 0L, s"IVF missed the duplicate: ${top.toSeq}")
    assert(math.abs(top.head._2 - 1.0) < 1e-12)
  }

  test("native FloatVecDot is bit-equal to the HOF dot product") {
    import org.apache.spark.sql.types.DoubleType
    val emb = Tables.embeddings(spark, sf).limit(100)
    val hof = expr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)")
    val native = graft.functions.FloatVecDot.fdot(col("embedding"), col("embedding"))
    val diffs = emb.select((hof - native).as("d")).as[Double].collect()
    assert(diffs.forall(_ == 0.0), s"bit mismatch: ${diffs.filter(_ != 0.0).take(3).toSeq}")
  }

  test("multi-probe ANN candidate set contains the single-probe set") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.where(col("vec_id") < 4)
    val single = Similarity.annTopK(emb, qs, k = 50)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val multi = Similarity.annTopKMultiProbe(emb, qs, k = 50)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi))
    assert(multi.size >= single.size)
  }
}
