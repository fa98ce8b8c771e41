package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.rowsOnly

/** Near-duplicate CLUSTERING: connected components over the pair graph, with
  * the minimum doc_id as the canonical survivor of each cluster — the final
  * stage of a corpus dedup pipeline (pairs alone under-delete when dups chain
  * A≈B≈C without A≈C).
  *
  * Algorithm: iterative min-label propagation. Each round joins labels across
  * edges (shuffle keyed on doc_id — the edge list is the tiny verified-pair
  * set, not the corpus) and keeps the smaller label; converges in
  * O(log(longest chain)) rounds, with a driver-side fixpoint check per round
  * (one scalar count per iteration — no collect of data). At 100 TB the edge
  * list after MinHash verification is orders of magnitude smaller than the
  * corpus, so each round is a small-table self-join.
  */
object DedupCluster {

  /** @param pairs (a, b) undirected near-dup edges (a != b)
    * @return (doc_id, cluster_id) for every doc appearing in an edge,
    *         cluster_id = min doc_id reachable. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("a").cast(LongType), col("b").cast(LongType))
      .union(pairs.select(col("b").cast(LongType).as("a"), col("a").cast(LongType).as("b")))
      .distinct()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node adopts the min label among itself and its neighbors
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc_id", "b"), Seq("b"))
        .select(col("a").as("doc_id"), col("cluster_id"))
      val next = labels.select(col("doc_id"), col("cluster_id"))
        .union(neighborLabels)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
      val changed = next.as("n")
        .join(labels.as("l"), col("n.doc_id") === col("l.doc_id"))
        .where(col("n.cluster_id") =!= col("l.cluster_id")).count()
      labels = next.localCheckpoint(true) // truncate the growing lineage
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** Full pipeline: MinHash candidate pairs → clusters → per-doc verdict
    * (canonical survivor vs duplicate-of). Docs without near-dups are their
    * own singleton cluster. */
  def dedupVerdict(docs: DataFrame, thresh: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashPairs(docs, thresh = thresh).select("a", "b")
    val clusters = connectedComponents(pairs)
    docs.select("doc_id").join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("is_canonical", col("cluster_id") === col("doc_id"))
  }

  /** Clustered-dedup over documents (rows-only: murmur-family hashes have no
    * SQL twin; chain semantics are pinned by DedupClusterSpec). */
  val qDedupCluster: QueryDef = rowsOnly("q_dedup_cluster") { (s, d) =>
    dedupVerdict(Tables.documents(s, d)).orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(qDedupCluster)
}
