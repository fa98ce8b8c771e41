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
  * Algorithm: min-label propagation PLUS pointer doubling. Each round a node
  * adopts the min label among itself, its neighbors, and its label's label
  * (the doubling step halves chain distance, so convergence is genuinely
  * O(log diameter) — plain neighbor propagation alone is O(diameter)). All
  * joins are keyed on doc_id over the tiny verified-pair set, not the corpus;
  * the driver sees one scalar count per round (no collect of data). If the
  * graph has not converged within maxIter the call THROWS rather than
  * returning a silently under-merged clustering.
  */
object DedupCluster {

  /** @param pairs (a, b) undirected near-dup edges (a != b)
    * @return (doc_id, cluster_id) for every doc appearing in an edge,
    *         cluster_id = min doc_id reachable. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 16): DataFrame = {
    val edges = pairs.select(col("a").cast(LongType), col("b").cast(LongType))
      .union(pairs.select(col("b").cast(LongType).as("a"), col("a").cast(LongType).as("b")))
      .distinct()
      .localCheckpoint(true) // materialize once: every round re-joins this
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node adopts the min label among itself and its neighbors…
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc_id", "b"), Seq("b"))
        .select(col("a").as("doc_id"), col("cluster_id"))
      // Both union arms descend from the same checkpointed `labels` plan, so
      // they would share attribute ids — which trips Catalyst's
      // Union.rewriteConstraints at analysis time. toDF re-aliases each arm
      // with fresh expression ids before the union. The checkpoint after the
      // min-agg truncates the lineage so the doubling join below is over a
      // materialized table (and keeps per-round lineage O(1) regardless).
      val propagated = labels.toDF("doc_id", "cluster_id")
        .union(neighborLabels.toDF("doc_id", "cluster_id"))
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      // …then pointer-doubles: adopt its label's label, halving chain depth
      val next = propagated.as("p")
        .join(propagated.as("g"), col("p.cluster_id") === col("g.doc_id"), "left")
        .select(col("p.doc_id").as("doc_id"),
          least(col("p.cluster_id"),
            coalesce(col("g.cluster_id"), col("p.cluster_id"))).as("cluster_id"))
      val changed = next.as("n")
        .join(labels.as("l"), col("n.doc_id") === col("l.doc_id"))
        .where(col("n.cluster_id") =!= col("l.cluster_id")).count()
      labels = next.localCheckpoint(true) // truncate the growing lineage
      converged = changed == 0
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds — " +
        "raise maxIter; returning a partial clustering would silently under-merge")
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

  /** DuckDB replay of [[dedupVerdict]]: the shared minhash pair CTEs
    * (bit-identical spanning edges) feed a recursive-CTE transitive closure;
    * min reachable id per node = the min-label component id the Spark side
    * converges to. Closure size is O(Σ component²) PAIRS — fine for an
    * oracle at test SF; the distributed side stays the O(log d) label
    * propagation. */
  private def clusterOracle: String =
    s"""WITH RECURSIVE ${Dedup.minhashPairsCtes()},
       |     ed AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
       |     reach(n, m) AS (
       |       SELECT doc_id, doc_id FROM documents
       |       UNION
       |       SELECT e.a, r.m FROM ed e JOIN reach r ON r.n = e.b)
       |SELECT n AS doc_id, min(m) AS cluster_id, (min(m) = n) AS is_canonical
       |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin

  /** Fully oracle-checked clustered dedup (chain semantics additionally
    * pinned by DedupClusterSpec). */
  val qDedupCluster: QueryDef = QueryDef.sql("q_dedup_cluster")(clusterOracle) { (s, d) =>
    dedupVerdict(Tables.documents(s, d)).orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(qDedupCluster)
}
