package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Two paths, as a production pipeline needs both:
  *  - brute-force cosine top-k: exact baseline. The query set is broadcast
  *    (bounded), the corpus streams; cost O(|Q|·n) FLOPs with zero shuffle on
  *    the corpus side, then a per-query top-k window.
  *  - sign-LSH (random hyperplanes) bucketed ANN: the 100 TB path. Buckets
  *    shrink candidate sets ~2^planes ×; recall is tunable via plane count /
  *    multi-probe. Hyperplanes are seed-42 deterministic so results (and the
  *    oracle) are reproducible.
  *
  * Vector math runs through the native codegen'd
  * [[graft.functions.FloatVecDot]] (doGenCode loop, no UDFs); `q_vector_math`
  * keeps the equivalent higher-order-function formulation on the books. Both
  * fold the 64 products in index order with double accumulation, so scores
  * are bit-reproducible across engines (and against the DuckDB oracle).
  */
object Similarity {

  /** Exact cosine similarity between two float-array columns (double math).
    * Dot products use the native codegen'd [[graft.functions.FloatVecDot]] —
    * bit-identical to the HOF formulation (index-order double accumulation)
    * but ~whole-stage-codegen fast in the pairwise scoring hot loop. */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.FloatVecDot.fdot _
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Deterministic hyperplanes: seed-42 uniform [-0.5, 0.5) components. */
  def hyperplanes(nPlanes: Int = 8, dim: Int = 64): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextDouble() - 0.5))
  }

  private def planeLit(p: Array[Double]): Column = array(p.map(lit(_)).toIndexedSeq: _*)

  /** Sign-LSH bucket id: one bit per hyperplane = sign of the projection.
    * Projections use the codegen'd FloatVecDot (float vec · double plane),
    * same index-order accumulation as the HOF/oracle formulation. */
  def lshBucket(v: Column, nPlanes: Int = 8, dim: Int = 64): Column = {
    val planes = hyperplanes(nPlanes, dim)
    planes.zipWithIndex.map { case (p, i) =>
      val dotP = graft.functions.FloatVecDot.fdot(v, planeLit(p))
      when(dotP >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Brute-force cosine top-k: queries broadcast against the full corpus. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val qx = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")))
    val scored = qx.join(emb.select(col("vec_id").as("cid"), col("embedding").as("ce")),
        col("qid") =!= col("cid"))
      .withColumn("score", cosine(col("qe"), col("ce")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType)).where(col("rnk") <= k)
      .select("qid", "cid", "rnk", "score")
  }

  /** DuckDB twin of [[lshBucket]]: literal seed-42 planes, same fold order,
    * so the sign bits (and hence buckets) are bit-identical across engines. */
  private[ext] def duckBucketSql(colName: String, nPlanes: Int = 8): String =
    hyperplanes(nPlanes).zipWithIndex.map { case (p, i) =>
      val planeLit = p.map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_aggregate(list_transform(list_zip($colName, $planeLit), " +
        s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB twin of [[cosine]]: same index-order fold, numeric struct keys. */
  private[ext] def duckCosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_aggregate(list_transform(list_zip($x, $y), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  val qTopkCosine: QueryDef = q("q_topk_cosine")(
    s"""WITH qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
       |     scored AS (SELECT qid, e.vec_id AS cid, ${duckCosine("qe", "e.embedding")} AS score
       |                FROM qs JOIN embeddings e ON e.vec_id <> qid),
       |     ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |                                ORDER BY score DESC, cid) AS INTEGER) AS rnk FROM scored)
       |SELECT qid, cid, rnk, score FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    bruteForceTopK(emb, emb.where(col("vec_id") < 8), k = 10)
      .orderBy("qid", "rnk")
  }

  /** ANN via sign-LSH buckets: join queries to candidates sharing the bucket,
    * exact cosine inside, top-k per query. Trades recall for a candidate set
    * ~2^8 smaller — the shape that survives 100 TB (bucket-keyed shuffle,
    * no cross-bucket pairs materialized). Recall vs brute force is asserted
    * in SimilaritySpec on planted identical vectors. */
  def annTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("bucket", lshBucket(col("ce")))
    val qs = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("bucket", lshBucket(col("qe"))))
    val scored = qs.join(corpus, Seq("bucket")).where(col("qid") =!= col("cid"))
      .withColumn("score", cosine(col("qe"), col("ce")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType)).where(col("rnk") <= k)
      .select("qid", "cid", "rnk", "score")
  }

  val qAnnLsh: QueryDef = q("q_ann_lsh")(
    s"""WITH b AS (SELECT vec_id, embedding, ${duckBucketSql("embedding")} AS bucket FROM embeddings),
       |     qs AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM b WHERE vec_id < 8),
       |     scored AS (SELECT qid, c.vec_id AS cid, ${duckCosine("qe", "c.embedding")} AS score
       |                FROM qs JOIN b c ON qs.bucket = c.bucket AND c.vec_id <> qid),
       |     ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |                                ORDER BY score DESC, cid) AS INTEGER) AS rnk FROM scored)
       |SELECT qid, cid, rnk, score FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    annTopK(emb, emb.where(col("vec_id") < 8), k = 10).orderBy("qid", "rnk")
  }

  /** Multi-probe ANN: each query also probes the buckets at Hamming distance
    * 1 from its own (flip one sign bit) — the standard recall/cost dial for
    * sign-LSH. Candidates ≈ (1 + nPlanes) buckets per query instead of 1,
    * still a vanishing fraction of the corpus; the corpus side is untouched
    * (probing explodes only the tiny broadcast query set). */
  def annTopKMultiProbe(emb: DataFrame, queries: DataFrame, k: Int,
                        nPlanes: Int = 8): DataFrame = {
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("bucket", lshBucket(col("ce")))
    val qs = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("bucket0", lshBucket(col("qe")))
    val probed = broadcast(qs.select(col("qid"), col("qe"), explode(
      expr(s"array_union(array(bucket0), transform(sequence(0, ${nPlanes - 1}), i -> bucket0 ^ shiftleft(1L, i)))"))
      .as("bucket")))
    val scored = probed.join(corpus, Seq("bucket")).where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qe"), col("ce")).distinct()
      .withColumn("score", cosine(col("qe"), col("ce")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w).cast(IntegerType)).where(col("rnk") <= k)
      .select("qid", "cid", "rnk", "score")
  }

  val qAnnMultiProbe: QueryDef = q("q_ann_multiprobe")(
    s"""WITH b AS (SELECT vec_id, embedding, ${duckBucketSql("embedding")} AS bucket FROM embeddings),
       |     q0 AS (SELECT vec_id AS qid, bucket AS b0 FROM b WHERE vec_id < 8),
       |     probes AS (SELECT qid, unnest(list_distinct(list_prepend(b0,
       |                  list_transform(range(0, 8), i -> xor(b0, 1::BIGINT << i))))) AS bucket
       |                FROM q0),
       |     cand AS (SELECT DISTINCT qid, c.vec_id AS cid
       |              FROM probes JOIN b c ON probes.bucket = c.bucket AND c.vec_id <> qid),
       |     scored AS (SELECT qid, cid, ${duckCosine("qe.embedding", "ce.embedding")} AS score
       |                FROM cand JOIN embeddings qe ON qe.vec_id = qid
       |                          JOIN embeddings ce ON ce.vec_id = cid),
       |     ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |                                ORDER BY score DESC, cid) AS INTEGER) AS rnk FROM scored)
       |SELECT qid, cid, rnk, score FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    annTopKMultiProbe(emb, emb.where(col("vec_id") < 8), k = 10).orderBy("qid", "rnk")
  }

  /** Pairwise dot-product / norm surface as its own checked query (the
    * `functions.aggregate`/`zip_with` math without the ranking). */
  val qVectorMath: QueryDef = q("q_vector_math")(
    s"""SELECT vec_id,
       |       list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS sq_norm,
       |       CAST(len(embedding) AS INTEGER) AS dim
       |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d).select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), (acc, v) => acc + v)
        .as("sq_norm"),
      size(col("embedding")).as("dim"))
      .orderBy("vec_id")
  }

  /** Recall@k of each ANN path against the exact brute-force ground truth,
    * as a STANDING ORACLE ROW — the quality claim of the ANN family, machine-
    * checked per round instead of only spec-asserted on planted clusters.
    * Everything upstream is seed-pinned (hyperplanes, IVF centroids), so the
    * per-query recall is deterministic and DuckDB replays the whole
    * computation: exact top-10, then LSH / multi-probe LSH / IVF top-10, and
    * |ANN ∩ exact| / |exact| per (method, query) — the multi-probe row makes
    * the recall/cost dial visible next to its single-bucket base. ExtSpec
    * asserts a recall floor so a silent quality regression (e.g. a bucketing
    * change that tanks recall while staying "correct") fails the suite. */
  val qAnnRecall: QueryDef = q("q_ann_recall")(
    s"""WITH b AS (SELECT vec_id, embedding, ${duckBucketSql("embedding")} AS bucket FROM embeddings),
       |     qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
       |     se AS (SELECT qid, e.vec_id AS cid, ${duckCosine("qe", "e.embedding")} AS score
       |            FROM qs JOIN embeddings e ON e.vec_id <> qid),
       |     re AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM se),
       |     exact AS (SELECT qid, cid FROM re WHERE rnk <= 10),
       |     ql AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM b WHERE vec_id < 8),
       |     sl AS (SELECT qid, c.vec_id AS cid, ${duckCosine("qe", "c.embedding")} AS score
       |            FROM ql JOIN b c ON ql.bucket = c.bucket AND c.vec_id <> qid),
       |     rl AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM sl),
       |     lsh AS (SELECT qid, cid FROM rl WHERE rnk <= 10),
       |     dv AS (SELECT vec_id, embedding,
       |                   [${Ivf.searchCentroids.map(Ivf.assignDistSql).mkString(",\n                    ")}] AS ds
       |            FROM embeddings),
       |     corpus AS (SELECT vec_id AS cid, embedding AS ce,
       |                       CAST(list_position(ds, list_min(ds)) - 1 AS INTEGER) AS cell FROM dv),
       |     probes AS (SELECT vec_id AS qid, embedding AS qe,
       |                       unnest(list_transform(list_slice(list_sort(
       |                         list_transform(range(1, 9), i -> {'d': ds[i], 'i': CAST(i - 1 AS INTEGER)})),
       |                         1, 2), s2 -> s2.i)) AS cell
       |                FROM dv WHERE vec_id < 8),
       |     si AS (SELECT qid, cid, ${duckCosine("qe", "ce")} AS score
       |            FROM probes JOIN corpus ON probes.cell = corpus.cell AND cid <> qid),
       |     ri AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM si),
       |     ivf AS (SELECT qid, cid FROM ri WHERE rnk <= 10),
       |     q0 AS (SELECT vec_id AS qid, bucket AS b0 FROM b WHERE vec_id < 8),
       |     pm AS (SELECT qid, unnest(list_distinct(list_prepend(b0,
       |              list_transform(range(0, 8), i -> xor(b0, 1::BIGINT << i))))) AS bucket
       |            FROM q0),
       |     candm AS (SELECT DISTINCT qid, c.vec_id AS cid
       |               FROM pm JOIN b c ON pm.bucket = c.bucket AND c.vec_id <> qid),
       |     sm AS (SELECT qid, cid, ${duckCosine("qe.embedding", "ce.embedding")} AS score
       |            FROM candm JOIN embeddings qe ON qe.vec_id = qid
       |                       JOIN embeddings ce ON ce.vec_id = cid),
       |     rm AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM sm),
       |     mp AS (SELECT qid, cid FROM rm WHERE rnk <= 10),
       |     rec_l AS (SELECT e.qid, count(*) AS n_exact,
       |                      CAST(sum(CASE WHEN l.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |               FROM exact e LEFT JOIN lsh l ON e.qid = l.qid AND e.cid = l.cid
       |               GROUP BY e.qid),
       |     rec_m AS (SELECT e.qid, count(*) AS n_exact,
       |                      CAST(sum(CASE WHEN m.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |               FROM exact e LEFT JOIN mp m ON e.qid = m.qid AND e.cid = m.cid
       |               GROUP BY e.qid),
       |     rec_i AS (SELECT e.qid, count(*) AS n_exact,
       |                      CAST(sum(CASE WHEN i.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |               FROM exact e LEFT JOIN ivf i ON e.qid = i.qid AND e.cid = i.cid
       |               GROUP BY e.qid)
       |SELECT method, qid, n_exact, n_hit,
       |       CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
       |FROM (SELECT 'lsh' AS method, * FROM rec_l
       |      UNION ALL SELECT 'lsh_mp' AS method, * FROM rec_m
       |      UNION ALL SELECT 'ivf' AS method, * FROM rec_i)
       |ORDER BY method, qid""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val queries = emb.where(col("vec_id") < 8)
    val exact = bruteForceTopK(emb, queries, 10).select("qid", "cid")
    def recallOf(method: String, ann: DataFrame): DataFrame =
      exact.join(ann.select(col("qid"), col("cid")).withColumn("hit", lit(1L)),
          Seq("qid", "cid"), "left")
        .groupBy("qid")
        .agg(count(lit(1)).as("n_exact"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(lit(method).as("method"), col("qid"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast(DoubleType) / col("n_exact").cast(DoubleType)).as("recall"))
    recallOf("lsh", annTopK(emb, queries, 10))
      .unionByName(recallOf("lsh_mp", annTopKMultiProbe(emb, queries, 10)))
      .unionByName(recallOf("ivf",
        Ivf.ivfTopK(emb, queries, 10, Ivf.searchCentroids, nprobe = 2)))
      .orderBy("method", "qid")
  }

  /** Per-vector int8 SCALAR QUANTIZATION — the 4× storage/bandwidth dial for
    * embedding columns at 100 TB (FAISS SQ8 shape): each vector stores 64
    * bytes of codes plus its own (min, max) scale, code_i =
    * floor((x_i−mn)/span·255 + 0.5). Both engines evaluate the SAME double
    * expression tree (float→double widening, one divide, one multiply,
    * floor), so codes AND the per-vector max reconstruction error are
    * bit-identical — the error column doubles as a standing quality bound
    * (≤ span/510 + fp noise). A constant vector (span 0) quantizes to code
    * 0 with zero error via the span=1 guard. Row-local: no shuffle at all
    * before the final order. */
  val qEmbedQuant: QueryDef = q("q_embed_quant")(
    """WITH t AS (SELECT vec_id,
      |                  CAST(list_min(embedding) AS DOUBLE) AS mn,
      |                  CAST(list_max(embedding) AS DOUBLE) AS mx,
      |                  embedding AS e
      |           FROM embeddings),
      |     s AS (SELECT vec_id, mn, mx,
      |                  CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END AS span, e FROM t)
      |SELECT vec_id, mn, mx,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(e, x -> CAST(floor(((CAST(x AS DOUBLE) - mn) / span) * 255 + 0.5) AS BIGINT))),
      |         (acc, c) -> (acc * 31 + c) % 1000000007) AS codes_hash,
      |       list_aggregate(list_transform(e, x ->
      |         abs(mn + (CAST(floor(((CAST(x AS DOUBLE) - mn) / span) * 255 + 0.5) AS DOUBLE) / 255.0) * span
      |             - CAST(x AS DOUBLE))), 'max') AS max_err
      |FROM s ORDER BY vec_id""".stripMargin) { (s, d) =>
    // codes are folded to the repo's standard order-sensitive polynomial
    // checksum (a BIGINT) rather than emitted as an array: no oracle row
    // outputs raw arrays — the driver's value hash compares scalars
    Tables.embeddings(s, d)
      .withColumn("mn", expr("CAST(array_min(embedding) AS DOUBLE)"))
      .withColumn("mx", expr("CAST(array_max(embedding) AS DOUBLE)"))
      .withColumn("span", when(col("mx") === col("mn"), lit(1.0)).otherwise(col("mx") - col("mn")))
      .select(col("vec_id"), col("mn"), col("mx"),
        expr("""aggregate(transform(embedding,
               |  x -> CAST(floor(((CAST(x AS DOUBLE) - mn) / span) * 255 + 0.5) AS BIGINT)),
               |  CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin)
          .as("codes_hash"),
        expr("""aggregate(transform(embedding, x ->
               |  abs(mn + (CAST(floor(((CAST(x AS DOUBLE) - mn) / span) * 255 + 0.5) AS DOUBLE) / 255.0) * span
               |      - CAST(x AS DOUBLE))), CAST(0 AS DOUBLE), (a, v) -> greatest(a, v))""".stripMargin)
          .as("max_err"))
      .orderBy("vec_id")
  }

  /** Search quality of the int8-quantized store, machine-checked: top-10
    * cosine over RECONSTRUCTED vectors (decode = mn + code/255·span, the
    * exact inverse of [[qEmbedQuant]]'s encode) joined against the exact
    * float ground truth, per-query recall out. Quantization noise is the
    * ONLY difference between the two pipelines, so this row is a standing
    * measurement of what 4× compression costs in retrieval quality —
    * deterministic end to end (encode/decode and the cosine folds are
    * bit-identical in both engines). ExtSpec floors the mean recall. */
  val qAnnSq8: QueryDef = q("q_ann_sq8")({
    val recon = "list_transform(e, x -> mn + (floor(((CAST(x AS DOUBLE) - mn) / span) * 255 + 0.5) / 255.0) * span)"
    s"""WITH t AS (SELECT vec_id, CAST(list_min(embedding) AS DOUBLE) AS mn,
       |                  CAST(list_max(embedding) AS DOUBLE) AS mx, embedding AS e
       |           FROM embeddings),
       |     rq AS (SELECT vec_id, $recon AS r FROM (
       |              SELECT vec_id, mn, CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END AS span, e FROM t)),
       |     qs AS (SELECT vec_id AS qid, e AS qe FROM t WHERE vec_id < 8),
       |     se AS (SELECT qid, c.vec_id AS cid, ${duckCosine("qe", "c.e")} AS score
       |            FROM qs JOIN t c ON c.vec_id <> qid),
       |     re AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM se),
       |     exact AS (SELECT qid, cid FROM re WHERE rnk <= 10),
       |     rqs AS (SELECT vec_id AS qid, r AS qr FROM rq WHERE vec_id < 8),
       |     sq AS (SELECT qid, c.vec_id AS cid, ${duckCosine("qr", "c.r")} AS score
       |            FROM rqs JOIN rq c ON c.vec_id <> qid),
       |     rr AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM sq),
       |     sq8 AS (SELECT qid, cid FROM rr WHERE rnk <= 10)
       |SELECT e.qid, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN s.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |       CAST(sum(CASE WHEN s.cid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
       |         CAST(count(*) AS DOUBLE) AS recall
       |FROM exact e LEFT JOIN sq8 s ON e.qid = s.qid AND e.cid = s.cid
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin
  }) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    // decode(encode(x)) in ONE expression tree, same op order as the oracle
    val rq = emb
      .withColumn("mn", expr("CAST(array_min(embedding) AS DOUBLE)"))
      .withColumn("mx", expr("CAST(array_max(embedding) AS DOUBLE)"))
      .withColumn("span", when(col("mx") === col("mn"), lit(1.0)).otherwise(col("mx") - col("mn")))
      .select(col("vec_id"), expr(
        "transform(embedding, x -> mn + (floor(((CAST(x AS DOUBLE) - mn) / span) * 255 + 0.5) / 255.0) * span)")
        .as("r"))
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    def cosineD(a: Column, b: Column): Column =
      dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))
    val exact = bruteForceTopK(emb, emb.where(col("vec_id") < 8), k = 10).select("qid", "cid")
    val qs = broadcast(rq.where(col("vec_id") < 8).select(col("vec_id").as("qid"), col("r").as("qr")))
    val scored = qs.join(rq.select(col("vec_id").as("cid"), col("r").as("cr")),
        col("qid") =!= col("cid"))
      .withColumn("score", cosineD(col("qr"), col("cr")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid").asc)
    val sq8 = scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 10)
      .select("qid", "cid")
    exact.join(sq8.withColumn("hit", lit(1L)), Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("qid"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast(DoubleType) / col("n_exact").cast(DoubleType)).as("recall"))
      .orderBy("qid")
  }

  val defs: Seq[QueryDef] = Seq(qTopkCosine, qAnnLsh, qAnnMultiProbe, qVectorMath,
    qAnnRecall, qEmbedQuant, qAnnSq8)
}
