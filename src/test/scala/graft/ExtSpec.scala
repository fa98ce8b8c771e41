package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity}

/** LLM-pipeline extension behavior on PLANTED cases: near-dup recall for
  * MinHash/SimHash/n-gram, ANN recall vs brute force, multimodal decode
  * determinism. The testdata documents are all-distinct, so recall has to be
  * proven on synthetic near-duplicates.
  */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
    "into the deep green forest while the hunter watches quietly from a hill"

  /** doc 1 ≈ doc 2 (one word changed), doc 3 unrelated. */
  private def plantedDocs = Seq(
    (1L, base, "en", "s", base.length.toLong),
    (2L, base.replace("lazy", "sleepy"), "en", "s", base.length.toLong),
    (3L, "completely different content about spark query engines and data lakes at scale " +
      "with partitions shuffles and columnar formats everywhere", "en", "s", 120L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("minhash near-dup finds the planted pair and not the unrelated doc") {
    val out = Dedup.minhashNearDups(plantedDocs, thresh = 0.4)
      .select("doc_id", "n_near_dups", "min_dup_id")
      .as[(Long, Long, Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1L && out(1L)._3 === Some(2L))
    assert(out(2L)._2 === 1L && out(2L)._3 === Some(1L))
    assert(out(3L)._2 === 0L)
  }

  test("exact dedup collapses identical texts to the lowest doc_id") {
    val docs = Seq((5L, "same"), (9L, "same"), (7L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(docs).select("doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((5L, 2L), (7L, 1L)))
  }

  test("simhash of identical texts is identical; near texts share a band") {
    val out = Dedup.simhashNearDups(plantedDocs)
      .select("doc_id", "n_candidates").as[(Long, Long)].collect().toMap
    assert(out(1L) >= 1L && out(2L) >= 1L) // near pair lands in a common band
  }

  test("ngram jaccard verifies the planted pair above threshold") {
    val pairs = Dedup.ngramJaccardDups(plantedDocs, thresh = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("brute-force cosine top-1 of a vector's duplicate is the duplicate") {
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => i.toFloat / 64f), 0),
      (2L, Array.tabulate(64)(i => i.toFloat / 64f), 0), // exact dup of 1
      (3L, Array.tabulate(64)(i => ((63 - i).toFloat) / 64f), 1))
      .toDF("vec_id", "embedding", "label")
    val top1 = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 1), k = 1)
      .select("cid", "score").as[(Long, Double)].head()
    assert(top1._1 === 2L)
    assert(math.abs(top1._2 - 1.0) < 1e-12)
  }

  test("ANN recall: identical vectors land in the same LSH bucket") {
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => math.sin(i + 1).toFloat), 0),
      (2L, Array.tabulate(64)(i => math.sin(i + 1).toFloat), 0),
      (3L, Array.tabulate(64)(i => math.cos(i * 3 + 2).toFloat), 1))
      .toDF("vec_id", "embedding", "label")
    val ann = Similarity.annTopK(vecs, vecs.where(col("vec_id") === 1), k = 5)
      .select("cid").as[Long].collect()
    assert(ann.contains(2L), "exact duplicate must be recalled from the same bucket")
  }

  test("shingles and simhash honor the caller's column, not a hardcoded 'text'") {
    val df = Seq((1L, "a b c d e")).toDF("id", "body")
    val sh = df.select(Dedup.shingles(col("body")).as("sh")).head.getSeq[String](0)
    assert(sh === Seq("a b c", "b c d", "c d e"))
    val viaBody = df.select(Dedup.simhash("body")).head.getLong(0)
    val viaText = df.withColumnRenamed("body", "text")
      .select(Dedup.simhash("text")).head.getLong(0)
    assert(viaBody === viaText)
  }

  test("hash sampling and split assignment are deterministic and well-proportioned") {
    val a = graft.ext.Sampling.qSampleHash.impl(spark, sf).collect()
    val b = graft.ext.Sampling.qSampleHash.impl(spark, sf).collect()
    assert(a.toSeq === b.toSeq) // bit-identical across runs: no RNG anywhere
    val splits = graft.ext.Sampling.qSplitAssign.impl(spark, sf)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val total = splits.values.sum.toDouble
    assert(splits("train") / total > 0.7 && splits("train") / total < 0.9)
    assert(splits.keySet === Set("train", "val", "test"))
    // stratified: exactly min(50, stratum size) per language
    val perLang = graft.ext.Sampling.qSampleStratified.impl(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val strata = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    strata.foreach { case (lang, n) =>
      assert(perLang(lang) === math.min(50L, n), s"lang $lang")
    }
  }

  test("hashBucket is overflow-safe: ids beyond 2^32 bucket exactly, in range") {
    // without the mod-(2^31-1) pre-reduction, id * 2654435761 overflows int64
    // for ids >= ~4.3e9 — Spark would wrap silently while DuckDB errors
    val ids = Seq(4300000000L, 9000000000000000000L, Long.MaxValue)
    val got = ids.toDF("doc_id")
      .select(graft.ext.Sampling.hashBucket(col("doc_id")))
      .as[Long].collect().toSeq
    val expected = ids.map(id =>
      math.floorMod(math.floorMod(id, 2147483647L) * 2654435761L, 1000L))
    assert(got === expected)
    assert(got.forall(b => b >= 0 && b < 1000))
  }

  test("hash sampling is invariant to partitioning (no RNG, no partition state)") {
    val base = Tables.documents(spark, sf)
    val expected = base.withColumn("bucket",
        graft.ext.Sampling.hashBucket(col("doc_id")))
      .where(col("bucket") < 100).select("doc_id").as[Long].collect().sorted
    Seq(1, 7, 32).foreach { n =>
      val got = base.repartition(n).withColumn("bucket",
          graft.ext.Sampling.hashBucket(col("doc_id")))
        .where(col("bucket") < 100).select("doc_id").as[Long].collect().sorted
      assert(got === expected, s"sample changed under repartition($n)")
    }
  }

  test("multimodal stub decode is deterministic and matches meta lengths") {
    val docs = Tables.documents(spark, sf).limit(50)
    val a = Multimodal.decodeAll(spark, Multimodal.mediaTable(docs))
      .collect().sortBy(_.doc_id)
    val b = Multimodal.decodeAll(spark, Multimodal.mediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
    val lens = docs.select(col("doc_id"), length(col("text").cast("binary")).cast("long"))
      .as[(Long, Long)].collect().toMap
    a.foreach(f => assert(f.byte_len === lens(f.doc_id)))
  }

  test("IVF top-k on planted clusters: trained cells give high recall vs brute force") {
    // 4 well-separated clusters of 50 points each: center j lights up
    // dimensions where i % 4 == j; deterministic jitter, no RNG
    val rows = for (j <- 0 until 4; p <- 0 until 50) yield {
      val id = (j * 50 + p).toLong
      val v = Array.tabulate(64) { i =>
        val center = if (i % 4 == j) 1.0f else 0.0f
        center + 0.02f * (((id * 13 + i * 7) % 11).toFloat - 5f) / 5f
      }
      (id, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val centroids = graft.ext.Ivf.trainCentroids(emb, k = 4, iters = 3)
    val queries = emb.where(col("vec_id").isin(0L, 60L, 120L, 180L, 25L, 75L, 125L, 175L))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val iv = pairs(graft.ext.Ivf.ivfTopK(emb, queries, k = 10, centroids, nprobe = 2))
    val recall = (bf intersect iv).size.toDouble / bf.size
    assert(recall >= 0.9, f"IVF recall $recall%.2f < 0.9 (bf=${bf.size}, ivf=${iv.size})")
    // and the probed search is actually restricted: each query scores only
    // its nprobe cells' members, so the candidate set is smaller than N
    assert(iv.size === bf.size) // same top-k cardinality back
  }

  test("persisted IVF index: delta-only maintenance, search equals fresh assignment, no corpus scan") {
    import graft.ext.Ivf
    val emb = Tables.embeddings(spark, sf)
    val vt = graft.vt.VersionedTable.create(Tables.scratch("test_ivf_corpus"))
    val ixVt = graft.vt.VersionedTable.create(Tables.scratch("test_ivf_index"))
    val c0 = vt.write(emb.where(col("vec_id") % 5 =!= 0), "main", "v0")
    Ivf.maintainIvfIndex(vt, ixVt, Ivf.searchCentroids)
    val c1 = vt.write(emb.where(col("vec_id") % 5 === 0), "main", "v1 increment",
      mode = "append")
    Ivf.maintainIvfIndex(vt, ixVt, Ivf.searchCentroids)
    // the index tracked the corpus version-for-version and covers every vector
    assert(ixVt.head("main").get.version === 1)
    assert(ixVt.read(spark, "main").count() === emb.count())
    // the increment pass reads ONLY the corpus delta files (CDC fast path):
    // the plan the maintenance assigns from is pinned to v1's added files
    val delta = vt.changes(spark, "main", 0, 1)
    val added = c1.files.toSet -- c0.files.toSet
    assert(delta.inputFiles.length === added.size,
      s"increment maintenance would scan ${delta.inputFiles.length} files, delta is ${added.size}")
    // centroids round-trip from the persisted object, bit-identical
    val back = Ivf.readIndexCentroids(ixVt)
    assert(back.map(_.toSeq) === Ivf.searchCentroids.map(_.toSeq))
    // search over the persisted index == search with fresh assignment, and
    // its corpus side reads ONLY index-table files
    val queries = emb.where(col("vec_id") < 8)
    val indexDf = ixVt.read(spark, "main")
    val ixFiles = ixVt.head("main").get.files.toSet
    assert(indexDf.inputFiles.forall(f => ixFiles.exists(f.endsWith)),
      "index read must touch only index-table files")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "rnk").as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(rows(Ivf.ivfTopKIndexed(indexDf, queries, 10, back, nprobe = 2))
      === rows(Ivf.ivfTopK(emb, queries, 10, Ivf.searchCentroids, nprobe = 2)))
    // changing centroids mid-life is refused: earlier versions were assigned
    // under the persisted matrix, so a silent re-assign would mix regimes
    // (and readIndexCentroids would keep returning the stale matrix)
    intercept[IllegalArgumentException](
      Ivf.maintainIvfIndex(vt, ixVt, Ivf.searchCentroids.map(_.map(_ * 2.0))))
  }

  test("incremental dedup flags planted exact and near duplicates of the corpus, skips fresh docs") {
    // corpus = doc_id % 5 != 0 (ids 1,2,3); increment = % 5 == 0 (ids 5,10,15):
    //   5 is byte-identical to corpus doc 1  → exact dup, no near screening
    //  10 is one word off corpus doc 2 (and two off doc 1) → near dup of BOTH
    //  15 is unrelated                        → clean
    val docs = Seq(
      (1L, base), (2L, base.replace("fox", "wolf")),
      (3L, "unrelated corpus filler about columnar storage formats and shuffle services"),
      (5L, base), (10L, base.replace("fox", "wolf").replace("lazy", "sleepy")),
      (15L, "a totally fresh increment document on watermarking and stateful streaming"))
      .toDF("doc_id", "text")
    val out = graft.ext.IncrementalDedup.incrementalProfile(docs, "inc_dedup_spec")
      .as[(Long, Boolean, Option[Long], Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(5L) === ((5L, true, Some(1L), 0L, None)), s"exact: ${out(5L)}")
    assert(out(10L) === ((10L, false, None, 2L, Some(1L))), s"near: ${out(10L)}")
    assert(out(15L) === ((15L, false, None, 0L, None)), s"fresh: ${out(15L)}")
  }

  test("q_ann_recall floors: IVF mean recall holds and multi-probe never trails plain LSH") {
    // the standing oracle row measures recall on UNIFORM RANDOM vectors —
    // the adversarial regime for LSH (true neighbors are barely closer than
    // strangers), so plain single-bucket LSH recall is legitimately near 0
    // there (planted-cluster recall above is where LSH earns its keep).
    // What must NOT regress silently: IVF with nprobe=2/8 keeps real recall,
    // and widening the probe set can only help.
    val rows = graft.ext.Similarity.qAnnRecall.impl(spark, sf)
      .select("method", "recall").as[(String, Double)].collect()
    assert(rows.length === 24, s"expected 3 methods x 8 queries, got ${rows.length}")
    assert(rows.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    def mean(m: String) = { val v = rows.collect { case (`m`, r) => r }; v.sum / v.length }
    assert(mean("ivf") >= 0.3, f"IVF mean recall ${mean("ivf")}%.2f < 0.3 floor")
    assert(mean("lsh_mp") >= mean("lsh"),
      f"multi-probe mean ${mean("lsh_mp")}%.2f below single-bucket ${mean("lsh")}%.2f")
  }

  test("q_ann_sq8 floor: int8-quantized search keeps near-exact recall") {
    // 4x compression should cost a few percent of retrieval quality, not
    // more — measured 0.99 mean recall@10 on this data; floor at 0.9 so a
    // broken encode/decode (wrong span, off-by-one code) fails loudly
    val rows = graft.ext.Similarity.qAnnSq8.impl(spark, sf)
      .select("recall").as[Double].collect()
    assert(rows.length === 8)
    val mean = rows.sum / rows.length
    assert(mean >= 0.9, f"SQ8 mean recall $mean%.3f < 0.9 floor")
  }

  test("repeatedExactSpans finds an offset-straddling repeat the stride form provably misses") {
    // Guaranteed-unique tokens: doc 2 is doc 1 shifted by 3 junk tokens, so
    // every copy of the shared 60-token span sits at offset ≡ 3 mod 10 —
    // no stride-10 window of one doc can ever equal one of the other.
    val a = (0 until 60).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, a), (2L, "x0 x1 x2 " + a)).toDF("doc_id", "text")
    val (w, st) = (20, 10)
    val wins = docs.withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("wins", expr(
        s"transform(sequence(0L, greatest((n - $w) DIV $st, 0L)), i -> array_join(slice(toks, CAST(i * $st + 1 AS INT), $w), ' '))"))
      .select(col("doc_id"), explode(col("wins")).as("win"))
    val strideHits = wins.groupBy("win").agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") >= 2).count()
    assert(strideHits === 0, "fixture must be invisible to the stride-window detector")
    // the stride-1 exact pass recovers the FULL shared span in both docs,
    // merged to one maximal run each (1-based inclusive token ranges)
    val spans = graft.ext.TextAnalysis.repeatedExactSpans(docs, minLen = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans === Set((1L, 1L, 60L, 60L), (2L, 4L, 63L, 60L)))
  }

  test("Misra-Gries heavy hitters: exact above capacity, guaranteed error bound below it") {
    // planted skew: five HEAVY tokens (500,450,400,350,300) over a 35-token
    // light tail (10 each) → N = 2350, distinct = 40. Shuffled
    // deterministically so heavy tokens spread across partitions (the merge
    // path must do the work, not one lucky reduce).
    val exact: Map[String, Long] =
      (1 to 5).map(i => f"t$i%02d" -> (550L - 50 * i)).toMap ++
        (6 to 40).map(i => f"t$i%02d" -> 10L).toMap
    val stream = new scala.util.Random(7)
      .shuffle(exact.toSeq.flatMap { case (t, c) => Seq.fill(c.toInt)(t) })
    val docs = stream.grouped(47).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(8)
    // capacity >= distinct: bit-exact top-k including tie order
    val full = graft.ext.HeavyHitters.topTokens(docs, capacity = 64, k = 5)
      .as[(String, Long)].collect()
    assert(full === (1 to 5).map(i => f"t$i%02d" -> (550L - 50 * i)).toArray)
    // capacity < distinct: eviction happens, yet every reported count is an
    // UNDERestimate within N/(capacity+1) and every token whose true count
    // exceeds the bound is guaranteed to survive
    val cap = 16
    val bound = 2350L / (cap + 1) // = 138
    val approx = graft.ext.HeavyHitters.topTokens(docs, capacity = cap, k = cap)
      .as[(String, Long)].collect().toMap
    assert((1 to 5).forall(i => approx.contains(f"t$i%02d")),
      s"tokens above the N/(cap+1) bound must survive eviction; got ${approx.keySet}")
    assert(approx.nonEmpty && approx.size <= cap)
    assert(approx.keySet.subsetOf(exact.keySet), "no phantom tokens")
    approx.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overestimated: $c > ${exact(t)}")
      assert(exact(t) - c <= bound, s"$t error ${exact(t) - c} exceeds N/(cap+1)=$bound")
    }
  }
}
