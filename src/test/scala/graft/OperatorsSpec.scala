package graft

import graft.operators.{Dedup, Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("forwardFill carries last non-null; fillFromPrevious only one row back") {
    // Reference subtlety (SURVEY §7.3): two consecutive blanks inherit
    // nothing from 3 rows back under the faithful lag semantics.
    val df = Seq((1, 1, Some("a")), (1, 2, None), (1, 3, None), (1, 4, Some("b")))
      .toDF("part", "ord", "v")
    val ff = Relational.forwardFill(df, $"v", Seq($"part"), Seq($"ord"), "f")
      .orderBy($"ord").select($"f").collect().map(r => Option(r.getString(0)))
    assert(ff.toSeq == Seq(Some("a"), Some("a"), Some("a"), Some("b")))
    val lf = Relational.fillFromPrevious(df, $"v", Seq($"part"), Seq($"ord"), "f")
      .orderBy($"ord").select($"f").collect().map(r => Option(r.getString(0)))
    assert(lf.toSeq == Seq(Some("a"), Some("a"), None, Some("b")))
  }

  test("firstPerKeyAgg (min_by over packed ord) ≡ firstPerKey window form") {
    val df = Seq(
      (1L, 2, 30L, 5L, 1.0), (1L, 1, 99L, 9L, 2.0), (1L, 1, 10L, 7L, 3.0),
      (2L, 3, 10L, 1L, 4.0), (2L, 3, 10L, 0L, 5.0))
      .toDF("k", "ln", "pk", "sk", "q")
    val win = Relational.firstPerKey(df, Seq($"k"), Seq($"ln", $"pk", $"sk"))
      .select($"k", $"pk", $"q")
    val packed = $"ln".cast("long") * lit(1L << 48) +
      $"pk" * lit(1L << 20) + $"sk"
    val agg = Relational.firstPerKeyAgg(df, Seq($"k"), packed, Seq($"pk", $"q"))
    // names must survive the per-column min_by spelling (the q11 oracle
    // compares column names)
    assert(agg.columns.toSeq == Seq("k", "pk", "q"), agg.columns.toSeq)
    assert(win.orderBy($"k").collect().toSeq ==
      agg.orderBy($"k").collect().toSeq)
  }

  test("withGlobalRank ≡ global row_number window; partitioning-proof") {
    import org.apache.spark.sql.expressions.Window
    val df = Engine.table(spark, sf(), "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_custkey")
    val spec = df.withColumn("__rank",
      row_number().over(Window.orderBy($"o_totalprice".desc, $"o_orderkey"))
        .cast("long"))
    val twoPass = Relational.withGlobalRank(df,
      Seq($"o_totalprice".desc, $"o_orderkey"), "__rank")
    assert(spec.exceptAll(twoPass).isEmpty && twoPass.exceptAll(spec).isEmpty)
    // rank must not depend on the incoming partitioning
    val shuffled = Relational.withGlobalRank(df.repartition(7, $"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), "__rank")
    assert(shuffled.exceptAll(spec).isEmpty && spec.exceptAll(shuffled).isEmpty)
  }

  test("edge cases: empty rank input, k>corpus kmeans, same-label negatives") {
    import graft.operators.{Curation, Relational => R}
    // withGlobalRank on an empty frame: empty out, zero total, no throw
    val empty = spark.range(0).toDF("id").filter($"id" > 0)
    val (rankedE, nE) = R.withGlobalRankN(empty, Seq($"id"), "r")
    assert(rankedE.isEmpty && nE == 0L)
    // kmeans with k larger than the corpus: every vector seeds a
    // centroid, training still terminates with unit-norm centroids
    val tiny = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(tiny, "embedding", "vec_id", k = 5, iters = 1)
    assert(cents.count() == 2)
    // hardNegatives when every neighbor shares the query's label: empty
    val same = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardNegatives(same, "embedding", "vec_id", "label",
      queryPred = $"vec_id" === 1, k = 2, nPlanes = 2, dims = 2).isEmpty)
    // dsirWeights with an empty target slice: weights finite, no throw
    val noTarget = Seq((1L, false, "a b c"), (2L, false, "d e f"))
      .toDF("id", "t", "text")
    val w = Curation.dsirWeights(noTarget, $"text", $"id", $"t", buckets = 16)
      .select($"dsir_weight").as[Double].collect()
    assert(w.length == 2 && w.forall(java.lang.Double.isFinite))
  }

  test("ntileFromRank ≡ ntile window, including the n % k remainder fill") {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(5, 10, 23, 100)) {
      val df = spark.range(1, n + 1).toDF("r")
      val spec = df.select($"r",
        ntile(10).over(Window.orderBy($"r")).as("b")).as[(Long, Int)]
        .collect().toMap
      val formula = df.select($"r",
        Relational.ntileFromRank($"r", n.toLong, 10).cast("int").as("b"))
        .as[(Long, Int)].collect().toMap
      assert(formula == spec, s"n=$n")
    }
  }

  test("fused stopword scores ≡ composed langId/qualityScore") {
    val d = Engine.table(spark, sf(), "documents").limit(300)
    val cmp = d.select(
      TextAnalysis.langId($"text").as("f_lang"),
      TextAnalysis.langIdComposed($"text").as("c_lang"),
      TextAnalysis.qualityScore($"text").as("f_q"),
      TextAnalysis.qualityScoreComposed($"text").as("c_q"))
    assert(cmp.filter($"f_lang" =!= $"c_lang" ||
      $"f_q" =!= $"c_q").count() == 0)
  }

  test("kmeans: objective non-decreasing, deterministic, unit centroids") {
    val emb = Engine.table(spark, sf(), "embeddings")
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(
          emb.select($"vec_id".as("vid"),
            Similarity.asDouble($"embedding").as("v")), cents, "v", "vid")
        .join(cents.withColumnRenamed("centroid_id", "cluster_id"), "cluster_id")
        .agg(sum(Similarity.cosine($"v", $"cv"))).head().getDouble(0)
    val o1 = objective(Similarity.kmeans(emb, "embedding", "vec_id", k = 8, iters = 1))
    val o3 = objective(Similarity.kmeans(emb, "embedding", "vec_id", k = 8, iters = 3))
    assert(o3 >= o1 - 1e-9, s"objective decreased: $o1 -> $o3")
    val c = Similarity.kmeans(emb, "embedding", "vec_id", k = 8, iters = 2)
    // unit-norm centroids, stable across recomputation
    val norms = c.select(Similarity.norm($"cv").as("n")).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
    val again = Similarity.kmeans(emb, "embedding", "vec_id", k = 8, iters = 2)
    assert(c.select("centroid_id").except(again.select("centroid_id")).isEmpty)
    assert(c.count() == 8)
    // partitioning invariance: exact integer dimension sums make the
    // trained centroids bit-identical at any input partitioning
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select($"centroid_id", $"cv").as[(Long, Seq[Double])]
        .collect().sortBy(_._1).toSeq
    assert(flat(Similarity.kmeans(emb.repartition(13), "embedding", "vec_id",
        k = 8, iters = 2)) ==
      flat(Similarity.kmeans(emb.coalesce(1), "embedding", "vec_id",
        k = 8, iters = 2)))
  }

  test("dupClusters: transitive components, min-id representative") {
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L), (11L, 10L), (11L, 12L),
      (12L, 13L)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    // 1-2-3 one cluster, 5-6 one, 10-11-12-13 one (13 reaches 10 only
    // transitively through 12 and 11)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("dupClustersAlternating ≡ dupClusters, incl. adversarial chains") {
    // the same fixture as the propagation test...
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L), (11L, 10L), (11L, 12L),
      (12L, 13L)).toDF("id_a", "id_b")
    val got = Dedup.dupClustersAlternating(pairs).as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
    // ...plus the shape star contraction exists for: one 60-node CHAIN
    // (diameter 59 — propagation at maxIters=50 would NOT converge) and
    // a second component interleaved id-wise so reps aren't positional.
    // log-round contraction must still finish well within 50 rounds and
    // agree with propagation given enough rounds.
    val chain = (0 until 59).map(i => (2L * i, 2L * (i + 1))) ++
      Seq((1L, 3L), (3L, 5L))
    val cdf = chain.toDF("id_a", "id_b")
    val alt = Dedup.dupClustersAlternating(cdf).as[(Long, Long)]
      .collect().toMap
    val prop = Dedup.dupClusters(cdf, maxIters = 70).as[(Long, Long)]
      .collect().toMap
    assert(alt == prop)
    assert(alt.values.toSet == Set(0L, 1L))
    assert(alt.count(_._2 == 0L) == 60 && alt.count(_._2 == 1L) == 3)
    // the hybrid union-find finish must be invisible: pure star rounds
    // (localFinishEdges = 0) and the immediate local path (threshold
    // above the edge count) agree on the adversarial chain
    val pure = Dedup.dupClustersAlternating(cdf, localFinishEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(pure == alt, "local union-find finish diverged from star rounds")
    // mid-loop crossing: start above the threshold (62 edges > 30), let
    // star rounds shrink the graph, finish locally on the contracted set
    val mid = Dedup.dupClustersAlternating(cdf, localFinishEdges = 30L)
      .as[(Long, Long)].collect().toMap
    assert(mid == alt, "mid-loop local finish diverged")
  }

  test("semDedup: drop rule matches brute force; partitioning-proof") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.filter($"vec_id" % 7 === 0)
      .select($"vec_id".as("centroid_id"),
        Similarity.asDouble($"embedding").as("cv"))
    val tau = 0.3
    val out = Similarity.semDedup(emb, cents, "embedding", "vec_id", tau)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.length == emb.count())
    // brute-force replay of the keep rule on the collected assignment
    val byCluster = out.groupBy(_._2)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vecs = emb.select($"vec_id", Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().toMap.map { case (k, v) =>
        k -> v.toArray }
    for ((_, members) <- byCluster; m <- members) {
      val higherPriority = members.filter(o => o._1 != m._1 &&
        (o._3 < m._3 || (o._3 == m._3 && o._1 < m._1)))
      val expectDropped = higherPriority.exists(o =>
        BigDecimal(cos(vecs(o._1), vecs(m._1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= tau)
      assert(m._4 == !expectDropped,
        s"vec ${m._1}: kept=${m._4}, brute-force says dropped=$expectDropped")
    }
    assert(out.exists(!_._4), "fixture should produce at least one drop")
    // partitioning invariance
    val out13 = Similarity.semDedup(emb.repartition(13), cents,
      "embedding", "vec_id", tau).as[(Long, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(out13.sameElements(out.sortBy(_._1)))
  }

  test("kCenterCoreset: brute-force replay, non-increasing radii, " +
      "partitioning-proof") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = 6
    val got = Similarity.kCenterCoreset(emb, "embedding", "vec_id", m)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length == m && got.map(_._2).distinct.length == m)
    // greedy farthest-point radii never increase after the seed row
    val dists = got.drop(1).map(_._3)
    assert(dists.zip(dists.drop(1)).forall { case (a, b) => a >= b })
    // brute-force replay of the traversal on collected vectors
    val vecs = emb.select($"vec_id", Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (k, v) => k -> v.toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    var sel = Vector(vecs.head._1)
    var expect = Vector((1L, vecs.head._1, 0L))
    while (sel.length < m) {
      val cand = vecs.filterNot(kv => sel.contains(kv._1)).map { case (k, v) =>
        (k, sel.map(s => BigDecimal((1.0 -
          cos(vecs.find(_._1 == s).get._2, v)) * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).min)
      }
      val best = cand.maxBy { case (k, dq) => (dq, -k) }
      sel :+= best._1
      expect :+= ((sel.length.toLong, best._1, best._2))
    }
    assert(got.map(g => (g._1, g._2, math.rint(g._3 * 1e9).toLong))
      .toVector == expect)
    // partitioning invariance
    val got13 = Similarity.kCenterCoreset(emb.repartition(13),
      "embedding", "vec_id", m).as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(got13.sameElements(got))
  }

  test("CovMoments: partition-proof integer moments ≡ independent replay") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dims = 64
    val cm = graft.operators.CovMoments(dims)
    def state(df: org.apache.spark.sql.DataFrame) =
      df.select(Similarity.asDouble($"embedding").as("v"))
        .agg(cm($"v").as("st")).head.getSeq[Long](0)
    val st = state(emb)
    assert(st.length == 1 + dims + dims * (dims + 1) / 2)
    // bit-identical at any partitioning (integer sums are associative)
    assert(state(emb.repartition(13)) == st)
    // independent replay with BigDecimal away-from-zero quantization —
    // also proves the operator's branch-form C-round has no FP artifact
    val vecs = emb.select(Similarity.asDouble($"embedding"))
      .as[Seq[Double]].collect()
    def bq(x: Double): Long = BigDecimal(x * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = Array.fill(1 + dims + dims * (dims + 1) / 2)(0L)
    for (v <- vecs) {
      expect(0) += 1
      for (i <- 0 until dims) {
        expect(1 + i) += bq(v(i))
        for (j <- i until dims)
          expect(1 + dims + cm.offset(i, j)) += bq(v(i) * v(j))
      }
    }
    assert(st == expect.toSeq)
  }

  test("dedupGate drops exact matches only (database_utils.py:128-145)") {
    val existing = Seq((1L, 2L, 10.0), (2L, 3L, 20.0)).toDF("pk", "sk", "q")
    val incoming = Seq((1L, 2L, 10.0), (1L, 2L, 11.0), (9L, 9L, 9.0))
      .toDF("pk", "sk", "q")
    val out = Relational.dedupGate(incoming, existing, Seq("pk", "sk", "q"))
    assert(out.count() == 2)
  }

  test("dimUpsert assigns fresh ids above max existing") {
    val existing = Seq(("a", 10L), ("b", 11L)).toDF("k", "id")
    val incoming = Seq("b", "c", "d", "c").toDF("k")
    val dim = Relational.dimUpsert(existing, incoming, "k", "id")
      .orderBy("id").as[(String, Long)].collect()
    assert(dim.toSeq == Seq(("a", 10L), ("b", 11L), ("c", 12L), ("d", 13L)))
  }

  test("shingles: distinct word 3-grams; short docs degrade gracefully") {
    val r = Seq("a b c d", "x y", "").toDF("t")
      .select(Dedup.shingles($"t").as("s")).collect()
    assert(r(0).getSeq[String](0).toSet == Set("a b c", "b c d"))
    assert(r(1).getSeq[String](0) == Seq("x y"))
    assert(r(2).getSeq[String](0) == Seq(""))
  }

  test("minHashLshPairs finds identical docs, symmetric and deduped") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "the quick brown fox jumps over the lazy dog end"),
      (3L, "completely different words entirely here nothing shared at all ok"))
      .toDF("id", "t")
    val pairs = Dedup.minHashLshPairs(docs, $"t", $"id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("lshTuningAudit: identical docs are recalled at every band config") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "the quick brown fox jumps over the lazy dog end"),
      (3L, "completely different words entirely here nothing shared at all ok"),
      (4L, "another disjoint document with its own private vocabulary set"))
      .toDF("id", "t")
    val out = Dedup.lshTuningAudit(docs, $"t", $"id",
        k = 16, bandsList = Seq(2, 4, 8), w = 3, tau = 0.9)
      .orderBy($"bands").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_truth") == 1L)       // only the identical pair
      assert(r.getAs[Long]("n_true_pos") == 1L)    // s=1 collides in any band
      assert(r.getAs[Double]("recall") == 1.0)
      assert(r.getAs[Long]("n_candidates") >= 1L)
    }
    intercept[IllegalArgumentException] {
      Dedup.lshTuningAudit(docs, $"t", $"id", k = 16, bandsList = Seq(3))
    }
  }

  test("fused HashingVec ≡ the composed aggregate-fold form") {
    val d = Engine.table(spark, sf(), "documents").limit(300)
      .select(col("doc_id"), col("text"))
    val edge = Seq((9001L, ""), (9002L, "one"), (9003L, "a a  b"),
      (9004L, "trailing space ")).toDF("doc_id", "text")
    Seq(d, edge).foreach { df =>
      val cmp = df.select(
        TextAnalysis.hashingVector(col("text"), 16).as("f"),
        TextAnalysis.hashingVectorComposed(col("text"), 16).as("c"))
      assert(cmp.filter(col("f") =!= col("c")).count() == 0)
    }
  }

  test("MinHashUnion: union signature = signature of pooled text; partition-proof") {
    val docs = Seq(
      (1L, "g1", "the quick brown fox jumps over the lazy dog end"),
      (2L, "g1", "pack my box with five dozen liquor jugs today yes"),
      (3L, "g1", "the quick brown fox jumps over the lazy dog end"),
      (4L, "g2", "completely different words entirely here nothing shared at all ok"))
      .toDF("id", "g", "t")
    val k = 16
    val sigArr = array((0 until k).map(i => col(s"sig$i")): _*)
    def unioned(df: org.apache.spark.sql.DataFrame) =
      Dedup.minHashSignatures(df, $"t", $"g", k = k)
        .groupBy($"__id").agg(graft.operators.MinHashUnion(sigArr).as("u"))
        .orderBy($"__id").as[(String, Seq[Long])].collect().toSeq
    // defining law: the aggregated union signature equals the
    // element-wise min of the member docs' signatures, computed
    // independently in Scala
    val perDoc = Dedup.minHashSignatures(docs, $"t", struct($"g", $"id"), k = k)
      .select($"__id.g".as("g"), sigArr.as("s"))
      .as[(String, Seq[Long])].collect()
    val expected = perDoc.groupBy(_._1).view.mapValues(
      _.map(_._2).reduce((a, b) => a.zip(b).map(p => math.min(p._1, p._2))))
      .toMap
    val got = unioned(docs).toMap
    assert(got == expected)
    // partitioning invariance: 1-partition and 7-partition runs agree
    assert(unioned(docs.repartition(7)) == unioned(docs.coalesce(1)))
  }

  test("incrementalLshSurvivors: gate ≡ pair-derived verdicts, idempotent") {
    val dup = "the quick brown fox jumps over the lazy dog end"
    val docs = Seq(
      (0L, dup), (4L, "history only words that nobody else repeats anywhere at all"),
      (1L, dup), // collides with history 0 → dropped
      (2L, "completely different words entirely here nothing shared at all ok"),
      (3L, "pack my box with five dozen liquor jugs today yes"))
      .toDF("id", "t")
    val history = docs.filter($"id" % 4 === 0)
    val incoming = docs.filter($"id" % 4 =!= 0)
    val survivors = Dedup.incrementalLshSurvivors(incoming, history, $"t", $"id")
      .as[Long].collect().toSet
    assert(survivors == Set(2L, 3L))
    // equivalence law: a doc survives iff the all-docs LSH pair list has
    // no (incoming, history) edge touching it
    val pairs = Dedup.minHashLshPairs(docs, $"t", $"id").as[(Long, Long)]
      .collect()
    val histIds = Set(0L, 4L)
    val collidedByPairs = pairs.collect {
      case (a, b) if histIds(a) && !histIds(b) => b
      case (a, b) if histIds(b) && !histIds(a) => a
    }.toSet
    assert(survivors == Set(1L, 2L, 3L) -- collidedByPairs)
    // idempotency: gating the survivors again changes nothing
    val again = Dedup.incrementalLshSurvivors(
        incoming.join(survivors.toSeq.toDF("id"), "id"), history, $"t", $"id")
      .as[Long].collect().toSet
    assert(again == survivors)
  }

  test("simHash: identical docs → identical hash; bits in range") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("id", "t")
    val hs = Dedup.simHash(docs, $"t", $"id").orderBy("__id")
      .as[(Long, Long)].collect()
    assert(hs(0)._2 == hs(1)._2)
    assert(hs.forall { case (_, h) => h >= 0 && h < (1L << 32) })
  }

  test("fused SimHashBits ≡ the composed explode-and-vote form") {
    val d = Engine.table(spark, sf(), "documents").limit(300)
      .select(col("doc_id"), col("text"))
    val edge = Seq((9001L, ""), (9002L, "one"), (9003L, "dup dup dup"),
      (9004L, "trailing space ")).toDF("doc_id", "text")
    Seq(d, edge).foreach { df =>
      val f = Dedup.simHash(df, $"text", $"doc_id")
        .withColumnRenamed("simhash", "f")
      val c = Dedup.simHashComposed(df, $"text", $"doc_id")
        .withColumnRenamed("simhash", "c")
      assert(f.join(c, "__id").filter($"f" =!= $"c").count() == 0)
    }
  }

  test("pqEncode recovers the centroid a vector sits on, per subspace") {
    // Build one 64-dim vector whose j-th block IS centroid k=j+3 of
    // subspace j; the argmax must pick the first centroid with that
    // exact sign pattern (ties only on identical patterns).
    val emb = (0 until 8).flatMap { j =>
      (1 to 8).map(d => Similarity.pqSign(j, j + 3, d).toFloat)
    }.toArray
    val expected = (0 until 8).map { j =>
      val want = (1 to 8).map(Similarity.pqSign(j, j + 3, _))
      (0 to 15).indexWhere(k => (1 to 8).map(Similarity.pqSign(j, k, _)) == want)
    }
    val code = Similarity.pqEncode(
      Seq((0L, emb)).toDF("vec_id", "embedding"), "embedding", "vec_id")
      .select($"pq_code").as[Long].head()
    val decoded = (0 until 8).map(j => ((code >> (4 * j)) & 0xF).toInt)
    assert(decoded == expected)
  }

  test("pqTopK surfaces an identical vector as the top candidate") {
    // An exact duplicate shares all 8 subspace codes → always a
    // candidate at any minMatch, and cosine 1.0 ranks it first.
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val vecs = Seq(
      (0L, base), (1L, base.clone()),
      (2L, Array.fill(64)(rnd.nextFloat() * 2 - 1)),
      (3L, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(vecs, vecs.filter($"vec_id" === 0),
      "embedding", "vec_id", k = 3, minMatch = 2)
      .orderBy("rank").as[(Long, Long, Long, Int, Double)].collect()
    assert(top.head._2 == 1L && top.head._3 == 8L && top.head._5 == 1.0)
  }

  test("hardNegatives: only other-label neighbors, identical vector ranks first") {
    // 4 vectors in one LSH bucket-ish space: query 1 (label 0), an exact
    // copy with label 1 (the hardest negative), a same-label near copy
    // (must be excluded), and an orthogonal other-label vector
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1), // same direction, other label
      (3L, Seq(1.0f, 0.01f, 0.0f, 0.0f), 0), // same label — excluded
      (4L, Seq(0.9f, 0.1f, 0.2f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs, "embedding", "vec_id", "label",
        queryPred = col("vec_id") === 1, k = 2, nPlanes = 2, dims = 4)
      .orderBy($"rank")
      .select($"neighbor_id", $"neg_label", $"rank")
      .as[(Long, Int, Int)].collect().toSeq
    assert(out.forall(_._2 != 0), s"same-label neighbor leaked: $out")
    assert(out.head == ((2L, 1, 1)), s"exact copy must rank first: $out")
    assert(out.map(_._1).toSet.subsetOf(Set(2L, 4L)))
  }

  test("similaritySelfJoin prefix filter ≡ brute-force Jaccard join") {
    val d = Engine.table(spark, sf(), "documents").limit(150)
    for (tau <- Seq(0.25, 0.5, 0.8)) {
      val pruned = Relational.similaritySelfJoin(d, $"text", $"doc_id", tau)
      // independent brute force: all pairs, no prefix
      val sets = d.select($"doc_id".as("id"),
        array_distinct(split(lower($"text"), " ")).as("w"))
      val brute = sets.alias("a")
        .join(sets.alias("b"), col("a.id") < col("b.id"))
        .withColumn("s", size(array_intersect(col("a.w"), col("b.w"))))
        .withColumn("u", size(array_union(col("a.w"), col("b.w"))))
        .filter($"s".cast("double") / $"u" >= tau)
        .select(col("a.id").as("key_a"), col("b.id").as("key_b"),
          $"s".cast("long").as("n_shared"),
          round($"s".cast("double") / $"u", 6).as("jaccard"))
      assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty,
        s"tau=$tau")
    }
  }

  test("cosineTopK ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs,
      vecs.filter($"vec_id" === 0), "embedding", "vec_id", k = 2)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    assert(top(0)._2 == 1L && top(0)._4 == 1.0)
    assert(top(1)._2 == 3L)
  }

  test("ivfTopK finds the identical vector when its list is probed") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.1f))).toDF("vec_id", "embedding")
    val centroids = vecs.filter($"vec_id".isin(0L, 2L))
      .select($"vec_id".as("centroid_id"),
        Similarity.asDouble($"embedding").as("cv"))
    val top = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0),
      "embedding", "vec_id", k = 2, centroids = centroids, nprobe = 1)
      .orderBy("rank").as[(Long, Long, Long, Int, Double)].collect()
    // nprobe=1 → only cluster 0's list (vectors 0,1) is searched
    assert(top.map(_._3).toSeq == Seq(1L))
    assert(top.head._5 == 1.0)
    val top2 = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0),
      "embedding", "vec_id", k = 3, centroids = centroids, nprobe = 2)
      .as[(Long, Long, Long, Int, Double)].collect()
    assert(top2.length == 3) // probing both lists reaches the whole corpus
  }

  test("approx_count_distinct lands within its error bound (q47)") {
    val li = Engine.table(spark, sf(), "lineitem")
    val got = li.agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a"),
      countDistinct(col("l_partkey")).as("e")).head()
    val (a, e) = (got.getLong(0).toDouble, got.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
  }

  test("percentile_approx lands near exact percentiles (q81)") {
    val li = Engine.table(spark, sf(), "lineitem")
    val got = li.agg(
      expr("percentile_approx(l_extendedprice, 0.5D, 1000)").as("a"),
      expr("percentile(l_extendedprice, 0.5D)").as("e")).head()
    val (a, e) = (got.getDouble(0), got.getDouble(1))
    // GK sketch with accuracy 1000 bounds rank error at ~1/1000; translate
    // to a loose value tolerance on this distribution
    assert(math.abs(a - e) / e < 0.05, s"approx median $a vs exact $e")
  }

  test("rangeJoin equals the naive inequality join") {
    val pts = Seq((1L, 3L), (2L, 10L), (3L, 22L)).toDF("pid", "x")
    val ivs = Seq((10L, 0L, 5L), (20L, 8L, 25L), (30L, 11L, 12L))
      .toDF("iid", "s", "e")
    val naive = pts.join(ivs, col("x") >= col("s") && col("x") <= col("e"))
    val bucketed = graft.operators.Relational
      .rangeJoin(pts, ivs, "x", "s", "e", binSize = 4)
      .select(naive.columns.map(col): _*)
    assert(naive.exceptAll(bucketed).isEmpty && bucketed.exceptAll(naive).isEmpty)
  }

  test("asOfJoin: latest right row at-or-before each left row per key") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "ts", "v")
    val out = Relational.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Map("v" -> "last_v"))
      .orderBy("k", "ts").select("name", "last_v").collect()
      .map(r => (r.getString(0), Option(r.get(1))))
    // p1 at ts=10 sees the equal-ts right row (<= semantics); p2 sees the
    // ts=15 row; p3 at ts=5 precedes every right row → null
    assert(out.toSeq == Seq(("p1", Some(100.0)), ("p2", Some(150.0)),
      ("p3", None)))
  }

  test("asOfJoin forward: earliest right row at-or-after each left row") {
    val left = Seq((1L, 10L, "c1"), (1L, 20L, "c2"), (2L, 5L, "c3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 25L, 250.0), (2L, 1L, 10.0))
      .toDF("k", "ts", "v")
    val out = Relational.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Map("v" -> "next_v"), direction = "forward")
      .orderBy("k", "ts").select("name", "next_v").collect()
      .map(r => (r.getString(0), Option(r.get(1))))
    // c1 at ts=10 sees the equal-ts right row (>= semantics); c2 sees the
    // ts=25 row; c3 at ts=5 follows every right row → null
    assert(out.toSeq == Seq(("c1", Some(100.0)), ("c2", Some(250.0)),
      ("c3", None)))
  }

  test("liveness probe: distinct-first, quarantined, deterministic stub") {
    val urls = Seq("https://a.com/x", "https://a.com/x", "ftp://nope", "bad url")
      .toDF("provider_url")
    val live = graft.operators.Liveness.probeUrls(spark, urls, "provider_url",
      maxPerSecond = 1000)
    val rows = live.as[(String, Boolean)].collect().toMap
    assert(rows.size == 3) // deduped before probing
    assert(rows("https://a.com/x") && !rows("ftp://nope") && !rows("bad url"))
  }

  test("liveness HttpProbe executes the REAL transport against loopback") {
    // the reference's probe semantics (HEAD, browser UA, redirects
    // followed, alive ⇔ terminal 200) exercised LIVE against a JDK
    // HttpServer on 127.0.0.1 — zero egress, real sockets end to end
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(f: HttpExchange => Unit): HttpHandler = { (ex: HttpExchange) =>
      seen.add((ex.getRequestURI.getPath, ex.getRequestMethod,
        ex.getRequestHeaders.getFirst("User-Agent")))
      f(ex); ex.close()
    }
    val port = server.getAddress.getPort
    server.createContext("/ok", handler(_.sendResponseHeaders(200, -1)))
    server.createContext("/moved", handler { ex =>
      ex.getResponseHeaders.set("Location", s"http://127.0.0.1:$port/ok")
      ex.sendResponseHeaders(301, -1)
    })
    server.createContext("/gone", handler(_.sendResponseHeaders(404, -1)))
    server.start()
    // a port that is certainly closed: bind one, read it, release it
    val closed = { val s = new java.net.ServerSocket(0)
      val p = s.getLocalPort; s.close(); p }
    try {
      val urls = Seq(s"http://127.0.0.1:$port/ok", s"http://127.0.0.1:$port/moved",
        s"http://127.0.0.1:$port/gone", s"http://127.0.0.1:$closed/dead")
        .toDF("url")
      val live = graft.operators.Liveness
        .probeUrls(spark, urls, "url", probe = graft.operators.Liveness.HttpProbe,
          maxPerSecond = 1000)
        .as[(String, Boolean)].collect().toMap
      assert(live(s"http://127.0.0.1:$port/ok"), "200 → alive")
      assert(live(s"http://127.0.0.1:$port/moved"), "301 → 200 via redirect → alive")
      assert(!live(s"http://127.0.0.1:$port/gone"), "404 → dead")
      assert(!live(s"http://127.0.0.1:$closed/dead"), "refused connection → dead")
      // the wire requests really were HEAD with a browser UA
      assert(seen.size >= 4) // /ok (direct) + /moved + redirect-to-/ok + /gone
      seen.forEach { case (_, method, ua) =>
        assert(method == "HEAD" && ua != null && ua.startsWith("Mozilla/"))
      }
    } finally server.stop(0)
  }

  test("fused MinHashSigs ≡ the composed array-expression signatures") {
    val d = Engine.table(spark, sf(), "documents")
    // w=3 → fused native path; w=3 via the composed branch is forced by
    // building the expressions directly
    val fused = Dedup.minHashSignatures(d, col("text"), col("doc_id"))
    val hashed = transform(Dedup.shingles(col("text"), 3),
      sh => struct(graft.functions.hash60(sh).as("h1"),
        graft.functions.hash56b(sh).as("h2")))
    val composed = d.select(col("doc_id").as("__id"), hashed.as("__hp"))
      .select(col("__id") +: (0 until 16).map(s =>
        array_min(transform(col("__hp"),
          p => p.getField("h1") + lit(s.toLong) * p.getField("h2"))).as(s"sig$s")): _*)
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty)
    // edge docs
    val edge = Seq("", "one", "a b", "x y z", "a  b", " lead").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val f2 = Dedup.minHashSignatures(edge, col("text"), col("doc_id"))
    val c2 = edge.select(col("doc_id").as("__id"), hashed.as("__hp"))
      .select(col("__id") +: (0 until 16).map(s =>
        array_min(transform(col("__hp"),
          p => p.getField("h1") + lit(s.toLong) * p.getField("h2"))).as(s"sig$s")): _*)
    assert(f2.exceptAll(c2).isEmpty && c2.exceptAll(f2).isEmpty)
  }

  test("fused LshBucket ≡ the composed plane-sign chain, bit for bit") {
    val e = Engine.table(spark, sf(), "embeddings")
    val signs = Similarity.planeSigns(8, 64)
    val v = e.select(Similarity.asDouble($"embedding").as("v"))
    val diff = v.select(Similarity.lshBucket($"v", signs).as("f"),
      Similarity.lshBucketComposed($"v", signs).as("c"))
      .filter($"f" =!= $"c")
    assert(diff.count() == 0)
  }

  test("fused CosineSim ≡ the composed dot/norm chain, bit for bit") {
    val e = Engine.table(spark, sf(), "embeddings")
    val v = e.select(Similarity.asDouble($"embedding").as("v"),
      $"vec_id".cast("long").as("id"))
    val pairs = v.as("a").join(v.as("b"),
      col("a.id") =!= col("b.id") && col("a.id") % 17 === 0 && col("b.id") % 13 === 0)
    val diff = pairs.select(
      Similarity.cosine(col("a.v"), col("b.v")).as("f"),
      Similarity.cosineComposed(col("a.v"), col("b.v")).as("c"))
      .filter(!(col("f") <=> col("c")))
    assert(diff.count() == 0)
  }

  test("native Hash60/Hash56 ≡ the composed md5 chain, bit for bit") {
    // the native codegen'd expressions must reproduce the conv(substring(
    // md5…)) values exactly — every oracle depends on this contract
    val docs = Engine.table(spark, sf(), "documents").select($"text")
      .withColumn("n", graft.functions.hash60($"text"))
      .withColumn("c", graft.functions.hash60Composed($"text"))
      .withColumn("n2", graft.functions.hash56b($"text"))
      .withColumn("c2", graft.functions.hash56bComposed($"text"))
    assert(docs.filter($"n" =!= $"c" || $"n2" =!= $"c2").count() == 0)
    // and edge inputs: empty string, unicode, nulls
    val edge = Seq(Some(""), Some("ñandú 😀"), None).toDF("s")
      .withColumn("n", graft.functions.hash60($"s"))
      .withColumn("c", graft.functions.hash60Composed($"s"))
    assert(edge.filter(!($"n" <=> $"c")).count() == 0)
  }

  test("hash60/hash56 are SQL-callable after registration") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT hash60('abc') AS a, hash56('abc') AS b").head()
    // md5('abc') = 900150983cd24fb0 d6963f7d28e17f72
    assert(r.getLong(0) == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(r.getLong(1) == java.lang.Long.parseLong("0d6963f7d28e17", 16))
  }

  test("excel_serial_date converts 1900-system serials") {
    val d = Seq(45369, 1, 60).toDF("s")
      .select(graft.functions.excel_serial_date($"s").cast("string"))
      .as[String].collect()
    // 60 would be the fictitious 1900-02-29; the 1899-12-30 epoch absorbs it
    assert(d.toSeq == Seq("2024-03-18", "1899-12-31", "1900-02-28"))
  }

  test("lshBucket groups identical vectors; langId/quality deterministic") {
    val signs = Similarity.planeSigns(4, 3)
    val vecs = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val b = vecs.select(Similarity.lshBucket(
      Similarity.asDouble($"embedding"), signs).as("b"))
      .as[Long].collect()
    assert(b(0) == b(1))

    val lang = Seq("the cat is on the mat", "el gato y la casa de que")
      .toDF("text").select(TextAnalysis.langId($"text")).as[String].collect()
    assert(lang.toSeq == Seq("en", "es"))
  }

  test("custom TopKPerKey operator ≡ window row_number form") {
    val c = Engine.table(spark, sf(), "customer")
    val keys = Seq($"c_mktsegment")
    val ord = Seq($"c_acctbal".desc, $"c_custkey")
    val custom = Relational.topKPerKey(c, keys, ord, k = 3)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
      .orderBy($"c_mktsegment", $"c_acctbal".desc, $"c_custkey")
      .collect().toSeq
    val window = Relational.topKPerKeyComposed(c, keys, ord, k = 3)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
      .orderBy($"c_mktsegment", $"c_acctbal".desc, $"c_custkey")
      .collect().toSeq
    assert(custom.nonEmpty && custom == window)
    // physical plan runs the custom exec, not a Window + Sort
    val p = Relational.topKPerKey(c, keys, ord, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), s"window leaked into custom plan:\n$p")
    // k larger than every group passes everything through
    val all = Relational.topKPerKey(c, keys, ord, k = 100000).count()
    assert(all == c.count())
  }

  test("native PairPackExplode ≡ composed nested-transform pair chain") {
    import graft.queries.AnalyticsQueries
    // the composed chain is only defined on size ≥ 2 (sequence(1, size-1)
    // walks DOWN through index 0 for smaller arrays) — q89 filters there;
    // the generator is total, so pin the shared domain plus its edges
    val orders = Engine.table(spark, sf(), "lineitem")
      .groupBy($"l_orderkey")
      .agg(array_sort(array_distinct(collect_list($"l_partkey"))).as("parts"))
      .filter(size($"parts") >= 2)
    val fused = orders.select($"l_orderkey",
        AnalyticsQueries.pairPack($"parts").as("pack"))
      .orderBy($"l_orderkey", $"pack").collect().toSeq
    val composed = orders.select($"l_orderkey",
        AnalyticsQueries.pairPackComposed("parts").as("pack"))
      .orderBy($"l_orderkey", $"pack").collect().toSeq
    assert(fused.nonEmpty && fused == composed)
    val edges = Seq((1L, Seq(7L)), (2L, Seq.empty[Long]))
      .toDF("l_orderkey", "parts")
      .select(AnalyticsQueries.pairPack($"parts")).collect()
    assert(edges.isEmpty)
  }

  test("substringDupStats: cross-doc spans coalesce; within-doc repeats don't count") {
    import graft.operators.Dedup
    // docs 1/2 share "a b c" (w=3) at different positions; doc 3 repeats
    // its own window twice but shares nothing cross-doc; doc 4 is shorter
    // than w; doc 5 shares two DISJOINT windows with doc 1 -> 2 spans.
    val docs = Seq(
      (1L, "a b c x y z p q r"), // shares "a b c" w/ 2, "p q r" w/ 5
      (2L, "k a b c m"),
      (3L, "u v w u v w"), // within-doc repeat only
      (4L, "s t"), // shorter than w
      (5L, "p q r 0 1 2 3 a b c")).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(docs, $"text", $"doc_id", w = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      (1L, 9L, 6L, 2L), // [a b c] + [p q r]: 6 tokens, 2 spans
      (2L, 5L, 3L, 1L),
      (3L, 6L, 0L, 0L), // count(DISTINCT doc) == 1 -> not duplicated
      (4L, 2L, 0L, 0L),
      (5L, 10L, 6L, 2L)))
    // overlapping windows coalesce: "a b c d" shared whole -> windows at
    // pos 0 and 1 merge into ONE 4-token span
    val ov = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val g2 = Dedup.substringDupStats(ov, $"text", $"doc_id", w = 3)
      .orderBy($"doc_id").collect()
    assert(g2.forall(r => r.getLong(2) == 4L && r.getLong(3) == 1L))
  }

  test("htmlToText strips blocks before tags and double-decodes entities last") {
    import graft.operators.TextAnalysis
    val cases = Seq(
      // script body contains a bare '<' — block removal must precede
      // tag stripping or the remainder parses as a runaway tag
      "<p>a</p><script>if (1 < 2) x();</script><p>b</p>" -> "a b",
      "<style>.x { color: red }</style>hi<!-- gone -->there" -> "hi there",
      // MULTI-LINE blocks: real crawled HTML breaks script/style/comment
      // bodies across lines — (?s) lets the non-greedy dot cross them;
      // without it the body (and its bare '<') leaks into the text
      "<p>a</p><script>\nvar x = 1 < 2;\nf();\n</script><p>b</p>" -> "a b",
      "<style>\n.x {\n color: red\n}\n</style>hi<!--\n gone\n -->there" ->
        "hi there",
      // &amp;lt; is an ESCAPED '&lt;' and must survive as literal text
      "x &amp;lt; y &lt;z&gt; &quot;q&quot; &#39;s&#39; r&amp;d" ->
        "x &lt; y <z> \"q\" 's' r&d",
      "  <div> <span>spaced   out</span> </div> " -> "spaced out",
      // whitespace collapse covers tabs/CR/LF between words, not just
      // spaces (explicit class — Java and RE2 disagree on \s itself)
      "<p>a	b\r\nc</p>" -> "a b c")
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.htmlToText($"h")).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("native WindowHashExplode ≡ composed transform/slice window chain") {
    import graft.operators.Dedup
    import org.apache.spark.sql.graft.ColumnBridge
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .unionByName(Seq((9001L, "a b"), (9002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), allowMissingColumns = true)
    def native(w: Int) = docs.select($"doc_id",
      ColumnBridge.column(graft.expressions.WindowHashExplode(
        ColumnBridge.expression($"text".cast("string")), w))
        .as(Seq("pos", "gh")))
      .orderBy($"doc_id", $"pos").collect().toSeq
    def composed(w: Int) = Dedup
      .substringWindowsComposed(docs, $"text", $"doc_id", w)
      .select($"doc_id", $"pos", $"gh")
      .orderBy($"doc_id", $"pos").collect().toSeq
    Seq(1, 8).foreach { w =>
      val (n, c) = (native(w), composed(w))
      assert(n.nonEmpty && n == c, s"w=$w mismatch")
      // the null-text and sub-w docs emit no rows in either form
      assert(!n.exists(r => r.getLong(0) >= 9002L))
    }
  }

  test("BpeTrain.mergeRounds: greedy non-overlap, lexicographic ties, chained rounds") {
    import graft.operators.BpeTrain
    // "a a a" counts (a,a) twice but merges ONCE (greedy left-to-right);
    // tie between (a,a)x2... actually (a,a) has count 2, all others 1.
    val d1 = Seq("a a a", "b c").toDF("text")
    val r1 = BpeTrain.mergeRounds(d1, $"text", rounds = 1).collect()
    assert(r1.length == 1)
    val row = r1(0)
    assert((row.getString(1), row.getString(2), row.getLong(3)) == (("a", "a", 2L)))
    assert(row.getLong(4) == 4L) // "a@a a" (2 tokens) + "b c" (2)
    // lexicographic tie-break: (a,b) and (b,a) both count 1 -> (a,b) wins
    val d2 = Seq("a b", "b a").toDF("text")
    val r2 = BpeTrain.mergeRounds(d2, $"text", rounds = 1).collect()(0)
    assert((r2.getString(1), r2.getString(2)) == (("a", "b")))
    // rounds chain: round 2 can merge a round-1 product
    val d3 = Seq("x y z", "x y z", "x y w").toDF("text")
    val r3 = BpeTrain.mergeRounds(d3, $"text", rounds = 2).collect()
    assert((r3(0).getString(1), r3(0).getString(2), r3(0).getLong(3)) ==
      (("x", "y", 3L)))
    assert((r3(1).getString(1), r3(1).getString(2), r3(1).getLong(3)) ==
      (("x@y", "z", 2L)))
    assert(r3(1).getLong(4) == 4L) // "x@y@z","x@y@z","x@y w" -> 1+1+2
  }

  test("BpeTrain.mergeRounds: punctuation and replacement-special tokens train") {
    import graft.operators.BpeTrain
    // real text guarantees punctuated winners; \Q..\E quoting must take
    // them, and the REPLACEMENT escaping must survive Java's $/\ rules
    val d1 = Seq("hello, world.", "hello, world.", "hello, there").toDF("text")
    val r1 = BpeTrain.mergeRounds(d1, $"text", rounds = 1).collect()(0)
    assert((r1.getString(1), r1.getString(2), r1.getLong(3)) ==
      (("hello,", "world.", 2L)))
    assert(r1.getLong(4) == 4L) // "hello,@world." x2 (1 tok) + "hello, there" (2)
    // '$' and '\' are special in Java replacement strings; '(' and '*'
    // in unquoted patterns — all must ride through literally
    val d2 = Seq("a$ b\\", "a$ b\\", "(c *d"). toDF("text")
    val r2 = BpeTrain.mergeRounds(d2, $"text", rounds = 1).collect()(0)
    assert((r2.getString(1), r2.getString(2), r2.getLong(3)) ==
      (("a$", "b\\", 2L)))
    assert(r2.getLong(4) == 4L) // "a$@b\" x2 (1 tok) + "(c *d" (2)
    // the one residual domain edge: a token containing literal \E
    val boom = intercept[IllegalArgumentException] {
      BpeTrain.mergeRounds(Seq("x\\E y", "x\\E y").toDF("text"),
        $"text", rounds = 1)
    }
    assert(boom.getMessage.contains("\\E"))
  }

  test("BpeTrain.encodeCorpus: per-doc fertility matches hand-computed merges") {
    import graft.operators.BpeTrain
    // winner round 1 is (x,y) count 3 -> "x@y"; round 2 (x@y,z) count 2
    val d = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y w")).toDF("id", "text")
    val r = BpeTrain.encodeCorpus(d, $"text", $"id", rounds = 2)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 2L)))
    assert(r(0).getDouble(3) == 0.333333) // 1/3 rounded at 6 dp
    assert(r(2).getDouble(3) == 0.666667) // 2/3
  }

  test("Curation.removeBoilerplate: shared chunks drop, partial chunks kept, " +
      "all-boilerplate docs survive empty") {
    import graft.operators.Curation
    // 4-token chunks; "h1 h2 h3 h4" appears in all three docs (>= 3) so
    // it drops everywhere; doc 3 is ONLY that chunk -> empty survivor;
    // doc 1's trailing partial chunk ("t5") must be kept and counted
    val docs = Seq(
      (1L, "h1 h2 h3 h4 a1 a2 a3 a4 t5"),
      (2L, "h1 h2 h3 h4 b1 b2 b3 b4"),
      (3L, "h1 h2 h3 h4")).toDF("id", "text")
    val r = Curation.removeBoilerplate(docs, $"text", $"id",
        w = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getString(3))).toSeq == Seq(
      (1L, 3L, 2L, "a1 a2 a3 a4 t5"),
      (2L, 2L, 1L, "b1 b2 b3 b4"),
      (3L, 1L, 0L, "")))
    // minDocs boundary: the same chunk in only TWO docs survives
    val two = Seq((1L, "h1 h2 h3 h4"), (2L, "h1 h2 h3 h4")).toDF("id", "text")
    val r2 = Curation.removeBoilerplate(two, $"text", $"id",
      w = 4, minDocs = 3).orderBy("doc_id").collect()
    assert(r2.map(_.getLong(2)).toSeq == Seq(1L, 1L), "two copies must survive")
  }

  test("Curation.gopherRules: each rule gates independently") {
    import graft.operators.Curation
    val cases = Seq(
      // passes everything: 42 tokens (2 stopwords + 40 distinct words),
      // mean length (3+2+40*6)/42 ≈ 5.86, dup fraction 0
      ("ok", "the of " + (1 to 40).map(i => f"token$i%02d").mkString(" ")),
      // too short: fails r_words only
      ("short", "the of unique tokens here"),
      // ≥40 tokens but no stopwords: fails r_stop only
      ("nostop", (1 to 44).map(i => f"token$i%02d").mkString(" ")),
      // heavy repetition (3 distinct over 50 tokens): fails r_rep only
      ("rep", "the of " + (("dupe " * 48).trim)))
    val df = cases.toDF("name", "text")
    val byName = df.select($"name", Curation.gopherRules($"text").as("g"))
      .select($"name", $"g.r_words", $"g.r_mean_len", $"g.r_stop",
        $"g.r_rep", $"g.pass")
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(byName("ok") == ((true, true, true, true, true)))
    assert(byName("short") == ((false, true, true, true, false)))
    assert(byName("nostop") == ((true, true, false, true, false)))
    assert(byName("rep") == ((true, true, true, false, false)))
  }

  test("Batching.packSequences: capacity, NFD walk, partition-invariance") {
    import graft.operators.Batching
    val C = 100L
    val rnd = new scala.util.Random(7)
    val docs = (1L to 500L).map(i => (i, 1L + rnd.nextInt(140).toLong))
    val df = docs.toDF("doc_id", "n_tok")
    val packed = Batching.packSequences(df, $"doc_id", $"n_tok", C, 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // every doc survives exactly once, counted at most at C
    assert(packed.length == docs.length)
    assert(packed.map(_._3).toSet == docs.map(_._1).toSet)
    packed.foreach { case (_, _, d, n) =>
      assert(n == math.min(docs(d.toInt - 1)._2, C)) }
    // capacity: no bin overfills
    packed.groupBy(p => (p._1, p._2)).foreach { case (bin, rows) =>
      assert(rows.map(_._4).sum <= C, s"bin $bin overfilled") }
    // reference replay: same bucket order, same next-fit walk
    val want = packed.groupBy(_._1).toSeq.flatMap { case (bucket, rows) =>
      val ordered = rows.map(r => (r._3, r._4))
        .sortBy { case (d, n) => (-n, d) }
      var bin = 0L; var acc = 0L
      ordered.map { case (d, n) =>
        if (acc + n > C) { bin += 1; acc = 0L }
        acc += n
        (bucket, bin, d, n)
      }
    }.sorted
    assert(packed == want, "packing diverged from the reference walk")
    // partition-invariance: a shuffled, repartitioned input packs the same
    val packed2 = Batching.packSequences(
        df.orderBy(rand(11)).repartition(13), $"doc_id", $"n_tok", C, 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(packed2 == packed, "packing depends on input partitioning")
  }
}
