package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails, IPv4s, and card-like digit runs in order") {
    val df = Seq(
      "mail bob.smith+x@sub.example.org end",
      "ip 192.168.0.1 mid 10.0.0.255 end",
      "card 4111111111111111 and 12345 stays",
      "combo a@b.co 1.2.3.4 5500005555555559",
      "clean text no pii").toDF("t")
    val out = df.select(Curation.redactPii($"t")).as[String].collect().toSeq
    assert(out == Seq(
      "mail [EMAIL] end",
      "ip [IP] mid [IP] end",
      "card [CARD] and 12345 stays",
      "combo [EMAIL] [IP] [CARD]",
      "clean text no pii"))
  }

  test("passageDupes finds cross-doc shared windows, not within-doc runs") {
    val df = Seq(
      (1L, "a b c d e f g h tail one"),
      (2L, "x y a b c d e f g h"),   // shares the a..h window at offset 2
      (3L, "solo words only here none match at all")
    ).toDF("id", "text")
    // width=4, stride=2: doc1 windows a-b-c-d, c-d-e-f, e-f-g-h, g-h-tail;
    // doc2 (offset by its x-y prefix) x-y-a-b, a-b-c-d, c-d-e-f, e-f-g-h.
    val out = Curation.passageDupes(df, $"text", $"id", width = 4, stride = 2)
      .orderBy($"passage")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a b c d", 2L, 2L, 1L), ("c d e f", 2L, 2L, 1L), ("e f g h", 2L, 2L, 1L)))
  }

  test("ngramOverlap counts distinct shared grams and flags at threshold") {
    val train = Seq(
      (10L, "p q r s t u"),          // grams pqr qrs rst stu — all shared
      (11L, "p q r zz yy xx"),       // only pqr shared
      (12L, "none of these words")   // nothing shared → absent from output
    ).toDF("id", "text")
    val eval = Seq((90L, "p q r s t u v")).toDF("id", "text")
    val out = Curation.ngramOverlap(train, eval, $"text", $"id",
        w = 3, minShared = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((10L, 4L, 1), (11L, 1L, 0)))
  }

  test("native ShingleExplode gramTable ≡ composed explode(shingles) twin") {
    val d = Engine.table(spark, sf(), "documents").limit(300)
      // edge rows the real table lacks: short text, trailing space, null
      .unionByName(Seq((9001L, "a b"), (9002L, "x y z w "), (9003L, null))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", lit(0L)))
    val fused = Curation.gramTable(d, $"text", $"doc_id", 3)
      .orderBy($"doc_id", $"gram").collect().toSeq
    val composed = Curation.gramTableComposed(d, $"text", $"doc_id", 3)
      .orderBy($"doc_id", $"gram").collect().toSeq
    assert(fused == composed)
  }

  test("qualityLogit ranks diverse text above repetition at equal length") {
    val df = Seq(
      ("div", "alpha bravo charlie delta echo foxtrot golf hotel"),
      ("rep", "spam spam spam spam spam spam spam spam")).toDF("k", "text")
    val m = df.select($"k", Curation.qualityLogit($"text").as("z"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("div") > m("rep"))
    // equal token counts cancel the ln term; ttr 1 vs 1/8, mean word
    // length 42/8 vs 4
    assert(math.abs((m("div") - m("rep")) -
      (3.0 * (1.0 - 1.0 / 8) - 0.5 * (42.0 / 8 - 4.0))) < 1e-9)
  }

  test("weightedSample is deterministic and favors heavy weights") {
    val df = (1 to 60).map(i =>
      ("b", s"doc-$i", if (i == 7) 1e9 else 1.0, i.toLong))
      .toDF("bucket", "seed", "w", "id")
    def run() = Curation.weightedSample(df, $"bucket", $"seed", $"w", $"id", 10)
      .select($"id").as[Long].collect().toSet
    val a = run()
    assert(a == run() && a.size == 10) // reproducible, exact k
    assert(a.contains(7L)) // −ln(u)/1e9 ≈ 0 beats every unit-weight draw
  }

  test("dsirWeights: target-like docs score above out-of-distribution docs") {
    // target slice speaks one vocabulary, the rest another; a held-out
    // doc in the target vocabulary must outweigh one outside it
    val target = (1 to 8).map(i => (i.toLong, true, "alpha beta gamma delta"))
    val raw = (9 to 16).map(i => (i.toLong, false, "uno dos tres cuatro"))
    val probes = Seq((100L, false, "alpha beta gamma delta"),
      (101L, false, "uno dos tres cuatro"))
    val df = (target ++ raw ++ probes).toDF("id", "is_t", "text")
    val w = Curation.dsirWeights(df, $"text", $"id", $"is_t", buckets = 64)
      .select($"__id", $"dsir_weight").as[(Long, Double)].collect().toMap
    assert(w(100L) > 0 && w(101L) < 0 && w(100L) > w(101L),
      s"target probe ${w(100L)} vs ood probe ${w(101L)}")
    // partitioning-invariant: quantized integer sums, any layout
    val w7 = Curation.dsirWeights(df.repartition(7), $"text", $"id",
        $"is_t", buckets = 64)
      .select($"__id", $"dsir_weight").as[(Long, Double)].collect().toMap
    assert(w7 == w)
  }

  test("tokenBudget keeps best-first rows while the running total fits") {
    val df = Seq(
      ("en", 1L, 9, 40L), ("en", 2L, 8, 50L), ("en", 3L, 7, 20L),
      ("fr", 4L, 5, 100L), ("fr", 5L, 4, 10L))
      .toDF("lang", "id", "score", "tokens")
    // en by score desc: id1(40) cum40, id2(50) cum90, id3(20) cum110>100 → out.
    // fr: id4(100) cum100, id5(10) cum110>100 → out.
    val kept = Curation.tokenBudget(df, "lang", $"score", $"id", $"tokens", 100L)
      .select($"id", $"cum_tokens").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.toSeq == Seq((1L, 40L), (2L, 90L), (4L, 100L)))
  }

  test("bloomDecontaminate: exact hits always hit the filter; verbatim overlap flags") {
    // doc 10 repeats eval text verbatim (>= 5 shared 3-grams); doc 11 is
    // disjoint vocabulary. Bloom hits dominate exact hits on EVERY doc
    // (an exact shared gram set every one of its k bits by construction).
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (11L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val out = Curation.bloomDecontaminate(train, eval, $"text", $"doc_id")
      .orderBy($"doc_id").collect()
    assert(out.length == 2)
    val r10 = out(0)
    assert(r10.getLong(1) >= r10.getLong(2), "bloom hits must dominate exact")
    assert(r10.getLong(2) == 6L && r10.getInt(3) == 1, // 6 shared 3-grams
      s"doc 10 should flag: $r10")
    val r11 = out(1)
    assert(r11.getLong(2) == 0L && r11.getLong(1) >= r11.getLong(2))
    intercept[IllegalArgumentException] {
      Curation.bloomDecontaminate(train, eval, $"text", $"doc_id", mBits = 100)
    }
  }

  test("mixtureSchedule: per-doc replicas are floor(rate) or +1; reps enumerate 1..n") {
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 100L), (3L, "en", 100L), (4L, "en", 100L),
      (5L, "zh", 50L), (6L, "xx", 77L)) // xx has no target weight
      .toDF("doc_id", "lang", "tok")
    // T=527, en: T_s=400 w=500 -> r_ppm = 500*527*1000/400 = 658750
    // zh: T_s=50 w=500 -> r_ppm = 500*527*1000/50 = 5270000 (base 5)
    val out = Curation.mixtureSchedule(docs, $"lang", $"tok", $"doc_id",
      Map("en" -> 500, "zh" -> 500))
    val byId = out.groupBy($"doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!byId.contains(6L), "unweighted stratum must drop out")
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(byId.getOrElse(id, 0L) <= 1L, s"en doc $id: base 0, at most 1")
    }
    assert(byId(5L) == 5L || byId(5L) == 6L, s"zh doc: 5 or 6, got ${byId.get(5L)}")
    // rep values enumerate 1..n with no gaps
    val reps = out.filter($"doc_id" === 5L).select($"rep")
      .as[Long].collect().sorted.toSeq
    assert(reps == (1L to reps.length).toSeq)
    intercept[IllegalArgumentException] {
      Curation.mixtureSchedule(docs, $"lang", $"tok", $"doc_id", Map("en" -> 7))
    }
  }

  test("spanDecontaminate removes exactly the contaminated window union") {
    val ev = Seq((90L, "A B C D E F G H I")).toDF("id", "text")
    val train = Seq(
      // eval 8-gram A..H planted mid-doc → tokens 2..9 removed
      (1L, "w1 w2 A B C D E F G H w3 w4"),
      // both eval windows hit → whole doc removed
      (2L, "A B C D E F G H I"),
      // overlapping windows coalesce: covered 1..9, bookends survive
      (3L, "x0 A B C D E F G H I x1"),
      // clean doc → untouched
      (4L, "no overlap here at all with anything else present"),
      // shorter than w → no windows, untouched
      (5L, "tiny doc")
    ).toDF("id", "text")
    val out = Curation.spanDecontaminate(train, ev, $"text", $"id", w = 8)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(out == Seq(
      (1L, 12L, 8L, "w1 w2 w3 w4"),
      (2L, 9L, 9L, ""),
      (3L, 11L, 9L, "x0 x1"),
      (4L, 9L, 0L, "no overlap here at all with anything else present"),
      (5L, 2L, 0L, "tiny doc")))
  }

  test("curationDiff partitions every doc into exactly one transition") {
    val docs = Seq(
      ("web", 10L, true, true),    // kept_both
      ("web", 20L, true, false),   // left
      ("web", 5L, false, true),    // entered
      ("books", 7L, false, false), // dropped_both
      ("books", 9L, true, true)
    ).toDF("src", "tok", "pa", "pb")
    val out = Curation.curationDiff(docs, $"src", $"tok", $"pa", $"pb")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("web", "kept_both") -> ((1L, 10L)),
      ("web", "left") -> ((1L, 20L)),
      ("web", "entered") -> ((1L, 5L)),
      ("books", "dropped_both") -> ((1L, 7L)),
      ("books", "kept_both") -> ((1L, 9L))))
    // law: the transitions partition the corpus — doc/token totals match
    assert(out.values.map(_._1).sum == 5L)
    assert(out.values.map(_._2).sum == 51L)
  }

  test("doremiWeights: equal quality collapses to the token-share reference") {
    val docs = Seq(
      ("a", 100L, 0.5), ("a", 300L, 0.5),
      ("b", 200L, 0.5), ("c", 400L, 0.5)
    ).toDF("src", "tok", "q")
    val out = Curation.doremiWeights(docs, $"src", $"tok", $"q")
      .collect().map(r => (r.getString(0),
        (r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    // no excess anywhere -> exp(0) = 1 -> weights ARE the reference
    out.foreach { case (src, (refPpm, excess, wPpm)) =>
      assert(excess == 0.0, s"$src excess")
      assert(math.abs(wPpm - refPpm) <= 1, s"$src: $wPpm vs ref $refPpm")
    }
    assert(out("a")._1 == 400000L && out("b")._1 == 200000L
      && out("c")._1 == 400000L)
  }

  test("doremiWeights upweights the quality-trailing domain") {
    val docs = Seq(
      ("good", 500L, 2.0), ("good", 500L, 2.0),
      ("bad", 500L, -2.0), ("bad", 500L, -2.0)
    ).toDF("src", "tok", "q")
    val out = Curation.doremiWeights(docs, $"src", $"tok", $"q")
      .collect().map(r => (r.getString(0),
        (r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    // equal token shares; 'bad' trails the corpus mean by 2 -> upweighted
    assert(out("bad")._2 == 2.0 && out("good")._2 == 0.0)
    assert(out("bad")._3 > out("bad")._1, "trailing domain must gain weight")
    assert(out("good")._3 < out("good")._1)
    // ppm normalization: integer division truncates, so the sum lands in
    // (1e6 - |domains|, 1e6]
    val total = out.values.map(_._3).sum
    assert(total > 1000000L - out.size && total <= 1000000L)
  }

  test("compression signal: repetition compresses, prose doesn't, empty is neutral") {
    import graft.operators.CompressionSignal
    val rnd = new scala.util.Random(42)
    val prose = Seq.fill(300)(rnd.alphanumeric.take(6).mkString).mkString(" ")
    val spam = "buy cheap now " * 150
    val docs = Seq((1L, spam), (2L, prose), (3L, ""), (4L, "short"))
      .toDF("doc_id", "text")
    val out = CompressionSignal.ratios(docs.repartition(3), "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ratio"))
      .toMap
    assert(out(1L) < 0.1, s"repetition must crush: ${out(1L)}")
    assert(out(2L) > 0.5, s"random-word prose must not: ${out(2L)}")
    assert(out(3L) == 1.0)
    // deterministic across partitionings (pure function of the bytes)
    val again = CompressionSignal.ratios(docs.repartition(1), "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ratio"))
      .toMap
    assert(out == again)
  }

  test("two-phase min-id winner recovery ≡ whole-row min_by keeper " +
    "(the q102/q161 exact-dedup shape, r19)") {
    // the r19 keeper: hash-agg (content hash → min doc_id) + broadcast
    // LEFT SEMI on doc_id. Must return exactly the rows the r2–r18
    // whole-row min_by(struct(…), doc_id) aggregate returned — pinned on
    // a corpus where EVERY text is a duplicate pair (the union below),
    // so winner selection is exercised on every group, not just on
    // accidental dupes in the fixture
    import org.apache.spark.sql.functions._
    val base = Engine.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .where(Curation.qualityLogit(col("text")) >= 0)
    val kept = base.union(
      base.withColumn("doc_id", col("doc_id") + 1000000L))
    val winners = kept.groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val twoPhase = kept.join(broadcast(winners), Seq("doc_id"), "left_semi")
    val ref = kept.groupBy(md5(col("text")).as("__h"))
      .agg(min_by(struct(kept.columns.map(col): _*), col("doc_id"))
        .as("__r"))
      .select(col("__r.*"))
    assert(twoPhase.columns.toSeq == ref.columns.toSeq)
    val a = twoPhase.collect().map(_.toSeq).sortBy(_.head.toString)
    val b = ref.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.length == b.length && a.nonEmpty)
    assert(a.toSeq == b.toSeq)
    // and every winner is the min id of its group (no dup survivor)
    assert(twoPhase.groupBy(md5(col("text"))).count()
      .where(col("count") > 1).count() == 0)
  }
}
