package graft.pipeline

import graft.SparkTestBase

class TrainingDataSpec extends SparkTestBase {
  import spark.implicits._

  // a natural English sentence long enough to clear the length score
  private val good = ("the cat sat on the mat and it is a good day " * 5).trim

  private val docs = Seq(
    (0L, good),                    // kept
    (1L, good),                    // exact dup of 0 -> dropped
    (2L, "!!! ??? ***"),           // pure punctuation -> quality 0
    (3L, ("der hund und die katze ist da " * 8).trim)) // German, kept
    .toDF("doc_id", "text")

  test("pipeline dedups, drops low quality, labels language") {
    val out = TrainingData.prepare(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 3L))
    val byId = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(0L) == "en")
    assert(byId(3L) == "de")
  }

  test("summary aggregates per guessed language") {
    val s = TrainingData.summary(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s.keySet == Set("en", "de"))
    assert(s("en")._1 == 1L)
    // token budget = whitespace tokens of the one kept English doc
    assert(s("en")._2 == good.split(" ").count(_.nonEmpty))
  }

  test("mixture samples each source at its weight, reproducibly") {
    val corpus = (0 until 2000).map { i =>
      (i.toLong, s"doc $i", if (i % 2 == 0) "web" else "books")
    }.toDF("doc_id", "text", "source")
    val mixed = TrainingData.mixture(corpus, Map("web" -> 0.2, "books" -> 0.9))
    val bySource = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Bernoulli sampling: expect 200±margin web, 900±margin books
    assert(bySource("web") > 120 && bySource("web") < 280, s"web=${bySource("web")}")
    assert(bySource("books") > 820 && bySource("books") < 980, s"books=${bySource("books")}")
    // fixed seed -> identical mixture on re-run
    val again = TrainingData.mixture(corpus, Map("web" -> 0.2, "books" -> 0.9))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == mixed.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("quality threshold is honored") {
    // with an impossible threshold nothing survives
    assert(TrainingData.prepare(docs, minQuality = 1.1).isEmpty)
  }

  test("mixtureByQuota: exact sizes, clamped over-quota, deterministic") {
    import org.apache.spark.sql.functions._
    val corpus = (1L to 100L).map(i =>
      (i, if (i <= 60) "web" else "books", s"doc $i text"))
      .toDF("doc_id", "source", "text")
    val out = TrainingData.mixtureByQuota(corpus,
      Map("web" -> 10, "books" -> 200)) // books over-quota → keep all 40
    val bySource = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("web" -> 10L, "books" -> 40L))
    // deterministic and partition-independent
    val again = TrainingData.mixtureByQuota(corpus.repartition(13),
      Map("web" -> 10, "books" -> 200))
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // unlisted sources are dropped
    assert(TrainingData.mixtureByQuota(corpus, Map("web" -> 5))
      .filter(col("source") === "books").isEmpty)
  }

  test("splitByHash partitions every doc, stably under repartition") {
    import org.apache.spark.sql.functions.col
    val corpus = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val split = TrainingData.splitByHash(corpus, trainPct = 80, valPct = 10)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 1000L)
    // roughly proportional (hash-banded, so ±few % at n=1000)
    assert(counts("train") > 700L && counts("test") < 200L)
    // membership is a pure function of the id: partitioning can't move docs
    val again = TrainingData.splitByHash(corpus.repartition(17), 80, 10)
      .filter(col("split") === "val").select("doc_id").as[Long].collect().toSet
    val first = split.filter(col("split") === "val")
      .select("doc_id").as[Long].collect().toSet
    assert(again == first)
  }

  test("shardBy covers every shard, stably under repartition") {
    import org.apache.spark.sql.functions.col
    val corpus = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val sharded = TrainingData.shardBy(corpus, 8)
    val counts = sharded.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet)
    assert(counts.values.sum == 500L)
    val again = TrainingData.shardBy(corpus.repartition(13), 8)
      .filter(col("shard") === 3).select("doc_id").as[Long].collect().toSet
    val first = sharded.filter(col("shard") === 3)
      .select("doc_id").as[Long].collect().toSet
    assert(again == first)
  }

  test("tokenBudgetSample keeps the longest shuffled prefix within budget") {
    import org.apache.spark.sql.functions._
    // 3-token docs; budget 30 tokens → exactly 10 docs regardless of order
    val corpus = (1L to 100L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val kept = TrainingData.tokenBudgetSample(corpus, 30L)
    assert(kept.count() == 10L)
    assert(kept.agg(sum("n_tokens")).head.getLong(0) == 30L)
    // deterministic and partition-independent
    val again = TrainingData.tokenBudgetSample(corpus.repartition(7), 30L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
    // zero budget keeps nothing; huge budget keeps everything
    assert(TrainingData.tokenBudgetSample(corpus, 0L).isEmpty)
    assert(TrainingData.tokenBudgetSample(corpus, 1000000L).count() == 100L)
  }

  test("qualityWeightedSample: quality-proportional, deterministic, monotone") {
    import org.apache.spark.sql.functions.col
    // high-quality natural text vs punctuation soup (quality ≈ 0)
    val corpus = (1L to 400L).map { i =>
      (i, if (i <= 200) good else "!!! ??? *** ###")
    }.toDF("doc_id", "text")
    val kept = TrainingData.qualityWeightedSample(corpus, rate = 0.8)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    val hi = ids.count(_ <= 200)
    val lo = ids.count(_ > 200)
    // good docs keep at ~0.8·quality(good); junk keeps at ~0 (its only
    // nonzero term is the length score 12/50 → p ≈ 0.06·0.8)
    assert(hi > 100, s"high-quality kept $hi of 200")
    assert(lo < 30, s"low-quality kept $lo of 200")
    // deterministic under repartition
    val again = TrainingData.qualityWeightedSample(corpus.repartition(7), 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
    // monotone in rate: the 0.4-rate sample is a subset of the 0.8-rate
    val half = TrainingData.qualityWeightedSample(corpus, 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(half.subsetOf(ids))
    // rate 0 keeps nothing
    assert(TrainingData.qualityWeightedSample(corpus, 0.0)
      .filter(col("doc_id") > 0).isEmpty)
  }

  test("weightedSampleExact: exact k, deterministic, weight-proportional inclusion") {
    import org.apache.spark.sql.functions._
    // 100 rows: ids 1..10 carry weight 9, ids 11..100 weight 1
    val rows = (1 to 100).map(i => (i.toLong, if (i <= 10) 9.0 else 1.0))
      .toDF("doc_id", "w")
    val s1 = TrainingData.weightedSampleExact(rows, 10, col("w"))
      .select("doc_id").as[Long].collect().toSet
    assert(s1.size == 10)
    // pure function of (ids, weights, seed): repartitioning changes nothing
    val s2 = TrainingData.weightedSampleExact(rows.repartition(7), 10, col("w"))
      .select("doc_id").as[Long].collect().toSet
    assert(s2 == s1)
    // different seed draws a different sample (with overwhelming probability)
    val s3 = TrainingData.weightedSampleExact(rows, 10, col("w"), seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(s3 != s1)
    // inclusion law over 60 seeds: heavy ids (10% of rows, 50% of mass)
    // must fill far more than their count share of the sample. Expected
    // heavy fraction under A-ES ≈ 0.45; count-proportional would be 0.10.
    val heavyFrac = (1 to 60).map { sd =>
      val got = TrainingData.weightedSampleExact(rows, 10, col("w"), seed = sd.toLong)
        .select("doc_id").as[Long].collect()
      got.count(_ <= 10L).toDouble / got.length
    }.sum / 60
    assert(heavyFrac > 0.30 && heavyFrac < 0.60, s"heavy fraction $heavyFrac")
  }

  test("weightedSampleExact: non-positive weights are excluded; top-k plan shape") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 20).map(i => (i.toLong, if (i % 2 == 0) 1.0 else 0.0))
      .toDF("doc_id", "w")
    val got = TrainingData.weightedSampleExact(rows, 15, col("w"))
      .select("doc_id").as[Long].collect()
    assert(got.forall(_ % 2 == 0) && got.length == 10) // only 10 eligible
    val plan = TrainingData.weightedSampleExact(rows, 5, col("w"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    intercept[IllegalArgumentException](
      TrainingData.weightedSampleExact(rows, 0, col("w")))
  }

  test("weightedSamplePerGroup: exact k per stratum, consistent with the global draw") {
    import org.apache.spark.sql.functions._
    // 3 strata × 50 rows; stratum "c" has only 2 positive-weight rows
    val rows = (for {
      g <- Seq("a", "b"); i <- 1 to 50
    } yield (s"$g$i", g, 1.0 + (i % 5))) ++
      Seq(("c1", "c", 1.0), ("c2", "c", 2.0), ("c3", "c", 0.0))
    val df = rows.toDF("doc_id", "src", "w")
    val got = TrainingData.weightedSamplePerGroup(df, 7, col("w"), "src",
      idCol = "doc_id")
    val byG = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 7L, "b" -> 7L, "c" -> 2L)) // short stratum keeps all
    // layout-independent (pure function of ids/weights/seed)
    val again = TrainingData.weightedSamplePerGroup(df.repartition(9),
      7, col("w"), "src", idCol = "doc_id")
      .select("doc_id").as[String].collect().toSet
    assert(again == got.select("doc_id").as[String].collect().toSet)
    // within one stratum the per-group draw IS the global A-ES draw
    val onlyA = df.filter(col("src") === "a")
    val globalA = TrainingData.weightedSampleExact(onlyA, 7, col("w"),
      idCol = "doc_id").select("doc_id").as[String].collect().toSet
    val perGroupA = got.filter(col("src") === "a")
      .select("doc_id").as[String].collect().toSet
    assert(perGroupA == globalA)
    intercept[IllegalArgumentException](
      TrainingData.weightedSamplePerGroup(df, 0, col("w"), "src"))
  }

  test("temperatureRates flattens the domain distribution at alpha < 1") {
    import org.apache.spark.sql.functions._
    // 80 web docs vs 20 wiki docs: raw shares .8/.2; sqrt-flattened
    // shares ~.667/.333 — the tail domain is up-weighted
    val corpus = ((1L to 80L).map(i => (i, "web")) ++
      (81L to 100L).map(i => (i, "wiki"))).toDF("doc_id", "domain")
    val r = TrainingData.temperatureRates(corpus, "domain",
        targetFraction = 0.5, alpha = 0.5)
      .collect().map(x => x.getString(0) -> (x.getDouble(2), x.getInt(3))).toMap
    assert(math.abs(r("web")._1 - 0.666667) < 1e-6)
    assert(math.abs(r("wiki")._1 - 0.333333) < 1e-6)
    // keep rate = q*T/n: web 0.666667*50/80 = .4167, wiki .3333*50/20 = .8333
    assert(r("web")._2 == 4167 && r("wiki")._2 == 8333)
    // alpha = 1 reproduces the natural distribution (uniform thinning)
    val nat = TrainingData.temperatureRates(corpus, "domain", 0.5, alpha = 1.0)
      .collect().map(x => x.getString(0) -> x.getInt(3)).toMap
    assert(nat("web") == 5000 && nat("wiki") == 5000)
    // a rate that would exceed 1 clamps to the full band
    val all = TrainingData.temperatureRates(corpus, "domain", 3.0, alpha = 0.5)
      .collect().map(x => x.getString(0) -> x.getInt(3)).toMap
    assert(all.values.forall(_ == 10000))
    intercept[IllegalArgumentException](
      TrainingData.temperatureRates(corpus, "domain", 0.5, alpha = 0.0))
  }

  test("temperatureMixture keeps a deterministic per-domain subset") {
    import org.apache.spark.sql.functions._
    val corpus = ((1L to 80L).map(i => (i, "web")) ++
      (81L to 100L).map(i => (i, "wiki"))).toDF("doc_id", "domain")
    val kept = TrainingData.temperatureMixture(corpus, "domain", 0.5, 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "domain")) // schema preserved
    val ids = kept.select("doc_id").as[Long].collect().toSet
    // reproducible across re-runs and partitionings
    val again = TrainingData.temperatureMixture(corpus.repartition(7),
      "domain", 0.5, 0.5).select("doc_id").as[Long].collect().toSet
    assert(ids == again)
    // composition leans toward the flattened shares, not the raw ones
    val byDom = kept.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("wiki").toDouble / byDom("web") > 20.0 / 80.0)
  }

  test("splitByGroup keeps duplicate groups whole across splits") {
    import org.apache.spark.sql.functions._
    // 30 groups of 3 near-copies (case/whitespace variants)
    val rows = (1L to 30L).flatMap { g =>
      Seq((g * 3, s"doc $g body text"), (g * 3 + 1, s"DOC $g BODY TEXT"),
        (g * 3 + 2, s"doc  $g  body\ttext"))
    }
    val sp = TrainingData.splitByGroup(rows.toDF("doc_id", "text"), 60, 20)
    // every group's members share one split, and group_id is its min id
    val leaky = sp.groupBy("group_id")
      .agg(countDistinct("split").as("ns"), count(lit(1)).as("n"))
      .filter(col("ns") =!= 1 || col("n") =!= 3)
    assert(leaky.isEmpty)
    assert(sp.select("group_id").as[Long].collect().forall(_ % 3 == 0))
    // all three splits materialize over 30 groups
    assert(sp.select("split").distinct().count() == 3)
  }

  test("trimToLengthBand drops both tails") {
    import org.apache.spark.sql.functions._
    // lengths 1..100 tokens: p5=~5.95, p95=~95.05 → keep 6..95
    val corpus = (1 to 100).map(n => (n.toLong, ("tok " * n).trim))
      .toDF("doc_id", "text")
    val kept = TrainingData.trimToLengthBand(corpus, 0.05, 0.95)
      .select("n_tokens").as[Long].collect()
    assert(kept.min >= 6L && kept.max <= 95L)
    assert(kept.length == 90)
  }

  test("epochSchedule: hand-checked epochs and fractional pass") {
    // a: 5 tokens avail, weight 1; b: 2 tokens avail, weight 3; Σw=4,
    // budget 20 → target a=5 (1 epoch, frac 0), b=15 (7 epochs, frac .5)
    val docs = Seq(
      (1L, "x y z", "a"), (2L, "p q", "a"), (3L, "m n", "b"),
      (4L, "ignored text here", "c")).toDF("doc_id", "text", "source")
    val out = TrainingData.epochSchedule(
        docs, Map("a" -> 1.0, "b" -> 3.0), budgetTokens = 20L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out == Map(
      "a" -> (5L, 5.0, 1L, 0.0),
      "b" -> (2L, 15.0, 7L, 0.5))) // source c absent from weights: dropped
    intercept[IllegalArgumentException](
      TrainingData.epochSchedule(docs, Map("a" -> 1.0), 0L))
    intercept[IllegalArgumentException](
      TrainingData.epochSchedule(docs, Map("a" -> -1.0), 10L))
  }

  test("effective sample size: uniform weights give ESS = n; one heavy row collapses it") {
    import org.apache.spark.sql.functions._
    val df = ((1 to 100).map(i => ("uni", i.toLong, 3.0)) ++
      ((1 to 99).map(i => ("skew", i.toLong, 0.0001)) :+ (("skew", 100L, 1000.0))))
      .toDF("src", "id", "w")
    val rows = TrainingData.effectiveSampleSize(df, "src", col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("uni") == ((100L, 100.0)), s"uniform: ${rows("uni")}")
    assert(rows("skew")._2 < 1.001,
      s"one dominant weight must collapse ESS to ~1: ${rows("skew")._2}")
  }

  test("neymanAllocation splits the budget by N_h·sigma_h") {
    // stratum a: 4 rows, sd 0 (constant) → zero allocation;
    // b and c have equal spread, c has twice the rows → 2× the budget
    val df = ((1 to 4).map(i => ("a", 10.0)) ++
      (1 to 10).map(i => ("b", if (i % 2 == 0) 0.0 else 2.0)) ++
      (1 to 20).map(i => ("c", if (i % 2 == 0) 0.0 else 2.0)))
      .toDF("s", "v")
    val r = TrainingData.neymanAllocation(df, "s", "v", sampleN = 300)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(3), x.getLong(4))).toMap
    assert(r("a") == ((0.0, 0L)))
    // largest-remainder: floors are (0, 99, 200); the 1-unit shortfall
    // goes to b (fractional part .9999 beats c's .0001)
    assert(r("b") == ((math.rint(1.0 / 3 * 1e6) / 1e6, 100L)))
    assert(r("c") == ((math.rint(2.0 / 3 * 1e6) / 1e6, 200L)))
    assert(r.values.map(_._2).sum == 300L, "budget must be fully allocated")
  }

  test("looGroupInfluence matches direct leave-one-out recomputation") {
    val df = (1 to 90).map(i => (s"g${i % 3}", (i % 11).toLong))
      .toDF("g", "v")
    val got = TrainingData.looGroupInfluence(df, "g", "v")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    val rows = (1 to 90).map(i => (s"g${i % 3}", (i % 11).toLong))
    for (g <- Seq("g0", "g1", "g2")) {
      val rest = rows.filterNot(_._1 == g).map(_._2)
      val expect = math.rint(rest.sum.toDouble / rest.size * 1e4) / 1e4
      assert(got(g) == expect, s"$g: ${got(g)} vs $expect")
    }
    val inv = TrainingData.looGroupInfluence(df.repartition(13), "g", "v")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(inv == got)
  }
}
