package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The operators' input contracts must fail FAST with a named cause —
  * a silent wrong answer (dropped signature positions, a corrupted
  * stack() expression) is the failure mode these guards exist for. */
class ContractsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq((1L, "a b c")).toDF("doc_id", "text")

  test("minhashNearDups rejects numHashes not divisible by bands") {
    val e = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.minhashNearDups(docs, numHashes = 60, bands = 16)
    }
    assert(e.getMessage.contains("bands"))
  }

  test("zorderKeyN rejects key widths that overflow a long") {
    intercept[IllegalArgumentException] {
      ZOrder.zorderKeyN(Seq(col("x"), col("y"), col("z")), bits = 21)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zorderKeyN(Seq(col("x")), bits = 4) // < 2 columns
    }
  }

  test("columnProfile names unknown and quote-bearing columns") {
    val df = Seq((1L, "x")).toDF("id", "tag")
    val missing = intercept[IllegalArgumentException] {
      Profile.columnProfile(df, Seq("nope"))
    }
    assert(missing.getMessage.contains("nope"))
    intercept[IllegalArgumentException] {
      Profile.columnProfile(df, Seq("weird`col"))
    }
    intercept[IllegalArgumentException] { Profile.columnProfile(df, Seq.empty) }
  }

  test("pagerank and band-trim reject out-of-range parameters") {
    intercept[IllegalArgumentException] {
      graft.graph.PageRank.pagerank(
        Seq((1L, 2L, 1L)).toDF("src", "dst", "weight"), iters = 0)
    }
    // non-positive edge weight would silently null every downstream rank
    val w = intercept[IllegalArgumentException] {
      graft.graph.PageRank.pagerank(
        Seq((1L, 2L, 1L), (2L, 1L, 0L)).toDF("src", "dst", "weight"))
    }
    assert(w.getMessage.contains("positive"))
    intercept[IllegalArgumentException] {
      graft.pipeline.TrainingData.trimToLengthBand(docs, lo = 0.9, hi = 0.1)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.TrainingData.qualityWeightedSample(docs, rate = -1.0)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.TrainingData.shardBy(docs, nShards = 0)
    }
  }

  test("quality rules fail at construction, not as phantom violations") {
    // inverted/NaN range or empty set would flag EVERY row as bad data
    val lohi = intercept[IllegalArgumentException] {
      Quality.InRange("fare", lo = 50.0, hi = 1.0)
    }
    assert(lohi.getMessage.contains("lo > hi"))
    intercept[IllegalArgumentException] {
      Quality.InRange("fare", lo = Double.NaN, hi = 1.0)
    }
    intercept[IllegalArgumentException] { Quality.InSet("flag", Seq.empty) }
    intercept[IllegalArgumentException] { Quality.Unique(Seq.empty) }
    intercept[IllegalArgumentException] { Quality.check(docs, Seq.empty) }
    // duplicate rule names would collide in the report
    intercept[IllegalArgumentException] {
      Quality.check(docs, Seq(Quality.NotNull("text"), Quality.NotNull("text")))
    }
  }

  test("resize and pagerank tolerance parameters are range-checked") {
    intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.resizeImagePayloads(docs, factor = 0)
    }
    intercept[IllegalArgumentException] {
      graft.graph.PageRank.pagerank(
        Seq((1L, 2L, 1L)).toDF("src", "dst", "weight"), tol = -1e-6)
    }
  }

  test("chunked sessionize/as-of reject degenerate chunking") {
    val ev = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    // chunks smaller than the gap would make every session a merge chain
    val e = intercept[IllegalArgumentException] {
      Windows.sessionizeChunked(ev, gapMinutes = 120, chunkHours = 1)
    }
    assert(e.getMessage.contains("chunkHours"))
    intercept[IllegalArgumentException] {
      Windows.sessionizeChunked(ev, gapMinutes = 0)
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfChunked(ev, ev, "user_id", "ts", "event_id",
        Seq("value"), chunkHours = 0)
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfForwardChunked(ev, ev, "user_id", "ts", "event_id",
        Seq("value"), chunkHours = 0)
    }
  }

  test("round-8 additions fail fast on bad parameters") {
    // PQ: dimension must split evenly into m subspaces
    val emb = Seq((1L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val ePq = intercept[IllegalArgumentException] {
      graft.similarity.Pq.train(emb, m = 2, k = 2)
    }
    assert(ePq.getMessage.contains("divisible"))
    // weighted quantiles: cut points must sit in (0, 1]
    val li = Seq(("A", 1.0, 1.0)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      Relational.weightedQuantiles(li, "g", "v", "w", qs = Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Relational.weightedQuantiles(li, "g", "v", "w", qs = Seq.empty)
    }
    // BFS: negative horizon
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      graft.graph.Bfs.hopDistances(edges, Seq(1L).toDF("node"), maxHops = -1)
    }
    // prefix filter: tau outside (0, 1]
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.prefixFilterPairs(docs, tau = 1.5)
    }
    // degree profile: the Hill estimator needs dMin >= 2
    intercept[IllegalArgumentException] {
      graft.graph.DegreeProfile.outDegreeProfile(edges, dMin = 1)
    }
  }
}
