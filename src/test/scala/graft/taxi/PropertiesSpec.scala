package graft.taxi

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based checks from SURVEY §5.3: cleaning idempotence and
  * monotonicity over random trips, manual partial/final aggregation
  * equivalence, and schema-normalizer totality over column-name
  * variants. */
class PropertiesSpec extends SparkTestBase {

  /** Drive a Gen over deterministic seeds (scalatest/scalacheck bridge
    * is not on the offline classpath). */
  private def forSeeds[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i")))
    }

  private val epoch = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private val genTrip: Gen[Row] = for {
    hasPickup <- Gen.frequency(9 -> true, 1 -> false)
    pickupOff <- Gen.choose(0L, 180L * 24 * 3600 * 1000)
    durMs <- Gen.oneOf(
      Gen.choose(-3600000L, 3600000L),       // around zero (dirty cases)
      Gen.choose(0L, 2L * 24 * 3600 * 1000)) // up to 2 days
      .flatMap(g => g)
    dist <- Gen.oneOf(Gen.const(null: java.lang.Double),
      Gen.choose(-10.0, 600.0).map(d => d: java.lang.Double))
    fare <- Gen.oneOf(Gen.const(null: java.lang.Double),
      Gen.choose(-50.0, 500.0).map(d => d: java.lang.Double))
  } yield Row("gen",
    if (hasPickup) new Timestamp(epoch + pickupOff) else null,
    if (hasPickup) new Timestamp(epoch + pickupOff + durMs) else null,
    1, 1, dist, fare, 0.0, fare)

  private def trips(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), TaxiSchemas.canonical)

  test("cleaning is idempotent and monotone over random trips") {
    forSeeds(Gen.listOfN(60, genTrip)) { rows =>
      val raw = trips(rows)
      val once = Cleaning.clean(raw)
      val twice = Cleaning.clean(once.drop("duration_min"))
      assert(once.count() == twice.count())
      assert(once.count() <= raw.count())
      // every survivor satisfies every bound
      val bad = once.filter(
        !(col("duration_min") > Cleaning.MinDurationMin &&
          col("duration_min") < Cleaning.MaxDurationMin) ||
          (col("distance_mi").isNotNull &&
            !(col("distance_mi") > 0 && col("distance_mi") < 500)) ||
          (col("fare").isNotNull && col("fare") < 0)).count()
      assert(bad == 0)
    }
  }

  test("manual partial/final average equals direct average") {
    forSeeds(Gen.listOfN(50, Gen.zip(Gen.choose(0, 3), Gen.choose(0.0, 100.0)))) { data =>
      import spark.implicits._
      val df = data.toDF("k", "v")
      val direct = df.groupBy("k").agg(avg("v").as("a"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // the reference's accumulate/finalize pattern (analytics_pandas.py:188-244)
      val partial = df.repartition(4).groupBy("k", "v")
        .agg(sum("v").as("s"), count(lit(1)).as("c"))
        .groupBy("k").agg((sum("s") / sum("c")).as("a"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      direct.foreach { case (k, v) =>
        assert(math.abs(partial(k) - v) < 1e-9)
      }
    }
  }

  test("schema normalizer is total over cab-type schemas and name variants") {
    val variants = Seq(
      TaxiSchemas.yellow, TaxiSchemas.green, TaxiSchemas.fhv, TaxiSchemas.fhvhv)
    variants.foreach { schema =>
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      val out = SchemaNormalizer.toCanonical(empty, "any")
      assert(out.schema.fieldNames.toSeq == TaxiSchemas.canonical.fieldNames.toSeq)
      out.collect() // must analyze + execute without error
    }
  }
}
