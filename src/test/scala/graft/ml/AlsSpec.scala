package graft.ml

import graft.SparkTestBase

class AlsSpec extends SparkTestBase {
  import spark.implicits._

  test("single-user round matches the closed form") {
    // q0 = (1, 2); f = (2·1 + 3·2)/(1 + 1 + 4) = 4/3;
    // q(0) = (2·f)/(1 + f²) = 0.96, q(1) = (3·f)/(1 + f²) = 1.44
    val df = Seq((7L, 0L, 2.0), (7L, 1L, 3.0)).toDF("u", "i", "r")
    val r = Als.rank1Round(df, "u", "i", "r").collect()
    assert(r.map(_.getAs[Long]("item")).toSeq == Seq(0L, 1L))
    assert(r.map(_.getAs[Double]("factor")).toSeq == Seq(0.96, 1.44))
    assert(r.map(_.getAs[Long]("n_ratings")).toSeq == Seq(1L, 1L))
  }

  test("damping shrinks factors toward zero") {
    val df = Seq((7L, 0L, 2.0), (7L, 1L, 3.0)).toDF("u", "i", "r")
    val loose = Als.rank1Round(df, "u", "i", "r", lambda = 1.0)
      .collect().map(_.getAs[Double]("factor"))
    val tight = Als.rank1Round(df, "u", "i", "r", lambda = 100.0)
      .collect().map(_.getAs[Double]("factor"))
    loose.zip(tight).foreach { case (l, t) =>
      assert(math.abs(t) < math.abs(l))
    }
  }

  test("deterministic across partitionings") {
    val df = (1 to 500).map(k =>
      ((k % 17).toLong, (k % 9).toLong, (k % 5 + 1).toDouble))
      .toDF("u", "i", "r")
    val a = Als.rank1Round(df, "u", "i", "r").collect().toSeq
    val b = Als.rank1Round(df.repartition(13), "u", "i", "r").collect().toSeq
    assert(a == b)
  }
}
