package graft.graph

import graft.SparkTestBase

class PowerLawSpec extends SparkTestBase {
  import spark.implicits._

  test("alpha matches the closed-form MLE on a hand-built degree set") {
    // star: hub degree 5, leaves degree 1 → tail (kmin=2) = {5} only
    val edges = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    val r = GraphStats.powerLawAlpha(edges, kmin = 2).collect()(0)
    assert(r.getInt(0) == 2 && r.getLong(1) == 1L && r.getLong(2) == 5L)
    val expected = BigDecimal(1.0 + 1.0 / math.log(5.0 / 1.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expected, s"${r.getDouble(3)} vs $expected")
  }

  test("heavier tails give smaller alpha (steeper = larger)") {
    // geometric-ish heavy tail vs near-regular graph
    def ring(n: Int) = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val heavy = (1L to 30L).map(l => (0L, l)) ++ ring(8).map { case (a, b) => (a + 100L, b + 100L) }
    val light = ring(30)
    val aHeavy = GraphStats.powerLawAlpha(heavy.toDF("src", "dst"), kmin = 2)
      .collect()(0).getDouble(3)
    val aLight = GraphStats.powerLawAlpha(light.toDF("src", "dst"), kmin = 2)
      .collect()(0).getDouble(3)
    assert(aHeavy < aLight, s"heavy $aHeavy should be < light $aLight")
  }
}
