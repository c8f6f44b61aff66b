package graft

import graft.operators.Projection

class ProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("sign matrix is deterministic ±1 and not degenerate") {
    val m = Projection.signMatrix(8, 64)
    assert(m === Projection.signMatrix(8, 64))
    assert(m.flatten.forall(v => v == 1.0 || v == -1.0))
    // every output dim must mix signs, else it's a plain coordinate sum
    m.foreach(row => assert(row.distinct.size === 2, s"constant row: $row"))
  }

  test("projecting a basis vector yields that column of the sign matrix") {
    val i = 5
    val basis = Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)
    val df = Seq((1L, basis)).toDF("vec_id", "embedding")
    val got = Projection.randomProject(df, "vec_id", "embedding", 8, 64)
      .select("dim", "value").as[(Long, Double)].collect().toMap
    val scale = math.sqrt(8.0)
    (0 until 8).foreach { j =>
      val want = math.floor(Projection.sign(j, i) / scale * 10000) / 10000
      assert(got(j.toLong) === want, s"dim $j")
    }
  }

  test("zero vector projects to zero in every dimension") {
    val df = Seq((1L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val vals = Projection.randomProject(df, "vec_id", "embedding", 8, 64)
      .select("value").as[Double].collect()
    assert(vals.length === 8 && vals.forall(_ === 0.0))
  }

  test("projection is linear: P(a+b) = P(a) + P(b)") {
    val a = Array.tabulate(64)(d => (d % 7).toFloat / 7f)
    val b = Array.tabulate(64)(d => ((d * 3) % 5).toFloat / 5f)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((1L, a), (2L, b), (3L, ab)).toDF("vec_id", "embedding")
    val got = Projection.randomProject(df, "vec_id", "embedding", 8, 64)
      .select("id", "dim", "value").as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(r => r._2 -> r._3).toMap }
    (0 until 8).foreach { j =>
      assert(math.abs(got(3L)(j.toLong) - (got(1L)(j.toLong) + got(2L)(j.toLong))) < 2e-4)
    }
  }
}
