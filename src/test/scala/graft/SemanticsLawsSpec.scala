package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.core.MiniFrame

/** ScalaCheck laws for the reference null semantics (SURVEY.md §1.4):
  * random nullable columns, Spark results compared to a direct Scala
  * model of the reference's NoneHandler policies. One Spark job per law
  * (the whole generated dataset goes through a single plan). */
class SemanticsLawsSpec extends SparkSpec {

  private val optLong: Gen[Option[Long]] =
    Gen.frequency(3 -> Gen.choose(-50L, 50L).map(Some(_)), 1 -> Gen.const(None))
  private val optBool: Gen[Option[Boolean]] =
    Gen.frequency(3 -> Gen.oneOf(true, false).map(Some(_)), 1 -> Gen.const(None))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("law: comparisons yield false on any null input, never null") {
    check(Prop.forAll(Gen.listOfN(40, optLong), Gen.choose(-50L, 50L)) {
      (xs, y) =>
        xs.isEmpty || {
          val s = MiniFrame.seriesFromArray(spark, xs.map(_.orNull))
          val expected = xs.map(x => x.exists(_ < y))
          (s < y).values() == expected
        }
    })
  }

  test("law: null-safe equality matches Option equality") {
    check(Prop.forAll(Gen.listOfN(40, Gen.zip(optLong, optLong))) { ps =>
      ps.isEmpty || {
        val a = MiniFrame.seriesFromArray(spark, ps.map(_._1.orNull))
        val b = MiniFrame.seriesFromArray(spark, ps.map(_._2.orNull))
        (a === b).values() == ps.map { case (x, y) => x == y }
      }
    })
  }

  test("law: arithmetic propagates null exactly when an input is null") {
    check(Prop.forAll(Gen.listOfN(40, Gen.zip(optLong, optLong))) { ps =>
      ps.isEmpty || {
        val a = MiniFrame.seriesFromArray(spark, ps.map(_._1.orNull))
        val b = MiniFrame.seriesFromArray(spark, ps.map(_._2.orNull))
        (a + b).values() == ps.map {
          case (Some(x), Some(y)) => x + y
          case _ => null
        }
      }
    })
  }

  test("law: AND/OR are non-Kleene — null input forces null output") {
    check(Prop.forAll(Gen.listOfN(40, Gen.zip(optBool, optBool))) { ps =>
      ps.isEmpty || {
        val a = MiniFrame.seriesFromArray(spark, ps.map(_._1.orNull))
        val b = MiniFrame.seriesFromArray(spark, ps.map(_._2.orNull))
        val and = (a && b).values()
        val or = (a || b).values()
        and == ps.map {
          case (Some(x), Some(y)) => x && y
          case _ => null
        } && or == ps.map {
          case (Some(x), Some(y)) => x || y
          case _ => null
        }
      }
    })
  }

  test("law: Python-sign modulo for every sign combination") {
    val nonZero = Gen.choose(-20L, 20L).suchThat(_ != 0)
    check(Prop.forAll(Gen.listOfN(30, Gen.choose(-100L, 100L)), nonZero) {
      (xs, m) =>
        xs.isEmpty || {
          val s = MiniFrame.seriesFromArray(spark, xs)
          (s % m).values() == xs.map(x => java.lang.Math.floorMod(x, m))
        }
    })
  }
}
