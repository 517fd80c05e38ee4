package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rules.{Cond, Ripper, Rule}

class RulesSpec extends AnyFunSuite {
  test("Ripper recovers a single-threshold concept") {
    // outcome = 1 iff x <= 5
    val rows = (0 until 100).map { i =>
      val x = (i % 20).toDouble
      (Array(x, (i % 7).toDouble), if (x <= 5) 1 else 0)
    }.toArray
    val rs = Ripper.fit(rows, Array("x", "noise")).get
    assert(rs.confidence == 1.0)
    assert(rs.support > 0.25)
    assert(rs.rules.exists(_.conds.exists(c => c.feature == "x" && c.isLeq && c.threshold == 5.0)))
  }

  test("Ripper recovers a conjunction") {
    // outcome = 1 iff x <= 5 and y >= 3
    val rows = (0 until 200).map { i =>
      val x = (i % 10).toDouble; val y = (i / 10 % 6).toDouble
      (Array(x, y), if (x <= 5 && y >= 3) 1 else 0)
    }.toArray
    val rs = Ripper.fit(rows, Array("x", "y")).get
    assert(rs.confidence == 1.0)
    val preds = rows.map { case (r, _) => rs.rules.exists(_.matches(r, Map("x" -> 0, "y" -> 1))) }
    assert(preds.zip(rows).forall { case (p, (_, yy)) => p == (yy == 1) })
  }

  test("Ripper returns None when no rule reaches min support") {
    val rows = (0 until 100).map(i => (Array(i.toDouble % 2), i % 50 match {
      case 0 => 1
      case _ => 0
    })).toArray
    assert(Ripper.fit(rows, Array("x")).isEmpty)
  }

  test("RuleSet compiles to a scoring Column (H2)") {
    lazy val spark = SparkSuite.spark
    import spark.implicits._
    val rs = graft.rules.RuleSet(List(Rule(List(Cond("v", isLeq = true, 5.0)))), 4, 1.0, 0.5)
    val scored = Seq(1.0, 6.0, 5.0).toDF("v").withColumn("hit", rs.toColumn).collect()
    assert(scored.map(_.getBoolean(1)).toSeq == Seq(true, false, true))
  }
}
