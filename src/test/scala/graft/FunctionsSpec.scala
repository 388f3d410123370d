package graft

import org.apache.spark.sql.functions._

import graft.functions.InBroadcastSet
import graft.model._
import graft.model.FieldType._

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("InBroadcastSet: correct membership incl. nulls, codegen path") {
    val terms = (1 to 50000).map(i => s"TERM:$i").toSet
    val df = Seq(Some("TERM:1"), Some("TERM:50000"), Some("nope"), None).toDF("t")
    val got = df.select(InBroadcastSet(spark, $"t", terms).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq === Seq(true, true, false, null))
  }

  test("InBroadcastSet agrees with isin on random data") {
    val terms = (1 to 20000).map(i => s"v$i").toSet
    val df = (1 to 1000).map(i => s"v${i * 37}").toDF("t")
    val a = df.select(InBroadcastSet(spark, $"t", terms).as("m")).collect().map(_.getBoolean(0))
    val small = df.select($"t".isin(terms.toSeq: _*).as("m")).collect().map(_.getBoolean(0))
    assert(a.toSeq === small.toSeq)
  }

  test("large Ontology fields compile to the broadcast-set expression") {
    val terms = (1 to 20000).map(i => s"T:$i").toSet
    val cl = Checklist("big", Seq(FieldDef("x", OntologyT(terms, "big"))))
    val df = Seq("T:5", "T:99999").toDF("x")
    val v = graft.engine.Validator.validate(df, cl,
      graft.engine.Validator.Options(rowIdCol = Some("x")))
    val passed = v.select("passed").collect().map(_.getBoolean(0))
    assert(passed.toSeq === Seq(true, false))
    // the plan must NOT contain a 20k-literal IN list
    val plan = v.queryExecution.optimizedPlan.toString
    assert(plan.contains("in_broadcast_set") || !plan.contains("T:19999"))
  }
}
