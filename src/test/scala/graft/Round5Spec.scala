package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.internal.SQLConf

/** Round-5 specs: thread-scoped optimizer-flag override (the round-4
  * ADVICE medium item) and its observable effect on planning.
  */
class Round5Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val key = "spark.sql.constraintPropagation.enabled"

  test("withoutConstraintPropagation is thread-scoped, not session-global") {
    val df = spark.range(1).toDF("id")
    assert(spark.conf.get(key, "true") == "true")
    GraphAlgorithms.withoutConstraintPropagation(df) {
      // this thread's Catalyst conf sees the override...
      assert(!SQLConf.get.constraintPropagationEnabled)
      // ...but the session conf itself is untouched...
      assert(spark.conf.get(key, "true") == "true")
      // ...so a concurrent thread planning on the same session keeps it on
      @volatile var other = false
      val t = new Thread(() => { other = SQLConf.get.constraintPropagationEnabled })
      t.start(); t.join()
      assert(other, "concurrent thread must keep constraint propagation on")
    }
    // scope exit restores this thread too
    assert(SQLConf.get.constraintPropagationEnabled)
    assert(spark.conf.get(key, "true") == "true")
  }

  test("the override reaches the optimizer of an action run inside the scope") {
    // InferFiltersFromConstraints makes the flag observable: with
    // propagation ON the filter a.id > 5 is inferred onto the other join
    // side (two `> 5` predicates in the optimized plan); OFF leaves one.
    def inferredCount(): Int = {
      val a = spark.range(10).toDF("id").filter($"id" > 5)
      val b = spark.range(10).toDF("id")
      val j = b.join(a, "id")
      j.count() // forces planning through the normal action path
      "> 5".r.findAllIn(j.queryExecution.optimizedPlan.toString).length
    }
    val withProp = inferredCount()
    val withoutProp = GraphAlgorithms.withoutConstraintPropagation(spark.range(1).toDF("id")) {
      inferredCount()
    }
    assert(withProp >= 2, s"baseline should infer the join-side filter, got $withProp")
    assert(withoutProp == 1,
      s"inside the scope the optimizer must not infer constraints, got $withoutProp")
  }

  test("injected function builders reject wrong arity with AnalysisException") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val one = Seq(Literal(1L))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      GraftExtensions.requireArity("graft_long_dot", 2, one)
    }
    assert(ex.getMessage.contains("graft_long_dot"))
    assert(ex.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    // correct arity passes through
    GraftExtensions.requireArity("graft_nfc", 1, one)
  }
}
