package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

class NativeCosineRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rule rewrites the kernel UDF into the native expression, same results") {
    import spark.implicits._
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    def q = emb.as("a").join(emb.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
    val before = q.collect().map(_.getDouble(0)).sorted

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeCosineRewrite
    try {
      val optimized = q
      val plan = optimized.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_cosine") && !plan.contains("graft_cosine_kernel"),
        plan.take(1200))
      val after = optimized.collect().map(_.getDouble(0)).sorted
      assert(after.toSeq == before.toSeq) // bitwise-identical math
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == NativeCosineRewrite)
    }
  }

  test("GraftExtensions registers the rule and the as-of strategy") {
    // getOrCreate would hand back the shared test session and ignore
    // spark.sql.extensions, so inspect the extensions object directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expressions.GraftExtensions().apply(ext)
    val strategies =
      org.apache.spark.sql.graftshim.GraftSqlShim.plannerStrategies(ext, spark)
    assert(strategies.contains(AsofJoinStrategy))
    val rules =
      org.apache.spark.sql.graftshim.GraftSqlShim.optimizerRules(ext, spark)
    assert(rules.contains(NativeCosineRewrite))
  }
}
